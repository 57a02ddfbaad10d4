"""Wave-I candidate probes (tools/backlog_r16.md) — DESIGNS ONLY, nothing
registered: round 14's sanctioned net-new surface is wave H and this file
deliberately never imports biggie_spark.registry.register.

Each probe is a (spark_fn, oracle_sql) pair in the exact shape a future
`@register` would take, run through the driver-faithful compare
(tests/compare.normalize_rows + md5, vanilla session) so a round-15/16
builder can promote them by copy-paste with measured evidence:

    python tools/probe_wave_i.py [sf_dir] [name ...]

Candidates (all follow the ops/btable_ops.py determinism contract —
fixed commit sequences, structural file layouts, bounded materialized
aggregates):

* bt_merge_delete_mode_state  — merge(when_matched='delete',
  when_not_matched='ignore') = keyed anti-delete; unmatched source rows
  must NOT insert.
* bt_merge_ignore_mode_state  — merge(when_matched='update',
  when_not_matched='ignore') = update-only images; unmatched source rows
  dropped.
* bt_merge_tskey_state        — MERGE keyed on a TIMESTAMP column
  end-to-end: epoch-micros source-key range -> candidate files, exact
  semi-join -> the single truly-hit file (files_removed asserted as a
  literal), update + insert images folded relationally by the oracle.
* bt_checkpoint_replay_read   — 13 commits (past the _CHECKPOINT_EVERY=10
  cadence): current read resolves checkpoint@10 + 2 commits, a version-7
  read resolves below the checkpoint; both must equal the full relational
  fold, and the checkpoint file's existence is asserted as a column.
* bt_cluster_pruned_read      — cluster_by=["k"] liquid-clustered create
  over a 100-distinct-key uniform grid (nation-derived, SF-invariant,
  skew-free as backlog_r16's trap note demands) with cluster_file_rows=25
  -> exactly 4 range-disjoint files; point predicates assert
  files_scanned=1, the full scan asserts 4, the mid-range predicate
  asserts contents only (files_scanned sentinel -1 on both sides: range
  boundaries come from the range partitioner's sampling and are NOT part
  of the contract).
"""

from __future__ import annotations

import hashlib
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biggie_spark.io import load_table
from biggie_spark.ops.btable_ops import (
    _four_day_table,
    _materialize,
    _nation,
    _scratch,
)
from biggie_spark.tablefmt import BTable
from tests.compare import normalize_rows

PROBES: dict[str, tuple] = {}


def probe(name: str, oracle: str):
    def deco(fn):
        PROBES[name] = (fn, oracle)
        return fn

    return deco


_CUST_CENTS = "CAST(round(c_acctbal * 100, 0) AS BIGINT)"


def _cust_base_src(spark: SparkSession, sf_dir: str):
    """The bt_merge_upsert_state fixture: base = customers with key%10 in
    0..4, source = new row images (negated balance, segment 'MERGED') for
    key%10 in {4, 5} — 4 exercises when_matched, 5 when_not_matched."""
    cust = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100, 0).cast("long")
    base = cust.filter("c_custkey % 10 < 5").select(
        "c_custkey", "c_nationkey", cents.alias("bal_cents"), "c_mktsegment"
    )
    src = cust.filter("c_custkey % 10 IN (4, 5)").select(
        "c_custkey",
        "c_nationkey",
        (-cents).alias("bal_cents"),
        F.lit("MERGED").alias("c_mktsegment"),
    )
    return base, src


def _bucket_agg(df: DataFrame) -> DataFrame:
    return (
        df.groupBy((F.col("c_custkey") % 10).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("bal_cents").alias("sum_bal"),
            F.sum(
                F.when(F.col("c_mktsegment") == "MERGED", 1).otherwise(0)
            ).alias("n_merged"),
        )
        .orderBy("bucket")
    )


@probe(
    "bt_merge_delete_mode_state",
    oracle=f"""
    WITH fin AS (
      SELECT c_custkey, {_CUST_CENTS} AS bal_cents, c_mktsegment
      FROM customer WHERE c_custkey % 10 < 4
    )
    SELECT c_custkey % 10 AS bucket, COUNT(*) AS cnt,
           CAST(SUM(bal_cents) AS BIGINT) AS sum_bal,
           CAST(SUM(CASE WHEN c_mktsegment = 'MERGED' THEN 1 ELSE 0 END) AS BIGINT) AS n_merged
    FROM fin GROUP BY bucket ORDER BY bucket
    """,
)
def bt_merge_delete_mode_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """merge(when_matched='delete', when_not_matched='ignore') over the
    upsert fixture: matched images (key%10==4) delete their target rows,
    unmatched images (key%10==5) must vanish without inserting — the final
    state is exactly base%10<4.  A leaked insert adds a bucket-5 row
    (rows_match red); a missed delete keeps bucket 4 (hash red)."""
    tmp = _scratch()
    try:
        base, src = _cust_base_src(spark, sf_dir)
        t = BTable.create(spark, f"{tmp}/t", base.repartition(4))
        t.merge(
            spark, src, on="c_custkey",
            when_matched="delete", when_not_matched="ignore",
        )
        return _materialize(_bucket_agg(t.read(spark)))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@probe(
    "bt_merge_ignore_mode_state",
    oracle=f"""
    WITH base AS (
      SELECT c_custkey, {_CUST_CENTS} AS bal_cents, c_mktsegment
      FROM customer WHERE c_custkey % 10 < 5
    ),
    src AS (
      SELECT c_custkey, -{_CUST_CENTS} AS bal_cents, 'MERGED' AS c_mktsegment
      FROM customer WHERE c_custkey % 10 IN (4, 5)
    ),
    fin AS (
      SELECT * FROM base WHERE c_custkey % 10 < 4
      UNION ALL SELECT * FROM src WHERE c_custkey % 10 = 4
    )
    SELECT c_custkey % 10 AS bucket, COUNT(*) AS cnt,
           CAST(SUM(bal_cents) AS BIGINT) AS sum_bal,
           CAST(SUM(CASE WHEN c_mktsegment = 'MERGED' THEN 1 ELSE 0 END) AS BIGINT) AS n_merged
    FROM fin GROUP BY bucket ORDER BY bucket
    """,
)
def bt_merge_ignore_mode_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """merge(when_matched='update', when_not_matched='ignore'): bucket-4
    rows take the new images (negated balance, 'MERGED'), bucket-5 source
    rows are dropped — an insert leak shows as bucket-5 rows, a lost
    update as n_merged=0 on bucket 4."""
    tmp = _scratch()
    try:
        base, src = _cust_base_src(spark, sf_dir)
        t = BTable.create(spark, f"{tmp}/t", base.repartition(4))
        t.merge(
            spark, src, on="c_custkey",
            when_matched="update", when_not_matched="ignore",
        )
        return _materialize(_bucket_agg(t.read(spark)))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


_ORC_DAY = (
    "SELECT n_nationkey + 100 * {d} AS k, "
    "TIMESTAMP '2024-03-0{d} 00:00:00' + n_nationkey * INTERVAL 2 MINUTE AS ts, "
    "n_name AS grp FROM nation"
)


@probe(
    "bt_merge_tskey_state",
    oracle=f"""
    WITH base AS (
      {_ORC_DAY.format(d=1)} UNION ALL {_ORC_DAY.format(d=2)}
      UNION ALL {_ORC_DAY.format(d=3)} UNION ALL {_ORC_DAY.format(d=4)}
    ),
    upd AS (
      SELECT -(n_nationkey + 200) AS k,
             TIMESTAMP '2024-03-02 00:00:00' + n_nationkey * INTERVAL 2 MINUTE AS ts,
             n_name AS grp FROM nation
    ),
    ins AS ({_ORC_DAY.format(d=5)}),
    fin AS (
      SELECT * FROM base WHERE CAST(ts AS DATE) <> DATE '2024-03-02'
      UNION ALL SELECT * FROM upd
      UNION ALL SELECT * FROM ins
    )
    SELECT CAST(ts AS DATE) AS day, COUNT(*) AS cnt,
           CAST(SUM(k) AS BIGINT) AS sum_k, 1 AS files_removed
    FROM fin GROUP BY day ORDER BY day
    """,
)
def bt_merge_tskey_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE keyed on a TIMESTAMP column over the four-day structural
    table: source = day-2 row images (k negated) + brand-new day-5 rows.
    The epoch-micros source-key range spans days 2..5, so days 3 and 4 are
    CANDIDATE files, but the exact semi-join must narrow the rewrite to
    the single day-2 file — files_removed is asserted as the literal 1
    from the merge commit's remove list (over-rewrite = 2+, under = 0,
    both hash red).  Scores the round-14 epoch-micros stats path (TZ-free
    key ranges) end to end through DML, not just reads."""
    tmp = _scratch()
    try:
        t = _four_day_table(spark, sf_dir, tmp)
        nat = _nation(spark, sf_dir)

        def day(d: int, k_expr):
            return nat.select(
                k_expr.alias("k"),
                F.expr(
                    f"timestamp'2024-03-0{d} 00:00:00'"
                    " + make_interval(0, 0, 0, 0, 0, n_nationkey * 2, 0)"
                ).alias("ts"),
                F.col("n_name").alias("grp"),
            )

        src = day(2, -(F.col("n_nationkey") + 200)).unionByName(
            day(5, F.col("n_nationkey") + 500)
        )
        t.merge(spark, src, on="ts")
        merge_doc = [c for c in t.history() if c["op"] == "merge"][-1]
        n_removed = merge_doc["removed"]
        return _materialize(
            t.read(spark)
            .groupBy(F.to_date("ts").alias("day"))
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum("k").alias("sum_k"),
            )
            .withColumn("files_removed", F.lit(n_removed))
            .orderBy("day")
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@probe(
    "bt_checkpoint_replay_read",
    oracle="""
    WITH sl AS (
      SELECT n_nationkey + 100 * r.i AS key, n_regionkey, r.i
      FROM nation, range(0, 12) r(i)
    )
    SELECT 7 AS version, COUNT(*) AS cnt,
           CAST(SUM(key) AS BIGINT) AS sum_key, 1 AS has_checkpoint
    FROM sl WHERE i <= 7
    UNION ALL
    SELECT 12, COUNT(*), CAST(SUM(key) AS BIGINT), 1
    FROM sl WHERE NOT (n_regionkey = 2)
    ORDER BY version
    """,
)
def bt_checkpoint_replay_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """13 fixed commits (create + 11 appends + a delete) cross the
    _CHECKPOINT_EVERY=10 cadence: the current-version read must resolve
    checkpoint@10 + commits 11..12, the version-7 time travel must resolve
    BELOW the checkpoint (full replay prefix), and both must equal the
    relational fold.  has_checkpoint pins that the cadence actually fired
    — a silently-skipped checkpoint turns the op into a plain replay test
    and hashes red."""
    tmp = _scratch()
    try:
        nat = _nation(spark, sf_dir)

        def sl(i: int):
            return nat.select(
                (F.col("n_nationkey") + 100 * i).alias("key"), "n_regionkey"
            )

        t = BTable.create(spark, f"{tmp}/t", sl(0).coalesce(1))
        for i in range(1, 12):
            t.append(spark, sl(i).coalesce(1))  # versions 1..11
        t.delete(spark, "n_regionkey == 2")  # version 12
        has_cp = int(
            os.path.exists(
                os.path.join(t.path, "_log", "00000010.checkpoint.json")
            )
        )
        rows = []
        for v in (7, 12):
            r = t.read(spark, version=v).agg(
                F.count(F.lit(1)), F.sum("key")
            ).collect()[0]
            rows.append((v, r[0], r[1], has_cp))
        return spark.createDataFrame(
            rows, "version int, cnt bigint, sum_key bigint, has_checkpoint int"
        ).orderBy("version")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


_CLUSTER_PREDS = [
    # label, spark where, duckdb where, files scanned of 4 (-1 = contents
    # only: range boundaries come from partitioner sampling, not contract)
    ("full", "k <= 1000", "(k <= 1000)", 4),
    ("mid_range", "k >= 28 AND k < 72", "(k >= 28 AND k < 72)", -1),
    ("point_low", "k == 7", "(k = 7)", 1),
    ("point_high", "k == 55", "(k = 55)", 1),
]


@probe(
    "bt_cluster_pruned_read",
    oracle=f"""
    WITH grid AS (
      SELECT n_nationkey * 4 + r.i AS k FROM nation, range(0, 4) r(i)
    )
    {" UNION ALL ".join(
        f"SELECT '{label}' AS which, 4 AS files_total, "
        f"{scanned} AS files_scanned, COUNT(*) AS cnt, "
        f"CAST(SUM(k) AS BIGINT) AS sum_k FROM grid WHERE {dq}"
        for label, _, dq, scanned in _CLUSTER_PREDS
    )}
    ORDER BY which
    """,
)
def bt_cluster_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Liquid-clustered create: cluster_by=["k"] over a uniform
    100-distinct-key grid (nation-derived — identical at every SF) with
    cluster_file_rows=25 forces repartitionByRange(4, k) + in-file sort,
    i.e. exactly 4 range-disjoint data files with sharp per-file k stats.
    Point predicates must scan exactly 1 of 4 files (a point key lives in
    exactly one range partition); the full scan pins files_total=4 so an
    empty range partition (sampling skew) is caught as a layout break, not
    silently absorbed.  The mid-range predicate asserts CONTENTS only
    (sentinel -1): where its boundary files fall is the partitioner's
    business."""
    tmp = _scratch()
    try:
        nat = _nation(spark, sf_dir)
        grid = nat.select(
            F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("i"),
            "n_nationkey",
        ).select((F.col("n_nationkey") * 4 + F.col("i")).alias("k"))
        t = BTable.create(
            spark, f"{tmp}/t", grid, cluster_by=["k"], cluster_file_rows=25
        )
        files_total = len(t.snapshot().files)
        rows = []
        for label, sw, _, scanned in _CLUSTER_PREDS:
            n_scan = t.scan_file_count(sw) if scanned >= 0 else -1
            r = t.read(spark, where=sw).agg(
                F.count(F.lit(1)), F.sum("k")
            ).collect()[0]
            rows.append((label, files_total, n_scan, r[0], r[1]))
        return spark.createDataFrame(
            rows,
            "which string, files_total int, files_scanned int, "
            "cnt bigint, sum_k bigint",
        ).orderBy("which")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# ---------------------------------------------------------------- wave J
# candidates: the round-14 deletion-vector capability as scored surfaces
# (tools/backlog_r16.md gains these; registration is a later wave's call)


@probe(
    "bt_dv_delete_state",
    oracle="""
    WITH base AS (
      SELECT n_nationkey + 100 * r.i AS k,
             n_regionkey, r.i AS day FROM nation, range(1, 5) r(i)
    ),
    live AS (SELECT * FROM base WHERE NOT (k % 5 = 2))
    SELECT day, COUNT(*) AS cnt, CAST(SUM(k) AS BIGINT) AS sum_k,
           4 AS files_total, 0 AS files_rewritten, 4 AS dv_files,
           4 AS files_scanned_conservative
    FROM live GROUP BY day ORDER BY day
    """,
)
def bt_dv_delete_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read delete scored end to end: a scattered predicate
    (k % 5 == 2) hits all four structural files, the DV commit must
    rewrite ZERO of them (files_rewritten literal — a copy-on-write
    fallback kicking in spuriously hashes red), record a DV on each
    (dv_files from history), keep stats-based scanning conservative
    (scan_file_count still 4 — DV'd rows don't shrink physical stats),
    and read back exactly the live rows."""
    tmp = _scratch()
    try:
        nat = _nation(spark, sf_dir)

        def day_slice(i: int):
            return nat.select(
                (F.col("n_nationkey") + 100 * i).alias("k"),
                "n_regionkey",
                F.lit(i).cast("long").alias("day"),
            )

        t = BTable.create(spark, f"{tmp}/t", day_slice(1).coalesce(1))
        for i in (2, 3, 4):
            t.append(spark, day_slice(i).coalesce(1))
        files_before = set(t.snapshot().files)
        t.delete(spark, "k % 5 == 2", mode="merge_on_read")
        snap = t.snapshot()
        rewritten = len(files_before - set(snap.files))
        dv_files = t.history()[-1]["dv_files"]
        scanned = t.scan_file_count("k % 5 == 2")
        return _materialize(
            t.read(spark)
            .groupBy("day")
            .agg(F.count(F.lit(1)).alias("cnt"), F.sum("k").alias("sum_k"))
            .withColumn("files_total", F.lit(len(snap.files)))
            .withColumn("files_rewritten", F.lit(rewritten))
            .withColumn("dv_files", F.lit(dv_files))
            .withColumn("files_scanned_conservative", F.lit(scanned))
            .orderBy("day")
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@probe(
    "bt_dv_cdf_state",
    oracle="""
    WITH v1_dead AS (SELECT * FROM nation WHERE n_regionkey = 2),
    v1_live AS (SELECT * FROM nation WHERE NOT (n_regionkey = 2)),
    v2_live AS (SELECT * FROM v1_live WHERE NOT (n_nationkey >= 20))
    SELECT 1 AS commit_version, 'delete' AS change_type,
           COUNT(*) AS cnt, CAST(SUM(n_nationkey) AS BIGINT) AS sum_key
    FROM v1_dead
    UNION ALL SELECT 2, 'delete', COUNT(*), CAST(SUM(n_nationkey) AS BIGINT)
    FROM v1_live
    UNION ALL SELECT 2, 'insert', COUNT(*), CAST(SUM(n_nationkey) AS BIGINT)
    FROM v2_live
    ORDER BY commit_version, change_type
    """,
)
def bt_dv_cdf_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The change feed under deletion vectors: the DV commit (v1) must
    emit PARTIAL-file deletes — exactly the newly-dead rows, sharper
    than copy-on-write's whole-file emission — and the later
    copy-on-write rewrite (v2) must emit deletes for the file's LIVE
    rows only (emitting the already-DV'd region-2 rows again would
    double-count them and hash red).  Scores the live-row-diff feed
    (tablefmt.py:changes, range algebra on [0,rows) minus DV) end to
    end."""
    tmp = _scratch()
    try:
        t = BTable.create(
            spark, f"{tmp}/t",
            _nation(spark, sf_dir).coalesce(1),
        )
        t.delete(spark, "n_regionkey == 2", mode="merge_on_read")  # v1
        t.delete(spark, "n_nationkey >= 20")                       # v2: cow
        return _materialize(
            t.changes(spark, 0)
            .groupBy(
                F.col("_commit_version").cast("int").alias("commit_version"),
                F.col("_change_type").alias("change_type"),
            )
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum("n_nationkey").alias("sum_key"),
            )
            .orderBy("commit_version", "change_type")
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@probe(
    "bt_dv_restore_state",
    oracle="""
    SELECT 0 AS version, COUNT(*) AS cnt FROM nation
    UNION ALL SELECT 1, COUNT(*) FROM nation WHERE NOT (n_regionkey = 2)
    UNION ALL SELECT 2, COUNT(*) FROM nation
    UNION ALL SELECT 102, COUNT(*) FROM nation WHERE n_regionkey = 2
    ORDER BY version
    """,
)
def bt_dv_restore_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESTORE across a deletion vector: rolling back to v0 must
    resurrect the DV-deleted rows via dv_reset (a restore that unioned
    DV state instead of replacing it would keep them dead), every
    version stays time-travel readable, and the restore commit's feed
    window emits the resurrected rows as partial-file INSERTS (the
    synthetic 102 row: their count via changes(1, 2))."""
    tmp = _scratch()
    try:
        t = BTable.create(
            spark, f"{tmp}/t",
            _nation(spark, sf_dir).coalesce(1),
        )
        t.delete(spark, "n_regionkey == 2", mode="merge_on_read")  # v1
        t.restore(0)                                               # v2
        rows = [
            (v, t.read(spark, version=v).count()) for v in (0, 1, 2)
        ]
        resurrected = (
            t.changes(spark, 1, 2).filter("_change_type = 'insert'").count()
        )
        rows.append((102, resurrected))
        return spark.createDataFrame(rows, "version int, cnt bigint").orderBy(
            "version"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@probe(
    "bt_feed_source_read",
    oracle="""
    WITH v1_dead AS (SELECT * FROM nation WHERE n_regionkey = 2),
    v1_live AS (SELECT * FROM nation WHERE NOT (n_regionkey = 2))
    SELECT 0 AS commit_version, 'insert' AS change_type,
           COUNT(*) AS cnt, CAST(SUM(n_nationkey) AS BIGINT) AS sum_key
    FROM nation
    UNION ALL SELECT 1, 'delete', COUNT(*), CAST(SUM(n_nationkey) AS BIGINT)
    FROM v1_dead
    UNION ALL SELECT 2, 'insert', COUNT(*), CAST(SUM(n_nationkey) AS BIGINT)
    FROM v1_dead
    ORDER BY commit_version, change_type
    """,
)
def bt_feed_source_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The btable_changes DATA SOURCE (biggie_spark/btable_stream.py)
    scored end to end through its batch reader: a Python Data Source
    whose planning is the _live_diffs range algebra and whose executor
    reads are pyarrow range slices — create (full-file insert), a
    deletion-vector delete (partial-file delete emission), and a restore
    (partial-file resurrect-insert via dv_reset), aggregated per
    (commit_version, change_type).  startingVersion=-1 must include the
    create commit; any drift between the source and the native
    changes() feed (they share planning but not the read path — JVM
    parquet scan vs pyarrow slices) hashes red."""
    from biggie_spark.btable_stream import register_btable_source

    register_btable_source(spark)
    tmp = _scratch()
    try:
        t = BTable.create(
            spark, f"{tmp}/t", _nation(spark, sf_dir).coalesce(1)
        )
        t.delete(spark, "n_regionkey == 2", mode="merge_on_read")  # v1
        t.restore(0)                                               # v2
        return _materialize(
            spark.read.format("btable_changes")
            .option("startingVersion", -1)
            .load(t.path)
            .groupBy(
                F.col("_commit_version").cast("int").alias("commit_version"),
                F.col("_change_type").alias("change_type"),
            )
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum("n_nationkey").alias("sum_key"),
            )
            .orderBy("commit_version", "change_type")
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@probe(
    "bt_meta_count_read",
    oracle="""
    SELECT 0 AS version, COUNT(*) AS cnt_meta, COUNT(*) AS cnt_scan,
           1 AS agree FROM nation
    UNION ALL
    SELECT 1, COUNT(*), COUNT(*), 1 FROM nation WHERE NOT (n_regionkey = 2)
    UNION ALL
    SELECT 2, COUNT(*), COUNT(*), 1 FROM nation
    WHERE NOT (n_regionkey = 2) AND NOT (n_nationkey >= 20)
    ORDER BY version
    """,
)
def bt_meta_count_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only COUNT(*) (tablefmt.py:count_rows — per-file row
    counts minus DV coverage, zero data files opened) scored against the
    scan count AND the relational oracle at every version of a
    create -> DV delete -> COW delete history.  A count_rows that
    ignored DVs, double-counted a rewrite, or drifted from the physical
    scan hashes red."""
    tmp = _scratch()
    try:
        t = BTable.create(
            spark, f"{tmp}/t", _nation(spark, sf_dir).coalesce(1)
        )
        t.delete(spark, "n_regionkey == 2", mode="merge_on_read")  # v1
        t.delete(spark, "n_nationkey >= 20")                       # v2
        rows = []
        for v in (0, 1, 2):
            meta = t.count_rows(version=v)
            scan = t.read(spark, version=v).count()
            rows.append((v, meta, scan, int(meta == scan)))
        return spark.createDataFrame(
            rows, "version int, cnt_meta bigint, cnt_scan bigint, agree int"
        ).orderBy("version")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@probe(
    "bt_constraint_state",
    oracle="""
    WITH fin AS (
      SELECT n_nationkey, n_regionkey FROM nation
      UNION ALL
      SELECT n_nationkey + 100, n_regionkey FROM nation
      WHERE n_regionkey <> 2
    )
    SELECT n_regionkey, COUNT(*) AS cnt,
           CAST(SUM(n_nationkey) AS BIGINT) AS sum_key,
           1 AS reject_held, 2 AS n_commits_after_reject
    FROM fin GROUP BY n_regionkey ORDER BY n_regionkey
    """,
)
def bt_constraint_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHECK constraints end to end: add a constraint the table
    satisfies, reject an append that violates it WITHOUT committing
    (version literal pinned — a half-applied write or a phantom commit
    hashes red), then accept a conforming append.  The final state is
    the relational fold of only the accepted writes."""
    tmp = _scratch()
    try:
        nat = _nation(spark, sf_dir).select("n_nationkey", "n_regionkey")
        t = BTable.create(spark, f"{tmp}/t", nat.coalesce(1))       # v0
        t.add_constraint(spark, "not_region_7", "n_regionkey != 7")  # v1
        rejected = 0
        try:
            t.append(
                spark,
                nat.select(
                    (F.col("n_nationkey") + 100).alias("n_nationkey"),
                    F.lit(7).cast(
                        nat.schema["n_regionkey"].dataType.simpleString()
                    ).alias("n_regionkey"),
                ).coalesce(1),
            )
        except ValueError:
            rejected = 1
        v_after_reject = t.snapshot().version  # must still be 1
        t.append(
            spark,
            nat.filter("n_regionkey != 2")
            .select(
                (F.col("n_nationkey") + 100).alias("n_nationkey"),
                "n_regionkey",
            )
            .coalesce(1),
        )                                                           # v2
        return _materialize(
            t.read(spark)
            .groupBy("n_regionkey")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum("n_nationkey").alias("sum_key"),
            )
            .withColumn("reject_held", F.lit(rejected * (v_after_reject == 1)))
            .withColumn("n_commits_after_reject", F.lit(t.snapshot().version))
            .orderBy("n_regionkey")
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@probe(
    "bt_format_writer_state",
    oracle="""
    WITH fin AS (
      SELECT n_nationkey, n_regionkey FROM nation
      UNION ALL SELECT n_nationkey + 100, n_regionkey FROM nation
    )
    SELECT n_regionkey, COUNT(*) AS cnt,
           CAST(SUM(n_nationkey) AS BIGINT) AS sum_key,
           3 AS n_versions, 1 AS replay_skipped
    FROM fin GROUP BY n_regionkey ORDER BY n_regionkey
    """,
)
def bt_format_writer_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The format('btable') WRITE path scored end to end: a write
    creates the table (v0), a second appends (v1), and the streaming
    sink's txn idempotence is scored directly — committing the same
    (txnAppId, batchId) twice must produce exactly ONE version (v2) and
    a replayed epoch is a version no-op.  Python-written files must
    read back exactly (they carry tablefmt-convention stats)."""
    from biggie_spark.btable_stream import (
        _BTableStreamWriter,
        register_btable_source,
    )

    register_btable_source(spark)
    tmp = _scratch()
    try:
        path = f"{tmp}/t"
        nat = _nation(spark, sf_dir).select("n_nationkey", "n_regionkey")
        nat.coalesce(1).write.format("btable").mode("append").save(path)  # v0
        nat.select(
            (F.col("n_nationkey") + 100).alias("n_nationkey"), "n_regionkey"
        ).coalesce(1).write.format("btable").mode("append").save(path)   # v1
        t = BTable(path)
        w = _BTableStreamWriter(
            t.read(spark).schema, {"path": path, "txnappid": "probe"}
        )
        w.commit([], batchId=3)           # v2
        v_first = t.snapshot().version
        w.commit([], batchId=3)           # replay: must NOT commit
        replay_skipped = int(t.snapshot().version == v_first)
        return _materialize(
            t.read(spark)
            .groupBy("n_regionkey")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum("n_nationkey").alias("sum_key"),
            )
            .withColumn("n_versions", F.lit(t.snapshot().version + 1))
            .withColumn("replay_skipped", F.lit(replay_skipped))
            .orderBy("n_regionkey")
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@probe(
    "bt_zorder_pruned_read",
    oracle="""
    WITH g AS (SELECT (a.n_nationkey * 25 + b.n_nationkey) % 64 AS x,
                      ((a.n_nationkey * 25 + b.n_nationkey) // 64) % 64 AS y,
                      a.n_nationkey * 25 + b.n_nationkey AS payload
               FROM nation a, nation b)
    SELECT 'x_range' AS which,
           COUNT(*) AS cnt, CAST(SUM(payload) AS BIGINT) AS sum_p,
           1 AS pruned
    FROM g WHERE x >= 8 AND x < 16
    UNION ALL SELECT 'y_range', COUNT(*), CAST(SUM(payload) AS BIGINT), 1
    FROM g WHERE y >= 8 AND y < 16
    ORDER BY which
    """,
)
def bt_zorder_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE ZORDER scored: a 625-cell nation-cross grid (SF-invariant)
    is created linearly clustered by x, then z-ordered on (x, y); BOTH
    range predicates must then prune files (pruned = scan < total as a
    boolean — the exact count is the range partitioner's business, the
    PRUNABILITY of the second dimension is the contract) and contents
    must fold relationally."""
    tmp = _scratch()
    try:
        nat = _nation(spark, sf_dir).select("n_nationkey")
        a = nat.select(F.col("n_nationkey").alias("ka"))
        b = nat.select(F.col("n_nationkey").alias("kb"))
        g = (
            a.crossJoin(b)
            .select((F.col("ka") * 25 + F.col("kb")).alias("payload"))
            .select(
                (F.col("payload") % 64).alias("x"),
                ((F.col("payload") / 64).cast("long") % 64).alias("y"),
                "payload",
            )
        )
        t = BTable.create(
            spark, f"{tmp}/t", g, cluster_by=["x"], cluster_file_rows=80
        )
        t.optimize(spark, zorder_by=["x", "y"], zorder_file_rows=80)
        total = t.scan_file_count()
        rows = []
        for which, w in (
            ("x_range", "x >= 8 AND x < 16"),
            ("y_range", "y >= 8 AND y < 16"),
        ):
            r = t.read(spark, where=w).agg(
                F.count(F.lit(1)), F.sum("payload")
            ).collect()[0]
            rows.append(
                (which, r[0], r[1], int(t.scan_file_count(w) < total))
            )
        return spark.createDataFrame(
            rows, "which string, cnt bigint, sum_p bigint, pruned int"
        ).orderBy("which")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


from pyspark.sql import Window  # noqa: E402

from biggie_spark.util import r4  # noqa: E402


@probe(
    "agg_raking_4way",
    oracle="""
    WITH cell AS (SELECT event_type AS et,
                         extract(hour FROM ts)//6 AS hq,
                         (CAST(ts AS DATE) - DATE '1970-01-01') % 7 AS dw,
                         count(*)*1000000 AS w0
                  FROM events GROUP BY 1, 2, 3),
    n AS (SELECT sum(w0) AS tot, count(DISTINCT et) AS ke,
                 count(DISTINCT hq) AS kh, count(DISTINCT dw) AS kd
          FROM cell),
    r1 AS (SELECT et, hq, dw,
                  CAST(floor(CAST(w0 AS DOUBLE) * t / m) AS BIGINT) AS w
           FROM (SELECT et, hq, dw, w0,
                        sum(w0) OVER (PARTITION BY et, dw) AS m,
                        (SELECT tot//(ke*kd) FROM n) AS t
                 FROM cell)),
    r2 AS (SELECT et, hq, dw,
                  CAST(floor(CAST(w AS DOUBLE) * t / m) AS BIGINT) AS w
           FROM (SELECT et, hq, dw, w,
                        sum(w) OVER (PARTITION BY hq) AS m,
                        (SELECT tot//kh FROM n) AS t
                 FROM r1)),
    r3 AS (SELECT et, hq, dw,
                  CAST(floor(CAST(w AS DOUBLE) * t / m) AS BIGINT) AS w
           FROM (SELECT et, hq, dw, w,
                        sum(w) OVER (PARTITION BY et, dw) AS m,
                        (SELECT tot//(ke*kd) FROM n) AS t
                 FROM r2)),
    r4_ AS (SELECT et, hq, dw,
                   CAST(floor(CAST(w AS DOUBLE) * t / m) AS BIGINT) AS w
            FROM (SELECT et, hq, dw, w,
                         sum(w) OVER (PARTITION BY hq) AS m,
                         (SELECT tot//kh FROM n) AS t
                  FROM r3)),
    res AS (SELECT max(abs(s - (SELECT tot//(ke*kd) FROM n))) AS pair_dev
            FROM (SELECT et, dw, sum(w) AS s FROM r4_ GROUP BY 1, 2))
    SELECT r4_.et AS event_type, CAST(r4_.dw AS BIGINT) AS dow_mod7,
           CAST(r4_.hq AS BIGINT) AS hour_sextant,
           CAST(r4_.w AS BIGINT) AS fitted_weight_e6,
           CAST((SELECT pair_dev FROM res) AS BIGINT) AS residual_pair_dev
    FROM r4_
    """,
)
def agg_raking_4way(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Double raking: the agg_raking_ipf machinery extended to a PAIR
    margin — cells over (event_type x hour-sextant x epoch-day-mod-7),
    four alternating IPF passes fitting the JOINT (type x dow) margin and
    the hour margin to uniform targets.  Day-of-week comes from epoch-day
    mod 7 (datediff), never dayofweek(): Spark numbers Sunday=1, DuckDB
    Sunday=0.  Every scale step is the identical-IEEE-double floor
    (int64 products overflow at sf0.1 — the backlog_r15 standing rule);
    the residual reports the unfitted pair-margin deviation after the
    final hour pass — double raking's alternating-convergence signature.

    Shape: one census scan, four bounded window passes over <=140 cells,
    one 1-row residual broadcast."""
    e = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("et"),
        F.expr("hour(ts) div 6").alias("hq"),
        F.expr("datediff(to_date(ts), date'1970-01-01') % 7").alias("dw"),
    )
    cell = e.groupBy("et", "hq", "dw").agg(
        (F.count("*") * 1000000).alias("w0")
    )
    n = cell.groupBy().agg(
        F.sum("w0").alias("tot"),
        F.countDistinct("et").alias("ke"),
        F.countDistinct("hq").alias("kh"),
        F.countDistinct("dw").alias("kd"),
    )

    def ipf_step(df, part_cols, target_expr):
        wprt = Window.partitionBy(*part_cols)
        return (
            df.withColumn("_m", F.sum("w").over(wprt))
            .withColumn(
                "w",
                F.floor(
                    F.col("w").cast("double")
                    * F.expr(target_expr)
                    / F.col("_m")
                ).cast("long"),
            )
            .drop("_m")
        )

    base = cell.crossJoin(F.broadcast(n)).withColumn("w", F.col("w0"))
    s1 = ipf_step(base, ("et", "dw"), "tot div (ke*kd)")
    s2 = ipf_step(s1, ("hq",), "tot div kh")
    s3 = ipf_step(s2, ("et", "dw"), "tot div (ke*kd)")
    s4 = ipf_step(s3, ("hq",), "tot div kh")
    res = (
        s4.groupBy("et", "dw")
        .agg(
            F.sum("w").alias("s"),
            F.max(F.expr("tot div (ke*kd)")).alias("tg"),
        )
        .groupBy()
        .agg(F.max(F.abs(F.col("s") - F.col("tg"))).alias("pair_dev"))
    )
    return s4.crossJoin(F.broadcast(res)).select(
        F.col("et").alias("event_type"),
        F.col("dw").cast("long").alias("dow_mod7"),
        F.col("hq").cast("long").alias("hour_sextant"),
        F.col("w").cast("long").alias("fitted_weight_e6"),
        F.col("pair_dev").cast("long").alias("residual_pair_dev"),
    )


_ENTROPY_K = 8


@probe(
    "ts_spectral_entropy",
    oracle=f"""
    WITH h AS (SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr,
                      CAST(count(*) AS BIGINT) AS n
               FROM events GROUP BY event_type, hr),
    terms AS (SELECT h.event_type, h.hr, h.n, k.k,
                     2 * pi() * k.k * h.hr / 24 AS th
              FROM h, range(1, {_ENTROPY_K + 1}) k(k)),
    r AS (SELECT event_type, k,
                 CAST(sum(CAST(sign(n * cos(th)) *
                      floor(abs(n * cos(th)) * 10 + 0.5) AS BIGINT))
                   AS BIGINT) AS c,
                 CAST(sum(CAST(sign(n * sin(th)) *
                      floor(abs(n * sin(th)) * 10 + 0.5) AS BIGINT))
                   AS BIGINT) AS s
          FROM terms GROUP BY event_type, k),
    e AS (SELECT event_type, k, c * c + s * s AS en
          FROM r WHERE c * c + s * s > 0)
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_bins_nonzero,
           CAST(sum(en) AS BIGINT) AS total_energy_e2,
           round(ln(sum(en)) - sum(en * ln(en)) / sum(en), 4) + 0
             AS spectral_entropy_nats
    FROM e GROUP BY event_type
    """,
)
def ts_spectral_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spectral entropy of the hour-of-day profile per event type — the
    flatness-vs-peakedness summary of the seasonality spectrum (a flat
    spectrum = noise-like traffic, one dominant bin = strong periodicity).
    Composes the two proven cross-engine idioms and nothing else: the
    ts_daily_spectrum integer-DFT discipline (every trig term rounded to
    deci-units half-away BEFORE summation -> bin energies are exact
    int64 on any engine/partitioning) and the llm_entropy_filter
    entropy-over-integer-counts form H = ln(S) - sum(E·ln E)/S, r4 at the
    boundary.  The backlog_r15 warning ("naive log2/FFT floats are not
    cross-engine-stable") is about float accumulation INSIDE the DFT —
    integer energies sidestep it; zero-energy bins are excluded on both
    sides (Shannon 0·ln 0 = 0).

    Shape: one aggregate onto the (type x 24) grid, an 8-row frequency
    grid broadcast, two more bounded aggregates."""
    h = load_table(spark, sf_dir, "events").groupBy(
        "event_type", F.hour("ts").cast("long").alias("hr")
    ).agg(F.count("*").alias("n"))
    ks = spark.range(1, _ENTROPY_K + 1).select(
        F.col("id").cast("long").alias("k")
    )
    terms = h.crossJoin(F.broadcast(ks)).select(
        "event_type",
        "k",
        (
            F.lit(2)
            * F.lit(3.141592653589793)
            * F.col("k")
            * F.col("hr")
            / 24
        ).alias("th"),
        "n",
    )

    def deci(expr):
        v = F.col("n") * expr
        return (F.signum(v) * F.floor(F.abs(v) * 10 + 0.5)).cast("long")

    r = terms.groupBy("event_type", "k").agg(
        F.sum(deci(F.cos("th"))).alias("c"),
        F.sum(deci(F.sin("th"))).alias("s"),
    )
    e = r.select(
        "event_type",
        (F.col("c") * F.col("c") + F.col("s") * F.col("s")).alias("en"),
    ).filter(F.col("en") > 0)
    tot = F.sum("en")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_bins_nonzero"),
        tot.cast("long").alias("total_energy_e2"),
        r4(
            F.log(tot) - F.sum(F.col("en") * F.log("en")) / tot
        ).alias("spectral_entropy_nats"),
    )


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("probe-wave-i")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for tb in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {tb} AS SELECT * FROM '{sf}/{tb}.parquet'")
    n_pass = n_fail = 0
    for name, (fn, oracle) in sorted(PROBES.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf)
            srows = [tuple(r) for r in sdf.collect()]
            cur = con.execute(oracle)
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
            sh = hashlib.md5(
                repr(normalize_rows(srows, sdf.columns)).encode()
            ).hexdigest()
            dh = hashlib.md5(
                repr(normalize_rows(drows, dcols)).encode()
            ).hexdigest()
            ok = (
                sorted(sdf.columns) == sorted(dcols)
                and len(srows) == len(drows)
                and sh == dh
            )
            print(
                f"  {'PASS' if ok else 'FAIL'} {name}: rows={len(srows)} "
                f"hash={'=' if sh == dh else '!='} ({time.time() - t0:.1f}s)"
            )
            n_pass += ok
            n_fail += not ok
        except Exception as ex:  # noqa: BLE001 - probe harness reports all
            print(f"  ERROR {name}: {type(ex).__name__}: {str(ex)[:300]}")
            n_fail += 1
    print(f"pass={n_pass} fail={n_fail}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
