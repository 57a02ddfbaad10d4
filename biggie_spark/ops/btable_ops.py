"""btable scored surfaces (VERDICT r12 "Next round" item 2): the ACID
table format (biggie_spark/tablefmt.py) shipped in round 12 with 19
internal tests but zero driver CORRECTNESS rows — the only substantial
component with no third-party signal.  These ops register its
deterministic read/DML surfaces with full DuckDB oracles: each op builds
a btable in a scratch directory from corpus tables, replays a FIXED
commit sequence, and returns the resulting table state as a small
aggregate; the oracle replays the same sequence relationally.

Determinism contract (what makes an ACID writer oracle-able):

* commit sequences are fixed and data-derived — versions, history ops
  and final contents are pure functions of the corpus;
* every write is ``coalesce(1)`` so the FILE layout is structural too —
  the two ops that assert pruned-file counts (`bt_stats_skipped_read`,
  `bt_optimize_compact_state`) own their layout completely;
* money doubles go through the integer-cents convention
  (CAST(round(x*100,0) AS BIGINT), util.dsum note) in BOTH engines;
* results are materialized (collect + createDataFrame) BEFORE the
  scratch directory is removed — the returned frame must not depend on
  files the cleanup deletes.  Result sets are bounded aggregates
  (<= ~60 rows), the same driver-side shape as btable's own commit
  metadata.

The three ADVICE-r12 false-prune regressions (OR swallowed into a
literal, isoformat-'T' stats vs space-separated SQL timestamp literals,
int() truncation of fractional literals) are scored END TO END here:
`bt_tricky_where_read` / `bt_delete_tsrange_state` would hash-mismatch
against DuckDB if pruning ever drops a live file again.
"""

from __future__ import annotations

import shutil
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biggie_spark.io import load_table
from biggie_spark.registry import register
from biggie_spark.tablefmt import BTable
from biggie_spark.util import lineage_cap


def _scratch() -> str:
    return tempfile.mkdtemp(prefix="btable_op_")


def _materialize(df: DataFrame) -> DataFrame:
    """Pin a btable-backed result into a local frame so the scratch table
    can be deleted before the driver collects.  Bounded: every caller
    returns a small aggregate, never row-level data."""
    return df.sparkSession.createDataFrame(df.collect(), df.schema)


def _nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )


def _nation_shifted(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _nation(spark, sf_dir).select(
        (F.col("n_nationkey") + 100).alias("n_nationkey"),
        "n_name",
        "n_regionkey",
    )


_ORC_NATION_SHIFT = (
    "SELECT n_nationkey + 100 AS n_nationkey, n_name, n_regionkey FROM nation"
)


@register(
    "bt_commit_replay_read",
    oracle=f"""
    WITH v2 AS (
      SELECT n_nationkey, n_regionkey FROM (
        SELECT n_nationkey, n_name, n_regionkey FROM nation
        UNION ALL {_ORC_NATION_SHIFT}
      ) u WHERE NOT (n_regionkey = 2)
    )
    SELECT n_regionkey, COUNT(*) AS cnt, CAST(SUM(n_nationkey) AS BIGINT) AS sum_key
    FROM v2 GROUP BY n_regionkey ORDER BY n_regionkey
    """,
)
def bt_commit_replay_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed commit sequence (create -> append -> delete), final contents
    read back through log replay.  tablefmt.py:_replay is the unit under
    test: the snapshot must be exactly the relational fold of the log."""
    tmp = _scratch()
    try:
        t = BTable.create(spark, f"{tmp}/t", _nation(spark, sf_dir).coalesce(1))
        t.append(spark, _nation_shifted(spark, sf_dir).coalesce(1))
        t.delete(spark, "n_regionkey == 2")
        return _materialize(
            t.read(spark)
            .groupBy("n_regionkey")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum("n_nationkey").alias("sum_key"),
            )
            .orderBy("n_regionkey")
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "bt_time_travel_read",
    oracle=f"""
    WITH v0 AS (SELECT * FROM nation),
    v1 AS (SELECT * FROM v0 UNION ALL {_ORC_NATION_SHIFT}),
    v2 AS (SELECT * FROM v1 WHERE NOT (n_regionkey = 2))
    SELECT 0 AS version, COUNT(*) AS cnt, CAST(SUM(n_nationkey) AS BIGINT) AS sum_key FROM v0
    UNION ALL SELECT 1, COUNT(*), CAST(SUM(n_nationkey) AS BIGINT) FROM v1
    UNION ALL SELECT 2, COUNT(*), CAST(SUM(n_nationkey) AS BIGINT) FROM v2
    UNION ALL SELECT 101, COUNT(*), CAST(SUM(n_nationkey) AS BIGINT) FROM v1
    ORDER BY version
    """,
)
def bt_time_travel_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VERSION AS OF (every version of a 3-commit log) plus
    timestamp-based travel: version_as_of(t) for a wall-clock instant
    between commits 1 and 2 must resolve to version 1 — reported as the
    `101` row, which only hashes green if the resolved version is 1."""
    tmp = _scratch()
    try:
        t = BTable.create(spark, f"{tmp}/t", _nation(spark, sf_dir).coalesce(1))
        t.append(spark, _nation_shifted(spark, sf_dir).coalesce(1))
        ts_mid = time.time()
        t.delete(spark, "n_regionkey == 2")
        # version_as_of is a driver-side log read, so every versioned
        # aggregate is known up front — ONE unioned action instead of four
        # sequential collects (optimization r14, guide §2.6 overlap: the
        # union's four scan subtrees schedule inside one job, collapsing
        # 4 per-action floors into 1).  Rows/types identical.
        v_ts = t.version_as_of(ts_mid)
        frames = [
            t.read(spark, version=v).agg(
                F.lit(label).cast("long").alias("version"),
                F.count(F.lit(1)).alias("cnt"),
                F.sum("n_nationkey").cast("long").alias("sum_key"),
            )
            for label, v in ((0, 0), (1, 1), (2, 2), (100 + v_ts, v_ts))
        ]
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return _materialize(out)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "bt_restore_roundtrip",
    oracle=f"""
    WITH v0 AS (SELECT * FROM nation),
    v1 AS (SELECT * FROM v0 WHERE NOT (n_regionkey < 2)),
    v2 AS (SELECT * FROM v1 UNION ALL {_ORC_NATION_SHIFT})
    SELECT 0 AS version, 'create' AS op,
           (SELECT COUNT(*) FROM v0) AS cnt,
           (SELECT CAST(SUM(n_nationkey) AS BIGINT) FROM v0) AS sum_key
    UNION ALL SELECT 1, 'delete', (SELECT COUNT(*) FROM v1),
                      (SELECT CAST(SUM(n_nationkey) AS BIGINT) FROM v1)
    UNION ALL SELECT 2, 'append', (SELECT COUNT(*) FROM v2),
                      (SELECT CAST(SUM(n_nationkey) AS BIGINT) FROM v2)
    UNION ALL SELECT 3, 'restore', (SELECT COUNT(*) FROM v0),
                      (SELECT CAST(SUM(n_nationkey) AS BIGINT) FROM v0)
    ORDER BY version
    """,
)
def bt_restore_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESTORE to version 0 after a delete and an append: the restore
    commit must reproduce v0's contents exactly while every intermediate
    state stays time-travel readable (history is preserved, not erased)."""
    tmp = _scratch()
    try:
        t = BTable.create(spark, f"{tmp}/t", _nation(spark, sf_dir).coalesce(1))
        t.delete(spark, "n_regionkey < 2")
        t.append(spark, _nation_shifted(spark, sf_dir).coalesce(1))
        v_final = t.restore(0)
        hist = {c["version"]: c["op"] for c in t.history()}
        # history() is driver-side, so all four versioned aggregates union
        # into ONE action (optimization r14, guide §2.6 — see
        # bt_time_travel_read).  Rows/types identical.
        frames = [
            t.read(spark, version=v).agg(
                F.lit(v).cast("long").alias("version"),
                F.lit(hist[v]).alias("op"),
                F.count(F.lit(1)).alias("cnt"),
                F.sum("n_nationkey").cast("long").alias("sum_key"),
            )
            for v in range(v_final + 1)
        ]
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return _materialize(out)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


_EV_BASE_SQL = """
    SELECT event_id, ts, user_id, event_type,
           CAST(round(value * 100, 0) AS BIGINT) AS cents
    FROM events WHERE user_id < 40
"""

_EV_PREDS = [
    # label, Spark/btable where, DuckDB twin
    (
        "or_clause",
        "event_type == 'nosuch' OR event_type == 'click'",
        "(event_type = 'nosuch' OR event_type = 'click')",
    ),
    (
        "ts_sameday",
        "ts >= '2024-01-10 06:00:00' AND ts <= '2024-01-10 18:00:00'",
        "(ts >= TIMESTAMP '2024-01-10 06:00:00'"
        " AND ts <= TIMESTAMP '2024-01-10 18:00:00')",
    ),
    (
        "frac_int",
        "user_id < 39.5",
        "(user_id < 39.5)",
    ),
    (
        "mixed",
        "(ts >= '2024-01-05 00:00:00' AND ts < '2024-01-20 12:30:30') "
        "AND (event_type == 'click' OR event_type == 'view')",
        "(ts >= TIMESTAMP '2024-01-05 00:00:00'"
        " AND ts < TIMESTAMP '2024-01-20 12:30:30'"
        " AND (event_type = 'click' OR event_type = 'view'))",
    ),
]


def _events_btable(spark: SparkSession, sf_dir: str, tmp: str) -> BTable:
    """events (user_id < 40) written as four weekly single-file commits:
    per-file ts stats are near-disjoint, so a same-day predicate CAN prune
    — which is exactly what makes the ADVICE-r12 timestamp bug scoreable
    (a false prune drops a whole week of rows from the result)."""
    # lineage_cap (optimization r14, guide §5 caching note): the four
    # weekly commits below each action this same filtered frame — pin it
    # once so appends 2-4 read cached blocks instead of re-scanning and
    # re-filtering the events parquet per commit.
    ev = lineage_cap(
        load_table(spark, sf_dir, "events").filter("user_id < 40").select(
            "event_id",
            "ts",
            "user_id",
            "event_type",
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
    )
    weeks = [
        ev.filter("ts < '2024-01-08'"),
        ev.filter("ts >= '2024-01-08' AND ts < '2024-01-15'"),
        ev.filter("ts >= '2024-01-15' AND ts < '2024-01-22'"),
        ev.filter("ts >= '2024-01-22'"),
    ]
    t = BTable.create(spark, f"{tmp}/t", weeks[0].coalesce(1))
    for w in weeks[1:]:
        t.append(spark, w.coalesce(1))
    return t


@register(
    "bt_tricky_where_read",
    oracle=f"""
    WITH base AS ({_EV_BASE_SQL})
    {" UNION ALL ".join(
        f"SELECT '{label}' AS which, COUNT(*) AS cnt, "
        f"CAST(COALESCE(SUM(cents), 0) AS BIGINT) AS sum_cents FROM base WHERE {dq}"
        for label, _, dq in _EV_PREDS
    )}
    ORDER BY which
    """,
)
def bt_tricky_where_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """read(where=) through the three ADVICE-r12 false-prune shapes (OR
    clause, same-day timestamp range, fractional literal on an int
    column) over real corpus data: a file wrongly pruned on its stats
    loses rows and the value hash goes red."""
    tmp = _scratch()
    try:
        t = _events_btable(spark, sf_dir, tmp)
        frames = [
            t.read(spark, where=sw).agg(
                F.lit(label).alias("which"),
                F.count(F.lit(1)).alias("cnt"),
                F.coalesce(F.sum("cents"), F.lit(0)).alias("sum_cents"),
            )
            for label, sw, _ in _EV_PREDS
        ]
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return _materialize(out.orderBy("which"))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "bt_delete_tsrange_state",
    oracle=f"""
    WITH base AS ({_EV_BASE_SQL}),
    survivors AS (
      SELECT * FROM base
      WHERE NOT (ts >= TIMESTAMP '2024-01-10 06:00:00'
                 AND ts <= TIMESTAMP '2024-01-10 18:00:00')
        AND NOT (event_type = 'nosuch' OR event_type = 'click')
    )
    SELECT event_type, COUNT(*) AS cnt, CAST(SUM(cents) AS BIGINT) AS sum_cents,
           5 AS version
    FROM survivors GROUP BY event_type ORDER BY event_type
    """,
)
def bt_delete_tsrange_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-on-write DELETE through the same false-prune shapes: a
    same-day timestamp range, then an OR clause.  Before the r13 fix the
    first delete silently skipped every row (its file was pruned by the
    'T'-vs-space comparison) — the survivors, and the version counter
    (create + 3 appends + 2 effective deletes = 5), pin both semantics."""
    tmp = _scratch()
    try:
        t = _events_btable(spark, sf_dir, tmp)
        t.delete(
            spark, "ts >= '2024-01-10 06:00:00' AND ts <= '2024-01-10 18:00:00'"
        )
        v = t.delete(spark, "event_type == 'nosuch' OR event_type == 'click'")
        return _materialize(
            t.read(spark)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum("cents").alias("sum_cents"),
                F.lit(v).cast("int").alias("version"),
            )
            .orderBy("event_type")
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


_SKIP_BASE_SQL = """
    SELECT n_nationkey + 100 * d.day AS k,
           TIMESTAMP '2024-03-01 00:00:00'
             + (d.day - 1) * INTERVAL 1 DAY
             + n_nationkey * INTERVAL 2 MINUTE AS ts,
           n_name AS grp
    FROM nation, (SELECT UNNEST([1, 2, 3, 4]) AS day) d
"""

def _four_day_table(spark: SparkSession, sf_dir: str, tmp: str) -> BTable:
    """The structural data-skipping table: four single-file commits, one
    per synthetic day, derived from `nation` so the file layout — k ranges
    [100d, 100d+24], near-disjoint ts ranges, a shared grp range — is
    identical at every SF.  Shared by bt_stats_skipped_read and the wave-H
    IN-list pruning op (ops/btable_cdf.py)."""
    nat = _nation(spark, sf_dir)
    days = [
        nat.select(
            (F.col("n_nationkey") + 100 * d).alias("k"),
            F.expr(
                f"timestamp'2024-03-0{d} 00:00:00'"
                " + make_interval(0, 0, 0, 0, 0, n_nationkey * 2, 0)"
            ).alias("ts"),
            F.col("n_name").alias("grp"),
        )
        for d in (1, 2, 3, 4)
    ]
    t = BTable.create(spark, f"{tmp}/t", days[0].coalesce(1))
    for d in days[1:]:
        t.append(spark, d.coalesce(1))
    return t


_SKIP_PREDS = [
    # label, spark where, duckdb where, expected files scanned (of 4)
    (
        "day2_window",
        "ts >= '2024-03-02 00:10:00' AND ts <= '2024-03-02 00:30:00'",
        "(ts >= TIMESTAMP '2024-03-02 00:10:00'"
        " AND ts <= TIMESTAMP '2024-03-02 00:30:00')",
        1,
    ),
    ("or_no_prune", "grp == 'NATION_3' OR k == 101", "(grp = 'NATION_3' OR k = 101)", 4),
    # k spans 100..124 (day 1) .. 400..424 (day 4): fractional literals sit
    # ON file boundaries, where int() truncation used to flip the verdict
    ("frac_low", "k < 100.5", "(k < 100.5)", 1),
    ("frac_two_files", "k <= 200.5", "(k <= 200.5)", 2),
    ("conj_prune", "k >= 400 AND grp >= 'NATION_0'", "(k >= 400 AND grp >= 'NATION_0')", 1),
]


@register(
    "bt_stats_skipped_read",
    oracle=f"""
    WITH base AS ({_SKIP_BASE_SQL})
    {" UNION ALL ".join(
        f"SELECT '{label}' AS which, 4 AS files_total, "
        f"{scanned} AS files_scanned, COUNT(*) AS cnt, "
        f"CAST(COALESCE(SUM(k), 0) AS BIGINT) AS sum_k FROM base WHERE {dq}"
        for label, _, dq, scanned in _SKIP_PREDS
    )}
    ORDER BY which
    """,
)
def bt_stats_skipped_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data skipping with the pruned-file count ASSERTED (VERDICT r12
    item 2): a fully structural table — four single-file commits, one per
    synthetic day, derived from `nation` so the layout is identical at
    every SF — reads under predicates whose exact file-scan counts are
    known.  files_scanned is the live tablefmt.py:scan_file_count value;
    the oracle pins it as a literal, so BOTH under-pruning (a regression
    of the skipping optimization) and over-pruning (the correctness bug
    class) hash red."""
    tmp = _scratch()
    try:
        t = _four_day_table(spark, sf_dir, tmp)
        # scan_file_count is driver-side log math, so the five predicate
        # aggregates union into ONE action (optimization r14, guide §2.6 —
        # see bt_time_travel_read).  Rows/types identical.
        frames = [
            t.read(spark, where=sw).agg(
                F.lit(label).alias("which"),
                F.lit(4).alias("files_total"),
                F.lit(t.scan_file_count(sw)).alias("files_scanned"),
                F.count(F.lit(1)).alias("cnt"),
                F.coalesce(F.sum("k"), F.lit(0)).cast("long").alias("sum_k"),
            )
            for label, sw, _, _ in _SKIP_PREDS
        ]
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return _materialize(out.orderBy("which"))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


_CUST_CENTS = "CAST(round(c_acctbal * 100, 0) AS BIGINT)"


@register(
    "bt_merge_upsert_state",
    oracle=f"""
    WITH base AS (
      SELECT c_custkey, c_nationkey, {_CUST_CENTS} AS bal_cents, c_mktsegment
      FROM customer WHERE c_custkey % 10 < 5
    ),
    src AS (
      SELECT c_custkey, c_nationkey, -{_CUST_CENTS} AS bal_cents,
             'MERGED' AS c_mktsegment
      FROM customer WHERE c_custkey % 10 IN (4, 5)
    ),
    fin AS (
      SELECT * FROM base WHERE c_custkey % 10 < 4
      UNION ALL SELECT * FROM src
    )
    SELECT c_custkey % 10 AS bucket, COUNT(*) AS cnt,
           CAST(SUM(bal_cents) AS BIGINT) AS sum_bal,
           CAST(SUM(CASE WHEN c_mktsegment = 'MERGED' THEN 1 ELSE 0 END) AS BIGINT) AS n_merged
    FROM fin GROUP BY bucket ORDER BY bucket
    """,
)
def bt_merge_upsert_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-MERGE table state: base = customers with key%10 in 0..4,
    source = new row images for key%10 in {4,5} (negated balance,
    segment 'MERGED') — so %10==4 exercises when_matched=update and
    %10==5 when_not_matched=insert, in one upsert.  The oracle folds the
    same images relationally; any duplicated or lost row image (the
    ADVICE-r12 merge bugs) shifts cnt/sum_bal."""
    tmp = _scratch()
    try:
        cust = load_table(spark, sf_dir, "customer")
        cents = F.round(F.col("c_acctbal") * 100, 0).cast("long")
        base = cust.filter("c_custkey % 10 < 5").select(
            "c_custkey",
            "c_nationkey",
            cents.alias("bal_cents"),
            "c_mktsegment",
        )
        src = cust.filter("c_custkey % 10 IN (4, 5)").select(
            "c_custkey",
            "c_nationkey",
            (-cents).alias("bal_cents"),
            F.lit("MERGED").alias("c_mktsegment"),
        )
        t = BTable.create(spark, f"{tmp}/t", base.repartition(4))
        t.merge(spark, src, on="c_custkey")
        return _materialize(
            t.read(spark)
            .groupBy((F.col("c_custkey") % 10).alias("bucket"))
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum("bal_cents").alias("sum_bal"),
                F.sum(
                    F.when(F.col("c_mktsegment") == "MERGED", 1).otherwise(0)
                ).alias("n_merged"),
            )
            .orderBy("bucket")
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "bt_schema_evolution_read",
    oracle=f"""
    WITH fin AS (
      SELECT n_nationkey, n_regionkey, CAST(NULL AS BIGINT) AS extra
      FROM nation
      UNION ALL
      SELECT n_nationkey + 100, n_regionkey,
             CAST(n_nationkey * 2 AS BIGINT) AS extra
      FROM nation
    )
    SELECT n_regionkey, COUNT(*) AS cnt,
           CAST(SUM(CASE WHEN extra IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           CAST(SUM(extra) AS BIGINT) AS sum_extra
    FROM fin GROUP BY n_regionkey ORDER BY n_regionkey
    """,
)
def bt_schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALTER TABLE ADD COLUMN as a metadata-only commit: files written
    before the change must read back with the new column NULL (parquet
    missing-column fill under the explicit read schema), files written
    after carry real values — counted per region on both sides."""
    tmp = _scratch()
    try:
        t = BTable.create(spark, f"{tmp}/t", _nation(spark, sf_dir).coalesce(1))
        t.add_column(spark, "extra", "bigint")
        t.append(
            spark,
            _nation_shifted(spark, sf_dir)
            .withColumn("extra", (F.col("n_nationkey") - 100).cast("long") * 2)
            .coalesce(1),
        )
        return _materialize(
            t.read(spark)
            .groupBy("n_regionkey")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum(
                    F.when(F.col("extra").isNull(), 1).otherwise(0)
                ).alias("n_null"),
                F.sum("extra").alias("sum_extra"),
            )
            .orderBy("n_regionkey")
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "bt_optimize_compact_state",
    oracle="""
    SELECT 5 AS version, 1 AS n_files,
           COUNT(*) AS cnt, CAST(SUM(n_nationkey) AS BIGINT) AS sum_key,
           COUNT(*) AS cnt_pre
    FROM nation
    """,
)
def bt_optimize_compact_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE bin-packs five single-file region commits into one file
    (version 5) without changing the logical table, and the pre-compaction
    version stays time-travel readable (cnt_pre reads version 4)."""
    tmp = _scratch()
    try:
        nat = _nation(spark, sf_dir)
        t = BTable.create(spark, f"{tmp}/t", nat.filter("n_regionkey = 0").coalesce(1))
        for r in (1, 2, 3, 4):
            t.append(spark, nat.filter(f"n_regionkey = {r}").coalesce(1))
        v = t.optimize(spark)
        cnt_pre = t.read(spark, version=v - 1).count()
        r = t.read(spark).agg(
            F.count(F.lit(1)), F.sum("n_nationkey")
        ).collect()[0]
        return spark.createDataFrame(
            [(v, t.scan_file_count(), r[0], r[1], cnt_pre)],
            "version int, n_files int, cnt bigint, sum_key bigint, "
            "cnt_pre bigint",
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
