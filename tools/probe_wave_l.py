"""Wave-L candidate probes — DESIGNS ONLY, nothing registered (round
14's sanctioned net-new surface was wave H; this file never imports
biggie_spark.registry.register).

Scored-surface candidates for the two btable capabilities built in this
round-14 session after wave K: per-file BLOOM-FILTER file skipping
(create(bloom_cols=...) / set_bloom_index / sidecar pruning in
read/delete/scan_file_count) and PROTOCOL TABLE FEATURES (monotone
reader/writer feature stamps; snapshots fail closed on unknown reader
features, the commit choke point refuses unknown writer features).
Each probe is a (spark_fn, oracle_sql) pair in the exact shape a future
`@register` would take, run through the driver-faithful compare:

    python tools/probe_wave_l.py [sf_dir] [name ...]

Determinism notes (the wave-L analogue of the btable_ops contract):

* bloom scan counts are contract because the hashing is md5 of pinned
  canonical strings over a pinned per-commit coalesce(1) layout — no
  partitioner or float nondeterminism anywhere; sentinel rows pin every
  file's min/max to the full hex range so the literals measure BLOOM
  pruning, never accidental stats pruning;
* probed keys avoid the sentinel positions (k % 100 in {0, 24});
* protocol gates are asserted by COUNTING UnsupportedTableFeature
  raises around a fixed op sequence — booleans of behavior, no
  message-text or version-layout dependence;
* forged future-feature commits are hand-written log files, which is
  exactly how a future writer would look to this reader.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biggie_spark.ops.btable_ops import _materialize, _nation, _scratch
from biggie_spark.tablefmt import (
    BTable,
    UnsupportedTableFeature,
    _log_path,
    _read_log,
)
from tests.compare import normalize_rows

PROBES: dict[str, tuple] = {}


def probe(name: str, oracle: str):
    def deco(fn):
        PROBES[name] = (fn, oracle)
        return fn

    return deco


def _md5(v) -> str:
    return hashlib.md5(str(v).encode()).hexdigest()


def _doc_expr():
    """doc column: md5 of the key, with min/max sentinels at the k%100
    extremes so per-file string stats span the whole hex range."""
    return (
        F.when(F.pmod("k", F.lit(100)) == 0, F.lit("0" * 32))
        .when(F.pmod("k", F.lit(100)) == 24, F.lit("f" * 32))
        .otherwise(F.md5(F.col("k").cast("string")))
        .alias("doc")
    )


def _grid_frames(spark: SparkSession, sf_dir: str):
    """Four 25-row frames: k = nationkey + {0,100,200,300}, doc=md5(k)."""
    nat = _nation(spark, sf_dir).select(
        F.col("n_nationkey").cast("long").alias("nk")
    )
    for off in (0, 100, 200, 300):
        yield (
            nat.select((F.col("nk") + off).alias("k"))
            .coalesce(1)
            .select("k", _doc_expr())
        )


_ORC_GRID = """
    SELECT n_nationkey + 0 AS k FROM nation
    UNION ALL SELECT n_nationkey + 100 FROM nation
    UNION ALL SELECT n_nationkey + 200 FROM nation
    UNION ALL SELECT n_nationkey + 300 FROM nation
"""


@probe(
    "bt_bloom_pruned_read",
    oracle=f"""
    WITH g AS ({_ORC_GRID})
    SELECT 'present_mid' AS probe, 1 AS files_scanned,
           COUNT(*) AS cnt, CAST(SUM(k) AS BIGINT) AS sum_key
    FROM g WHERE k = 207
    UNION ALL SELECT 'absent', 0, COUNT(*), CAST(SUM(k) AS BIGINT)
    FROM g WHERE FALSE
    UNION ALL SELECT 'in_mixed', 1, COUNT(*), CAST(SUM(k) AS BIGINT)
    FROM g WHERE k = 7
    UNION ALL SELECT 'stats_and_bloom', 1, COUNT(*), CAST(SUM(k) AS BIGINT)
    FROM g WHERE k >= 100 AND k <= 224 AND k = 113
    ORDER BY probe
    """,
)
def bt_bloom_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-lookup file skipping via per-file bloom sidecars: equality
    and IN probes on a high-cardinality md5 column prune to the single
    true-hit file (or zero files) even though every file's min/max
    stats span the full hex range (sentinel rows pin that).  Cites the
    public Delta bloom-filter-index idea; tablefmt._write_blooms /
    _bloom_excludes."""
    tmp = _scratch()
    try:
        t = None
        for df in _grid_frames(spark, sf_dir):
            if t is None:
                t = BTable.create(
                    spark,
                    os.path.join(tmp, "t"),
                    df,
                    bloom_cols=["doc"],
                    bloom_bits=2048,
                    bloom_k=7,
                )
            else:
                t.append(spark, df)

        def row(label: str, where: str):
            agg = (
                t.read(spark, where=where)
                .agg(
                    F.count(F.lit(1)).alias("cnt"),
                    F.sum("k").cast("long").alias("sum_key"),
                )
                .collect()[0]
            )
            return (
                label,
                t.scan_file_count(where),
                agg["cnt"],
                agg["sum_key"],
            )

        rows = [
            row("present_mid", f"doc == '{_md5(207)}'"),
            row("absent", f"doc == '{_md5(999999)}'"),
            row("in_mixed", f"doc IN ('{_md5(7)}', '{_md5(888888)}')"),
            row(
                "stats_and_bloom",
                f"k >= 100 AND k <= 224 AND doc == '{_md5(113)}'",
            ),
        ]
        return spark.createDataFrame(
            sorted(rows),
            "probe string, files_scanned int, cnt bigint, sum_key bigint",
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@probe(
    "bt_bloom_backfill_state",
    oracle=f"""
    WITH g AS ({_ORC_GRID})
    SELECT 'pre_absent' AS probe, 2 AS files_scanned,
           COUNT(*) AS cnt, CAST(SUM(k) AS BIGINT) AS sum_key
    FROM g WHERE FALSE
    UNION ALL SELECT 'pre_present_new', 3, COUNT(*), CAST(SUM(k) AS BIGINT)
    FROM g WHERE k = 307
    UNION ALL SELECT 'post_absent', 0, COUNT(*), CAST(SUM(k) AS BIGINT)
    FROM g WHERE FALSE
    UNION ALL SELECT 'post_present_old', 1, COUNT(*), CAST(SUM(k) AS BIGINT)
    FROM g WHERE k = 113
    ORDER BY probe
    """,
)
def bt_bloom_backfill_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """set_bloom_index on an EXISTING table applies to new files only
    (old files have no sidecar -> must-scan, conservative), and an
    OPTIMIZE rewrite backfills the whole table under the active config.
    Scores the config lifecycle: 2 pre-index files must-scan + 2
    post-index files prune, then post-optimize (one compacted file)
    every absent probe prunes to zero."""
    tmp = _scratch()
    try:
        frames = list(_grid_frames(spark, sf_dir))
        t = BTable.create(spark, os.path.join(tmp, "t"), frames[0])
        t.append(spark, frames[1])
        t.set_bloom_index(["doc"], bits=2048, k=7)
        t.append(spark, frames[2])
        t.append(spark, frames[3])

        def row(label: str, where: str):
            agg = (
                t.read(spark, where=where)
                .agg(
                    F.count(F.lit(1)).alias("cnt"),
                    F.sum("k").cast("long").alias("sum_key"),
                )
                .collect()[0]
            )
            return (
                label,
                t.scan_file_count(where),
                agg["cnt"],
                agg["sum_key"],
            )

        rows = [
            # 2 sidecar-less old files must-scan; both new files prune
            row("pre_absent", f"doc == '{_md5(777777)}'"),
            # true hit in a NEW file: 2 must-scan + 1 bloom hit
            row("pre_present_new", f"doc == '{_md5(307)}'"),
        ]
        t.optimize(spark)  # compacts all four 25-row files into one
        rows += [
            row("post_absent", f"doc == '{_md5(777777)}'"),
            row("post_present_old", f"doc == '{_md5(113)}'"),
        ]
        return spark.createDataFrame(
            sorted(rows),
            "probe string, files_scanned int, cnt bigint, sum_key bigint",
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@probe(
    "bt_protocol_gate_state",
    oracle="""
    SELECT 3 AS blocked_reader, 3 AS blocked_writer,
           CAST(SUM(n_nationkey) AS BIGINT) AS pre_forge_sum,
           CAST(SUM(n_nationkey) - 3 AS BIGINT) AS writer_forged_sum,
           CAST(2 AS BIGINT) AS n_protocol_commits
    FROM nation
    """,
)
def bt_protocol_gate_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Protocol table features fail CLOSED: a forged commit requiring an
    unknown READER feature blocks read()/count_rows()/changes() (3
    raises) but time travel before it still folds relationally; an
    unknown WRITER feature leaves reads live (sum still matches after a
    real DV delete) while append/delete/optimize refuse (3 raises).
    Also pins that exactly the two feature-introducing commits stamped
    a protocol entry (DV delete -> deletion-vectors, rename ->
    column-mapping).  Cites the public Delta table-features idea;
    tablefmt.SUPPORTED_READER_FEATURES / _features_of_doc."""
    tmp = _scratch()
    try:
        nat = _nation(spark, sf_dir).select(
            F.col("n_nationkey").cast("long").alias("k"), "n_name"
        )
        # table A: real features, then a forged unknown READER feature
        ta = BTable.create(spark, os.path.join(tmp, "a"), nat.coalesce(1))
        ta.delete(spark, "k == 3", mode="merge_on_read")  # deletion-vectors
        ta.rename_column("n_name", "nation_name")  # column-mapping
        pre_version = ta.snapshot().version
        pre_sum = (
            ta.read(spark).agg(F.sum("k").cast("long")).collect()[0][0]
        ) + 3  # add back the DV-deleted key for the relational oracle
        n_protocol = sum(
            1 for c in _read_log(ta.path) if "protocol" in c
        )
        v = pre_version + 1
        with open(_log_path(ta.path, v), "w") as f:
            json.dump(
                {
                    "version": v,
                    "ts": 0.0,
                    "op": "future",
                    "protocol": {"reader": ["v9-encryption"], "writer": []},
                },
                f,
            )
        blocked_reader = 0
        for attempt in (
            lambda: ta.read(spark).count(),
            lambda: ta.count_rows(),
            lambda: ta.changes(spark, 0).count(),
        ):
            try:
                attempt()
            except UnsupportedTableFeature:
                blocked_reader += 1
        # time travel BEFORE the forged commit still reads
        tt_ok = (
            ta.read(spark, version=pre_version)
            .agg(F.sum("k").cast("long"))
            .collect()[0][0]
            == pre_sum - 3
        )

        # table B: forged unknown WRITER feature — reads live, writes die
        tb = BTable.create(spark, os.path.join(tmp, "b"), nat.coalesce(1))
        tb.delete(spark, "k == 3", mode="merge_on_read")
        v = tb.snapshot().version + 1
        with open(_log_path(tb.path, v), "w") as f:
            json.dump(
                {
                    "version": v,
                    "ts": 0.0,
                    "op": "future",
                    "protocol": {"reader": [], "writer": ["auto-compact-2"]},
                },
                f,
            )
        writer_forged_sum = (
            tb.read(spark).agg(F.sum("k").cast("long")).collect()[0][0]
        )
        blocked_writer = 0
        for attempt in (
            lambda: tb.append(spark, nat.limit(1)),
            lambda: tb.delete(spark, "k == 5"),
            lambda: tb.optimize(spark),
        ):
            try:
                attempt()
            except UnsupportedTableFeature:
                blocked_writer += 1
        return spark.createDataFrame(
            [
                (
                    blocked_reader if tt_ok else -1,
                    blocked_writer,
                    pre_sum,
                    writer_forged_sum,
                    n_protocol,
                )
            ],
            "blocked_reader int, blocked_writer int, pre_forge_sum bigint,"
            " writer_forged_sum bigint, n_protocol_commits bigint",
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@probe(
    "bt_clone_divergence_state",
    oracle="""
    WITH nk AS (SELECT n_nationkey AS k FROM nation)
    SELECT 0 AS clone_parquet_files,
           (SELECT CAST(SUM(k) AS BIGINT) FROM nk) AS clone_sum_at_birth,
           (SELECT CAST(SUM(k) AS BIGINT) FROM nk WHERE k < 20)
               AS clone_sum_after_dml,
           (SELECT CAST(SUM(k) AS BIGINT) FROM nk WHERE k <> 3)
               AS src_sum_after_dml,
           (SELECT COUNT(*) FROM nk WHERE k >= 20) AS n_clone_deleted
    """,
)
def bt_clone_divergence_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shallow clone: zero data files copied (literal), reads equal at
    birth, then the two tables DIVERGE independently — a COW delete on
    the clone never touches the source, a DV delete on the source never
    reaches the clone.  Exercises absolute-path adds through the
    position machinery (_rel_tail).  Cites the public Delta SHALLOW
    CLONE idea; tablefmt.BTable.clone."""
    import glob as _glob

    tmp = _scratch()
    try:
        nat = _nation(spark, sf_dir).select(
            F.col("n_nationkey").cast("long").alias("k"), "n_name"
        )
        src = BTable.create(
            spark, os.path.join(tmp, "src"), nat.coalesce(1)
        )
        clone = src.clone(os.path.join(tmp, "dev"))
        n_parquet = len(
            _glob.glob(
                os.path.join(clone.path, "**", "*.parquet"), recursive=True
            )
        )
        sum_birth = (
            clone.read(spark).agg(F.sum("k").cast("long")).collect()[0][0]
        )
        clone.delete(spark, "k >= 20")
        n_clone_deleted = 25 - clone.read(spark).count()
        src.delete(spark, "k == 3", mode="merge_on_read")
        clone_sum = (
            clone.read(spark).agg(F.sum("k").cast("long")).collect()[0][0]
        )
        src_sum = (
            src.read(spark).agg(F.sum("k").cast("long")).collect()[0][0]
        )
        return spark.createDataFrame(
            [(n_parquet, sum_birth, clone_sum, src_sum, n_clone_deleted)],
            "clone_parquet_files int, clone_sum_at_birth bigint,"
            " clone_sum_after_dml bigint, src_sum_after_dml bigint,"
            " n_clone_deleted bigint",
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@probe(
    "bt_optimize_where_state",
    oracle=f"""
    WITH g AS ({_ORC_GRID})
    SELECT 3 AS files_after, 2 AS untouched_files,
           CAST((SELECT SUM(k) FROM g) AS BIGINT) AS sum_all,
           CAST((SELECT SUM(k) FROM g WHERE k >= 200) AS BIGINT)
               AS sum_compacted
    """,
)
def bt_optimize_where_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE WHERE: predicate-scoped compaction — only the files
    whose stats MAY match the predicate are bin-packed (4 -> 3 files:
    the two k>=200 files compact into one, the two below survive
    byte-identical), contents fold relationally.  The 100 TB shape:
    compact one day's streaming ingest without touching the other ten
    years.  tablefmt.BTable.optimize(where=...)."""
    tmp = _scratch()
    try:
        t = None
        for df in _grid_frames(spark, sf_dir):
            if t is None:
                t = BTable.create(spark, os.path.join(tmp, "t"), df)
            else:
                t.append(spark, df)
        before = dict(t.snapshot().files)
        t.optimize(spark, where="k >= 200")
        after = t.snapshot().files
        untouched = sum(1 for rel in after if rel in before)
        agg = (
            t.read(spark)
            .agg(
                F.sum("k").cast("long").alias("sum_all"),
                F.sum(F.when(F.col("k") >= 200, F.col("k")))
                .cast("long")
                .alias("sum_compacted"),
            )
            .collect()[0]
        )
        return spark.createDataFrame(
            [
                (
                    len(after),
                    untouched,
                    agg["sum_all"],
                    agg["sum_compacted"],
                )
            ],
            "files_after int, untouched_files int, sum_all bigint,"
            " sum_compacted bigint",
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@probe(
    "bt_type_widen_read",
    oracle="""
    WITH g AS (
        SELECT n_nationkey AS k FROM nation
        UNION ALL SELECT n_nationkey + 100 FROM nation
    )
    SELECT 'bigint' AS k_type, 'double' AS x_type,
           1 AS files_untouched,
           COUNT(*) AS cnt, CAST(SUM(k) AS BIGINT) AS sum_k,
           CAST(SUM(k) AS BIGINT) AS sum_x2
    FROM g
    """,
)
def bt_type_widen_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lossless type widening via mergeSchema: an int/float table takes
    a bigint/double append by widening the TABLE type metadata-only —
    the create-commit file is carried untouched (literal) and its
    int32/float physical encodings read back promoted, folding
    relationally with the wide rows.  x = k * 0.5 keeps the float chain
    exact (halves are representable at every width); the oracle checks
    sum(2x) == sum(k) as BIGINT.  Cites the public Delta typeWidening
    idea; tablefmt._evolve/_WIDENS."""
    tmp = _scratch()
    try:
        nat = _nation(spark, sf_dir).select(
            F.col("n_nationkey").cast("long").alias("nk")
        )

        def frame(off, ktype, xtype):
            return (
                nat.select((F.col("nk") + off).alias("kk"))
                .coalesce(1)
                .select(
                    F.col("kk").cast(ktype).alias("k"),
                    (F.col("kk") * 0.5).cast(xtype).alias("x"),
                )
            )

        t = BTable.create(
            spark, os.path.join(tmp, "t"), frame(0, "int", "float")
        )
        before = set(t.snapshot().files)
        t.append(spark, frame(100, "bigint", "double"), merge_schema=True)
        untouched = sum(1 for rel in t.snapshot().files if rel in before)
        df = t.read(spark)
        types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        agg = df.agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("k").cast("long").alias("sum_k"),
            F.sum(F.col("x") * 2).cast("long").alias("sum_x2"),
        ).collect()[0]
        return spark.createDataFrame(
            [
                (
                    types["k"],
                    types["x"],
                    untouched,
                    agg["cnt"],
                    agg["sum_k"],
                    agg["sum_x2"],
                )
            ],
            "k_type string, x_type string, files_untouched int,"
            " cnt bigint, sum_k bigint, sum_x2 bigint",
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    builder = (
        SparkSession.builder.master("local[8]")
        .appName("probe-wave-l")
        .config("spark.ui.enabled", "false")
    )
    # same hostile-config hook as tools/driver_sim.py
    for kv in filter(None, os.environ.get("DRIVER_SIM_CONF", "").split(",")):
        k, _, v = kv.partition("=")
        print(f"hostile conf: {k}={v}")
        builder = builder.config(k.strip(), v.strip())
    spark = builder.getOrCreate()
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
    raise SystemExit(main())
