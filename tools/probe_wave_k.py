"""Wave-K candidate probes — DESIGNS ONLY, nothing registered (round
14's sanctioned net-new surface was wave H; this file never imports
biggie_spark.registry.register).

Scored-surface candidates for the wave-K btable features built later in
round 14 — column mapping (rename/drop, tablefmt.rename_column/
drop_column) and row tracking (stable row ids, enable_row_tracking /
create(row_tracking=True) / changes(with_row_ids=True)).  Each probe is
a (spark_fn, oracle_sql) pair in the exact shape a future `@register`
would take, run through the driver-faithful compare:

    python tools/probe_wave_k.py [sf_dir] [name ...]

Determinism notes (the wave-K analogue of the btable_ops contract):

* rename/drop are metadata-only, so contents after them are the same
  relational fold as before — the oracle just uses the new names;
* row ids are deterministic ONLY where the op owns the initial layout:
  a dense-key, orderBy + coalesce(1) create makes id == key, and every
  LATER rewrite must carry those ids (that carrying is what the op
  scores).  Fresh ids from rewrites are asserted as a range predicate
  (id >= pre-merge high-watermark), never as exact values — their
  within-file positions belong to Spark's partitioner, not the
  contract.
"""

from __future__ import annotations

import hashlib
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biggie_spark.ops.btable_ops import _materialize, _nation, _scratch
from biggie_spark.tablefmt import BTable
from tests.compare import normalize_rows

PROBES: dict[str, tuple] = {}


def probe(name: str, oracle: str):
    def deco(fn):
        PROBES[name] = (fn, oracle)
        return fn

    return deco


def _nation_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nation with key/region as BIGINT (stable across add_column ddl)."""
    return _nation(spark, sf_dir).select(
        F.col("n_nationkey").cast("long").alias("n_nationkey"),
        "n_name",
        F.col("n_regionkey").cast("long").alias("n_regionkey"),
    )


_ORC_GRID = """
    SELECT n_nationkey + 0 AS k FROM nation
    UNION ALL SELECT n_nationkey + 100 FROM nation
    UNION ALL SELECT n_nationkey + 200 FROM nation
    UNION ALL SELECT n_nationkey + 300 FROM nation
"""


@probe(
    "bt_rename_pruned_read",
    oracle=f"""
    WITH g AS ({_ORC_GRID})
    SELECT 'full' AS probe, 4 AS files_scanned,
           COUNT(*) AS cnt, CAST(SUM(k) AS BIGINT) AS sum_key FROM g
    UNION ALL SELECT 'mid', 2, COUNT(*), CAST(SUM(k) AS BIGINT)
    FROM g WHERE k >= 100 AND k <= 224
    UNION ALL SELECT 'point_hi', 1, COUNT(*), CAST(SUM(k) AS BIGINT)
    FROM g WHERE k > 250
    ORDER BY probe
    """,
)
def bt_rename_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stats pruning must FOLLOW a column rename: a 4-file range-disjoint
    k-grid is renamed k->key metadata-only, then per-predicate
    files_scanned literals + contents are asserted on the NEW name.  The
    stats keys in the log stay physical ('k'); a pruning path that
    looked them up by logical name would must-scan (files_scanned=4
    hashes red), and one that matched the wrong column would
    false-prune (cnt hashes red).  tablefmt.Snapshot.file_maybe_matches
    is the surface under test."""
    tmp = _scratch()
    try:
        t = None
        for i in range(4):
            df = (
                _nation(spark, sf_dir)
                .select(
                    (F.col("n_nationkey").cast("long") + (100 * i)).alias("k")
                )
                .coalesce(1)
            )
            if t is None:
                t = BTable.create(spark, f"{tmp}/t", df)
            else:
                t.append(spark, df)
        t.rename_column("k", "key")
        rows = []
        for label, where in (
            ("full", None),
            ("mid", "key >= 100 AND key <= 224"),
            ("point_hi", "key > 250"),
        ):
            n_files = t.scan_file_count(where)
            agg = (
                t.read(spark, where=where)
                .agg(F.count(F.lit(1)), F.sum("key"))
                .collect()[0]
            )
            rows.append((label, n_files, agg[0], agg[1]))
        return _materialize(
            spark.createDataFrame(
                rows, "probe string, files_scanned int, cnt bigint, sum_key bigint"
            ).orderBy("probe")
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@probe(
    "bt_drop_readd_state",
    oracle="""
    SELECT 'v0' AS probe, COUNT(*) AS cnt,
           0 AS n_null_reg,
           CAST(SUM(n_regionkey) AS BIGINT) AS sum_reg
    FROM nation
    UNION ALL SELECT 'final_old', COUNT(*), COUNT(*), 0 FROM nation
    UNION ALL SELECT 'final_new', COUNT(*), 0,
           CAST(SUM(n_regionkey + 10) AS BIGINT) FROM nation
    ORDER BY probe
    """,
)
def bt_drop_readd_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DROP COLUMN then re-ADD the same name: the reborn column must read
    NULL for every pre-drop row (fresh physical name — the old files
    still hold the bytes; resurrection hashes red on n_null_reg), new
    appends land in it, and time travel to v0 still reads the ORIGINAL
    column values under the old schema."""
    tmp = _scratch()
    try:
        base = _nation_cast(spark, sf_dir)
        t = BTable.create(spark, f"{tmp}/t", base.coalesce(1))  # v0
        t.drop_column("n_regionkey")  # v1
        t.add_column(spark, "n_regionkey", "bigint")  # v2 (fresh physical)
        t.append(
            spark,
            base.select(
                (F.col("n_nationkey") + 100).alias("n_nationkey"),
                "n_name",
                (F.col("n_regionkey") + 10).alias("n_regionkey"),
            ).coalesce(1),
        )  # v3
        v0 = t.read(spark, version=0).agg(
            F.count(F.lit(1)), F.sum("n_regionkey")
        ).collect()[0]
        fin = t.read(spark)
        old = fin.filter("n_nationkey < 100").agg(
            F.count(F.lit(1)),
            F.sum(F.col("n_regionkey").isNull().cast("long")),
            F.coalesce(F.sum("n_regionkey"), F.lit(0)),
        ).collect()[0]
        new = fin.filter("n_nationkey >= 100").agg(
            F.count(F.lit(1)),
            F.sum(F.col("n_regionkey").isNull().cast("long")),
            F.coalesce(F.sum("n_regionkey"), F.lit(0)),
        ).collect()[0]
        rows = [
            ("v0", v0[0], 0, v0[1]),
            ("final_old", old[0], old[1], old[2]),
            ("final_new", new[0], new[1], new[2]),
        ]
        return _materialize(
            spark.createDataFrame(
                rows, "probe string, cnt bigint, n_null_reg bigint, sum_reg bigint"
            ).orderBy("probe")
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


_ORC_SURV = "SELECT n_nationkey FROM nation WHERE n_nationkey NOT BETWEEN 10 AND 19"


@probe(
    "bt_row_id_stability_state",
    oracle=f"""
    WITH surv AS ({_ORC_SURV})
    SELECT 'carried' AS kind, COUNT(*) AS cnt,
           CAST(SUM(n_nationkey) AS BIGINT) AS sum_key,
           COUNT(*) AS n_id_eq_key
    FROM surv
    UNION ALL
    SELECT 'fresh', 5, CAST(100+101+102+103+104 AS BIGINT), 0
    ORDER BY kind
    """,
)
def bt_row_id_stability_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row ids survive the full DML gauntlet: a dense-ordered coalesce(1)
    create pins id == key (0..24); then MERGE (updates keys %5 == 0,
    inserts 100..104), a COW DELETE of 10..19, and OPTIMIZE each rewrite
    the data — every carried row must still satisfy _row_id == key
    (n_id_eq_key hashes red if a rewrite drops or reshuffles ids), and
    every merge-inserted row's id must come from a FRESH allocation
    (>= 25, the pre-merge high-watermark)."""
    tmp = _scratch()
    try:
        base = (
            _nation(spark, sf_dir)
            .select(F.col("n_nationkey").cast("long").alias("k"), "n_name")
            .orderBy("k")
            .coalesce(1)
        )
        t = BTable.create(spark, f"{tmp}/t", base, row_tracking=True)  # id==k
        src = base.filter("k % 5 = 0").select(
            "k", F.concat(F.col("n_name"), F.lit("_U")).alias("n_name")
        ).unionByName(
            base.filter("k < 5").select(
                (F.col("k") + 100).alias("k"),
                F.concat(F.col("n_name"), F.lit("_N")).alias("n_name"),
            )
        )
        t.merge(spark, src, on="k")
        t.delete(spark, "k >= 10 AND k < 20")
        t.optimize(spark)
        got = t.read(spark, with_row_ids=True)
        carried = got.filter("k < 100").agg(
            F.count(F.lit(1)),
            F.sum("k"),
            F.sum((F.col("_row_id") == F.col("k")).cast("long")),
        ).collect()[0]
        fresh = got.filter("k >= 100").agg(
            F.count(F.lit(1)),
            F.sum("k"),
            F.sum((F.col("_row_id") >= 25).cast("long")),
        ).collect()[0]
        rows = [
            ("carried", carried[0], carried[1], carried[2]),
            # n_id_eq_key repurposed as "ids NOT fresh" for the fresh
            # bucket: every fresh id must be >= hwm, so the count of
            # fresh-range ids equals cnt -> emit cnt - matches = 0
            ("fresh", fresh[0], fresh[1], fresh[0] - fresh[2]),
        ]
        return _materialize(
            spark.createDataFrame(
                rows, "kind string, cnt bigint, sum_key bigint, n_id_eq_key bigint"
            ).orderBy("kind")
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@probe(
    "bt_cdf_rowid_update_state",
    oracle="""
    SELECT 'paired' AS kind, COUNT(*) AS cnt,
           CAST(SUM(n_nationkey) AS BIGINT) AS sum_key
    FROM nation
    UNION ALL
    SELECT 'fresh', 5, CAST(100+101+102+103+104 AS BIGINT)
    ORDER BY kind
    """,
)
def bt_cdf_rowid_update_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """changes(with_row_ids=True) discriminates updates: after a MERGE
    over a single-file tracked table, every insert image whose _row_id
    also appears as a delete is a carried/updated row (all 25 original
    keys), and the 5 merge-inserts are the ONLY unpaired ids.  A feed
    that re-minted ids on rewrite (pairing breaks, 'paired' hashes red)
    or leaked ids across rows fails."""
    tmp = _scratch()
    try:
        base = (
            _nation(spark, sf_dir)
            .select(F.col("n_nationkey").cast("long").alias("k"), "n_name")
            .orderBy("k")
            .coalesce(1)
        )
        t = BTable.create(spark, f"{tmp}/t", base, row_tracking=True)
        src = base.filter("k % 5 = 0").select(
            "k", F.concat(F.col("n_name"), F.lit("_U")).alias("n_name")
        ).unionByName(
            base.filter("k < 5").select(
                (F.col("k") + 100).alias("k"),
                F.concat(F.col("n_name"), F.lit("_N")).alias("n_name"),
            )
        )
        t.merge(spark, src, on="k")
        ch = t.changes(spark, 0, with_row_ids=True)
        dels = ch.filter("_change_type = 'delete'").select(
            F.col("_row_id").alias("_d_id")
        )
        ins = ch.filter("_change_type = 'insert'")
        paired = ins.join(
            F.broadcast(dels), ins["_row_id"] == dels["_d_id"], "left_semi"
        )
        fresh = ins.join(
            F.broadcast(dels), ins["_row_id"] == dels["_d_id"], "left_anti"
        )
        p = paired.agg(F.count(F.lit(1)), F.sum("k")).collect()[0]
        f = fresh.agg(F.count(F.lit(1)), F.sum("k")).collect()[0]
        return _materialize(
            spark.createDataFrame(
                [("paired", p[0], p[1]), ("fresh", f[0], f[1])],
                "kind string, cnt bigint, sum_key bigint",
            ).orderBy("kind")
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@probe(
    "bt_rename_feed_source_read",
    oracle="""
    SELECT COUNT(*) AS cnt,
           CAST(SUM(n_nationkey + 100) AS BIGINT) AS sum_key,
           CAST(SUM(n_regionkey) AS BIGINT) AS sum_region,
           COUNT(DISTINCT 2) AS n_versions
    FROM nation
    """,
)
def bt_rename_feed_source_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The btable_changes PYTHON DATA SOURCE across a rename: the feed's
    pyarrow read path must look up the RENAMED column by its physical
    on-file name (btable_stream._FeedReaderMixin colmap resolution) — a
    logical-name lookup would null-fill region_id and sum_region hashes
    red.  Window = (1, 2]: only the post-rename append."""
    from biggie_spark.btable_stream import register_btable_source

    register_btable_source(spark)
    tmp = _scratch()
    try:
        base = _nation_cast(spark, sf_dir)
        t = BTable.create(spark, f"{tmp}/t", base.coalesce(1))  # v0
        t.rename_column("n_regionkey", "region_id")  # v1
        t.append(
            spark,
            base.select(
                (F.col("n_nationkey") + 100).alias("n_nationkey"),
                "n_name",
                F.col("n_regionkey").alias("region_id"),
            ).coalesce(1),
        )  # v2
        got = (
            spark.read.format("btable_changes")
            .option("path", t.path)
            .option("startingVersion", 1)
            .load()
        )
        return _materialize(
            got.agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum("n_nationkey").alias("sum_key"),
                F.sum("region_id").alias("sum_region"),
                F.count_distinct("_commit_version").alias("n_versions"),
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("probe-wave-k")
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
    raise SystemExit(main())
