"""btable scale probe: MEASURED evidence that the copy-on-write format's
two scale claims hold on real data volumes (SCALE.md round-13):

1. **Data skipping**: a clustered table's one-day read scans ~1/Nth of
   the files and runs proportionally faster than the full scan.
2. **Merge proportionality**: a merge touching ~0.1% of keys rewrites
   ~the files containing them (1-2 of N), not the table.

Usage: python tools/btable_scale_probe.py [sf_dir]   (default sf0.1)
Prints one JSON line; numbers go into SCALE.md by hand.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from biggie_spark.io import load_table
from biggie_spark.session import get_spark
from biggie_spark.tablefmt import BTable

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, round(time.perf_counter() - t0, 3)


def main() -> None:
    spark = get_spark(app_name="btable-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="btable_probe_")
    rec: dict = {"sf_dir": SF}
    try:
        # --- 1. clustered events table, one-day pruned read ---------------
        ev = load_table(spark, SF, "events").select(
            "event_id", "ts", "user_id", "event_type",
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
        n_rows = ev.count()
        t = BTable.create(
            spark, f"{tmp}/ev", ev, cluster_by=["ts"],
            cluster_file_rows=max(1000, n_rows // 30),
        )
        rec["events_rows"] = n_rows
        rec["files_total"] = t.scan_file_count()
        day = "ts >= '2024-01-10 00:00:00' AND ts < '2024-01-11 00:00:00'"
        rec["files_day_scan"] = t.scan_file_count(day)
        # apples-to-apples: same day filter, all files vs pruned files
        # (warm both paths once so JVM/codegen startup doesn't skew)
        t.read(spark).filter(day).count()
        t.read(spark, where=day).count()
        _, rec["t_day_unpruned_s"] = timed(
            lambda: t.read(spark).filter(day).count()
        )
        _, rec["t_day_pruned_s"] = timed(
            lambda: t.read(spark, where=day).count()
        )
        rec["day_rows"] = t.read(spark, where=day).count()

        # --- 2. merge proportionality on orders ---------------------------
        orders = load_table(spark, SF, "orders").select(
            "o_orderkey", "o_custkey",
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("price_cents"),
            "o_orderstatus",
        )
        n_ord = orders.count()
        to = BTable.create(
            spark, f"{tmp}/ord", orders, cluster_by=["o_orderkey"],
            cluster_file_rows=max(1000, n_ord // 20),
        )
        rec["orders_rows"] = n_ord
        files_before = set(to.snapshot().files)
        rec["ord_files_total"] = len(files_before)
        # ~0.1% of keys, in one narrow range (the clustered layout's case)
        k_lo = orders.agg(F.min("o_orderkey")).collect()[0][0]
        n_keys = max(10, n_ord // 1000)
        src = (
            orders.filter(
                (F.col("o_orderkey") >= k_lo)
                & (F.col("o_orderkey") < k_lo + n_keys * 4)
            )
            .limit(n_keys)
            .withColumn("price_cents", -F.col("price_cents"))
        )
        rec["merge_keys"] = src.count()
        _, rec["t_merge_s"] = timed(lambda: to.merge(spark, src, on="o_orderkey"))
        files_after = set(to.snapshot().files)
        rec["ord_files_rewritten"] = len(files_before - files_after)
        rec["merge_rewrite_frac"] = round(
            rec["ord_files_rewritten"] / rec["ord_files_total"], 3
        )
        # correctness spot: the negated rows landed
        neg = to.read(spark).filter("price_cents < 0").count()
        assert neg == rec["merge_keys"], (neg, rec["merge_keys"])

        # --- 3. deletion vectors vs copy-on-write on a SCATTERED delete ---
        # ~0.1% of rows, one key per thousand: under a key-clustered
        # layout the matches land in EVERY file — copy-on-write's worst
        # case (rewrites the whole table), deletion vectors' reason to
        # exist (metadata-only commit).  Also measures the read-side
        # anti-join overhead DVs introduce, which OPTIMIZE clears.
        pred = "o_orderkey % 1000 == 7"
        tc = BTable.create(
            spark, f"{tmp}/cow", orders, cluster_by=["o_orderkey"],
            cluster_file_rows=max(1000, n_ord // 20),
        )
        td = BTable.create(
            spark, f"{tmp}/dv", orders, cluster_by=["o_orderkey"],
            cluster_file_rows=max(1000, n_ord // 20),
        )
        rec["scatter_del_rows"] = tc.read(spark).filter(pred).count()
        cow_before = set(tc.snapshot().files)
        _, rec["t_scatter_cow_s"] = timed(lambda: tc.delete(spark, pred))
        rec["scatter_cow_files_rewritten"] = len(
            cow_before - set(tc.snapshot().files)
        )
        dv_before = set(td.snapshot().files)
        _, rec["t_scatter_dv_s"] = timed(
            lambda: td.delete(spark, pred, mode="merge_on_read")
        )
        rec["scatter_dv_files_rewritten"] = len(
            dv_before - set(td.snapshot().files)
        )
        rec["scatter_dv_ranges"] = sum(
            len(r) for r in td.snapshot().dvs.values()
        )
        n_cow = tc.read(spark).count()
        n_dv = td.read(spark).count()
        assert n_cow == n_dv == n_ord - rec["scatter_del_rows"]
        _, rec["t_read_after_cow_s"] = timed(lambda: tc.read(spark).count())
        _, rec["t_read_after_dv_s"] = timed(lambda: td.read(spark).count())
        _, rec["t_dv_optimize_s"] = timed(
            lambda: td.optimize(spark, small_file_rows=0)
        )
        assert td.snapshot().dvs == {}  # materialized
        _, rec["t_read_after_optimize_s"] = timed(
            lambda: td.read(spark).count()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
