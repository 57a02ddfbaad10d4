"""Wave-K scale probe: MEASURED evidence for the column-mapping and
row-tracking scale claims (SCALE.md round-14 wave K):

1. **Rename is O(log), not O(data)**: rename_column on a multi-file,
   multi-100k-row table costs milliseconds (one JSON commit) and the
   renamed-column pruned read scans the same file count as before.
2. **Row-id reads are bounded overhead**: read(with_row_ids=True) pays
   the position-exposing scan + one broadcast of per-file bases; the
   factor over a plain read is measured, not guessed.
3. **Tracked rewrites stay file-proportional**: a 0.1%-of-keys MERGE on
   a row-tracked table rewrites the same file count as untracked (ids
   ride the rewrite; no extra shuffle), with measured wall time.

Usage: python tools/btable_wavek_probe.py [sf_dir]   (default sf0.1)
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
    spark = get_spark(app_name="btable-wavek-probe")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="btable_wavek_")
    rec: dict = {"sf_dir": SF}
    try:
        li = load_table(spark, SF, "lineitem").select(
            "l_orderkey",
            "l_partkey",
            "l_quantity",
            F.round(F.col("l_extendedprice") * 100, 0)
            .cast("long")
            .alias("price_cents"),
        )
        n_rows = li.count()
        rec["rows"] = n_rows

        # untracked baseline, clustered on l_orderkey into ~20 files
        per = max(1, n_rows // 20)
        t_plain = BTable.create(
            spark, f"{tmp}/plain", li,
            cluster_by=["l_orderkey"], cluster_file_rows=per,
        )
        n_files = len(t_plain.snapshot().files)
        rec["files"] = n_files

        # 1. rename cost + pruning parity ---------------------------------
        lo, hi = li.agg(F.min("l_orderkey"), F.max("l_orderkey")).collect()[0]
        mid = (lo + hi) // 2
        where_old = f"l_orderkey >= {mid} AND l_orderkey <= {mid + (hi-lo)//20}"
        scans_before = t_plain.scan_file_count(where_old)
        _, rec["rename_s"] = timed(lambda: t_plain.rename_column(
            "l_orderkey", "order_id"
        ))
        where_new = where_old.replace("l_orderkey", "order_id")
        rec["scan_files_before_rename"] = scans_before
        rec["scan_files_after_rename"] = t_plain.scan_file_count(where_new)
        cnt, rec["pruned_read_after_rename_s"] = timed(
            lambda: t_plain.read(spark, where=where_new).count()
        )
        rec["pruned_read_rows"] = cnt

        # 2. row-id read overhead -----------------------------------------
        t_trk = BTable.create(
            spark, f"{tmp}/trk", li,
            cluster_by=["l_orderkey"], cluster_file_rows=per,
            row_tracking=True,
        )
        # compare on a real column aggregate: a bare count() over parquet
        # is answered from footer metadata and would overstate the factor
        def s_plain():
            return t_trk.read(spark).agg(F.sum("price_cents")).collect()

        def s_ids():
            return (
                t_trk.read(spark, with_row_ids=True)
                .agg(F.sum("price_cents"), F.max("_row_id"))
                .collect()
            )

        _, warm = timed(s_plain)  # warm FS cache
        _, rec["plain_read_s"] = timed(s_plain)
        _, rec["rowid_read_s"] = timed(s_ids)
        n_ids = (
            t_trk.read(spark, with_row_ids=True)
            .select(F.count_distinct("_row_id"))
            .collect()[0][0]
        )
        rec["distinct_row_ids"] = n_ids
        assert n_ids == n_rows, "row ids must be unique"

        # 3. tracked merge proportionality --------------------------------
        keys = [r[0] for r in
                li.select("l_orderkey").distinct().limit(1000).collect()]
        pick = sorted(keys)[: max(1, len(keys) // 1000)]  # ~0.1% of keys
        src = (
            t_trk.read(spark)
            .filter(F.col("l_orderkey").isin(pick))
            .dropDuplicates(["l_orderkey"])
            .withColumn("price_cents", F.lit(-1).cast("long"))
        )
        files_before = set(t_trk.snapshot().files)
        _, rec["tracked_merge_s"] = timed(
            lambda: t_trk.merge(spark, src, on="l_orderkey")
        )
        rec["merge_files_rewritten"] = len(
            files_before - set(t_trk.snapshot().files)
        )
        # ids of untouched rows survived the merge
        sample = (
            t_trk.read(spark, with_row_ids=True)
            .filter(~F.col("l_orderkey").isin(pick))
            .select(F.count_distinct("_row_id"))
            .collect()[0][0]
        )
        rec["untouched_distinct_ids_after_merge"] = sample
        print(json.dumps(rec))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
