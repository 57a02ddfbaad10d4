"""Bloom-index scale probe: MEASURED evidence for the bloom-filter
file-skipping scale claims (SCALE.md round-14 bloom entry):

1. **Point lookups prune to O(1 + fpp·files) files**: on a 600k-row,
   20-file table whose bloom column (md5 of the row key) is scattered
   across every file, an equality probe scans ~1 file instead of 20 —
   min/max stats alone can never prune it (measured: stats-only twin).
2. **Build overhead is one aggregate per bloom column**: create with
   vs without bloom_cols, measured wall times.
3. **Sidecar footprint is the filter size, nothing more**: bytes on
   disk vs data bytes.
4. **Probe cost is driver-side metadata only**: scan_file_count wall
   time with a warm log (no Spark job).

Usage: python tools/btable_bloom_probe.py [sf_dir]   (default sf0.1)
Prints one JSON line; numbers go into SCALE.md by hand.
"""

from __future__ import annotations

import hashlib
import json
import os
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


def _du(path: str, suffix: str) -> int:
    total = 0
    for dirpath, _, names in os.walk(path):
        for n in names:
            if n.endswith(suffix):
                total += os.path.getsize(os.path.join(dirpath, n))
    return total


def main() -> None:
    spark = get_spark(app_name="btable-bloom-probe")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="btable_bloom_")
    rec: dict = {"sf_dir": SF}
    try:
        li = load_table(spark, SF, "lineitem").select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
        )
        # high-cardinality lookup id scattered across the k-clustered
        # layout — the exact shape min/max stats cannot prune
        df = li.withColumn(
            "item_id",
            F.md5(
                F.concat_ws(
                    "#",
                    F.col("l_orderkey").cast("string"),
                    F.col("l_linenumber").cast("string"),
                )
            ),
        )
        rec["rows"] = df.count()
        files = 20
        per = max(1, rec["rows"] // files)

        # baseline table: clustered on the key, NO bloom
        t0, rec["create_no_bloom_s"] = timed(
            lambda: BTable.create(
                spark,
                os.path.join(tmp, "plain"),
                df,
                cluster_by=["l_orderkey"],
                cluster_file_rows=per,
            )
        )
        # bloom table: same layout + 10 bits/row filters on item_id
        bits = 1 << (per * 10 - 1).bit_length()  # pow2 >= 10 bits/row
        t1, rec["create_bloom_s"] = timed(
            lambda: BTable.create(
                spark,
                os.path.join(tmp, "bloom"),
                df,
                cluster_by=["l_orderkey"],
                cluster_file_rows=per,
                bloom_cols=["item_id"],
                bloom_bits=bits,
                bloom_k=7,
            )
        )
        rec["files"] = t1.scan_file_count()
        rec["bloom_bits_per_file"] = bits
        rec["data_bytes"] = _du(t1.path, ".parquet")
        rec["sidecar_bytes"] = _du(t1.path, ".bloom.json")

        # representative probes: first, a mid, and an absent item id
        some = [
            r["item_id"]
            for r in df.limit(3).collect()
        ] + [hashlib.md5(b"absent#row").hexdigest()]
        # warm both logs (snapshot replay) before timing the probes
        t0.scan_file_count()
        t1.scan_file_count()
        scans_plain, scans_bloom, probe_s = [], [], []
        for iid in some:
            where = f"item_id == '{iid}'"
            scans_plain.append(t0.scan_file_count(where))
            n, dt = timed(lambda w=where: t1.scan_file_count(w))
            scans_bloom.append(n)
            probe_s.append(dt)
        rec["scan_files_stats_only"] = scans_plain
        rec["scan_files_bloom"] = scans_bloom
        rec["probe_metadata_s"] = probe_s

        # end-to-end pruned read wall time, present + absent
        _, rec["read_bloom_present_s"] = timed(
            lambda: t1.read(
                spark, where=f"item_id == '{some[0]}'"
            ).count()
        )
        _, rec["read_bloom_absent_s"] = timed(
            lambda: t1.read(
                spark, where=f"item_id == '{some[-1]}'"
            ).count()
        )
        _, rec["read_stats_only_present_s"] = timed(
            lambda: t0.read(
                spark, where=f"item_id == '{some[0]}'"
            ).count()
        )
        print(json.dumps(rec))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
