"""btable_changes source probe: MEASURED throughput of the streaming
read path vs the native JVM changes() read, on a real corpus volume.

The Python Data Source read path is pyarrow-per-chunk (Arrow-vectorized,
but off the JVM parquet scan) — this probe quantifies the cost so the
"streams its DELTAS, never its history" claim carries a number.

Usage: python tools/btable_stream_probe.py [sf_dir]   (default sf0.1)
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

from biggie_spark.btable_stream import register_btable_source
from biggie_spark.io import load_table
from biggie_spark.session import get_spark
from biggie_spark.tablefmt import BTable

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, round(time.perf_counter() - t0, 3)


def main() -> None:
    spark = get_spark(app_name="btable-stream-probe")
    spark.sparkContext.setLogLevel("ERROR")
    register_btable_source(spark)
    tmp = tempfile.mkdtemp(prefix="bts_probe_")
    rec: dict = {"sf_dir": SF}
    try:
        orders = load_table(spark, SF, "orders").select(
            "o_orderkey", "o_custkey",
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        )
        n = orders.count()
        # 4 append commits + one DV delete: a feed with full-file AND
        # partial-file chunks
        quarters = [
            orders.filter(f"o_orderkey % 4 == {i}").coalesce(2)
            for i in range(4)
        ]
        t = BTable.create(spark, f"{tmp}/t", quarters[0])
        for q in quarters[1:]:
            t.append(spark, q)
        t.delete(spark, "o_custkey % 100 == 7", mode="merge_on_read")
        rec["orders_rows"] = n
        rec["feed_rows"] = t.changes(spark, -1).count()

        # warm both paths once
        t.changes(spark, -1).count()
        spark.read.format("btable_changes").load(t.path).count()

        _, rec["t_native_changes_s"] = timed(
            lambda: t.changes(spark, -1).count()
        )
        _, rec["t_source_batch_s"] = timed(
            lambda: spark.read.format("btable_changes").load(t.path).count()
        )

        out = f"{tmp}/out"
        ckpt = f"{tmp}/ckpt"

        def drain():
            q = (
                spark.readStream.format("btable_changes")
                .load(t.path)
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(600)

        _, rec["t_stream_drain_s"] = timed(drain)
        drained = spark.read.parquet(out).count()
        assert drained == rec["feed_rows"], (drained, rec["feed_rows"])
        rec["stream_rows_per_s"] = int(
            rec["feed_rows"] / rec["t_stream_drain_s"]
        )
        # incremental: one more DV delete, re-drain only the delta
        t.delete(spark, "o_custkey % 100 == 13", mode="merge_on_read")
        _, rec["t_stream_incremental_s"] = timed(drain)
        rec["incremental_rows"] = spark.read.parquet(out).count() - drained
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
