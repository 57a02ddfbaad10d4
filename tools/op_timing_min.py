"""Noise-robust per-op timing: N warm repeats, report min + median.

The sandbox shows hypervisor steal bursts (loadavg spikes with no local
process running) that inflate any single measurement 2-10x; the MINIMUM
of several warm runs is the least-contaminated estimate of an op's true
cost, and the median shows the typical-case spread.  Same noop-sink
methodology as tools/op_timing_sweep.py (guide §1.4).

Usage: python tools/op_timing_min.py [sf_dir] [repeat] name ...
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from biggie_spark.registry import QUERIES, load_all_ops
from biggie_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPEAT = int(sys.argv[2]) if len(sys.argv) > 2 else 5
NAMES = sys.argv[3:]

load_all_ops()
spark = get_spark(app_name="op-timing-min")
spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.sql.adaptive.enabled", "false")


def run_once(name: str) -> float:
    t0 = time.perf_counter()
    df = QUERIES[name](spark, SF)
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


for name in NAMES:
    spark.sparkContext.setJobDescription(f"min:{name}")
    run_once(name)  # cold, untimed
    warms = [run_once(name) for _ in range(REPEAT)]
    print(
        json.dumps(
            {
                "op": name,
                "min": round(min(warms), 3),
                "med": round(statistics.median(warms), 3),
                "max": round(max(warms), 3),
            }
        ),
        flush=True,
    )
