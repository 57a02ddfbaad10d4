"""Deterministic structural metric: Spark JOBS launched per op.

Wall-clock on this box swings 3-5x with hypervisor bursts, but the number
of Spark jobs an op schedules is exact and repeatable — and each job here
carries a ~0.2-0.5 s scheduling/action floor at demo scale (the thing the
guide-§2.6 action-fusion work removes).  Reported per op: jobs launched by
the second (warm) construct+noop-action run, via the max-job-id delta.

Usage: python tools/op_job_count.py [sf_dir] name ...
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from biggie_spark.registry import QUERIES, load_all_ops
from biggie_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
NAMES = sys.argv[2:]

load_all_ops()
spark = get_spark(app_name="op-job-count")
spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.sql.adaptive.enabled", "false")


def max_job_id() -> int:
    ids = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
    return max(ids) if ids else -1


def run_once(name: str) -> int:
    j0 = max_job_id()
    df = QUERIES[name](spark, SF)
    df.write.format("noop").mode("overwrite").save()
    return max_job_id() - j0


for name in NAMES:
    spark.sparkContext.setJobDescription(f"jobs:{name}")
    run_once(name)  # cold, untimed (cache warms, plans compile)
    print(json.dumps({"op": name, "jobs": run_once(name)}), flush=True)
