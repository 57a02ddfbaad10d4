"""Dump explain('formatted') for named queries to plans/r14/<bench>_<tag>.txt.

Usage: python tools/dump_plans_r14.py <tag> [bench_name ...]

Bench names default to all 9 HEADLINE queries; any other registry op name
is accepted too (written under its own name).  Plans are captured at sf0.1
under the bench posture (engine session, AQE off) so they match the timed
configuration.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from bench import HEADLINE
from biggie_spark.registry import QUERIES, load_all_ops
from biggie_spark.session import get_spark

TAG = sys.argv[1]
NAMES = sys.argv[2:] or list(HEADLINE)
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

load_all_ops()
spark = get_spark(app_name="plan-dump-r14")
spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.sql.adaptive.enabled", "false")

outdir = "/root/repo/plans/r14"
os.makedirs(outdir, exist_ok=True)
for bench_name in NAMES:
    op = HEADLINE.get(bench_name, bench_name)
    df = QUERIES[op](spark, SF)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    path = os.path.join(outdir, f"{bench_name}_{TAG}.txt")
    with open(path, "w") as f:
        f.write(f"# {bench_name} (op={op}) sf={SF} tag={TAG}\n\n")
        f.write(plan)
    print(f"wrote {path} ({len(plan)} chars)")
