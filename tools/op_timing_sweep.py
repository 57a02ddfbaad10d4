"""Per-operator wall-clock sweep over the full registry (optimization r14).

Runs every registered op at the given SF dir under the engine session,
timing the warm execution (2nd run) of a full materialization via the
noop sink (guide §1.4 — noop computes every column of every row without
sink cost; collect() would add driver transfer for wide outputs).

Ops whose construction is eager (write-path demos) are timed as
construction + action.  Output: JSON lines {"op": name, "cold": s,
"warm": s} sorted by warm desc at the end, so the slowest ops — the
optimization targets — rank first.

Usage: python tools/op_timing_sweep.py [sf_dir] [out_json] [name ...]
"""

from __future__ import annotations

import json
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

from biggie_spark.registry import QUERIES, load_all_ops
from biggie_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/op_timing.json"
ONLY = set(sys.argv[3:])

load_all_ops()
spark = get_spark(app_name="op-timing-sweep")
spark.sparkContext.setLogLevel("ERROR")
# Match the bench posture: AQE off at local scale (BASELINE.md config).
spark.conf.set("spark.sql.adaptive.enabled", "false")


def run_once(name: str) -> float:
    t0 = time.perf_counter()
    df = QUERIES[name](spark, SF)
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


results = {}
names = [n for n in sorted(QUERIES) if not ONLY or n in ONLY]
for i, name in enumerate(names):
    spark.sparkContext.setJobDescription(f"sweep:{name}")
    try:
        cold = run_once(name)
        warm = run_once(name)
        results[name] = {"cold": round(cold, 3), "warm": round(warm, 3)}
    except Exception as e:
        results[name] = {"err": f"{type(e).__name__}: {e}"[:200]}
        traceback.print_exc(limit=2)
    if (i + 1) % 25 == 0:
        print(f"[{i + 1}/{len(names)}] done", file=sys.stderr)

with open(OUT, "w") as f:
    json.dump(results, f, indent=1, sort_keys=True)

ok = {k: v for k, v in results.items() if "warm" in v}
top = sorted(ok.items(), key=lambda kv: -kv[1]["warm"])[:40]
print(json.dumps({"n": len(results), "errs": sum(1 for v in results.values() if "err" in v),
                  "total_warm": round(sum(v["warm"] for v in ok.values()), 1)}))
for name, t in top:
    print(f"{t['warm']:8.3f}  (cold {t['cold']:7.3f})  {name}")
