"""Time the full 22-query TPC-H-adapted suite at a given SF — throughput
evidence for SCALE.md beyond the 9 headline bench queries.

Protocol (upgraded round 14 after a noisy-box session produced 17.2 /
17.9 / 24.2 s single-pass totals for identical plans): per query, one
untimed cold pass then ``--repeat N`` (default 3) timed warm passes; the
artifact reports the per-query MEDIAN plus [min, max] spread — the same
median-of-N shape bench.py adopted in round 13, so suite totals are
round-over-round comparable instead of hostage to one loaded minute.

Usage: python tools/tpch_bench.py [sf_dir] [--repeat N]
       (defaults: /root/testdata/sf0.1, repeat 3)
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from biggie_spark.registry import QUERIES, load_all_ops
from biggie_spark.session import get_spark

SF = "/root/testdata/sf0.1"
REPEAT = 3
_args = sys.argv[1:]
if "--repeat" in _args:
    i = _args.index("--repeat")
    REPEAT = int(_args[i + 1])
    del _args[i : i + 2]
if _args:
    SF = _args[0]


def main() -> None:
    load_all_ops()
    spark = get_spark()
    names = sorted(n for n in QUERIES if n.startswith("tpch_"))
    med: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for n in names:
        fn = QUERIES[n]
        fn(spark, SF).collect()  # cold pass, untimed
        warms = []
        for _ in range(max(1, REPEAT)):
            t0 = time.perf_counter()
            fn(spark, SF).collect()
            warms.append(time.perf_counter() - t0)
        warms.sort()
        med[n] = round(statistics.median(warms), 3)
        spread[n] = [round(warms[0], 3), round(warms[-1], 3)]
    print(f"\n| query | median warm sec ({SF.rsplit('/', 1)[-1]}, n={REPEAT}) | spread |")
    print("|---|---|---|")
    for n, s in med.items():
        print(f"| {n} | {s:.3f} | {spread[n][0]:.3f}-{spread[n][1]:.3f} |")
    total = round(sum(med.values()), 3)
    print(f"| **total ({len(names)} queries)** | {total:.3f} | |")
    print(json.dumps({"metric": "tpch_22q_total_warm", "value": total,
                      "unit": "sec", "queries": med, "spread": spread,
                      "repeat": REPEAT, "sf_dir": SF}))


if __name__ == "__main__":
    main()
