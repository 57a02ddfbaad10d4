"""Time the full 22-query TPC-H-adapted suite at a given SF — throughput
evidence for SCALE.md beyond the 9 headline bench queries.

Each query runs twice (the second, warm, number is reported) on the shared
session factory, exactly like bench.py.  Output is a markdown table plus a
one-line JSON summary so round logs can diff totals.

Usage: python tools/tpch_bench.py [sf_dir]   (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from biggie_spark.registry import QUERIES, load_all_ops
from biggie_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main() -> None:
    load_all_ops()
    spark = get_spark()
    names = sorted(n for n in QUERIES if n.startswith("tpch_"))
    rows = {}
    for n in names:
        fn = QUERIES[n]
        warm = None
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, SF).collect()
            warm = time.perf_counter() - t0
        rows[n] = round(warm, 3)
    print(f"\n| query | warm sec ({SF.rsplit('/', 1)[-1]}) |")
    print("|---|---|")
    for n, s in rows.items():
        print(f"| {n} | {s:.3f} |")
    total = round(sum(rows.values()), 3)
    print(f"| **total ({len(names)} queries)** | {total:.3f} |")
    print(json.dumps({"metric": "tpch_22q_total_warm", "value": total,
                      "unit": "sec", "queries": rows, "sf_dir": SF}))


if __name__ == "__main__":
    main()
