"""Benchmark harness — runs the 9 headline queries from BASELINE.md against
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:

    {"metric": "...", "value": <total warm sec>, "unit": "sec",
     "queries": {...}, "sf": ...}

Timing protocol matches BASELINE.md: per query, run twice, report the second
(warm) wall-clock of the action; the one-time SparkSession startup is hoisted
out of per-query timing.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from biggie_spark.registry import QUERIES
from biggie_spark.session import get_spark

# bench name (BASELINE.md row) -> registry operator
HEADLINE = {
    "q_pricing_summary": "agg_groupby",
    "q_join_agg": "join_multiway_star",
    "q_topk": "join_topk_revenue",
    "q_window": "win_topk_per_group",
    "q_events_hourly": "stream_tumbling",
    "q_text_tokens": "llm_text_stats",
    "q_knn_self": "llm_knn_cosine",
    "q_json_extract": "fn_json",
    "q_dedup_minhash_proxy": "llm_dedup_exact",
}

# Per-query wall-clock caps from BASELINE.md (engine target <= 2x the
# raw-PySpark row, sf0.1 warm).  `bench.py --assert-budget` exits nonzero
# if any query exceeds its cap — wired into the round exit checklist
# (README) so an r4-style warm-path regression can't ship silently.
BUDGET_SEC = {
    "q_pricing_summary": 1.74,
    "q_join_agg": 4.26,
    "q_topk": 1.60,
    "q_window": 0.93,
    "q_events_hourly": 0.65,
    "q_text_tokens": 0.40,
    "q_knn_self": 1.67,
    "q_json_extract": 0.84,
    "q_dedup_minhash_proxy": 0.33,
}
# Aggregate tripwire BELOW sum(per-query caps): at the sum (12.42) the
# total gate could only fire after some per-query cap already had, i.e.
# it guarded nothing (round-6 review finding).  8.0 s = ~1.3x the
# raw-PySpark baseline total (6.21 s) and ~35% above the worst healthy
# measurement on a busy box (5.92 s judge re-run, r5) — it catches the
# suite-wide creep of nine queries each sitting just under cap.
BUDGET_TOTAL_SEC = 8.0

# Import ONLY the modules that register the nine headline ops (VERDICT r4
# item 4: the full 360-op load_all_ops() import measurably bleeds into warm
# query timings via Python-object/GC pressure — ~0.5 s across the suite).
HEADLINE_MODULES = (
    "biggie_spark.ops.aggs",
    "biggie_spark.ops.joins",
    "biggie_spark.ops.windows",
    "biggie_spark.ops.streaming",
    "biggie_spark.ops.llm",
    "biggie_spark.ops.scalars",
)


def _median(warms: list[float]) -> float:
    """Per-query artifact median.  statistics.median, not warms[len//2]:
    for even --repeat counts the middle-index element is the UPPER middle,
    not the median the artifact field documents (ADVICE r13)."""
    return round(statistics.median(warms), 3)


# Quiet-box protocol (VERDICT r11 #1, amended by VERDICT r14 #1): the
# JSON line is the adjudication artifact, and emitting it silently from a
# loaded box is what the rule exists to prevent.  Mitigations, in order:
# (1) a bounded pre-flight wait for the box to quiet down, (2) up to two
# warm re-measurements (queries are already warm, so a re-measure is
# cheap), (3) if the box NEVER quiets down, emit anyway with
# "noisy": true + the observed loadavg — r14 showed that refusing (rc=3,
# no JSON) leaves the driver with no 32-core artifact at all, which is
# strictly worse than a flagged one.  SPARK_GRAFT_FORCE_BENCH=1 skips the
# waits entirely for exploratory runs ("forced": true in the artifact).
LOADAVG_MAX = 2.0


def _wait_for_quiet(max_wait_sec: float) -> float:
    """Block until 1-min loadavg <= LOADAVG_MAX or the wait budget runs
    out; returns the last observed loadavg."""
    deadline = time.monotonic() + max_wait_sec
    load = os.getloadavg()[0]
    while load > LOADAVG_MAX and time.monotonic() < deadline:
        print(
            f"bench: loadavg {load:.2f} > {LOADAVG_MAX} — waiting for a "
            "quiet box (quiet-box protocol, VERDICT r11 #1)",
            file=sys.stderr,
        )
        time.sleep(15)
        load = os.getloadavg()[0]
    return load


def _build_record(
    timings: dict[str, float],
    spread: dict[str, list[float]],
    repeat: int,
    sf: float | None,
    loadavg: float,
    forced: bool,
) -> dict:
    """Assemble the one-line JSON artifact.  Always emits (VERDICT r14 #1);
    a run whose box never quieted down is flagged "noisy": true rather
    than suppressed, so the driver always gets a per-query table."""
    record = {
        "metric": "headline_9q_total_warm",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,  # per-query MEDIAN of `repeat` warm runs
        "repeat": repeat,
        "spread": spread,  # per-query [min, max] across the warm runs
        "sf": sf,
        "loadavg": loadavg,
    }
    if forced:
        record["forced"] = True
    if loadavg > LOADAVG_MAX and not forced:
        record["noisy"] = True
    return record


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import importlib

    for m in HEADLINE_MODULES:
        importlib.import_module(m)
    forced = os.environ.get("SPARK_GRAFT_FORCE_BENCH") == "1"
    if not forced:
        _wait_for_quiet(float(os.environ.get("SPARK_GRAFT_LOAD_WAIT", "300")))
    spark = get_spark(app_name="biggie-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # AQE stays ON in the session default (the 100 TB identity: runtime
    # broadcast conversion, partition coalescing, skew splitting).  At bench
    # scale it is pure overhead: each exchange becomes a materialized query
    # stage, adding ~0.5-1.5 s across nine sub-second queries (measured,
    # SCALE.md) while coalescing/skew logic has nothing to do on 8-partition
    # sub-GB shuffles.  Pinning it off HERE is the same local-scale tuning
    # precedent as shuffle.partitions=8 (BASELINE.md config); a cluster
    # deployment never runs this file.
    spark.conf.set(
        "spark.sql.adaptive.enabled", os.environ.get("SPARK_GRAFT_AQE", "false")
    )

    # Repeat protocol (VERDICT r12 item 4): single warm measurements carry
    # ±10% session noise (SCALE.md r12-close: ±0.8 s total spread on an
    # idle box), which made the r12 q_topk +12% / q_window +9% upticks
    # unadjudicable.  Default: 3 warm runs per query; the artifact reports
    # the per-query MEDIAN (the comparable number) plus min/max spread so a
    # swing can be read against real variance instead of guessed at.
    if "--repeat" in sys.argv:
        repeat = int(sys.argv[sys.argv.index("--repeat") + 1])
    else:
        repeat = int(os.environ.get("SPARK_GRAFT_REPEAT", "3"))

    def measure() -> tuple[dict[str, float], dict[str, list[float]]]:
        med: dict[str, float] = {}
        spread: dict[str, list[float]] = {}
        for bench_name, op in HEADLINE.items():
            fn = QUERIES[op]
            fn(spark, sf_dir).collect()  # cold pass, untimed (BASELINE.md)
            warms = []
            for _ in range(max(1, repeat)):
                t0 = time.perf_counter()
                fn(spark, sf_dir).collect()
                warms.append(time.perf_counter() - t0)
            warms.sort()
            med[bench_name] = _median(warms)
            spread[bench_name] = [round(warms[0], 3), round(warms[-1], 3)]
        return med, spread

    # Measure; if the box loaded up DURING the run, re-measure (everything
    # is warm by then, so a retry costs ~5 s) up to twice before refusing.
    timings, spread = measure()
    loadavg = round(os.getloadavg()[0], 2)
    for _ in range(2):
        if loadavg <= LOADAVG_MAX or forced:
            break
        loadavg = round(_wait_for_quiet(120), 2)
        if loadavg > LOADAVG_MAX:
            break  # still loaded; don't burn time on a doomed re-measure
        timings, spread = measure()
        loadavg = round(os.getloadavg()[0], 2)

    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None
    record = _build_record(timings, spread, repeat, sf, loadavg, forced)
    if record.get("noisy"):
        # VERDICT r14 #1: refusing forever (old rc=3, no JSON) left the
        # driver with NO 32-core artifact at all — strictly worse than a
        # flagged one.  After the pre-flight wait and 2 re-measure
        # attempts, emit the one-line JSON anyway with "noisy": true and
        # the observed loadavg so the consumer can discount it; the
        # per-query minimum of the `repeat` warm runs is still available
        # in `spread[q][0]` as the least load-inflated number.
        print(
            f"bench: box still loaded (loadavg {loadavg} > {LOADAVG_MAX}) "
            "after pre-flight wait and 2 re-measure attempts — emitting "
            'the artifact flagged "noisy": true (VERDICT r14 #1).',
            file=sys.stderr,
        )
    print(json.dumps(record))

    if "--assert-budget" in sys.argv:
        # Caps are sf0.1-specific (BASELINE.md was measured there).
        if sf != 0.1:
            print(f"assert-budget: caps are sf0.1; got sf={sf}", file=sys.stderr)
            sys.exit(2)
        over = {
            q: (t, BUDGET_SEC[q])
            for q, t in timings.items()
            if t > BUDGET_SEC[q]
        }
        total = sum(timings.values())
        if total > BUDGET_TOTAL_SEC:
            over["TOTAL"] = (round(total, 3), BUDGET_TOTAL_SEC)
        if over:
            print(f"BUDGET EXCEEDED: {over}", file=sys.stderr)
            sys.exit(1)
        print(
            f"assert-budget: all 9 queries + total within BASELINE.md caps "
            f"({round(total, 3)}s <= {BUDGET_TOTAL_SEC}s)",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
