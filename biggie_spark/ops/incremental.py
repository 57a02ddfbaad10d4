"""Incremental materialized-view maintenance: merge yesterday's stored
rollup with today's delta instead of recomputing the world.

The 100 TB motivation: a daily hourly-rollup MV over an append-only event
stream should cost O(new data), not O(all data).  The algebra that makes
this safe is partial-aggregate merge: keep every aggregate in its MERGEABLE
form (counts, integer-cent sums — never the final rounded double) in the
stored MV, aggregate only the new partition, and union + re-aggregate.
Because the merge form is associative and commutative, MV(old) ⊎ agg(delta)
== agg(old ∪ delta) on any partitioning — which is exactly what the oracle
checks (plain full rollup in DuckDB vs the two-path merge in Spark).

Keeping the stored side in finalized form instead (rounded doubles) would
break this: round(a)+round(b) != round(a+b).  Same discipline as
`util.dsum`, extended across materialization boundaries.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from biggie_spark.io import load_table
from biggie_spark.registry import register

_CUTOVER = "timestamp'2024-01-20 00:00:00'"


def _hourly_partial(ev):
    """Hourly rollup in MERGE form: count + integer-cent sum (BIGINT)."""
    return ev.groupBy(
        F.expr("unix_timestamp(date_trunc('hour', ts))").alias("hour_epoch"),
        "event_type",
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.expr("cast(round(value * 100, 0) as bigint)")).alias("cents"),
    )


@register(
    "mv_incremental_hourly",
    oracle="""
    SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_epoch,
           event_type, count(*) AS n,
           CAST(round(sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0, 4)
                AS DOUBLE) AS sum_val
    FROM events GROUP BY 1, 2
    """,
)
def mv_incremental_hourly(spark, sf_dir):
    """Hourly event rollup computed the INCREMENTAL way: a stored MV over
    days < 2024-01-20 (materialized via localCheckpoint — on a cluster this
    is yesterday's parquet MV partition) merged with a delta aggregate over
    days >= the cutover, by union + re-aggregate of merge-form partials.

    The oracle is the full single-pass rollup — equality proves the
    incremental path is lossless, including groups that exist on only one
    side of the cutover.  Finalization (cents -> rounded double) happens
    exactly once, after the merge."""
    ev = load_table(spark, sf_dir, "events").select("ts", "event_type", "value")
    mv_stored = _hourly_partial(
        ev.filter(F.expr(f"ts < {_CUTOVER}"))
    ).localCheckpoint()
    delta = _hourly_partial(ev.filter(F.expr(f"ts >= {_CUTOVER}")))
    return (
        mv_stored.unionByName(delta)
        .groupBy("hour_epoch", "event_type")
        .agg(F.sum("n").alias("n"), F.sum("cents").alias("cents"))
        .select(
            "hour_epoch",
            "event_type",
            "n",
            F.round(F.col("cents") / 100.0, 4).cast("double").alias("sum_val"),
        )
    )
