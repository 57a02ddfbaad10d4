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
from biggie_spark.util import lineage_cap

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
    ).transform(lineage_cap)
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


@register(
    "scd2_priority_history",
    oracle="""
    WITH s AS (SELECT o_custkey, o_orderkey, o_orderpriority, o_orderdate,
                      CAST(o_orderdate AS DATE) AS d,
                      lag(o_orderpriority) OVER
                          (PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey) AS prev
               FROM orders),
         g AS (SELECT *, sum(CASE WHEN prev IS NULL
                                    OR prev <> o_orderpriority
                                  THEN 1 ELSE 0 END) OVER
                          (PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey
                           ROWS UNBOUNDED PRECEDING) AS version
               FROM s)
    SELECT o_custkey, CAST(version AS BIGINT) AS version,
           min(o_orderpriority) AS priority,
           min(d) AS valid_from, max(d) AS valid_to,
           count(*) AS n_orders
    FROM g GROUP BY o_custkey, version
    """,
)
def scd2_priority_history(spark, sf_dir):
    """Slowly-changing-dimension (type 2) history build: collapse each
    customer's order sequence into validity intervals of constant
    o_orderpriority — one row per (customer, version) with valid_from /
    valid_to and a monotonically increasing version number.

    This is the warehouse-dimension maintenance pattern: detect attribute
    changes with lag() under a total order (o_orderdate, o_orderkey — the
    date alone ties), then a running conditional sum assigns island ids,
    then one groupBy emits the interval rows.  Both windows share the same
    partition key (o_custkey) and order, so Spark computes them in ONE
    shuffle + one sort — version assignment is a single pass however long
    the history.  At 100 TB the dimension key is the only shuffle key and
    per-key history fits a task by construction."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    s = o.withColumn("d", F.expr("cast(o_orderdate as date)")).withColumn(
        "prev", F.lag("o_orderpriority").over(w)
    )
    g = s.withColumn(
        "version",
        F.sum(
            F.when(
                F.col("prev").isNull()
                | (F.col("prev") != F.col("o_orderpriority")),
                1,
            ).otherwise(0)
        ).over(wrun),
    )
    return g.groupBy("o_custkey", "version").agg(
        F.min("o_orderpriority").alias("priority"),
        F.min("d").alias("valid_from"),
        F.max("d").alias("valid_to"),
        F.count("*").alias("n_orders"),
    )


@register(
    "mv_retract_refresh",
    oracle="""
    WITH corrected AS (
      /* the post-correction fact stream: late corrections RETRACT the
         original rows (event_id % 97 = 0) and re-insert them with value
         doubled; the final state is what a full recompute sees */
      SELECT ts, event_type,
             CASE WHEN event_id % 97 = 0 THEN value * 2 ELSE value END AS value
      FROM events)
    SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_epoch,
           event_type, count(*) AS n,
           CAST(sum(CAST(round(round(value, 2) * 100, 0) AS BIGINT)) AS BIGINT)
             AS sum_cents
    FROM corrected GROUP BY 1, 2
    """,
)
def mv_retract_refresh(spark, sf_dir):
    """Retraction-aware incremental MV refresh -- the changelog pattern
    (Flink retract streams / Delta CDF): a correction batch arrives as
    (-1, old_row) + (+1, new_row) DELTA rows, and the stored MV updates
    by aggregating SIGNED partials -- count adds sign, sum adds
    sign·cents -- with no recompute of the base.

    Here every 97th event is 'corrected' to double its value: the MV
    first materializes from the original stream (localCheckpoint = the
    stored partition), then merges a retract+insert delta for the
    affected rows only.  The oracle aggregates the corrected stream from
    scratch -- equality proves signed-partial merging is lossless,
    INCLUDING exact cancellation of the retracted cents.  Additive
    signed partials are the only merge form that supports corrections
    without rereading the base at 100 TB; min/max MVs cannot retract,
    which is why production MVs store sum/count and derive avg."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    cents = F.round(F.round(F.col("value"), 2) * 100, 0).cast("long")

    def partial(df, sign: int, cents_col):
        return df.select(
            F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_epoch"),
            "event_type",
            F.lit(sign).alias("dn"),
            (F.lit(sign) * cents_col).alias("dcents"),
        )

    mv_stored = (
        partial(ev, 1, cents)
        .groupBy("hour_epoch", "event_type")
        .agg(F.sum("dn").alias("n"), F.sum("dcents").alias("cents"))
        .transform(lineage_cap)
    )
    corrected_rows = ev.filter(F.col("event_id") % 97 == 0)
    retract = partial(corrected_rows, -1, cents)
    reinsert = partial(
        corrected_rows, 1, F.round(F.round(F.col("value") * 2, 2) * 100, 0).cast("long")
    )
    delta = (
        retract.unionByName(reinsert)
        .groupBy("hour_epoch", "event_type")
        .agg(F.sum("dn").alias("n"), F.sum("dcents").alias("cents"))
    )
    return (
        mv_stored.unionByName(delta)
        .groupBy("hour_epoch", "event_type")
        .agg(F.sum("n").alias("n"), F.sum("cents").alias("sum_cents"))
        .filter(F.col("n") > 0)
    )
