"""§2.F — window functions.

Native Catalyst `Window` execution: one shuffle on the partition key, then a
sorted in-partition scan.  Every ORDER BY carries a unique tie-break key
(o_orderkey) so ranks are total orders — the determinism convention that
makes window outputs oracle-hashable (SURVEY.md §2 conventions).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from biggie_spark.io import load_table
from biggie_spark.registry import register
from biggie_spark.util import epoch_us, fan_out, r4


@register(
    "win_ranking",
    oracle="""
    SELECT o_orderkey, o_custkey,
           row_number() OVER w AS rn,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4)     OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def win_ranking(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "win_lag_lead",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(lag(o_totalprice)  OVER w, 4) AS prev_price,
           round(lead(o_totalprice) OVER w, 4) AS next_price,
           round(o_totalprice - coalesce(lag(o_totalprice) OVER w, 0.0), 4) + 0 AS delta
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def win_lag_lead(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        r4(F.lag("o_totalprice").over(w)).alias("prev_price"),
        r4(F.lead("o_totalprice").over(w)).alias("next_price"),
        r4(
            F.col("o_totalprice") - F.coalesce(F.lag("o_totalprice").over(w), F.lit(0.0))
        ).alias("delta"),
    )


@register(
    "win_frame_rows",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(sum(l_quantity) OVER (
             PARTITION BY l_orderkey
             ORDER BY l_linenumber, l_quantity, l_partkey, l_suppkey, l_extendedprice
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_qty,
           round(avg(l_quantity) OVER (
             PARTITION BY l_orderkey
             ORDER BY l_linenumber, l_quantity, l_partkey, l_suppkey, l_extendedprice
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg
    FROM lineitem
    """,
)
def win_frame_rows(spark, sf_dir):
    """NOTE: (l_orderkey, l_linenumber) is NOT unique in the corpus — the
    ROWS frame needs a composite total order over every column that feeds
    the aggregates, or prefix sums are nondeterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_quantity", "l_partkey", "l_suppkey", "l_extendedprice"
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        r4(F.sum("l_quantity").over(w.rowsBetween(Window.unboundedPreceding, 0))).alias(
            "running_qty"
        ),
        r4(F.avg("l_quantity").over(w.rowsBetween(-2, 0))).alias("moving_avg"),
    )


@register(
    "win_frame_range",
    oracle="""
    SELECT o_orderkey,
           count(*) OVER (
             PARTITION BY o_custkey ORDER BY CAST(floor(epoch(o_orderdate)) AS BIGINT)
             RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW) AS n_90d,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY CAST(floor(epoch(o_orderdate)) AS BIGINT)
             RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW), 4) AS sum_90d
    FROM orders
    """,
)
def win_frame_range(spark, sf_dir):
    """Value-based (RANGE) frame: trailing 90 days of orders per customer.
    RANGE frames include order-key peers, so ties on the order column are
    deterministic without a tie-break key."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-7776000, 0)
    )
    return o.select(
        "o_orderkey",
        F.count("*").over(w).alias("n_90d"),
        r4(F.sum("o_totalprice").over(w)).alias("sum_90d"),
    )


@register(
    "win_topk_per_group",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT c_custkey, o_orderkey, o_totalprice,
             row_number() OVER (
               PARTITION BY c_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM customer JOIN orders ON o_custkey = c_custkey
    ) WHERE rn <= 3
    """,
)
def win_topk_per_group(spark, sf_dir):
    """Top-3 orders per customer (bench `q_window`).

    FK join elimination: every o_custkey has a customer row (verified at all
    SFs) and no customer column is projected, so the inner join to customer
    is the identity on orders — the window runs straight on the fact table,
    saving a join + shuffle.  Catalyst can't do this itself (no FK
    constraints); the DuckDB oracle KEEPS the join, so the hash-compare
    proves the elimination sound on every run."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("c_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice"
        )
        # fan_out on the WINDOW key (optimization r14, guide §2.4 "share
        # one exchange"): the single-row-group scan made the partial
        # WindowGroupLimit (sort + top-3 pre-prune) run as ONE task.
        # Hash-spreading on c_custkey both parallelizes that sort AND
        # satisfies the window's required distribution, so the plan keeps
        # exactly one Exchange — now at session parallelism instead of
        # the 1-task partial + 8-task final split (measured 0.22 s ->
        # 0.13 s warm at sf0.1).  row_number's ordering (o_totalprice
        # desc, o_orderkey) is total, so output is layout-independent.
        .transform(lambda d: fan_out(d, "c_custkey"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


@register(
    "win_first_last",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(first_value(o_totalprice) OVER w, 4) AS first_price,
           round(last_value(o_totalprice)  OVER w, 4) AS last_price,
           round(nth_value(o_totalprice, 2) OVER w, 4) AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_first_last(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        r4(F.first("o_totalprice").over(w)).alias("first_price"),
        r4(F.last("o_totalprice").over(w)).alias("last_price"),
        r4(F.nth_value("o_totalprice", 2).over(w)).alias("second_price"),
    )


@register(
    "win_islands",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
             CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
    grp AS (
      SELECT user_id, event_id, event_type,
             sum(brk) OVER (PARTITION BY user_id
                            ORDER BY us, event_id
                            ROWS UNBOUNDED PRECEDING) AS island
      FROM marked)
    SELECT user_id, event_type, CAST(island AS BIGINT) AS island,
           count(*) AS run_len, min(event_id) AS first_event
    FROM grp GROUP BY user_id, event_type, island
    """,
)
def win_islands(spark, sf_dir):
    """Gaps-and-islands: consecutive runs of the same event_type per user
    (lag-compare -> breakpoint flag -> running-sum island id -> per-island
    aggregate).  The whole pattern is two window passes over ONE partition
    shuffle on user_id — the state never leaves the executor that owns the
    key, which is why this classic works unchanged at 100 TB.  Ordering is
    (event time, event_id): event_id tie-breaks equal timestamps, and the
    running sum uses the same total order on both engines.  The island id
    is position-dependent but deterministic under that total order, so the
    value hash matches exactly.

    DuckDB note: its window ORDER BY on the raw ns-timestamp is projected
    through epoch_us to match Spark's µs-repaired ordering (ties broken by
    event_id anyway)."""
    e = load_table(spark, sf_dir, "events")
    us = epoch_us("ts")  # exact µs: matches DuckDB epoch_us; NTZ-safe cast inside
    w = Window.partitionBy("user_id").orderBy(us, "event_id")
    wrun = (
        Window.partitionBy("user_id")
        .orderBy(us, "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = e.withColumn(
        "brk",
        F.when(
            ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
        ).otherwise(0),
    )
    grp = marked.withColumn("island", F.sum("brk").over(wrun))
    return grp.groupBy("user_id", "event_type", "island").agg(
        F.count("*").alias("run_len"), F.min("event_id").alias("first_event")
    )


@register(
    "win_ntile",
    oracle="""
    SELECT o_orderkey,
           ntile(8) OVER (PARTITION BY o_orderstatus
                          ORDER BY CAST(round(o_totalprice * 100, 0) AS BIGINT),
                                   o_orderkey) AS octile
    FROM orders
    """,
)
def win_ntile(spark, sf_dir):
    """Equal-frequency bucketing: ntile(8) per order status under a
    composite total order (price cents, key) — both engines share the same
    ntile rule (earlier buckets absorb the remainder), so the assignment
    is deterministic once the order is total (determinism rule 6).  The
    canonical pre-step for equi-depth histograms and range partitioning;
    one window sort per status partition, skew splits under AQE."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"), "o_orderkey"
    )
    return o.select("o_orderkey", F.ntile(8).over(w).alias("octile"))


@register(
    "win_reset_cumsum",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, ts,
             CAST(round(value * 100, 0) AS BIGINT) AS c,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS flag
      FROM events WHERE user_id < 200),
    seg AS (
      SELECT event_id, user_id, c, flag,
             sum(flag) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seg_id
      FROM e)
    SELECT event_id, CAST(seg_id AS BIGINT) AS seg_id,
           CAST(sum(CASE WHEN flag = 1 THEN 0 ELSE c END)
                OVER (PARTITION BY user_id, seg_id
                      ORDER BY event_id) AS BIGINT) AS run_cents
    FROM seg
    """,
)
def win_reset_cumsum(spark, sf_dir):
    """Conditional running sum with RESET: per user, accumulate value
    cents until a 'purchase' event zeroes the accumulator -- the
    basket-total / usage-since-last-invoice pattern that plain cumulative
    windows cannot express directly.

    The classic two-window rewrite: a cumulative count of reset flags
    assigns each row a segment id (resets start new segments), then the
    running sum re-windows on (user, segment).  Both windows shuffle on
    the SAME user key -- Spark plans them in one exchange, the second
    sort is partition-local.  Exact integer cents; deterministic
    ordering (ts, event_id) per the determinism conventions.  Within a
    segment the inner ORDER BY event_id alone is already total (ids are
    unique), keeping the frame spec minimal."""
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 200)
        .select(
            "event_id",
            "user_id",
            "ts",
            F.round(F.col("value") * 100, 0).cast("long").alias("c"),
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("flag"),
        )
    )
    w_seg = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = e.withColumn("seg_id", F.sum("flag").over(w_seg))
    w_run = Window.partitionBy("user_id", "seg_id").orderBy("event_id")
    return seg.select(
        "event_id",
        F.col("seg_id").cast("long").alias("seg_id"),
        F.sum(F.when(F.col("flag") == 1, 0).otherwise(F.col("c")))
        .over(w_run)
        .cast("long")
        .alias("run_cents"),
    )


@register(
    "win_cumprod_growth",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS us,
             CAST(round(value * 100, 0) AS BIGINT) AS c
      FROM events WHERE user_id < 40),
    f AS (
      SELECT user_id, event_id, c,
             first_value(c) OVER (PARTITION BY user_id
                                  ORDER BY us, event_id) AS c0,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY us, event_id) AS rn
      FROM e)
    SELECT user_id, event_id,
           CAST(c * 10000 // c0 AS BIGINT) AS growth_bp
    FROM f WHERE rn > 1
    """,
)
def win_cumprod_growth(spark, sf_dir):
    """Cumulative growth factor per user — the compound-return window
    Π value_i / value_{i-1} from each user's first event.

    The general rewrite for running products is the exp(Σ ln(ratio))
    log-fold (used where factors do NOT cancel — agg_survival_km), but
    for CONSECUTIVE ratios the product telescopes to value_now /
    value_first, so the exact-integer form wins on both determinism and
    cost: growth in basis points is c·10000 div c0, pure BIGINT — a
    per-prefix float fold over 60+ events was measured to straddle the
    r4 rounding grain between engines at sf0.01, which is exactly the
    failure mode the telescoped form removes.  One shuffle on user_id
    shared by the first_value and row_number windows."""
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 40)
        .select(
            "user_id",
            "event_id",
            F.unix_micros("ts").alias("us"),
            F.round(F.col("value") * 100, 0).cast("long").alias("c"),
        )
        .withColumn("c0", F.first("c").over(w))
        .withColumn("rn", F.row_number().over(w))
    )
    return e.filter(F.col("rn") > 1).select(
        "user_id",
        "event_id",
        F.expr("c * 10000 div c0").alias("growth_bp"),
    )
