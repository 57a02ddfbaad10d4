"""Time-series operators: gap-filled rollups and bin-accelerated range
joins — the hypertable-style surface a telemetry/event pipeline needs.

Scale design (100 TB):
* `ts_gapfill` — the dense time grid is generated from ONE 1-row global
  min/max aggregate (a full scan that reduces to a single row, partial
  aggregation map-side), then cross-joined with the tiny dimension of
  group keys; the observed counts arrive via one shuffle-on-(key, bucket)
  aggregation and a broadcast-able left join onto the grid.  The grid
  cardinality is hours x types — independent of input row count — so the
  plan's only data-sized stage is the initial aggregate.
* `join_range_binned` — a pure range join (no equi key) is a nested-loop
  at any scale.  Binning rewrites it as an EQUI-join: each probe interval
  [d, d+7d) explodes to the 2-3 week-bins it overlaps, each fact row maps
  to exactly 1 bin, the join runs hash/SMJ on the bin key, and the exact
  range predicate remains as a cheap residual filter.  Join cardinality
  drops from |probes| x |facts| to sum of per-bin products — the standard
  interval-binning trick (cf. range-join bin hints in other engines),
  expressed in pure DataFrame ops so AQE still picks broadcast when the
  probe side is small.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from biggie_spark.io import load_table
from biggie_spark.registry import register
from biggie_spark.util import epoch_us, lineage_cap, r4

_EPOCH0 = "1992-01-01"  # day-number origin for bin computation (pre-corpus)


@register(
    "ts_gapfill",
    oracle="""
    WITH e AS (SELECT event_type, date_trunc('hour', ts) AS h FROM events),
    b AS (SELECT min(h) AS lo, max(h) AS hi FROM e),
    grid AS (SELECT t.event_type, g.h
             FROM (SELECT DISTINCT event_type FROM e) t
             CROSS JOIN (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
                         FROM b) g),
    c AS (SELECT event_type, h, count(*) AS n FROM e GROUP BY event_type, h)
    SELECT grid.event_type AS event_type,
           CAST(floor(epoch(grid.h)) AS BIGINT) AS hour_s,
           coalesce(c.n, 0) AS n
    FROM grid LEFT JOIN c ON c.event_type = grid.event_type AND c.h = grid.h
    """,
)
def ts_gapfill(spark, sf_dir):
    """Hourly event counts per type over a DENSE hour grid (missing hours
    zero-filled) — the gap-fill half of a hypertable rollup.  The grid spans
    [min hour, max hour] of the whole table; `sequence()` is inclusive on
    both ends, exactly like DuckDB's `generate_series`."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    )
    bounds = e.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    grid = e.select("event_type").distinct().crossJoin(hours)
    counts = e.groupBy("event_type", "h").agg(F.count("*").alias("n"))
    return grid.join(counts, ["event_type", "h"], "left").select(
        "event_type",
        F.unix_timestamp("h").alias("hour_s"),
        F.coalesce("n", F.lit(0)).alias("n"),
    )


@register(
    "join_range_binned",
    oracle="""
    SELECT o.o_orderkey AS o_orderkey, count(*) AS n_items
    FROM orders o JOIN lineitem l
      ON l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate < o.o_orderdate + INTERVAL 7 DAY
    WHERE o.o_orderkey % 100 = 0
    GROUP BY o.o_orderkey
    """,
)
def join_range_binned(spark, sf_dir):
    """Count lineitems (of ANY order) shipped within [o_orderdate,
    o_orderdate + 7 days) for a probe subset of orders — a pure range join
    with NO equi key, executed as a binned equi-join (see module docstring).
    The oracle states the naive range-join semantics; the engine plan is the
    binned rewrite — identical results, hash-join physical shape."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    li = load_table(spark, sf_dir, "lineitem")
    day_o = F.datediff(F.col("o_orderdate").cast("date"), F.lit(_EPOCH0).cast("date"))
    # the 7-day interval overlaps at most ceil(7/7)+1 week-bins; sequence is
    # inclusive, and the residual predicate below makes the join exact
    probes = o.select(
        "o_orderkey",
        "o_orderdate",
        F.explode(
            F.sequence(F.floor(day_o / 7), F.floor((day_o + 7) / 7))
        ).alias("bin"),
    )
    day_l = F.datediff(F.col("l_shipdate").cast("date"), F.lit(_EPOCH0).cast("date"))
    items = li.select("l_shipdate", F.floor(day_l / 7).alias("bin"))
    joined = probes.join(items, "bin").filter(
        (F.col("l_shipdate") >= F.col("o_orderdate"))
        & (F.col("l_shipdate") < F.col("o_orderdate") + F.expr("INTERVAL 7 DAY"))
    )
    return joined.groupBy("o_orderkey").agg(F.count("*").alias("n_items"))


@register(
    "ts_funnel",
    oracle="""
    WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
    s1 AS (SELECT user_id,
                  min(us) FILTER (WHERE event_type = 'view') AS t1
           FROM e GROUP BY user_id),
    s2 AS (SELECT e.user_id,
                  min(us) FILTER (WHERE event_type = 'click' AND us >= t1) AS t2
           FROM e JOIN s1 USING (user_id) GROUP BY e.user_id),
    s3 AS (SELECT e.user_id,
                  min(us) FILTER (WHERE event_type = 'purchase' AND us >= t2) AS t3
           FROM e JOIN s2 USING (user_id) GROUP BY e.user_id)
    SELECT CASE WHEN t1 IS NULL THEN 0
                WHEN t2 IS NULL THEN 1
                WHEN t3 IS NULL THEN 2
                ELSE 3 END AS funnel_stage,
           count(*) AS n_users
    FROM s1 JOIN s2 USING (user_id) JOIN s3 USING (user_id)
    GROUP BY 1
    """,
)
def ts_funnel(spark, sf_dir):
    """Ordered funnel analysis (view -> click -> purchase): per user, each
    stage's timestamp is the earliest qualifying event AT OR AFTER the
    previous stage's timestamp; the output is user counts per deepest
    stage reached.  Each stage is one groupBy(user_id) aggregate joined
    back on the same key — Spark reuses the user_id hash partitioning
    across the chain (one real shuffle, then co-partitioned joins), so the
    funnel depth adds executor-local passes, not extra data movement.
    Event-time comparisons use exact microseconds (unix_micros == DuckDB
    epoch_us on the ns-repaired column)."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", epoch_us("ts").alias("us")
    )
    s1 = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("us"))).alias("t1")
    )
    s2 = (
        e.join(s1, "user_id")
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("us") >= F.col("t1")),
                    F.col("us"),
                )
            ).alias("t2")
        )
    )
    s3 = (
        e.join(s2, "user_id")
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("us") >= F.col("t2")),
                    F.col("us"),
                )
            ).alias("t3")
        )
    )
    stage = (
        F.when(F.col("t1").isNull(), 0)
        .when(F.col("t2").isNull(), 1)
        .when(F.col("t3").isNull(), 2)
        .otherwise(3)
    )
    return (
        s1.join(s2, "user_id")
        .join(s3, "user_id")
        .groupBy(stage.alias("funnel_stage"))
        .agg(F.count("*").alias("n_users"))
    )


@register(
    "ts_retention",
    oracle="""
    WITH e AS (SELECT DISTINCT user_id,
                      CAST(date_trunc('day', ts) AS DATE) AS d
               FROM events),
    c AS (SELECT user_id, min(d) AS cohort FROM e GROUP BY user_id)
    SELECT c.cohort AS cohort_day,
           e.d - c.cohort AS offset_days,
           count(*) AS n_users
    FROM e JOIN c USING (user_id)
    GROUP BY 1, 2
    """,
)
def ts_retention(spark, sf_dir):
    """Cohort retention: users grouped by first-active day; for each
    (cohort, day-offset) the count of users active that day.  Two
    aggregates on user_id + one on (cohort, offset); the distinct
    (user, day) projection collapses event volume before any join, so the
    retention matrix costs O(users x active-days), independent of raw
    event count.  Day arithmetic stays in DATE space on both engines
    (DuckDB date_trunc('day') returns DATE; DATE - DATE = int days ==
    Spark datediff)."""
    e = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("d")
        )
        .distinct()
    )
    c = e.groupBy("user_id").agg(F.min("d").alias("cohort"))
    return (
        e.join(c, "user_id")
        .groupBy(
            F.col("cohort").alias("cohort_day"),
            F.datediff(F.col("d"), F.col("cohort")).alias("offset_days"),
        )
        .agg(F.count("*").alias("n_users"))
    )


@register(
    "ts_ohlc",
    oracle="""
    WITH r AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, value,
             row_number() OVER (PARTITION BY date_trunc('day', ts)
                                ORDER BY epoch_us(ts), event_id) AS rn_a,
             row_number() OVER (PARTITION BY date_trunc('day', ts)
                                ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn_d
      FROM events)
    SELECT day,
           round(max(CASE WHEN rn_a = 1 THEN value END), 4) AS open,
           round(max(CASE WHEN rn_d = 1 THEN value END), 4) AS close,
           round(max(value), 4) AS high,
           round(min(value), 4) AS low,
           count(*) AS n
    FROM r GROUP BY day
    """,
)
def ts_ohlc(spark, sf_dir):
    """OHLC downsampling (the classic hypertable rollup): per day, the
    first/last value by event time plus high/low/count.  First/last are
    made deterministic by a composite total order (exact microseconds +
    event_id — memory rule: epoch seconds would truncate ties).  Runs as
    two ranking windows sharing one shuffle on the day key, then a hash
    aggregate on the same key — no second exchange.  At 100 TB the day
    key is the natural partition column, so the windows are
    partition-local."""
    ev = load_table(spark, sf_dir, "events")
    day_full = F.date_trunc("day", F.col("ts"))
    wa = Window.partitionBy(day_full).orderBy(epoch_us("ts"), "event_id")
    wd = Window.partitionBy(day_full).orderBy(
        epoch_us("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.select(
            day_full.cast("date").alias("day"),
            "value",
            F.row_number().over(wa).alias("rn_a"),
            F.row_number().over(wd).alias("rn_d"),
        )
        .groupBy("day")
        .agg(
            F.round(F.max(F.when(F.col("rn_a") == 1, F.col("value"))), 4).alias("open"),
            F.round(F.max(F.when(F.col("rn_d") == 1, F.col("value"))), 4).alias("close"),
            F.round(F.max("value"), 4).alias("high"),
            F.round(F.min("value"), 4).alias("low"),
            F.count("*").alias("n"),
        )
    )


@register(
    "ts_anomaly_mad",
    oracle="""
    WITH e AS (SELECT event_type, event_id,
                      CAST(round(value * 100, 0) AS BIGINT) AS cents
               FROM events),
         r AS (SELECT event_type, event_id, cents,
                      row_number() OVER (PARTITION BY event_type
                                         ORDER BY cents, event_id) AS rn,
                      count(*) OVER (PARTITION BY event_type) AS n
               FROM e),
         m AS (SELECT event_type, cents AS med_cents
               FROM r WHERE rn = (n + 1) // 2),
         d AS (SELECT e.event_type, e.event_id, m.med_cents,
                      abs(e.cents - m.med_cents) AS dev
               FROM e JOIN m USING (event_type)),
         r2 AS (SELECT event_type, med_cents, dev, event_id,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY dev, event_id) AS rn,
                       count(*) OVER (PARTITION BY event_type) AS n
                FROM d),
         mad AS (SELECT event_type, dev AS mad_cents
                 FROM r2 WHERE rn = (n + 1) // 2)
    SELECT d.event_type,
           CAST(count(*) AS BIGINT) AS n,
           d.med_cents,
           mad.mad_cents,
           CAST(sum(CASE WHEN d.dev > 5 * mad.mad_cents THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM d JOIN mad USING (event_type)
    GROUP BY d.event_type, d.med_cents, mad.mad_cents
    """,
)
def ts_anomaly_mad(spark, sf_dir):
    """Robust anomaly detection: per event type, the exact median and
    median-absolute-deviation of the event value (integer cents), plus the
    count of events deviating more than 5 MADs from the median — the
    standard robust outlier rule (median +- k*MAD tolerates up to 50%
    contamination, unlike mean +- k*sigma).

    Medians are LOWER medians by rank position under a composite total
    order (cents, event_id) — exact, interpolation-free, so both engines
    agree bit-for-bit (determinism rules 6/7); all arithmetic is BIGINT
    cents.  Shape at scale: two window sorts partitioned by event_type
    (each type sorts independently; a skewed type splits under AQE) and
    two broadcast joins of the tiny per-type median/MAD frames back onto
    the events — the full corpus shuffles only on event_type, never
    globally."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("cents"),
    )
    w = Window.partitionBy("event_type").orderBy("cents", "event_id")
    wn = Window.partitionBy("event_type")
    med = (
        e.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count("*").over(wn))
        .filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .select("event_type", F.col("cents").alias("med_cents"))
    )
    d = e.join(F.broadcast(med), "event_type").withColumn(
        "dev", F.abs(F.col("cents") - F.col("med_cents"))
    )
    w2 = Window.partitionBy("event_type").orderBy("dev", "event_id")
    mad = (
        d.withColumn("rn", F.row_number().over(w2))
        .withColumn("n", F.count("*").over(wn))
        .filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .select("event_type", F.col("dev").alias("mad_cents"))
    )
    return (
        d.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med_cents", "mad_cents")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.when(F.col("dev") > 5 * F.col("mad_cents"), 1).otherwise(0)
            ).cast("long").alias("n_outliers"),
        )
        .select("event_type", "n", "med_cents", "mad_cents", "n_outliers")
    )


@register(
    "ts_ewma",
    oracle="""
    WITH w AS (
      SELECT user_id, event_id,
             list(CAST(round(value * 100, 0) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                     ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS lst
      FROM events)
    SELECT user_id, event_id,
           CAST(len(lst) AS BIGINT) AS k,
           CAST(list_sum(list_transform(lst,
                (x, i) -> x * (CAST(1 AS BIGINT) << (i - 1)))) AS BIGINT)
               AS ewma_num,
           CAST((CAST(1 AS BIGINT) << len(lst)) - 1 AS BIGINT) AS denom
    FROM w
    """,
)
def ts_ewma(spark, sf_dir):
    """Truncated exponentially-weighted moving average per user: over the
    last 8 events (total order: event time in microseconds, then event_id
    — rule 9), each value is weighted 2^position with the most recent
    heaviest; emitted as exact integer numerator/denominator
    (ewma = ewma_num / denom downstream) so the statistic is
    bit-identical on any partitioning — a float recursive EWMA is neither
    associative nor order-stable.  The 8-step truncation bounds state (the
    true EWMA's infinite tail below weight 2^-8 is dropped), which is what
    makes it a pure windowed aggregate instead of a sequential scan.

    Lambda-arity note: the 2-arg (x, i) form is the ONE place the
    PySpark (element, index) convention is used on purpose (rule 5);
    Spark's index is 0-based, DuckDB's is 1-based, hence the shift
    offsets differ by one.  Shape at scale: one window sort per user —
    shuffle on user_id only, frame state is 8 longs."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch_us("ts"), "event_id")
        .rowsBetween(-7, 0)
    )
    lst = F.collect_list(
        F.expr("CAST(round(value * 100, 0) AS BIGINT)")
    ).over(w)
    return ev.select(
        "user_id",
        "event_id",
        lst.alias("lst"),
    ).select(
        "user_id",
        "event_id",
        F.expr("CAST(size(lst) AS BIGINT)").alias("k"),
        F.expr(
            "aggregate(transform(lst, (x, i) -> x * shiftleft(CAST(1 AS BIGINT), i)),"
            " CAST(0 AS BIGINT), (a, x) -> a + x)"
        ).alias("ewma_num"),
        F.expr("shiftleft(CAST(1 AS BIGINT), size(lst)) - 1").alias("denom"),
    )


@register(
    "ts_resample_interp",
    oracle="""
    WITH e AS (
      SELECT event_type, CAST(epoch_us(ts) AS BIGINT) AS us,
             0 AS src, event_id AS eid, value AS v
      FROM events),
    b AS (SELECT min(date_trunc('hour', ts)) AS lo, max(date_trunc('hour', ts)) AS hi
          FROM events),
    grid AS (
      SELECT t.event_type, CAST(epoch_us(g.h) AS BIGINT) AS us,
             1 AS src, CAST(0 AS BIGINT) AS eid, CAST(NULL AS DOUBLE) AS v
      FROM (SELECT DISTINCT event_type FROM e) t
      CROSS JOIN (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
                  FROM b) g),
    u AS (SELECT * FROM e UNION ALL SELECT * FROM grid),
    m AS (
      SELECT event_type, us, src,
             last_value(v IGNORE NULLS) OVER w_prev AS prev_v,
             last_value(CASE WHEN src = 0 THEN us END IGNORE NULLS) OVER w_prev AS prev_us,
             first_value(v IGNORE NULLS) OVER w_next AS next_v,
             first_value(CASE WHEN src = 0 THEN us END IGNORE NULLS) OVER w_next AS next_us
      FROM u
      WINDOW
        w_prev AS (PARTITION BY event_type ORDER BY us, src, eid
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        w_next AS (PARTITION BY event_type ORDER BY us, src, eid
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
    SELECT event_type, CAST(us // 1000000 AS BIGINT) AS t_s,
           CAST(round(prev_v + (next_v - prev_v)
                      * (us - prev_us) / (next_us - prev_us), 4) AS DOUBLE) AS v
    FROM m
    WHERE src = 1 AND prev_us IS NOT NULL AND next_us IS NOT NULL
    """,
)
def ts_resample_interp(spark, sf_dir):
    """Linear-interpolation resampling: per event type, the irregular value
    series is sampled onto the dense hourly grid, each grid point
    interpolated between its surrounding observations (edge points with no
    observation on one side are dropped, not extrapolated).

    Shape: grid markers union into the event stream and BOTH neighbors
    come from the same two window passes over ONE shuffle on event_type —
    the as-of-join trick (joins.py join_asof) applied twice in opposite
    directions, so there is no inequality join and no per-grid-point probe.
    Grid rows sort after real events at the same instant (src tie-key), so
    an observation exactly on a grid point contributes as 'previous' and
    the interpolation degenerates to its value exactly.  Time stays in
    integer microseconds until the final division; the interpolation
    itself is the same IEEE double expression on both engines."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        epoch_us("ts").alias("us"),
        F.lit(0).alias("src"),
        F.col("event_id").alias("eid"),
        F.col("value").alias("v"),
    )
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.date_trunc("hour", "ts")).alias("lo"),
        F.max(F.date_trunc("hour", "ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    grid = (
        e.select("event_type")
        .distinct()
        .crossJoin(hours)
        .select(
            "event_type",
            epoch_us("h").alias("us"),
            F.lit(1).alias("src"),
            F.lit(0).cast("bigint").alias("eid"),
            F.lit(None).cast("double").alias("v"),
        )
    )
    u = e.unionByName(grid)
    w_prev = Window.partitionBy("event_type").orderBy("us", "src", "eid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # "Nearest following observation" as a REVERSED running frame: a
    # [1 FOLLOWING, UNBOUNDED FOLLOWING] frame makes Spark's WindowExec
    # re-aggregate from the current row to partition end for EVERY row —
    # O(n^2) per event-type partition, measured 43 s at sf0.1 (~126k rows
    # per type).  The same set of strictly-later rows is
    # [UNBOUNDED PRECEDING, 1 PRECEDING] under the fully reversed sort,
    # which WindowExec runs as an incremental growing frame: O(n), 43 s ->
    # ~2 s.  last() over the reversed frame = first non-null in forward
    # order.  Costs one extra in-partition sort, no extra shuffle.
    w_next = Window.partitionBy("event_type").orderBy(
        F.col("us").desc(), F.col("src").desc(), F.col("eid").desc()
    ).rowsBetween(Window.unboundedPreceding, -1)
    ev_us = F.when(F.col("src") == 0, F.col("us"))
    m = u.select(
        "event_type",
        "us",
        "src",
        F.last("v", ignorenulls=True).over(w_prev).alias("prev_v"),
        F.last(ev_us, ignorenulls=True).over(w_prev).alias("prev_us"),
        F.last("v", ignorenulls=True).over(w_next).alias("next_v"),
        F.last(ev_us, ignorenulls=True).over(w_next).alias("next_us"),
    )
    interp = F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * (
        F.col("us") - F.col("prev_us")
    ) / (F.col("next_us") - F.col("prev_us"))
    return (
        m.filter(
            (F.col("src") == 1)
            & F.col("prev_us").isNotNull()
            & F.col("next_us").isNotNull()
        )
        .select(
            "event_type",
            F.expr("us div 1000000").alias("t_s"),
            F.round(interp, 4).cast("double").alias("v"),
        )
    )


@register(
    "ts_rolling_corr",
    oracle="""
    WITH e AS (
      SELECT event_type, event_id, epoch_us(ts) AS us,
             CAST(round(value * 100, 0) AS BIGINT) AS y
      FROM events),
    l AS (
      SELECT event_type, event_id, us, y,
             lag(y) OVER (PARTITION BY event_type ORDER BY us, event_id) AS x
      FROM e),
    f AS (SELECT * FROM l WHERE x IS NOT NULL),
    s AS (
      SELECT event_type, event_id,
             count(*) OVER w AS n,
             sum(x) OVER w AS sx, sum(y) OVER w AS sy,
             sum(x * y) OVER w AS sxy,
             sum(x * x) OVER w AS sxx, sum(y * y) OVER w AS syy
      FROM f
      WINDOW w AS (PARTITION BY event_type ORDER BY us, event_id
                   ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)),
    r AS (
      SELECT event_type, event_id, n,
             CAST(n * sxy - sx * sy AS DOUBLE) AS cov,
             CAST(n * sxx - sx * sx AS DOUBLE) AS vx,
             CAST(n * syy - sy * sy AS DOUBLE) AS vy
      FROM s WHERE n = 30)
    SELECT event_type, event_id,
           /* + 0 normalizes -0.0 (negative covariance that rounds to zero);
              the driver hash distinguishes signed zeros (r4 postmortem) */
           CAST(round(cov / sqrt(vx * vy), 4) + 0 AS DOUBLE) AS corr30
    FROM r WHERE vx > 0 AND vy > 0
    """,
)
def ts_rolling_corr(spark, sf_dir):
    """Rolling Pearson correlation between each value and its lag-1
    predecessor over a trailing 30-event frame per event type -- the
    local-persistence monitor (is the series momentum-driven RIGHT NOW?)
    that complements the global lag-1 autocorrelation op (ts_autocorr).

    Correlation from five windowed sufficient sums (Σx, Σy, Σxy, Σx²,
    Σy²) of exact integer cents -- the frame is 30 rows so every sum fits
    BIGINT (30·1e8 ≈ 3e9 for Σx²·, far under 2^63), and cross-multiplied
    covariance/variance keep the algebra integer until ONE final double
    division under r4 (same discipline as agg_ols_fit).  Plan: one lag
    window + one multi-sum frame window, both on the same event_type
    shuffle key; full-frame rows (n = 30) only, so edge partials never
    enter the scored output."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.unix_micros("ts").alias("us"),
        F.round(F.col("value") * 100, 0).cast("long").alias("y"),
    )
    w_ord = Window.partitionBy("event_type").orderBy("us", "event_id")
    l = e.withColumn("x", F.lag("y").over(w_ord)).filter(F.col("x").isNotNull())
    w = w_ord.rowsBetween(-29, Window.currentRow)
    s = l.select(
        "event_type",
        "event_id",
        F.count("*").over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).alias("syy"),
    ).filter(F.col("n") == 30)
    cov = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return (
        s.withColumn("corr30", r4(cov / F.sqrt(vx * vy)))
        .filter((vx > 0) & (vy > 0))
        .select("event_type", "event_id", "corr30")
    )


@register(
    "ts_markov_transitions",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, ts, event_id FROM events),
    l AS (
      SELECT user_id, event_type AS nxt,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM e),
    t AS (SELECT prev, nxt, count(*) AS c FROM l WHERE prev IS NOT NULL
          GROUP BY prev, nxt),
    m AS (SELECT prev, sum(c) AS row_tot FROM t GROUP BY prev)
    SELECT t.prev, t.nxt, CAST(t.c AS BIGINT) AS c,
           CAST(t.c * 10000 // m.row_tot AS BIGINT) AS p_bp
    FROM t JOIN m ON m.prev = t.prev
    """,
)
def ts_markov_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event sequences
    (view -> click -> purchase ...) -- the user-journey model behind
    next-action prediction, anomaly scoring, and channel attribution.

    One lag window per user (shuffle on user_id), one hash aggregate on
    the (prev, next) pair -- the transition matrix is |event types|^2
    rows regardless of corpus size, so the row-total join for the
    conditional probabilities is a broadcast of a ~25-row frame.
    Probabilities are integer basis points (c*10000 div row_total) --
    exact, per convention (b)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    l = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.col("event_type").alias("nxt"),
            "ts",
            "event_id",
        )
        .withColumn("prev", F.lag("nxt").over(w))
        .filter(F.col("prev").isNotNull())
    )
    t = l.groupBy("prev", "nxt").agg(F.count("*").alias("c"))
    m = t.groupBy("prev").agg(F.sum("c").alias("row_tot"))
    return t.join(F.broadcast(m), "prev").select(
        "prev",
        "nxt",
        "c",
        F.expr("c * 10000 div row_tot").alias("p_bp"),
    )


@register(
    "ts_rfm_segments",
    oracle="""
    WITH anchor AS (SELECT max(ts) AS t0 FROM events WHERE event_type = 'purchase'),
    per_user AS (
      SELECT user_id,
             (epoch_us((SELECT t0 FROM anchor)) - epoch_us(max(ts)))
               // 86400000000 AS recency_days,
             count(*) AS frequency,
             sum(CAST(round(value * 100, 0) AS BIGINT)) AS monetary_cents
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id),
    scored AS (
      SELECT user_id, recency_days, frequency, monetary_cents,
             ntile(4) OVER (ORDER BY recency_days, user_id) AS r_q,
             ntile(4) OVER (ORDER BY frequency DESC, user_id) AS f_q,
             ntile(4) OVER (ORDER BY monetary_cents DESC, user_id) AS m_q
      FROM per_user)
    SELECT user_id, CAST(recency_days AS BIGINT) AS recency_days,
           CAST(frequency AS BIGINT) AS frequency,
           CAST(monetary_cents AS BIGINT) AS monetary_cents,
           CAST(r_q * 100 + f_q * 10 + m_q AS BIGINT) AS rfm_code
    FROM scored
    """,
)
def ts_rfm_segments(spark, sf_dir):
    """RFM (recency / frequency / monetary) customer segmentation -- the
    marketing-analytics staple: quartile-score each purchasing user on
    days-since-last-purchase, purchase count, and spend, and pack the
    three quartiles into a 3-digit segment code (111 = best, 444 =
    churned).

    One hash aggregate folds the corpus to per-user triples (recency via
    exact integer microseconds against the corpus-max anchor, spend in
    cents); the three ntile windows run over the USER frame, not raw
    events, with user_id tie-breaks so quartile boundaries are
    deterministic.  The global anchor is a 1-row broadcast.  At 100 TB
    the user frame is the |users| reduction -- the windows order by
    already-aggregated values, the standard two-stage segmentation
    shape."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    anchor = ev.agg(F.max(F.unix_micros("ts")).alias("t0us"))
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.max(F.unix_micros("ts")).alias("last_us"),
            F.count("*").alias("frequency"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias(
                "monetary_cents"
            ),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "user_id",
            F.expr("(t0us - last_us) div 86400000000").alias("recency_days"),
            "frequency",
            "monetary_cents",
        )
    )
    r_q = F.ntile(4).over(Window.orderBy("recency_days", "user_id"))
    f_q = F.ntile(4).over(Window.orderBy(F.col("frequency").desc(), "user_id"))
    m_q = F.ntile(4).over(Window.orderBy(F.col("monetary_cents").desc(), "user_id"))
    return per_user.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary_cents",
        (r_q * 100 + f_q * 10 + m_q).cast("long").alias("rfm_code"),
    )


@register(
    "ts_stl_lite",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             sum(CAST(round(value * 100, 0) AS BIGINT)) AS c
      FROM events GROUP BY event_type, h),
    tr AS (
      SELECT event_type, h, c,
             sum(c) OVER w // count(*) OVER w AS trend_c
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY h
                   ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
    res AS (
      SELECT event_type, h, CAST(hour(h) AS INTEGER) AS hod,
             c - trend_c AS resid_c
      FROM tr),
    seas AS (
      SELECT event_type, hod,
             sum(resid_c) // count(*) AS seasonal_c,
             count(*) AS n
      FROM res GROUP BY event_type, hod),
    rem AS (
      SELECT r.event_type, r.resid_c,
             r.resid_c - s.seasonal_c AS rem_c
      FROM res r JOIN seas s
        ON s.event_type = r.event_type AND s.hod = r.hod),
    varr AS (
      SELECT event_type,
             CAST(sum(CAST(resid_c AS HUGEINT) * resid_c) AS DOUBLE) AS ss_resid,
             CAST(sum(CAST(rem_c AS HUGEINT) * rem_c) AS DOUBLE) AS ss_rem
      FROM rem GROUP BY event_type)
    SELECT s.event_type, s.hod,
           CAST(s.seasonal_c AS BIGINT) AS seasonal_cents,
           CAST(s.n AS BIGINT) AS n_hours,
           CAST(round((1 - v.ss_rem / v.ss_resid) * 10000, 4) + 0 AS DOUBLE)
             AS seasonal_strength_bp
    FROM seas s JOIN varr v ON v.event_type = s.event_type
    """,
)
def ts_stl_lite(spark, sf_dir):
    """STL-style seasonal decomposition (trend / seasonal / remainder) of
    the hourly revenue series per event type: a centered 25-hour rolling
    mean removes the trend, the hour-of-day mean of the residual is the
    seasonal component, and the variance the seasonal step removes
    (seasonal strength, in basis points) quantifies how periodic each
    series actually is -- the forecasting-readiness diagnostic.

    Integer end to end: the hourly rollup is exact cents, the rolling
    trend is frame-sum DIV frame-count (integer floor both engines,
    edge frames clip identically), residual and seasonal components stay
    integer cents, and only the final strength ratio touches doubles
    (HUGEINT/DECIMAL sums of squares, one division, r4).  Plan: one
    corpus hash aggregate -> bounded (type x hour) series, then all
    windows/joins run on that tiny frame partitioned by type."""
    hourly = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("c"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(-12, 12)
    )
    tr = hourly.withColumn(
        "trend_c",
        F.expr("sum(c) OVER (PARTITION BY event_type ORDER BY h "
               "ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING) div "
               "count(*) OVER (PARTITION BY event_type ORDER BY h "
               "ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)"),
    )
    res = tr.select(
        "event_type",
        F.hour("h").cast("int").alias("hod"),
        (F.col("c") - F.col("trend_c")).alias("resid_c"),
    )
    res = res.transform(lineage_cap)  # bounded frame feeds seasonal + variance
    seas = res.groupBy("event_type", "hod").agg(
        F.expr("sum(resid_c) div count(*)").alias("seasonal_c"),
        F.count("*").alias("n"),
    )
    rem = res.join(F.broadcast(seas), ["event_type", "hod"]).select(
        "event_type",
        "resid_c",
        (F.col("resid_c") - F.col("seasonal_c")).alias("rem_c"),
    )
    varr = rem.groupBy("event_type").agg(
        F.sum((F.col("resid_c") * F.col("resid_c")).cast("decimal(38,0)"))
        .cast("double")
        .alias("ss_resid"),
        F.sum((F.col("rem_c") * F.col("rem_c")).cast("decimal(38,0)"))
        .cast("double")
        .alias("ss_rem"),
    )
    return seas.join(F.broadcast(varr), "event_type").select(
        "event_type",
        "hod",
        F.col("seasonal_c").cast("long").alias("seasonal_cents"),
        F.col("n").cast("long").alias("n_hours"),
        r4((1 - F.col("ss_rem") / F.col("ss_resid")) * 10000).alias(
            "seasonal_strength_bp"
        ),
    )


@register(
    "ts_backtest_naive",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             sum(CAST(round(value * 100, 0) AS BIGINT)) AS c
      FROM events GROUP BY event_type, h),
    fc AS (
      SELECT event_type, h, c,
             lag(c) OVER (PARTITION BY event_type ORDER BY h) AS yhat
      FROM hourly),
    e AS (SELECT event_type, c, yhat, abs(c - yhat) AS ae
          FROM fc WHERE yhat IS NOT NULL)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_hours,
           CAST(sum(ae) * 10000 // sum(abs(c)) AS BIGINT) AS wape_bp,
           CAST(sum(ae * 20000 // (abs(c) + abs(yhat))) // count(*) AS BIGINT)
             AS smape_bp
    FROM e GROUP BY event_type
    """,
)
def ts_backtest_naive(spark, sf_dir):
    """Forecast-accuracy backtest of the naive (persistence) baseline —
    the number every forecasting effort must beat, and the permanent
    denominator of model-skill reports: predict each hour's revenue with
    the PREVIOUS hour's, then score WAPE (Σ|err| / Σ|actual|) and sMAPE
    per series, both as integer basis points.

    Integer discipline: absolute errors are exact cents; WAPE is one
    integer division of two exact sums, and sMAPE's per-row ratio uses
    integer floor division before the mean (documented bias of at most
    1bp per row — the cross-engine-stable choice, same rationale as
    convention (b)).  One corpus rollup to the bounded hourly frame,
    one lag window, one aggregate."""
    hourly = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("c"))
    )
    w = Window.partitionBy("event_type").orderBy("h")
    fc = hourly.withColumn("yhat", F.lag("c").over(w)).filter(
        F.col("yhat").isNotNull()
    )
    e = fc.withColumn("ae", F.abs(F.col("c") - F.col("yhat")))
    return e.groupBy("event_type").agg(
        F.count("*").alias("n_hours"),
        F.expr("sum(ae) * 10000 div sum(abs(c))").alias("wape_bp"),
        F.expr("sum(ae * 20000 div (abs(c) + abs(yhat))) div count(*)").alias(
            "smape_bp"
        ),
    )
