"""TPC-H-adapted analytic suite — complex multi-operator plans over the
driver corpus, every query fully oracle-checked.

These are the classic TPC-H query shapes (Q1..Q22) adapted to the corpus
schema (FIXTURES.md): no partsupp table, no l_shipmode/commit/receipt
dates, synthetic nation names, timestamp[ms] date columns.  Each query
exercises a different optimizer path — wide pre-aggregation, star joins
with broadcast dims, correlated EXISTS, scalar-subquery thresholds,
OR-of-AND pushdown, top-k with deterministic tie-breaks.

Determinism (SURVEY.md §2 conventions + SCALE.md):
- every money aggregate is fixed-point BIGINT accumulation (order-
  independent on any cluster; ``util.dsum`` / ``revenue_sum``);
- averages and ratios are emitted as integer-scaled BIGINTs computed with
  integer division (``x * 10^k div y``) — float division of two exact
  integers is deterministic but its round(,4) can straddle a decimal
  boundary, integer division cannot (memory: determinism rule 2);
- thresholds derived from aggregates (Q17's ``0.2*avg(qty)``, Q22's
  ``avg(acctbal)``) are compared in cross-multiplied integer form
  (``5*n*qty_cents < sum_cents``) so no float threshold ever decides a
  boundary row differently across engines;
- date columns are timestamp[ms]: compared against TIMESTAMP literals,
  emitted only via CAST(.. AS DATE) / year() (SURVEY.md §7.4.3).

At scale: every query here is a pure declarative DataFrame plan — Catalyst
broadcasts the dim sides (region/nation/customer at <1% of fact size), AQE
coalesces post-shuffle partitions, and all fact-side predicates and column
prunes reach the parquet scan (verified in tests/test_plans.py for the
star shape).
"""

from __future__ import annotations

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from biggie_spark.io import load_table, register_views
from biggie_spark.registry import register
from biggie_spark.util import SQL_REVENUE_SUM, dsum, r4, revenue_sum, sql_dsum


def _cents(col: str | Column, scale: int = 2) -> Column:
    """Exact integer representation of a decimal(scale) double column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 10**scale, 0).cast("long")


def _fx_sum(col: Column, scale: int) -> Column:
    """Fixed-point sum of an expression that is decimal(scale)-exact."""
    m = 10**scale
    return F.round(F.sum(F.round(col * m, 0).cast("long")) / float(m), 4).cast(
        "double"
    )


def _sql_fx_sum(expr: str, scale: int) -> str:
    m = 10**scale
    return (
        f"CAST(round(sum(CAST(round(({expr}) * {m}, 0) AS BIGINT)) / {m}.0, 4)"
        " AS DOUBLE)"
    )


@register(
    "tpch_q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {SQL_REVENUE_SUM} AS sum_disc_price,
           {_sql_fx_sum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)} AS sum_charge,
           CAST(sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) * 100
             // count(*) AS BIGINT) AS avg_qty_e4,
           CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) * 100
             // count(*) AS BIGINT) AS avg_price_e4,
           CAST(sum(CAST(round(l_discount * 100, 0) AS BIGINT)) * 10000
             // count(*) AS BIGINT) AS avg_disc_e6,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-08-06 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q01(spark, sf_dir):
    """TPC-H Q1 (pricing summary report): the canonical wide pre-aggregation
    — partial aggregation map-side collapses 600k rows to 6 groups before
    the shuffle, so network cost is O(groups), not O(rows), at any scale.
    Averages are integer-scaled (``_e4``/``_e6`` suffix = units of 1e-4 /
    1e-6) via integer division: exact and engine-portable."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-08-06 00:00:00").cast("timestamp")
    )
    charge = F.col("l_extendedprice") * (1 - F.col("l_discount")) * (
        1 + F.col("l_tax")
    )
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_base_price"),
        revenue_sum().alias("sum_disc_price"),
        _fx_sum(charge, 6).alias("sum_charge"),
        F.sum(_cents("l_quantity")).alias("_qc"),
        F.sum(_cents("l_extendedprice")).alias("_pc"),
        F.sum(_cents("l_discount")).alias("_dc"),
        F.count("*").alias("count_order"),
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base_price",
        "sum_disc_price",
        "sum_charge",
        F.expr("_qc * 100 div count_order").alias("avg_qty_e4"),
        F.expr("_pc * 100 div count_order").alias("avg_price_e4"),
        F.expr("_dc * 10000 div count_order").alias("avg_disc_e6"),
        "count_order",
    )


@register(
    "tpch_q03_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {SQL_REVENUE_SUM} AS revenue,
           CAST(o_orderdate AS DATE) AS orderdate
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def tpch_q03(spark, sf_dir):
    """TPC-H Q3 (shipping priority): filtered star join + top-10 by revenue.
    The customer side shrinks ~80% at the scan (mktsegment pushdown) and
    broadcasts; the final top-k is TakeOrderedAndProject (no global sort).
    Tie-break: l_orderkey (rounded revenue ties are possible)."""
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(revenue_sum().alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "tpch_q04_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    """,
)
def tpch_q04(spark, sf_dir):
    """TPC-H Q4 (order priority checking), adapted: the corpus has no
    commit/receipt dates, so the EXISTS predicate is "some lineitem shipped
    >30 days after the order date".  Executes as a left-semi join — state
    is one bit per order, never a row multiplication."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    )
    return (
        o.join(li, cond, "left_semi").groupBy("o_orderpriority").agg(
            F.count("*").alias("order_count")
        )
    )


@register(
    "tpch_q05_local_supplier_volume",
    oracle=f"""
    SELECT n_name, {SQL_REVENUE_SUM} AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def tpch_q05(spark, sf_dir):
    """TPC-H Q5 (local supplier volume): 6-table star with the extra
    c_nationkey = s_nationkey co-location predicate.

    The ASIA region constraint transitively restricts BOTH fact sides
    (supplier nation = customer nation ⊆ ASIA), so each side pre-reduces
    via a broadcast before the one fact-fact shuffle: lineitem ⋈
    broadcast(ASIA suppliers) and orders ⋈ broadcast(ASIA customers) cut
    both sides ~5× ahead of the exchange; the li⋈o join then carries the
    nation-equality as a second equi-key.  Same single-shuffle plan, 5×
    less data through it — the ordering Catalyst cannot derive because
    the region restriction reaches the facts only through two different
    dimension chains."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_n = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    s_f = s.join(F.broadcast(asia_n), s.s_nationkey == F.col("n_nationkey")).select(
        "s_suppkey", "s_nationkey", "n_name"
    )
    c_f = c.join(
        F.broadcast(asia_n.select("n_nationkey")),
        c.c_nationkey == F.col("n_nationkey"),
    ).select("c_custkey", "c_nationkey")
    li_r = li.join(F.broadcast(s_f), li.l_suppkey == F.col("s_suppkey"))
    o_r = o.join(F.broadcast(c_f), o.o_custkey == F.col("c_custkey"))
    return (
        li_r.join(
            o_r,
            (li_r.l_orderkey == o_r.o_orderkey)
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(revenue_sum().alias("revenue"))
    )


@register(
    "tpch_q06_forecast_revenue",
    oracle=f"""
    SELECT {_sql_fx_sum('l_extendedprice * l_discount', 4)} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.04
      AND l_quantity < 24
    """,
)
def tpch_q06(spark, sf_dir):
    """TPC-H Q6 (forecasting revenue change): pure scan-filter-aggregate;
    every predicate reaches PushedFilters, zero shuffles (single global
    aggregate via partial+final).  The BETWEEN on l_discount compares
    2-decimal doubles against exactly-representable literals."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & F.col("l_discount").between(0.02, 0.04)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        _fx_sum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue")
    )


@register(
    "tpch_q07_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l_shipdate) AS l_year, {SQL_REVENUE_SUM} AS revenue
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                         AND TIMESTAMP '1997-12-31 00:00:00'
    GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
    """,
)
def tpch_q07(spark, sf_dir):
    """TPC-H Q7 (volume shipping): nation-pair trade volume by year.

    Join-order matters more than join algorithm here: the disjunctive
    nation-pair predicate implies each side independently satisfies
    ``nation IN (N1, N2)`` — a constraint Catalyst does not extract from
    the OR — so we pre-reduce BOTH fact sides before the one fact-fact
    shuffle: lineitem ⋈ broadcast(supplier⋈n1, 2/25 nations) cuts the
    lineitem side ~92%, orders ⋈ broadcast(customer⋈n2) cuts the orders
    side the same, and only then do the two reduced facts shuffle-join.
    At 100 TB that is the difference between shuffling 8% and 100% of two
    fact tables.  The exact pair predicate applies after."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01 00:00:00").cast("timestamp"),
            F.lit("1997-12-31 00:00:00").cast("timestamp"),
        )
    )
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    pair_nations = ["NATION_1", "NATION_2"]
    n1 = n.filter(F.col("n_name").isin(pair_nations)).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.filter(F.col("n_name").isin(pair_nations)).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    s_f = s.join(F.broadcast(n1), s.s_nationkey == F.col("n1_key")).select(
        "s_suppkey", "supp_nation"
    )
    c_f = c.join(F.broadcast(n2), c.c_nationkey == F.col("n2_key")).select(
        "c_custkey", "cust_nation"
    )
    li_r = li.join(F.broadcast(s_f), li.l_suppkey == F.col("s_suppkey"))
    o_r = o.join(F.broadcast(c_f), o.o_custkey == F.col("c_custkey"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li_r.join(o_r, li_r.l_orderkey == o_r.o_orderkey)
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(revenue_sum().alias("revenue"))
    )


@register(
    "tpch_q08_market_share",
    oracle="""
    SELECT year(o_orderdate) AS o_year,
           CAST(sum(CASE WHEN n1.n_name = 'NATION_3'
                    THEN CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)
                    ELSE 0 END) * 10000
             // sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT))
             AS BIGINT) AS share_e4
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    JOIN region ON n2.n_regionkey = r_regionkey
    WHERE r_name = 'ASIA' AND p_type = 'PROMO'
      AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                          AND TIMESTAMP '1997-12-31 00:00:00'
    GROUP BY year(o_orderdate)
    """,
)
def tpch_q08(spark, sf_dir):
    """TPC-H Q8 (national market share), adapted: share of ASIA-region PROMO
    revenue supplied by NATION_3, per year.  The share is a ratio of two
    fixed-point sums emitted as an integer-scaled BIGINT (units 1e-4) via
    integer division — no float quotient crosses an engine boundary."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            F.lit("1996-01-01 00:00:00").cast("timestamp"),
            F.lit("1997-12-31 00:00:00").cast("timestamp"),
        )
    )
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_rkey")
    )
    rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0
    ).cast("long")
    nat = F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(F.lit(0))
    # Pre-reduce both fact sides before the one fact-fact shuffle: the PROMO
    # part filter cuts lineitem, the ASIA region chain (region -> n2 ->
    # customer) cuts orders — at scale the li⋈o exchange then carries only
    # qualifying rows instead of the full tables.
    li_r = (
        li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
    )
    c_f = (
        c.join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n2_rkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    o_r = o.join(F.broadcast(c_f), o.o_custkey == F.col("c_custkey"))
    return (
        li_r.join(o_r, li_r.l_orderkey == o_r.o_orderkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(nat).alias("_nat"), F.sum(rev).alias("_tot"))
        .select("o_year", F.expr("_nat * 10000 div _tot").alias("share_e4"))
    )


@register(
    "tpch_q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, {SQL_REVENUE_SUM} AS revenue,
           round(c_acctbal, 4) AS c_acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10(spark, sf_dir):
    """TPC-H Q10 (returned item reporting): top-20 customers by lost revenue
    in a quarter.  returnflag + date predicates push to the scans; the
    top-k is a TakeOrderedAndProject over ~1.5k aggregated rows."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(revenue_sum().alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            r4("c_acctbal").alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer
          LEFT JOIN orders ON c_custkey = o_custkey
                          AND o_orderpriority <> '5-LOW'
          GROUP BY c_custkey)
    GROUP BY c_count
    """,
)
def tpch_q13(spark, sf_dir):
    """TPC-H Q13 (customer order-count distribution): left join preserving
    order-less customers, double aggregation.  count(o_orderkey) counts
    only matched rows — identical null semantics in both engines."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "tpch_q14_promotion_effect",
    oracle="""
    SELECT CAST(sum(CASE WHEN p_type = 'PROMO'
                    THEN CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)
                    ELSE 0 END) * 10000
             // sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT))
             AS BIGINT) AS promo_share_e4
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
    """,
)
def tpch_q14(spark, sf_dir):
    """TPC-H Q14 (promotion effect): PROMO share of one month's revenue,
    emitted as integer-scaled BIGINT (units 1e-4; see module docstring)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0
    ).cast("long")
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(F.sum(promo).alias("_promo"), F.sum(rev).alias("_tot"))
        .select(F.expr("_promo * 10000 div _tot").alias("promo_share_e4"))
    )


@register(
    "tpch_q17_small_quantity_revenue",
    oracle=f"""
    WITH pq AS (SELECT l_partkey AS pk, count(*) AS n,
                       sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS sc
                FROM lineitem GROUP BY l_partkey)
    SELECT {sql_dsum('l_extendedprice')} AS small_qty_revenue,
           count(*) AS n_lines
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN pq ON l_partkey = pk
    WHERE p_brand = 'Brand#3'
      AND 5 * n * CAST(round(l_quantity * 100, 0) AS BIGINT) < sc
    """,
)
def tpch_q17(spark, sf_dir):
    """TPC-H Q17 (small-quantity-order revenue): lineitems of one brand with
    quantity below 20% of that part's average quantity.  The threshold
    ``qty < 0.2 * avg(qty)`` is cross-multiplied into exact integers
    (``5 * n * qty_cents < sum_cents``) so no engine's float average can
    flip a boundary row.  The per-part aggregate reuses the lineitem
    shuffle partitioning on l_partkey."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    pq = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.count("*").alias("n"), F.sum(_cents("l_quantity")).alias("sc")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(pq, li.l_partkey == pq.pk)
        .filter(F.lit(5) * F.col("n") * _cents("l_quantity") < F.col("sc"))
        .agg(
            dsum("l_extendedprice").alias("small_qty_revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "tpch_q18_large_volume_customer",
    oracle=f"""
    WITH big AS (SELECT l_orderkey AS bk
                 FROM lineitem GROUP BY l_orderkey
                 HAVING sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) > 15000)
    SELECT c_custkey, c_name, o_orderkey,
           CAST(o_orderdate AS DATE) AS orderdate,
           round(o_totalprice, 4) AS o_totalprice,
           {sql_dsum('l_quantity')} AS sum_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN big ON o_orderkey = bk
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def tpch_q18(spark, sf_dir):
    """TPC-H Q18 (large-volume customers): orders whose total quantity
    exceeds 150 (HAVING over fixed-point cents — exact), joined back for
    customer detail, top-100 by order value."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy(F.col("l_orderkey").alias("bk"))
        .agg(F.sum(_cents("l_quantity")).alias("_qc"))
        .filter(F.col("_qc") > 15000)
        .select("bk")
    )
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        li.join(big, li.l_orderkey == big.bk)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity").alias("sum_qty"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            r4("o_totalprice").alias("o_totalprice"),
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@register(
    "tpch_q19_discounted_revenue",
    oracle=f"""
    SELECT {SQL_REVENUE_SUM} AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 50
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19(spark, sf_dir):
    """TPC-H Q19 (discounted revenue): disjunction of conjunctive brand/
    size/quantity clauses — the classic OR-of-ANDs shape Catalyst splits
    into a common join key plus a residual filter."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    clause = (
        ((F.col("p_brand") == "Brand#12")
         & F.col("p_size").between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23")
           & F.col("p_size").between(1, 25) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3")
           & F.col("p_size").between(1, 50) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(clause)
        .agg(revenue_sum().alias("revenue"))
    )


@register(
    "tpch_q02_min_cost_supplier",
    oracle="""
    WITH cost AS (SELECT l_partkey AS pk, l_suppkey AS sk,
                         min(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS cost_c
                  FROM lineitem GROUP BY l_partkey, l_suppkey),
    eu AS (SELECT s_suppkey, s_name, n_name
           FROM supplier
           JOIN nation ON s_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           WHERE r_name = 'EUROPE')
    SELECT p_partkey, s_suppkey, s_name, n_name,
           CAST(round(cost_c / 100.0, 4) AS DOUBLE) AS supply_cost
    FROM (SELECT p_partkey, s_suppkey, s_name, n_name, cost_c,
                 min(cost_c) OVER (PARTITION BY p_partkey) AS mn
          FROM cost
          JOIN part ON pk = p_partkey
          JOIN eu ON sk = s_suppkey
          WHERE p_type = 'STANDARD' AND p_size < 10)
    WHERE cost_c = mn
    """,
)
def tpch_q02(spark, sf_dir):
    """TPC-H Q2 (minimum-cost supplier), adapted: the corpus has no
    partsupp, so supply cost of a (part, supplier) pair is the minimum
    l_extendedprice observed in lineitem (exact integer cents).  For
    STANDARD parts of size < 10, return every EUROPE supplier achieving
    the per-part minimum cost (ties all kept — the output is a set).
    The correlated min-cost subquery is a window min over the part key,
    so the per-part aggregate and the ranking share one shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    cost = li.groupBy(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).agg(F.min(_cents("l_extendedprice")).alias("cost_c"))
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") < 10)
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "n_name")
    )
    w = Window.partitionBy("p_partkey")
    return (
        cost.join(F.broadcast(p), F.col("pk") == p.p_partkey)
        .join(F.broadcast(eu), F.col("sk") == F.col("s_suppkey"))
        .withColumn("mn", F.min("cost_c").over(w))
        .filter(F.col("cost_c") == F.col("mn"))
        .select(
            "p_partkey",
            "s_suppkey",
            "s_name",
            "n_name",
            F.round(F.col("cost_c") / 100.0, 4).cast("double").alias("supply_cost"),
        )
    )


@register(
    "tpch_q09_product_type_profit",
    oracle="""
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)
             - CAST(round(p_retailprice * l_quantity * 10000, 0) AS BIGINT))
             AS BIGINT) AS profit_e4
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%gear%'
    GROUP BY n_name, year(o_orderdate)
    """,
)
def tpch_q09(spark, sf_dir):
    """TPC-H Q9 (product-type profit), adapted: no partsupp, so line cost
    is p_retailprice * l_quantity (both 2-decimal → the product is
    4-decimal-exact).  Profit per (supplier nation, order year) over parts
    whose name contains 'gear', emitted as an integer-scaled BIGINT
    (units 1e-4) — an exact, order-independent sum that may legitimately
    be negative."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0
    ).cast("long")
    cost = F.round(F.col("p_retailprice") * F.col("l_quantity") * 10000, 0).cast(
        "long"
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(rev - cost).alias("profit_e4"))
    )


@register(
    "tpch_q11_important_parts",
    oracle="""
    WITH v AS (SELECT l_partkey AS pk,
                      sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS val_c
               FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
               WHERE s_nationkey < 13
               GROUP BY l_partkey),
    t AS (SELECT sum(val_c) AS tot, count(*) AS np FROM v)
    SELECT pk AS p_partkey,
           CAST(round(val_c / 100.0, 4) AS DOUBLE) AS part_value
    FROM v, t
    WHERE 2 * val_c * np > 3 * tot
    """,
)
def tpch_q11(spark, sf_dir):
    """TPC-H Q11 (important stock identification), adapted: part "stock
    value" is the lineitem extended-price volume shipped by suppliers of
    the lower half of the nation-key range; keep parts whose value exceeds
    1.5x the mean part value (scale-free, so the query is non-degenerate
    at every SF — the classic fixed fraction empties out as the part
    count grows).  The threshold compares exact integer cents
    cross-multiplied (``2 * val_c * np > 3 * tot``) — no float fraction.
    The one-row total broadcasts; the per-part and global aggregates share
    the same shuffled partitioning."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") < 13)
    v = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(F.col("l_partkey").alias("pk"))
        .agg(F.sum(_cents("l_extendedprice")).alias("val_c"))
    )
    tot = v.agg(F.sum("val_c").alias("tot"), F.count("*").alias("np"))
    return (
        v.crossJoin(F.broadcast(tot))
        .filter(F.lit(2) * F.col("val_c") * F.col("np") > F.lit(3) * F.col("tot"))
        .select(
            F.col("pk").alias("p_partkey"),
            F.round(F.col("val_c") / 100.0, 4).cast("double").alias("part_value"),
        )
    )


@register(
    "tpch_q12_shipping_delay",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= o_orderdate + INTERVAL 30 DAY
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
)
def tpch_q12(spark, sf_dir):
    """TPC-H Q12 (shipping modes / order priority), adapted: the corpus
    has no l_shipmode or commit/receipt dates, so the mode axis is
    l_returnflag and "late delivery" is shipping ≥ 30 days after the
    order date.  Counts priority classes per flag for one year — pure
    integer counts, deterministic by construction."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q15_top_supplier",
    oracle="""
    WITH rev AS (SELECT l_suppkey AS sk,
                        sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0)
                            AS BIGINT)) AS r_c
                 FROM lineitem
                 WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                   AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
                 GROUP BY l_suppkey),
    m AS (SELECT max(r_c) AS mx FROM rev)
    SELECT s_suppkey, s_name,
           CAST(round(r_c / 10000.0, 4) AS DOUBLE) AS total_revenue
    FROM rev JOIN supplier ON sk = s_suppkey CROSS JOIN m
    WHERE r_c = mx
    """,
)
def tpch_q15(spark, sf_dir):
    """TPC-H Q15 (top supplier): supplier(s) with maximum revenue over one
    quarter.  The classic view + scalar-subquery max becomes an aggregate
    plus a broadcast one-row max joined back — ties (possible on exact
    integer revenue) all survive, matching the TPC-H spec.  Revenue is
    fixed-point e4 so the max comparison is exact in both engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    scaled = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0
    ).cast("long")
    rev = li.groupBy(F.col("l_suppkey").alias("sk")).agg(F.sum(scaled).alias("r_c"))
    mx = rev.agg(F.max("r_c").alias("mx"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("r_c") == F.col("mx"))
        .join(F.broadcast(s), F.col("sk") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("r_c") / 10000.0, 4).cast("double").alias("total_revenue"),
        )
    )


@register(
    "tpch_q16_parts_supplier_relation",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#12' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def tpch_q16(spark, sf_dir):
    """TPC-H Q16 (parts/supplier relationship), adapted: how many distinct
    suppliers ship each surviving (brand, type, size) combination,
    excluding suppliers with negative account balance (the corpus stand-in
    for the complaints NOT IN subquery).  The exclusion list is a
    broadcast anti-join; the distinct count is Spark's two-phase
    partial-distinct aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#12")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34)
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q20_potential_promotion",
    oracle="""
    WITH sel AS (SELECT l_suppkey AS sk
                 FROM lineitem JOIN part ON l_partkey = p_partkey
                 WHERE p_name LIKE 'small%'
                   AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                   AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
                 GROUP BY l_suppkey, l_partkey
                 HAVING sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) > 3000)
    SELECT s_suppkey, s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_nationkey IN (1, 3, 5)
      AND s_suppkey IN (SELECT sk FROM sel)
    """,
)
def tpch_q20(spark, sf_dir):
    """TPC-H Q20 (potential part promotion), adapted: suppliers in selected
    nations who shipped more than 30 units of some 'small...' part during
    1997 (the availqty > 0.5*sum(qty) predicate becomes a fixed threshold
    on exact quantity cents — no partsupp table exists).  The qualifying
    set is a grouped HAVING feeding a left-semi join, so the supplier
    table is never multiplied."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    sel = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("l_suppkey").alias("sk"), "l_partkey")
        .agg(F.sum(_cents("l_quantity")).alias("qc"))
        .filter(F.col("qc") > 3000)
        .select("sk")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_nationkey").isin(1, 3, 5)
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(sel, s.s_suppkey == sel.sk, "left_semi")
        .select("s_suppkey", "s_name", "n_name")
    )


@register(
    "tpch_q21_suppliers_kept_waiting",
    oracle="""
    SELECT s_name, s_suppkey, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name, s_suppkey
    """,
)
def tpch_q21(spark, sf_dir):
    """TPC-H Q21 (suppliers who kept orders waiting), adapted: "late" is
    shipping > 60 days after the order date (no commit/receipt dates in
    the corpus).  Counts, per supplier, late lines in finished
    multi-supplier orders where that supplier was the ONLY late one.

    Spark-first rewrite: instead of correlated EXISTS / NOT EXISTS
    (two extra joins against lineitem), aggregate once per
    (order, supplier) — late-line count per pair — then once per order —
    supplier count and late-supplier count — and filter
    ``n_supp > 1 AND n_late_supp = 1``.  One shuffle on the order key
    replaces both correlated probes; at 100 TB this is the difference
    between one exchange and three."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    late = (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    ).cast("int")
    per_os = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.sum(late).alias("late_lines"))
    )
    per_o = per_os.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.count("*").alias("n_supp"),
        F.sum((F.col("late_lines") > 0).cast("int")).alias("n_late_supp"),
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        per_os.join(per_o, per_os.l_orderkey == per_o.ok)
        .filter(
            (F.col("late_lines") > 0)
            & (F.col("n_supp") > 1)
            & (F.col("n_late_supp") == 1)
        )
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name", "s_suppkey")
        .agg(F.sum("late_lines").alias("numwait"))
    )


@register(
    "tpch_q22_global_sales_opportunity",
    oracle=f"""
    WITH pos AS (SELECT count(*) AS n,
                        sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS sc
                 FROM customer
                 WHERE c_acctbal > 0 AND c_nationkey IN (1, 3, 5, 7, 9))
    SELECT c_nationkey, count(*) AS numcust,
           {sql_dsum('c_acctbal')} AS totacctbal
    FROM customer, pos
    WHERE c_nationkey IN (1, 3, 5, 7, 9)
      AND CAST(round(c_acctbal * 100, 0) AS BIGINT) * n > sc
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= DATE '2000-01-01')
    GROUP BY c_nationkey
    """,
)
def tpch_q22(spark, sf_dir):
    """TPC-H Q22 (global sales opportunity), adapted to nation keys (the
    corpus has no phone column): customers in selected nations with
    above-average positive balance and no RECENT orders (none since
    2000-01-01 — the spec's own framing is "customers who have not placed
    orders for 7 years"; this corpus's generator gives virtually every
    customer SOME order across the full 1995-2001 window, so the bare
    no-orders predicate returned 0 rows at every SF — a hash-green but
    VACUOUS result, caught by the round-6 zero-row audit.  The recency
    cutoff restores a non-empty answer at every SF: 2/19/264 lapsed
    customers at sf0.001/0.01/0.1 before the balance filter).  The
    avg-balance threshold is compared in cross-multiplied integer form
    (``acctbal_cents * n > sum_cents``); the one-row aggregate broadcasts,
    and the no-recent-orders predicate is a left-anti join whose right
    side is date-filtered BEFORE the join (pushed to the orders scan)."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(1, 3, 5, 7, 9)
    )
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    pos = c.filter(F.col("c_acctbal") > 0).agg(
        F.count("*").alias("n"), F.sum(_cents("c_acctbal")).alias("sc")
    )
    return (
        c.crossJoin(F.broadcast(pos))
        .filter(_cents("c_acctbal") * F.col("n") > F.col("sc"))
        .join(recent, F.col("c_custkey") == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
    )
