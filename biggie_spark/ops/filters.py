"""§2.C — projections, filters, predicates.

All pure Catalyst territory: these compile to parquet predicate pushdown +
column pruning; nothing custom.  Each query projects a stable keyed output so
the oracle hash pins both the predicate semantics and null handling.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from biggie_spark.io import load_table
from biggie_spark.registry import register
from biggie_spark.util import r4


@register(
    "rel_project",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(o_totalprice * 1.1, 4) AS gross,
           upper(o_orderpriority) AS pri
    FROM orders
    """,
)
def rel_project(spark, sf_dir):
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        r4(F.col("o_totalprice") * 1.1).alias("gross"),
        F.upper("o_orderpriority").alias("pri"),
    )


@register(
    "rel_filter_cmp",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
    WHERE l_quantity >= 45.0 AND l_discount < 0.02
      AND l_shipdate > TIMESTAMP '2000-01-01 00:00:00'
    """,
)
def rel_filter_cmp(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") >= 45.0)
        & (F.col("l_discount") < 0.02)
        & (F.col("l_shipdate") > F.lit("2000-01-01 00:00:00").cast("timestamp"))
    ).select("l_orderkey", "l_linenumber", "l_quantity")


@register(
    "rel_filter_bool",
    oracle="""
    SELECT o_orderkey FROM orders
    WHERE (o_orderstatus = 'F' OR o_totalprice > 300000)
      AND NOT (o_orderpriority = '5-LOW')
    """,
)
def rel_filter_bool(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        ((F.col("o_orderstatus") == "F") | (F.col("o_totalprice") > 300000))
        & ~(F.col("o_orderpriority") == "5-LOW")
    ).select("o_orderkey")


@register(
    "rel_filter_in",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
    """,
)
def rel_filter_in(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    return c.filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY")).select(
        "c_custkey", "c_mktsegment"
    )


@register(
    "rel_filter_like",
    oracle="""
    SELECT p_partkey, p_name FROM part
    WHERE p_name LIKE '%bolt%' OR regexp_matches(p_name, '^s[mo]')
    """,
)
def rel_filter_like(spark, sf_dir):
    p = load_table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").like("%bolt%") | F.col("p_name").rlike("^s[mo]")
    ).select("p_partkey", "p_name")


@register(
    "rel_filter_between",
    oracle="""
    SELECT s_suppkey, s_acctbal FROM supplier
    WHERE s_acctbal BETWEEN 1000.0 AND 5000.0
    """,
)
def rel_filter_between(spark, sf_dir):
    s = load_table(spark, sf_dir, "supplier")
    return s.filter(F.col("s_acctbal").between(1000.0, 5000.0)).select(
        "s_suppkey", "s_acctbal"
    )


@register(
    "rel_filter_null",
    oracle="""
    SELECT
      CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
      CAST(sum(CASE WHEN props IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_notnull,
      CAST(sum(CASE WHEN event_type IS NOT DISTINCT FROM 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click
    FROM events
    """,
)
def rel_filter_null(spark, sf_dir):
    """IS NULL / null-safe equality over the events table."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.sum(F.when(F.col("props").isNull(), 1).otherwise(0)).alias("n_null"),
        F.sum(F.when(F.col("props").isNotNull(), 1).otherwise(0)).alias("n_notnull"),
        F.sum(F.when(F.col("event_type").eqNullSafe("click"), 1).otherwise(0)).alias(
            "n_click"
        ),
    )
