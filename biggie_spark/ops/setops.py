"""§2.G — sorts, limits, top-k, set operations, deduplication.

`limit_topk` compiles to TakeOrderedAndProject (per-partition heap + driver
merge — no global sort at any scale).  Set ops are native; exact dedup is
either full-row distinct (hash aggregate) or windowed keep-min-per-key,
which — unlike dropDuplicates — is deterministic (SURVEY.md §2.G).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from biggie_spark.io import load_table
from biggie_spark.registry import register


@register(
    "sort_multi",
    oracle="""
    SELECT o_orderkey, status_or_null,
           row_number() OVER (
             ORDER BY status_or_null ASC NULLS LAST, o_totalprice DESC, o_orderkey) AS pos
    FROM (
      SELECT o_orderkey, o_totalprice, nullif(o_orderstatus, 'P') AS status_or_null
      FROM orders WHERE o_totalprice > 400000
    )
    """,
)
def sort_multi(spark, sf_dir):
    """Multi-key sort with NULLS LAST — materialized as a global position
    column so the (order-insensitive) oracle hash still pins the ordering."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    o = o.select(
        "o_orderkey",
        "o_totalprice",
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_or_null"),
    )
    w = Window.orderBy(
        F.asc_nulls_last("status_or_null"),
        F.col("o_totalprice").desc(),
        F.col("o_orderkey"),
    )
    return o.select("o_orderkey", "status_or_null", F.row_number().over(w).alias("pos"))


@register(
    "limit_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def limit_topk(spark, sf_dir):
    """Global top-k: orderBy+limit -> TakeOrderedAndProject physical op
    (per-partition top-k heaps, no full shuffle/sort)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


def _status_keys(spark, sf_dir, status):
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderstatus") == status).select("o_custkey")


@register(
    "set_union_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    UNION ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def set_union_all(spark, sf_dir):
    return _status_keys(spark, sf_dir, "F").unionByName(_status_keys(spark, sf_dir, "P"))


@register(
    "set_union_distinct",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    UNION
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def set_union_distinct(spark, sf_dir):
    return (
        _status_keys(spark, sf_dir, "F")
        .union(_status_keys(spark, sf_dir, "P"))
        .distinct()
    )


@register(
    "set_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def set_intersect(spark, sf_dir):
    return _status_keys(spark, sf_dir, "F").intersect(_status_keys(spark, sf_dir, "P"))


@register(
    "set_except",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def set_except(spark, sf_dir):
    return _status_keys(spark, sf_dir, "F").subtract(_status_keys(spark, sf_dir, "P"))


@register(
    "dedup_exact_rows",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus, l_quantity FROM lineitem
    """,
)
def dedup_exact_rows(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus", "l_quantity").distinct()


@register(
    "dedup_by_key",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity FROM (
      SELECT l_orderkey, l_partkey, l_quantity,
             row_number() OVER (
               PARTITION BY l_orderkey
               ORDER BY l_linenumber, l_partkey, l_quantity) AS rn
      FROM lineitem
    ) WHERE rn = 1
    """,
)
def dedup_by_key(spark, sf_dir):
    """Keep exactly one deterministic row per key — row_number over an
    explicit order, NOT dropDuplicates (whose survivor is partition-order
    dependent and not reproducible across engines or runs).  The order
    covers every projected column because (l_orderkey, l_linenumber) is not
    unique in the corpus."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey", "l_quantity")
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_orderkey", "l_partkey", "l_quantity")
    )


@register(
    "set_intersect_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def set_intersect_all(spark, sf_dir):
    """Bag-semantics INTERSECT ALL (min of per-side multiplicities) — the
    variant audits need when duplicate cardinality carries meaning;
    Spark plans it as a counted hash aggregate per side + generate, not
    a distinct, so multiplicity survives."""
    return _status_keys(spark, sf_dir, "F").intersectAll(
        _status_keys(spark, sf_dir, "P")
    )


@register(
    "set_except_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def set_except_all(spark, sf_dir):
    """Bag-semantics EXCEPT ALL (multiplicity subtraction, floored at 0)
    — e.g. 'orders left after netting out one-for-one matches'."""
    return _status_keys(spark, sf_dir, "F").exceptAll(
        _status_keys(spark, sf_dir, "P")
    )
