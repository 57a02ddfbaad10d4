"""§2.E — aggregations.

All native Catalyst hash aggregates (partial + final merge is automatic —
map-side combine means the shuffle carries one row per group per partition,
which is what keeps these O(groups) not O(rows) at 100 TB).  ROLLUP/CUBE/
GROUPING SETS expand in the optimizer; pivot compiles to a single-pass
conditional aggregate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from biggie_spark.io import load_table, register_views
from biggie_spark.registry import register
from biggie_spark.util import dsum, r4, revenue_sum


@register(
    "agg_scalar",
    oracle="""
    SELECT count(*) AS n,
           CAST(round(sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) / 100.0, 4) AS DOUBLE) AS sum_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(min(l_discount), 4) AS min_disc,
           round(max(l_tax), 4) AS max_tax
    FROM lineitem
    """,
)
def agg_scalar(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n"),
        dsum("l_quantity").alias("sum_qty"),
        r4(F.avg("l_extendedprice")).alias("avg_price"),
        r4(F.min("l_discount")).alias("min_disc"),
        r4(F.max("l_tax")).alias("max_tax"),
    )


@register(
    "agg_groupby",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(round(sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) / 100.0, 4) AS DOUBLE) AS sum_qty,
           CAST(round(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) / 100.0, 4) AS DOUBLE) AS sum_base,
           CAST(round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) / 10000.0, 4) AS DOUBLE) AS sum_disc,
           round(avg(l_quantity), 4) AS avg_qty,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_groupby(spark, sf_dir):
    """TPC-H Q1-style pricing summary (bench `q_pricing_summary`)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        # No fan_out (optimization r14, measured): the baseline plan
        # shuffles only the ~6-row partial-agg output, so any repartition
        # replaces that with a 600k-raw-row shuffle — measured WORSE
        # (0.33 s baseline vs 0.51 s round-robin / 0.37 s hash at sf0.1).
        # The remaining single-task cost is parquet decode of a
        # single-row-group file, which no post-scan exchange can split.
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base"),
            revenue_sum().alias("sum_disc"),
            r4(F.avg("l_quantity")).alias("avg_qty"),
            F.count("*").alias("n"),
        )
    )


@register(
    "agg_having",
    oracle="""
    SELECT o_orderpriority, count(*) AS n, CAST(round(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) / 100.0, 4) AS DOUBLE) AS sum_price
    FROM orders GROUP BY o_orderpriority
    HAVING count(*) > 10 AND avg(o_totalprice) > 100000
    """,
)
def agg_having(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            dsum("o_totalprice").alias("sum_price"),
            F.avg("o_totalprice").alias("_avg"),
        )
        .filter((F.col("n") > 10) & (F.col("_avg") > 100000))
        .drop("_avg")
    )


@register(
    "agg_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_distinct(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count("*").alias("n"),
    )


@register(
    "agg_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS exact_parts,
           count(DISTINCT l_orderkey) AS exact_orders,
           TRUE AS approx_parts_ok,
           TRUE AS approx_orders_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_distinct(spark, sf_dir):
    """approx_count_distinct (HyperLogLog++) — the scale path for distinct
    counting at 100 TB.  Raw HLL estimates are engine-specific, so the
    scored output is engine-portable: the exact counts plus a boolean per
    sketch asserting the estimate landed within 10% of exact (HLL++ at the
    default rsd=0.05 is comfortably inside that).  The sketch still runs;
    the oracle pins TRUE."""
    from biggie_spark.util import fan_out

    # fan_out (optimization r14, guide §2.5): the multi-distinct plan is
    # Expand x3 over the scan followed by a 104-field HLL partial
    # aggregate — all inside the single-row-group scan task otherwise.
    # Keyed on l_partkey (a column the query already reads) so the spread
    # exchange is content-deterministic with no round-robin presort.
    # Measured warm at sf0.1: 1.63 s -> 0.91 s (round-robin only 1.37 s).
    li = fan_out(load_table(spark, sf_dir, "lineitem"), "l_partkey")
    agg = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.approx_count_distinct("l_partkey").alias("_ap"),
        F.approx_count_distinct("l_orderkey").alias("_ao"),
    )
    ok = lambda a, e: (  # noqa: E731
        F.abs(F.col(a) - F.col(e)) <= 0.1 * F.col(e)
    )
    return agg.select(
        "l_returnflag",
        "exact_parts",
        "exact_orders",
        ok("_ap", "exact_parts").alias("approx_parts_ok"),
        ok("_ao", "exact_orders").alias("approx_orders_ok"),
    )


@register(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 4) AS sd_qty,
           round(var_samp(l_discount), 4) AS var_disc,
           round(corr(l_quantity, l_extendedprice), 4) + 0 AS corr_qty_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_stats(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        r4(F.stddev_samp("l_quantity")).alias("sd_qty"),
        r4(F.var_samp("l_discount")).alias("var_disc"),
        r4(F.corr("l_quantity", "l_extendedprice")).alias("corr_qty_price"),
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT c_mktsegment, c_nationkey, count(*) AS n, CAST(round(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) / 100.0, 4) AS DOUBLE) AS sum_bal
    FROM customer GROUP BY ROLLUP (c_mktsegment, c_nationkey)
    """,
)
def agg_rollup(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    return c.rollup("c_mktsegment", "c_nationkey").agg(
        F.count("*").alias("n"), dsum("c_acctbal").alias("sum_bal")
    )


@register(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           CAST(round(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) / 100.0, 4) AS DOUBLE) AS sum_price
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"), dsum("o_totalprice").alias("sum_price")
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def agg_grouping_sets(spark, sf_dir):
    """Explicit grouping sets via the SQL entry point (SURVEY.md §3.3)."""
    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "agg_collect",
    oracle="""
    SELECT n_regionkey, array_to_string(list_sort(list(n_name)), '|') AS names
    FROM nation GROUP BY n_regionkey
    """,
)
def agg_collect(spark, sf_dir):
    """collect_list with a deterministic sort; the scored output joins the
    array to a string (driver canonicalizer can't sort list cells)."""
    n = load_table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.concat_ws("|", F.sort_array(F.collect_list("n_name"))).alias("names")
    )


@register(
    "agg_pivot",
    oracle="""
    SELECT user_id,
           CAST(sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS error,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS signup,
           CAST(sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS view
    FROM events GROUP BY user_id
    """,
)
def agg_pivot(spark, sf_dir):
    """Pivot event_type to columns.  Values are pinned so the output schema
    is static (a 100 TB pivot must never scan-to-discover its columns)."""
    ev = load_table(spark, sf_dir, "events")
    kinds = ["click", "error", "purchase", "signup", "view"]
    piv = ev.groupBy("user_id").pivot("event_type", kinds).count()
    return piv.select(
        "user_id", *[F.coalesce(F.col(k), F.lit(0)).alias(k) for k in kinds]
    )


@register(
    "agg_unpivot",
    oracle="""
    WITH w AS (
      SELECT l_returnflag,
             CAST(round(sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) / 100.0, 4) AS DOUBLE) AS sum_qty,
             CAST(round(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) / 100.0, 4) AS DOUBLE) AS sum_price
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, metric, val
    FROM w UNPIVOT (val FOR metric IN (sum_qty, sum_price))
    """,
)
def agg_unpivot(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_price"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price"],
        variableColumnName="metric",
        valueColumnName="val",
    )
