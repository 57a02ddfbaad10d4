"""Modern SQL-surface clauses round 2 (joining spark4.py's GROUP BY ALL /
IDENTIFIER / parameterized-SQL family): ORDER BY ALL, SELECT * EXCEPT,
inline VALUES tables, and DISTINCT ON semantics.

Scale notes (100 TB):
* These are parser/analyzer surfaces — each compiles to a plan already
  covered by the relational family (sort, projection, local relation,
  ranking window), so the scale posture is inherited: ORDER BY ALL is a
  global sort of an already-aggregated tiny frame; EXCEPT is column
  pruning (the scan reads only survivors); VALUES is a broadcast-sized
  LocalRelation; DISTINCT ON is the per-key window top-1 (one shuffle on
  the key, no self-join).
* ``sql_distinct_on`` is deliberately asymmetric: DuckDB runs its native
  ``DISTINCT ON`` clause while Spark (which has no such clause) runs the
  canonical row_number()=1 rewrite — the op certifies the REWRITE's
  equivalence, which is what a porting user needs to trust.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from biggie_spark.io import load_table
from biggie_spark.registry import register
from biggie_spark.util import sql_dsum


@register(
    "sql_order_by_all",
    oracle=f"""
    SELECT o_orderpriority, CAST(year(o_orderdate) AS BIGINT) AS yr,
           count(*) AS n, {sql_dsum("o_totalprice")} AS total
    FROM orders GROUP BY o_orderpriority, yr
    ORDER BY ALL
    """,
)
def sql_order_by_all(spark, sf_dir):
    """``ORDER BY ALL`` — sort by every select-list column left to right
    (the ergonomic default for report queries; both engines added it with
    identical semantics).  The sort runs on the aggregated frame (≤
    priorities × years rows), so the global order-by is trivially cheap;
    the corpus-sized work is the one hash aggregate before it.  Scored
    output is order-insensitive (driver sorts rows), so what this op
    certifies is that the clause RESOLVES the same way — any divergence
    in which columns get sorted would not change the hash, but a parse
    failure or mis-binding fails loudly."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_oba")
    return spark.sql(
        """
        SELECT o_orderpriority, CAST(year(o_orderdate) AS BIGINT) AS yr,
               count(*) AS n,
               CAST(round(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                          / 100.0, 4) AS DOUBLE) AS total
        FROM orders_oba GROUP BY o_orderpriority, yr
        ORDER BY ALL
        """
    )


@register(
    "sql_select_except",
    oracle="""
    SELECT * EXCLUDE (c_name, c_mktsegment)
    FROM customer WHERE c_custkey <= 500
    """,
)
def sql_select_except(spark, sf_dir):
    """``SELECT * EXCEPT (...)`` (DuckDB spells it EXCLUDE) — drop the
    free-text columns (name, segment), keep everything else without
    enumerating the survivors.  This is a COLUMN-PRUNING surface: the
    excepted columns never reach the scan's ReadSchema, so at 100 TB
    their payload bytes are simply never read — the same reason the
    multimodal ops keep binary payloads in their own column.  The oracle
    cross-checks that both engines resolve the star-minus-set to the
    identical surviving schema."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_exc")
    return spark.sql(
        """
        SELECT * EXCEPT (c_name, c_mktsegment)
        FROM customer_exc WHERE c_custkey <= 500
        """
    )


@register(
    "sql_values_inline",
    oracle="""
    WITH rates(cur, fx) AS (VALUES ('BAL', 1.0), ('TAX', 1.1), ('FEE', 0.25))
    SELECT n_name, r.cur,
           CAST(round(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT))
                      * r.fx / 100.0, 2) AS DOUBLE) AS adj_total
    FROM customer
    JOIN nation ON n_nationkey = c_nationkey
    CROSS JOIN rates r
    WHERE n_name IN ('NATION_0', 'NATION_1', 'NATION_2')
    GROUP BY n_name, r.cur, r.fx
    """,
)
def sql_values_inline(spark, sf_dir):
    """Inline ``VALUES`` table constructor — the idiomatic way to ship a
    small literal dimension (fx rates, enum decodes, config knobs) INTO
    the query instead of a side file.  The VALUES relation is a
    LocalRelation: it serializes with the plan and broadcasts, so the
    cross join against it is a width-3 fan-out with zero shuffle — the
    pattern to reach for before writing a one-off dimension parquet.
    Fixed-point money math as usual; the per-(nation, rate) totals are
    exact cents scaled once by the rate."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_vi")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation_vi")
    return spark.sql(
        """
        WITH rates AS (
          SELECT * FROM VALUES ('BAL', 1.0), ('TAX', 1.1), ('FEE', 0.25)
            AS t(cur, fx))
        SELECT n_name, r.cur,
               CAST(round(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT))
                          * r.fx / 100.0, 2) AS DOUBLE) AS adj_total
        FROM customer_vi
        JOIN nation_vi ON n_nationkey = c_nationkey
        CROSS JOIN rates r
        WHERE n_name IN ('NATION_0', 'NATION_1', 'NATION_2')
        GROUP BY n_name, r.cur, r.fx
        """
    )


@register(
    "sql_distinct_on",
    oracle="""
    SELECT DISTINCT ON (c_nationkey)
           c_nationkey, c_custkey, c_name,
           CAST(round(c_acctbal, 4) AS DOUBLE) AS bal
    FROM customer
    ORDER BY c_nationkey, c_acctbal DESC, c_custkey
    """,
)
def sql_distinct_on(spark, sf_dir):
    """``DISTINCT ON (key) ... ORDER BY key, tiebreak`` — keep exactly
    one row per key (here: each nation's richest customer, custkey
    tiebreak).  Spark has no DISTINCT ON clause, so this op certifies
    the canonical rewrite every porting guide prescribes — a
    row_number() = 1 ranking window over the same ORDER BY — against
    DuckDB's native clause.  The window shuffles once on the key and
    keeps one row per key in state; no self-join against a groupBy-max
    (the rewrite that breaks on ties).  Same plan family as
    win_topk_per_group / llm_dedup_keep_best, surfaced as the SQL
    porting contract."""
    from pyspark.sql import Window

    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), "c_custkey"
    )
    return (
        load_table(spark, sf_dir, "customer")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "c_nationkey",
            "c_custkey",
            "c_name",
            F.round(F.col("c_acctbal"), 4).cast("double").alias("bal"),
        )
    )


@register(
    "sql_lateral_alias",
    oracle=f"""
    SELECT o_orderkey,
           CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
           CAST(round(o_totalprice * 100, 0) AS BIGINT) // 100000 AS bucket,
           (CAST(round(o_totalprice * 100, 0) AS BIGINT) // 100000) * 2
             AS bucket_x2
    FROM orders WHERE o_orderkey <= 2000
    """,
)
def sql_lateral_alias(spark, sf_dir):
    """Lateral column aliases — referencing a select-list alias from a
    LATER item in the same SELECT (``cents`` feeds ``bucket`` feeds
    ``bucket_x2``), the ergonomic surface that otherwise forces nested
    subqueries or repeated expressions.  Spark resolves the chain at
    analysis time into one projection (the repeated expression is
    computed once per distinct alias under codegen CSE), so the feature
    is free at any scale; DuckDB has no lateral aliases, so the oracle
    states the expanded form — certifying the EXPANSION is what a
    porting user needs."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_la")
    return spark.sql(
        """
        SELECT o_orderkey,
               CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
               cents div 100000 AS bucket,
               bucket * 2 AS bucket_x2
        FROM orders_la WHERE o_orderkey <= 2000
        """
    )


@register(
    "fn_observe_metrics",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
             AS total_cents,
           CAST(count(CASE WHEN o_totalprice > 400000 THEN 1 END) AS BIGINT)
             AS n_jumbo
    FROM orders
    """,
)
def fn_observe_metrics(spark, sf_dir):
    """The Observation API (``df.observe``) — Spark's built-in pipeline
    telemetry: named aggregate metrics piggyback on an EXISTING action's
    pass over the data (zero extra scans, collected driver-side by a
    query listener), which is how a production job reports row counts
    and quality tallies without a second job.

    The op attaches three metrics to a pass over orders, drives one
    action, and returns the observed values as a 1-row frame — the
    oracle recomputes them relationally, proving the listener-delivered
    numbers equal the ground truth.  At 100 TB this is the difference
    between monitoring-for-free and doubling the read bill."""
    from pyspark.sql import Observation

    o = load_table(spark, sf_dir, "orders")
    obs = Observation("orders_metrics")
    observed = o.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
            "total_cents"
        ),
        F.count(F.when(F.col("o_totalprice") > 400000, 1)).alias("n_jumbo"),
    )
    observed.write.format("noop").mode("overwrite").save()  # the host action
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["total_cents"], m["n_jumbo"])],
        "n_rows bigint, total_cents bigint, n_jumbo bigint",
    )


@register(
    "sql_exists_any_all",
    oracle="""
    SELECT c_custkey,
           EXISTS (SELECT 1 FROM orders o
                   WHERE o.o_custkey = c.c_custkey
                     AND o.o_totalprice > 300000) AS has_big,
           c_acctbal > ALL (SELECT o_totalprice / 100 FROM orders o
                            WHERE o.o_custkey = c.c_custkey) AS beats_all,
           c_acctbal < ANY (SELECT o_totalprice / 100 FROM orders o
                            WHERE o.o_custkey = c.c_custkey) AS under_some
    FROM customer c WHERE c_custkey <= 800
    """,
)
def sql_exists_any_all(spark, sf_dir):
    """The quantified-subquery surfaces — EXISTS plus the ALL / ANY
    comparators — with their famously subtle empty-set semantics
    (x > ALL(empty) is TRUE, x < ANY(empty) is FALSE).  Spark's parser
    has no quantified comparators, so this op certifies the canonical
    PORTING REWRITE (the same contract role as sql_distinct_on): DuckDB
    runs native ALL/ANY, Spark runs the decorrelated form every engine
    compiles them to anyway — x > ALL(S) ⇔ x > max(S) OR S empty;
    x < ANY(S) ⇔ x < max(S) — as ONE per-key aggregate left-joined back,
    plus an EXISTS via Spark's native correlated predicate.  One join on
    the correlation key, no per-row re-execution, usable at 100 TB."""
    from biggie_spark.io import register_views

    register_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(
        """
        WITH per_cust AS (
          SELECT o_custkey, max(o_totalprice / 100) AS mx
          FROM orders GROUP BY o_custkey)
        SELECT c_custkey,
               EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey
                         AND o.o_totalprice > 300000) AS has_big,
               CASE WHEN p.mx IS NULL THEN TRUE
                    ELSE c_acctbal > p.mx END AS beats_all,
               CASE WHEN p.mx IS NULL THEN FALSE
                    ELSE c_acctbal < p.mx END AS under_some
        FROM customer c LEFT JOIN per_cust p ON p.o_custkey = c.c_custkey
        WHERE c_custkey <= 800
        """
    )
