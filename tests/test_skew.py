"""Salted two-phase aggregation must be value-identical to the plain
aggregate (integer/count outputs — float sums would reorder summation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from biggie_spark.io import load_table
from biggie_spark.skew import salted_sum_count


def test_salted_agg_equals_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("long").alias("q")
    )
    plain = {
        r.l_returnflag: (r.sum_val, r.n)
        for r in li.groupBy("l_returnflag")
        .agg(F.sum("q").alias("sum_val"), F.count("*").alias("n"))
        .collect()
    }
    salted = {
        r.l_returnflag: (r.sum_val, r.n)
        for r in salted_sum_count(li, "l_returnflag", "q").collect()
    }
    assert plain == salted


def test_salted_join_shuffles_on_key_and_salt(spark, sf_dir):
    """join_salted_skew's fact-side exchange must partition on
    (l_suppkey, salt) — the whole point of the replicate join — and the
    dim side must carry n_salts copies per supplier row."""
    from biggie_spark.ops.bucketing import join_salted_skew
    from biggie_spark.util import temp_conf

    with temp_conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"):
        n_salts = 8
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_suppkey",
            F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).alias("salt"),
        )
        sup = (
            load_table(spark, sf_dir, "supplier")
            .select("s_suppkey")
            .withColumn(
                "salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
            )
        )
        joined = li.join(
            sup, (li.l_suppkey == sup.s_suppkey) & (li.salt == sup.salt)
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "hashpartitioning(l_suppkey" in plan and "salt" in plan.split(
            "hashpartitioning(l_suppkey", 1
        )[1][:80], plan
    # replication factor: dim side has exactly n_salts rows per supplier
    n_sup = load_table(spark, sf_dir, "supplier").count()
    assert sup.count() == n_salts * n_sup
    # end-to-end values equal the unsalted join (the registered op's oracle
    # re-checks this against DuckDB; here we pin Spark-vs-Spark)
    from biggie_spark.util import revenue_sum

    out = {
        r.n_name: (r.n, r.revenue)
        for r in join_salted_skew(spark, sf_dir).collect()
    }
    li_f = load_table(spark, sf_dir, "lineitem")
    sup_f = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    plain = {
        r.n_name: (r.n, r.revenue)
        for r in li_f.join(sup_f, li_f.l_suppkey == sup_f.s_suppkey)
        .join(nat, sup_f.s_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n"), revenue_sum().alias("revenue"))
        .collect()
    }
    assert out == plain
