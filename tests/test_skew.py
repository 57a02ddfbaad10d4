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
