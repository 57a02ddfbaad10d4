"""Skew mitigation helpers.

First line of defense is AQE (`spark.sql.adaptive.skewJoin.enabled`, on by
default in our session factory): oversized shuffle partitions are split at
runtime.  When a single GROUP BY key is itself too hot for one task (the
classic power-law key at 100 TB), two-phase salted aggregation spreads it:

    phase 1: group by (key, salt = hash(row) % n_salts)  -- n_salts-way fan-out
    phase 2: group by key, merging the partial states

Only works for algebraic aggregates (sum/count/min/max and anything with a
merge function).  tests/test_skew.py proves salted == plain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame, key: str, value: Column | str, n_salts: int = 16
) -> DataFrame:
    """Two-phase sum/count over a (possibly skewed) key column; result has
    columns (key, sum_val, n).  The salt is derived from xxhash64 of all
    columns — deterministic per row, uniform across salts."""
    v = F.col(value) if isinstance(value, str) else value
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)))
    partial = salted.groupBy(key, "_salt").agg(
        F.sum(v).alias("_s"), F.count("*").alias("_c")
    )
    return partial.groupBy(key).agg(
        F.sum("_s").alias("sum_val"), F.sum("_c").alias("n")
    )
