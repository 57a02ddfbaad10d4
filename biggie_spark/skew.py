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
    salt_col = "_biggie_salt"
    if salt_col in df.columns:
        raise ValueError(f"input already has a {salt_col!r} column")
    # the salt must be row-unique, not row-content-derived: a hot key made
    # of MILLIONS OF IDENTICAL ROWS (the classic power-law case) would hash
    # every duplicate into one bucket and defeat the fan-out.  The result
    # is salt-independent, so a nondeterministic row id is fine here.
    salted = df.withColumn(
        salt_col, F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )
    partial = salted.groupBy(key, salt_col).agg(
        F.sum(v).alias("_s"), F.count("*").alias("_c")
    )
    return partial.groupBy(key).agg(
        F.sum("_s").alias("sum_val"), F.sum("_c").alias("n")
    )
