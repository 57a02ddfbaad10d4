"""get_json_object (path extraction) must agree with from_json (schema
extraction) — the cross-check that used to live inside fn_json's hot path
(moved here: double-parsing costs ~2x at scale)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from biggie_spark.io import load_table


def test_json_extraction_paths_agree(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    k1 = F.get_json_object("props", "$.k").cast("int")
    k2 = F.from_json("props", T.StructType([T.StructField("k", T.IntegerType())]))["k"]
    n_disagree = (
        ev.select(k1.alias("k1"), k2.alias("k2"), F.json_tuple("props", "k"))
        .withColumnRenamed("c0", "k3_raw")
        .withColumn("k3", F.col("k3_raw").cast("int"))
        .filter(
            ~F.col("k1").eqNullSafe(F.col("k2"))
            | ~F.col("k1").eqNullSafe(F.col("k3"))
        )
        .count()
    )
    assert n_disagree == 0
