"""btable type widening (Delta's typeWidening idea) through
append(merge_schema=True): narrower writes upcast into the table type;
wider writes along a lossless chain (tinyint<smallint<int<bigint,
float<double) widen the TABLE type metadata-only — old files stay
untouched and Spark's parquet reader promotes their physical encoding
under the explicit read schema.  Anything lossy still raises."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from biggie_spark.tablefmt import BTable, SchemaMismatch


def _mk(spark, lo, hi, ktype="int", xtype="float"):
    return (
        spark.range(lo, hi)
        .coalesce(1)
        .select(
            F.col("id").cast(ktype).alias("k"),
            (F.col("id") * 0.5).cast(xtype).alias("x"),
        )
    )


def test_narrow_write_upcasts_into_table_type(spark, tmp_path):
    t = BTable.create(
        spark, str(tmp_path / "t"), _mk(spark, 0, 10, "bigint", "double")
    )
    t.append(spark, _mk(spark, 10, 20, "int", "float"), merge_schema=True)
    df = t.read(spark)
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "bigint",
        "double",
    ], "table schema unchanged"
    assert df.count() == 20
    assert df.agg(F.sum("k")).collect()[0][0] == sum(range(20))


def test_wide_write_widens_table_metadata_only(spark, tmp_path):
    t = BTable.create(spark, str(tmp_path / "t"), _mk(spark, 0, 10))
    files_before = set(t.snapshot().files)
    t.append(
        spark, _mk(spark, 10, 20, "bigint", "double"), merge_schema=True
    )
    df = t.read(spark)
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "bigint",
        "double",
    ], "table type widened"
    assert files_before <= set(t.snapshot().files), "no file rewritten"
    # old int32/float physical files read back promoted
    assert df.agg(F.sum("k")).collect()[0][0] == sum(range(20))
    got = sorted(r["x"] for r in df.collect())
    assert got == [i * 0.5 for i in range(20)]


def test_widened_stats_keep_pruning(spark, tmp_path):
    t = BTable.create(spark, str(tmp_path / "t"), _mk(spark, 0, 25))
    t.append(spark, _mk(spark, 25, 50), merge_schema=True)
    t.append(
        spark, _mk(spark, 50, 75, "bigint", "double"), merge_schema=True
    )
    # int-era stats prune under the bigint read schema
    assert t.scan_file_count("k <= 24") == 1
    assert t.scan_file_count("k >= 60") == 1
    assert t.read(spark, where="k >= 60").count() == 15


def test_widen_keeps_bloom_pruning(spark, tmp_path):
    t = BTable.create(
        spark,
        str(tmp_path / "t"),
        _mk(spark, 0, 25),
        bloom_cols=["k"],
        bloom_bits=512,
    )
    t.append(
        spark, _mk(spark, 25, 50, "bigint", "double"), merge_schema=True
    )
    # canonical integral strings are width-independent: "7" is "7"
    assert t.scan_file_count("k == 7") == 1
    assert t.scan_file_count("k == 999") == 0
    assert t.read(spark, where="k == 30").count() == 1


def test_tinyint_chain_and_smallint_chain(spark, tmp_path):
    t = BTable.create(
        spark, str(tmp_path / "t"), _mk(spark, 0, 5, "tinyint", "float")
    )
    t.append(
        spark, _mk(spark, 5, 10, "smallint", "float"), merge_schema=True
    )
    assert t.read(spark).schema["k"].dataType.simpleString() == "smallint"
    t.append(spark, _mk(spark, 10, 15, "bigint", "float"), merge_schema=True)
    assert t.read(spark).schema["k"].dataType.simpleString() == "bigint"
    assert t.read(spark).agg(F.sum("k")).collect()[0][0] == sum(range(15))


def test_lossy_changes_still_raise(spark, tmp_path):
    t = BTable.create(
        spark, str(tmp_path / "t"), _mk(spark, 0, 10, "bigint", "double")
    )
    bad = spark.range(3).select(
        F.col("id").cast("string").alias("k"),
        (F.col("id") * 0.5).alias("x"),
    )
    with pytest.raises(SchemaMismatch, match="losslessly"):
        t.append(spark, bad, merge_schema=True)
    # double -> float is a NARROWER write: upcasts, never truncates table
    t.append(spark, _mk(spark, 10, 12, "bigint", "float"), merge_schema=True)
    assert t.read(spark).schema["x"].dataType.simpleString() == "double"


def test_strict_append_still_rejects_width_mismatch(spark, tmp_path):
    t = BTable.create(spark, str(tmp_path / "t"), _mk(spark, 0, 10))
    with pytest.raises(SchemaMismatch):
        t.append(spark, _mk(spark, 10, 20, "bigint", "double"))
