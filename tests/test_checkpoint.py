"""lineage_cap dispatch (round-5 verdict item 4): the reliable mode must
checkpoint to a fault-tolerant directory instead of executor-local blocks,
and both modes must be lazy (constructing an op's plan runs no Spark job).
"""

from __future__ import annotations

import os

import pytest

from biggie_spark.registry import ORACLES, QUERIES
from biggie_spark.util import lineage_cap

from tests.compare import compare


def test_reliable_checkpoint_mode(spark, duck, sf_dir, tmp_path, monkeypatch):
    """SPARK_GRAFT_CHECKPOINT=reliable routes lineage caps through
    SparkContext.setCheckpointDir + Dataset.checkpoint: results stay
    oracle-exact and the checkpoint dir actually receives RDD files."""
    ckdir = str(tmp_path / "ck")
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT", "reliable")
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", ckdir)
    # An iterative op (label-prop loop, one lineage_cap per round) and a
    # fan-out op (one frame feeding several consumers).
    for name in ("llm_dedup_clusters", "llm_neardup_shingle"):
        compare(QUERIES[name](spark, sf_dir), duck, ORACLES[name])
    found = any(files for _, _, files in os.walk(ckdir))
    assert found, f"reliable mode wrote no checkpoint files under {ckdir}"
    # The SparkContext checkpoint dir has no unset API, and pointing it at
    # this test's tmp_path would leave later reliable-mode caps writing
    # into a pytest-pruned directory (lineage_cap only sets the dir when
    # none is set).  Park it on the DEFAULT reliable location instead, so
    # any later reliable use in this session writes somewhere durable.
    spark.sparkContext.setCheckpointDir("spark-warehouse/_checkpoints")


def test_lineage_cap_is_lazy(spark, sf_dir):
    """Plan construction must not run jobs (round-5 advice): lineage_cap is
    eager=False, so a capped frame can be built with the scheduler idle."""
    from pyspark.sql import functions as F

    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    df = spark.range(1000).withColumn("x", F.col("id") * 2)
    capped = lineage_cap(df)
    after = tracker.getJobIdsForGroup(None)
    assert len(after) == len(before), "lineage_cap ran an eager job"
    assert capped.count() == 1000


def test_lineage_cap_truncates_plan(spark):
    """The capped frame's logical plan is a scan of the checkpointed RDD —
    iterative loops keep O(1) plan depth instead of Fibonacci growth."""
    from pyspark.sql import functions as F

    df = spark.range(100)
    for _ in range(3):
        df = lineage_cap(df.withColumn("id", F.col("id") + 1))
    plan = df._jdf.queryExecution().logical().toString()
    assert "LogicalRDD" in plan or "ExistingRDD" in plan or "Scan" in plan
    assert df.agg(F.sum("id")).collect()[0][0] == sum(range(3, 103))
