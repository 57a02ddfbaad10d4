"""Focused tests for the round-14 optimization internals in util.py:
fan_out / fan_in (scale-adaptive input-parallelism helpers) and the
topk_by_cosine prenorm fast path.  These guard the *internals* the
optimization round changed; output equivalence vs the DuckDB oracle is
covered separately by the driver-shaped correctness suite."""

from __future__ import annotations

from pyspark.sql import functions as F

from biggie_spark.util import (
    cosine,
    fan_in,
    fan_out,
    l2_norm_sq,
    topk_by_cosine,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_fan_out_spreads_single_split_scan(spark, sf_dir):
    """A single-row-group parquet scan is one task; fan_out must raise it
    to the session parallelism (the guide §2.5 unsplittable-input remedy)."""
    from biggie_spark.io import load_table

    d = load_table(spark, sf_dir, "documents")
    assert d.rdd.getNumPartitions() == 1  # the premise: single split
    p = spark.sparkContext.defaultParallelism
    assert fan_out(d).rdd.getNumPartitions() == p


def test_fan_out_is_identity_on_big_inputs(spark):
    """The size gate: an input whose optimizer estimate already fills the
    cores with 64 MB splits must be returned UNCHANGED (no added shuffle)
    — this is what makes fan_out safe to leave in at production scale."""
    big = spark.range(1 << 40)  # size estimate = 8 TiB, cost nothing to build
    assert fan_out(big) is big
    assert fan_in(big) is big


def test_fan_out_keyed_uses_hash_partitioning_without_presort(spark, sf_dir):
    """fan_out(df, key) must hash-partition (content-deterministic, no
    round-robin pre-sort): the plan carries hashpartitioning(key) and no
    ROUND_ROBIN exchange."""
    from biggie_spark.io import load_table

    d = fan_out(load_table(spark, sf_dir, "orders"), "o_custkey")
    plan = _plan(d)
    assert "hashpartitioning(o_custkey" in plan
    assert "roundrobin" not in plan.lower()
    p = spark.sparkContext.defaultParallelism
    assert d.rdd.getNumPartitions() == p


def test_fan_out_keyed_result_identical(spark, sf_dir):
    """Hash fan_out must not change any row (it is an exchange, not a
    filter/projection): full multiset of rows is preserved."""
    from biggie_spark.io import load_table

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    base = {tuple(r) for r in o.collect()}
    spread = {tuple(r) for r in fan_out(o, "o_orderkey").collect()}
    assert base == spread and len(base) == o.count()


def test_fan_in_coalesces_small_artifact_to_one_partition(spark, sf_dir):
    from biggie_spark.io import load_table

    d = fan_out(load_table(spark, sf_dir, "documents"))  # multi-partition
    assert fan_in(d).rdd.getNumPartitions() == 1


def test_topk_prenorm_matches_cosine_path(spark, sf_dir):
    """The pn/nn prenorm fast path in topk_by_cosine must score
    bit-identically to the plain cosine() fold (same double arithmetic,
    evaluated earlier in the plan)."""
    from biggie_spark.io import load_table

    e = load_table(spark, sf_dir, "embeddings").limit(40)
    probes = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("pa")
    )
    cands = e.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("na")
    )
    pairs = cands.crossJoin(F.broadcast(probes)).filter(
        F.col("neighbor_id") != F.col("probe_id")
    )
    plain = topk_by_cosine(pairs, 5)  # no pn/nn -> cosine() fold per pair
    pre = topk_by_cosine(
        pairs.withColumn("pn", l2_norm_sq(F.col("pa"))).withColumn(
            "nn", l2_norm_sq(F.col("na"))
        ),
        5,
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, pre.collect()))
    # and the fast path really was taken: scored expression uses the
    # precomputed columns, not a fresh fold of pa/na inside the kernel
    assert "SQRT" in _plan(pre).upper()


def test_topk_prenorm_scores_match_cosine_expression(spark, sf_dir):
    """Direct expression-level check: dot/(sqrt(pn)*sqrt(nn)) == cosine()
    on every corpus pair sampled."""
    from biggie_spark.io import load_table

    e = load_table(spark, sf_dir, "embeddings").limit(10)
    a = e.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("va"))
    b = e.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("vb"))
    pairs = a.crossJoin(F.broadcast(b)).filter(F.col("ia") < F.col("ib"))
    from biggie_spark.util import dot

    chk = pairs.select(
        (
            dot(F.col("va"), F.col("vb"))
            / (F.sqrt(l2_norm_sq(F.col("va"))) * F.sqrt(l2_norm_sq(F.col("vb"))))
        ).alias("pre"),
        cosine(F.col("va"), F.col("vb")).alias("plain"),
    )
    bad = chk.filter(F.col("pre") != F.col("plain")).count()
    assert bad == 0


class _BrokenSizeProbe:
    """DataFrame stand-in whose internal size probe (`_jdf`) raises —
    simulates a Spark build/env where the py4j stats API breaks."""

    def __init__(self, df):
        self._df = df

    @property
    def sparkSession(self):
        return self._df.sparkSession

    @property
    def _jdf(self):
        raise RuntimeError("internal stats API unavailable")

    def repartition(self, *a, **k):
        raise AssertionError("fan_out repartitioned despite a broken size probe")

    def coalesce(self, *a, **k):
        raise AssertionError("fan_in coalesced despite a broken size probe")


def test_fan_out_fails_closed_when_size_probe_breaks(spark, sf_dir):
    """VERDICT r14 #5: if the sizeInBytes probe raises, fan_out/fan_in must
    return the frame UNCHANGED (identity).  The old fail-open path would
    repartition an input of unknown size — a full-table shuffle (or a
    coalesce(1) write) on a 100 TB input."""
    from biggie_spark.io import load_table

    d = load_table(spark, sf_dir, "documents")
    broken = _BrokenSizeProbe(d)
    assert fan_out(broken) is broken
    assert fan_out(broken, "doc_id") is broken
    assert fan_in(broken) is broken
