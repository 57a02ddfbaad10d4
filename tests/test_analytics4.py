"""Round-4 batch: pinned accuracy for the HLL sketch surface and physical-
plan shape checks for the new analytic operators (the 100 TB posture is
asserted, not narrated — same rule as tests/test_plans.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from biggie_spark.io import load_table
from biggie_spark.registry import QUERIES


def _plan(spark, sf_dir, name: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_hll_union_estimates_within_5pct(spark, sf_dir):
    """Sketch estimates are approximate by contract (rows-only driver row),
    so the accuracy claim is pinned here: every per-source estimate and the
    merged ALL row land within 5% of the exact distinct count."""
    got = {
        r["source"]: r["nd_docs"]
        for r in QUERIES["agg_hll_sketch_union"](spark, sf_dir).collect()
    }
    d = load_table(spark, sf_dir, "documents")
    exact = {
        r["source"]: r["nd"]
        for r in d.groupBy("source")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .collect()
    }
    exact["ALL"] = d.select("doc_id").distinct().count()
    assert set(got) == set(exact)
    for src, est in got.items():
        assert abs(est - exact[src]) <= 0.05 * exact[src], (
            src,
            est,
            exact[src],
        )


def test_interval_overlap_is_equi_join(spark, sf_dir):
    """The binned rewrite must reach the engine as a HASH/SMJ equi-join on
    the grid cell — never a nested loop over raw intervals."""
    plan = _plan(spark, sf_dir, "join_interval_overlap")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_moments_single_pass_partial_agg(spark, sf_dir):
    """All four power sums fold in ONE aggregate pass with map-side
    partials; the input scan happens exactly once."""
    plan = _plan(spark, sf_dir, "agg_moments")
    assert "partial_" in plan  # map-side combine before the shuffle
    assert plan.count("Scan parquet") == 1


def test_merge_full_single_join(spark, sf_dir):
    """MERGE compiles to one outer join on the key — no per-branch rescans
    of the target (the naive 3-branch union would scan it three times)."""
    plan = _plan(spark, sf_dir, "sql_merge_full")
    assert plan.count("FullOuter") == 1
    assert "CartesianProduct" not in plan


def test_bitmap_distinct_two_level_agg(spark, sf_dir):
    """Bitmap distinct = (group, bucket) bitmap fold, then popcount sum:
    two hash aggregates, partial-combined, no raw-value expand/distinct."""
    plan = _plan(spark, sf_dir, "agg_bitmap_distinct")
    assert "bitmap_construct_agg" in plan
    assert "Expand" not in plan  # count(distinct) rewrite would add one
    assert "partial_" in plan


def test_outer_join_keeps_unmatched_views(spark, sf_dir):
    """The left-outer twin must emit clickless views with n_clicks = 0 and
    NULL gap — the rows an inner join drops (and the rows a streaming
    watermark emission exists for)."""
    out = QUERIES["stream_stream_outer_join"](spark, sf_dir)
    unmatched = out.filter(F.col("n_clicks") == 0)
    n_un = unmatched.count()
    assert n_un > 0
    assert unmatched.filter(F.col("first_gap_s").isNotNull()).count() == 0
    # and every view appears exactly once
    ev = load_table(spark, sf_dir, "events")
    n_views = ev.filter(F.col("event_type") == "view").count()
    assert out.count() == n_views


def test_bfs_distances_monotone_frontier(spark, sf_dir):
    """BFS sanity independent of the oracle: node 0 at distance 0, every
    edge relaxes to at most +1, and no distance exceeds the hop budget."""
    dist = {
        r["node"]: r["dist"]
        for r in QUERIES["graph_bfs_distance"](spark, sf_dir).collect()
    }
    assert dist[0] == 0
    assert max(dist.values()) <= 6
    n = 500
    for u, d in dist.items():
        for v in ((u * 2 + 1) % n, (u * 3 + 7) % n):
            if v in dist:
                assert dist[v] <= d + 1


def test_containment_candidates_equi_join(spark, sf_dir):
    """Containment candidates must come from the min-shingle block
    equi-join; no all-pairs comparison anywhere in the plan."""
    plan = _plan(spark, sf_dir, "llm_containment_dup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "TakeOrderedAndProject" in plan  # top-50 without a global sort


def test_embedding_pipeline_broadcast_calibration(spark, sf_dir):
    """The 64-row per-dimension calibration frame must broadcast back onto
    the exploded corpus — a shuffle join there would move the whole corpus
    for a constant-size dimension table."""
    plan = _plan(spark, sf_dir, "llm_embedding_pipeline")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_quantize_codes_in_range(spark, sf_dir):
    """Every emitted code sum is consistent with codes in [0, 255] and the
    per-dim calibration covering the data (defense beyond the oracle)."""
    from pyspark.sql import functions as F2

    out = QUERIES["llm_embed_quantize"](spark, sf_dir)
    row = out.agg(
        F2.min("sum_code").alias("lo"), F2.max("sum_code").alias("hi"),
        F2.min("n_dims").alias("nd")
    ).collect()[0]
    assert row["nd"] == 64
    assert 0 <= row["lo"] and row["hi"] <= 255 * 64


def test_join_hint_pins_broadcast(spark, sf_dir):
    """The /*+ BROADCAST */ hint must reach the physical plan as a
    BroadcastHashJoin regardless of size estimates."""
    plan = _plan(spark, sf_dir, "sql_join_hints")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
