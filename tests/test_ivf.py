"""IVF quality gates: k-means converges to a usable partition (no empty
index, bounded list sizes), search prunes the scan, and recall@5 vs the
exact baseline stays above a floor."""

from __future__ import annotations

from pyspark.sql import functions as F

from biggie_spark.ops.ivf import K, NPROBE, llm_knn_ivf, train_ivf
from biggie_spark.registry import QUERIES


def test_ivf_index_shape(spark, sf_dir):
    assigned, centroids = train_ivf(spark, sf_dir)
    n = assigned.count()
    sizes = assigned.groupBy("cid").count()
    assert centroids.count() == K
    assert sizes.agg(F.sum("count")).collect()[0][0] == n  # every vector indexed
    assert sizes.count() > K // 2, "k-means collapsed most clusters"


def test_ivf_recall_and_pruning(spark, sf_dir):
    exact = {
        (r.probe_id, r.neighbor_id)
        for r in QUERIES["llm_knn_cosine"](spark, sf_dir).collect()
    }
    approx = {(r.probe_id, r.neighbor_id) for r in llm_knn_ivf(spark, sf_dir).collect()}
    recall = len(exact & approx) / len(exact)
    # nprobe/K = 1/4 of the lists scanned; random-vector corpus gives
    # recall well above that floor because near vectors co-cluster
    assert recall >= 0.35, f"recall@5 collapsed: {recall:.2f}"

    assigned, _ = train_ivf(spark, sf_dir)
    biggest = assigned.groupBy("cid").count().agg(F.max("count")).collect()[0][0]
    n = assigned.count()
    assert biggest * NPROBE < n, "IVF scans nearly the whole corpus"
