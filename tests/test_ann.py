"""ANN quality gates: the bucketed paths must (a) prune the candidate space
vs brute force and (b) keep recall@5 against the exact baseline above a
floor.  Approximate ops get engineering tests, not value oracles.

``llm_knn_ann`` (the user-facing default) routes through the IVF index and
is held to the accuracy bar a default deserves: recall@5 >= 0.9, pinned at
BOTH the fixture SF and sf0.01.  ``llm_knn_lsh`` (the SimHash tables with
Hamming<=2 multi-probe) measures 0.82 at the fixture SF / 0.88 at sf0.01;
its floor is pinned just under the measured value at 0.75 at both SFs
(VERDICT r6 item 5 — the single-bucket variant's 0.34-0.38 is history,
see ops/ann.py).
"""

from __future__ import annotations

import os

import pandas as pd  # module-level: pandas_udf type hints resolve via
# func.__globals__ under `from __future__ import annotations`
import pytest

from pyspark.sql import functions as F

from biggie_spark.io import load_table
from biggie_spark.ops.ann import llm_knn_ann, llm_knn_lsh, table_code
from biggie_spark.registry import QUERIES


def _recall_at_5(spark, sf, approx_fn) -> float:
    exact = {
        (r.probe_id, r.neighbor_id)
        for r in QUERIES["llm_knn_cosine"](spark, sf).collect()
    }
    approx = {(r.probe_id, r.neighbor_id) for r in approx_fn(spark, sf).collect()}
    return len(exact & approx) / len(exact)


def test_ann_default_recall(spark, sf_dir):
    """The default ANN path must be accurate, not just bucketed."""
    recall = _recall_at_5(spark, sf_dir, llm_knn_ann)
    assert recall >= 0.9, f"default ANN recall@5 below bar: {recall:.2f}"


@pytest.mark.slow
def test_ann_default_recall_sf001(spark):
    """Same bar at sf0.01 — the driver's correctness scale (VERDICT r3 #3)."""
    sf = "/root/testdata/sf0.01"
    if not os.path.isdir(sf):
        pytest.skip("sf0.01 corpus not present")
    recall = _recall_at_5(spark, sf, llm_knn_ann)
    assert recall >= 0.9, f"default ANN recall@5 below bar at sf0.01: {recall:.2f}"


@pytest.mark.slow
def test_lsh_recall_sf001(spark):
    """LSH floor at the driver's correctness scale too — measured 0.88 at
    sf0.01 (VERDICT r6 item 5)."""
    sf = "/root/testdata/sf0.01"
    if not os.path.isdir(sf):
        pytest.skip("sf0.01 corpus not present")
    recall = _recall_at_5(spark, sf, llm_knn_lsh)
    assert recall >= 0.75, f"LSH recall@5 below bar at sf0.01: {recall:.2f}"


def test_lsh_recall_and_pruning(spark, sf_dir):
    recall = _recall_at_5(spark, sf_dir, llm_knn_lsh)
    # Hamming<=2 multi-probe measures 0.82 on this corpus at the fixture SF
    # and 0.88 at sf0.01 (vs 0.34-0.38 single-bucket — see ops/ann.py
    # docstring); floor pinned just under the measured value so silent
    # quality rot in this rows-only op can't hide behind a loose bar
    # (VERDICT r6 item 5 — same idiom as the 0.9 quantized-rerank floor).
    assert recall >= 0.75, f"LSH recall@5 collapsed: {recall:.2f}"

    # pruning: candidate pairs considered << full cross product
    e = load_table(spark, sf_dir, "embeddings")
    n = e.count()
    bucket_sizes = (
        e.select(table_code(F.col("embedding"), 0).alias("c")).groupBy("c").count()
    )
    max_bucket = bucket_sizes.agg(F.max("count")).collect()[0][0]
    assert max_bucket < n, "bucketing degenerated to a single bucket"


def test_lsh_exact_on_duplicate_vector(spark, sf_dir):
    """A vector is always in the same bucket as itself — identical vectors
    must be retrieved (sanity floor for the bucket join)."""
    approx = llm_knn_lsh(spark, sf_dir).collect()
    assert len(approx) > 0
    by_probe = {}
    for r in approx:
        by_probe.setdefault(r.probe_id, []).append(r.sim)
    for sims in by_probe.values():
        assert sims == sorted(sims, reverse=True)


@pytest.mark.slow
def test_ann_recall_sf01(spark):
    """VERDICT r7 item 5: recall floors existed only at fixture/sf0.01 while
    wall-clock was probed at sf0.1 — "recall at my scale" is the first
    question a cluster user asks.  Measured 2026-08-14 at sf0.1 (10k
    embeddings): llm_knn_ann 0.96, llm_knn_lsh 0.78; floors pinned just
    under, same policy as the smaller SFs."""
    sf = "/root/testdata/sf0.1"
    if not os.path.isdir(sf):
        pytest.skip("sf0.1 corpus not present")
    recall = _recall_at_5(spark, sf, llm_knn_ann)
    assert recall >= 0.9, f"default ANN recall@5 below bar at sf0.1: {recall:.2f}"
    recall = _recall_at_5(spark, sf, llm_knn_lsh)
    assert recall >= 0.75, f"LSH recall@5 below bar at sf0.1: {recall:.2f}"


@pytest.mark.slow
def test_ann_recall_hard_corpus(spark, tmp_path):
    """VERDICT r9 item 3: the r8 isometry corpus clusters trivially (IVF
    recall 1.00 with the write-up flagging it easy), so pin recall on a
    HARD corpus — per-copy seeded random ROTATIONS (QR of standard
    normals) plus additive Gaussian noise at 10 dB SNR: a noisy 10-mode
    Gaussian mixture over the unit sphere, the natural-statistics shape
    of real embedding spaces.  Measured 2026-08-15 at 20k vectors
    (mean ||x||^2 = 1.0997 — the designed 1.0 signal + 0.1 noise):
    llm_knn_ann (IVF) 1.00, llm_knn_lsh 0.78, llm_knn_quantized_rerank
    1.00; the 200k run (tools/scale_probe.py --ann-hard, SCALE.md) reads
    the same IVF/rerank 1.00 with LSH 0.82.  Floors pinned just under:
    IVF >= 0.9 (the default path's bar), LSH >= 0.7, rerank >= 0.9.
    Seeded numpy lives in the TEST (probe-side), never in an op."""
    import numpy as np

    from biggie_spark.ops.dedup_index import llm_knn_quantized_rerank
    from biggie_spark.util import knn_exact

    dims, n_copies, off = 64, 10, 1 << 33
    rng = np.random.default_rng(20260815)
    qs = []
    for _ in range(n_copies):
        a = rng.standard_normal((dims, dims))
        q, r = np.linalg.qr(a)
        qs.append((q * np.sign(np.diag(r))).astype(np.float64))
    qs = np.stack(qs)
    sigma = float(np.sqrt(0.1 / dims))

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<float>")
    def transform_udf(
        vec_id: pd.Series, copy: pd.Series, emb: pd.Series
    ) -> pd.Series:
        out = []
        for vid, cp, v in zip(vec_id, copy, emb):
            x = qs[int(cp)] @ np.asarray(v, dtype=np.float64)
            nz = np.random.default_rng(
                int(vid) & 0x7FFFFFFF
            ).standard_normal(dims)
            out.append((x + sigma * nz).astype(np.float32))
        return pd.Series(out)

    src = "/root/testdata/sf0.1"
    if not os.path.isdir(src):
        pytest.skip("sf0.1 corpus not present")
    e = load_table(spark, src, "embeddings").select("vec_id", "embedding")
    grid = spark.range(n_copies).select(F.col("id").alias("copy"))
    hard = (
        e.crossJoin(F.broadcast(grid))
        .select(
            (F.col("vec_id") + F.col("copy") * off).alias("vec_id"),
            "copy",
            "embedding",
        )
        .select(
            "vec_id",
            transform_udf("vec_id", "copy", "embedding").alias("embedding"),
            F.lit(0).alias("label"),
        )
    )
    root = str(tmp_path / "annhard")
    hard.write.mode("overwrite").parquet(f"{root}/embeddings.parquet")
    emb = load_table(spark, root, "embeddings")
    exact = {
        (r.probe_id, r.neighbor_id)
        for r in knn_exact(emb, range(10), 5).collect()
    }
    ivf = {
        (r.probe_id, r.neighbor_id)
        for r in llm_knn_ann(spark, root).collect()
    }
    assert len(exact & ivf) / len(exact) >= 0.9
    lsh = {
        (r.probe_id, r.neighbor_id)
        for r in llm_knn_lsh(spark, root).collect()
    }
    assert len(exact & lsh) / len(exact) >= 0.7
    rr = {
        (r.probe_id, r.neighbor_id)
        for r in llm_knn_quantized_rerank(spark, root).collect()
    }
    assert len(exact & rr) / len(exact) >= 0.9
