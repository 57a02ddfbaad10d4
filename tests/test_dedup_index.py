"""Round-6 dedup additions: dispatcher routing + persisted-index artifact.

The partition-pruning claim itself is asserted INSIDE
llm_neardup_index_persisted (PartitionFilters from the executed plan, plus
touched-directories < total-directories when the fanout is non-trivial), so
every correctness sweep re-checks it; these tests pin the routing contract.
"""

from __future__ import annotations

import pytest

from biggie_spark.ops.dedup_index import llm_neardup
from biggie_spark.ops.llm import llm_neardup_pairs, llm_neardup_shingle


def test_auto_routes_to_shingle(spark, sf_dir):
    auto = llm_neardup(spark, sf_dir)
    shingle = llm_neardup_shingle(spark, sf_dir)
    assert sorted(map(tuple, auto.collect())) == sorted(
        map(tuple, shingle.collect())
    )


def test_token_opt_in_routes_to_pairs(spark, sf_dir):
    tok = llm_neardup(spark, sf_dir, strategy="token")
    pairs = llm_neardup_pairs(spark, sf_dir)
    assert sorted(map(tuple, tok.collect())) == sorted(map(tuple, pairs.collect()))


def test_unknown_strategy_rejected(spark, sf_dir):
    with pytest.raises(ValueError, match="auto|shingle|token"):
        llm_neardup(spark, sf_dir, strategy="minhash9000")


def test_quantized_rerank_recall_floor(spark, sf_dir):
    """The SQ8 coarse stage must actually FIND the true neighbors: recall@5
    of the two-stage search vs the exact cosine path, floor 0.9.  The
    per-dim affine quantizer this op originally shipped with measured 0.16
    here — the symmetric global-scale scheme measures 1.00 (round 6); this
    floor keeps anyone from quietly reintroducing a non-monotone coarse
    ranking."""
    from biggie_spark.registry import QUERIES

    q = QUERIES["llm_knn_quantized_rerank"](spark, sf_dir).collect()
    x = QUERIES["llm_knn_cosine"](spark, sf_dir).collect()
    qs = {(r["probe_id"], r["neighbor_id"]) for r in q}
    xs = {(r["probe_id"], r["neighbor_id"]) for r in x}
    assert len(xs) > 0
    assert len(qs & xs) / len(xs) >= 0.9
