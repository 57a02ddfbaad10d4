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
