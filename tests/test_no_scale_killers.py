"""Registry-wide scale-killer guard: build (don't run) the physical plan of
every registered operator and reject CartesianProduct / BroadcastNestedLoop
joins except where they are the op's documented point (join_cross) or a
broadcast-bounded probe pattern (small literal probe set × corpus, ≤ a few
hundred rows on the replicated side).

This is plan analysis only — no job executes — so the whole 190+-op sweep
is cheap enough for every CI run.  A new operator that accidentally
introduces an unbounded cross product fails here the day it is written,
not in a driver round.
"""

from __future__ import annotations

import pytest

from biggie_spark.registry import QUERIES, load_all_ops

load_all_ops()

# Ops whose plan legitimately contains a cartesian/nested-loop join:
#   join_cross          — the §2.D cross-join contract op itself (25×5 dims)
#   *_neardup_ngram     — exact all-pairs probe, explicitly bounded doc_id<60
#   llm_cross_dup_matrix— source×source matrix over probe subset (≤60 docs)
#   diag_*/mm ops       — single-row stats frame × table (scalar broadcast)
# Everything else must get there via equi-join keys.
ALLOWED_NESTED = {
    "join_cross",
    "llm_neardup_ngram",
    "llm_cross_dup_matrix",
}

# Single-row/scalar broadcast frames appear as BroadcastNestedLoopJoin; they
# replicate ONE row and are scale-safe.  CartesianProduct (both sides
# unbounded, no broadcast) is never acceptable outside ALLOWED_NESTED.
CARTESIAN = "CartesianProduct"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_unbounded_cartesian(spark, sf_dir, name):
    if name in ALLOWED_NESTED:
        pytest.skip("documented bounded cross-product op")
    df = QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert CARTESIAN not in plan, f"{name} plan contains CartesianProduct"
