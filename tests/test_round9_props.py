"""Property-based invariants for the round-9 integer-exact kernels.

The hash oracles prove Spark == DuckDB; these properties prove the shared
arithmetic is RIGHT — a change that kept both engines wrong-in-the-same-way
(the failure mode value-hash comparison cannot see) still fails here.
All three kernels are pure integer algebra, so the reference
implementations below are trivial Python and the tests need no Spark
session (they run in milliseconds).
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st


# ---------------------------------------------------------------------------
# pass@k: the CASE/factorial expression both engines evaluate must equal
# the textbook estimator floor(1e6 * (1 - C(n-c,k)/C(n,k)))


def _pass_e6_expr(n: int, c: int, k: int) -> int:
    """The llm_pass_at_k expression, transcribed operator-for-operator
    (floor division in the same order as the SQL/Spark form)."""
    if k > n - c:
        return 1_000_000
    num = math.factorial(n - c) // (
        math.factorial(k) * math.factorial(n - c - k)
    )
    den = math.factorial(n) // (math.factorial(k) * math.factorial(n - k))
    return 1_000_000 - num * 1_000_000 // den


def test_pass_at_k_matches_comb_everywhere():
    """Exhaustive over the full (n, c, k) grid the op can emit (n <= 4,
    filter k <= n): the expression equals the math.comb form, including
    the c=0 floor and the k > n-c certainty branch."""
    for n in range(1, 5):
        for c in range(0, n + 1):
            for k in range(1, n + 1):
                want = 1_000_000 - (
                    math.comb(n - c, k) * 1_000_000 // math.comb(n, k)
                )
                assert _pass_e6_expr(n, c, k) == want, (n, c, k)
                # estimator axioms
                assert 0 <= _pass_e6_expr(n, c, k) <= 1_000_000
                if c == 0:
                    assert _pass_e6_expr(n, c, k) == 0
                if c == n:
                    assert _pass_e6_expr(n, c, k) == 1_000_000


@given(
    st.integers(min_value=1, max_value=4),
    st.integers(min_value=0, max_value=4),
)
@settings(max_examples=100, deadline=None)
def test_pass_at_k_monotone_in_k_and_c(n, c):
    """pass@k rises with k (more draws can only help) and with c."""
    c = min(c, n)
    vals = [_pass_e6_expr(n, c, k) for k in range(1, n + 1)]
    assert vals == sorted(vals)
    if c < n:
        assert all(
            _pass_e6_expr(n, c, k) <= _pass_e6_expr(n, c + 1, k)
            for k in range(1, n + 1)
        )


# ---------------------------------------------------------------------------
# the BIGINT key encoding behind stream_preference_pairs_static: the
# argmax/argmin keys must decode to exactly the window formulation's
# (score DESC, doc ASC) / (score ASC, doc ASC) tie rule


_groups = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=100),  # score_e2
        st.integers(min_value=0, max_value=999_999),  # doc_id
    ),
    min_size=1,
    max_size=8,
    unique_by=lambda t: t[1],
)


@given(_groups)
@settings(max_examples=500, deadline=None)
def test_preference_key_encoding_decodes_to_tie_rule(group):
    ck = max(s * 1_000_000 + (999_999 - d) for s, d in group)
    rk = min(s * 1_000_000 + d for s, d in group)
    chosen = (ck // 1_000_000, 999_999 - ck % 1_000_000)
    rejected = (rk // 1_000_000, rk % 1_000_000)
    # reference: explicit sorts under the window formulation's tie rule
    want_chosen = sorted(group, key=lambda t: (-t[0], t[1]))[0]
    want_rejected = sorted(group, key=lambda t: (t[0], t[1]))[0]
    assert chosen == want_chosen
    assert rejected == want_rejected


# ---------------------------------------------------------------------------
# the 3x difference margin behind llm_bitext_mine


@given(
    st.lists(
        st.integers(min_value=-10_000, max_value=10_000),
        min_size=4,
        max_size=12,
    )
)
@settings(max_examples=300, deadline=None)
def test_bitext_margin_is_scaled_mean_difference(sims):
    top = sorted(sims, reverse=True)
    margin3 = 3 * top[0] - (top[1] + top[2] + top[3])
    # identical to 3 * (c1 - mean(c2..4)) without any division
    assert margin3 == round(3 * (top[0] - (top[1] + top[2] + top[3]) / 3))
    # c1 is the max of the ranked list, so the margin can never be negative
    assert margin3 >= 0


# ---------------------------------------------------------------------------
# round-9 runtime guards (VERDICT r8 item 1 + ADVICE r8): these need a
# SparkSession because the guards live IN the plan, not in Python


def test_grid_guard_raises_on_widened_frame(spark):
    """_kept_buckets' unpartitioned windows are bounded by the <=101-row
    score grid BY CONSTRUCTION; the in-plan assert_true turns a widened
    grid (here 2000 distinct buckets) into a loud failure instead of a
    silent corpus-sized single-partition window."""
    import pytest

    from biggie_spark.ops.round9 import _GRID_BOUND, _kept_buckets

    wide = spark.range(_GRID_BOUND + 976).selectExpr(
        "id AS score_e2", "10 AS n_tok"
    )
    with pytest.raises(Exception, match="grid window exceeds"):
        _kept_buckets(wide).collect()


def test_grid_guard_passes_and_degenerate_corpus_keeps_top_bucket(spark):
    """ADVICE r8: when the single best bucket alone exceeds the 2/5 token
    budget the old min-over-when threshold was NULL and `>= NULL` kept
    NOTHING; the coalesce now falls back to the top bucket (whole-bucket
    tie policy), and the guard stays silent within the bound."""
    from biggie_spark.ops.round9 import _kept_buckets

    degenerate = spark.createDataFrame(
        [(90, 100), (50, 10)], "score_e2 long, n_tok long"
    )
    kept = sorted(r.score_e2 for r in _kept_buckets(degenerate).collect())
    assert kept == [90], kept


def test_preference_stride_guard_raises_past_1e6_docs(spark):
    """ADVICE r8: the BIGINT argmax key in _preference_agg_plan encodes
    doc_id in a 1e6 stride; a doc_id past the stride must raise, never
    silently corrupt chosen/rejected extraction (the oracle mirrors the
    encoding, so the hash check alone cannot catch it)."""
    import pytest

    from biggie_spark.ops.round9 import _preference_agg_plan

    docs = spark.createDataFrame(
        [(2_000_000, "alpha beta gamma delta")], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="argmax stride"):
        _preference_agg_plan(docs).collect()


def test_preference_stride_guard_silent_in_bounds(spark):
    """The guard must be value-neutral when the bound holds: same pairs as
    the window formulation on an in-bounds frame."""
    from biggie_spark.ops.round9 import _preference_agg_plan

    docs = spark.createDataFrame(
        [
            (0, "a a a a"),
            (1, "a b c d"),
            (2, "a a b b"),
            (3, "a b c c"),
        ],
        "doc_id long, text string",
    )
    rows = _preference_agg_plan(docs).collect()
    assert len(rows) == 1
    r = rows[0]
    # scores e2: doc0 = 25, doc1 = 100, doc2 = 50, doc3 = 75
    assert (r.chosen_doc, r.rejected_doc) == (1, 0)
    assert (r.chosen_score_e2, r.rejected_score_e2) == (100, 25)
    assert r.margin_e2 == 75 and r.n_cands == 4
