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
