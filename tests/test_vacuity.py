"""Vacuity CI (VERDICT r9 item 4): promote the per-round manual vacuity
audit into a registry-level assertion.  A hash-green driver row proves the
engines AGREE; this gate proves the agreement is about something — every
oracle at the scoring SF must return rows, non-constant label columns, and
at least one column of intermediate cardinality (the graph_hits_iter /
graph_pagerank failure shape: keys vary, every computed value one constant).

The audit body lives in tools/vacuity_audit.py (runnable standalone, with
the adjudicated allowlist and its reasons); this test just binds it to CI
so a vacuous op fails the suite instead of waiting for a round-close manual
sweep.  Pure DuckDB — no SparkSession, so it is cheap enough to run in the
default pytest selection.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))


def test_no_unadjudicated_vacuity_at_scoring_sf():
    from vacuity_audit import audit

    findings = audit("/root/testdata/sf0.01")
    msg = "\n".join(f"{n}{'.' + c if c else ''}: {why}" for n, c, why in findings)
    assert not findings, (
        f"unadjudicated vacuity findings at sf0.01 — fix the op or "
        f"allowlist in tools/vacuity_audit.py with a reason:\n{msg}"
    )
