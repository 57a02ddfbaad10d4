"""bench.py quiet-box gate (VERDICT r11 "What's wrong" #1): the round
artifact must never be recorded on a loaded box.  These tests pin the
pre-flight wait logic without starting Spark."""

from __future__ import annotations

import importlib
import sys


def _bench():
    sys.path.insert(0, "/root/repo")
    return importlib.import_module("bench")


def test_wait_for_quiet_returns_immediately_on_quiet_box(monkeypatch):
    bench = _bench()
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (0.5, 0.5, 0.5))
    slept = []
    monkeypatch.setattr(bench.time, "sleep", slept.append)
    load = bench._wait_for_quiet(60)
    assert load == 0.5
    assert not slept, "waited despite a quiet box"


def test_wait_for_quiet_blocks_until_quiet(monkeypatch):
    bench = _bench()
    loads = iter([3.0, 2.5, 1.1])
    last = [3.0]

    def getload():
        return (last[0], 0, 0)

    def fake_sleep(_):
        last[0] = next(loads)

    monkeypatch.setattr(bench.os, "getloadavg", getload)
    monkeypatch.setattr(bench.time, "sleep", fake_sleep)
    clock = iter(range(100))
    monkeypatch.setattr(bench.time, "monotonic", lambda: next(clock))
    load = bench._wait_for_quiet(60)
    assert load == 1.1, "returned before the box quieted"


def test_wait_for_quiet_gives_up_at_deadline(monkeypatch):
    bench = _bench()
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (9.9, 0, 0))
    monkeypatch.setattr(bench.time, "sleep", lambda _: None)
    clock = iter(range(0, 1000, 10))
    monkeypatch.setattr(bench.time, "monotonic", lambda: next(clock))
    load = bench._wait_for_quiet(50)
    assert load == 9.9, "deadline exceeded but load misreported"


def test_median_is_true_median_for_even_repeat_counts():
    # ADVICE r13: warms[len//2] is the UPPER middle for even --repeat
    # values; the artifact field is documented as the per-query median.
    bench = _bench()
    assert bench._median([1.0, 2.0]) == 1.5
    assert bench._median([1.0, 2.0, 10.0, 11.0]) == 6.0
    # odd counts unchanged
    assert bench._median([1.0, 2.0, 10.0]) == 2.0
    # rounding matches the artifact's 3-decimal convention
    assert bench._median([0.1232, 0.1236]) == 0.123


def test_record_always_emits_and_flags_noisy_box():
    # VERDICT r14 #1: a box that never quiets down must still produce the
    # one-line JSON artifact, flagged "noisy": true — rc=3 with no JSON
    # left the driver blind at 32 cores in round 14.
    bench = _bench()
    timings = {"q_topk": 0.5}
    spread = {"q_topk": [0.4, 0.6]}
    rec = bench._build_record(timings, spread, 3, 0.1, loadavg=3.2, forced=False)
    assert rec["noisy"] is True
    assert rec["loadavg"] == 3.2
    assert rec["queries"] == timings
    assert rec["value"] == 0.5
    # quiet box: no flag at all (field absent, not false)
    rec_q = bench._build_record(timings, spread, 3, 0.1, loadavg=0.9, forced=False)
    assert "noisy" not in rec_q
    # forced runs are marked forced, never noisy (they skip the protocol)
    rec_f = bench._build_record(timings, spread, 3, 0.1, loadavg=3.2, forced=True)
    assert rec_f["forced"] is True and "noisy" not in rec_f
