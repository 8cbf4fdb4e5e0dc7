"""Tests for bench.py's stall-aware measurement (the round-7 fix for
the BENCH_r04 headline regression: a single 200-500s server-side
tunnel pause inside a one-shot timed window silently corrupted the
official artifact).  The detector logic is pure host code — pinned
here with a stubbed single-trial measurement."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402

pytestmark = pytest.mark.quick


class _Seq:
    """Deterministic stand-in for one chained measurement."""

    def __init__(self, times):
        self.times = list(times)
        self.calls = 0

    def __call__(self, res, queries, iters, search_fn=None):
        self.calls += 1
        return self.times.pop(0)


def _run(monkeypatch, times, **kw):
    seq = _Seq(times)
    monkeypatch.setattr(bench, "_measure_search_once", seq)
    q = np.zeros((1000,), dtype=np.uint64)
    out = bench.measure_search_robust(None, q, iters=1, **kw)
    return out, seq


def test_no_stall_three_clean_trials(monkeypatch):
    out, seq = _run(monkeypatch, [0.010, 0.011, 0.012])
    assert seq.calls == 3
    assert not out["stall_detected"]
    assert out["stalled_trials"] == 0
    assert out["best"] == pytest.approx(1000 / 0.010)
    assert out["median"] == pytest.approx(1000 / 0.011)
    assert out["trial_iter_ms"] == [10.0, 11.0, 12.0]


def test_single_stall_is_dropped_and_rerun(monkeypatch):
    # trial 2 is a 30x tunnel pause; it must be flagged, dropped, and
    # replaced by a fresh trial, and the headline must not absorb it
    out, seq = _run(monkeypatch, [0.010, 0.300, 0.011, 0.012])
    assert seq.calls == 4
    assert out["stall_detected"]
    assert out["stalled_trials"] == 1
    assert out["best"] == pytest.approx(1000 / 0.010)
    assert 0.300 * 1e3 not in out["trial_iter_ms"]


def test_persistent_stalls_bounded_by_max_extra(monkeypatch):
    # every re-run stalls too: the loop must stop after max_extra
    # extra trials and still report the stalls honestly
    out, seq = _run(monkeypatch,
                    [0.010, 0.300, 0.400, 0.500, 0.600],
                    trials=3, max_extra=2)
    assert seq.calls == 5
    assert out["stall_detected"]
    assert out["stalled_trials"] >= 2
    assert out["best"] == pytest.approx(1000 / 0.010)


def test_stall_factor_boundary(monkeypatch):
    # exactly at the factor is NOT a stall (strict >)
    t = 0.010
    out, seq = _run(monkeypatch, [t, bench._STALL_FACTOR * t, t])
    assert seq.calls == 3
    assert not out["stall_detected"]
