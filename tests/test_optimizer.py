"""Optimizer tests: dominance/narrowing rules (optimizer.rs:59-108,
173-187), profile pools (optimizer.rs:15-57), phase construction, and a
small end-to-end train_for_size run."""

import numpy as np
import pytest

from rmi_tpu.optimizer import (RMIStatistics, pareto_front, narrow_front,
                               first_phase_configs, second_phase_configs,
                               top_only_layers, anywhere_layers,
                               branching_factors,
                               find_pareto_efficient_configs)


def S(models, bf, lg2, size):
    return RMIStatistics(models=models, branching_factor=bf,
                         average_log2_error=lg2, max_log2_error=lg2,
                         size=size)


def test_dominance_rules():
    a = S("linear,linear", 64, 5.0, 1000)
    b = S("cubic,linear", 64, 4.0, 500)     # dominates a
    c = S("cubic,linear", 128, 6.0, 400)    # smaller but worse
    assert a.dominated_by(b)
    assert not b.dominated_by(a)
    assert not c.dominated_by(b)
    # equal size, equal error: neither dominated (optimizer.rs:177-179)
    d1 = S("x,y", 1, 5.0, 100)
    d2 = S("z,w", 2, 5.0, 100)
    assert not d1.dominated_by(d2)
    assert not d2.dominated_by(d1)


def test_pareto_front():
    pts = [S("a,a", 1, 5.0, 1000), S("b,b", 2, 4.0, 500),
           S("c,c", 3, 3.0, 2000), S("d,d", 4, 6.0, 3000)]
    front = pareto_front(pts)
    names = {p.models for p in front}
    assert names == {"b,b", "c,c"}


def test_narrow_front_keeps_smallest():
    pts = [S(f"m{i},x", i, 10.0 - i, 100 * (i + 1)) for i in range(20)]
    out = narrow_front(pts, 5)
    assert len(out) == 5
    assert out[0].size == min(p.size for p in pts)


def test_profiles(monkeypatch):
    monkeypatch.delenv("RMI_OPTIMIZER_PROFILE", raising=False)
    assert top_only_layers() == ["radix", "radix18", "radix22",
                                 "robust_linear"]
    assert anywhere_layers() == ["linear", "cubic", "linear_spline"]
    assert branching_factors() == [2 ** i for i in range(6, 25)]
    monkeypatch.setenv("RMI_OPTIMIZER_PROFILE", "fast")
    assert top_only_layers() == ["robust_linear"]
    assert branching_factors() == [2 ** i for i in range(6, 25, 2)]
    monkeypatch.setenv("RMI_OPTIMIZER_PROFILE", "disk")
    assert "normal" in top_only_layers()
    monkeypatch.setenv("RMI_OPTIMIZER_PROFILE", "bogus")
    with pytest.raises(ValueError):
        top_only_layers()


def test_first_phase_every_5th(monkeypatch):
    monkeypatch.delenv("RMI_OPTIMIZER_PROFILE", raising=False)
    configs = first_phase_configs()
    tops = 4 + 3
    bfs = len(branching_factors()[::5])
    assert len(configs) == tops * 3 * bfs


def test_second_phase_skips_measured(monkeypatch):
    monkeypatch.delenv("RMI_OPTIMIZER_PROFILE", raising=False)
    phase1 = [S("linear,linear", 64, 3.0, 100),
              S("cubic,linear", 64, 5.0, 10000)]
    cfgs = second_phase_configs(phase1)
    assert ("linear,linear", 64) not in cfgs
    assert all(m == "linear,linear" for m, _ in cfgs)


def test_find_pareto_small(monkeypatch, rng):
    monkeypatch.setenv("RMI_OPTIMIZER_PROFILE", "fast")
    from rmi_tpu.data import RMIDataset
    keys = np.sort(rng.integers(0, 2**35, size=700, dtype=np.uint64))
    ds = RMIDataset.from_numpy(keys)
    front = find_pareto_efficient_configs(ds, restrict=4)
    assert 2 <= len(front) <= 4
    # sorted by average log2 error (optimizer.rs:244-246)
    errs = [f.average_log2_error for f in front]
    assert errs == sorted(errs)


def test_train_for_size(monkeypatch, rng):
    monkeypatch.setenv("RMI_OPTIMIZER_PROFILE", "fast")
    from rmi_tpu.data import RMIDataset
    from rmi_tpu.train.api import train_for_size
    from rmi_tpu.serialize import rmi_size
    keys = np.sort(rng.integers(0, 2**35, size=700, dtype=np.uint64))
    ds = RMIDataset.from_numpy(keys)
    # Note: like the reference, the final front is built from phase-2
    # measurements only (optimizer.rs:240-242), so phase-1-only
    # branching factors (here 2^6) can be absent; budget accordingly.
    res = train_for_size(ds, 10000)
    assert rmi_size(res) < 10000
