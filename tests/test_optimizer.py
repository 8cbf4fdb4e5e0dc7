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


def test_bucket_for_disk_tier(monkeypatch):
    """The disk profile's branching range reaches 2^27
    (optimizer.rs:44-57); every disk-profile factor must land in a
    bucket >= itself, with the 2^25..2^27 points each getting their own
    next-pow2 bucket above the last shared tier."""
    from rmi_tpu.optimizer import bucket_for, _GRID_BUCKET_TIERS

    monkeypatch.setenv("RMI_OPTIMIZER_PROFILE", "disk")
    bfs = branching_factors()
    assert bfs[-1] == 1 << 27
    for b in bfs:
        bucket = bucket_for([b])
        assert bucket >= b
        if b <= _GRID_BUCKET_TIERS[-1]:
            assert bucket in _GRID_BUCKET_TIERS
        else:
            assert bucket == b          # pow2 factors: own bucket
    assert bucket_for([1 << 27]) == 1 << 27
    assert bucket_for([(1 << 26) + 1]) == 1 << 27
    assert bucket_for([1 << 21, 1 << 27]) == 1 << 27


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


# ---------------------------------------------------------------------------
# B-bucketed (compile-once) grid sweep
# ---------------------------------------------------------------------------

def test_predicted_rmi_size_matches_trained(rng):
    from rmi_tpu.data import RMIDataset
    from rmi_tpu.serialize import predicted_rmi_size, rmi_size
    from rmi_tpu.train.api import train
    keys = np.sort(rng.integers(0, 2**40, size=3000, dtype=np.uint64))
    ds = RMIDataset.from_numpy(keys)
    for models, bf in [("cubic,linear", 64), ("radix,linear", 128),
                       ("radix18,cubic", 32), ("linear_spline,linear", 256),
                       ("robust_linear,cubic", 64)]:
        assert predicted_rmi_size(models, bf) == rmi_size(train(ds, models, bf))


def test_grid_metrics_parity(rng):
    """One B-generic program per pair must reproduce the per-build
    measurements: max errors exactly; avg log2 to within decision
    noise.  (The b-generic arithmetic itself is EXACT — calling
    _train_core_mono with a traced b reproduces the static build
    bit-for-bit — but lax.map compiles the body with different fusion,
    which at b > n can flip cubic's knife-edge l_err < c_err fallback
    on a handful of 1-2 key leaves; same class as the documented
    floor-boundary divergence, two_layer.py module docstring.)"""
    import jax
    from rmi_tpu.data import RMIDataset
    from rmi_tpu.train import two_layer
    from rmi_tpu.train.api import train
    keys = np.sort(np.concatenate([
        rng.integers(0, 2**50, 3800, dtype=np.uint64),
        np.repeat(rng.integers(0, 2**50, 20, dtype=np.uint64), 10)]))
    ds = RMIDataset.from_numpy(keys)
    bs = [8, 32, 128, 8192]          # includes b > n
    for models in ["cubic,linear", "radix,linear", "radix18,cubic",
                   "linear_spline,linear", "normal,linear",
                   "loglinear,linear_spline"]:
        top, leaf = models.split(",")
        md = jax.device_get(two_layer.metrics_grid_async(
            ds.keys, ds.key_type, top, leaf, bs, bucket=8192))
        for i, b in enumerate(bs):
            r = train(ds, models, b)
            assert int(md["model_max_error"][i]) == int(r.model_max_error), \
                (models, b)
            np.testing.assert_allclose(
                float(md["model_avg_log2_error"][i]),
                r.model_avg_log2_error, rtol=0, atol=0.02,
                err_msg=f"{models} {b}")


def test_bucketed_front_matches_legacy(monkeypatch, rng):
    """The compile-once sweep must select the same Pareto front as the
    per-build sweep (one grid program per pair vs one program per
    (pair, B))."""
    from rmi_tpu import optimizer
    from rmi_tpu.data import RMIDataset
    monkeypatch.setenv("RMI_OPTIMIZER_PROFILE", "fast")
    monkeypatch.setattr(optimizer, "branching_factors",
                        lambda: [2**i for i in range(4, 12, 2)])
    keys = np.sort(rng.integers(0, 2**40, size=5000, dtype=np.uint64))
    ds = RMIDataset.from_numpy(keys)

    monkeypatch.setenv("RMI_OPT_BUCKETED", "0")
    legacy = find_pareto_efficient_configs(ds, restrict=6)
    monkeypatch.setenv("RMI_OPT_BUCKETED", "1")
    bucketed = find_pareto_efficient_configs(ds, restrict=6)

    assert ([(r.models, r.branching_factor, r.size) for r in legacy]
            == [(r.models, r.branching_factor, r.size) for r in bucketed])
    for a, b in zip(legacy, bucketed):
        np.testing.assert_allclose(a.average_log2_error,
                                   b.average_log2_error, rtol=2e-3)


def test_mixed_grid_perbuild_front_matches(monkeypatch, rng):
    """When some pairs are not grid-safe (the 200M cubic-leaf worker
    fault, optimizer.grid_safe), the bucketed sweep measures them
    per-build and must select the same front as the all-grid sweep."""
    from rmi_tpu import optimizer
    from rmi_tpu.data import RMIDataset
    monkeypatch.setenv("RMI_OPTIMIZER_PROFILE", "fast")
    monkeypatch.setenv("RMI_OPT_BUCKETED", "1")
    monkeypatch.setattr(optimizer, "branching_factors",
                        lambda: [2**i for i in range(4, 12, 2)])
    keys = np.sort(rng.integers(0, 2**40, size=5000, dtype=np.uint64))
    ds = RMIDataset.from_numpy(keys)

    all_grid = find_pareto_efficient_configs(ds, restrict=6)
    monkeypatch.setattr(
        optimizer, "grid_safe",
        lambda m, n: optimizer.grid_measurable(m)
        and m.split(",")[1] != "cubic")
    mixed = find_pareto_efficient_configs(ds, restrict=6)

    assert ([(r.models, r.branching_factor, r.size) for r in all_grid]
            == [(r.models, r.branching_factor, r.size) for r in mixed])
    for a, b in zip(all_grid, mixed):
        np.testing.assert_allclose(a.average_log2_error,
                                   b.average_log2_error, rtol=2e-3)


def test_grid_measure_threaded_compile(monkeypatch, rng):
    """The AOT concurrent-compile path (RMI_OPT_COMPILE_THREADS > 1)
    must produce the same grid measurements as the inline-dispatch
    path."""
    from rmi_tpu import optimizer
    from rmi_tpu.data import RMIDataset
    keys = np.sort(rng.integers(0, 2**40, size=3000, dtype=np.uint64))
    ds = RMIDataset.from_numpy(keys)
    pairs = ["cubic,linear", "linear,linear_spline"]
    bfs = [16, 128]

    monkeypatch.setenv("RMI_OPT_COMPILE_THREADS", "1")
    inline = optimizer.grid_measure_rmis(ds, pairs, bfs)
    monkeypatch.setenv("RMI_OPT_COMPILE_THREADS", "2")
    threaded = optimizer.grid_measure_rmis(ds, pairs, bfs)

    assert set(inline) == set(threaded)
    for k in inline:
        assert inline[k].size == threaded[k].size
        np.testing.assert_allclose(inline[k].average_log2_error,
                                   threaded[k].average_log2_error,
                                   rtol=1e-12)


def test_grid_measure_single_fetch(monkeypatch, rng):
    """The whole grid (every pair x every branching factor) must reach
    the host in ONE batched transfer."""
    from rmi_tpu import optimizer
    from rmi_tpu.data import RMIDataset
    from rmi_tpu.train import api
    keys = np.sort(rng.integers(0, 2**40, size=2048, dtype=np.uint64))
    ds = RMIDataset.from_numpy(keys)

    fetches = []
    real_fetch = api._fetch_host
    monkeypatch.setattr(api, "_fetch_host",
                        lambda tree: (fetches.append(tree),
                                      real_fetch(tree))[1])
    pairs = ["cubic,linear", "linear,cubic"]
    bfs = [16, 64, 256]
    stats = optimizer.grid_measure_rmis(ds, pairs, bfs)
    assert len(fetches) == 1
    assert set(stats) == {(m, b) for m in pairs for b in bfs}


# ---------------------------------------------------------------------------
# HBM capacity guard (disk-profile giant branching factors)
# ---------------------------------------------------------------------------

@pytest.mark.quick
def test_grid_bucket_fits_200m_tiers(monkeypatch):
    """Pin the measured 200M capacity boundary
    (probes/probe_disk_capacity.py on the 16GB chip): the 2^24 bucket
    passes, 2^25 crashes the worker, 2^26/2^27 fail outright — the
    footprint model must classify all four tiers accordingly."""
    from rmi_tpu.optimizer import grid_bucket_fits
    monkeypatch.setenv("RMI_GRID_HBM_GB", "13")  # force model on CPU
    n = 200_000_000
    assert grid_bucket_fits(n, 1 << 24)
    assert not grid_bucket_fits(n, 1 << 25)
    assert not grid_bucket_fits(n, 1 << 26)
    assert not grid_bucket_fits(n, 1 << 27)
    # small n: even the largest disk tier fits on-chip
    assert grid_bucket_fits(25_000_000, 1 << 27)


def test_capacity_guard_host_front_matches(monkeypatch, rng):
    """Grid points over the HBM budget degrade to host-RAM CPU builds
    (rmi_tpu.host_measure); the selected Pareto front must be identical
    to the all-on-device sweep."""
    from rmi_tpu import optimizer
    from rmi_tpu.data import RMIDataset
    monkeypatch.setenv("RMI_OPTIMIZER_PROFILE", "fast")
    monkeypatch.setenv("RMI_OPT_BUCKETED", "1")
    monkeypatch.setattr(optimizer, "branching_factors",
                        lambda: [2**i for i in range(4, 12, 2)])
    keys = np.sort(rng.integers(0, 2**40, size=5000, dtype=np.uint64))
    ds = RMIDataset.from_numpy(keys)

    all_grid = find_pareto_efficient_configs(ds, restrict=6)
    # 50MB budget: every bucket (>= 2^21 tier ~ 168MB modeled) exceeds
    # it, so EVERY point must route through the host subprocess
    monkeypatch.setenv("RMI_GRID_HBM_GB", "0.05")
    hosted = find_pareto_efficient_configs(ds, restrict=6)

    assert ([(r.models, r.branching_factor, r.size) for r in all_grid]
            == [(r.models, r.branching_factor, r.size) for r in hosted])
    for a, b in zip(all_grid, hosted):
        np.testing.assert_allclose(a.average_log2_error,
                                   b.average_log2_error, rtol=2e-3)


def test_measure_host_rows(rng):
    """The host-measurement subprocess returns one metrics row per
    config, order preserved, with finite metrics."""
    from rmi_tpu.data import RMIDataset
    from rmi_tpu.host_measure import measure_host
    keys = np.sort(rng.integers(0, 2**40, size=3000, dtype=np.uint64))
    ds = RMIDataset.from_numpy(keys)
    cfgs = [("linear,linear", 64), ("cubic,linear", 128)]
    rows = measure_host(ds, cfgs)
    assert [(r["models"], r["branching_factor"]) for r in rows] == cfgs
    for r in rows:
        assert np.isfinite(r["avg_log2"])
        assert r["avg_log2"] >= 0.0


def test_measure_host_reuses_source_file(tmp_path, rng):
    """Datasets loaded from an SOSD file must be reopened from disk by
    the host subprocess (no device->host key fetch — a stall class at
    200M over the tunnel), and the source file must survive."""
    from rmi_tpu.data import load_data, write_sosd_file
    from rmi_tpu import host_measure
    keys = np.sort(rng.integers(0, 2**40, size=3000, dtype=np.uint64))
    p = str(tmp_path / "probe_uint64")
    write_sosd_file(p, keys)
    ds = load_data(p)
    assert ds.source_path == p
    hm = host_measure.launch_measure_host(ds, [("linear,linear", 64)])
    assert hm.path == p and not hm._owns_path
    rows = hm.wait()
    assert rows[0]["branching_factor"] == 64
    assert (tmp_path / "probe_uint64").exists()


def test_measure_host_parallel_procs(monkeypatch, rng):
    """RMI_HOST_MEASURE_PROCS=2 fans configs over two subprocesses
    (the host analogue of the reference's rayon pool over configs,
    optimizer.rs:224); rows must merge back in config order."""
    from rmi_tpu.data import RMIDataset
    from rmi_tpu import host_measure
    monkeypatch.setenv("RMI_HOST_MEASURE_PROCS", "2")
    keys = np.sort(rng.integers(0, 2**40, size=3000, dtype=np.uint64))
    ds = RMIDataset.from_numpy(keys)
    cfgs = [("linear,linear", 64), ("cubic,linear", 128),
            ("linear,linear", 256)]
    hm = host_measure.launch_measure_host(ds, cfgs)
    assert isinstance(hm, host_measure.MultiHostMeasurement)
    assert len(hm.handles) == 2
    rows = hm.wait()
    assert [(r["models"], r["branching_factor"]) for r in rows] == cfgs
    seq = host_measure.measure_host(ds, [cfgs[0]])  # procs clamps to 1
    np.testing.assert_allclose(rows[0]["avg_log2"], seq[0]["avg_log2"],
                               rtol=1e-12)


def test_measure_host_failure_raises(rng):
    """A config the subprocess cannot train must surface as a
    RuntimeError carrying the subprocess's log tail — not hang or
    return a short row list."""
    from rmi_tpu.data import RMIDataset
    from rmi_tpu.host_measure import measure_host
    keys = np.sort(rng.integers(0, 2**40, size=1000, dtype=np.uint64))
    ds = RMIDataset.from_numpy(keys)
    with pytest.raises(RuntimeError, match=r"returned 0/1 rows"):
        measure_host(ds, [("bogus_model,linear", 64)])
