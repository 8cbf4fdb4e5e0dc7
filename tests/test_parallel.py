"""Multi-chip tests on the virtual 8-device CPU mesh: the data-parallel
trainer must reproduce the single-chip build, and sharded serving must
return identical lookups."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rmi_tpu.data import RMIDataset
from rmi_tpu.keys import KeyType
from rmi_tpu.train.api import train
from rmi_tpu.parallel.dp_trainer import dp_train_two_layer
from rmi_tpu.lookup import lookup


@pytest.fixture(scope="module")
def mesh():
    devs = np.array(jax.devices())
    assert devs.size >= 8, "conftest must provide 8 virtual devices"
    return Mesh(devs[:8], ("data",))


@pytest.mark.parametrize("top,leaf,B", [
    ("linear", "linear", 64),
    ("cubic", "linear", 64),
    ("linear_spline", "linear_spline", 32),
    ("robust_linear", "linear", 32),
    ("cubic", "cubic", 32),
])
@pytest.mark.parametrize("kind", ["uniform", "dups"])
def test_dp_matches_single_chip(mesh, rng, top, leaf, B, kind):
    n = 4096
    if kind == "uniform":
        keys = np.sort(rng.integers(0, 2**40, size=n, dtype=np.uint64))
    else:
        keys = np.sort(rng.integers(0, n // 3, size=n,
                                    dtype=np.uint64)) * 11 + 5
    ds = RMIDataset.from_numpy(keys)
    res = train(ds, f"{top},{leaf}", B)

    top_p, leaf_p, errs, metrics = dp_train_two_layer(
        ds.keys, ds.key_type, top, leaf, B, mesh)

    # psum order can differ from the single-stream cumsum by ~1 ulp;
    # integer error arrays must agree within 1 (same tolerance as the
    # oracle-parity tests).
    e1 = np.asarray(res.leaf_errors).astype(np.int64)
    e2 = np.asarray(errs).astype(np.int64)
    assert np.abs(e1 - e2).max() <= 1
    assert (e1 != e2).sum() <= max(1, B // 20)

    # dp params are normalized-domain; compare against the single-chip
    # device view
    p1 = np.asarray(res.device_leaf_params["w"])
    p2 = np.asarray(leaf_p["w"] if isinstance(leaf_p, dict) else leaf_p)
    np.testing.assert_allclose(p1, p2, rtol=1e-6, atol=1e-8)

    np.testing.assert_allclose(
        float(metrics["model_avg_log2_error"]),
        res.model_avg_log2_error, rtol=1e-6)


@pytest.mark.parametrize("n", [1001, 4093, 4099, 37])
def test_dp_any_n(mesh, rng, n):
    """Non-device-divisible n: the pad-and-mask path must match the
    single-chip build (real key arrays are never divisible by the chip
    count; the reference streams in one process and has no such
    constraint)."""
    B = 16 if n < 100 else 64
    keys = np.sort(rng.integers(0, 2**40, size=n, dtype=np.uint64))
    ds = RMIDataset.from_numpy(keys)
    res = train(ds, "cubic,linear", B)
    top_p, leaf_p, errs, metrics = dp_train_two_layer(
        ds.keys, ds.key_type, "cubic", "linear", B, mesh)
    e1 = np.asarray(res.leaf_errors).astype(np.int64)
    e2 = np.asarray(errs).astype(np.int64)
    assert np.abs(e1 - e2).max() <= 1
    np.testing.assert_allclose(
        float(metrics["model_avg_log2_error"]),
        res.model_avg_log2_error, rtol=1e-6)


@pytest.mark.parametrize("top", ["radix", "bradix", "histogram"])
def test_dp_any_n_masked_tops(mesh, rng, top):
    """Non-divisible n with the tops whose reductions need explicit pad
    masks (bitword OR/AND prefix, bradix chi^2 bucket counts) — an
    unmasked all-ones pad key would zero the common prefix and inflate
    the top chi^2 bucket."""
    n, B = 4099, 64
    keys = np.sort(rng.integers(1, 2**40, size=n, dtype=np.uint64))
    ds = RMIDataset.from_numpy(keys)
    res = train(ds, f"{top},linear", B)
    top_p, leaf_p, errs, _ = dp_train_two_layer(
        ds.keys, ds.key_type, top, "linear", B, mesh)
    e1 = np.asarray(res.leaf_errors).astype(np.int64)
    e2 = np.asarray(errs).astype(np.int64)
    assert np.abs(e1 - e2).max() <= 1, (top, np.abs(e1 - e2).max())


def test_dp_any_n_max_key_tail(mesh):
    """Adversarial pad-merge case: the array ENDS in a duplicate run of
    the u64 maximum — pad sentinels take the same value and would merge
    into the trailing run; that run must stay excluded from the
    longest-run inflation exactly like the reference's last-run rule."""
    rng = np.random.default_rng(99)
    n, B = 4001, 32
    keys = np.sort(rng.integers(0, 2**40, size=n, dtype=np.uint64))
    keys[-7:] = np.uint64(0xFFFFFFFFFFFFFFFF)
    ds = RMIDataset.from_numpy(keys)
    res = train(ds, "linear,linear", B)
    top_p, leaf_p, errs, _ = dp_train_two_layer(
        ds.keys, ds.key_type, "linear", "linear", B, mesh)
    e1 = np.asarray(res.leaf_errors).astype(np.int64)
    e2 = np.asarray(errs).astype(np.int64)
    assert np.abs(e1 - e2).max() <= 1


def test_sharded_serving(mesh, rng):
    """Queries sharded over the mesh, parameters replicated: lookups
    must equal the single-device path."""
    keys = np.sort(rng.integers(0, 2**40, size=4096, dtype=np.uint64))
    ds = RMIDataset.from_numpy(keys)
    res = train(ds, "cubic,linear", 64)

    q = rng.integers(0, 2**40, size=4096, dtype=np.uint64)
    g0, e0 = lookup(res, jnp.asarray(q))

    qs = jax.device_put(jnp.asarray(q), NamedSharding(mesh, P("data")))
    g1, e1 = lookup(res, qs)
    np.testing.assert_array_equal(np.asarray(g0), np.asarray(g1))
    np.testing.assert_array_equal(np.asarray(e0), np.asarray(e1))


def test_parallel_sweep(mesh, rng):
    """Config-level device-parallel measure_rmis matches sequential."""
    from rmi_tpu.parallel.sweep import parallel_measure_rmis
    from rmi_tpu.optimizer import measure_rmis
    import jax

    keys = np.sort(rng.integers(0, 2**40, size=2048, dtype=np.uint64))
    ds = RMIDataset.from_numpy(keys)
    configs = [("linear,linear", 32), ("cubic,linear", 64),
               ("linear,linear", 128), ("linear_spline,linear", 64)]
    seq = measure_rmis(ds, configs)
    par = parallel_measure_rmis(ds, configs, devices=jax.devices()[:4])
    for a, b in zip(seq, par):
        assert a.models == b.models
        assert a.size == b.size
        np.testing.assert_allclose(a.average_log2_error,
                                   b.average_log2_error, rtol=1e-12)


def test_sweep_dispatches_before_any_sync(mesh, rng, monkeypatch):
    """The no-per-build-sync contract behind device overlap: the sweep
    must dispatch EVERY config, then block the host exactly once on a
    single batched (metrics, ovf) transfer (optimizer.rs:220-231 in
    substance — rayon keeps threads busy; here async dispatch keeps
    devices busy).  Wall-clock overlap itself is not measurable on this
    1-core host; the sync structure is the invariant that produces it."""
    from rmi_tpu.parallel.sweep import parallel_measure_rmis
    from rmi_tpu.train import api

    keys = np.sort(rng.integers(0, 2**40, size=2048, dtype=np.uint64))
    ds = RMIDataset.from_numpy(keys)
    configs = [("linear,linear", 32), ("cubic,linear", 64),
               ("linear,linear", 16), ("linear_spline,linear", 64)]

    fetches = []
    real_fetch = api._fetch_host
    monkeypatch.setattr(api, "_fetch_host",
                        lambda tree: (fetches.append(tree),
                                      real_fetch(tree))[1])
    out = parallel_measure_rmis(ds, configs, devices=jax.devices()[:4])
    assert len(out) == len(configs)
    # exactly one host transfer, carrying all four builds' metrics
    assert len(fetches) == 1
    assert len(fetches[0]) == len(configs)


def test_serve_replicated_matches_single(mesh, rng):
    """parallel.serve: queries sharded + tables replicated returns the
    same exact lower bounds as the single-device fast path."""
    from rmi_tpu.lookup import search
    from rmi_tpu.parallel.serve import (replicate_rmi, serving_mesh,
                                        shard_queries)

    keys = np.sort(rng.integers(0, 2**40, size=8192, dtype=np.uint64))
    ds = RMIDataset.from_numpy(keys)
    res = train(ds, "cubic,linear", 64)
    q = rng.integers(0, 2**41, size=1000, dtype=np.uint64)  # incl. o.o.r.
    base = np.asarray(search(res, jnp.asarray(q)))
    np.testing.assert_array_equal(
        base, np.searchsorted(keys, q, side="left"))

    smesh = serving_mesh(jax.devices()[:8])
    res2 = replicate_rmi(res, smesh)
    qs, m = shard_queries(jnp.asarray(q), smesh)
    out = np.asarray(search(res2, qs))[:m]
    np.testing.assert_array_equal(base, out)


def test_serve_per_device_matches_single(mesh, rng):
    """parallel.serve per-device mode: host-split batches over
    independent chip-local copies (the mode that keeps the sorted
    pipeline's sort chip-local) returns the single-device answer."""
    from rmi_tpu.lookup import search
    from rmi_tpu.parallel.serve import (replicate_rmi_per_device,
                                        search_sharded)

    keys = np.sort(rng.integers(0, 2**40, size=8192, dtype=np.uint64))
    ds = RMIDataset.from_numpy(keys)
    res = train(ds, "cubic,linear", 64)
    q = rng.integers(0, 2**41, size=1003, dtype=np.uint64)
    base = np.asarray(search(res, jnp.asarray(q)))
    rmis = replicate_rmi_per_device(res, jax.devices()[:8])
    out = np.asarray(search_sharded(rmis, jnp.asarray(q)))
    np.testing.assert_array_equal(base, out)


@pytest.mark.parametrize("top,leaf,B", [
    ("loglinear", "linear", 32),
    ("normal", "linear", 32),
    ("lognormal", "linear", 32),
    ("radix", "linear", 64),
    ("bradix", "linear", 64),
    ("histogram", "linear", 32),
    ("linear", "loglinear", 16),
    ("linear", "normal", 16),
    ("linear", "lognormal", 16),
    ("linear", "robust_linear", 32),
])
def test_dp_full_zoo(mesh, rng, top, leaf, B):
    """Extended dp model zoo matches the single-chip build."""
    keys = np.sort(rng.integers(1, 2**40, size=4096, dtype=np.uint64))
    ds = RMIDataset.from_numpy(keys)
    res = train(ds, f"{top},{leaf}", B)
    top_p, leaf_p, errs, metrics = dp_train_two_layer(
        ds.keys, ds.key_type, top, leaf, B, mesh)
    e1 = np.asarray(res.leaf_errors).astype(np.int64)
    e2 = np.asarray(errs).astype(np.int64)
    assert np.abs(e1 - e2).max() <= 1, (top, leaf, np.abs(e1-e2).max())


@pytest.mark.parametrize("top", [
    "linear", "robust_linear", "linear_spline", "cubic", "loglinear",
    "normal", "lognormal", "radix", "bradix", "histogram",
])
def test_dp_params_serve_exact(mesh, rng, top):
    """SERVE from the DP-returned top params (not a single-chip
    retrain) and assert the every-key bound contract.  Guards the
    exact-integer-parameter path: bradix's low-variant clamp is a u64
    wraparound value near 2^64 (balanced_radix.rs:103-114) and
    histogram pivots reach 2^62 (histogram.rs:31) — an f64 round-trip
    of either corrupts routing silently."""
    from rmi_tpu.lookup import _rmi_eval
    from rmi_tpu.train.two_layer import norm_constants
    from rmi_tpu.parallel.dp_trainer import DP_TOP_MODELS

    assert top in DP_TOP_MODELS
    n, B = 4096, 64
    # keys near the top of the u64 range so that bradix/histogram
    # params genuinely exceed f64's 53-bit integer window
    keys = np.sort(
        (rng.integers(1, 2**40, size=n, dtype=np.uint64) << np.uint64(22))
        | np.uint64(0x3FFFFF))
    top_p, leaf_p, errs, _ = dp_train_two_layer(
        jnp.asarray(keys), KeyType.U64, top, "linear", B, mesh)

    if isinstance(top_p, dict):
        for v in top_p.values():
            assert np.asarray(v).dtype == np.uint64, (top, top_p)

    kminf, snorm = norm_constants(jnp.asarray(keys), KeyType.U64)
    g, e, _ = _rmi_eval(
        jnp.asarray(keys), top_p, leaf_p, errs, jnp.float64(kminf),
        jnp.float64(snorm), top_type=top, leaf_type="linear", B=B, n=n,
        key_type=KeyType.U64)
    true_lb = np.searchsorted(keys, keys, side="left")
    viol = np.abs(np.asarray(g) - true_lb) > np.asarray(e)
    assert viol.sum() == 0, (
        f"{top}: {int(viol.sum())} bound violations serving from "
        f"DP-returned params")


def test_multihost_helpers():
    """Single-process: initialize() is a safe no-op; meshes span the
    virtual device pool with the documented axis layout."""
    import jax
    from rmi_tpu.parallel import multihost

    assert multihost.initialize() is False      # no coordinator env
    m = multihost.global_mesh()
    assert m.devices.size == jax.device_count()
    assert m.axis_names == ("data",)
    h = multihost.hybrid_mesh()
    assert h.axis_names == ("config", "data")
    assert h.devices.shape == (1, jax.device_count())


@pytest.mark.slow
def test_dp_boundary_stress_large(mesh):
    """Boundary-heavy DP build at n >= 2^22 with ODD per-shard sizes and
    duplicate runs straddling every shard boundary — the class of
    cross-shard carry bug (run-start/run-end scans, ppermute boundary
    keys) that only bites when runs cross shards at awkward offsets.

    Asserts the DP build's OWN every-key bound contract
    |guess - lower_bound(key)| <= err (not just closeness to the
    single-chip build), then the usual <=1 error agreement."""
    import jax.numpy as jnp
    from rmi_tpu.lookup import _rmi_eval
    from rmi_tpu.train.two_layer import norm_constants

    ndev = mesh.devices.size
    per_shard = 524_401                      # odd
    n = ndev * per_shard                     # 4,195,208 > 2^22
    rng = np.random.default_rng(20260818)
    keys = np.sort(rng.integers(0, 2**48, size=n, dtype=np.uint64))
    # implant a duplicate run straddling EVERY shard boundary, with
    # varied (odd/even, short/long) extents on each side
    for s in range(1, ndev):
        b = s * per_shard
        left = 501 + 1000 * (s % 3)
        right = 1000 + 777 * (s % 5)
        keys[b - left:b + right] = keys[b]
    # one run spanning THREE whole shards (tests multi-hop carries)
    keys[2 * per_shard - 11:5 * per_shard + 13] = keys[3 * per_shard]
    keys = np.sort(keys)

    B = 4096
    top, leaf = "linear", "linear"
    top_p, leaf_p, errs, metrics = dp_train_two_layer(
        jnp.asarray(keys), KeyType.U64, top, leaf, B, mesh)

    kminf, snorm = norm_constants(jnp.asarray(keys), KeyType.U64)
    g, e, _ = _rmi_eval(
        jnp.asarray(keys), top_p, leaf_p, errs, jnp.float64(kminf),
        jnp.float64(snorm), top_type=top, leaf_type=leaf, B=B, n=n,
        key_type=KeyType.U64)
    true_lb = np.searchsorted(keys, keys, side="left")
    viol = np.abs(np.asarray(g) - true_lb) > np.asarray(e)
    assert viol.sum() == 0, (
        f"{int(viol.sum())} bound violations, first at "
        f"{np.nonzero(viol)[0][:5]}")

    # cross-check against the single-chip build
    ds = RMIDataset.from_numpy(keys)
    res = train(ds, f"{top},{leaf}", B)
    e1 = np.asarray(res.leaf_errors).astype(np.int64)
    e2 = np.asarray(errs).astype(np.int64)
    assert np.abs(e1 - e2).max() <= 1
