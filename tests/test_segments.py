"""Segment-primitive tests: the blocked/chunked range reductions that
replace the reference's streaming per-leaf loops (two_layer.rs:20-99)
against numpy oracles, including the large-B chunked paths used by the
optimizer grid (bucket up to 2^24, optimizer.rs:110-151)."""

import numpy as np
import jax.numpy as jnp
import pytest

from rmi_tpu.utils import segments as seg


@pytest.fixture
def case(rng):
    n, B = 10_000, 300
    t = np.sort(rng.integers(0, B, n)).astype(np.int32)
    starts = np.searchsorted(t, np.arange(B), side="left")
    ends = np.concatenate([starts[1:], [n]])
    return n, B, t, starts, ends


def test_sorted_starts_oracle(case):
    n, B, t, starts, _ = case
    out = np.asarray(seg.sorted_starts(jnp.asarray(t), B))
    np.testing.assert_array_equal(out, starts)


def test_sorted_starts_edge_cases(rng):
    # all elements in one leaf; empty leading/trailing leaves
    t = np.full(1000, 7, np.int32)
    out = np.asarray(seg.sorted_starts(jnp.asarray(t), 16))
    np.testing.assert_array_equal(
        out, np.searchsorted(t, np.arange(16), side="left"))
    # single element
    out1 = np.asarray(seg.sorted_starts(jnp.asarray([3], jnp.int32), 8))
    np.testing.assert_array_equal(
        out1, np.searchsorted([3], np.arange(8), side="left"))


def test_range_max_oracle(case, rng):
    n, B, t, starts, ends = case
    v = rng.integers(0, 10**6, n).astype(np.int32)
    out = np.asarray(seg.range_max(jnp.asarray(v), jnp.asarray(starts),
                                   jnp.asarray(ends), 0))
    ref = np.array([v[s:e].max() if e > s else 0
                    for s, e in zip(starts, ends)])
    np.testing.assert_array_equal(out, ref)


def test_range_sum_blocked_oracle(case, rng):
    n, B, t, starts, ends = case
    v = rng.standard_normal(n)
    out = np.asarray(seg.range_sum_blocked(
        jnp.asarray(v), jnp.asarray(starts), jnp.asarray(ends)))
    ref = np.array([v[s:e].sum() for s, e in zip(starts, ends)])
    np.testing.assert_allclose(out, ref, rtol=1e-12, atol=1e-12)


def test_chunked_paths_match_direct(case, rng, monkeypatch):
    """Forcing the lax.map chunked branch (as used at optimizer-grid
    bucket sizes) must reproduce the direct [B, lanes] row-gather
    results bit-for-bit."""
    n, B, t, starts, ends = case
    vi = rng.integers(0, 10**6, n).astype(np.int32)
    vf = rng.standard_normal(n)
    sj, ej = jnp.asarray(starts), jnp.asarray(ends)

    d_ss = np.asarray(seg.sorted_starts(jnp.asarray(t), B))
    d_rm = np.asarray(seg.range_max(jnp.asarray(vi), sj, ej, 0))
    d_rs = np.asarray(seg.range_sum_blocked(jnp.asarray(vf), sj, ej))

    monkeypatch.setattr(seg, "_ROW_DIRECT_MAX", 16)
    monkeypatch.setattr(seg, "_ROW_CHUNK", 64)
    np.testing.assert_array_equal(
        np.asarray(seg.sorted_starts(jnp.asarray(t), B)), d_ss)
    np.testing.assert_array_equal(
        np.asarray(seg.range_max(jnp.asarray(vi), sj, ej, 0)), d_rm)
    np.testing.assert_array_equal(
        np.asarray(seg.range_sum_blocked(jnp.asarray(vf), sj, ej)), d_rs)


def test_blocked_scans_match_lax(rng):
    for n in (1, 7, 512, 513, 100_000):
        v = rng.integers(-2**30, 2**30, n).astype(np.int32)
        vj = jnp.asarray(v)
        import jax
        np.testing.assert_array_equal(
            np.asarray(seg.blocked_cummax(vj)),
            np.asarray(jax.lax.cummax(vj)))
        np.testing.assert_array_equal(
            np.asarray(seg.blocked_cummin(vj, reverse=True)),
            np.asarray(jax.lax.cummin(vj[::-1])[::-1]))


def test_blocked_scans_force_blocked_path(rng, monkeypatch):
    monkeypatch.setattr(seg, "_SCAN_DIRECT_MAX", 0)
    import jax
    v = rng.integers(0, 2**20, 5000).astype(np.int32)
    vj = jnp.asarray(v)
    np.testing.assert_array_equal(
        np.asarray(seg.blocked_cummax(vj)),
        np.asarray(jax.lax.cummax(vj)))
    np.testing.assert_array_equal(
        np.asarray(seg.blocked_cummin(vj, reverse=True)),
        np.asarray(jax.lax.cummin(vj[::-1])[::-1]))
