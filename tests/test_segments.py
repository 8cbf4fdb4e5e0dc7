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


def test_hier_count_oracle(rng):
    # exact parity with searchsorted for both sides, int and float,
    # across ladder depths (m <= 128, one level, two levels) and with
    # queries hitting exact values, 0, and the dtype max
    for m in (1, 127, 128, 129, 1000, 16384, (1 << 20) + 7):
        vals = np.sort(rng.integers(0, 2**63, m, dtype=np.uint64))
        q = np.concatenate([
            rng.integers(0, 2**64, 4096, dtype=np.uint64), vals[:64],
            np.array([0, 2**64 - 1], dtype=np.uint64)])
        for strict, side in ((True, "left"), (False, "right")):
            out = np.asarray(seg.hier_count(
                jnp.asarray(vals), jnp.asarray(q), strict=strict))
            np.testing.assert_array_equal(
                out, np.searchsorted(vals, q, side=side))
    fv = np.sort(rng.random(5000) * 1e9)
    fq = np.concatenate([rng.random(2048) * 1.2e9, fv[:64]])
    for strict, side in ((True, "left"), (False, "right")):
        out = np.asarray(seg.hier_count(
            jnp.asarray(fv), jnp.asarray(fq), strict=strict))
        np.testing.assert_array_equal(
            out, np.searchsorted(fv, fq, side=side))


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


def test_scan_kernel_matches_lax(rng, monkeypatch):
    """Single-pass Pallas scan (interpret mode on CPU) vs lax.cum*:
    all four op/direction variants, sizes spanning <1 block, unaligned,
    and multi-block (grid-carry) cases."""
    monkeypatch.setenv("RMI_SCAN_KERNEL", "1")
    from rmi_tpu.ops.scan_kernel import scan_i32
    import jax
    imin, imax = np.iinfo(np.int32).min, np.iinfo(np.int32).max
    for n in (1, 130, 33_000, 70_000):
        v = rng.integers(-2**30, 2**30, n).astype(np.int32)
        vj = jnp.asarray(v)
        np.testing.assert_array_equal(
            np.asarray(scan_i32(vj, is_max=True, fill=imin)),
            np.asarray(jax.lax.cummax(vj)))
        np.testing.assert_array_equal(
            np.asarray(scan_i32(vj, is_max=False, fill=imax)),
            np.asarray(jax.lax.cummin(vj)))
        np.testing.assert_array_equal(
            np.asarray(scan_i32(vj, is_max=True, fill=imin,
                                reverse=True)),
            np.asarray(jax.lax.cummax(vj[::-1])[::-1]))
        np.testing.assert_array_equal(
            np.asarray(scan_i32(vj, is_max=False, fill=imax,
                                reverse=True)),
            np.asarray(jax.lax.cummin(vj[::-1])[::-1]))
    # the blocked_cum* dispatchers route here when forced
    v = rng.integers(-2**30, 2**30, 200_000).astype(np.int32)
    vj = jnp.asarray(v)
    np.testing.assert_array_equal(
        np.asarray(seg.blocked_cummax(vj)),
        np.asarray(jax.lax.cummax(vj)))
    np.testing.assert_array_equal(
        np.asarray(seg.blocked_cummin(vj, reverse=True)),
        np.asarray(jax.lax.cummin(vj[::-1])[::-1]))


def test_window_moments_oracle(rng):
    """Fused moments kernel (interpret mode on CPU) vs the f64 oracle:
    unweighted, weighted {0,1}, and xx_only (normal-variance) modes,
    plus the window-overflow flag on an adversarial span."""
    from rmi_tpu.ops.select_kernel import window_moments

    n, B = 6_000, 64
    t = np.sort(rng.integers(0, B, n)).astype(np.int32)
    x = np.sort(rng.standard_normal(n) * 100.0)
    y = rng.standard_normal(n) * 10.0
    mx = rng.standard_normal(B)
    my = rng.standard_normal(B)
    w = (rng.random(n) < 0.8).astype(np.float64)

    tj, xj, yj = jnp.asarray(t), jnp.asarray(x), jnp.asarray(y)
    mxj, myj = jnp.asarray(mx), jnp.asarray(my)

    # f32-pair value actually selected by the kernel
    def pair_val(m):
        hi = m.astype(np.float32)
        lo = (m - hi.astype(np.float64)).astype(np.float32)
        return hi.astype(np.float64) + lo.astype(np.float64)

    dx = x - pair_val(mx)[t]
    dy = y - pair_val(my)[t]

    dxx, dxy, ovf = window_moments(tj, mxj, myj, xj, yj, B=B, span=64)
    assert int(ovf) == 0
    np.testing.assert_allclose(np.asarray(dxx), dx * dx,
                               rtol=1e-12, atol=1e-10)
    np.testing.assert_allclose(np.asarray(dxy), dx * dy,
                               rtol=1e-12, atol=1e-10)

    dxxw, dxyw, _ = window_moments(tj, mxj, myj, xj, yj, B=B, span=64,
                                   weights=jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(dxxw), dx * dx * w,
                               rtol=1e-12, atol=1e-10)
    np.testing.assert_allclose(np.asarray(dxyw), dx * dy * w,
                               rtol=1e-12, atol=1e-10)

    dxx2, dxy2, _ = window_moments(tj, mxj, mxj, xj, xj, B=B, span=64,
                                   xx_only=True)
    np.testing.assert_allclose(np.asarray(dxx2), dx * dx,
                               rtol=1e-12, atol=1e-10)
    np.testing.assert_allclose(np.asarray(dxy2), dx * dx,
                               rtol=1e-12, atol=1e-10)

    # adversarial: all leaves inside one 2048-key block -> span 64 of
    # B=4096 cannot cover; the overflow flag must trip
    tb = np.sort(rng.integers(0, 4096, 2048)).astype(np.int32)
    xb = np.sort(rng.standard_normal(2048))
    _, _, ovf_bad = window_moments(
        jnp.asarray(tb), jnp.zeros(4096), jnp.zeros(4096),
        jnp.asarray(xb), jnp.asarray(xb), B=4096, span=64)
    assert int(ovf_bad) == 1
