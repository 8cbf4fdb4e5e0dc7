"""cache_fix (--bounded) tests: spline invariant (cache_fix.rs:96-103),
absolute-bound contract (tests/cache_fix_wiki/main.cpp:36), duplicate
handling, pre-knot insertion (cache_fix.rs:118-128)."""

import numpy as np
import pytest

import jax.numpy as jnp

from rmi_tpu.cache_fix import _cache_fix_py, cache_fix
from rmi_tpu.data import RMIDataset
from rmi_tpu.train.api import train_bounded
from rmi_tpu.lookup import lookup, search


def spline_invariant(keys, offsets, sk, sv, line):
    """Every (key, offset) must predict into its own cache line when
    interpolated on the spline."""
    for k, off in zip(keys.tolist(), offsets.tolist()):
        i = np.searchsorted(sk, k)
        if i >= len(sk):
            continue
        if sk[i] == k and (i + 1 == len(sk) or True):
            # exact knot: find segment [i-1, i] or [i, i+1]
            pass
        lo = max(i - 1, 0) if sk[i] != k or i == 0 else i - 1
        hi = lo + 1
        if hi >= len(sk):
            lo, hi = len(sk) - 2, len(sk) - 1
        if sk[hi] == sk[lo]:
            continue
        t = (k - float(sk[lo])) / (float(sk[hi]) - float(sk[lo]))
        pred = int((1.0 - t) * float(sv[lo]) + t * float(sv[hi]))
        assert pred // line == off // line, (k, off, pred)


def test_invariant_random(rng):
    keys = np.unique(rng.integers(10, 2**30, size=3000, dtype=np.uint64))
    offs = np.arange(keys.shape[0], dtype=np.uint64)
    sk, sv = _cache_fix_py(keys, offs, 8)
    assert (np.diff(sk.astype(np.float64)) >= 0).all()
    spline_invariant(keys, offs, sk, sv, 8)


def test_fma_rounding_parity():
    """The greedy accept/reject uses f64::mul_add (cache_fix.rs:41): a
    double-rounded lerp flips line decisions on wide-key-range data and
    the knot stream diverges permanently.  This exponential-gap 2^56
    shape split the native (compiler-contracted fma) and Python
    (double-rounded) paths by 52 knots before both were pinned to
    explicit fma; all paths must agree bit-exactly."""
    rng = np.random.default_rng(7)
    gaps = rng.exponential(size=20_000)
    csum = np.cumsum(gaps)
    keys = np.maximum((csum * (2.0 ** 56 / csum[-1])).astype(np.uint64),
                      np.uint64(1))
    offs = np.arange(keys.shape[0], dtype=np.uint64)
    sk_py, sv_py = _cache_fix_py(keys, offs, 8)
    sk, sv = cache_fix(RMIDataset.from_numpy(keys), 8)  # native if built
    np.testing.assert_array_equal(np.asarray(sk, np.uint64), sk_py)
    np.testing.assert_array_equal(np.asarray(sv, np.uint64), sv_py)

    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    import reference_oracle as oracle
    knots = oracle.oracle_cache_fix([int(k) for k in keys], 8)
    np.testing.assert_array_equal(
        sk_py, np.asarray([k for k, _ in knots], dtype=np.uint64))
    np.testing.assert_array_equal(
        sv_py, np.asarray([v for _, v in knots], dtype=np.uint64))


def test_preknot_insertion():
    keys = np.asarray([10, 20, 30, 40], dtype=np.uint64)
    offs = np.arange(4, dtype=np.uint64)
    sk, sv = _cache_fix_py(keys, offs, 2)
    # each key except consecutive ones gets a key-1 candidate first
    assert sk[0] == 9  # first candidate is key-1 (10-1 != last_key 0)


def test_requires_more_items_than_line():
    ds = RMIDataset.from_numpy(np.arange(4, dtype=np.uint64))
    with pytest.raises(ValueError):
        cache_fix(ds, 8)


@pytest.mark.parametrize("line", [4, 8, 64])
def test_bounded_end_to_end(rng, line):
    keys = np.sort(rng.integers(10, 2**45, size=5000, dtype=np.uint64))
    ds = RMIDataset.from_numpy(keys)
    res = train_bounded(ds, "linear_spline,linear", 128, line)
    assert res.cache_fix is not None
    assert res.num_data_rows == 5000

    pos, err = lookup(res, ds.keys)
    lb = np.searchsorted(keys, keys)
    p = np.asarray(pos, dtype=np.int64)
    assert (np.asarray(err) == line).all()
    assert (np.abs(p - lb) <= line).all()

    idx = np.asarray(search(res, ds.keys, keys=ds.keys))
    np.testing.assert_array_equal(idx, lb)


def test_bounded_with_duplicates(rng):
    base = np.sort(rng.integers(2, 500, size=3000, dtype=np.uint64))
    keys = base * 13 + 7
    ds = RMIDataset.from_numpy(keys)
    res = train_bounded(ds, "linear,linear", 32, 8)
    pos, err = lookup(res, ds.keys)
    lb = np.searchsorted(keys, keys)
    assert (np.abs(np.asarray(pos, dtype=np.int64) - lb) <= 8).all()


def test_serve_boundary_exactness():
    """The reference's emitted cachefix lookup lerps with std::fma
    (codegen.rs:444); the JAX serve path is double-rounded and (on
    TPU) two-limb-emulated, so _cachefix_interp resolves any lane
    within eps of a cache-line boundary to the UPPER line — both
    possible fma-side outcomes then satisfy |pos - true| <= line.

    Part 1 sweeps the lerp value across a line boundary at ulp
    granularity (denominator 2^50+1 makes each query step move the
    lerp by ~1.4e-14) and checks the device line index against the
    exact-Fraction fma oracle: always in {m, m+1}, and exactly m away
    from the boundary.  Part 2 is the end-to-end contract on the
    2^56-gap dataset class that exposed the round-4 fit divergence."""
    from fractions import Fraction
    from rmi_tpu.lookup import _cachefix_interp

    # --- part 1: ulp-resolution sweep across the 24 = 3*8 boundary
    D = (1 << 50) + 1                    # odd => t rounds in the divide
    v0, v1, line = 13, 35, 8             # odd v0 => (1-t)*v0 inexact
    # near sweep: every lane within eps of the boundary (steps of
    # ~1.4e-14 in lerp value); far block: clear of the eps window by
    # ~0.015 so the no-perturbation branch is exercised too
    qs = np.concatenate([
        np.arange((1 << 49) - 400, (1 << 49) + 400, dtype=np.uint64),
        np.arange((1 << 49) - (1 << 30), (1 << 49) - (1 << 30) + 64,
                  dtype=np.uint64),
        np.arange((1 << 49) + (1 << 30), (1 << 49) + (1 << 30) + 64,
                  dtype=np.uint64),
    ])
    sk = jnp.asarray(np.asarray([0, D], dtype=np.uint64))
    sv = jnp.asarray(np.asarray([v0, v1], dtype=np.uint64))
    start = jnp.zeros(qs.shape, jnp.int64)
    errs = jnp.full(qs.shape, 2, jnp.int64)
    pos = np.asarray(_cachefix_interp(sk, sv, jnp.asarray(qs), start,
                                      errs, line_size=line,
                                      total_keys=1000))
    m_dev = pos // line

    m_exact = np.empty(qs.shape[0], dtype=np.int64)
    fma_vals = np.empty(qs.shape[0], dtype=np.float64)
    for i, q in enumerate(qs.tolist()):
        t = float(Fraction(q, D))              # fl(q / D)
        a = 1.0 - t                            # exact (Sterbenz)
        p = float(Fraction(t) * v1)            # fl(t * v1)
        f = float(Fraction(a) * v0 + Fraction(p))   # fma: one rounding
        fma_vals[i] = f
        m_exact[i] = int(f) // line
    # the sweep must actually cross the boundary
    assert m_exact.min() == 2 and m_exact.max() == 3
    # device index is m or m+1 everywhere => |pos - true| <= line for
    # every true offset the fit could have certified
    assert ((m_dev == m_exact) | (m_dev == m_exact + 1)).all()
    # and agrees exactly once clear of the eps window
    far = np.abs(fma_vals - 24.0) > 1e-6
    np.testing.assert_array_equal(m_dev[far], m_exact[far])

    # --- part 2: end-to-end on the fit-divergence dataset class
    rng = np.random.default_rng(7)
    gaps = rng.exponential(size=20_000)
    csum = np.cumsum(gaps)
    keys = np.unique(np.maximum(
        (csum * (2.0 ** 56 / csum[-1])).astype(np.uint64), np.uint64(1)))
    ds = RMIDataset.from_numpy(keys)
    res = train_bounded(ds, "linear_spline,linear", 128, 8)
    pos, err = lookup(res, ds.keys)
    lb = np.searchsorted(keys, keys)
    assert (np.abs(np.asarray(pos, np.int64) - lb) <= 8).all()
    idx = np.asarray(search(res, ds.keys, keys=ds.keys))
    np.testing.assert_array_equal(idx, lb)


def test_bounded_u32_promotes(rng):
    keys = np.sort(rng.integers(10, 2**30, size=2000).astype(np.uint32))
    ds = RMIDataset.from_numpy(keys)
    res = train_bounded(ds, "linear,linear", 32, 8)
    pos, err = lookup(res, jnp.asarray(keys.astype(np.uint64)))
    lb = np.searchsorted(keys, keys)
    assert (np.abs(np.asarray(pos, dtype=np.int64) - lb) <= 8).all()
