"""Hierarchical row-resolve serving path: exactness against plain
searchsorted across model families, key types, duplicates and level
counts (rmi_tpu/lookup_fast.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from rmi_tpu.data import RMIDataset
from rmi_tpu.train.api import train
from rmi_tpu.lookup import search
from rmi_tpu.lookup_fast import (fast_search, get_plan, supports_fast_path,
                                 SearchPlan, _overlapped_rows, resolve)


@pytest.mark.parametrize("spec,B", [
    ("cubic,linear", 256),
    ("linear,linear", 64),
    ("linear,cubic", 64),
    ("normal,lognormal", 32),
    ("radix,linear", 64),
    ("bradix,linear", 64),
    ("loglinear,linear_spline", 64),
])
def test_fast_search_exact(rng, spec, B):
    keys = np.sort(rng.integers(0, 2**45, size=20000, dtype=np.uint64))
    ds = RMIDataset.from_numpy(keys)
    res = train(ds, spec, B)
    assert supports_fast_path(res)
    q = np.concatenate([keys[::3],
                        rng.integers(0, 2**45, 7000, dtype=np.uint64),
                        [np.uint64(0), keys[0], keys[-1],
                         np.uint64(2**45 + 5)]])
    idx = np.asarray(fast_search(res, jnp.asarray(q)))
    np.testing.assert_array_equal(idx, np.searchsorted(keys, q))


def test_fast_search_wide_packed_rows(rng):
    # leaf spans ~6000 keys -> S~95 sample lanes -> ~190-lane packed
    # rows: exercises the widened 256-lane cap (plans stay "packed"
    # instead of falling to hier); the 128-lane sorted-batch kernels
    # must decline these rows rather than misread them.
    # ~4800-key average spans; the linear top's tail leaves run ~1.5x
    # wider, so the max-span leaf needs S in (63, 127] sample lanes —
    # firmly inside the widened (128, 256]-lane packed regime
    keys = (np.arange(48000, dtype=np.uint64) * np.uint64(1 << 30)
            + rng.integers(0, 1 << 20, 48000).astype(np.uint64))
    ds = RMIDataset.from_numpy(keys)
    res = train(ds, "linear,linear", 10)
    from rmi_tpu.lookup_fast import packed_sample_lanes
    S = packed_sample_lanes(res)
    assert 63 < S <= 127, S      # the shape this test exists to cover
    plan = get_plan(res)
    assert plan.kind == "packed"
    assert plan.rows_u32.shape[1] == 256   # wide rows pad to the cap
    q = np.concatenate([keys[::7],
                        rng.integers(0, 2**46, 5000, dtype=np.uint64),
                        [np.uint64(0), keys[0], keys[-1]]])
    idx = np.asarray(fast_search(res, jnp.asarray(q)))
    np.testing.assert_array_equal(idx, np.searchsorted(keys, q))
    # the direct-count kernel reads no leaf rows, so 256-lane plans
    # serve through it too (sorted batch)
    from rmi_tpu import lookup_fast as lf
    qs = np.sort(q)
    out = lf._sorted_kernel_search_direct(res, plan, jnp.asarray(qs))
    assert out is not None
    np.testing.assert_array_equal(np.asarray(out),
                                  np.searchsorted(keys, qs))


class TestWidePlan:
    """3-gather wide packed plan (sample spacing F > 1 stripes): engages
    for monotone tops whose leaf spans exceed the 2-gather window,
    stays exact (incl. duplicates, out-of-range, f64), caps at F=64."""

    def test_engages_and_exact(self, rng):
        # ~12.5K-key spans -> s_req ~197 lanes -> F=2, S <= 127
        keys = np.sort(rng.integers(0, 2**50, size=200_000,
                                    dtype=np.uint64))
        ds = RMIDataset.from_numpy(keys)
        res = train(ds, "linear,linear", 16)
        from rmi_tpu.lookup_fast import packed_plan_shape
        S, F = packed_plan_shape(res)
        assert F > 1 and 1 + 2 * S <= 256, (S, F)
        plan = get_plan(res)
        assert plan.kind == "packed_wide"
        q = np.concatenate([keys[::11],
                            rng.integers(0, 2**51, 6000, dtype=np.uint64),
                            [np.uint64(0), keys[0], keys[-1],
                             np.uint64(2**64 - 1)]])
        idx = np.asarray(fast_search(res, jnp.asarray(q)))
        np.testing.assert_array_equal(idx, np.searchsorted(keys, q))
        # the public search() routes through it too
        idx2 = np.asarray(search(res, jnp.asarray(q)))
        np.testing.assert_array_equal(idx2, np.searchsorted(keys, q))

    def test_duplicates_and_table_top(self, rng):
        # duplicate-heavy data through a radix table top at tiny B
        keys = np.sort(rng.integers(0, 3000, size=150_000,
                                    dtype=np.uint64)) * 7
        ds = RMIDataset.from_numpy(keys)
        res = train(ds, "radix8,linear", 8)
        plan = get_plan(res)
        assert plan.kind == "packed_wide", plan.kind
        q = np.arange(0, 22000, dtype=np.uint64)
        idx = np.asarray(fast_search(res, jnp.asarray(q)))
        np.testing.assert_array_equal(idx, np.searchsorted(keys, q))

    def test_f64_wide(self, rng):
        keys = np.sort(rng.uniform(-1e12, 1e15, size=120_000))
        ds = RMIDataset.from_numpy(keys)
        res = train(ds, "linear,linear", 8)
        plan = get_plan(res)
        assert plan.kind == "packed_wide", plan.kind
        q = np.concatenate([keys[::9], rng.uniform(-1.1e12, 1.1e15, 5000),
                            [-np.inf, np.inf, 0.0, -0.0]])
        idx = np.asarray(fast_search(res, jnp.asarray(q)))
        np.testing.assert_array_equal(idx, np.searchsorted(keys, q))

    def test_span_past_stride_cap_falls_to_hier(self, rng):
        # one leaf spanning the whole array: s_req > 127*64 -> no F <= 64
        # works -> hierarchical plan
        keys = np.sort(rng.integers(0, 2**50, size=700_000,
                                    dtype=np.uint64))
        ds = RMIDataset.from_numpy(keys)
        res = train(ds, "linear,linear", 1)
        from rmi_tpu.lookup_fast import packed_plan_shape
        assert packed_plan_shape(res) is None
        plan = get_plan(res)
        assert plan.kind == "hier"
        q = rng.integers(0, 2**51, 4000, dtype=np.uint64)
        idx = np.asarray(fast_search(res, jnp.asarray(q)))
        np.testing.assert_array_equal(idx, np.searchsorted(keys, q))

    def test_sorted_paths_wide(self, rng):
        """Sorted/sort-pipeline entry points on a WIDE plan serve
        through the direct-count kernel and stay exact."""
        from rmi_tpu import lookup_fast as lf
        keys = np.sort(rng.integers(0, 2**50, size=200_000,
                                    dtype=np.uint64))
        ds = RMIDataset.from_numpy(keys)
        res = train(ds, "linear,linear", 16)
        plan = get_plan(res)
        assert plan.kind == "packed_wide"
        q = np.sort(rng.integers(0, 2**51, size=1 << 15, dtype=np.uint64))
        want = np.searchsorted(keys, q)
        plan._sort_serve_veto = 0
        np.testing.assert_array_equal(
            np.asarray(lf.fast_search_sorted(res, jnp.asarray(q))), want)
        np.testing.assert_array_equal(
            np.asarray(lf.fast_search_via_sort(res, jnp.asarray(q))),
            want)
        out = lf._sorted_kernel_search_direct(res, plan, jnp.asarray(q))
        assert out is not None
        np.testing.assert_array_equal(np.asarray(out), want)

def test_fast_search_duplicates(rng):
    keys = np.sort(rng.integers(0, 400, size=9000, dtype=np.uint64)) * 3
    ds = RMIDataset.from_numpy(keys)
    res = train(ds, "linear,linear", 32)
    q = np.arange(0, 1300, dtype=np.uint64)
    idx = np.asarray(fast_search(res, jnp.asarray(q)))
    np.testing.assert_array_equal(idx, np.searchsorted(keys, q))


def test_fast_search_f64(rng):
    keys = np.sort(rng.uniform(0, 1e15, size=8000))
    ds = RMIDataset.from_numpy(keys)
    res = train(ds, "cubic,linear", 64)
    q = np.concatenate([keys[::5], rng.uniform(0, 1.1e15, size=4000)])
    idx = np.asarray(fast_search(res, jnp.asarray(q)))
    np.testing.assert_array_equal(idx, np.searchsorted(keys, q))


def test_multi_level_plan(rng, monkeypatch):
    """Force a large max_err so K >= 2 levels engage (the packed/wide
    plans would otherwise cover this shape — pin the hier path)."""
    monkeypatch.setenv("RMI_SERVE_PLAN", "hier")
    # heavily clustered data makes linear tops awful
    centers = rng.integers(0, 2**50, size=4, dtype=np.uint64)
    keys = np.sort(np.concatenate(
        [c + rng.integers(0, 900, size=20000, dtype=np.uint64)
         for c in centers]))
    ds = RMIDataset.from_numpy(keys)
    res = train(ds, "linear,linear", 8)
    plan = get_plan(res)
    assert plan.K >= 2, plan.max_err
    q = np.concatenate([keys[::7],
                        rng.integers(0, 2**50, 5000, dtype=np.uint64)])
    idx = np.asarray(fast_search(res, jnp.asarray(q)))
    np.testing.assert_array_equal(idx, np.searchsorted(keys, q))


def test_search_uses_fast_path(rng):
    keys = np.sort(rng.integers(0, 2**40, size=5000, dtype=np.uint64))
    ds = RMIDataset.from_numpy(keys)
    res = train(ds, "cubic,linear", 64)
    q = rng.integers(0, 2**40, size=3000, dtype=np.uint64)
    idx = np.asarray(search(res, jnp.asarray(q)))
    np.testing.assert_array_equal(idx, np.searchsorted(keys, q))
    assert getattr(res, "_search_plan", None) is not None


def test_overlapped_rows_shape():
    lvl = jnp.arange(200, dtype=jnp.uint64)
    rows = _overlapped_rows(lvl)
    assert rows.shape == (4, 128)
    np.testing.assert_array_equal(np.asarray(rows[0, :128]),
                                  np.arange(128))
    # pad lanes are the max key
    assert int(rows[3, -1]) == np.iinfo(np.uint64).max

@pytest.mark.parametrize("spec,B,kind", [
    ("radix18,linear", 128, "packed"),    # table top, small spans
    ("radix8,linear", 64, None),          # 256-slot table top
    ("histogram,linear", 64, "packed"),   # pivot top
    ("cubic,radix8", 64, None),           # int-output TABLE leaf
    ("radix22,cubic", 128, None),
])
def test_fast_search_table_tops_and_leaves(rng, spec, B, kind):
    """Serving breadth: table tops route through the packed plan
    (monotone searchsorted constructions) and table LEAVES through the
    generic eval + hierarchical resolve."""
    keys = np.sort(rng.integers(0, 2**45, size=20000, dtype=np.uint64))
    ds = RMIDataset.from_numpy(keys)
    res = train(ds, spec, B)
    assert supports_fast_path(res)
    plan = get_plan(res)
    if kind is not None:
        assert plan.kind == kind
    q = np.concatenate([keys[::3],
                        rng.integers(0, 2**45, 7000, dtype=np.uint64),
                        [np.uint64(0), keys[0], keys[-1],
                         np.uint64(2**45 + 5), np.uint64(2**64 - 1)]])
    idx = np.asarray(fast_search(res, jnp.asarray(q)))
    np.testing.assert_array_equal(idx, np.searchsorted(keys, q))


def test_fast_search_f64_packed(rng):
    """f64 keys take the 2-gather packed plan through the IEEE
    total-order u64 image (keymod.ordered_u64), including negatives."""
    keys = np.sort(np.concatenate([
        rng.uniform(-1e12, 1e15, size=8000),
        rng.uniform(0, 1.0, size=2000)]))
    ds = RMIDataset.from_numpy(keys)
    res = train(ds, "cubic,linear", 64)
    plan = get_plan(res)
    assert plan.kind == "packed"
    q = np.concatenate([keys[::5], rng.uniform(-1.1e12, 1.1e15, size=4000),
                        [-np.inf, np.inf, 0.0, -0.0]])
    idx = np.asarray(fast_search(res, jnp.asarray(q)))
    np.testing.assert_array_equal(idx, np.searchsorted(keys, q))


def test_ordered_u64_is_monotone(rng):
    from rmi_tpu.keys import KeyType, ordered_u64
    vals = np.sort(np.concatenate([
        rng.uniform(-1e300, 1e300, 3000), [0.0, -0.0, np.inf, -np.inf]]))
    mapped = np.asarray(ordered_u64(jnp.asarray(vals), KeyType.F64))
    assert (np.diff(mapped.astype(np.uint64)) >= 0).all()
    # strictly increasing wherever values differ
    diff_vals = np.diff(vals) > 0
    assert (np.diff(mapped)[diff_vals] > 0).all()


@pytest.mark.parametrize("spec,B", [
    ("loglinear,linear", 64),
    ("normal,linear", 64),
    ("lognormal,linear", 64),
])
def test_scalar_transcendental_tops_packed(rng, spec, B):
    """Fitted loglinear/normal/lognormal tops that pass the host-side
    monotonicity check take the packed 2-gather plan and stay exact,
    including out-of-range and boundary queries."""
    gaps = rng.exponential(size=20000)
    csum = np.cumsum(gaps)
    keys = (csum * (2.0 ** 50 / csum[-1])).astype(np.uint64)
    keys = np.maximum(keys, np.uint64(1))      # lognormal: ln(x) finite
    ds = RMIDataset.from_numpy(keys)
    res = train(ds, spec, B)
    plan = get_plan(res)
    assert plan.kind == "packed", (spec, plan.kind)
    q = np.concatenate([keys[::3],
                        rng.integers(1, 2**51, 7000, dtype=np.uint64),
                        [np.uint64(0), keys[0], keys[-1],
                         np.uint64(2**52 + 5)]])
    idx = np.asarray(fast_search(res, jnp.asarray(q)))
    np.testing.assert_array_equal(idx, np.searchsorted(keys, q))


def test_scalar_top_monotone_guard(rng):
    """Parameter patterns outside the provably monotone region must
    fall back to the hierarchical plan."""
    import jax
    from rmi_tpu import lookup_fast as lf

    keys = np.sort(rng.integers(1, 2**45, size=9000, dtype=np.uint64))
    ds = RMIDataset.from_numpy(keys)
    res = train(ds, "normal,linear", 32)
    assert lf._scalar_top_monotone(res)

    # zero stdev -> division blows up -> not provably monotone
    w = np.asarray(res.device_top_params["w"], dtype=np.float64).copy()
    w[0, 1] = 0.0
    res.device_top_params = {"w": jnp.asarray(w)}
    res._search_plan = None
    assert not lf._scalar_top_monotone(res)
    assert get_plan(res).kind == "hier"

    # loglinear with a negative slope is decreasing
    res2 = train(ds, "loglinear,linear", 32)
    w2 = np.asarray(res2.device_top_params["w"], dtype=np.float64).copy()
    w2[0, 1] = -abs(w2[0, 1]) - 1.0
    res2.device_top_params = {"w": jnp.asarray(w2)}
    res2._search_plan = None
    assert not lf._scalar_top_monotone(res2)
    assert get_plan(res2).kind == "hier"


@pytest.mark.slow
class TestSortedServe:
    """Gather-free sorted-batch serving (ops/sorted_serve_kernel.py,
    interpret mode on CPU): exactness against searchsorted, kernel-path
    engagement, sparse fallback, f64 keys, and order preservation of
    the public search_sorted API.  slow: interpret-mode kernels at
    400K keys dominate the file's runtime."""

    def _mkindex(self, rng, n=400_000, spec="cubic,linear", B=1024,
                 dup=True):
        keys = np.sort(rng.integers(0, 2**55, size=n, dtype=np.uint64))
        if dup:
            keys[1000:1100] = keys[1000]
            keys = np.sort(keys)
        ds = RMIDataset.from_numpy(keys)
        return keys, train(ds, spec, B)

    def test_kernel_exact_u64(self, rng):
        from rmi_tpu import lookup_fast as lf
        keys, res = self._mkindex(rng)
        plan = get_plan(res)
        assert plan.kind == "packed"
        nq = 1 << 15
        q = rng.integers(0, 2**56, size=nq, dtype=np.uint64)
        q[:8] = 0                       # below range
        q[-8:] = 2**56 - 1              # above range
        q = np.sort(q)
        out = lf._sorted_kernel_search_direct(res, plan, jnp.asarray(q))
        assert out is not None, "dense sorted batch must take the kernel"
        np.testing.assert_array_equal(
            np.asarray(out), np.searchsorted(keys, q, side="left"))

    def test_kernel_exact_f64(self, rng):
        from rmi_tpu import lookup_fast as lf
        keys = np.sort(rng.uniform(-1e9, 1e9, size=400_000))
        ds = RMIDataset.from_numpy(keys)
        res = train(ds, "cubic,linear", 1024)
        q = np.sort(rng.uniform(-1.1e9, 1.1e9, size=1 << 15))
        out = lf.fast_search_sorted(res, jnp.asarray(q))
        np.testing.assert_array_equal(
            np.asarray(out), np.searchsorted(keys, q, side="left"))

    def test_public_api_matches_search(self, rng):
        from rmi_tpu.lookup import search_sorted
        keys, res = self._mkindex(rng, n=300_000, B=512)
        q = np.sort(rng.integers(0, 2**56, size=1 << 14, dtype=np.uint64))
        got = np.asarray(search_sorted(res, jnp.asarray(q)))
        want = np.asarray(search(res, jnp.asarray(q)))
        np.testing.assert_array_equal(got, want)

    def test_small_or_sparse_falls_back(self, rng):
        """Batches below the size floor (and plans without the packed
        arrays) must still serve exactly through the gather path."""
        keys, res = self._mkindex(rng, n=100_000, B=256)
        from rmi_tpu.lookup import search_sorted
        q = np.sort(rng.integers(0, 2**56, size=500, dtype=np.uint64))
        np.testing.assert_array_equal(
            np.asarray(search_sorted(res, jnp.asarray(q))),
            np.searchsorted(keys, q, side="left"))

    def test_direct_kernel_narrow_plan(self, rng):
        """The fused direct program must be exact through BOTH a kernel
        tier (dense batch) and the in-graph gather fallback (sparse
        batch), with no decline in either case."""
        from rmi_tpu import lookup_fast as lf
        keys, res = self._mkindex(rng)
        plan = get_plan(res)
        assert plan.kind == "packed"
        for nq in (1 << 15, 2048):      # dense -> tier, sparse -> fallback
            q = np.sort(rng.integers(0, 2**56, size=nq, dtype=np.uint64))
            q[:4] = 0
            q[-4:] = 2**56 - 1
            q = np.sort(q)
            out = lf._sorted_kernel_search_direct(res, plan,
                                                  jnp.asarray(q))
            assert out is not None
            np.testing.assert_array_equal(
                np.asarray(out), np.searchsorted(keys, q, side="left"))

    def test_direct_kernel_f64(self, rng):
        from rmi_tpu import lookup_fast as lf
        keys = np.sort(rng.uniform(-1e9, 1e9, size=400_000))
        ds = RMIDataset.from_numpy(keys)
        res = train(ds, "cubic,linear", 1024)
        q = np.sort(rng.uniform(-1.1e9, 1.1e9, size=1 << 15))
        out = lf.fast_search_sorted(res, jnp.asarray(q))
        np.testing.assert_array_equal(
            np.asarray(out), np.searchsorted(keys, q, side="left"))

    def test_via_sort_veto_decays(self, rng, monkeypatch):
        """A plan vetoed by consecutive kernel declines must RE-PROBE
        after SORT_SERVE_REPROBE skipped calls and recover the kernel
        path when batch density rises — the veto is a backoff, not a
        permanent switch (round-3 review weak#3)."""
        from rmi_tpu import lookup_fast as lf
        keys = np.sort(rng.integers(0, 2**55, size=100_000,
                                    dtype=np.uint64))
        ds = RMIDataset.from_numpy(keys)
        res = train(ds, "cubic,linear", 256)
        plan = get_plan(res)
        assert plan.kind in ("packed", "packed_wide")
        q = rng.integers(0, 2**56, size=4096, dtype=np.uint64)
        want = np.searchsorted(keys, q, side="left")

        calls = [0]
        decline = [True]

        def stub(rmi_, plan_, qs):
            calls[0] += 1
            if decline[0]:
                return None
            return jnp.asarray(
                np.searchsorted(keys, np.asarray(qs), side="left"),
                dtype=jnp.int32)

        monkeypatch.setattr(lf, "_sorted_kernel_search_direct", stub)

        # two declines arm the veto; results stay exact via the gather
        # fallback throughout
        for _ in range(2):
            np.testing.assert_array_equal(
                np.asarray(lf.fast_search_via_sort(res, jnp.asarray(q))),
                want)
        assert calls[0] == 2 and plan._sort_serve_veto == 2

        # vetoed calls skip the probe entirely...
        for _ in range(lf.SORT_SERVE_REPROBE - 1):
            np.testing.assert_array_equal(
                np.asarray(lf.fast_search_via_sort(res, jnp.asarray(q))),
                want)
        assert calls[0] == 2, "probe must not run while vetoed"

        # ...until the re-probe call, which now succeeds and clears it
        decline[0] = False
        np.testing.assert_array_equal(
            np.asarray(lf.fast_search_via_sort(res, jnp.asarray(q))),
            want)
        assert calls[0] == 3
        assert plan._sort_serve_veto == 0 and plan._sort_serve_skips == 0
        # and the next call probes again immediately (veto cleared)
        np.testing.assert_array_equal(
            np.asarray(lf.fast_search_via_sort(res, jnp.asarray(q))),
            want)
        assert calls[0] == 4

    def test_via_sort_random_batch(self, rng, monkeypatch):
        """sort -> sorted kernel -> unsort must be exact for an
        arbitrary-order batch, and the search() auto hook must honor
        RMI_SERVE_SORT."""
        from rmi_tpu import lookup_fast as lf
        keys, res = self._mkindex(rng)
        q = rng.integers(0, 2**56, size=1 << 15, dtype=np.uint64)
        q[:4] = 0
        q[-4:] = 2**56 - 1              # unsorted, with extremes
        want = np.searchsorted(keys, q, side="left")
        out = lf.fast_search_via_sort(res, jnp.asarray(q))
        np.testing.assert_array_equal(np.asarray(out), want)
        # the public search() takes the same path when forced
        monkeypatch.setenv("RMI_SERVE_SORT", "1")
        np.testing.assert_array_equal(
            np.asarray(search(res, jnp.asarray(q))), want)
        monkeypatch.setenv("RMI_SERVE_SORT", "0")
        np.testing.assert_array_equal(
            np.asarray(search(res, jnp.asarray(q))), want)
