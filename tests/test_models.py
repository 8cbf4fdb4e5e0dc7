"""Golden unit tests for the model zoo, mirroring the reference's
inline tests (linear.rs:122-149, cubic_spline.rs:194-252,
linear_spline.rs:85-113, normal.rs:129-148/204-223, histogram.rs:106-134,
utils.rs:106-127) plus parity checks against the sequential oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from rmi_tpu.models import get_model, predict_clamped
from rmi_tpu.models.linear import _whole_array_spans
from rmi_tpu.models.radix import (num_bits_device,
                                  common_prefix_size_device)
from rmi_tpu.utils import segments as seg

import reference_oracle as oracle


def fit_pairs(model_name, pairs):
    """Fit a single model on explicit (key, y) pairs via the segmented
    path with one whole-array leaf."""
    m = get_model(model_name)
    xf = jnp.asarray([float(k) for k, _ in pairs], dtype=jnp.float64)
    yf = jnp.asarray([float(y) for _, y in pairs], dtype=jnp.float64)
    spans = _whole_array_spans(len(pairs))
    out = m.fit_leaves(xf, yf, spans, xf)
    return m, (out["w"] if isinstance(out, dict) else out)


def pred_int(m, params, x, bound=10**15):
    p = m.predict(params, None, jnp.asarray([float(x)], dtype=jnp.float64))
    return int(predict_clamped(p, bound)[0])


def test_linear_basic():
    m, p = fit_pairs("linear", [(1, 2), (2, 3), (3, 4)])
    assert pred_int(m, p, 1) == 2
    assert pred_int(m, p, 6) == 7


def test_linear_single():
    m, p = fit_pairs("linear", [(1, 2)])
    assert pred_int(m, p, 1) == 2


def test_linear_empty():
    m = get_model("linear")
    spans = _whole_array_spans(1)
    empty = seg.Spans(t=spans.t, starts=spans.ends * 0, ends=spans.ends * 0,
                      aug_starts=spans.ends * 0, aug_ends=spans.ends * 0,
                      nonempty=jnp.zeros((1,), bool),
                      has_prev=jnp.zeros((1,), bool),
                      has_next=jnp.zeros((1,), bool), n=1, B=1)
    xf = jnp.zeros((1,))
    p = m.fit_leaves(xf, xf, empty, xf)
    assert np.allclose(np.asarray(p), [[0.0, 0.0]])


def test_loglinear_basic():
    m, p = fit_pairs("loglinear", [(2, 2), (3, 4), (4, 16)])
    assert pred_int(m, p, 2) == 1
    assert pred_int(m, p, 4) == 13


def test_linear_spline_basic():
    m, p = fit_pairs("linear_spline", [(1, 2), (2, 3), (3, 8)])
    assert pred_int(m, p, 1) == 2
    assert pred_int(m, p, 3) == 8


def test_linear_spline_single():
    m, p = fit_pairs("linear_spline", [(1, 2)])
    assert pred_int(m, p, 1) == 2


@pytest.mark.parametrize("pairs,queries", [
    ([(1, 2), (2, 3), (3, 8), (4, 20)], [(1, 2.0), (4, 20.0)]),
    ([(1, 2), (2, 3), (3, 8), (4, 20), (5, 80)], [(1, 2.0), (5, 80.0)]),
    ([(1, 2), (1, 2), (3, 8), (4, 20), (5, 80)], [(1, 2.0), (5, 80.0)]),
    ([(1, 2), (1, 2), (1, 2)], [(1, 2.0)]),
])
def test_cubic_reference_cases(pairs, queries):
    m, p = fit_pairs("cubic", pairs)
    for x, want in queries:
        got = float(m.predict(p, None,
                              jnp.asarray([float(x)], dtype=jnp.float64))[0])
        assert abs(got - want) <= 0.5


def test_cubic_single():
    m, p = fit_pairs("cubic", [(1, 2)])
    assert pred_int(m, p, 1) == 2


def test_normal_basic():
    m, p = fit_pairs("normal", [(1, 1), (2, 3), (3, 5)])
    assert pred_int(m, p, 2) == 2
    assert pred_int(m, p, 1) == 0


def test_lognormal_basic():
    m, p = fit_pairs("lognormal", [(1, 1), (2, 2), (3, 20)])
    assert pred_int(m, p, 2) == 11
    assert pred_int(m, p, 1) == 2


@pytest.mark.parametrize("model", ["linear", "robust_linear", "loglinear",
                                   "linear_spline", "cubic", "normal",
                                   "lognormal"])
def test_fit_matches_oracle_random(model, rng):
    keys = np.sort(rng.integers(0, 10**12, size=200)).astype(np.float64)
    ys = np.arange(200, dtype=np.float64)
    pairs = list(zip(keys.tolist(), ys.tolist()))
    m, p = fit_pairs(model, pairs)
    want = {
        "linear": oracle.linear_fit,
        "robust_linear": oracle.robust_linear_fit,
        "loglinear": oracle.loglinear_fit,
        "linear_spline": oracle.linear_spline_fit,
        "cubic": oracle.cubic_fit,
        "normal": oracle.normal_fit,
        "lognormal": oracle.lognormal_fit,
    }[model](pairs)
    got = np.asarray(p).reshape(-1)
    np.testing.assert_allclose(got, np.asarray(want, dtype=np.float64),
                               rtol=1e-9, atol=1e-9)


def test_num_bits():
    for v in [1, 2, 3, 4, 7, 8, 100, 2**20, 2**40]:
        got = int(num_bits_device(jnp.uint64(v)))
        assert got == oracle.num_bits(v), v


def test_common_prefix():
    # utils.rs:106-127
    d1 = jnp.asarray([1, 4, 8], dtype=jnp.uint64)
    assert int(common_prefix_size_device(d1)) == 64 - 4
    d2 = jnp.asarray([1, 8, 9, 12], dtype=jnp.uint64)
    assert int(common_prefix_size_device(d2)) == 64 - 4


def test_histogram_reference_case():
    # histogram.rs:106-127: keys i*3, positions i//3 for i in 0..1000
    from rmi_tpu.models.histogram import _histogram_fit_top
    keys = jnp.asarray([i * 3 for i in range(1000)], dtype=jnp.uint64)
    # emulate container with y = i//3 via scale: the reference test uses
    # explicit positions; here num_bins = last y = 333 comes from scale
    m = get_model("histogram")
    n = 1000
    scale = 333.33333 / 999  # makes trunc((n-1)*scale) == 333
    params = m.fit_top(keys_f=keys.astype(jnp.float64),
                       ys_f=jnp.floor(jnp.arange(n, dtype=jnp.float64) / 3),
                       ep_ys_f=None, n=n, keys=keys, B=334,
                       scale=333.0 / 999.0)
    pred = m.predict(params, None, jnp.asarray(
        [0, 3, 12, 1500, 15000], dtype=jnp.uint64))
    got = [int(x) if x < 2**63 else -1 for x in np.asarray(pred)]
    assert got[0] == 0 or got[0] == -1  # key 0 == pivot 0 -> ub-1 = 0
    assert got[1] == 0
    assert got[2] == 1
    assert got[3] == 166
    # keys past the last pivot: upper_bound == num_bins, minus 1.  (The
    # reference's stale inline test claims 333 against a removed API;
    # the CURRENT histogram.rs:57-61 yields 332 here.)
    assert got[4] == 332


def test_radix_predict():
    m = get_model("radix")
    params = {"w_int": jnp.asarray([60, 4], dtype=jnp.uint64)}
    keys = jnp.asarray([1, 4, 8, 15], dtype=jnp.uint64)
    out = np.asarray(m.predict(params, None, keys))
    np.testing.assert_array_equal(out, [1, 4, 8, 15])


def test_range_max_matches_segment_max(rng):
    from rmi_tpu.utils.segments import range_max
    for n, B in ((1000, 16), (40000, 64), (70000, 7)):
        vals = jnp.asarray(rng.integers(0, 10**6, size=n, dtype=np.int64)
                           .astype(np.int32))
        t = np.sort(rng.integers(0, B, size=n).astype(np.int32))
        starts = np.searchsorted(t, np.arange(B))
        ends = np.append(starts[1:], n)
        got = np.asarray(range_max(vals, jnp.asarray(starts),
                                   jnp.asarray(ends), 0))
        want = np.zeros(B, dtype=np.int32)
        v = np.asarray(vals)
        for j in range(B):
            if starts[j] < ends[j]:
                want[j] = v[starts[j]:ends[j]].max()
        np.testing.assert_array_equal(got, want)


def test_range_max_edge_cases():
    from rmi_tpu.utils.segments import range_max
    v = jnp.asarray(np.asarray([5, 3, 9, 1], dtype=np.int32))
    got = np.asarray(range_max(v, jnp.asarray([0, 2, 4]),
                               jnp.asarray([2, 2, 4]), -1))
    np.testing.assert_array_equal(got, [5, -1, -1])
