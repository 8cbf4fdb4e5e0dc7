"""Linear-family models: linear, robust_linear, loglinear, linear_spline.

Behavioral contract from the reference:
  * simple least squares ``slr`` with 0/1-item and zero-variance special
    cases (linear.rs:12-59);
  * robust_linear trims max(1, 0.01% * n) items from each end
    (linear.rs:238-260);
  * loglinear regresses on (x, ln y), dropping non-finite logs, and
    predicts through the ``exp1`` approximation (linear.rs:61-72,
    156-166);
  * linear_spline is the line through the container's first and last
    points with all-duplicate / tiny-container fallbacks
    (linear_spline.rs:13-35).

The batched fits compute per-leaf two-pass centered moments over the
augmented spans — numerically equivalent to the reference's Welford
accumulation but expressed as prefix sums (see utils/segments.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from rmi_tpu.models.base import ModelDef, Restriction, register
from rmi_tpu.utils import segments as seg


def exp1(v):
    """(1 + v/64)^64 — the reference's shared EXP1 approximation
    (linear.rs:156-166, stdlib.rs:17-33)."""
    x = 1.0 + v / 64.0
    x = x * x
    x = x * x
    x = x * x
    x = x * x
    x = x * x
    x = x * x
    return x


# ---------------------------------------------------------------------------
# Batched segmented SLR
# ---------------------------------------------------------------------------

def _slr_ranges(xf, yf, spans, weights=None, trim=0, pallas_span=None):
    """Per-leaf (alpha, beta) least-squares over augmented spans.

    ``weights`` (0/1 per element) drop items (loglinear); ``trim``
    selects robust_linear's trimmed interior instead of the augmented
    span.  Returns ([B, 2] f64, ovf-or-None); ``ovf`` is the Pallas
    window-overflow scalar when ``pallas_span`` selects the kernel
    fast path (None otherwise).
    """
    if trim:
        # robust_linear iterates data.iter().skip(bnd).take(len-2*bnd)
        # over the container (linear.rs:250-252); bnd depends on the
        # container length (linear.rs:247).
        total = (spans.aug_ends - spans.aug_starts)
        bnd = jnp.maximum(
            jnp.int64(1),
            (total.astype(jnp.float64) * 1e-4).astype(jnp.int64))
        lo = spans.aug_starts + bnd
        hi = jnp.maximum(spans.aug_ends - bnd, lo)
        # The reference asserts 2*bnd+1 < len and would abort on tiny
        # containers (linear.rs:248); we fall back to the untrimmed span
        # there so small leaves still train (documented divergence).
        ok = (2 * bnd + 1) < total
        lo = jnp.where(ok, lo, spans.aug_starts)
        hi = jnp.where(ok, hi, spans.aug_ends)
        use = seg.Spans(t=spans.t, starts=lo, ends=hi,
                        aug_starts=lo, aug_ends=hi,
                        nonempty=lo < hi,
                        has_prev=jnp.zeros_like(spans.has_prev),
                        has_next=jnp.zeros_like(spans.has_next),
                        n=spans.n, B=spans.B)
    else:
        use = spans

    ovf = None
    use_kernel = pallas_span is not None and use.B > 1
    if weights is None:
        if use_kernel:
            # Pallas fit path: blocked sums, no emulated-f64 cumsums
            cx = cy = None
            sx = seg.range_sum_blocked(xf, use.aug_starts, use.aug_ends)
            sy = seg.range_sum_blocked(yf, use.aug_starts, use.aug_ends)
        else:
            # whole-array (top) fits skip the O(n) prefix sums entirely
            # — range_sum reduces directly for single spans
            cx = seg.prefix_sum_exclusive(xf) if use.B > 1 else None
            cy = seg.prefix_sum_exclusive(yf) if use.B > 1 else None
            sx = seg.range_sum(xf, use.aug_starts, use.aug_ends, cx)
            sy = seg.range_sum(yf, use.aug_starts, use.aug_ends, cy)
        cnt = seg.aug_count(use)
    elif use_kernel:
        cnt, sx = seg.aug_masked_stats_blocked(use, xf, weights)
        _, sy = seg.aug_masked_stats_blocked(use, yf, weights)
    else:
        cnt, sx = seg.aug_masked_stats(use, xf, weights)
        _, sy = seg.aug_masked_stats(use, yf, weights)

    safe_cnt = jnp.maximum(cnt, 1.0)
    mean_x = sx / safe_cnt
    mean_y = sy / safe_cnt

    if use_kernel:
        m2, c, ovf = seg.aug_centered_moments_pallas(
            use, xf, yf, mean_x, mean_y, span=pallas_span,
            weights=weights)
    elif weights is None and use.B > 1:
        m2, c = seg.aug_centered_moments_expanded(use, xf, yf, mean_x,
                                                  mean_y, cx, cy)
    else:
        m2, c = seg.aug_centered_moments(use, xf, yf, mean_x, mean_y,
                                         weights)

    return _slr_from_moments(cnt, mean_x, mean_y, m2, c), ovf


def _slr_from_moments(cnt, mean_x, mean_y, m2, c):
    """(alpha, beta) from per-leaf count/means/centered moments with the
    reference's degenerate cases (linear.rs:37-55)."""
    # beta = cov/var; the (n-1) normalizations cancel (linear.rs:46-55).
    var_zero = m2 <= 0.0
    beta = jnp.where(var_zero, 0.0, c / jnp.where(var_zero, 1.0, m2))
    alpha = mean_y - beta * mean_x

    # 0 items -> (0, 0); 1 item -> (mean_y, 0); var==0 -> (mean_y, 0)
    # (linear.rs:37-53).
    alpha = jnp.where(cnt == 0, 0.0,
                      jnp.where((cnt == 1) | var_zero, mean_y, alpha))
    beta = jnp.where((cnt <= 1) | var_zero, 0.0, beta)
    return jnp.stack([alpha, beta], axis=-1)


def _whole_array_spans(n):
    """A 1-leaf Spans covering the entire array (top-model fits)."""
    z = jnp.zeros((1,), dtype=jnp.int64)
    return seg.Spans(
        t=jnp.zeros((n,), dtype=jnp.int32),
        starts=z, ends=jnp.full((1,), n, dtype=jnp.int64),
        aug_starts=z, aug_ends=jnp.full((1,), n, dtype=jnp.int64),
        nonempty=jnp.ones((1,), dtype=bool),
        has_prev=jnp.zeros((1,), dtype=bool),
        has_next=jnp.zeros((1,), dtype=bool),
        n=n, B=1)


def _linear_predict(params, leaf_idx, keys_f):
    """fma(beta, x, alpha) (linear.rs:87-90)."""
    if isinstance(params, dict):
        params = params["w"]
    if leaf_idx is None:
        alpha, beta = params[0, 0], params[0, 1]
    else:
        # column-wise 1-D gathers: an [n, ppm] gather output would be
        # lane-padded ppm->128 by TPU tiling
        from rmi_tpu.utils.segments import iso_take
        alpha = iso_take(params[:, 0], leaf_idx)
        beta = iso_take(params[:, 1], leaf_idx)
    return beta * keys_f + alpha


def _linear_fit_top(keys_f, ys_f, ep_ys_f, n, **_):
    return _slr_ranges(keys_f, ys_f, _whole_array_spans(n))[0]


def _linear_fit_leaves(xf, yf, spans, keys_f, xf_raw=None,
                       pallas_span=None):
    w, ovf = _slr_ranges(xf, yf, spans, pallas_span=pallas_span)
    return {"w": w, "ovf": ovf} if ovf is not None else w


def _robust_fit_top(keys_f, ys_f, ep_ys_f, n, **_):
    return _slr_ranges(keys_f, ys_f, _whole_array_spans(n), trim=1)[0]


def _robust_fit_leaves(xf, yf, spans, keys_f, xf_raw=None,
                       pallas_span=None):
    w, ovf = _slr_ranges(xf, yf, spans, trim=1, pallas_span=pallas_span)
    return {"w": w, "ovf": ovf} if ovf is not None else w


def _const_linear(value_f):
    """set_to_constant_model => (c, 0) (linear.rs:116-119)."""
    return jnp.stack([value_f, jnp.zeros_like(value_f)], axis=-1)


register(ModelDef(
    name="linear", ppm=2, restriction=Restriction.NONE,
    needs_bounds_check=True, output_int=False, leaf_capable=True,
    fit_top=_linear_fit_top, fit_leaves=_linear_fit_leaves,
    predict=_linear_predict, constant_params=_const_linear,
    bytes_per_model=16, function_name="linear"))

register(ModelDef(
    name="robust_linear", ppm=2, restriction=Restriction.NONE,
    needs_bounds_check=True, output_int=False, leaf_capable=True,
    fit_top=_robust_fit_top, fit_leaves=_robust_fit_leaves,
    predict=_linear_predict, constant_params=_const_linear,
    bytes_per_model=16, function_name="linear"))


# ---------------------------------------------------------------------------
# loglinear
# ---------------------------------------------------------------------------

def _log_targets(yf):
    ln = jnp.log(yf)
    keep = jnp.isfinite(ln)
    return jnp.where(keep, ln, 0.0), keep.astype(jnp.float64)


# Chunk width for the large-n masked leaf fit: loglinear leaves need
# ln(y) and a finite-mask weight per element; materializing those [n]
# f64 arrays plus the window-moments df64 pairs exhausts the 16GB
# device at 200M keys (the round-4 family-table gap).  Above this
# threshold the fit sweeps the key axis in fixed chunks, recomputing
# ln/weights per chunk so no n-sized log/weight array ever exists.
_MASKED_FIT_CHUNK = 1 << 25


def _masked_slr_chunked(xf, y_raw, spans, chunk: int = None):
    """Per-leaf (alpha, beta) of the x vs ln(y) regression, swept over
    the key axis in fixed-size chunks (two chunked passes: masked
    count/sums, then centered moments).

    The augmented-span interior [starts[j], ends[j]) is exactly
    {i : t[i] == j}, so each chunk contributes the blocked range sum
    over the leaf's span CLIPPED to the chunk (a scatter-based
    segment_sum here costs ~1s/2^25-chunk on TPU — the same class as
    the 38s cubic-leaf L1 sweep of FAMILIES_200M round 4); the
    at-most-two overlap elements per leaf (starts[j]-1 when has_prev,
    ends[j] when has_next — the reference's spilled neighbor points,
    two_layer.rs:52-82) are added with O(B) direct gathers.  Drop
    semantics match _log_targets: elements whose ln(y) is non-finite
    get weight 0 (linear.rs:63-67).
    """
    from jax import lax
    from rmi_tpu.utils.segments import range_sum_blocked

    if chunk is None:
        chunk = _MASKED_FIT_CHUNK      # read at call time (testable)
    n = xf.shape[0]
    # dynamic_slice below is sized `chunk`, so the chunk can never
    # exceed the array (a direct call with chunk > n would otherwise
    # fail at trace time and make `n - chunk` negative)
    chunk = min(chunk, n)
    B = spans.B
    nchunks = -(-n // chunk)

    def chunk_views(ci):
        start = jnp.minimum(ci * chunk, n - chunk)
        xc = lax.dynamic_slice(xf, (start,), (chunk,))
        yc = lax.dynamic_slice(y_raw, (start,), (chunk,))
        tc = lax.dynamic_slice(spans.t, (start,), (chunk,))
        ln = jnp.log(yc)
        keep = jnp.isfinite(ln)
        w = keep.astype(jnp.float64)
        # already-counted tail-chunk elements are excluded by the range
        # lower bound below, not by a mask
        lo = jnp.clip(spans.starts - start, ci * chunk - start, chunk)
        hi = jnp.clip(spans.ends - start, ci * chunk - start, chunk)
        hi = jnp.maximum(hi, lo)
        return xc, jnp.where(keep, ln, 0.0), tc, w, lo, hi

    def edge_vals(idx, present):
        i = jnp.clip(idx, 0, n - 1)
        ln = jnp.log(y_raw[i])
        keep = jnp.isfinite(ln) & present
        return (xf[i], jnp.where(keep, ln, 0.0),
                keep.astype(jnp.float64))

    exp_, lnp, wp = edge_vals(spans.starts - 1, spans.has_prev)
    exn, lnn, wn = edge_vals(spans.ends, spans.has_next)

    def body1(ci, acc):
        cnt_a, sx_a, sy_a = acc
        xc, lnc, tc, w, lo, hi = chunk_views(ci)
        return (cnt_a + range_sum_blocked(w, lo, hi),
                sx_a + range_sum_blocked(w * xc, lo, hi),
                # lnc is 0 where dropped
                sy_a + range_sum_blocked(lnc, lo, hi))

    z = jnp.zeros((B,), jnp.float64)
    cnt, sx, sy = lax.fori_loop(0, nchunks, body1, (z, z, z))
    cnt = cnt + wp + wn
    sx = sx + wp * exp_ + wn * exn
    sy = sy + lnp + lnn

    safe_cnt = jnp.maximum(cnt, 1.0)
    mean_x = sx / safe_cnt
    mean_y = sy / safe_cnt

    def body2(ci, acc):
        m2_a, c_a = acc
        xc, lnc, tc, w, lo, hi = chunk_views(ci)
        dx = (xc - mean_x[tc]) * w
        dy = (lnc - mean_y[tc]) * w
        return (m2_a + range_sum_blocked(dx * dx, lo, hi),
                c_a + range_sum_blocked(dx * dy, lo, hi))

    m2, c = lax.fori_loop(0, nchunks, body2, (z, z))
    dxp = (exp_ - mean_x) * wp
    dxn = (exn - mean_x) * wn
    m2 = m2 + dxp * dxp + dxn * dxn
    c = c + dxp * (lnp - mean_y * wp) + dxn * (lnn - mean_y * wn)
    return _slr_from_moments(cnt, mean_x, mean_y, m2, c)


def _loglinear_fit_top(keys_f, ys_f, ep_ys_f, n, **_):
    ln, w = _log_targets(ys_f)
    return _slr_ranges(keys_f, ln, _whole_array_spans(n), weights=w)[0]


def _loglinear_fit_leaves(xf, yf, spans, keys_f, xf_raw=None,
                          pallas_span=None):
    if xf.shape[0] > _MASKED_FIT_CHUNK and spans.B > 1:
        # 200M-scale: never materialize [n] ln/weight arrays.  This
        # path intentionally bypasses the Pallas fit kernel
        # (pallas_span): the chunked sweep is already memory-shaped,
        # and with no windowed kernel there is no overflow flag to
        # report (callers default a missing "ovf" to 0, which is
        # correct here).
        return _masked_slr_chunked(xf, yf, spans)
    ln, w = _log_targets(yf)
    params, ovf = _slr_ranges(xf, ln, spans, weights=w,
                              pallas_span=pallas_span)
    return {"w": params, "ovf": ovf} if ovf is not None else params


def _loglinear_predict(params, leaf_idx, keys_f):
    """exp1(fma(beta, x, alpha)) (linear.rs:177-180)."""
    return exp1(_linear_predict(params, leaf_idx, keys_f))


register(ModelDef(
    name="loglinear", ppm=2, restriction=Restriction.NONE,
    needs_bounds_check=True, output_int=False, leaf_capable=True,
    fit_top=_loglinear_fit_top, fit_leaves=_loglinear_fit_leaves,
    predict=_loglinear_predict, constant_params=None,
    bytes_per_model=16, function_name="loglinear"))


# ---------------------------------------------------------------------------
# linear_spline
# ---------------------------------------------------------------------------

def spline_from_endpoints(x0, y0, x1, y1, cnt):
    """(intercept, slope) through two points with the reference's
    fallbacks (linear_spline.rs:13-35): len==0 -> (0,0); len==1 ->
    (y0, 0); all-duplicates (x0==x1) -> (y0, 0)."""
    degenerate = (x0 == x1)
    dx = jnp.where(degenerate, 1.0, x0 - x1)
    slope = jnp.where(degenerate, 0.0, (y0 - y1) / dx)
    intercept = y0 - slope * x0
    intercept = jnp.where(cnt == 0, 0.0,
                          jnp.where((cnt == 1) | degenerate, y0, intercept))
    slope = jnp.where((cnt <= 1) | degenerate, 0.0, slope)
    return intercept, slope


def _linear_spline_fit_top(keys_f, ys_f, ep_ys_f, n, **_):
    # Container endpoints use RMITrainingData::get => raw (non-FixDups)
    # offsets (models/mod.rs:268-274), hence ep_ys_f.
    x0, y0 = keys_f[0], ep_ys_f[0]
    x1, y1 = keys_f[n - 1], ep_ys_f[n - 1]
    a, b = spline_from_endpoints(x0, y0, x1, y1, jnp.float64(n))
    return jnp.stack([a, b]).reshape(1, 2)


def _linear_spline_fit_leaves(xf, yf, spans, keys_f, xf_raw=None,
                              pallas_span=None):
    first, last = seg.aug_first_last(spans)
    cnt = seg.aug_count(spans)
    a, b = spline_from_endpoints(xf[first], yf[first], xf[last], yf[last],
                                 cnt)
    return jnp.stack([a, b], axis=-1)


register(ModelDef(
    name="linear_spline", ppm=2, restriction=Restriction.NONE,
    needs_bounds_check=True, output_int=False, leaf_capable=True,
    fit_top=_linear_spline_fit_top, fit_leaves=_linear_spline_fit_leaves,
    predict=_linear_predict, constant_params=_const_linear,
    bytes_per_model=16, function_name="linear"))
