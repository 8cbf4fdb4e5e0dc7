"""Monotone cubic spline model (cubic_spline.rs:18-192).

Fit: Hermite cubic through the container's first/last points scaled to
the unit square, with endpoint slopes from the nearest distinct points,
a monotonicity clamp (m1^2 + m2^2 <= 9), closed-form coefficients, and
a fallback to the linear_spline fit whenever that has lower total L1
error over the container (cubic_spline.rs:108-136).

Domain note: fitting and device prediction run in the NORMALIZED key
domain (see rmi_tpu.convert) — the unit-square slopes m1/m2 are
affine-invariant, so they equal the reference's raw-domain values, and
the raw (a,b,c,d) the artifact needs are recomputed on the host from
the exported generator statistics (aux) with the reference's formulas.

Vectorization notes: on the globally sorted key array, "first point
with scaled x > 0" inside a leaf's contiguous range is just the global
upper_bound of the range's first key, and symmetrically for the last —
so the per-leaf nearest-distinct-point searches become two O(B log n)
searchsorted calls instead of per-leaf scans.
"""

from __future__ import annotations

import jax.numpy as jnp

from rmi_tpu.convert import (CUBIC_CASE_CUBIC, CUBIC_CASE_LINEAR,
                             CUBIC_CASE_CONST, CUBIC_CASE_EMPTY)
from rmi_tpu.models.base import ModelDef, Restriction, register
from rmi_tpu.models.linear import spline_from_endpoints, _linear_predict
from rmi_tpu.utils import segments as seg


def cubic_predict(params, leaf_idx, keys_f):
    """Three chained FMAs (cubic_spline.rs:140-150)."""
    if isinstance(params, dict):
        params = params["w"]
    if leaf_idx is None:
        a, b, c, d = (params[0, 0], params[0, 1], params[0, 2], params[0, 3])
    else:
        from rmi_tpu.utils.segments import iso_take
        a = iso_take(params[:, 0], leaf_idx)
        b = iso_take(params[:, 1], leaf_idx)
        c = iso_take(params[:, 2], leaf_idx)
        d = iso_take(params[:, 3], leaf_idx)
    v1 = a * keys_f + b
    v2 = v1 * keys_f + c
    v3 = v2 * keys_f + d
    return v3


def _coeffs(xmin, ymin, xmax, ymax, m1, m2):
    """Closed-form a,b,c,d (cubic_spline.rs:74-99)."""
    span3 = (xmax - xmin) ** 3
    a = (m1 + m2 - 2.0) / span3
    b = -(xmax * (2.0 * m1 + m2 - 3.0) + xmin * (m1 + 2.0 * m2 - 3.0)) / span3
    c = (m1 * xmax ** 2 + m2 * xmin ** 2
         + xmax * xmin * (2.0 * m1 + 2.0 * m2 - 6.0)) / span3
    d = -xmin * (m1 * xmax ** 2 + xmax * xmin * (m2 - 3.0) + xmin ** 2) / span3
    ys = ymax - ymin
    return a * ys, b * ys, c * ys, d * ys + ymin


def _fit_cubic_ranges(xf, yf, spans, keys_f, xf_raw, ep_yf=None,
                      pallas_span=None):
    """Cubic fit over augmented spans -> dict with normalized-domain
    params 'w' [B,4] plus generator aux for raw-coefficient recovery.

    ``ep_yf`` overrides the y values used for container ENDPOINTS (the
    top-model container's get() bypasses FixDups; leaf containers do
    not) — cubic_spline.rs:38-41 vs models/mod.rs:268-274.
    """
    if ep_yf is None:
        ep_yf = yf
    first, last = seg.aug_first_last(spans)
    cnt = seg.aug_count(spans)

    xmin, ymin = xf[first], ep_yf[first]
    xmax, ymax = xf[last], ep_yf[last]
    degenerate = xmin == xmax          # all duplicates / single point

    n = spans.n
    # first element of the range with x > xmin (cubic_spline.rs:46-54):
    # global upper_bound of xmin, clipped into the range.  hier_count
    # replaces searchsorted's log2(n) dependent-gather loop with a
    # 128-fan ladder of full-lane row counts (segments.py).
    i1 = jnp.clip(seg.hier_count(keys_f, xmin, strict=False), 0, n - 1)
    # last element with x < xmax (cubic_spline.rs:56-65): global
    # lower_bound of xmax minus one.
    i2 = jnp.clip(seg.hier_count(keys_f, xmax, strict=True) - 1, 0, n - 1)

    safe_span = jnp.where(degenerate, 1.0, xmax - xmin)
    safe_yspan = jnp.where(ymax == ymin, 1.0, ymax - ymin)
    sxn = (xf[i1] - xmin) / safe_span
    syn = (yf[i1] - ymin) / safe_yspan
    sxp = (xf[i2] - xmin) / safe_span
    syp = (yf[i2] - ymin) / safe_yspan

    m1 = syn / jnp.where(sxn == 0.0, 1.0, sxn)
    m2 = (1.0 - syp) / jnp.where(sxp == 1.0, 1.0, 1.0 - sxp)

    # monotonicity clamp (cubic_spline.rs:67-72)
    norm2 = m1 * m1 + m2 * m2
    tau = jnp.where(norm2 > 9.0, 3.0 / jnp.sqrt(jnp.maximum(norm2, 1e-300)),
                    1.0)
    m1, m2 = m1 * tau, m2 * tau

    a, b, c, d = _coeffs(xmin, ymin, xmax, ymax, m1, m2)

    # special cases (cubic_spline.rs:19-36): empty -> (0,0,1,0);
    # single point or all duplicates -> constant (0,0,0,y).
    empty = cnt == 0
    const_case = (~empty) & ((cnt == 1) | degenerate)
    a = jnp.where(empty | const_case, 0.0, a)
    b = jnp.where(empty | const_case, 0.0, b)
    c = jnp.where(empty, 1.0, jnp.where(const_case, 0.0, c))
    d = jnp.where(empty, 0.0, jnp.where(const_case, ep_yf[first], d))
    cubic_params = jnp.stack([a, b, c, d], axis=-1)

    # L1 comparison against linear_spline over the same container
    # (cubic_spline.rs:113-135); comparison y values are the FixDups
    # iter values even at the top (iter_model_input).
    ls_a, ls_b = spline_from_endpoints(xmin, ep_yf[first], xmax, ep_yf[last],
                                       cnt)
    lin_params = jnp.stack([ls_a, ls_b], axis=-1)

    ovf = None
    if pallas_span is not None and spans.B > 1:
        # Pallas fit path: select the candidate params per key via the
        # window kernel (f32 pairs, exact to 2^-48 — only the L1
        # COMPARISON uses them; the fitted params stay exact f64), eval
        # in fast XLA f64 elementwise, reduce with blocked range sums.
        # Replaces the ~55ns/key per-key param gathers of _abs_err_sum.
        from rmi_tpu.ops.select_kernel import window_select
        from rmi_tpu.utils.segments import range_sum_blocked
        chans = [a, b, c, d, ls_a, ls_b]
        if n > _L1_CHUNK:
            # 200M-scale: selecting 6 param channels for every key at
            # once materializes ~6 n-sized f64 arrays (~10GB at 200M,
            # the round-4 family-table OOM); sweep the key axis in
            # fixed chunks instead.  Small n keeps the one-shot path so
            # the f64 summation order (and oracle-parity artifacts) is
            # unchanged where it is tested.
            c_err, l_err, ovf = _l1_interior_chunked(
                spans.t, xf, yf, chans, B=spans.B, span=pallas_span)
        else:
            sel, ovf = window_select(spans.t, chans, B=spans.B,
                                     span=pallas_span)
            ca, cb_, cc, cd, la, lb = sel
            pred_c = ((ca * xf + cb_) * xf + cc) * xf + cd
            pred_l = lb * xf + la
            dc = jnp.abs(pred_c - yf)
            dl = jnp.abs(pred_l - yf)
            c_err = range_sum_blocked(dc, spans.starts, spans.ends)
            l_err = range_sum_blocked(dl, spans.starts, spans.ends)
        leaf_ids = jnp.arange(spans.B)
        ip = jnp.clip(spans.starts - 1, 0, spans.n - 1)
        inx = jnp.clip(spans.ends, 0, spans.n - 1)
        c_err = c_err + jnp.where(
            spans.has_prev,
            jnp.abs(cubic_predict(cubic_params, leaf_ids, xf[ip])
                    - yf[ip]), 0.0)
        c_err = c_err + jnp.where(
            spans.has_next,
            jnp.abs(cubic_predict(cubic_params, leaf_ids, xf[inx])
                    - yf[inx]), 0.0)
        l_err = l_err + jnp.where(
            spans.has_prev,
            jnp.abs(_linear_predict(lin_params, leaf_ids, xf[ip])
                    - yf[ip]), 0.0)
        l_err = l_err + jnp.where(
            spans.has_next,
            jnp.abs(_linear_predict(lin_params, leaf_ids, xf[inx])
                    - yf[inx]), 0.0)
    else:
        c_err = _abs_err_sum(cubic_params, cubic_predict, xf, yf, spans)
        l_err = _abs_err_sum(lin_params, _linear_predict, xf, yf, spans)

    lin_as_cubic = jnp.stack(
        [jnp.zeros_like(ls_a), jnp.zeros_like(ls_a), ls_b, ls_a], axis=-1)
    use_lin = (l_err < c_err) & ~empty
    w = jnp.where(use_lin[:, None], lin_as_cubic, cubic_params)

    case = jnp.full(cnt.shape, CUBIC_CASE_CUBIC, dtype=jnp.int32)
    case = jnp.where(use_lin, CUBIC_CASE_LINEAR, case)
    case = jnp.where(const_case, CUBIC_CASE_CONST, case)
    case = jnp.where(empty, CUBIC_CASE_EMPTY, case)

    xr = xf if xf_raw is None else xf_raw
    aux = {
        "xmin": xr[first], "xmax": xr[last],
        "ymin": ep_yf[first], "ymax": ep_yf[last],
        "m1": m1, "m2": m2, "case": case,
    }
    out = {"w": w, "aux": aux}
    if ovf is not None:
        out["ovf"] = ovf
    return out


# Chunk width for the large-n L1 comparison sweep: 2^25 keys keeps the
# per-chunk selected-channel footprint at ~6 x 268MB while the full
# arrays (xf, yf, t) stay resident once.
_L1_CHUNK = 1 << 25


def _chunk_leaf_ranges(t, B: int):
    """Per-leaf interior spans derived from the sorted leaf-id vector:
    {i : t[i] == j} == [starts[j], ends[j])."""
    starts = jnp.searchsorted(t, jnp.arange(B, dtype=t.dtype),
                              side="left")
    ends = jnp.concatenate(
        [starts[1:], jnp.full((1,), t.shape[0], starts.dtype)])
    return starts, ends


def _l1_interior_chunked(t, xf, yf, channels, *, B: int, span: int,
                         chunk: int = None):
    """Per-leaf interior |pred - y| sums for the cubic-vs-linear_spline
    comparison, swept over the key axis in fixed-size chunks.

    The augmented-span interior [starts[j], ends[j]) is exactly
    {i : t[i] == j}, so each chunk contributes the range sum over the
    leaf's span CLIPPED to the chunk — computed with the blocked
    partial-sum solver (segments.range_sum_blocked).  A scatter-based
    segment_sum here costs ~1s/2^25-chunk on TPU (the 38s cubic-leaf
    builds of FAMILIES_200M round 4); the blocked range sums are pure
    reductions + tiny row gathers.  The tail chunk is clamped to
    [n - chunk, n) with already-counted elements excluded by the range
    lower bound.
    """
    from jax import lax
    from rmi_tpu.ops.select_kernel import window_select
    from rmi_tpu.utils.segments import range_sum_blocked

    if chunk is None:
        chunk = _L1_CHUNK          # read at call time (testable)
    n = t.shape[0]
    nchunks = -(-n // chunk)
    starts, ends = _chunk_leaf_ranges(t, B)

    def body(ci, acc):
        c_acc, l_acc, ovf_acc = acc
        start = jnp.minimum(ci * chunk, n - chunk)
        fresh0 = ci * chunk            # first index not yet counted
        tc = lax.dynamic_slice(t, (start,), (chunk,))
        xc = lax.dynamic_slice(xf, (start,), (chunk,))
        yc = lax.dynamic_slice(yf, (start,), (chunk,))
        sel, ovf_c = window_select(tc, channels, B=B, span=span)
        ca, cb_, cc_, cd, la, lb = sel
        pred_c = ((ca * xc + cb_) * xc + cc_) * xc + cd
        pred_l = lb * xc + la
        dc = jnp.abs(pred_c - yc)
        dl = jnp.abs(pred_l - yc)
        lo = jnp.clip(starts - start, fresh0 - start, chunk)
        hi = jnp.clip(ends - start, fresh0 - start, chunk)
        hi = jnp.maximum(hi, lo)
        ce = range_sum_blocked(dc, lo, hi)
        le = range_sum_blocked(dl, lo, hi)
        return (c_acc + ce, l_acc + le,
                jnp.maximum(ovf_acc, ovf_c.astype(jnp.int32)))

    z = jnp.zeros((B,), jnp.float64)
    c_err, l_err, ovf = lax.fori_loop(
        0, nchunks, body, (z, z, jnp.zeros((), jnp.int32)))
    return c_err, l_err, ovf


def _abs_err_interior_chunked(params, predict, xf, yf, t, *, B: int,
                              chunk: int = None):
    """Chunked twin of the _abs_err_sum interior (gather-based
    candidate predictions) for n > _L1_CHUNK; per-chunk clipped range
    sums for the same scatter-avoidance reason as
    _l1_interior_chunked."""
    from jax import lax
    from rmi_tpu.utils.segments import range_sum_blocked

    if chunk is None:
        chunk = _L1_CHUNK          # read at call time (testable)
    n = t.shape[0]
    nchunks = -(-n // chunk)
    starts, ends = _chunk_leaf_ranges(t, B)

    def body(ci, acc):
        start = jnp.minimum(ci * chunk, n - chunk)
        fresh0 = ci * chunk
        tc = lax.dynamic_slice(t, (start,), (chunk,))
        xc = lax.dynamic_slice(xf, (start,), (chunk,))
        yc = lax.dynamic_slice(yf, (start,), (chunk,))
        d = jnp.abs(predict(params, tc, xc) - yc)
        lo = jnp.clip(starts - start, fresh0 - start, chunk)
        hi = jnp.clip(ends - start, fresh0 - start, chunk)
        hi = jnp.maximum(hi, lo)
        return acc + range_sum_blocked(d, lo, hi)

    return lax.fori_loop(0, nchunks, body, jnp.zeros((B,), jnp.float64))


def _abs_err_sum(params, predict, xf, yf, spans):
    """Per-leaf sum of |pred - y| over augmented spans."""
    t_idx = None if spans.B == 1 else spans.t
    if t_idx is not None and spans.n > _L1_CHUNK:
        # large-n: per-key param gathers + predictions materialize
        # several n-sized f64 arrays; sweep in chunks (the interior of
        # an augmented span [starts, ends) is exactly {i: t[i] == j})
        interior = _abs_err_interior_chunked(params, predict, xf, yf,
                                             spans.t, B=spans.B)
    else:
        d = jnp.abs(predict(params, t_idx, xf) - yf)
        interior = seg.range_sum(d, spans.starts, spans.ends)

    # edge elements: evaluate leaf j's model at elements starts[j]-1 and
    # ends[j].
    leaf_ids = jnp.arange(spans.B)
    ip = jnp.clip(spans.starts - 1, 0, spans.n - 1)
    inx = jnp.clip(spans.ends, 0, spans.n - 1)
    prev_term = jnp.where(
        spans.has_prev,
        jnp.abs(predict(params, leaf_ids, xf[ip]) - yf[ip]), 0.0)
    next_term = jnp.where(
        spans.has_next,
        jnp.abs(predict(params, leaf_ids, xf[inx]) - yf[inx]), 0.0)
    return interior + prev_term + next_term


def _cubic_fit_top(keys_f, ys_f, ep_ys_f, n, xf_raw=None, **_):
    spans = _top_spans(n)
    return _fit_cubic_ranges(keys_f, ys_f, spans, keys_f, xf_raw,
                             ep_yf=ep_ys_f)


def _top_spans(n):
    from rmi_tpu.models.linear import _whole_array_spans
    return _whole_array_spans(n)


def _cubic_fit_leaves(xf, yf, spans, keys_f, xf_raw=None,
                      pallas_span=None):
    return _fit_cubic_ranges(xf, yf, spans, keys_f, xf_raw,
                             pallas_span=pallas_span)


def _const_cubic(value_f):
    """set_to_constant_model => (0,0,0,c) (cubic_spline.rs:188-191)."""
    z = jnp.zeros_like(value_f)
    return jnp.stack([z, z, z, value_f], axis=-1)


register(ModelDef(
    name="cubic", ppm=4, restriction=Restriction.NONE,
    needs_bounds_check=False,   # cubic_spline.rs:184-186
    output_int=False, leaf_capable=True,
    fit_top=_cubic_fit_top, fit_leaves=_cubic_fit_leaves,
    predict=cubic_predict, constant_params=_const_cubic,
    bytes_per_model=32, function_name="cubic"))
