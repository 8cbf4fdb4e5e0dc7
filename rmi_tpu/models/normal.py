"""Normal-CDF models: normal and lognormal (normal.rs:28-202).

Parameters are (mean, stdev, scale) where scale = max target value and
stdev is the BIASED standard deviation (divide by n, normal.rs:46-47).
Prediction runs the logistic approximation of the normal CDF:
phi(x) = 1 / (1 + exp1(-1.65451 x)) (normal.rs:24-26), with the same
exp1 as loglinear so artifacts are bit-compatible with the reference's
generated code.

lognormal quirk (kept): TRAINING uses ln(x) with non-finite logs mapped
to 0 (normal.rs:58-68), but PREDICTION uses max(ln x, 0)
(normal.rs:163-167).

Since FixDups targets are non-decreasing over the sorted array, the
per-leaf "max target" is just the last target of the leaf's augmented
range — no reduction needed.
"""

from __future__ import annotations

import jax.numpy as jnp

from rmi_tpu.models.base import ModelDef, Restriction, register
from rmi_tpu.models.linear import exp1, _whole_array_spans
from rmi_tpu.utils import segments as seg


def phi(v):
    return 1.0 / (1.0 + exp1(-1.65451 * v))


def _ncdf_ranges(xf, yf, spans, pallas_span=None):
    """[B, 3] (mean, stdev, scale) per leaf.

    Empty containers reproduce the reference exactly (normal.rs:28-50
    with n=0): mean stays 0.0, stdev = 0/0 = NaN, scale = -inf.

    With ``pallas_span`` the second moment runs through the Pallas
    window-select + blocked range sums (the same fast path the linear
    family uses) instead of emulated-f64 cumsums; returns a dict with
    the kernel overflow flag then.
    """
    cnt = seg.aug_count(spans)
    ovf = None
    if pallas_span is not None and spans.B > 1:
        sx = seg.range_sum_blocked(xf, spans.aug_starts, spans.aug_ends)
        mean = jnp.where(cnt == 0, 0.0, sx / jnp.maximum(cnt, 1.0))
        ss, _, ovf = seg.aug_centered_moments_pallas(
            spans, xf, xf, mean, mean, span=pallas_span)
    else:
        sx = seg.aug_sum(spans, xf)
        mean = jnp.where(cnt == 0, 0.0, sx / jnp.maximum(cnt, 1.0))
        ss = seg.aug_centered_dot(spans, xf, xf, mean, mean)
    stdev = jnp.sqrt(jnp.where(cnt == 0, jnp.nan,
                               jnp.maximum(ss, 0.0) / jnp.maximum(cnt, 1.0)))
    last = jnp.clip(spans.aug_ends - 1, 0, max(spans.n - 1, 0))
    scale = jnp.where(cnt == 0, -jnp.inf, yf[last])
    w = jnp.stack([mean, stdev, scale], axis=-1)
    return {"w": w, "ovf": ovf} if ovf is not None else w


def _normal_predict(params, leaf_idx, keys_f):
    if isinstance(params, dict):
        params = params["w"]
    if leaf_idx is None:
        mean, stdev, scale = params[0, 0], params[0, 1], params[0, 2]
    else:
        from rmi_tpu.utils.segments import iso_take
        mean = iso_take(params[:, 0], leaf_idx)
        stdev = iso_take(params[:, 1], leaf_idx)
        scale = iso_take(params[:, 2], leaf_idx)
    return phi((keys_f - mean) / stdev) * scale


def _normal_fit_top(keys_f, ys_f, ep_ys_f, n, **_):
    return _ncdf_ranges(keys_f, ys_f, _whole_array_spans(n))


def _normal_fit_leaves(xf, yf, spans, keys_f, xf_raw=None,
                       pallas_span=None):
    return _ncdf_ranges(xf, yf, spans, pallas_span=pallas_span)


register(ModelDef(
    name="normal", ppm=3, restriction=Restriction.NONE,
    needs_bounds_check=True, output_int=False, leaf_capable=True,
    fit_top=_normal_fit_top, fit_leaves=_normal_fit_leaves,
    predict=_normal_predict, constant_params=None,
    bytes_per_model=24, function_name="ncdf"))


def _ln_or_zero(xf):
    ln = jnp.log(xf)
    return jnp.where(jnp.isfinite(ln), ln, 0.0)


def _lognormal_fit_top(keys_f, ys_f, ep_ys_f, n, **_):
    return _ncdf_ranges(_ln_or_zero(keys_f), ys_f, _whole_array_spans(n))


def _lognormal_fit_leaves(xf, yf, spans, keys_f, xf_raw=None,
                          pallas_span=None):
    return _ncdf_ranges(_ln_or_zero(xf), yf, spans,
                        pallas_span=pallas_span)


def _lognormal_predict(params, leaf_idx, keys_f):
    if isinstance(params, dict):
        params = params["w"]
    if leaf_idx is None:
        mean, stdev, scale = params[0, 0], params[0, 1], params[0, 2]
    else:
        from rmi_tpu.utils.segments import iso_take
        mean = iso_take(params[:, 0], leaf_idx)
        stdev = iso_take(params[:, 1], leaf_idx)
        scale = iso_take(params[:, 2], leaf_idx)
    # fmax(0.0, log(inp)) — Rust f64::max maps NaN to 0.0 (normal.rs:166)
    raw = jnp.log(keys_f)
    lnx = jnp.where(jnp.isnan(raw), 0.0, jnp.maximum(raw, 0.0))
    return phi((lnx - mean) / stdev) * scale


register(ModelDef(
    name="lognormal", ppm=3, restriction=Restriction.NONE,
    needs_bounds_check=True, output_int=False, leaf_capable=True,
    fit_top=_lognormal_fit_top, fit_leaves=_lognormal_fit_leaves,
    predict=_lognormal_predict, constant_params=None,
    bytes_per_model=24, function_name="lncdf", input_domain="raw"))
