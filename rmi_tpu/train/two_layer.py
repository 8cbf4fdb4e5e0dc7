"""Two-layer RMI training as a single fused device program.

This is the TPU-native re-design of train_two_layer (two_layer.rs:101-
306).  The reference makes four sequential streaming passes over the
sorted array (top fit, leaf partition+fit, lower-bound correction,
error sweep); here each pass is a batched vector program and the whole
build is one jit-compiled function:

  1. top-model fit on the scaled CDF (two_layer.rs:109-110);
  2. leaf assignment t[k] = min(B-1, top(k)) — non-decreasing, so leaf
     extents are searchsorted spans and every per-leaf fit is a
     prefix-sum range reduction (see utils/segments.py);
  3. batched per-leaf fits over overlap-augmented spans
     (two_layer.rs:52-82 semantics);
  4. lower-bound correction (lower_bound_correction.rs:83-162) via
     cumulative min/max fills and run-length analysis;
  5. empty-leaf constant patching (two_layer.rs:182-202);
  6. error sweep + epsilon probes + duplicate-run inflation
     (two_layer.rs:205-259) and the exact error metrics
     (two_layer.rs:266-287).

Float-key models fit and predict in the NORMALIZED key domain
x' = (x - key_min) * (1 / key_span): per-leaf moments then never form
2^63-scale products, which both tightens f64 accuracy and keeps every
intermediate inside the exponent range of TPU-emulated f64 (f32-pair
arithmetic).  Raw-domain artifact parameters are recovered exactly on
the host (rmi_tpu.convert).

Known divergences from the reference (documented, not observable in
its public behavior): (a) the rayon::join split excludes the single
key at the split index from leaf *training* (two_layer.rs:147-169); we
train on every key, equivalent to its split_idx >= len path; (b) f64
summation order differs (two-pass centered moments vs streaming
Welford), moving individual leaf errors by at most 1 when a floor()
lands on an exact boundary.
"""

from __future__ import annotations

import functools
import sys
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from rmi_tpu import keys as keymod
from rmi_tpu.keys import KeyType
from rmi_tpu.models import get_model, predict_clamped, clamp_int, validate_spec
from rmi_tpu.utils import segments as seg

_F64_EPS = sys.float_info.epsilon


def _scale_targets(yfix_f, sf):
    """map_scale! (models/mod.rs:238-250): targets scaled by
    branching_factor/n and truncated; identity when sf ~= 1."""
    if abs(sf - 1.0) > _F64_EPS:
        return jnp.trunc(yfix_f * sf)
    return yfix_f


def model_float_input(mdef, xn, xraw):
    """The float input a model's fit/predict expects (see
    ModelDef.input_domain)."""
    return xraw if mdef.input_domain == "raw" else xn


def predict_top_assignment(mdef, params, keys, xn, xraw, bound):
    """min(bound, predict_to_int(top(key))) -> int64 (two_layer.rs:49)."""
    if mdef.output_int:
        return clamp_int(mdef.predict(params, None, keys), bound)
    xf = model_float_input(mdef, xn, xraw)
    return predict_clamped(mdef.predict(params, None, xf), bound)


def lower_bound_pieces(spans: seg.Spans, keys, yfix, key_type: KeyType):
    """Vectorized LowerBoundCorrection (lower_bound_correction.rs).

    Returns (next_idx, next_key, prev_key, longest_run):
      next_idx[j]/next_key[j] — index/key of the first key of the first
        non-empty leaf after j, or (n, T::MAX) (rs:30-56);
      prev_key[j] — last key of the last non-empty leaf before j, or 0
        (rs:58-80);
      longest_run[j] — longest duplicate-key run among runs in leaf j,
        excluding the array's final run, which the reference never
        flushes (rs:101-125).
    """
    n, B = spans.n, spans.B
    big = jnp.int64(n + 1)

    first_val = jnp.where(spans.nonempty, spans.starts, big)
    # next[j] = min over j' > j of first_val[j']
    suffix_min = jax.lax.cummin(first_val[::-1])[::-1]
    next_start = jnp.concatenate([suffix_min[1:],
                                  jnp.full((1,), big, jnp.int64)])
    has_next_leaf = next_start < big
    next_idx = jnp.where(has_next_leaf, next_start, n)
    safe = jnp.clip(next_start, 0, max(n - 1, 0))
    next_key = jnp.where(has_next_leaf, keys[safe],
                         jnp.asarray(key_type.max_value,
                                     dtype=keys.dtype))

    last_val = jnp.where(spans.nonempty, spans.ends - 1, jnp.int64(-1))
    prefix_max = jax.lax.cummax(last_val)
    prev_last = jnp.concatenate([jnp.full((1,), -1, jnp.int64),
                                 prefix_max[:-1]])
    has_prev_leaf = prev_last >= 0
    prev_key = jnp.where(has_prev_leaf, keys[jnp.clip(prev_last, 0, None)],
                         jnp.asarray(key_type.zero_value, dtype=keys.dtype))

    # duplicate runs: start/end index of the run containing each key.
    idx = jnp.arange(n, dtype=jnp.int64)
    changed = jnp.concatenate([jnp.ones((1,), bool), keys[1:] != keys[:-1]])
    run_start = jax.lax.cummax(jnp.where(changed, idx, 0))
    ends_run = jnp.concatenate([keys[1:] != keys[:-1],
                                jnp.ones((1,), bool)])
    run_end = jax.lax.cummin(
        jnp.where(ends_run, idx, jnp.int64(n - 1))[::-1])[::-1]
    run_len = run_end - run_start + 1
    # the final run is never recorded (rs:104-125 has no post-loop flush)
    counted = jnp.where(run_end < n - 1, run_len, 0)

    # per-key run lengths are reduced together with the error sweep in
    # one fused segment_max (scatters cost ~30ns/element on TPU)
    return next_idx, next_key, prev_key, counted


def _error_between(pred_i, target_i, n):
    """error_between (two_layer.rs:14-18): clamp both to n, abs diff."""
    a = jnp.minimum(pred_i, n)
    b = jnp.minimum(target_i, n)
    return jnp.abs(a - b)


def _as_dict(params):
    return params if isinstance(params, dict) else {"w": params}


@functools.partial(jax.jit,
                   static_argnames=("top_type", "leaf_type", "B", "key_type"))
def _train_core(keys, yfix, kminf, s, *, top_type: str, leaf_type: str,
                B: int, key_type: KeyType):
    n = keys.shape[0]
    mtop = get_model(top_type)
    mleaf = get_model(leaf_type)

    xraw = keymod.as_float(keys)
    xn = (xraw - kminf) * s
    yfix_f = yfix.astype(jnp.float64)
    sf = float(B) / float(n)   # two_layer.rs:109
    ys_scaled = _scale_targets(yfix_f, sf)
    # RMITrainingData::get bypasses FixDups: raw offsets, scaled.
    ep_ys = _scale_targets(jnp.arange(n, dtype=jnp.float64), sf)

    top_in = model_float_input(mtop, xn, xraw)
    top_params = _as_dict(mtop.fit_top(
        keys_f=top_in, ys_f=ys_scaled, ep_ys_f=ep_ys, n=n, keys=keys,
        B=B, scale=sf, xf_raw=xraw))

    t64 = predict_top_assignment(mtop, top_params, keys, xn, xraw, B - 1)
    t = t64.astype(jnp.int32)
    spans = seg.make_spans(t, B)

    leaf_in = model_float_input(mleaf, xn, xraw)
    leaf_params = _as_dict(mleaf.fit_leaves(leaf_in, yfix_f, spans,
                                            leaf_in, xf_raw=xraw))

    next_idx, next_key, prev_key, run_counted = lower_bound_pieces(
        spans, keys, yfix, key_type)

    # empty-leaf constant patch (two_layer.rs:182-202) — the reference's
    # loop covers 0..B-1 EXCLUSIVE, so the final leaf is never patched.
    if mleaf.constant_params is not None:
        const_rows = mleaf.constant_params(next_idx.astype(jnp.float64))
        patch = (~spans.nonempty) & (jnp.arange(B) < B - 1)
        leaf_params = dict(leaf_params)
        leaf_params["w"] = jnp.where(patch[:, None], const_rows,
                                     leaf_params["w"])
    else:
        patch = jnp.zeros((B,), dtype=bool)

    # error sweep (two_layer.rs:205-217).  Reductions stay 1-D: [n, k]
    # intermediates lane-pad k->128 on TPU and explode memory.
    t_idx = None if B == 1 else t
    pred = predict_clamped(mleaf.predict(leaf_params, t_idx, leaf_in), n)
    err = _error_between(pred, jnp.minimum(yfix, n), n)
    max_err = seg.segment_max_sorted(err, t, B, fill=0,
                                     nonempty=spans.nonempty)
    longest_run = seg.segment_max_sorted(run_counted, t, B, fill=0,
                                         nonempty=spans.nonempty)
    cnt = spans.ends - spans.starts

    # epsilon probes (two_layer.rs:226-259)
    def probe_input(probe_keys):
        pf = keymod.as_float(probe_keys)
        if mleaf.input_domain == "raw":
            return pf
        return (pf - kminf) * s

    leaf_ids = jnp.arange(B)
    up_keys = keymod.minus_epsilon(next_key, key_type)
    pred_up = predict_clamped(
        mleaf.predict(leaf_params, leaf_ids, probe_input(up_keys)), n)
    upper_err = _error_between(pred_up, next_idx + 1, n)

    lo_keys = keymod.plus_epsilon(prev_key, key_type)
    pred_lo = predict_clamped(
        mleaf.predict(leaf_params, leaf_ids, probe_input(lo_keys)), n)
    first_idx = next_idx[jnp.maximum(leaf_ids - 1, 0)]
    lower_err = _error_between(pred_lo, first_idx, n)

    final_err = (jnp.maximum(jnp.maximum(max_err, upper_err), lower_err)
                 + longest_run)

    # metrics (two_layer.rs:266-287)
    nf = jnp.float64(n)
    cnt_f = cnt.astype(jnp.float64)
    err_f = final_err.astype(jnp.float64)
    model_max_error = jnp.max(final_err)
    # Rust max_by_key returns the LAST maximal element.
    model_max_error_idx = (B - 1) - jnp.argmax(final_err[::-1])
    model_avg_error = jnp.sum(cnt_f * err_f) / nf
    model_avg_l2_error = jnp.sum((cnt_f * err_f) ** 2 / nf)
    model_avg_log2_error = jnp.sum(
        cnt_f * jnp.log2(2.0 * err_f + 2.0)) / nf
    model_max_log2_error = jnp.log2(model_max_error.astype(jnp.float64))

    metrics = {
        "model_max_error": model_max_error.astype(jnp.uint64),
        "model_max_error_idx": model_max_error_idx,
        "model_avg_error": model_avg_error,
        "model_avg_l2_error": model_avg_l2_error,
        "model_avg_log2_error": model_avg_log2_error,
        "model_max_log2_error": model_max_log2_error,
    }
    return (top_params, leaf_params, patch, next_idx,
            final_err.astype(jnp.uint64), metrics)


def norm_constants(keys, key_type: KeyType) -> Tuple[float, float]:
    """(offset, scale) of the normalized key domain for a sorted array:
    x' = (x - offset) * scale, mapping [min, max] onto [0, 1]."""
    kmin = float(keys[0])
    kmax = float(keys[-1])
    span = kmax - kmin
    return kmin, (1.0 / span if span > 0 else 1.0)


def train_two_layer(keys, key_type: KeyType, yfix, top_type: str,
                    leaf_type: str, B: int):
    """Train a 2-layer RMI.  Returns device (normalized-domain) params,
    patch info for raw conversion, per-leaf errors, host metrics and
    the normalization constants."""
    validate_spec([top_type, leaf_type])
    kminf, s = norm_constants(keys, key_type)
    top_params, leaf_params, patch, next_idx, leaf_errors, metrics = \
        _train_core(keys, yfix, jnp.float64(kminf), jnp.float64(s),
                    top_type=top_type, leaf_type=leaf_type, B=int(B),
                    key_type=key_type)
    return (top_params, leaf_params, patch, next_idx, leaf_errors,
            metrics, kminf, s)
