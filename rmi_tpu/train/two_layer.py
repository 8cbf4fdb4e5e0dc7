"""Two-layer RMI training as a staged sequence of fused device programs.

This is the TPU-native re-design of train_two_layer (two_layer.rs:101-
306).  The reference makes four sequential streaming passes over the
sorted array (top fit, leaf partition+fit, lower-bound correction,
error sweep); here each pass is a batched vector program, jit-compiled
as three stages so each stage's O(n) temporaries are freed before the
next allocates (200M-key builds would otherwise exceed one chip's HBM):

  stage A  fixdups + top-model fit + leaf assignment;
  stage B  batched per-leaf fits over overlap-augmented spans
           (two_layer.rs:52-82 semantics) + lower-bound-correction
           fills (lower_bound_correction.rs) + empty-leaf patching
           (two_layer.rs:182-202);
  stage C  error sweep + duplicate-run inflation + epsilon probes and
           the exact error metrics (two_layer.rs:205-287).

Memory rules (see also the lane-padding note in utils/segments.py):
per-key integer arrays are int32 (row counts are < 2^31), per-key
float arrays are f64 but transient within a stage, and nothing with a
small trailing dimension materializes at n scale.

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
from typing import Tuple
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


def _fixdups_i32(keys):
    """First-occurrence index per element as int32 (FixDups,
    models/mod.rs:143-185)."""
    n = keys.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    changed = jnp.concatenate(
        [jnp.ones((1,), bool), keys[1:] != keys[:-1]])
    return seg.blocked_cummax(jnp.where(changed, idx, 0))


def lower_bound_fills(spans: seg.Spans, keys, key_type: KeyType):
    """next/prev leaf fills of LowerBoundCorrection
    (lower_bound_correction.rs:30-80) — [B]-sized only."""
    n, B = spans.n, spans.B
    big = jnp.int64(n + 1)

    first_val = jnp.where(spans.nonempty, spans.starts, big)
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
    return next_idx, next_key, prev_key


def _run_lengths_i32(keys, n, run_start=None):
    """Per-key duplicate-run length, 0 for the array's FINAL run (the
    reference never flushes it, lower_bound_correction.rs:104-125).

    ``run_start`` may be passed to reuse an existing first-occurrence
    scan: FixDups positions ARE run starts, so the sweep tail hands
    yfix in and saves one O(n) cummax (~70ms at 200M keys).
    """
    idx = jnp.arange(n, dtype=jnp.int32)
    if run_start is None:
        changed = jnp.concatenate([jnp.ones((1,), bool),
                                   keys[1:] != keys[:-1]])
        run_start = seg.blocked_cummax(jnp.where(changed, idx, 0))
    ends_run = jnp.concatenate([keys[1:] != keys[:-1],
                                jnp.ones((1,), bool)])
    run_end = seg.blocked_cummin(
        jnp.where(ends_run, idx, jnp.int32(n - 1)), reverse=True)
    run_len = run_end - run_start + 1
    return jnp.where(run_end < n - 1, run_len, 0)


def _error_between(pred_i, target_i, n):
    """error_between (two_layer.rs:14-18): clamp both to n, abs diff."""
    a = jnp.minimum(pred_i, n)
    b = jnp.minimum(target_i, n)
    return jnp.abs(a - b)


def _as_dict(params):
    return params if isinstance(params, dict) else {"w": params}


def _predict_params(leaf_params):
    """The device-predict view of a leaf-param dict (drops host-only
    generator aux / kernel overflow flags, keeps everything the
    model's predict reads)."""
    return {k: v for k, v in leaf_params.items()
            if k not in ("aux", "ovf")}


def _leaf_eval_cols(leaf_type: str, cols, x):
    """Evaluate a float-family leaf from per-key parameter columns."""
    if leaf_type in ("linear", "robust_linear", "linear_spline"):
        return cols[1] * x + cols[0]
    if leaf_type == "loglinear":
        from rmi_tpu.models.linear import exp1
        return exp1(cols[1] * x + cols[0])
    if leaf_type == "cubic":
        return ((cols[0] * x + cols[1]) * x + cols[2]) * x + cols[3]
    if leaf_type in ("normal", "lognormal"):
        from rmi_tpu.models.normal import phi
        if leaf_type == "lognormal":
            raw = jnp.log(x)
            x = jnp.where(jnp.isnan(raw), 0.0, jnp.maximum(raw, 0.0))
        return phi((x - cols[0]) / cols[1]) * cols[2]
    raise ValueError(leaf_type)


# ---------------------------------------------------------------------------
# stage A: fixdups + top fit + assignment
# ---------------------------------------------------------------------------

def _assign_body(keys, kminf, s, *, top_type: str, B: int,
                 key_type: KeyType, b_dyn=None, sf_dyn=None, yfix=None):
    """``b_dyn``/``sf_dyn`` (traced scalars) activate B-generic mode:
    the program is compiled for the static PAD bucket ``B`` but trains
    the RMI for the true branching factor ``b_dyn`` (scale
    ``sf_dyn = b_dyn/n``).  trunc(y * sf) is bit-identical to the
    static path for every reachable sf (the reference's scale-skip,
    models/mod.rs:238-250, only fires at sf == 1.0 exactly, where
    trunc(y * 1.0) == y for integer-valued y)."""
    n = keys.shape[0]
    mtop = get_model(top_type)
    xraw = keymod.as_float(keys)
    xn = (xraw - kminf) * s
    if yfix is None:
        yfix = _fixdups_i32(keys)
    yfix_f = yfix.astype(jnp.float64)
    if sf_dyn is None:
        sf = float(B) / float(n)   # two_layer.rs:109
        ys_scaled = _scale_targets(yfix_f, sf)
        ep_ys = _scale_targets(jnp.arange(n, dtype=jnp.float64), sf)
    else:
        sf = sf_dyn
        ys_scaled = jnp.trunc(yfix_f * sf_dyn)
        ep_ys = jnp.trunc(jnp.arange(n, dtype=jnp.float64) * sf_dyn)

    top_in = model_float_input(mtop, xn, xraw)
    top_params = _as_dict(mtop.fit_top(
        keys_f=top_in, ys_f=ys_scaled, ep_ys_f=ep_ys, n=n, keys=keys,
        B=B, scale=sf, xf_raw=xraw))
    bound = (B - 1) if b_dyn is None else (b_dyn - 1)
    t64 = predict_top_assignment(mtop, top_params, keys, xn, xraw, bound)
    return yfix, top_params, t64.astype(jnp.int32)


# ---------------------------------------------------------------------------
# stage B: leaf fits + LB fills + patching
# ---------------------------------------------------------------------------

def _fit_body(keys, yfix, t, kminf, s, *, leaf_type: str, B: int,
              key_type: KeyType, pallas_span=None, b_dyn=None):
    n = keys.shape[0]
    mleaf = get_model(leaf_type)
    xraw = keymod.as_float(keys)
    xn = (xraw - kminf) * s
    spans = seg.make_spans(t, B)
    leaf_in = model_float_input(mleaf, xn, xraw)
    if mleaf.output_int:
        # int-output leaves (radix hint tables) fit on exact key bits
        leaf_params = _as_dict(mleaf.fit_leaves(
            leaf_in, yfix.astype(jnp.float64), spans, leaf_in,
            xf_raw=xraw, keys_raw=keys))
    else:
        leaf_params = _as_dict(mleaf.fit_leaves(
            leaf_in, yfix.astype(jnp.float64), spans, leaf_in,
            xf_raw=xraw, pallas_span=pallas_span))
    next_idx, next_key, prev_key = lower_bound_fills(spans, keys, key_type)

    # empty-leaf constant patch (two_layer.rs:182-202) — the reference's
    # loop covers 0..B-1 EXCLUSIVE, so the final leaf is never patched.
    if mleaf.constant_params is not None:
        const_rows = mleaf.constant_params(next_idx.astype(jnp.float64))
        last = (B - 1) if b_dyn is None else (b_dyn - 1)
        patch = (~spans.nonempty) & (jnp.arange(B) < last)
        leaf_params = dict(leaf_params)
        leaf_params["w"] = jnp.where(patch[:, None], const_rows,
                                     leaf_params["w"])
    else:
        patch = jnp.zeros((B,), dtype=bool)
    return (leaf_params, patch, next_idx, next_key, prev_key,
            spans.starts, spans.ends, spans.nonempty)


# ---------------------------------------------------------------------------
# stage C: error sweep + probes + metrics
# ---------------------------------------------------------------------------

# Chunk width for the large-n XLA error sweep (the grid / CPU path;
# the Pallas df64 sweep streams blocks and needs no chunking).
_SWEEP_CHUNK = 1 << 25


def _sweep_body(keys, yfix, t, leaf_params, next_idx, next_key, prev_key,
                starts, ends, nonempty, kminf, s, *, leaf_type: str,
                B: int, key_type: KeyType, b_dyn=None):
    n = keys.shape[0]
    mleaf = get_model(leaf_type)

    # error sweep (two_layer.rs:205-217); int32 per-key arrays (n < 2^31)
    # NOTE: an exact fill-forward scan (seg.fill_forward) would avoid
    # these n-scale gathers, but its associative_scan graph OOM-kills
    # the tunneled TPU compiler at n >= 100M — column gathers stay.
    t_idx = None if B == 1 else t

    def _pred_err(kc, tc, yc):
        if mleaf.output_int:
            pred = clamp_int(mleaf.predict(leaf_params, tc, kc),
                             n).astype(jnp.int32)
        else:
            xrawc = keymod.as_float(kc)
            lin = model_float_input(mleaf, (xrawc - kminf) * s, xrawc)
            p = jnp.floor(mleaf.predict(leaf_params, tc, lin))
            p = jnp.where(jnp.isnan(p), 0.0,
                          jnp.clip(p, 0.0, jnp.float64(n)))
            pred = p.astype(jnp.int32)
        return _error_between(pred, jnp.minimum(yc, n), n)

    if t_idx is not None and n > _SWEEP_CHUNK:
        # large-n: the per-key gathers + f64 prediction chain hold many
        # n-sized arrays at once; sweep in fixed chunks into an i32
        # error buffer (recomputed clamped-tail overlap writes the same
        # values, so no masking is needed)
        nchunks = -(-n // _SWEEP_CHUNK)

        def body(ci, err_acc):
            start = jnp.minimum(ci * _SWEEP_CHUNK, n - _SWEEP_CHUNK)
            kc = jax.lax.dynamic_slice(keys, (start,), (_SWEEP_CHUNK,))
            tc = jax.lax.dynamic_slice(t, (start,), (_SWEEP_CHUNK,))
            yc = jax.lax.dynamic_slice(yfix, (start,), (_SWEEP_CHUNK,))
            return jax.lax.dynamic_update_slice(
                err_acc, _pred_err(kc, tc, yc), (start,))

        err = jax.lax.fori_loop(0, nchunks, body,
                                jnp.zeros((n,), jnp.int32))
    else:
        err = _pred_err(keys, t_idx, yfix)

    # epsilon probes (two_layer.rs:226-259)
    def probe_input(probe_keys):
        if mleaf.output_int:
            return probe_keys
        pf = keymod.as_float(probe_keys)
        if mleaf.input_domain == "raw":
            return pf
        return (pf - kminf) * s

    def probe_predict(probe_keys, leaf_ids):
        raw = mleaf.predict(leaf_params, leaf_ids,
                            probe_input(probe_keys))
        if mleaf.output_int:
            return clamp_int(raw, n)
        return predict_clamped(raw, n)

    leaf_ids = jnp.arange(B)
    up_keys = keymod.minus_epsilon(next_key, key_type)
    pred_up = probe_predict(up_keys, leaf_ids)
    lo_keys = keymod.plus_epsilon(prev_key, key_type)
    pred_lo = probe_predict(lo_keys, leaf_ids)
    return _sweep_tail(keys, err, pred_up, pred_lo, next_idx, starts,
                       ends, B=B, run_start=yfix, b_dyn=b_dyn)


def _sweep_tail(keys, err, pred_up, pred_lo, next_idx, starts, ends, *,
                B: int, run_start=None, b_dyn=None):
    """Stage-C tail from per-key errors + probe predictions to the
    final per-leaf errors and metrics (two_layer.rs:226-287).

    With ``b_dyn`` (B-generic mode), leaves in [b_dyn, B) are compile-
    time padding: their spans are empty (cnt 0, so they never touch
    the count-weighted sums) and their error entries are forced to 0 /
    excluded from the max and its argmax."""
    n = keys.shape[0]
    # scatter-free per-leaf maxima over the contiguous spans
    max_err = seg.range_max(err, starts, ends, 0).astype(jnp.int64)
    run_counted = _run_lengths_i32(keys, n, run_start=run_start)
    longest_run = seg.range_max(run_counted, starts, ends,
                                0).astype(jnp.int64)
    cnt = ends - starts

    leaf_ids = jnp.arange(B)
    upper_err = _error_between(pred_up.astype(jnp.int64), next_idx + 1, n)
    first_idx = next_idx[jnp.maximum(leaf_ids - 1, 0)]
    lower_err = _error_between(pred_lo.astype(jnp.int64), first_idx, n)

    final_err = (jnp.maximum(jnp.maximum(max_err, upper_err), lower_err)
                 + longest_run)
    if b_dyn is not None:
        valid = leaf_ids < b_dyn
        final_err = jnp.where(valid, final_err, 0)
        fe_for_idx = jnp.where(valid, final_err, jnp.int64(-1))
    else:
        fe_for_idx = final_err

    # metrics (two_layer.rs:266-287)
    nf = jnp.float64(n)
    cnt_f = cnt.astype(jnp.float64)
    err_f = final_err.astype(jnp.float64)
    model_max_error = jnp.max(final_err)
    # Rust max_by_key returns the LAST maximal element.
    model_max_error_idx = (B - 1) - jnp.argmax(fe_for_idx[::-1])
    metrics = {
        "model_max_error": model_max_error.astype(jnp.uint64),
        "model_max_error_idx": model_max_error_idx,
        "model_avg_error": jnp.sum(cnt_f * err_f) / nf,
        "model_avg_l2_error": jnp.sum((cnt_f * err_f) ** 2 / nf),
        "model_avg_log2_error":
            jnp.sum(cnt_f * jnp.log2(2.0 * err_f + 2.0)) / nf,
        "model_max_log2_error":
            jnp.log2(model_max_error.astype(jnp.float64)),
    }
    return final_err.astype(jnp.uint64), metrics


# ---------------------------------------------------------------------------
# Pallas (df64) sweep mode
# ---------------------------------------------------------------------------

def pallas_sweep_mode(leaf_type: str) -> bool:
    """Whether builds use the Pallas df64 sweep (and serving must then
    use the matching df64 eval — see TrainedRMI.eval_mode).

    Default: on for supported leaf families on real TPU backends, off
    on CPU (tests exercise the exact-f64 oracle semantics there).
    RMI_PALLAS=1 forces it (interpret mode on CPU); RMI_PALLAS=0
    disables.
    """
    import os
    flag = os.environ.get("RMI_PALLAS", "").lower()
    if flag in ("0", "off", "false"):
        return False
    from rmi_tpu.ops.sweep_kernel import PALLAS_SWEEP_LEAVES
    if leaf_type not in PALLAS_SWEEP_LEAVES:
        return False
    if flag in ("1", "on", "true"):
        return True
    return jax.default_backend() != "cpu"


def _probe_df64_body(n, w_pad, next_key, prev_key, kminf, s, *,
                     leaf_type: str, key_type: KeyType):
    """Epsilon-probe predictions in df64 (the Pallas-mode twin of the
    probe section of _sweep_body)."""
    from rmi_tpu.ops import eval_kernel
    mleaf = get_model(leaf_type)
    ppm = mleaf.ppm

    from rmi_tpu.ops.sweep_kernel import df64_eval_input

    def probe_input(probe_keys):
        pf = keymod.as_float(probe_keys)
        if mleaf.input_domain != "raw":
            pf = (pf - kminf) * s
        return df64_eval_input(leaf_type, pf)

    up_keys = keymod.minus_epsilon(next_key, key_type)
    pred_up = eval_kernel.leaf_eval_clamped(
        probe_input(up_keys), w_pad, leaf_type=leaf_type, ppm=ppm, n=n)
    lo_keys = keymod.plus_epsilon(prev_key, key_type)
    pred_lo = eval_kernel.leaf_eval_clamped(
        probe_input(lo_keys), w_pad, leaf_type=leaf_type, ppm=ppm, n=n)
    return pred_up, pred_lo


def default_span(n: int, B: int) -> int:
    """Static DMA-window heuristic: ~4x the expected leaves per block,
    clamped to the supported buckets."""
    from rmi_tpu.ops.sweep_kernel import KB
    per_block = KB * B / max(n, 1) + 8
    span = 64
    while span < 4 * per_block and span < 1024:
        span *= 2
    return min(span, 1024)


@functools.partial(jax.jit, static_argnames=("top_type", "leaf_type",
                                             "B", "key_type", "span"))
def _train_core_pallas(keys, kminf, s, b_dyn=None, sf_dyn=None, *,
                       top_type: str, leaf_type: str,
                       B: int, key_type: KeyType, span: int):
    """The whole build as ONE program with the Pallas df64 sweep in
    place of the XLA gather sweep.

    Monolithic on purpose: the remote TPU compiler SEGFAULTS on
    stage-B-terminated subgraphs at n >= 25M (probes/probe_segv_bisect)
    while accepting the fused whole, so the leaf-span check cannot be a
    host decision between stages — instead the kernel emits per-block
    overflow flags and the caller discards + retries on overflow.
    """
    from rmi_tpu.ops import sweep_kernel
    n = keys.shape[0]
    mleaf = get_model(leaf_type)
    yfix, top_params, t = _assign_body(keys, kminf, s, top_type=top_type,
                                       B=B, key_type=key_type,
                                       b_dyn=b_dyn, sf_dyn=sf_dyn)
    (leaf_params, patch, next_idx, next_key, prev_key, starts, ends,
     nonempty) = _fit_body(keys, yfix, t, kminf, s, leaf_type=leaf_type,
                           B=B, key_type=key_type, pallas_span=span,
                           b_dyn=b_dyn)
    leaf_params = dict(leaf_params)
    fit_ovf = leaf_params.pop("ovf", jnp.int32(0))
    xraw = keymod.as_float(keys)
    xn = (xraw - kminf) * s
    leaf_in = model_float_input(mleaf, xn, xraw)
    w_pad = sweep_kernel.pad_param_table(leaf_params["w"])
    blk_lo, _max_span = sweep_kernel.block_leaf_bounds(t)
    err, ovf = sweep_kernel.sweep_errors(
        sweep_kernel.df64_eval_input(leaf_type, leaf_in), yfix, t, w_pad,
        blk_lo, leaf_type=leaf_type, n=n, B=B, ppm=mleaf.ppm, span=span)
    ovf = jnp.maximum(ovf, fit_ovf)
    pred_up, pred_lo = _probe_df64_body(
        n, w_pad, next_key, prev_key, kminf, s, leaf_type=leaf_type,
        key_type=key_type)
    leaf_errors, metrics = _sweep_tail(keys, err, pred_up, pred_lo,
                                       next_idx, starts, ends, B=B,
                                       run_start=yfix, b_dyn=b_dyn)
    return (top_params, leaf_params, patch, next_idx, leaf_errors,
            metrics, ovf)


_stage_assign = functools.partial(jax.jit, static_argnames=(
    "top_type", "B", "key_type"))(_assign_body)
_stage_fit = functools.partial(jax.jit, static_argnames=(
    "leaf_type", "B", "key_type", "pallas_span"))(_fit_body)
_stage_sweep = functools.partial(jax.jit, static_argnames=(
    "leaf_type", "B", "key_type"))(_sweep_body)


@functools.partial(jax.jit,
                   static_argnames=("top_type", "leaf_type", "B", "key_type"))
def _train_core_mono(keys, kminf, s, b_dyn=None, sf_dyn=None, *,
                     top_type: str, leaf_type: str,
                     B: int, key_type: KeyType):
    """Whole build as ONE program — the default: the tunneled TPU
    compiler handles this graph shape reliably, and XLA can overlap
    phases.  The staged path (RMI_BUILD_STAGED=1) trades that for
    lower peak HBM at the largest n."""
    yfix, top_params, t = _assign_body(keys, kminf, s, top_type=top_type,
                                       B=B, key_type=key_type,
                                       b_dyn=b_dyn, sf_dyn=sf_dyn)
    (leaf_params, patch, next_idx, next_key, prev_key, starts, ends,
     nonempty) = _fit_body(keys, yfix, t, kminf, s, leaf_type=leaf_type,
                           B=B, key_type=key_type, b_dyn=b_dyn)
    leaf_errors, metrics = _sweep_body(
        keys, yfix, t, _predict_params(leaf_params), next_idx, next_key,
        prev_key, starts, ends, nonempty, kminf, s, leaf_type=leaf_type,
        B=B, key_type=key_type, b_dyn=b_dyn)
    return (top_params, leaf_params, patch, next_idx, leaf_errors, metrics)


def norm_constants(keys, key_type: KeyType) -> Tuple[float, float]:
    """(offset, scale) of the normalized key domain for a sorted array:
    x' = (x - offset) * scale, mapping [min, max] onto [0, 1]."""
    kmin = float(keys[0])
    kmax = float(keys[-1])
    span = kmax - kmin
    return kmin, (1.0 / span if span > 0 else 1.0)


def train_two_layer_async(keys, key_type: KeyType, top_type: str,
                          leaf_type: str, B: int, norm=None):
    """Dispatch a 2-layer build WITHOUT any host synchronization.

    Returns ``(metrics_dev, ovf_dev, finish)`` where ``metrics_dev`` is
    the device-resident metrics dict, ``ovf_dev`` is the Pallas
    overflow flag (or None on the XLA path), and
    ``finish(ovf_host) -> (out_tuple, retried)`` resolves the build:
    on overflow it synchronously escalates the DMA window then falls
    back to the XLA monolith (``retried=True`` means ``out_tuple``
    carries fresh device metrics the caller must fetch).

    This is what lets the optimizer sweep actually overlap devices
    (optimizer.rs:220-231 in substance): all configs dispatch before
    the first metrics transfer blocks the host (parallel/sweep.py).
    """
    validate_spec([top_type, leaf_type])
    if keys.shape[0] >= 2**31:
        raise ValueError("single-chip builds support < 2^31 rows; "
                         "shard larger arrays (rmi_tpu.parallel)")
    kminf, s = norm_constants(keys, key_type) if norm is None else norm
    kd, sd = jnp.float64(kminf), jnp.float64(s)
    B = int(B)

    if pallas_sweep_mode(leaf_type):
        spans_to_try = sorted({default_span(keys.shape[0], B), 1024})
        out = _train_core_pallas(
            keys, kd, sd, top_type=top_type, leaf_type=leaf_type,
            B=B, key_type=key_type, span=spans_to_try[0])

        def finish(ovf_host, out=out):
            if not ovf_host:
                return out[:6] + (kminf, s, "df64"), False
            for span in spans_to_try[1:]:
                out2 = _train_core_pallas(
                    keys, kd, sd, top_type=top_type, leaf_type=leaf_type,
                    B=B, key_type=key_type, span=span)
                if not int(out2[-1]):
                    return out2[:6] + (kminf, s, "df64"), True
            out3 = _train_core_mono(keys, kd, sd, top_type=top_type,
                                    leaf_type=leaf_type, B=B,
                                    key_type=key_type)
            return out3 + (kminf, s, "xla"), True

        return out[5], out[6], finish

    out = _train_core_mono(keys, kd, sd, top_type=top_type,
                           leaf_type=leaf_type, B=B, key_type=key_type)

    def finish(ovf_host, out=out):
        return out + (kminf, s, "xla"), False

    return out[5], None, finish


# ---------------------------------------------------------------------------
# B-generic metrics grid (the compile-once optimizer sweep)
# ---------------------------------------------------------------------------

# Metrics the optimizer consumes per (models, branching factor) point.
GRID_METRIC_KEYS = ("model_avg_log2_error", "model_max_log2_error",
                    "model_max_error")


@functools.partial(jax.jit, static_argnames=("top_type", "leaf_type",
                                             "B", "key_type"))
def _metrics_grid_point(keys, yfix, kminf, s, b, *, top_type: str,
                        leaf_type: str, B: int, key_type: KeyType):
    """Measure-only build for ONE branching factor with ``b`` a traced
    scalar.

    The reference's --optimize drives hundreds of full builds across a
    (models, branching factor) grid (optimizer.rs:110-151, 233-249);
    compiling a fresh XLA program per branching factor made that
    impractical on the tunneled TPU compiler (minutes per compile).
    Here the program is compiled once per (model pair, bucket B):
    arrays are sized for the static pad bucket ``B``, leaves in [b, B)
    stay empty (their spans are [n, n)) and are masked out of the
    error metrics (see _sweep_tail's b_dyn handling).

    One DISPATCH per branching factor rather than an on-device
    lax.map over all of them: the map's shared loop body pinned every
    phase's n-sized temporaries simultaneously and exhausted device
    memory at 200M keys (~15GB of HLO temps), while per-point
    dispatches free each point's temporaries before the next starts —
    the same peak as a single monolithic build.  FixDups positions are
    b-invariant and passed in (computed once per dataset).
    """
    n = keys.shape[0]
    sf = b.astype(jnp.float64) / jnp.float64(n)
    yf, _top_params, t = _assign_body(
        keys, kminf, s, top_type=top_type, B=B, key_type=key_type,
        b_dyn=b, sf_dyn=sf, yfix=yfix)
    (leaf_params, _patch, next_idx, next_key, prev_key, starts, ends,
     nonempty) = _fit_body(keys, yf, t, kminf, s, leaf_type=leaf_type,
                           B=B, key_type=key_type, b_dyn=b)
    _leaf_errors, metrics = _sweep_body(
        keys, yf, t, _predict_params(leaf_params), next_idx, next_key,
        prev_key, starts, ends, nonempty, kminf, s,
        leaf_type=leaf_type, B=B, key_type=key_type, b_dyn=b)
    return {k: metrics[k] for k in GRID_METRIC_KEYS}


_fixdups_jit = jax.jit(_fixdups_i32)


def _metrics_grid_args(keys, key_type: KeyType, top_type: str,
                       leaf_type: str, bs, bucket, norm, yfix=None):
    """Shared-args + per-point b arrays for the grid point program.

    ``yfix`` (FixDups positions, b-invariant) may be passed in so MANY
    grid programs over the same keys share ONE [n] i32 array — each
    pending dispatch pins its argument buffers, and per-call copies
    (0.8GB each at 200M) stack up across (pair, bucket) programs.
    """
    validate_spec([top_type, leaf_type])
    bs = [int(b) for b in bs]
    if bucket is None:
        bucket = 1 << (max(bs) - 1).bit_length()
    if max(bs) > bucket:
        raise ValueError(f"bucket {bucket} < max branching factor {max(bs)}")
    kminf, s = norm_constants(keys, key_type) if norm is None else norm
    if yfix is None:
        yfix = _fixdups_jit(keys)
    base = (keys, yfix, jnp.float64(kminf), jnp.float64(s))
    b_args = [jnp.asarray(b, dtype=jnp.int32) for b in bs]
    statics = dict(top_type=top_type, leaf_type=leaf_type, B=int(bucket),
                   key_type=key_type)
    return base, b_args, statics


def metrics_grid_async(keys, key_type: KeyType, top_type: str,
                       leaf_type: str, bs, bucket: int = None, norm=None,
                       yfix=None):
    """Dispatch a B-generic metrics grid (no host sync).

    Returns a dict of per-branching-factor LISTS of device scalars
    (same compiled program for every point); fetch with
    jax.device_get (batched across pairs by the optimizer).
    """
    base, b_args, statics = _metrics_grid_args(keys, key_type, top_type,
                                               leaf_type, bs, bucket,
                                               norm, yfix=yfix)
    mds = [_metrics_grid_point(*base, b, **statics) for b in b_args]
    return {k: [m[k] for m in mds] for k in GRID_METRIC_KEYS}


def metrics_grid_prepare(keys, key_type: KeyType, top_type: str,
                         leaf_type: str, bs, bucket: int = None,
                         norm=None, yfix=None):
    """AOT twin of metrics_grid_async: trace+lower now (cheap, host
    Python), compile later — ``(lowered, args_list)`` where
    ``lowered.compile()`` yields an executable to call once per
    per-point argument tuple in ``args_list``.

    The optimizer compiles many independent grid programs; lowering
    them sequentially then calling ``.compile()`` from a thread pool
    overlaps the expensive part (XLA compilation releases the GIL, and
    on tunneled TPUs it is a remote RPC the host merely waits on),
    collapsing the sweep's cold-start wall time.
    """
    base, b_args, statics = _metrics_grid_args(keys, key_type, top_type,
                                               leaf_type, bs, bucket,
                                               norm, yfix=yfix)
    lowered = _metrics_grid_point.lower(*base, b_args[0], **statics)
    return lowered, [(*base, b) for b in b_args]


def train_two_layer(keys, key_type: KeyType, yfix_unused, top_type: str,
                    leaf_type: str, B: int):
    """Train a 2-layer RMI.  Returns device (normalized-domain) params,
    patch info for raw conversion, per-leaf errors, host metrics and
    the normalization constants.

    (FixDups positions are computed on device in stage A; the third
    parameter is kept for signature compatibility and ignored.)
    """
    validate_spec([top_type, leaf_type])
    if keys.shape[0] >= 2**31:
        raise ValueError("single-chip builds support < 2^31 rows; "
                         "shard larger arrays (rmi_tpu.parallel)")
    kminf, s = norm_constants(keys, key_type)
    kd, sd = jnp.float64(kminf), jnp.float64(s)
    B = int(B)

    import os
    profile = os.environ.get("RMI_PROFILE_BUILD") == "1"
    eval_mode = "xla"
    if pallas_sweep_mode(leaf_type):
        # Monolithic build with the Pallas df64 sweep: per-key errors
        # and epsilon probes evaluate in float-float (ops/df64.py);
        # serving must then use the same arithmetic
        # (TrainedRMI.eval_mode).  The DMA-window size is a static
        # heuristic; on (rare, skewed) overflow the kernel flags it and
        # the build escalates to the widest window, then to the XLA
        # monolith.
        spans_to_try = sorted({default_span(keys.shape[0], B), 1024})
        for span in spans_to_try:
            out = _train_core_pallas(
                keys, kd, sd, top_type=top_type, leaf_type=leaf_type,
                B=B, key_type=key_type, span=span)
            (top_params, leaf_params, patch, next_idx, leaf_errors,
             metrics, ovf) = out
            if not int(ovf):
                return (top_params, leaf_params, patch, next_idx,
                        leaf_errors, metrics, kminf, s, "df64")
        # fall through to the XLA monolith on persistent overflow
    if profile or os.environ.get("RMI_BUILD_STAGED") == "1":
        # Staged path: per-phase HBM release, and (with
        # RMI_PROFILE_BUILD=1) per-phase wall timing logged to stderr —
        # the TPU analogue of the reference's RUST_LOG build tracing
        # (two_layer.rs:108, 261-263).
        from rmi_tpu.utils.profiling import phase
        with phase("assign", profile):
            yfix, top_params, t = _stage_assign(
                keys, kd, sd, top_type=top_type, B=B, key_type=key_type)
            jax.block_until_ready(t)
        with phase("fit", profile):
            (leaf_params, patch, next_idx, next_key, prev_key, starts,
             ends, nonempty) = _stage_fit(
                keys, yfix, t, kd, sd, leaf_type=leaf_type, B=B,
                key_type=key_type)
            jax.block_until_ready(leaf_params)
        with phase("sweep", profile):
            leaf_errors, metrics = _stage_sweep(
                keys, yfix, t, _predict_params(leaf_params), next_idx, next_key,
                prev_key, starts, ends, nonempty, kd, sd,
                leaf_type=leaf_type, B=B, key_type=key_type)
            jax.block_until_ready(leaf_errors)
    else:
        (top_params, leaf_params, patch, next_idx, leaf_errors,
         metrics) = _train_core_mono(
            keys, kd, sd, top_type=top_type, leaf_type=leaf_type, B=B,
            key_type=key_type)
    return (top_params, leaf_params, patch, next_idx, leaf_errors,
            metrics, kminf, s, eval_mode)
