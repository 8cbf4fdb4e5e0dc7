"""Batched device serving path: lookup + error-bounded last-mile search.

Replaces the reference's generated C++ ``lookup(key, &err)``
(codegen.rs:612-718) and the caller-side bounded binary search
(README.md:63, tests/*/main.cpp) with fused, jit-compiled batch
kernels:

  guess, err = lookup(rmi, queries)      # top eval -> leaf gather ->
                                         # leaf eval -> clamp -> err fetch
  idx = search(rmi, queries)             # + bounded lower_bound over the
                                         # HBM-resident key array

Serving evaluates in the normalized key domain with the SAME prediction
semantics as training (max(0, floor(f)), models/mod.rs:735-737).  The
reference's generated C code skips the lower clamp for
needs_bounds_check=false models (codegen.rs:346-373), which is
undefined behavior for negative predictions; we keep the well-defined
Rust-side semantics everywhere.

With cache_fix (--bounded), lookup runs the RMI over the spline knots,
bounded-searches them, and linearly interpolates quantized to the line
size (codegen.rs:396-448).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from rmi_tpu import keys as keymod
from rmi_tpu.keys import KeyType
from rmi_tpu.models import get_model, predict_clamped
from rmi_tpu.train.two_layer import predict_top_assignment, model_float_input


@functools.partial(
    jax.jit,
    static_argnames=("top_type", "leaf_type", "B", "n", "key_type"))
def _rmi_eval(queries, top_params, leaf_params, leaf_errors, off, s, *,
              top_type: str, leaf_type: str, B: int, n: int,
              key_type: KeyType):
    """(guess, err, model_index) for a batch of query keys."""
    mtop = get_model(top_type)
    mleaf = get_model(leaf_type)
    xraw = keymod.as_float(queries)
    xn = (xraw - off) * s
    midx = predict_top_assignment(mtop, top_params, queries, xn, xraw,
                                  B - 1)
    if mleaf.output_int:
        from rmi_tpu.models import clamp_int
        guess = clamp_int(mleaf.predict(leaf_params, midx, queries), n - 1)
    else:
        leaf_in = model_float_input(mleaf, xn, xraw)
        pred_f = mleaf.predict(leaf_params, midx, leaf_in)
        # final clamp, codegen.rs:713-717
        guess = predict_clamped(pred_f, n - 1)
    if leaf_errors is not None:
        err = leaf_errors[midx].astype(jnp.int64)
    else:
        err = jnp.zeros_like(guess)
    return guess, err, midx


def bounded_lower_bound(keys, queries, guess, err, n: int, iters: int):
    """First index i in [guess-err, guess+err] with keys[i] >= q.

    Branchless fixed-trip binary search — ``iters`` must cover the
    widest window (ceil(log2(2*max_err+2))).  All lanes search in
    lockstep; each step is one gather from the HBM key array.
    """
    lo = jnp.clip(guess - err, 0, n)
    hi = jnp.clip(guess + err + 1, 0, n)

    def body(_, state):
        lo, hi = state
        active = lo < hi
        mid = (lo + hi) >> 1
        v = keys[jnp.clip(mid, 0, n - 1)]
        go_right = v < queries
        new_lo = jnp.where(active & go_right, mid + 1, lo)
        new_hi = jnp.where(active & ~go_right, mid, hi)
        return new_lo, new_hi

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return lo


@functools.partial(
    jax.jit, static_argnames=("n", "iters"))
def _bounded_search_jit(keys, queries, guess, err, *, n: int, iters: int):
    return bounded_lower_bound(keys, queries, guess, err, n, iters)


@functools.partial(jax.jit, static_argnames=("line_size", "total_keys"))
def _cachefix_interp(spline_keys, spline_vals, queries, start, err_s, *,
                     line_size: int, total_keys: int):
    """Spline lerp quantized to the cache line (codegen.rs:405-444).

    The reference's emitted lookup computes the lerp with a FUSED
    ``std::fma(1-t, v0, t*v1)`` (codegen.rs:444); the device lerp here
    is double-rounded, and on this TPU f64 arithmetic is two-limb
    emulated (relative error ~2^-45), so the value can sit on the
    other side of a cache-line boundary than the reference's fma
    result.  Exact device fma is unattainable at reasonable cost;
    instead the QUANTIZATION is made insensitive to the rounding mode:
    any lane whose lerp value lies within ``eps`` of a line boundary
    resolves to the UPPER line.  Proof of the serve contract under
    that rule: the fit guarantees the true offset lies in
    [m*L, (m+1)*L) where m is the fma lerp's line index; our index is
    in {m, m+1} (|v_dev - v_fma| <= eps by the error bound below), and
    both choices give |pos - true| <= L = the reported err.  Resolving
    DOWN instead could give 2L-1 on an adversarial boundary flip —
    the failure mode the round-4 fit divergence exposed on 2^56-gap
    data (see tests/test_cachefix.py::test_serve_boundary_exactness).
    """
    num_pts = spline_keys.shape[0]
    iters = max(1, math.ceil(math.log2(num_pts + 1)) + 1)
    res = bounded_lower_bound(spline_keys, queries, start, err_s,
                              num_pts, iters)
    past_end = res >= num_pts
    r = jnp.clip(res, 1, num_pts - 1)
    k1 = spline_keys[r - 1].astype(jnp.float64)
    k2 = spline_keys[r].astype(jnp.float64)
    v0 = spline_vals[r - 1].astype(jnp.float64)
    v1 = spline_vals[r].astype(jnp.float64)
    qf = queries.astype(jnp.float64)
    t = (qf - k1) / jnp.maximum(k2 - k1, 1.0)
    v = (1.0 - t) * v0 + t * v1
    # |v - fma lerp| bound: <=3 ulp of the double-rounded form
    # (~total_keys * 2^-51) plus the TPU two-limb emulation slack
    # (rel ~2^-45 per op); total_keys * 2^-40 dominates both with
    # orders of magnitude to spare while staying far below 1 position
    # (2^-12 at n=2^28), so non-boundary lanes are never perturbed.
    eps = max(total_keys, 1) * (2.0 ** -40)
    line = jnp.floor((v + eps) / line_size)
    pos = jnp.maximum(line.astype(jnp.int64), 0) * line_size
    return jnp.where(past_end, jnp.int64(total_keys - 1), pos)


def _err_iters(rmi) -> int:
    """Binary-search trip count covering the widest error window.
    Cached on the rmi: the max-reduction is a host sync, which must not
    run once per lookup batch."""
    cached = getattr(rmi, "_err_iters_cache", None)
    if cached is not None:
        return cached
    if rmi.leaf_errors is None:
        iters = 1
    else:
        max_err = int(jnp.max(rmi.leaf_errors))
        iters = max(1, math.ceil(math.log2(2 * max_err + 2)) + 1)
    try:
        rmi._err_iters_cache = iters
    except AttributeError:
        pass
    return iters


@functools.partial(
    jax.jit,
    static_argnames=("top_type", "leaf_type", "B", "n", "key_type", "ppm"))
def _rmi_eval_df64(queries, top_params, w_pad, leaf_errors, off, s, *,
                   top_type: str, leaf_type: str, B: int, n: int,
                   key_type: KeyType, ppm: int):
    """df64-mode eval: the leaf is evaluated with the same float-float
    Pallas kernel the error sweep used (TrainedRMI.eval_mode)."""
    from rmi_tpu.models import get_model as _gm
    from rmi_tpu.ops import eval_kernel
    mtop = _gm(top_type)
    mleaf = _gm(leaf_type)
    xraw = keymod.as_float(queries)
    xn = (xraw - off) * s
    midx = predict_top_assignment(mtop, top_params, queries, xn, xraw,
                                  B - 1)
    rows = w_pad[midx]                      # one row gather [m, 128]
    from rmi_tpu.ops.sweep_kernel import df64_eval_input
    leaf_in = df64_eval_input(leaf_type,
                              model_float_input(mleaf, xn, xraw))
    guess = eval_kernel.leaf_eval_clamped(
        leaf_in, rows, leaf_type=leaf_type, ppm=ppm,
        n=n - 1).astype(jnp.int64)          # serving clamp codegen.rs:713
    if leaf_errors is not None:
        err = leaf_errors[midx].astype(jnp.int64)
    else:
        err = jnp.zeros_like(guess)
    return guess, err, midx


def df64_packed_params(rmi):
    """[B, 128] f32 hi/lo param table, cached on the rmi."""
    cached = getattr(rmi, "_df64_w_pad", None)
    if cached is None:
        from rmi_tpu.ops.sweep_kernel import pad_param_table
        cached = jax.jit(pad_param_table)(rmi.device_leaf_params["w"])
        try:
            rmi._df64_w_pad = cached
        except AttributeError:
            pass
    return cached


def _eval(rmi, queries):
    if getattr(rmi, "eval_mode", "xla") == "df64":
        from rmi_tpu.models import get_model as _gm
        return _rmi_eval_df64(
            queries, rmi.device_top_params, df64_packed_params(rmi),
            rmi.leaf_errors, jnp.float64(rmi.norm_offset),
            jnp.float64(rmi.norm_scale),
            top_type=rmi.top_type, leaf_type=rmi.leaf_type,
            B=rmi.branching_factor, n=rmi.num_rmi_rows,
            key_type=rmi.key_type, ppm=_gm(rmi.leaf_type).ppm)
    return _rmi_eval(
        queries, rmi.device_top_params, rmi.device_leaf_params,
        rmi.leaf_errors, jnp.float64(rmi.norm_offset),
        jnp.float64(rmi.norm_scale),
        top_type=rmi.top_type, leaf_type=rmi.leaf_type,
        B=rmi.branching_factor, n=rmi.num_rmi_rows, key_type=rmi.key_type)


def lookup(rmi, queries):
    """Batched lookup(key, &err): (guess, err) as int64 arrays.

    For cache_fix RMIs, returns the interpolated quantized position and
    err = line_size (codegen.rs:412-419)."""
    queries = jnp.asarray(queries)
    guess, err, _ = _eval(rmi, queries)
    if rmi.cache_fix is None:
        return guess, err

    line_size, sk, sv = rmi.cache_fix
    sk_d = jnp.asarray(sk)
    sv_d = jnp.asarray(sv)
    pos = _cachefix_interp(sk_d, sv_d, queries, guess, err,
                           line_size=line_size,
                           total_keys=rmi.num_data_rows)
    return pos, jnp.full_like(pos, line_size)


# Batch size where sort->sorted-kernel->unsort overtakes the 2-gather
# path on TPU (calibrated on v5e, probes/probe_sort_pipeline.py); the
# Pallas kernel only compiles on TPU, so "auto" stays off elsewhere.
SORT_SERVE_MIN = 1 << 20


def _sort_serve_wanted(nq: int) -> bool:
    import os
    mode = os.environ.get("RMI_SERVE_SORT", "auto")
    if mode == "0":
        return False
    if mode == "1":
        return True
    from rmi_tpu.ops.sweep_kernel import use_interpret
    return nq >= SORT_SERVE_MIN and not use_interpret()


def search(rmi, queries, keys=None):
    """Exact lower-bound indices via guess +/- err bounded search.

    ``keys`` defaults to the array the RMI was trained on; for
    cache_fix RMIs pass the ORIGINAL key array."""
    queries = jnp.asarray(queries)
    if rmi.cache_fix is not None:
        if keys is None:
            raise ValueError("cache_fix search needs the original key array")
        pos, err = lookup(rmi, queries)
        n = rmi.num_data_rows
        iters = max(1, math.ceil(math.log2(2 * rmi.cache_fix[0] + 2)) + 2)
        return _bounded_search_jit(jnp.asarray(keys), queries, pos,
                                   err + 1, n=n, iters=iters)
    from rmi_tpu import lookup_fast
    if keys is None and lookup_fast.supports_fast_path(rmi):
        if _sort_serve_wanted(queries.shape[0]):
            # large random batches: sort -> gather-free window kernel
            # -> unsort beats the dynamic-gather issue-rate cap
            return lookup_fast.fast_search_via_sort(rmi, queries)
        # hierarchical row-resolve: the TPU-native last mile
        return lookup_fast.fast_search(rmi, queries)
    if keys is None:
        keys = rmi.keys
    guess, err, _ = _eval(rmi, queries)
    return _bounded_search_jit(jnp.asarray(keys), queries, guess, err,
                               n=rmi.num_rmi_rows, iters=_err_iters(rmi))


def search_sorted(rmi, queries):
    """Exact lower bounds for a NON-DECREASING query batch — the bulk
    shape (merge joins, range scans, sorted probe streams).

    Sorted batches make both serving fetch patterns contiguous, so the
    gather-free window kernel (ops/sorted_serve_kernel.py) replaces the
    packed plan's 2 dynamic row gathers per query — several times past
    the gather-rate ceiling for dense batches.  Falls back to
    ``search`` (correct for any order) when the kernel's window tiers
    don't fit.  The reference has no batch API at all (its generated
    lookup() is scalar, codegen.rs:612-718); this is the TPU-shaped
    answer to its cache-friendly zipped layout.
    """
    queries = jnp.asarray(queries)
    from rmi_tpu import lookup_fast
    if rmi.cache_fix is None and lookup_fast.supports_fast_path(rmi):
        return lookup_fast.fast_search_sorted(rmi, queries)
    return search(rmi, queries)


def lookup_and_search(rmi, queries, keys=None):
    """Fused (guess, err, exact_lower_bound) for benchmarking."""
    g, e = lookup(rmi, queries)
    idx = search(rmi, queries, keys=keys)
    return g, e, idx
