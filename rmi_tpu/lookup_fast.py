"""Hierarchical row-resolve serving path — the TPU-native last mile.

XLA-TPU executes arbitrary 1-element gathers extremely slowly (microsecond
scale per element from HBM-resident arrays), so the classic per-query
binary search is the wrong shape for this hardware.  Full 128-lane ROW
gathers, however, run near memory bandwidth.  This module restructures
the error-bounded last-mile search as a fixed number of row gathers +
vectorized compare-counts:

  * Overlapped row views R_k of sampled key levels L_k = keys[::64^k],
    where R_k[i] = L_k[64*i : 64*i + 128] (stride 64, width 128).
  * lower_bound(q) at level k is a COUNT: lb_k = #{j : L_k[j] < q}.
    Given any valid lower limit LB_k <= lb_k with lb_k - LB_k <= 65,
    one row covers it:  row = LB_k >> 6,
    lb_k = 64*row + popcount(R_k[row] < q)
    — exact, no masking: the predicate is monotone over the sorted row,
    and padding with the maximal key keeps pad lanes false.
  * The RMI guess bounds lb within +/- max_err, picking the starting
    level K = min k with (2*max_err)/64^k + 2 <= 64; each refinement
    narrows by 64x.  Two levels cover max_err <= ~2000; three cover
    ~128k.

Cost per batch: (K+1) row gathers (~1KB/query each) + one leaf-param
row gather — all at HBM row-gather speed, independent of key-array
size.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from rmi_tpu import keys as keymod
from rmi_tpu.models import get_model, predict_clamped
from rmi_tpu.train.two_layer import predict_top_assignment, model_float_input

STRIDE = 64          # row stride of the overlapped views
WIDTH = 128          # lanes per row
LEVEL_FAN = 64       # sampling factor between levels


def _pad_value(dtype):
    if jnp.issubdtype(dtype, jnp.floating):
        return jnp.asarray(jnp.inf, dtype)
    return jnp.asarray(np.iinfo(np.dtype(dtype)).max, dtype)


@functools.partial(jax.jit, static_argnames=("nrows",))
def _overlapped_rows_jit(padded, *, nrows: int):
    # R[i] = [padded[64i:64i+64] | padded[64i+64:64i+128]] via two
    # reshaped halves — no index matrix (a [nrows,128] int index array
    # alone would cost 3.2GB at 200M keys)
    lo = padded[:nrows * STRIDE].reshape(nrows, STRIDE)
    hi = padded[STRIDE:nrows * STRIDE + STRIDE].reshape(nrows, STRIDE)
    return jnp.concatenate([lo, hi], axis=1)


def _overlapped_rows(level: jax.Array) -> jax.Array:
    """[m] sorted -> [ceil(m/64), 128] rows R[i] = level[64i : 64i+128],
    padded with the maximal key value."""
    m = level.shape[0]
    nrows = max(1, -(-m // STRIDE))
    padded_len = nrows * STRIDE + WIDTH
    pad = jnp.full((padded_len - m,), _pad_value(level.dtype), level.dtype)
    padded = jnp.concatenate([level, pad])
    return _overlapped_rows_jit(padded, nrows=nrows)


_SCALAR_TOPS = ("linear", "robust_linear", "linear_spline", "cubic",
                "loglinear", "normal", "lognormal", "radix", "bradix")
_FLOAT_LEAVES = ("linear", "robust_linear", "linear_spline", "cubic",
                 "loglinear", "normal", "lognormal")


def supports_fast_path(rmi) -> bool:
    return (rmi.leaf_errors is not None and rmi.keys is not None
            and rmi.cache_fix is None
            and rmi.top_type in _SCALAR_TOPS
            and rmi.leaf_type in _FLOAT_LEAVES)


def _pack_leaf_rows(rmi) -> jax.Array:
    """[B, 8] f64 rows: leaf params then the max error (exact in f64:
    errors < 2^53), padded — one row gather yields params AND error."""
    w = jnp.asarray(rmi.device_leaf_params["w"], dtype=jnp.float64)
    B, ppm = w.shape
    err = rmi.leaf_errors.astype(jnp.float64)[:, None]
    pad = jnp.zeros((B, 8 - ppm - 1), dtype=jnp.float64)
    return jnp.concatenate([w, err, pad], axis=1)


@jax.jit
def _pack_leaf_rows_df64(w, leaf_errors) -> jax.Array:
    """[B, 16] f32 rows for df64 serving: hi columns 0..ppm, lo columns
    ppm..2ppm, then the max error as TWO 16-bit integer halves in f32
    lanes — one row gather still yields params AND error (the
    reference's zipped layout, codegen.rs:288-316).

    The halves stay exact in f32 (< 2^16) and never form denormals;
    bitcasting the i32 error into an f32 lane instead produces
    denormal bit patterns that TPU float paths flush to zero,
    silently shrinking search windows.
    """
    from rmi_tpu.ops import df64
    wh, wl = df64.from_f64(jnp.asarray(w, dtype=jnp.float64))
    B, ppm = wh.shape
    e = leaf_errors.astype(jnp.int64)
    err_hi = (e >> 16).astype(jnp.float32)[:, None]
    err_lo = (e & 0xFFFF).astype(jnp.float32)[:, None]
    pad = jnp.zeros((B, 16 - 2 * ppm - 2), dtype=jnp.float32)
    return jnp.concatenate([wh, wl, err_hi, err_lo, pad], axis=1)


def _leaf_eval_rows(leaf_type: str, rows, x):
    """Evaluate a float-family leaf from its pre-gathered row."""
    if leaf_type in ("linear", "robust_linear", "linear_spline"):
        return rows[:, 1] * x + rows[:, 0]
    if leaf_type == "loglinear":
        from rmi_tpu.models.linear import exp1
        return exp1(rows[:, 1] * x + rows[:, 0])
    if leaf_type == "cubic":
        return ((rows[:, 0] * x + rows[:, 1]) * x + rows[:, 2]) * x \
            + rows[:, 3]
    if leaf_type in ("normal", "lognormal"):
        from rmi_tpu.models.normal import phi
        if leaf_type == "lognormal":
            raw = jnp.log(x)
            x = jnp.where(jnp.isnan(raw), 0.0, jnp.maximum(raw, 0.0))
        return phi((x - rows[:, 0]) / rows[:, 1]) * rows[:, 2]
    raise ValueError(leaf_type)


class SearchPlan:
    """Precomputed row views + level schedule for one RMI."""

    def __init__(self, keys: jax.Array, max_err: int):
        self.n = int(keys.shape[0])
        self.max_err = int(max_err)
        # level count: start level K with (2e)/64^K + 2 <= 64
        K = 0
        while (2 * self.max_err) / (LEVEL_FAN ** K) + 2 > LEVEL_FAN:
            K += 1
        self.K = K
        self.levels: List[jax.Array] = []      # row views, level 0..K
        self.level_lens: List[int] = []
        lvl = keys
        for _ in range(K + 1):
            self.levels.append(_overlapped_rows(lvl))
            self.level_lens.append(int(lvl.shape[0]))
            lvl = lvl[::LEVEL_FAN]


def _count_row(rows, row_idx, q):
    """64*row + #(R[row] < q) — one full-lane row gather + VPU count."""
    r = jnp.clip(row_idx, 0, rows.shape[0] - 1)
    blk = rows[r]                               # [m, 128]
    cnt = jnp.sum(blk < q[:, None], axis=1).astype(jnp.int64)
    return r * STRIDE + cnt


def resolve(plan_levels, queries, guess, err, *, K: int, n: int,
            level_lens):
    """Exact lower bounds from guesses via hierarchical row counts."""
    q = queries
    sK = LEVEL_FAN ** K
    # valid lower limit of lb at level K (see module docstring)
    lo = jnp.clip(guess - err, 0, n)
    LB = (lo + sK - 1) // sK
    lb = _count_row(plan_levels[K], LB >> 6, q)
    lb = jnp.minimum(lb, level_lens[K])
    for k in range(K - 1, -1, -1):
        LB = jnp.maximum(lb * LEVEL_FAN - LEVEL_FAN + 1, 0)
        lb = _count_row(plan_levels[k], LB >> 6, q)
        lb = jnp.minimum(lb, level_lens[k])
    return lb


@functools.partial(
    jax.jit,
    static_argnames=("top_type", "leaf_type", "B", "n", "key_type", "K",
                     "level_lens", "ppm"))
def _fast_search_df64(queries, top_params, packed_rows, off, s,
                      plan_levels, *, top_type, leaf_type, B, n,
                      key_type, K, level_lens, ppm):
    """df64-mode fused eval + hierarchical resolve: identical to
    _fast_search but the leaf eval runs through the float-float Pallas
    kernel that computed the error bounds (TrainedRMI.eval_mode)."""
    from rmi_tpu.ops import eval_kernel
    mtop = get_model(top_type)
    mleaf = get_model(leaf_type)
    xraw = keymod.as_float(queries)
    xn = (xraw - off) * s
    midx = predict_top_assignment(mtop, top_params, queries, xn, xraw,
                                  B - 1)
    rows = packed_rows[midx]                        # ONE row gather
    leaf_in = model_float_input(mleaf, xn, xraw)
    guess = eval_kernel.leaf_eval_clamped(
        leaf_in, rows, leaf_type=leaf_type, ppm=ppm,
        n=n - 1).astype(jnp.int64)
    err = (rows[:, 2 * ppm].astype(jnp.int64) * 65536
           + rows[:, 2 * ppm + 1].astype(jnp.int64))
    return resolve(plan_levels, queries, guess, err, K=K, n=n,
                   level_lens=level_lens)


@functools.partial(
    jax.jit,
    static_argnames=("top_type", "leaf_type", "B", "n", "key_type", "K",
                     "level_lens"))
def _fast_search(queries, top_params, packed_rows, off, s,
                 plan_levels, *, top_type, leaf_type, B, n, key_type, K,
                 level_lens):
    """Fused eval + hierarchical resolve (one dispatch).

    The leaf gather fetches a single packed [B, 8] row carrying both
    the leaf parameters and its zipped max error — exactly the cache-
    locality trick the reference plays with MixedArray zipping
    (codegen.rs:288-316), re-expressed as a full-lane row gather.
    """
    mtop = get_model(top_type)
    mleaf = get_model(leaf_type)
    xraw = keymod.as_float(queries)
    xn = (xraw - off) * s
    midx = predict_top_assignment(mtop, top_params, queries, xn, xraw,
                                  B - 1)
    rows = packed_rows[midx]                        # ONE row gather
    leaf_in = model_float_input(mleaf, xn, xraw)
    pred_f = _leaf_eval_rows(leaf_type, rows, leaf_in)
    guess = predict_clamped(pred_f, n - 1)
    ppm = get_model(leaf_type).ppm
    err = rows[:, ppm].astype(jnp.int64)
    return resolve(plan_levels, queries, guess, err, K=K, n=n,
                   level_lens=level_lens)


def get_plan(rmi) -> SearchPlan:
    plan = getattr(rmi, "_search_plan", None)
    if plan is None:
        max_err = int(jnp.max(rmi.leaf_errors)) \
            if rmi.leaf_errors is not None else 0
        plan = SearchPlan(rmi.keys, max_err)
        if getattr(rmi, "eval_mode", "xla") == "df64":
            plan.packed_rows = _pack_leaf_rows_df64(
                rmi.device_leaf_params["w"], rmi.leaf_errors)
        else:
            plan.packed_rows = _pack_leaf_rows(rmi)
        try:
            rmi._search_plan = plan
        except AttributeError:
            pass
    return plan


# Row gathers materialize [chunk, 128] blocks (1KB/query); cap the
# per-dispatch chunk so transients stay ~2GB even beside a 200M-key
# plan.  Equal-sized chunks reuse one compilation.
MAX_CHUNK = 1 << 21


def fast_search(rmi, queries):
    """Drop-in exact lower-bound search using the row-resolve path.
    Requires leaf errors and the trained key array on the rmi."""
    plan = get_plan(rmi)
    queries = jnp.asarray(queries)

    def dispatch(q):
        if getattr(rmi, "eval_mode", "xla") == "df64":
            return _fast_search_df64(
                q, rmi.device_top_params, plan.packed_rows,
                jnp.float64(rmi.norm_offset),
                jnp.float64(rmi.norm_scale), tuple(plan.levels),
                top_type=rmi.top_type, leaf_type=rmi.leaf_type,
                B=rmi.branching_factor, n=rmi.num_rmi_rows,
                key_type=rmi.key_type, K=plan.K,
                level_lens=tuple(plan.level_lens),
                ppm=get_model(rmi.leaf_type).ppm)
        return _fast_search(
            q, rmi.device_top_params, plan.packed_rows,
            jnp.float64(rmi.norm_offset),
            jnp.float64(rmi.norm_scale), tuple(plan.levels),
            top_type=rmi.top_type, leaf_type=rmi.leaf_type,
            B=rmi.branching_factor, n=rmi.num_rmi_rows,
            key_type=rmi.key_type, K=plan.K,
            level_lens=tuple(plan.level_lens))

    m = queries.shape[0]
    if m <= MAX_CHUNK:
        return dispatch(queries)
    pad = (-m) % MAX_CHUNK
    if pad:
        queries = jnp.concatenate(
            [queries, jnp.broadcast_to(queries[-1:], (pad,))])
    parts = [dispatch(queries[i:i + MAX_CHUNK])
             for i in range(0, queries.shape[0], MAX_CHUNK)]
    return jnp.concatenate(parts)[:m]
