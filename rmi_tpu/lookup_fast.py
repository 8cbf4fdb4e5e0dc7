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
from rmi_tpu.utils import segments as seg

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
    """Every trained RMI with errors serves through the row-resolve
    paths: monotone tops take the leaf-agnostic packed plan (any leaf
    family); the rest take the hierarchical plan with fused packed-row
    eval for float leaves or a generic eval+resolve for table leaves."""
    return (rmi.leaf_errors is not None and rmi.keys is not None
            and rmi.cache_fix is None)


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

    def __init__(self, keys: jax.Array, max_err: int, levels: bool = True):
        self.n = int(keys.shape[0])
        self.max_err = int(max_err)
        self.kind = "hier"
        # level count: start level K with (2e)/64^K + 2 <= 64
        K = 0
        while (2 * self.max_err) / (LEVEL_FAN ** K) + 2 > LEVEL_FAN:
            K += 1
        self.K = K
        self.levels: List[jax.Array] = []      # row views, level 0..K
        self.level_lens: List[int] = []
        lvl = keys
        for _ in range(K + 1 if levels else 1):
            self.levels.append(_overlapped_rows(lvl))
            self.level_lens.append(int(lvl.shape[0]))
            lvl = lvl[::LEVEL_FAN]


# widest leaf row for the packed (2-gather) plan: 1 base lane + S
# sample lanes, all u64.  1KB rows gather at the same issue rate as
# narrow ones, so the cap is generous; rows wider than 128 lanes keep
# the 2-gather path but decline the sorted-batch kernel (its VMEM
# window layout is fixed at 128 lanes, ops/sorted_serve_kernel.py).
_PACKED_MAX_LANES = 256

# tops provably MONOTONE over the full query domain — the correctness
# condition of the packed plan (lb(q) in [start_j, next_idx_j] for
# every q routed to leaf j; see _fast_search_packed).  loglinear and
# normal/lognormal tops are not unconditionally monotone — exp1(v) =
# (1+v/64)^64 turns around below v = -64 (even power) — but become so
# when the FITTED parameters keep every domain-clipped query inside
# the monotone region; _scalar_top_monotone checks that per plan.
# Monotonicity holds on the KEY DOMAIN [kmin, kmax]: linear-family
# tops are globally monotone (beta >= 0 on sorted data); the cubic is
# Fritsch-Carlson-clamped ON ITS INTERVAL (cubic_spline.rs:67-72) but
# can turn around beyond it; radix/bradix lose high bits for queries
# outside the keys' common prefix.  The packed search therefore ROUTES
# with domain-clipped queries and COUNTS with the raw ones (out-of-
# range queries resolve correctly through the boundary leaf's window).
# Table tops are monotone too: radix8-28 hint tables are searchsorted
# constructions over non-decreasing targets (radix.rs:94-113 — the
# trailing fill value `size` only clamps UP), and the histogram is an
# upper_bound over pivots whose first pivot is keys[0]
# (histogram.rs:31, 57-61), so domain-clipped queries never take its
# underflow wrap.
_MONOTONE_TOPS = ("linear", "robust_linear", "linear_spline", "cubic",
                  "radix", "bradix", "radix8", "radix18", "radix22",
                  "radix26", "radix28", "histogram")

# exp1's monotone region is v >= -64; phi(u) = 1/(1+exp1(-1.65451 u))
# feeds it w = -1.65451 u, so u must stay <= 64/1.65451 ~ 38.68.
# Margins absorb f64 rounding in the host-side endpoint evaluation.
_EXP1_V_MIN = -63.9
_PHI_U_MAX = 38.6


def _scalar_top_monotone(rmi) -> bool:
    """Host check: is this fitted loglinear/normal/lognormal top
    monotone non-decreasing over the domain-clipped query range?

    Every FP step in these evals is weakly monotone once inside the
    region (fma with beta >= 0; squaring chains on non-negative bases;
    multiply/divide by positive values), so endpoint conditions on the
    fitted parameters are sufficient:
      * loglinear (exp1(beta x + alpha)): beta >= 0 and the v at the
        domain's low end >= -64 (v is increasing, so the low end is
        the minimum);
      * normal/lognormal (phi((x-mean)/stdev) * scale): stdev > 0,
        scale >= 0 (it is a max FixDups target, but NaN/-inf empties
        exist), and u at the domain's high end <= 64/1.65451 so
        exp1's argument never leaves the monotone region.
    """
    w = np.asarray(rmi.device_top_params["w"], dtype=np.float64)[0]
    kminf = float(np.asarray(keymod.as_float(rmi.keys[0])))
    kmaxf = float(np.asarray(keymod.as_float(rmi.keys[-1])))
    if rmi.top_type == "loglinear":
        alpha, beta = w[0], w[1]
        if not (np.isfinite(alpha) and np.isfinite(beta) and beta >= 0):
            return False
        x_lo = (kminf - rmi.norm_offset) * rmi.norm_scale
        return bool(beta * x_lo + alpha >= _EXP1_V_MIN)
    # normal / lognormal
    mean, stdev, scale = w[0], w[1], w[2]
    if not (np.isfinite(mean) and np.isfinite(stdev) and stdev > 0.0
            and np.isfinite(scale) and scale >= 0.0):
        return False
    if rmi.top_type == "lognormal":
        # raw-domain input max(0, ln x) — itself non-decreasing in q
        x_hi = max(0.0, np.log(kmaxf)) if kmaxf > 0 else 0.0
    else:
        x_hi = (kmaxf - rmi.norm_offset) * rmi.norm_scale
    return bool((x_hi - mean) / stdev <= _PHI_U_MAX)


@functools.partial(jax.jit, static_argnames=("S", "F", "key_type"))
def _pack_u32_rows(starts, next_idx, keys, *, S: int, F: int = 1,
                   key_type):
    """[B, 1+2S] u32 rows: L1 base | S sample HI words | S sample LO
    words, samples = keys[64*(base + i*F)].

    u64 arrays are emulated as u32 pairs on TPU, so a u64 row gather
    ISSUES TWICE; packing the halves into one u32 row keeps the leaf
    fetch at a single gather.  The sample window covers every query
    routed to the leaf: for a top MONOTONE on the key domain, keys with
    midx < j all precede q and keys with midx > j all follow it, so
    lb(q) in [start_j, next_idx_j] — no error term involved.
    f64 keys enter through their order-preserving u64 image
    (keymod.ordered_u64), so the lane compares stay integer.

    ``F`` is the sample spacing in 64-key stripes: F=1 gives the
    2-gather plan (the window localizes lb to one stripe); F>1 gives
    the 3-gather WIDE plan, which localizes lb to F stripes and
    resolves the stripe with one extra mid-level row gather
    (_fast_search_packed_wide).
    """
    n = keys.shape[0]
    base = starts.astype(jnp.int64) // 64
    idx = base[:, None] * 64 \
        + jnp.arange(S, dtype=jnp.int64)[None, :] * (64 * F)
    valid = idx < n
    ki = keymod.ordered_u64(keys, key_type)
    samples = jnp.where(valid, ki[jnp.clip(idx, 0, n - 1)],
                        jnp.uint64(0xFFFFFFFFFFFFFFFF))
    hi = (samples >> jnp.uint64(32)).astype(jnp.uint32)
    lo = samples.astype(jnp.uint32)
    return jnp.concatenate([base.astype(jnp.uint32)[:, None], hi, lo],
                           axis=1)


@functools.partial(jax.jit, static_argnames=("nrows",))
def _fused_pair_rows_jit(hi_padded, lo_padded, *, nrows: int):
    def halves(p):
        lo_ = p[:nrows * STRIDE].reshape(nrows, STRIDE)
        hi_ = p[STRIDE:nrows * STRIDE + STRIDE].reshape(nrows, STRIDE)
        return jnp.concatenate([lo_, hi_], axis=1)
    return jnp.concatenate([halves(hi_padded), halves(lo_padded)], axis=1)


def _fused_pair_rows(keys: jax.Array, key_type) -> jax.Array:
    """[n] sorted keys -> [ceil(n/64), 256] u32 rows: lanes 0..128 the
    HI words of keys[64i:64i+128] (ordered-u64 image), lanes 128..256
    the LO words — the level-0 view fetchable with ONE u32 gather."""
    m = keys.shape[0]
    ki = keymod.ordered_u64(keys, key_type)
    nrows = max(1, -(-m // STRIDE))
    padded_len = nrows * STRIDE + WIDTH
    pad = jnp.full((padded_len - m,), jnp.uint64(0xFFFFFFFFFFFFFFFF),
                   jnp.uint64)
    padded = jnp.concatenate([ki, pad])
    hi = (padded >> jnp.uint64(32)).astype(jnp.uint32)
    lo = padded.astype(jnp.uint32)
    return _fused_pair_rows_jit(hi, lo, nrows=nrows)


def _pad_tail_rows(a: jax.Array, lanes_to: int | None = None):
    """Append >=8 all-ones rows (to the next sublane-tile multiple +8)
    and optionally lane-pad to ``lanes_to``.  Max-valued keys add 0 to
    any side=left count (never strictly < q) and the sorted-serve
    kernel's one-hot never selects them, so padding is correctness-
    neutral for BOTH serve paths — it exists so the sorted kernel's
    floor-to-8 DMA offsets can still cover the real tail rows
    (ops/sorted_serve_kernel.py)."""
    r, c = a.shape
    ones = jnp.uint32(0xFFFFFFFF)
    if lanes_to is not None and c < lanes_to:
        a = jnp.concatenate(
            [a, jnp.full((r, lanes_to - c), ones)], axis=1)
        c = lanes_to
    r_pad = ((r + 7) // 8) * 8 + 8
    return jnp.concatenate([a, jnp.full((r_pad - r, c), ones)])


def packed_sample_lanes(rmi) -> int:
    """Required sample-lane count S for the 2-gather packed plan
    (host int; sample spacing F=1)."""
    starts, next_idx = _leaf_spans_host(rmi)
    lo = starts // 64
    # lanes S with 64*(lo + S - 1) >= next_idx
    s_req = -(-(next_idx - lo * 64) // 64) + 1
    return max(2, int(np.max(s_req)))


# Max sample spacing (in stripes) of the wide plan.  The mid-level
# count row covers 128 consecutive stripe-first keys from row
# LB1 >> 6; with LB1 = base + (c1-1)*F <= lb1 <= LB1 + F the window is
# valid iff lb1 - 64*(LB1>>6) <= F + 63 <= 127, i.e. F <= 64.
_WIDE_MAX_STRIDE = 64


def packed_plan_shape(rmi):
    """(S, F) for the packed plan: sample-lane count and sample spacing
    in 64-key stripes.  F == 1 -> 2-gather plan; 1 < F <= 64 ->
    3-gather wide plan; None -> leaf spans too wide even at F=64
    (> ~126*64*64 ≈ 516K keys per leaf) — caller falls back to the
    hierarchical plan."""
    s_max = packed_sample_lanes(rmi)
    s_cap = (_PACKED_MAX_LANES - 1) // 2          # 127 sample lanes
    if s_max <= s_cap:
        return s_max, 1
    F = 2
    while F <= _WIDE_MAX_STRIDE and -(-(s_max - 1) // F) + 1 > s_cap:
        F *= 2
    if F > _WIDE_MAX_STRIDE:
        return None
    return -(-(s_max - 1) // F) + 1, F


def _leaf_spans_host(rmi):
    """(starts, next_idx) per leaf, computed once and cached."""
    cached = getattr(rmi, "_leaf_spans", None)
    if cached is not None:
        return cached
    mtop = get_model(rmi.top_type)
    keys = rmi.keys
    xraw = keymod.as_float(keys)
    xn = (xraw - rmi.norm_offset) * rmi.norm_scale

    @jax.jit
    def spans_fn(keys, xn, xraw):
        t = predict_top_assignment(
            mtop, rmi.device_top_params, keys, xn, xraw,
            rmi.branching_factor - 1).astype(jnp.int32)
        # t is non-decreasing over the sorted keys: blocked
        # sorted_starts, not searchsorted (244ms-class at 200M/2^18)
        starts = seg.sorted_starts(t, rmi.branching_factor)
        ends = jnp.concatenate([starts[1:],
                                jnp.full((1,), t.shape[0], starts.dtype)])
        nonempty = starts < ends
        big = jnp.int64(t.shape[0] + 1)
        first_val = jnp.where(nonempty, starts.astype(jnp.int64), big)
        suffix_min = jax.lax.cummin(first_val[::-1])[::-1]
        next_start = jnp.concatenate(
            [suffix_min[1:], jnp.full((1,), big, jnp.int64)])
        next_idx = jnp.where(next_start < big, next_start, t.shape[0])
        return starts.astype(jnp.int64), next_idx

    starts, next_idx = jax.device_get(spans_fn(keys, xn, xraw))
    out = (starts, next_idx)
    try:
        rmi._leaf_spans = out
    except AttributeError:
        pass
    return out


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


_resolve_jit = functools.partial(
    jax.jit, static_argnames=("K", "n", "level_lens"))(resolve)


@functools.partial(
    jax.jit,
    static_argnames=("top_type", "B", "n", "key_type", "S"))
def _fast_search_packed(queries, top_params, rows_u32, off, s, level0,
                        kmin_key, kmax_key, *, top_type, B, n, key_type,
                        S):
    """2-gather exact search: ONE [B, 1+2S] u32 leaf-row gather (an L1
    sample window provably covering every query routed to the leaf) +
    ONE fused hi/lo level-0 key-row gather.

    For a MONOTONE top model, every key with a smaller leaf id
    precedes q and every key with a larger one follows it, so
    lb(q) in [start_j, next_idx_j] — the leaf's sample window locates
    lb to within one 64-key stripe WITHOUT evaluating the leaf model
    at all.  Replaces the 3-gather hierarchical resolve whenever the
    window fits the row (<= ~8K-key leaf spans); the gather issue rate
    (~25ns/row) is the serving cap, so dropping a gather is a ~1.4x
    throughput win.
    """
    mtop = get_model(top_type)
    qr = jnp.clip(queries, kmin_key, kmax_key)   # monotone routing domain
    xraw = keymod.as_float(qr)
    xn = (xraw - off) * s
    midx = predict_top_assignment(mtop, top_params, qr, xn, xraw,
                                  B - 1)
    rows = rows_u32[midx]                           # gather #1 (u32!)
    base = rows[:, 0].astype(jnp.int64)
    qi = keymod.ordered_u64(queries, key_type)
    qhi = (qi >> jnp.uint64(32)).astype(jnp.uint32)[:, None]
    qlo = qi.astype(jnp.uint32)[:, None]
    shi = rows[:, 1:1 + S]
    slo = rows[:, 1 + S:1 + 2 * S]
    lt = (shi < qhi) | ((shi == qhi) & (slo < qlo))
    c1 = jnp.sum(lt, axis=1).astype(jnp.int64)
    # lb in (64*(base+c1-1), 64*(base+c1)] -> one level-0 row resolves
    row0 = jnp.clip(base + c1 - 1, 0, level0.shape[0] - 1)
    blk = level0[row0]                              # gather #2 (u32!)
    bhi = blk[:, :WIDTH]
    blo = blk[:, WIDTH:]
    blt = (bhi < qhi) | ((bhi == qhi) & (blo < qlo))
    cnt = jnp.sum(blt, axis=1).astype(jnp.int64)
    return jnp.minimum(row0 * STRIDE + cnt, n)


@functools.partial(
    jax.jit,
    static_argnames=("top_type", "B", "n", "key_type", "S", "F"))
def _fast_search_packed_wide(queries, top_params, rows_u32, off, s,
                             level1, level0, kmin_key, kmax_key, *,
                             top_type, B, n, key_type, S, F):
    """3-gather exact search for WIDE leaf spans: the leaf row's
    samples are spaced F stripes apart (F <= 64), so the window count
    localizes lb to F consecutive stripes instead of one; ONE extra
    mid-level row gather over the stripe-first keys L1 = keys[::64]
    (fused u32 hi/lo rows like level 0) resolves the exact stripe,
    and the level-0 row finishes as in the 2-gather plan.

    Correctness: for a monotone top, lb(q) in [start_j, next_idx_j]
    (same argument as _fast_search_packed).  With c1 = #(samples < q),
    lb1 := #(stripe-first keys < q) satisfies
      base + (c1-1)*F < lb1 <= base + c1*F    (c1 >= 1; for c1 = 0,
      base <= lb1 <= base since lb >= 64*base),
    so the mid row at LB1 >> 6 with LB1 = base + (c1-1)*F covers lb1
    for F <= 64 (lb1 - 64*(LB1>>6) <= F + 63 < 128), and finally
    lb in (64*(lb1-1), 64*lb1], covered by level-0 row lb1 - 1.

    This replaces the 4-gather hierarchical path for monotone tops
    whose leaf spans exceed the 2-gather plan's ~8K-key window
    (e.g. small branching factors on large arrays) up to ~516K-key
    spans; serving is gather-issue-bound, so 3 gathers vs 4 plus the
    skipped leaf-model eval is a ~1.5x throughput win.
    """
    mtop = get_model(top_type)
    qr = jnp.clip(queries, kmin_key, kmax_key)   # monotone routing domain
    xraw = keymod.as_float(qr)
    xn = (xraw - off) * s
    midx = predict_top_assignment(mtop, top_params, qr, xn, xraw,
                                  B - 1)
    rows = rows_u32[midx]                           # gather #1 (leaf row)
    base = rows[:, 0].astype(jnp.int64)
    qi = keymod.ordered_u64(queries, key_type)
    qhi = (qi >> jnp.uint64(32)).astype(jnp.uint32)[:, None]
    qlo = qi.astype(jnp.uint32)[:, None]
    shi = rows[:, 1:1 + S]
    slo = rows[:, 1 + S:1 + 2 * S]
    lt = (shi < qhi) | ((shi == qhi) & (slo < qlo))
    c1 = jnp.sum(lt, axis=1).astype(jnp.int64)
    nrows0 = -(-n // STRIDE)                     # len(L1), static
    LB1 = jnp.clip(base + (c1 - 1) * F, 0, nrows0)
    r1 = jnp.clip(LB1 >> 6, 0, level1.shape[0] - 1)
    blk1 = level1[r1]                               # gather #2 (mid level)
    lt1 = (blk1[:, :WIDTH] < qhi) \
        | ((blk1[:, :WIDTH] == qhi) & (blk1[:, WIDTH:] < qlo))
    lb1 = jnp.minimum(r1 * STRIDE
                      + jnp.sum(lt1, axis=1).astype(jnp.int64), nrows0)
    row0 = jnp.clip(lb1 - 1, 0, level0.shape[0] - 1)
    blk = level0[row0]                              # gather #3 (level 0)
    blt = (blk[:, :WIDTH] < qhi) \
        | ((blk[:, :WIDTH] == qhi) & (blk[:, WIDTH:] < qlo))
    cnt = jnp.sum(blt, axis=1).astype(jnp.int64)
    return jnp.minimum(row0 * STRIDE + cnt, n)


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
    from rmi_tpu.ops.sweep_kernel import df64_eval_input
    leaf_in = df64_eval_input(leaf_type,
                              model_float_input(mleaf, xn, xraw))
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


def _try_packed_plan(rmi, max_err):
    """Build the packed plan when it applies (monotone top, per-leaf
    window coverable at sample spacing F <= 64): 2-gather for F == 1,
    3-gather wide for F > 1."""
    import os
    if os.environ.get("RMI_SERVE_PLAN") == "hier":
        return None
    if rmi.top_type not in _MONOTONE_TOPS:
        if rmi.top_type not in ("loglinear", "normal", "lognormal"):
            return None
        if not _scalar_top_monotone(rmi):
            return None
    if rmi.key_type.is_float and get_model(rmi.top_type).output_int:
        # int-routing tops (radix family, histogram) bit-slice integer
        # keys; float keys route through float-predicting tops only
        return None
    shape = packed_plan_shape(rmi)
    if shape is None:
        return None
    S, F = shape
    if F > 1 and os.environ.get("RMI_SERVE_PLAN") == "packed":
        return None          # force the 2-gather plan or nothing
    starts, next_idx = _leaf_spans_host(rmi)
    plan = SearchPlan.__new__(SearchPlan)
    plan.n = int(rmi.keys.shape[0])
    plan.max_err = max_err
    plan.kind = "packed" if F == 1 else "packed_wide"
    plan.S = S
    plan.F = F
    plan.level0_pair = _pad_tail_rows(
        _fused_pair_rows(rmi.keys, rmi.key_type))
    plan.rows_u32 = _pad_tail_rows(_pack_u32_rows(
        jnp.asarray(starts), jnp.asarray(next_idx), rmi.keys, S=S, F=F,
        key_type=rmi.key_type),
        lanes_to=128 if 1 + 2 * S <= 128 else _PACKED_MAX_LANES)
    if F > 1:
        # mid level: stripe-first keys L1 = keys[::64] as fused u32
        # hi/lo rows (ceil(n/64) entries — ~1.6% of the key array)
        plan.level1_pair = _pad_tail_rows(
            _fused_pair_rows(rmi.keys[::STRIDE], rmi.key_type))
    return plan


def get_plan(rmi) -> SearchPlan:
    plan = getattr(rmi, "_search_plan", None)
    if plan is None:
        max_err = int(jnp.max(rmi.leaf_errors)) \
            if rmi.leaf_errors is not None else 0
        plan = _try_packed_plan(rmi, max_err)
        if plan is None:
            plan = SearchPlan(rmi.keys, max_err)
            if rmi.leaf_type not in _FLOAT_LEAVES:
                # table leaves: generic eval + resolve (no packable row)
                plan.packed_rows = None
            elif getattr(rmi, "eval_mode", "xla") == "df64":
                plan.packed_rows = _pack_leaf_rows_df64(
                    rmi.device_leaf_params["w"], rmi.leaf_errors)
            else:
                plan.packed_rows = _pack_leaf_rows(rmi)
        # key-domain endpoints as cached device scalars: evaluating
        # rmi.keys[0] / keys[-1] per serve call is a dynamic_slice
        # whose x64 emulation SPLITS THE WHOLE KEY ARRAY into u32
        # halves first — 18.8ms/call at 200M keys (probe_trace_serve)
        plan.kmin_key = rmi.keys[0]
        plan.kmax_key = rmi.keys[-1]
        try:
            rmi._search_plan = plan
        except AttributeError:
            pass
    return plan


# ---------------------------------------------------------------------------
# sorted-batch serving (gather-free; ops/sorted_serve_kernel.py)
# ---------------------------------------------------------------------------

def fast_search_sorted(rmi, queries):
    """Exact lower bounds for a NON-DECREASING query batch.

    Uses a gather-free window kernel when the batch is dense enough
    for its DMA windows (the usual bulk-lookup shape); falls back to
    the per-query gather path otherwise.  Callers with unsorted
    batches: ``fast_search_via_sort`` packages the argsort + inverse
    permutation trade."""
    plan = get_plan(rmi)
    queries = jnp.asarray(queries)
    if (plan.kind in ("packed", "packed_wide")
            and queries.shape[0] >= 1 << 14):
        out = _sorted_kernel_search_direct(rmi, plan, queries)
        if out is not None:
            return out
    return fast_search(rmi, queries)


# ---------------------------------------------------------------------------
# direct-count sorted search: stripe counts in-window, leaf-width-free
# ---------------------------------------------------------------------------

# gather-fallback chunk: bounds the [CH, 128] row-gather transient
_FUSED_FALLBACK_CHUNK = 1 << 20

@functools.partial(jax.jit, static_argnames=("top_type", "B", "S", "F",
                                             "key_type"))
def _sorted_stats_direct(queries, top_params, rows_u32, off, s,
                         kmin_key, kmax_key, *, top_type, B, S, F,
                         key_type):
    """Per-subgroup window anchors for the direct-count kernel.

    Each subgroup's BOUNDARY queries localize their stripe lower bound
    through the leaf sample row: LB1 <= lb1 <= LB1 + F.  lb1 is
    monotone over a sorted batch, so every query in the subgroup has
      lb1 in [lb1_first, lb1_last] ⊆ [LB1_first, LB1_last + F],
    giving a window anchor (LB1_first) and span bound per subgroup from
    just 2 row gathers per 128 queries.

    The top model is evaluated ONLY on the 2/SUBQ boundary slices —
    a full-batch top eval here measured 21ms of the 43ms stats stage
    at 4M queries (emulated-f64 cubic), all of it dead work: the
    kernel never consumes per-query leaf ids, only the subgroup
    anchors."""
    from rmi_tpu.ops.sorted_serve_kernel import KQ, SUBQ
    mtop = get_model(top_type)

    def LB1_of(qsel):
        qr = jnp.clip(qsel, kmin_key, kmax_key)
        xraw = keymod.as_float(qr)
        xn = (xraw - off) * s
        midx = predict_top_assignment(mtop, top_params, qr, xn, xraw,
                                      B - 1).astype(jnp.int32)
        rows = rows_u32[midx]
        base = rows[:, 0].astype(jnp.int32)
        qb = keymod.ordered_u64(qsel, key_type)
        qhi = (qb >> jnp.uint64(32)).astype(jnp.uint32)[:, None]
        qlo = qb.astype(jnp.uint32)[:, None]
        shi = rows[:, 1:1 + S]
        slo_ = rows[:, 1 + S:1 + 2 * S]
        lt = (shi < qhi) | ((shi == qhi) & (slo_ < qlo))
        c1 = jnp.sum(lt, axis=1).astype(jnp.int32)
        return base + (c1 - 1) * F

    LB1_f = LB1_of(queries[::SUBQ])
    LB1_l = LB1_of(queries[SUBQ - 1::SUBQ])
    nsub = KQ // SUBQ
    sub_span = LB1_l - LB1_f + (F + 2)
    blk_span = LB1_l[nsub - 1::nsub] - LB1_f[::nsub] + (F + 2)
    maxes = jnp.stack([jnp.max(sub_span), jnp.max(blk_span)])
    return LB1_f, maxes


@functools.partial(jax.jit, static_argnames=("nrows0_pad", "W0",
                                             "W_sub"))
def _sorted_offsets_direct(LB1_f, *, nrows0_pad, W0, W_sub):
    """Window offsets for the direct-count kernel.

    The subgroup window must start at or below max(lb1_min - 1, 0) and
    reach lb1_max: the -2 absorbs the -1 anchor plus boundary-LB1
    slack; the kernel's floor-to-8 and this floor are covered by the
    +8 margin in the tier fits check.  Lower-clipping a subgroup to its
    block start stays valid because lb1 is monotone across the block
    (blk_lo <= LB1_first(block) - 2 <= lb1_min(sub) - 2)."""
    from rmi_tpu.ops.sorted_serve_kernel import KQ, SUBQ
    nsub = KQ // SUBQ
    blk_lo = (jnp.clip(LB1_f[::nsub] - 2, 0,
                       max(nrows0_pad - W0, 0)) // 8) * 8
    blk_rep = jnp.repeat(blk_lo, nsub)
    sub_lo = jnp.clip(LB1_f - 2, blk_rep, blk_rep + (W0 - W_sub))
    return blk_lo.astype(jnp.int32), sub_lo.astype(jnp.int32)


# (W0, W_sub) tier lattice of the direct kernel — 2-D (no leaf-row
# dimension), cost-ordered: W0 drives the block DMA, W_sub the
# per-subgroup count + select work.
_DIRECT_TIERS = ((512, 64), (2048, 128), (2048, 256), (4096, 256),
                 (4096, 512))


@functools.partial(jax.jit, static_argnames=(
    "top_type", "B", "S", "F", "key_type", "n", "nrows0_pad", "tiers"))
def _sorted_fused_core_direct(queries, top_params, rows_u32, level1,
                              level0, off, s, kmin_key, kmax_key, *,
                              top_type, B, S, F, key_type, n,
                              nrows0_pad, tiers):
    """Direct-count twin of _sorted_fused_core: ONE device program,
    traced lax.switch over (W0, W_sub) tiers, chunked gather fallback
    (packed for F == 1, packed-wide otherwise) — works for ANY leaf
    width, including wide plans the v1 kernel declines."""
    from rmi_tpu.ops import sorted_serve_kernel as ssk
    nq = queries.shape[0]
    nrows0 = max(1, -(-n // STRIDE))
    LB1_f, maxes = _sorted_stats_direct(
        queries, top_params, rows_u32, off, s, kmin_key, kmax_key,
        top_type=top_type, B=B, S=S, F=F, key_type=key_type)
    qi = keymod.ordered_u64(queries, key_type)
    qhi = (qi >> jnp.uint64(32)).astype(jnp.uint32)
    qlo = qi.astype(jnp.uint32)

    def tier_branch(W0, Ws):
        def br():
            blk_lo, sub_lo = _sorted_offsets_direct(
                LB1_f, nrows0_pad=nrows0_pad, W0=W0, W_sub=Ws)
            out = ssk.serve_sorted_direct_call(
                qhi, qlo, blk_lo, sub_lo, level0, nrows0=nrows0, n=n,
                W0=W0, W_sub=Ws)
            return out.reshape(-1)
        return br

    def fallback():
        CH = _FUSED_FALLBACK_CHUNK
        pad2 = (-nq) % CH
        qp = jnp.concatenate(
            [queries, jnp.broadcast_to(queries[-1:], (pad2,))]) \
            if pad2 else queries
        if F == 1:
            fn = lambda qc: _fast_search_packed(           # noqa: E731
                qc, top_params, rows_u32, off, s, level0, kmin_key,
                kmax_key, top_type=top_type, B=B, n=n,
                key_type=key_type, S=S)
        else:
            fn = lambda qc: _fast_search_packed_wide(      # noqa: E731
                qc, top_params, rows_u32, off, s, level1, level0,
                kmin_key, kmax_key, top_type=top_type, B=B, n=n,
                key_type=key_type, S=S, F=F)
        outs = jax.lax.map(fn, qp.reshape(-1, CH))
        return outs.reshape(-1)[:nq].astype(jnp.int32)

    # +8 margin: offsets and the kernel floor to sublane-tile multiples
    fits = [(maxes[0] + 8 <= Ws) & (maxes[1] + 8 <= W0)
            for (W0, Ws) in tiers]
    idx = jnp.int32(len(tiers))
    for i in reversed(range(len(tiers))):
        idx = jnp.where(fits[i], jnp.int32(i), idx)
    branches = [tier_branch(*t) for t in tiers] + [fallback]
    return jax.lax.switch(idx, branches)


def _sorted_kernel_search_direct(rmi, plan, queries):
    """Fused direct-count search for a sorted batch; None when the
    plan's geometry rules it out entirely.

    This is the ONLY sorted-batch kernel: the round-5 on-device A/B
    (sorted 4M batches at 25M keys) measured it at 244 M/s vs the
    since-deleted v1 leaf-row kernel's 166 M/s on cubic,linear 262144
    and a tie (244 vs 249) on linear_spline,linear 65536 — its level-0
    counting avoids the leaf-row DMA that dominated v1 at large B, and
    it serves wide (F > 1) plans v1 had to decline."""
    from rmi_tpu.ops import sorted_serve_kernel as ssk
    n = plan.n
    nrows0_pad = plan.level0_pair.shape[0]
    tiers = tuple(t for t in _DIRECT_TIERS if t[0] <= nrows0_pad)
    if not tiers or n >= 2**31 - 64:
        return None
    nq = queries.shape[0]
    pad = (-nq) % ssk.KQ
    if pad:
        queries = jnp.concatenate(
            [queries, jnp.broadcast_to(queries[-1:], (pad,))])
    F = getattr(plan, "F", 1)
    level1 = plan.level1_pair if F > 1 else plan.level0_pair
    out = _sorted_fused_core_direct(
        queries, rmi.device_top_params, plan.rows_u32, level1,
        plan.level0_pair, jnp.float64(rmi.norm_offset),
        jnp.float64(rmi.norm_scale), plan.kmin_key, plan.kmax_key,
        top_type=rmi.top_type, B=rmi.branching_factor, S=plan.S, F=F,
        key_type=rmi.key_type, n=n, nrows0_pad=nrows0_pad, tiers=tiers)
    return out[:nq].astype(jnp.int64)


# ---------------------------------------------------------------------------
# random-batch serving through the sorted kernel: sort -> serve -> unsort
# ---------------------------------------------------------------------------

# After two consecutive kernel declines the sort+stats probe is skipped,
# but re-tried once every this-many vetoed calls so a workload whose
# batch density rises recovers the ~2x-faster kernel path.
SORT_SERVE_REPROBE = 64


@jax.jit
def _sort_with_order(q):
    return jax.lax.sort_key_val(
        q, jax.lax.iota(jnp.int32, q.shape[0]))


@jax.jit
def _unsort_i32(order, vals):
    """Inverse-permute ``vals`` (non-negative i32) back to input order.

    Packs (order, val) into one u64 and runs a SINGLE-operand sort
    instead of the variadic sort_key_val: one 64-bit lane stream
    instead of two 32-bit ones (8.6ms vs 11.9ms standalone on 4M
    elements; end-to-end the chained pipeline overlaps the unsort
    with the next batch's sort, so the measured e2e gain is small —
    49.9 vs 50.3 ms/batch at 200M/4M, probe_sort_pipeline
    2026-08-20).  Exact: ``order`` is a permutation (distinct keys),
    both halves are non-negative i32, so unpacking the sorted array
    reproduces sort_key_val's output bit-for-bit."""
    packed = ((order.astype(jnp.uint64) << jnp.uint64(32))
              | vals.astype(jnp.uint32).astype(jnp.uint64))
    return jax.lax.sort(packed).astype(jnp.uint32).astype(jnp.int32)


def fast_search_via_sort(rmi, queries):
    """Exact lower bounds for an ARBITRARY-ORDER batch via the
    gather-free sorted kernel.

    The 2-gather packed path is pinned at the TPU dynamic-gather issue
    rate (~50ns/query); XLA's TPU sort is a vectorized sorting network
    with no such cap, so for large batches
      sort_key_val(q, iota) -> sorted kernel -> sort_key_val(order, lb)
    beats gathering (the inverse permutation is a second sort — a
    direct scatter would itself hit the issue-rate cap).  Falls back to
    the gather path when the sorted kernel declines (sparse batch).
    """
    plan = get_plan(rmi)
    queries = jnp.asarray(queries)
    nq = queries.shape[0]
    # density gate: a uniform batch needs the per-block stripe span
    # (~nrows0 * KQ / nq) to fit the largest window tier with headroom,
    # i.e. nq >= ~0.75 * nrows0 — below that the sort+stats probe would
    # all but surely decline (the veto below catches skewed cases)
    nrows0 = max(1, -(-plan.n // STRIDE))
    sharding = getattr(queries, "sharding", None)
    multi_dev = (sharding is not None
                 and len(sharding.device_set) > 1
                 and not sharding.is_fully_replicated)
    if (plan.kind not in ("packed", "packed_wide")
            or nq >= 2**31 or 4 * nq < 3 * nrows0
            or multi_dev):  # a global sort would ride collectives;
                            # sharded batches use parallel.serve's
                            # per-shard sorted pipeline instead
        return fast_search(rmi, queries)
    if getattr(plan, "_sort_serve_veto", 0) >= 2:
        # >= 2 consecutive declines: this workload's batches are too
        # sparse for the window tiers — stop paying the sort+stats
        # probe on every call (the gather path is the right shape).
        # The veto DECAYS: every SORT_SERVE_REPROBE-th vetoed call
        # re-probes once, so a workload whose batches become dense
        # recovers the kernel path instead of being stuck forever.
        skips = getattr(plan, "_sort_serve_skips", 0) + 1
        if skips < SORT_SERVE_REPROBE:
            plan._sort_serve_skips = skips
            return fast_search(rmi, queries)
        plan._sort_serve_skips = 0
    qs, order = _sort_with_order(queries)
    lb = _sorted_kernel_search_direct(rmi, plan, qs)
    if lb is None:
        plan._sort_serve_veto = getattr(plan, "_sort_serve_veto", 0) + 1
        return fast_search(rmi, queries)
    plan._sort_serve_veto = 0
    plan._sort_serve_skips = 0
    return _unsort_i32(order, lb.astype(jnp.int32)).astype(jnp.int64)


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
        if plan.kind == "packed":
            return _fast_search_packed(
                q, rmi.device_top_params, plan.rows_u32,
                jnp.float64(rmi.norm_offset),
                jnp.float64(rmi.norm_scale), plan.level0_pair,
                plan.kmin_key, plan.kmax_key,
                top_type=rmi.top_type, B=rmi.branching_factor,
                n=rmi.num_rmi_rows, key_type=rmi.key_type, S=plan.S)
        if plan.kind == "packed_wide":
            return _fast_search_packed_wide(
                q, rmi.device_top_params, plan.rows_u32,
                jnp.float64(rmi.norm_offset),
                jnp.float64(rmi.norm_scale), plan.level1_pair,
                plan.level0_pair, plan.kmin_key, plan.kmax_key,
                top_type=rmi.top_type, B=rmi.branching_factor,
                n=rmi.num_rmi_rows, key_type=rmi.key_type, S=plan.S,
                F=plan.F)
        if plan.packed_rows is None:
            # generic eval (covers int-output table leaves) + resolve
            from rmi_tpu.lookup import _eval
            guess, err, _ = _eval(rmi, q)
            return _resolve_jit(
                tuple(plan.levels), q, guess, err, K=plan.K,
                n=rmi.num_rmi_rows, level_lens=tuple(plan.level_lens))
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
