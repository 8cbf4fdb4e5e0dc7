"""Data-parallel two-layer training over a device mesh.

The reference is single-node shared-memory (rayon threads,
main.rs:104-109); the scale axis here is the sorted key array itself:
shard it across chips (`Mesh(('data',))`), keep per-leaf [B] statistics
replicated, and express every pass with three distributed primitives:

  * ``global_range_sum``   — psum of per-shard prefix-sum differences
                             (the sharded form of utils/segments.py);
  * ``global_value_at``    — owner-computes + psum point gather;
  * ``global_searchsorted``— psum of local searchsorted counts (valid
                             because leaf ids / keys are globally
                             sorted).

Cross-shard sequential state (FixDups run starts, duplicate-run ends)
uses the classic scan decomposition: local cumulative op + an
all-gathered per-shard carry.  All collectives ride ICI (psum /
all_gather / ppermute); nothing materializes the global array on one
chip.

Scope: every scalar-parameter top model (DP_TOP_MODELS — the full
linear family, cubic, normal/lognormal, radix, bradix, histogram) and
every float-output leaf family (DP_LEAF_MODELS).  Radix hint-TABLE
leaves (radix8-28) are single-chip only: their [2^bits] tables are
built by global searchsorted over the whole key array, which has no
benefit from data sharding at table sizes that fit one chip.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        # check_vma=False: replication of all-gathered bit-reductions
        # (radix prefixes) cannot be statically inferred
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=False)
except (ImportError, TypeError):  # older jax
    from jax.experimental.shard_map import shard_map as _shard_map_old

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_old(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_rep=False)

from rmi_tpu import keys as keymod
from rmi_tpu.keys import KeyType
from rmi_tpu.utils import segments as seg

AXIS = "data"

DP_TOP_MODELS = ("linear", "robust_linear", "linear_spline", "cubic",
                 "loglinear", "normal", "lognormal", "radix", "bradix",
                 "histogram")
DP_LEAF_MODELS = ("linear", "robust_linear", "linear_spline", "cubic",
                  "loglinear", "normal", "lognormal")


# ---------------------------------------------------------------------------
# distributed primitives (called inside shard_map)
# ---------------------------------------------------------------------------

def _offset(m):
    return jax.lax.axis_index(AXIS).astype(jnp.int64) * m


def global_range_sum(v_local, a, b):
    """sum(v_global[a_j:b_j]) for replicated index vectors a, b."""
    m = v_local.shape[0]
    off = _offset(m)
    c = jnp.concatenate([jnp.zeros((1,), jnp.float64),
                         jnp.cumsum(v_local.astype(jnp.float64))])
    lo = jnp.clip(a - off, 0, m)
    hi = jnp.clip(b - off, 0, m)
    return jax.lax.psum(c[hi] - c[lo], AXIS)


def global_value_at(v_local, g, dtype=None):
    """v_global[g_j] for replicated global indices g (owner + psum)."""
    m = v_local.shape[0]
    off = _offset(m)
    gi = g - off
    owns = (gi >= 0) & (gi < m)
    val = jnp.where(owns, v_local[jnp.clip(gi, 0, m - 1)], 0)
    if dtype is not None:
        val = val.astype(dtype)
    return jax.lax.psum(val, AXIS)


def global_searchsorted(sorted_local, queries, side="left"):
    """Global lower/upper bound index of each query in the sharded
    globally-sorted array."""
    local = jnp.searchsorted(sorted_local, queries, side=side)
    return jax.lax.psum(local.astype(jnp.int64), AXIS)


def _carry_max(local_cummax_last):
    """Exclusive prefix max of per-shard scalars (for cummax carries)."""
    allv = jax.lax.all_gather(local_cummax_last, AXIS)
    i = jax.lax.axis_index(AXIS)
    ndev = allv.shape[0]
    mask = jnp.arange(ndev) < i
    return jnp.max(jnp.where(mask, allv, jnp.zeros_like(allv)))


def _carry_min_rev(local_cummin_first, fill):
    """Exclusive suffix min of per-shard scalars (for reverse cummin)."""
    allv = jax.lax.all_gather(local_cummin_first, AXIS)
    i = jax.lax.axis_index(AXIS)
    ndev = allv.shape[0]
    mask = jnp.arange(ndev) > i
    return jnp.min(jnp.where(mask, allv, jnp.full_like(allv, fill)))


def _neighbor_last_key(keys_local):
    """Each shard receives the previous shard's last key (ppermute)."""
    ndev = jax.lax.axis_size(AXIS)
    perm = [(j, (j + 1) % ndev) for j in range(ndev)]
    return jax.lax.ppermute(keys_local[-1:], AXIS, perm)[0]


def _neighbor_first_key(keys_local):
    ndev = jax.lax.axis_size(AXIS)
    perm = [(j, (j - 1) % ndev) for j in range(ndev)]
    return jax.lax.ppermute(keys_local[:1], AXIS, perm)[0]


# ---------------------------------------------------------------------------
# distributed FixDups + duplicate runs
# ---------------------------------------------------------------------------

def dist_fixdups(keys_local):
    """Global first-occurrence index per element (sharded cummax scan)."""
    m = keys_local.shape[0]
    off = _offset(m)
    i = jax.lax.axis_index(AXIS)
    left_last = _neighbor_last_key(keys_local)
    c0 = jnp.where(i == 0, True, keys_local[0] != left_last)
    changed = jnp.concatenate([c0[None], keys_local[1:] != keys_local[:-1]])
    gidx = off + jnp.arange(m, dtype=jnp.int64)
    local_start = jax.lax.cummax(jnp.where(changed, gidx, 0))
    carry = _carry_max(local_start[-1])
    return jnp.maximum(local_start, carry), changed


def dist_run_bounds(keys_local, changed, n):
    """(run_start, run_end) global indices per element."""
    m = keys_local.shape[0]
    off = _offset(m)
    i = jax.lax.axis_index(AXIS)
    ndev = jax.lax.axis_size(AXIS)
    gidx = off + jnp.arange(m, dtype=jnp.int64)

    local_start = jax.lax.cummax(jnp.where(changed, gidx, 0))
    run_start = jnp.maximum(local_start, _carry_max(local_start[-1]))

    right_first = _neighbor_first_key(keys_local)
    e_last = jnp.where(i == ndev - 1, True, keys_local[-1] != right_first)
    ends = jnp.concatenate([keys_local[1:] != keys_local[:-1],
                            e_last[None]])
    rev = jnp.where(ends, gidx, n - 1)[::-1]
    local_cummin = jax.lax.cummin(rev)[::-1]
    carry = _carry_min_rev(local_cummin[0], n - 1)
    run_end = jnp.minimum(local_cummin, carry)
    return run_start, run_end


# ---------------------------------------------------------------------------
# distributed model fits
# ---------------------------------------------------------------------------

def _dist_slr(xf, yf, t_local, a, b, mean_gather: bool, B):
    """Distributed two-pass SLR over global ranges [a_j, b_j).

    ``t_local`` maps local elements to leaves for the interior term of
    the second pass (pass None with B==1 for whole-array fits)."""
    cnt = global_range_sum(jnp.ones_like(xf), a, b)
    sx = global_range_sum(xf, a, b)
    sy = global_range_sum(yf, a, b)
    safe = jnp.maximum(cnt, 1.0)
    mean_x, mean_y = sx / safe, sy / safe

    if mean_gather:
        mx_t = mean_x[t_local]
        my_t = mean_y[t_local]
    else:
        mx_t, my_t = mean_x[0], mean_y[0]

    # interior on [starts, ends) is handled by the caller passing the
    # correct (a, b); edge corrections are added by the leaf fit.
    dxx = (xf - mx_t) * (xf - mx_t)
    dxy = (xf - mx_t) * (yf - my_t)
    return cnt, mean_x, mean_y, dxx, dxy


def _slr_combine(cnt, mean_x, mean_y, m2, c):
    var_zero = m2 <= 0.0
    beta = jnp.where(var_zero, 0.0, c / jnp.where(var_zero, 1.0, m2))
    alpha = mean_y - beta * mean_x
    alpha = jnp.where(cnt == 0, 0.0,
                      jnp.where((cnt == 1) | var_zero, mean_y, alpha))
    beta = jnp.where((cnt <= 1) | var_zero, 0.0, beta)
    return jnp.stack([alpha, beta], axis=-1)


def _predict_linear(params, idx, x):
    if idx is None:
        return params[0, 1] * x + params[0, 0]
    rows = params[idx]
    return rows[..., 1] * x + rows[..., 0]


def _predict_cubic(params, idx, x):
    if idx is None:
        a, b, c, d = params[0, 0], params[0, 1], params[0, 2], params[0, 3]
    else:
        rows = params[idx]
        a, b, c, d = (rows[..., 0], rows[..., 1], rows[..., 2],
                      rows[..., 3])
    return ((a * x + b) * x + c) * x + d


def _global_bitword_reduce(ki_local, is_pad=None):
    """(OR, AND) of the u64 key words across all shards
    (common_prefix_size, utils.rs:23-36).  Pad sentinels (appended by
    dp_train_two_layer for non-divisible n) are masked to the reduce
    identities so they cannot widen/narrow the common prefix."""
    if is_pad is not None:
        ones = jnp.uint64(0xFFFFFFFFFFFFFFFF)
        ki_or = jnp.where(is_pad, jnp.uint64(0), ki_local)
        ki_and = jnp.where(is_pad, ones, ki_local)
    else:
        ki_or = ki_and = ki_local
    any_ones = jax.lax.reduce(ki_or, jnp.uint64(0),
                              jax.lax.bitwise_or, (0,))
    no_ones = jax.lax.reduce(ki_and, jnp.uint64(0xFFFFFFFFFFFFFFFF),
                             jax.lax.bitwise_and, (0,))
    ors = jax.lax.all_gather(any_ones, AXIS)
    ands = jax.lax.all_gather(no_ones, AXIS)
    any_ones = jax.lax.reduce(ors, jnp.uint64(0), jax.lax.bitwise_or, (0,))
    no_ones = jax.lax.reduce(ands, jnp.uint64(0xFFFFFFFFFFFFFFFF),
                             jax.lax.bitwise_and, (0,))
    constant_bits = (~no_ones) ^ any_ones
    return jax.lax.clz(~constant_bits).astype(jnp.uint64)


def _dist_fit_linear_top(xf, yf, n, trim=False):
    zero = jnp.zeros((1,), jnp.int64)
    full = jnp.full((1,), n, jnp.int64)
    a, b = zero, full
    if trim:
        bnd = max(1, int(n * 1e-4))
        if 2 * bnd + 1 < n:
            a, b = zero + bnd, full - bnd
    cnt, mean_x, mean_y, dxx, dxy = _dist_slr(xf, yf, None, a, b, False, 1)
    m2 = global_range_sum(dxx, a, b)
    c = global_range_sum(dxy, a, b)
    return _slr_combine(cnt, mean_x, mean_y, m2, c)


def _dist_fit_spline_top(xf, ep_yf_first, ep_yf_last, keys_local, n):
    x0 = global_value_at(xf, jnp.zeros((1,), jnp.int64))
    x1 = global_value_at(xf, jnp.full((1,), n - 1, jnp.int64))
    from rmi_tpu.models.linear import spline_from_endpoints
    a, b = spline_from_endpoints(x0, ep_yf_first, x1, ep_yf_last,
                                 jnp.float64(n))
    return jnp.stack([a, b], axis=-1)


def _dist_fit_cubic_top(xf, yf, ep0, ep1, n):
    """Distributed cubic top fit (cubic_spline.rs:18-101 semantics)."""
    z = jnp.zeros((1,), jnp.int64)
    last = jnp.full((1,), n - 1, jnp.int64)
    xmin = global_value_at(xf, z)
    xmax = global_value_at(xf, last)
    ymin, ymax = ep0, ep1

    i1 = jnp.clip(global_searchsorted(xf, xmin, "right"), 0, n - 1)
    i2 = jnp.clip(global_searchsorted(xf, xmax, "left") - 1, 0, n - 1)
    x_i1 = global_value_at(xf, i1)
    y_i1 = global_value_at(yf, i1)
    x_i2 = global_value_at(xf, i2)
    y_i2 = global_value_at(yf, i2)

    degenerate = xmin == xmax
    span = jnp.where(degenerate, 1.0, xmax - xmin)
    yspan = jnp.where(ymax == ymin, 1.0, ymax - ymin)
    sxn, syn = (x_i1 - xmin) / span, (y_i1 - ymin) / yspan
    sxp, syp = (x_i2 - xmin) / span, (y_i2 - ymin) / yspan
    m1 = syn / jnp.where(sxn == 0.0, 1.0, sxn)
    m2_ = (1.0 - syp) / jnp.where(sxp == 1.0, 1.0, 1.0 - sxp)
    norm2 = m1 * m1 + m2_ * m2_
    tau = jnp.where(norm2 > 9.0,
                    3.0 / jnp.sqrt(jnp.maximum(norm2, 1e-300)), 1.0)
    m1, m2_ = m1 * tau, m2_ * tau

    from rmi_tpu.models.cubic import _coeffs
    a, b, c, d = _coeffs(xmin, ymin, xmax, ymax, m1, m2_)

    # fallback L1 comparison against the endpoint spline
    from rmi_tpu.models.linear import spline_from_endpoints
    ls_a, ls_b = spline_from_endpoints(xmin, ymin, xmax, ymax,
                                       jnp.float64(n))
    cubic_p = jnp.stack([a, b, c, d], axis=-1)
    lin_p = jnp.stack([ls_a, ls_b], axis=-1)
    full = jnp.full((1,), n, jnp.int64)
    ce = global_range_sum(jnp.abs(_predict_cubic(cubic_p, None, xf) - yf),
                          z, full)
    le = global_range_sum(jnp.abs(_predict_linear(lin_p, None, xf) - yf),
                          z, full)
    lin_as_cubic = jnp.stack([jnp.zeros_like(ls_a), jnp.zeros_like(ls_a),
                              ls_b, ls_a], axis=-1)
    return jnp.where((le < ce)[:, None], lin_as_cubic, cubic_p)


def _dist_slr_leaves(xf, yf, t_local, spans, n, weights=None, trim=False):
    """Distributed per-leaf SLR over augmented spans with optional
    item weights (loglinear) and end-trimming (robust_linear)."""
    starts, ends, aug_a, aug_b, nonempty, has_prev, has_next = spans
    if trim:
        # robust_linear trims max(1, 1e-4*len) from each container end
        # (linear.rs:247-252); tiny containers fall back untrimmed.
        total = aug_b - aug_a
        bnd = jnp.maximum(jnp.int64(1),
                          (total.astype(jnp.float64) * 1e-4
                           ).astype(jnp.int64))
        ok = (2 * bnd + 1) < total
        lo = jnp.where(ok, aug_a + bnd, aug_a)
        hi = jnp.where(ok, jnp.maximum(aug_b - bnd, aug_a + bnd), aug_b)
        aug_a, aug_b = lo, hi
        starts, ends = lo, hi
        has_prev = jnp.zeros_like(has_prev)
        has_next = jnp.zeros_like(has_next)

    ones = jnp.ones_like(xf) if weights is None else weights
    xw = xf if weights is None else xf * weights
    yw = yf if weights is None else yf * weights
    cnt = global_range_sum(ones, aug_a, aug_b)
    sx = global_range_sum(xw, aug_a, aug_b)
    sy = global_range_sum(yw, aug_a, aug_b)
    safe = jnp.maximum(cnt, 1.0)
    mean_x, mean_y = sx / safe, sy / safe
    mx_t = mean_x[t_local]
    my_t = mean_y[t_local]
    dxx = (xf - mx_t) * (xf - mx_t)
    dxy = (xf - mx_t) * (yf - my_t)
    if weights is not None:
        dxx = dxx * weights
        dxy = dxy * weights
    m2 = global_range_sum(dxx, starts, ends)
    c = global_range_sum(dxy, starts, ends)

    def edge(idx, present):
        i = jnp.clip(idx, 0, n - 1)
        xv = global_value_at(xf, i)
        yv = global_value_at(yf, i)
        wv = 1.0 if weights is None else global_value_at(weights, i)
        exx = (xv - mean_x) * (xv - mean_x) * wv
        exy = (xv - mean_x) * (yv - mean_y) * wv
        return (jnp.where(present, exx, 0.0),
                jnp.where(present, exy, 0.0))

    pxx, pxy = edge(starts - 1, has_prev)
    nxx, nxy = edge(ends, has_next)
    return _slr_combine(cnt, mean_x, mean_y, m2 + pxx + nxx,
                        c + pxy + nxy)


def _dist_fit_ncdf_leaves(xv, yf, t_local, spans, n):
    """Distributed normal/lognormal leaf fits: mean/biased stdev of the
    (possibly log-transformed) keys, scale = last (max) target
    (normal.rs:28-50)."""
    starts, ends, aug_a, aug_b, nonempty, has_prev, has_next = spans
    cnt = global_range_sum(jnp.ones_like(xv), aug_a, aug_b)
    sx = global_range_sum(xv, aug_a, aug_b)
    mean = jnp.where(cnt == 0, 0.0, sx / jnp.maximum(cnt, 1.0))
    mt = mean[t_local]
    d2 = (xv - mt) * (xv - mt)
    ss = global_range_sum(d2, starts, ends)

    def edge(idx, present):
        i = jnp.clip(idx, 0, n - 1)
        ev = global_value_at(xv, i) - mean
        return jnp.where(present, ev * ev, 0.0)

    ss = ss + edge(starts - 1, has_prev) + edge(ends, has_next)
    stdev = jnp.sqrt(jnp.where(cnt == 0, jnp.nan,
                               jnp.maximum(ss, 0.0)
                               / jnp.maximum(cnt, 1.0)))
    last = jnp.clip(aug_b - 1, 0, n - 1)
    scale = jnp.where(cnt == 0, -jnp.inf, global_value_at(yf, last))
    return jnp.stack([mean, stdev, scale], axis=-1)


def _predict_ncdf(params, idx, x, lognormal=False):
    from rmi_tpu.models.normal import phi
    if idx is None:
        mean, stdev, scale = params[0, 0], params[0, 1], params[0, 2]
    else:
        rows = params[idx]
        mean, stdev, scale = rows[..., 0], rows[..., 1], rows[..., 2]
    if lognormal:
        raw = jnp.log(x)
        x = jnp.where(jnp.isnan(raw), 0.0, jnp.maximum(raw, 0.0))
    return phi((x - mean) / stdev) * scale


def _predict_loglinear(params, idx, x):
    from rmi_tpu.models.linear import exp1
    return exp1(_predict_linear(params, idx, x))


def _dist_fit_leaves(leaf_type, xf, yf, t_local, spans, xf_sorted, n, B,
                     xraw=None):
    """Distributed per-leaf fits over augmented global spans."""
    starts, ends, aug_a, aug_b, nonempty, has_prev, has_next = spans

    if leaf_type == "linear":
        return _dist_slr_leaves(xf, yf, t_local, spans, n)

    if leaf_type == "robust_linear":
        return _dist_slr_leaves(xf, yf, t_local, spans, n, trim=True)

    if leaf_type == "loglinear":
        ln = jnp.log(yf)
        keep = jnp.isfinite(ln)
        return _dist_slr_leaves(xf, jnp.where(keep, ln, 0.0), t_local,
                                spans, n,
                                weights=keep.astype(jnp.float64))

    if leaf_type == "normal":
        return _dist_fit_ncdf_leaves(xf, yf, t_local, spans, n)

    if leaf_type == "lognormal":
        lnx = jnp.log(xraw)
        lnx = jnp.where(jnp.isfinite(lnx), lnx, 0.0)
        return _dist_fit_ncdf_leaves(lnx, yf, t_local, spans, n)

    if leaf_type == "linear_spline":
        from rmi_tpu.models.linear import spline_from_endpoints
        first = jnp.clip(aug_a, 0, n - 1)
        last = jnp.clip(aug_b - 1, 0, n - 1)
        cnt = (aug_b - aug_a).astype(jnp.float64)
        x0 = global_value_at(xf, first)
        y0 = global_value_at(yf, first)
        x1 = global_value_at(xf, last)
        y1 = global_value_at(yf, last)
        a, b = spline_from_endpoints(x0, y0, x1, y1, cnt)
        return jnp.stack([a, b], axis=-1)

    if leaf_type == "cubic":
        from rmi_tpu.models.cubic import _coeffs
        from rmi_tpu.models.linear import spline_from_endpoints
        first = jnp.clip(aug_a, 0, n - 1)
        last = jnp.clip(aug_b - 1, 0, n - 1)
        cnt = (aug_b - aug_a).astype(jnp.float64)
        xmin = global_value_at(xf, first)
        ymin = global_value_at(yf, first)
        xmax = global_value_at(xf, last)
        ymax = global_value_at(yf, last)
        degenerate = xmin == xmax
        i1 = jnp.clip(global_searchsorted(xf_sorted, xmin, "right"),
                      0, n - 1)
        i2 = jnp.clip(global_searchsorted(xf_sorted, xmax, "left") - 1,
                      0, n - 1)
        x_i1 = global_value_at(xf, i1)
        y_i1 = global_value_at(yf, i1)
        x_i2 = global_value_at(xf, i2)
        y_i2 = global_value_at(yf, i2)
        span = jnp.where(degenerate, 1.0, xmax - xmin)
        yspan = jnp.where(ymax == ymin, 1.0, ymax - ymin)
        sxn, syn = (x_i1 - xmin) / span, (y_i1 - ymin) / yspan
        sxp, syp = (x_i2 - xmin) / span, (y_i2 - ymin) / yspan
        m1 = syn / jnp.where(sxn == 0.0, 1.0, sxn)
        m2_ = (1.0 - syp) / jnp.where(sxp == 1.0, 1.0, 1.0 - sxp)
        norm2 = m1 * m1 + m2_ * m2_
        tau = jnp.where(norm2 > 9.0,
                        3.0 / jnp.sqrt(jnp.maximum(norm2, 1e-300)), 1.0)
        m1, m2_ = m1 * tau, m2_ * tau
        a, b, c, d = _coeffs(xmin, ymin, xmax, ymax, m1, m2_)
        empty = cnt == 0
        const_case = (~empty) & ((cnt == 1) | degenerate)
        a = jnp.where(empty | const_case, 0.0, a)
        b = jnp.where(empty | const_case, 0.0, b)
        c = jnp.where(empty, 1.0, jnp.where(const_case, 0.0, c))
        d = jnp.where(empty, 0.0, jnp.where(const_case, ymin, d))
        cubic_p = jnp.stack([a, b, c, d], axis=-1)

        ls_a, ls_b = spline_from_endpoints(xmin, ymin, xmax, ymax, cnt)
        lin_p = jnp.stack([ls_a, ls_b], axis=-1)
        derr_c = jnp.abs(_predict_cubic(cubic_p, t_local, xf) - yf)
        derr_l = jnp.abs(_predict_linear(lin_p, t_local, xf) - yf)
        ce = global_range_sum(derr_c, starts, ends)
        le = global_range_sum(derr_l, starts, ends)

        def edge_err(params, pred, idx, present):
            xv = global_value_at(xf, jnp.clip(idx, 0, n - 1))
            yv = global_value_at(yf, jnp.clip(idx, 0, n - 1))
            leaf_ids = jnp.arange(B)
            return jnp.where(present,
                             jnp.abs(pred(params, leaf_ids, xv) - yv), 0.0)

        ce = ce + edge_err(cubic_p, _predict_cubic, starts - 1, has_prev)
        ce = ce + edge_err(cubic_p, _predict_cubic, ends, has_next)
        le = le + edge_err(lin_p, _predict_linear, starts - 1, has_prev)
        le = le + edge_err(lin_p, _predict_linear, ends, has_next)

        lin_as_cubic = jnp.stack(
            [jnp.zeros_like(ls_a), jnp.zeros_like(ls_a), ls_b, ls_a],
            axis=-1)
        use_lin = (le < ce) & ~empty
        return jnp.where(use_lin[:, None], lin_as_cubic, cubic_p)

    raise NotImplementedError(leaf_type)


# ---------------------------------------------------------------------------
# the full distributed training step
# ---------------------------------------------------------------------------

def t64_placeholder(m):
    return jnp.zeros((m,), dtype=jnp.int32)


def _predict_clamped_f(pred_f, bound):
    p = jnp.floor(pred_f)
    p = jnp.where(jnp.isnan(p), 0.0, jnp.clip(p, 0.0, jnp.float64(bound)))
    return p.astype(jnp.int64)


def _dp_core(keys_local, kminf, snorm, *, top_type, leaf_type, B, n,
             key_type):
    m = keys_local.shape[0]
    off = _offset(m)
    # Pad lanes: dp_train_two_layer appends max-key sentinels so every
    # shard is the same size when n doesn't divide the mesh.  All
    # POSITIONAL reductions (global_range_sum / global_value_at over
    # spans bounded by n) exclude them for free — pads live past global
    # index n-1 at the tail of the last shard.  The remaining places
    # where pads could leak are masked explicitly below: the bitword
    # reduce (radix/bradix prefix), bradix bucket counts, the leaf
    # assignment (forced to B-1 so spans/searchsorted stay consistent),
    # the error sweep, and duplicate-run counting.
    is_pad = (off + jnp.arange(m, dtype=jnp.int64)) >= n
    # normalized key domain (see rmi_tpu.convert): accuracy + emulated-
    # f64 range safety
    xraw = keymod.as_float(keys_local)
    xf = (xraw - kminf) * snorm
    ki = keymod.as_int(keys_local)

    yfix_local, changed = dist_fixdups(keys_local)
    yf = yfix_local.astype(jnp.float64)
    sf = float(B) / float(n)
    import sys as _sys
    if abs(sf - 1.0) > _sys.float_info.epsilon:
        ys_scaled = jnp.trunc(yf * sf)
        ep_first = jnp.trunc(jnp.float64(0.0) * sf)[None]
        ep_last = jnp.trunc(jnp.float64(n - 1) * sf)[None]
    else:
        ys_scaled = yf
        ep_first = jnp.zeros((1,))
        ep_last = jnp.full((1,), float(n - 1))

    # --- top fit + assignment
    t_int = None
    if top_type in ("linear", "robust_linear"):
        top_p = _dist_fit_linear_top(xf, ys_scaled, n,
                                     trim=top_type == "robust_linear")
        top_pred = _predict_linear(top_p, None, xf)
    elif top_type == "linear_spline":
        top_p = _dist_fit_spline_top(xf, ep_first, ep_last, keys_local, n)
        top_pred = _predict_linear(top_p, None, xf)
    elif top_type == "cubic":
        top_p = _dist_fit_cubic_top(xf, ys_scaled, ep_first, ep_last, n)
        top_pred = _predict_cubic(top_p, None, xf)
    elif top_type == "loglinear":
        ln = jnp.log(ys_scaled)
        keep = jnp.isfinite(ln)
        one = jnp.ones((1,), jnp.int64)
        full_spans = (0 * one, n * one, 0 * one, n * one,
                      one > 0, one < 0, one < 0)
        top_p = _dist_slr_leaves(xf, jnp.where(keep, ln, 0.0),
                                 jnp.zeros_like(t64_placeholder(m)),
                                 full_spans, n,
                                 weights=keep.astype(jnp.float64))
        top_pred = _predict_loglinear(top_p, None, xf)
    elif top_type in ("normal", "lognormal"):
        one = jnp.ones((1,), jnp.int64)
        full_spans = (0 * one, n * one, 0 * one, n * one,
                      one > 0, one < 0, one < 0)
        xv = xf
        if top_type == "lognormal":
            lnx = jnp.log(xraw)
            xv = jnp.where(jnp.isfinite(lnx), lnx, 0.0)
        top_p = _dist_fit_ncdf_leaves(xv, ys_scaled,
                                      jnp.zeros_like(t64_placeholder(m)),
                                      full_spans, n)
        top_pred = _predict_ncdf(top_p, None, xv if False else (
            xraw if top_type == "lognormal" else xf),
            lognormal=top_type == "lognormal")
    elif top_type == "radix":
        from rmi_tpu.models.radix import num_bits_device, _shl, _shr
        largest = global_value_at(
            ys_scaled, jnp.full((1,), n - 1, jnp.int64))[0]
        bits = num_bits_device(largest.astype(jnp.uint64))
        prefix = _global_bitword_reduce(ki, is_pad)
        res = _shr(_shl(ki, prefix), jnp.uint64(64) - bits)
        top_pred = None
        t_int = jnp.where(bits == 0, jnp.uint64(0), res)
        # exact u64 params in the serving dict shape (models/radix.py);
        # an f64 round-trip would corrupt values near 2^64
        top_p = {"w_int": jnp.stack([prefix, bits])}
    elif top_type == "bradix":
        from rmi_tpu.models.radix import num_bits_device, _bradix_bucket
        largest = global_value_at(
            ys_scaled, jnp.full((1,), n - 1, jnp.int64))[0]
        max_output = largest.astype(jnp.uint64)
        bits = num_bits_device(max_output)
        prefix = _global_bitword_reduce(ki, is_pad)
        one = jnp.uint64(1)
        scores, cands = [], []
        for db in (0, 1):
            tb = jnp.minimum(bits + jnp.uint64(db), jnp.uint64(63))
            valid = (bits + jnp.uint64(db)) < jnp.uint64(64)
            bits_max = (one << jnp.minimum(tb + one, jnp.uint64(63))) - one
            for high, clamp in ((True, max_output - one),
                                (False, max_output - bits_max)):
                bucket = _bradix_bucket(ki, prefix, tb, clamp,
                                        jnp.asarray(high))
                bb = jnp.minimum(bucket, jnp.maximum(
                    max_output, jnp.uint64(1)) - 1)
                # pad lanes -> bucket B: sorted (pads sit at the tail
                # with the largest keys) and outside every edge window,
                # so they never enter the chi^2 occupancy counts
                bb = jnp.where(is_pad, jnp.uint64(B), bb)
                edges = jnp.arange(B + 1, dtype=jnp.uint64)
                counts = global_searchsorted(bb, edges, "left")
                cnts = (counts[1:] - counts[:B]).astype(jnp.float64)
                live = jnp.arange(B, dtype=jnp.uint64) < max_output
                e = jnp.float64(n) / jnp.maximum(
                    jnp.float64(max_output), 1.0)
                score = jnp.sum(jnp.where(live, (cnts - e) ** 2 / e, 0.0))
                scores.append(jnp.where(valid, score, jnp.inf))
                cands.append(jnp.stack(
                    [prefix, tb, clamp, jnp.uint64(1 if high else 0)]))
        best = jnp.argmin(jnp.stack(scores))
        w = jnp.stack(cands)[best]
        t_int = _bradix_bucket(ki, w[0], w[1], w[2], w[3] != 0)
        # exact u64: the low-variant clamp is a wraparound value near
        # 2^64 (balanced_radix.rs:103-114) that f64 cannot represent
        top_p = {"w_int": w[:3], "high": w[3]}
    elif top_type == "histogram":
        import sys as _s
        sfv = float(B) / float(n)
        num_bins = int((n - 1) * sfv) \
            if abs(sfv - 1.0) > _s.float_info.epsilon else n - 1
        items_per_bin = n // max(num_bins, 1)
        pidx = jnp.arange(num_bins, dtype=jnp.int64) * items_per_bin
        pivots = global_value_at(ki, pidx, dtype=jnp.uint64)
        ub = seg.hier_count(pivots, ki, strict=False)
        t_int = (ub - 1).astype(jnp.uint64)
        # exact u64 pivots (they reach 2^62, histogram.rs:31) in the
        # serving dict shape; _histogram_predict needs only "pivots"
        top_p = {"count": jnp.uint64(num_bins), "pivots": pivots}
    else:
        raise NotImplementedError(top_type)

    if t_int is not None:
        t_local = jnp.minimum(
            t_int, jnp.uint64(B - 1)).astype(jnp.int32)
    else:
        t_local = _predict_clamped_f(top_pred, B - 1).astype(jnp.int32)
    # pad lanes route to the last leaf: keeps t_local globally sorted
    # (a NaN top prediction would clamp pads to leaf 0) while the
    # positional span bound ends[B-1] = n still excludes them from
    # every per-leaf range sum
    t_local = jnp.where(is_pad, jnp.int32(B - 1), t_local)

    # --- global spans
    leaf_ids = jnp.arange(B, dtype=jnp.int32)
    starts = global_searchsorted(t_local, leaf_ids, "left")
    ends = jnp.concatenate([starts[1:], jnp.full((1,), n, jnp.int64)])
    nonempty = starts < ends
    has_prev = nonempty & (starts > 0)
    has_next = nonempty & (ends < n)
    aug_a = jnp.where(nonempty, jnp.where(has_prev, starts - 1, starts), 0)
    aug_b = jnp.where(nonempty, jnp.where(has_next, ends + 1, ends), 0)
    spans = (starts, ends, aug_a, aug_b, nonempty, has_prev, has_next)

    leaf_params = _dist_fit_leaves(leaf_type, xf, yf, t_local, spans,
                                   xf, n, B, xraw=xraw)

    # --- lower-bound pieces
    big = jnp.int64(n + 1)
    first_val = jnp.where(nonempty, starts, big)
    suffix_min = jax.lax.cummin(first_val[::-1])[::-1]
    next_start = jnp.concatenate([suffix_min[1:],
                                  jnp.full((1,), big, jnp.int64)])
    has_next_leaf = next_start < big
    next_idx = jnp.where(has_next_leaf, next_start, n)
    key_dt = keys_local.dtype
    next_key_v = global_value_at(keys_local,
                                 jnp.clip(next_start, 0, n - 1),
                                 dtype=key_dt)
    next_key = jnp.where(has_next_leaf, next_key_v,
                         jnp.asarray(key_type.max_value, dtype=key_dt))

    last_val = jnp.where(nonempty, ends - 1, jnp.int64(-1))
    prefix_max = jax.lax.cummax(last_val)
    prev_last = jnp.concatenate([jnp.full((1,), -1, jnp.int64),
                                 prefix_max[:-1]])
    has_prev_leaf = prev_last >= 0
    prev_key_v = global_value_at(keys_local, jnp.clip(prev_last, 0, None),
                                 dtype=key_dt)
    prev_key = jnp.where(has_prev_leaf, prev_key_v,
                         jnp.asarray(key_type.zero_value, dtype=key_dt))

    run_start, run_end = dist_run_bounds(keys_local, changed, n)
    run_len = run_end - run_start + 1
    # a real trailing run that merges into equal-valued pads gets
    # run_end >= n-1 and is excluded below exactly like the reference's
    # last-run rule (two_layer.rs: runs ending at n-1 don't count);
    # pad lanes themselves are masked outright
    counted = jnp.where((run_end < n - 1) & ~is_pad, run_len, 0)
    local_max = jax.ops.segment_max(counted, t_local, num_segments=B,
                                    indices_are_sorted=True)
    longest_run = jnp.maximum(jax.lax.pmax(local_max, AXIS), 0)
    longest_run = jnp.where(nonempty, longest_run, 0)

    # --- empty-leaf constant patch
    const_ok = leaf_type in ("linear", "robust_linear", "linear_spline",
                             "cubic")
    if const_ok:
        cst = next_idx.astype(jnp.float64)
        if leaf_type == "cubic":
            z = jnp.zeros_like(cst)
            rows = jnp.stack([z, z, z, cst], axis=-1)
        else:
            rows = jnp.stack([cst, jnp.zeros_like(cst)], axis=-1)
        patch = (~nonempty) & (jnp.arange(B) < B - 1)
        leaf_params = jnp.where(patch[:, None], rows, leaf_params)

    if leaf_type == "cubic":
        predict = _predict_cubic
    elif leaf_type == "loglinear":
        predict = _predict_loglinear
    elif leaf_type == "normal":
        predict = _predict_ncdf
    elif leaf_type == "lognormal":
        predict = functools.partial(_predict_ncdf, lognormal=True)
    else:
        predict = _predict_linear

    # --- error sweep (lognormal leaves take raw key floats)
    leaf_in = xraw if leaf_type == "lognormal" else xf
    pred = _predict_clamped_f(predict(leaf_params, t_local, leaf_in), n)
    err = jnp.abs(pred - jnp.minimum(yfix_local, n))
    err = jnp.where(is_pad, 0, err)
    local_err = jax.ops.segment_max(err, t_local, num_segments=B,
                                    indices_are_sorted=True)
    max_err = jnp.maximum(jax.lax.pmax(local_err, AXIS), 0)
    max_err = jnp.where(nonempty, max_err, 0)
    cnt = ends - starts

    # --- probes
    lids = jnp.arange(B)
    up_keys = keymod.minus_epsilon(next_key, key_type)
    up_in = keymod.as_float(up_keys) if leaf_type == "lognormal" \
        else (keymod.as_float(up_keys) - kminf) * snorm
    pred_up = _predict_clamped_f(predict(leaf_params, lids, up_in), n)
    upper_err = jnp.abs(pred_up - jnp.minimum(next_idx + 1, n))
    lo_keys = keymod.plus_epsilon(prev_key, key_type)
    lo_in = keymod.as_float(lo_keys) if leaf_type == "lognormal" \
        else (keymod.as_float(lo_keys) - kminf) * snorm
    pred_lo = _predict_clamped_f(predict(leaf_params, lids, lo_in), n)
    first_idx = next_idx[jnp.maximum(lids - 1, 0)]
    lower_err = jnp.abs(pred_lo - jnp.minimum(first_idx, n))

    final_err = (jnp.maximum(jnp.maximum(max_err, upper_err), lower_err)
                 + longest_run)

    nf = jnp.float64(n)
    cnt_f = cnt.astype(jnp.float64)
    err_f = final_err.astype(jnp.float64)
    metrics = {
        "model_max_error": jnp.max(final_err).astype(jnp.uint64),
        "model_max_error_idx": (B - 1) - jnp.argmax(final_err[::-1]),
        "model_avg_error": jnp.sum(cnt_f * err_f) / nf,
        "model_avg_l2_error": jnp.sum((cnt_f * err_f) ** 2 / nf),
        "model_avg_log2_error":
            jnp.sum(cnt_f * jnp.log2(2.0 * err_f + 2.0)) / nf,
        "model_max_log2_error":
            jnp.log2(jnp.max(final_err).astype(jnp.float64)),
    }
    return top_p, leaf_params, final_err.astype(jnp.uint64), metrics


def dp_train_two_layer(keys, key_type: KeyType, top_type: str,
                       leaf_type: str, B: int, mesh: Mesh):
    """Data-parallel two-layer build for ARBITRARY ``n``: when n doesn't
    divide the mesh size, the sharded array is padded with max-key
    sentinels (sortedness preserved) which _dp_core masks out of every
    fit, scan, and metric — real key arrays are never device-count
    divisible and the reference has no such constraint (it streams in
    one process)."""
    if top_type not in DP_TOP_MODELS:
        raise NotImplementedError(
            f"dp trainer supports tops {DP_TOP_MODELS}; use the "
            f"single-chip path for {top_type}")
    if leaf_type not in DP_LEAF_MODELS:
        raise NotImplementedError(
            f"dp trainer supports leaves {DP_LEAF_MODELS}")
    n = int(keys.shape[0])
    ndev = mesh.devices.size
    if n == 0:
        raise ValueError("cannot train on an empty key array")
    npad = (-n) % ndev
    if npad:
        keys = jnp.concatenate([
            jnp.asarray(keys),
            jnp.full((npad,), key_type.max_value,
                     dtype=jnp.asarray(keys).dtype)])

    from rmi_tpu.train.two_layer import norm_constants
    kminf, snorm = norm_constants(keys[:n], key_type)

    core = functools.partial(_dp_core, top_type=top_type,
                             leaf_type=leaf_type, B=int(B), n=n,
                             key_type=key_type)
    rep = P()
    mapped = shard_map(
        core, mesh,
        in_specs=(P(AXIS), rep, rep),
        out_specs=(rep, rep, rep, {k: rep for k in (
            "model_max_error", "model_max_error_idx", "model_avg_error",
            "model_avg_l2_error", "model_avg_log2_error",
            "model_max_log2_error")}))
    sharded_keys = jax.device_put(
        keys, jax.sharding.NamedSharding(mesh, P(AXIS)))
    return jax.jit(mapped)(sharded_keys, jnp.float64(kminf),
                           jnp.float64(snorm))
