"""Sorted-segment primitives: the TPU-native replacement for the
reference's streaming leaf loops.

The reference trains leaves by streaming the sorted key array and
cutting it at top-model prediction boundaries (two_layer.rs:20-99).
Because the top model is monotonic, leaf ids over the sorted array are
NON-DECREASING — so every per-leaf reduction over keys becomes a
*contiguous-range* reduction, computable as a difference of prefix sums
(one O(n) cumulative sum + O(B) gathers) instead of a scatter.  That is
the central design decision of this framework: no scatter in the hot
path, everything is cumsum + searchsorted + gather, which XLA maps onto
the VPU at HBM bandwidth.

Leaf-overlap semantics (two_layer.rs:52-82): each trained leaf also
sees the last key of the previous non-empty leaf and the first key of
the next non-empty leaf.  On the sorted array those are simply the
elements adjacent to the leaf's span, so the *augmented* training range
of a non-empty leaf j with span [s_j, e_j) is the contiguous range
[s_j - (s_j>0), min(e_j+1, n)).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def iso_take(table: jax.Array, idx: jax.Array) -> jax.Array:
    """Sorted-index gather [B] -> [n], fusion-isolated.

    Compiler finding baked in: the ``indices_are_sorted=True`` hint
    SEGFAULTS the tunneled TPU compiler when the gather meets
    cumulative-sum producers — the indices being ACTUALLY sorted is
    what matters for speed, not the hint.  Plain take only.
    """
    return jnp.take(table, idx)


def prefix_sum_exclusive(values: jax.Array) -> jax.Array:
    """[n] -> [n+1] with out[i] = sum(values[:i]) (f64 accumulate)."""
    c = jnp.cumsum(values.astype(jnp.float64))
    return jnp.concatenate([jnp.zeros((1,), dtype=jnp.float64), c])


def range_sum(values: jax.Array, starts: jax.Array, ends: jax.Array,
              _cache: jax.Array | None = None) -> jax.Array:
    """Sum of values[starts[j]:ends[j]] for each j, via prefix sums.

    Single-range calls over the full array (top-model fits, B == 1
    whole-array spans) skip the O(n) prefix sum — a direct reduction
    is ~4x cheaper than an emulated-f64 cumsum on TPU
    (probes/probe_build_phases.py).
    """
    if _cache is None and starts.shape[0] == 1:
        n = values.shape[0]
        # i32 index math: emulated-i64 compares cost ~10x on TPU
        idx = jnp.arange(n, dtype=jnp.int32)
        s0 = starts[0].astype(jnp.int32)
        e0 = ends[0].astype(jnp.int32)
        mask = (idx >= s0) & (idx < e0)
        return jnp.sum(jnp.where(mask, values.astype(jnp.float64), 0.0),
                       keepdims=True)
    c = prefix_sum_exclusive(values) if _cache is None else _cache
    return c[ends] - c[starts]


_RS_BLK = 512


def blocked_partials(values: jax.Array):
    """(rows [nb, 512] f64, cb [nb+1] exclusive block prefix) — the
    shareable half of range_sum_blocked."""
    n = values.shape[0]
    v64 = values.astype(jnp.float64)
    nb = -(-n // _RS_BLK)
    pad = nb * _RS_BLK - n
    vp = jnp.concatenate([v64, jnp.zeros((pad,), jnp.float64)]) \
        if pad else v64
    rows = vp.reshape(nb, _RS_BLK)
    bs = jnp.sum(rows, axis=1)
    cb = jnp.concatenate([jnp.zeros((1,), jnp.float64), jnp.cumsum(bs)])
    return rows, cb


def range_sum_blocked(values: jax.Array, starts: jax.Array,
                      ends: jax.Array, partials=None) -> jax.Array:
    """Per-range sums via block partials instead of a global prefix sum.

    An emulated-f64 cumsum costs ~6.4ns/element on TPU; a same-dtype
    REDUCTION costs ~1.5ns/element (probes/probe_build_phases.py).  So:
    512-element block sums (one reduction pass), a cumsum over the
    tiny [n/512] partials, and per-range head/tail corrections via two
    [B, 512] row gathers with lane masks (chunked over the leaf axis
    above _ROW_DIRECT_MAX).  Summation order differs from the
    prefix-sum path by normal f64 rounding only.
    """
    rows, cb = blocked_partials(values) if partials is None else partials
    B = starts.shape[0]
    if B <= _ROW_DIRECT_MAX:
        return _range_sum_blocked_solve(rows, cb, starts, ends)
    return _map_leaf_chunks(
        lambda s_c, e_c: _range_sum_blocked_solve(rows, cb, s_c, e_c),
        B, starts, ends)


def _range_sum_blocked_solve(rows, cb, starts, ends):
    nb = rows.shape[0]

    s = starts.astype(jnp.int32)
    e = ends.astype(jnp.int32)
    sb = s >> 9
    eb = e >> 9                       # block of the (exclusive) end
    s_off = s & (_RS_BLK - 1)
    e_off = e & (_RS_BLK - 1)

    lanes = jnp.arange(_RS_BLK, dtype=jnp.int32)
    same = sb == eb
    # head row: lanes [s_off, 512) — or [s_off, e_off) when same-block
    head_rows = rows[jnp.clip(sb, 0, nb - 1)]
    head_hi = jnp.where(same, e_off, _RS_BLK)
    head_mask = ((lanes[None, :] >= s_off[:, None])
                 & (lanes[None, :] < head_hi[:, None]))
    head = jnp.sum(jnp.where(head_mask, head_rows, 0.0), axis=1)
    # tail row: lanes [0, e_off), only when a different block
    tail_rows = rows[jnp.clip(eb, 0, nb - 1)]
    tail_mask = ((lanes[None, :] < e_off[:, None])
                 & (~same)[:, None] & (eb < nb)[:, None])
    tail = jnp.sum(jnp.where(tail_mask, tail_rows, 0.0), axis=1)
    # interior full blocks (sb+1 .. eb-1)
    lo_blk = jnp.minimum(sb + 1, eb)
    interior = cb[eb] - cb[lo_blk]
    out = jnp.where(s < e, head + tail + interior, 0.0)
    return out


# ---------------------------------------------------------------------------
# blocked monotone scans (exact: max/min have no rounding)
# ---------------------------------------------------------------------------

_SCAN_BLK = 512
_SCAN_DIRECT_MAX = 1 << 16   # below this, XLA's native cum* is fine


def _scan_kernel_enabled() -> bool:
    """Single-pass Pallas scan (ops/scan_kernel.py) on TPU backends;
    the XLA blocked form on CPU (tests compare the two explicitly).
    RMI_SCAN_KERNEL=0 disables; =1 forces (interpret mode on CPU).
    Always bit-exact either way — max/min never round."""
    import os
    flag = os.environ.get("RMI_SCAN_KERNEL", "").lower()
    if flag in ("0", "off", "false"):
        return False
    if flag in ("1", "on", "true"):
        return True
    return jax.default_backend() != "cpu"


def _blocked_scan(v: jax.Array, op, fill, reverse: bool) -> jax.Array:
    """Inclusive running ``op`` (max/min) over [n], two-level blocked.

    XLA lowers lax.cummax/cummin on [n]-scale arrays to ~log2(n)
    shifted passes over the FULL array (~70ms each at n=200M,
    probes/probe_trace_build.py); this form does log2(512) lane-shift
    passes over [n] plus a tiny [n/512] block scan — ~3x fewer full
    passes, and the per-pass shift is a 128-lane-aligned slice.
    Bit-exact: max/min never round.
    """
    n = v.shape[0]
    if n <= _SCAN_DIRECT_MAX:
        scan = jax.lax.cummax if op is jnp.maximum else jax.lax.cummin
        return scan(v[::-1])[::-1] if reverse else scan(v)
    if v.dtype == jnp.int32 and _scan_kernel_enabled():
        from rmi_tpu.ops.scan_kernel import scan_i32
        return scan_i32(v, is_max=op is jnp.maximum, fill=int(fill),
                        reverse=reverse)
    if reverse:
        return _blocked_scan(v[::-1], op, fill, False)[::-1]
    fill_v = jnp.asarray(fill, v.dtype)
    nb = -(-n // _SCAN_BLK)
    pad = nb * _SCAN_BLK - n
    vp = jnp.concatenate([v, jnp.full((pad,), fill_v, v.dtype)]) \
        if pad else v
    x = vp.reshape(nb, _SCAN_BLK)
    sh = 1
    while sh < _SCAN_BLK:
        shifted = jnp.concatenate(
            [jnp.full((nb, sh), fill_v, v.dtype), x[:, :-sh]], axis=1)
        x = op(x, shifted)
        sh *= 2
    scan = jax.lax.cummax if op is jnp.maximum else jax.lax.cummin
    block_inc = scan(x[:, -1])
    carry = jnp.concatenate([jnp.full((1,), fill_v, v.dtype),
                             block_inc[:-1]])
    return op(x, carry[:, None]).reshape(-1)[:n]


def blocked_cummax(v: jax.Array, reverse: bool = False) -> jax.Array:
    return _blocked_scan(v, jnp.maximum, jnp.iinfo(v.dtype).min
                         if jnp.issubdtype(v.dtype, jnp.integer)
                         else -jnp.inf, reverse)


def blocked_cummin(v: jax.Array, reverse: bool = False) -> jax.Array:
    return _blocked_scan(v, jnp.minimum, jnp.iinfo(v.dtype).max
                         if jnp.issubdtype(v.dtype, jnp.integer)
                         else jnp.inf, reverse)


@dataclasses.dataclass
class Spans:
    """Per-leaf contiguous ranges over the sorted key array.

    ``t`` is the non-decreasing leaf-id array (clamped top-model
    predictions, two_layer.rs:49).  ``starts/ends`` bound the original
    span of each leaf; ``aug_starts/aug_ends`` bound the augmented
    (overlap-including) span; empty leaves have an empty augmented span.
    """

    t: jax.Array           # [n] int32 leaf ids, non-decreasing
    starts: jax.Array      # [B] int64
    ends: jax.Array        # [B] int64
    aug_starts: jax.Array  # [B] int64
    aug_ends: jax.Array    # [B] int64
    nonempty: jax.Array    # [B] bool
    has_prev: jax.Array    # [B] bool — aug range includes element starts-1
    has_next: jax.Array    # [B] bool — aug range includes element ends
    n: int
    B: int


_SP_BLK = 512

# Largest leaf-axis size for which [B, lanes] row-gather intermediates
# materialize directly; above it the leaf axis is processed in
# _ROW_CHUNK-sized lax.map chunks so HBM stays O(n + chunk*lanes).
# (The optimizer grid reaches B = 2^24..2^27, where a direct [B, 512]
# gather would be 32..256GB.)
_ROW_DIRECT_MAX = 1 << 17
_ROW_CHUNK = 1 << 16


def _map_leaf_chunks(solve, B: int, *leaf_arrays):
    """Apply ``solve(*chunks) -> [C]`` over _ROW_CHUNK-sized chunks of
    the [B]-shaped ``leaf_arrays`` and concatenate to [B].  ``solve``
    must be shape-uniform across chunks (arrays are zero-padded up to a
    chunk multiple; callers slice the result back to B)."""
    nc = -(-B // _ROW_CHUNK)
    padded = []
    for a in leaf_arrays:
        pad = nc * _ROW_CHUNK - B
        ap = jnp.concatenate([a, jnp.zeros((pad,), a.dtype)]) if pad else a
        padded.append(ap.reshape(nc, _ROW_CHUNK))
    out = jax.lax.map(lambda args: solve(*args), tuple(padded))
    return out.reshape(nc * _ROW_CHUNK)[:B]


def sorted_starts(t: jax.Array, B: int) -> jax.Array:
    """starts[j] = #{i : t[i] < j} for NON-DECREASING t — i.e.
    searchsorted(t, arange(B), 'left') without the searchsorted.

    XLA lowers searchsorted to a while-loop of log2(n) dependent
    gather rounds (~244ms at n=200M, B=2^18 — the largest single item
    of the build trace, PLAN.md).  Monotonicity gives a two-level
    direct form instead: each leaf j's boundary lies in the single
    512-block that STRADDLES it (the last block whose first element is
    <= j, found by a [nb]-scatter + cummax over [B]), and within that
    block the count is one full-lane compare-reduce on a gathered row.
    One O(n/512) scatter pass + one [B, 512] row gather: ~6ms at the
    same shape.
    """
    n = t.shape[0]
    t32 = t.astype(jnp.int32)
    nb = -(-n // _SP_BLK)
    pad = nb * _SP_BLK - n
    # pad with B: never < any leaf id, so pad lanes count 0
    tp = jnp.concatenate(
        [t32, jnp.full((pad,), jnp.int32(B), jnp.int32)]) if pad else t32
    rows = tp.reshape(nb, _SP_BLK)
    # boundary block of leaf j: FIRST block whose LAST (= max, t sorted)
    # element is >= j — every earlier block is then entirely < j.
    # (The last block with first-element <= j would be wrong: an
    # earlier block may already hold elements == j.)
    last_idx = jnp.minimum(jnp.arange(1, nb + 1, dtype=jnp.int32)
                           * _SP_BLK, n) - 1
    lasts = t32[last_idx]
    k_at = jnp.full((B,), nb, jnp.int32).at[lasts].min(
        jnp.arange(nb, dtype=jnp.int32), mode="drop")
    k0 = jax.lax.cummin(k_at[::-1])[::-1]
    blk = jnp.minimum(k0, nb - 1)     # k0 == nb: j past every element;
    jall = jnp.arange(B, dtype=jnp.int32)  # the last block counts all

    def count_lt(blk_c, j_c):
        # row gather of each leaf's straddling block + full-lane count
        return jnp.sum(rows[blk_c] < j_c[:, None], axis=1,
                       dtype=jnp.int32)

    if B <= _ROW_DIRECT_MAX:
        cnt = count_lt(blk, jall)
    else:
        cnt = _map_leaf_chunks(count_lt, B, blk, jall)
    return (blk.astype(jnp.int64) * _SP_BLK + cnt)


_HC_ROW = 128       # lanes per level row == level fan-out
_HC_CHUNK = 1 << 20  # bounds the [chunk, 128] row-gather transient


def hier_count(sorted_vals: jax.Array, queries: jax.Array,
               strict: bool = False) -> jax.Array:
    """#{i : sorted_vals[i] < q} (strict) / <= q per query — i.e.
    searchsorted(sorted_vals, q, side='left' if strict else 'right')
    for arbitrary (unsorted) queries.

    jnp.searchsorted lowers to a per-query binary-search while-loop:
    log2(m) DEPENDENT narrow gathers per query, the worst access shape
    for TPU HBM (measured ~4x slowdown of histogram serving at
    m=4096; ~5s build stalls at m=2^22).  Counting into a sorted array
    needs no loop: a level ladder sorted_vals[::128^k] down to <=128
    entries gives a 128-coarse count c from ONE broadcast compare, and
    each finer level refines it with ONE aligned full-lane row gather
    + compare-reduce — the prefix {v OP q} ends inside lanes
    [128(c-1), 128c), which is exactly row c-1 of the level reshaped
    [m/128, 128].  Exact for any dtype (integer compares / IEEE f64
    compares); queries are chunked so the [chunk, 128] gather
    transient stays bounded.
    """
    m = sorted_vals.shape[0]
    nq = queries.shape[0]
    if m == 0:
        return jnp.zeros((nq,), jnp.int64)
    if jnp.issubdtype(sorted_vals.dtype, jnp.floating):
        maxv = np.asarray(np.inf, sorted_vals.dtype)
    else:
        maxv = np.iinfo(np.dtype(sorted_vals.dtype)).max
    levels = [sorted_vals]
    while levels[-1].shape[0] > _HC_ROW:
        levels.append(levels[-1][::_HC_ROW])
    top = levels[-1]
    top_row = jnp.concatenate(
        [top, jnp.full((_HC_ROW - top.shape[0],), maxv, top.dtype)]) \
        if top.shape[0] < _HC_ROW else top
    row_views = []
    for lvl in levels[-2::-1]:
        ml = lvl.shape[0]
        nrows = -(-ml // _HC_ROW)
        pad = nrows * _HC_ROW - ml
        padded = jnp.concatenate(
            [lvl, jnp.full((pad,), maxv, lvl.dtype)]) if pad else lvl
        row_views.append((ml, padded.reshape(nrows, _HC_ROW)))

    def op(a, q):
        return (a < q) if strict else (a <= q)

    def count_chunk(q):
        cnt = jnp.sum(op(top_row[None, :], q[:, None]), axis=1,
                      dtype=jnp.int32)
        cnt = jnp.minimum(cnt, top.shape[0])
        for ml, rows in row_views:
            r = jnp.clip(cnt - 1, 0, rows.shape[0] - 1)
            cnt = r * _HC_ROW + jnp.sum(op(rows[r], q[:, None]), axis=1,
                                        dtype=jnp.int32)
            cnt = jnp.minimum(cnt, ml)
        return cnt.astype(jnp.int64)

    if nq <= _HC_CHUNK:
        return count_chunk(queries)
    pad = (-nq) % _HC_CHUNK
    qp = jnp.concatenate([queries, jnp.broadcast_to(queries[-1:], (pad,))]) \
        if pad else queries
    out = jax.lax.map(count_chunk, qp.reshape(-1, _HC_CHUNK))
    return out.reshape(-1)[:nq]


def make_spans(t: jax.Array, B: int) -> Spans:
    n = t.shape[0]
    starts = sorted_starts(t, B)
    ends = jnp.concatenate([starts[1:], jnp.full((1,), n, dtype=jnp.int64)])
    nonempty = starts < ends
    has_prev = nonempty & (starts > 0)
    has_next = nonempty & (ends < n)
    aug_starts = jnp.where(has_prev, starts - 1, starts)
    aug_ends = jnp.where(has_next, ends + 1, ends)
    # Empty leaves train on empty data (two_layer.rs:66-69): collapse span.
    aug_starts = jnp.where(nonempty, aug_starts, 0)
    aug_ends = jnp.where(nonempty, aug_ends, 0)
    return Spans(t=t, starts=starts, ends=ends,
                 aug_starts=aug_starts, aug_ends=aug_ends,
                 nonempty=nonempty, has_prev=has_prev, has_next=has_next,
                 n=n, B=B)


def aug_count(spans: Spans) -> jax.Array:
    """Number of points in each augmented range (f64) — pure index
    arithmetic, no pass over the data."""
    return (spans.aug_ends - spans.aug_starts).astype(jnp.float64)


def aug_centered_moments(spans: Spans, x: jax.Array, y: jax.Array,
                         mean_x: jax.Array, mean_y: jax.Array,
                         weights: jax.Array | None = None):
    """(m2, c) = per-leaf (sum (x-mx)^2, sum (x-mx)(y-my)) over the
    augmented ranges, fused so the mean gathers and the element pass
    are shared between both moments."""
    if spans.B == 1:
        mx_t, my_t = mean_x[0], mean_y[0]
    else:
        # NOTE: gathers stay 1-D — [n, k] intermediates are lane-padded
        # k->128 by TPU tiling (64x memory) and must never materialize
        # at n scale.
        mx_t = iso_take(mean_x, spans.t)
        my_t = iso_take(mean_y, spans.t)
    dx = x - mx_t
    dxx = dx * dx
    dxy = dx * (y - my_t)
    if weights is not None:
        dxx = dxx * weights
        dxy = dxy * weights
    i_m2 = range_sum(dxx, spans.starts, spans.ends)
    i_c = range_sum(dxy, spans.starts, spans.ends)

    def edge_terms(idx, present):
        i = jnp.clip(idx, 0, spans.n - 1)
        ex = x[i] - mean_x
        exx = ex * ex
        exy = ex * (y[i] - mean_y)
        if weights is not None:
            exx = exx * weights[i]
            exy = exy * weights[i]
        return (jnp.where(present, exx, 0.0),
                jnp.where(present, exy, 0.0))

    pxx, pxy = edge_terms(spans.starts - 1, spans.has_prev)
    nxx, nxy = edge_terms(spans.ends, spans.has_next)
    return i_m2 + pxx + nxx, i_c + pxy + nxy


def aug_sum(spans: Spans, values: jax.Array) -> jax.Array:
    """Per-leaf sum of ``values`` over the augmented range (f64 [B])."""
    return range_sum(values, spans.aug_starts, spans.aug_ends)


def aug_masked_stats(spans: Spans, values: jax.Array, weights: jax.Array):
    """(count, sum) of weighted values over augmented ranges.

    ``weights`` in {0,1} implement the reference's item-dropping (e.g.
    loglinear skips non-finite logs, linear.rs:63-67).
    """
    cnt = range_sum(weights, spans.aug_starts, spans.aug_ends)
    s = range_sum(values * weights, spans.aug_starts, spans.aug_ends)
    return cnt, s


def aug_centered_dot(spans: Spans, x: jax.Array, y: jax.Array,
                     mean_x: jax.Array, mean_y: jax.Array,
                     weights: jax.Array | None = None) -> jax.Array:
    """Per-leaf sum of (x - mean_x[j])*(y - mean_y[j]) over augmented
    ranges, where the means are PER-LEAF values.

    The interior of each augmented range belongs to the leaf itself, so
    a per-element gather of the element's own leaf mean plus one prefix
    sum covers [starts, ends); the (at most two) overlap elements are
    corrected with direct O(B) gathers.  This two-pass centering is the
    vectorized equivalent of the reference's single-pass Welford update
    (linear.rs:12-59) and is what preserves f64 accuracy when keys are
    ~2^63: uncentered sums of x^2 would lose ~45 bits to cancellation.
    """
    if spans.B == 1:
        # top-model fit: avoid materializing an n-element gather
        mt_x, mt_y = mean_x[0], mean_y[0]
    else:
        mt_x = mean_x[spans.t]
        mt_y = mean_y[spans.t]
    d = (x - mt_x) * (y - mt_y)
    if weights is not None:
        d = d * weights
    interior = range_sum(d, spans.starts, spans.ends)

    def edge_term(idx, present):
        i = jnp.clip(idx, 0, spans.n - 1)
        term = (x[i] - mean_x) * (y[i] - mean_y)
        if weights is not None:
            term = term * weights[i]
        return jnp.where(present, term, 0.0)

    prev_term = edge_term(spans.starts - 1, spans.has_prev)
    next_term = edge_term(spans.ends, spans.has_next)
    return interior + prev_term + next_term


def aug_first_last(spans: Spans):
    """Indices of the first/last element of each augmented range.

    Arbitrary (clipped) for empty leaves — fits special-case those.
    """
    first = jnp.clip(spans.aug_starts, 0, max(spans.n - 1, 0))
    last = jnp.clip(spans.aug_ends - 1, 0, max(spans.n - 1, 0))
    return first, last


def segment_max_sorted(values: jax.Array, t: jax.Array, B: int,
                       fill=0, nonempty: jax.Array | None = None) -> jax.Array:
    """Per-leaf max over the ORIGINAL (non-augmented) spans.

    Uses scatter-max; leaf ids are sorted which XLA exploits.  Empty
    leaves get ``fill`` (the reference initializes per-leaf error to 0,
    two_layer.rs:207).
    """
    out = jax.ops.segment_max(values, t, num_segments=B,
                              indices_are_sorted=True)
    if nonempty is None:
        nonempty = jax.ops.segment_sum(
            jnp.ones_like(t, dtype=jnp.int32), t,
            num_segments=B, indices_are_sorted=True) > 0
    if out.ndim > nonempty.ndim:
        nonempty = nonempty.reshape(nonempty.shape + (1,) * (out.ndim - 1))
    return jnp.where(nonempty, out, jnp.asarray(fill, dtype=values.dtype))


# ---------------------------------------------------------------------------
# scatter-free range maxima
# ---------------------------------------------------------------------------

_BLK = 128


def _block_maxes(v: jax.Array, fill) -> jax.Array:
    """[m] -> [ceil(m/128)] per-block maxima (one bandwidth pass)."""
    m = v.shape[0]
    pad = (-m) % _BLK
    if pad:
        v = jnp.concatenate([v, jnp.full((pad,), fill, v.dtype)])
    return v.reshape(-1, _BLK).max(axis=1)


def range_max(values: jax.Array, starts: jax.Array, ends: jax.Array,
              fill) -> jax.Array:
    """max(values[starts[j]:ends[j]]) per range; empty ranges -> fill.

    Scatter-free: per-leaf maxima over contiguous spans via a hierarchy
    of 128-block maxima.  Each level costs two [B]-row gathers (edge
    blocks, lane-masked) plus one bandwidth pass to build the next
    level; the topmost (<=256-element) level resolves by broadcast.
    Replaces segment_max scatters, which cost ~30ns/element on TPU.
    Above _ROW_DIRECT_MAX leaves the per-leaf resolve runs in chunks so
    the [B, 128] edge gathers never materialize at once.
    """
    fill_v = jnp.asarray(fill, values.dtype)

    levels = [values]
    while levels[-1].shape[0] > 256:
        levels.append(_block_maxes(levels[-1], fill_v))

    B = starts.shape[0]
    if B <= _ROW_DIRECT_MAX:
        return _range_max_solve(levels, fill_v, starts, ends)
    # chunked: pad with empty (0,0) spans, which resolve to fill
    return _map_leaf_chunks(
        lambda s_c, e_c: _range_max_solve(levels, fill_v, s_c, e_c),
        B, starts, ends)


def _range_max_solve(levels, fill_v, starts, ends):
    lanes = jnp.arange(_BLK, dtype=jnp.int32)
    out = jnp.full(starts.shape, fill_v, levels[0].dtype)
    s = starts.astype(jnp.int64)
    e = ends.astype(jnp.int64)

    for li, V in enumerate(levels):
        m = V.shape[0]
        nonempty = s < e
        if li == len(levels) - 1:
            # broadcast bottom: [B, m] masked max
            idx = jnp.arange(m, dtype=jnp.int64)
            mask = (idx[None, :] >= s[:, None]) & (idx[None, :] < e[:, None])
            lvl_max = jnp.max(jnp.where(mask, V[None, :], fill_v), axis=1)
            out = jnp.maximum(out, jnp.where(nonempty, lvl_max, fill_v))
            break

        nrows = -(-m // _BLK)
        pad = nrows * _BLK - m
        Vp = jnp.concatenate([V, jnp.full((pad,), fill_v, V.dtype)]) \
            if pad else V
        rows = Vp.reshape(nrows, _BLK)

        row_lo = jnp.clip(s >> 7, 0, nrows - 1)
        row_hi = jnp.clip((e - 1) >> 7, 0, nrows - 1)
        lo_start = (s & 127).astype(jnp.int32)
        hi_end = ((e - 1) & 127).astype(jnp.int32)  # inclusive lane

        blk_lo = rows[row_lo]                      # [B, 128]
        same_row = row_lo == row_hi
        lo_mask = lanes[None, :] >= lo_start[:, None]
        lo_mask &= jnp.where(same_row[:, None],
                             lanes[None, :] <= hi_end[:, None], True)
        lo_max = jnp.max(jnp.where(lo_mask & nonempty[:, None],
                                   blk_lo, fill_v), axis=1)

        blk_hi = rows[row_hi]
        hi_mask = (lanes[None, :] <= hi_end[:, None]) & ~same_row[:, None]
        hi_max = jnp.max(jnp.where(hi_mask & nonempty[:, None],
                                   blk_hi, fill_v), axis=1)

        out = jnp.maximum(out, jnp.maximum(lo_max, hi_max))

        # interior for the next level: blocks strictly between the edges
        s = row_lo + 1
        e = row_hi.astype(jnp.int64)
        e = jnp.where(nonempty, e, 0)
        s = jnp.where(nonempty, s, 1)

    return out


def leaf_constant_expand(per_leaf: jax.Array, starts: jax.Array, n: int):
    """Broadcast a per-leaf f64 value to every element of its span
    WITHOUT an n-scale gather: scatter boundary deltas, prefix-sum.

    The expanded values equal per_leaf only up to the telescoping-sum
    rounding (~B ulps); callers must treat them as their own constants
    and correct against the exact per-leaf values (see
    aug_centered_moments_expanded).  Returns (expanded [n], at_leaf [B])
    where at_leaf[j] is the constant actually used within leaf j.
    """
    prev = jnp.concatenate([jnp.zeros((1,), per_leaf.dtype), per_leaf[:-1]])
    delta = per_leaf - prev
    z = jnp.zeros((n,), per_leaf.dtype)
    # mode="drop": trailing EMPTY leaves have starts == n; their deltas
    # must not land on element n-1
    z = z.at[starts].add(delta, mode="drop")
    expanded = jnp.cumsum(z)
    at_leaf = expanded[jnp.clip(starts, 0, n - 1)]
    return expanded, at_leaf


def aug_centered_moments_expanded(spans: Spans, x, y, mean_x, mean_y,
                                  cx, cy):
    """(m2, c) like aug_centered_moments but with the per-element leaf
    means built by delta-scatter + prefix sum instead of two n-scale
    gathers (~30ns/element each).  Exact up to normal f64 rounding: the
    interior sums use the expanded constants c', then shift to the true
    means m via
        sum (x-m)^2        = S2' + 2 dx (Sx - n c'x) + n dx^2
        sum (x-m)(y-my)    = C' + dx (Sy - n c'y) + dy (Sx - n c'x)
                             + n dx dy,        d = c' - m
    with all shift terms [B]-sized.  ``cx``/``cy`` are cached prefix
    sums of x and y.  Edge (overlap) contributions use the exact means.
    """
    n = spans.n
    exp_x, cx_leaf = leaf_constant_expand(mean_x, spans.starts, n)
    exp_y, cy_leaf = leaf_constant_expand(mean_y, spans.starts, n)

    dxe = x - exp_x
    dye = y - exp_y
    S2 = range_sum(dxe * dxe, spans.starts, spans.ends)
    C = range_sum(dxe * dye, spans.starts, spans.ends)

    n_int = (spans.ends - spans.starts).astype(jnp.float64)
    sx_int = range_sum(x, spans.starts, spans.ends, cx)
    sy_int = range_sum(y, spans.starts, spans.ends, cy)
    rx = sx_int - n_int * cx_leaf     # sum (x - c'x) over the interior
    ry = sy_int - n_int * cy_leaf
    d_x = cx_leaf - mean_x
    d_y = cy_leaf - mean_y
    m2 = S2 + 2.0 * d_x * rx + n_int * d_x * d_x
    c = C + d_x * ry + d_y * rx + n_int * d_x * d_y

    def edge_terms(idx, present):
        i = jnp.clip(idx, 0, n - 1)
        ex = x[i] - mean_x
        exx = ex * ex
        exy = ex * (y[i] - mean_y)
        return (jnp.where(present, exx, 0.0),
                jnp.where(present, exy, 0.0))

    pxx, pxy = edge_terms(spans.starts - 1, spans.has_prev)
    nxx, nxy = edge_terms(spans.ends, spans.has_next)
    return m2 + pxx + nxx, c + pxy + nxy


def aug_centered_moments_pallas(spans: Spans, x, y, mean_x, mean_y, *,
                                span: int, weights=None):
    """(m2, c, ovf): centered moments via the fused Pallas moments
    kernel (ops/select_kernel.window_moments: per-key means selected
    from the leaf window AND the df64 centered products computed
    in-kernel — no n-scale emulated-f64 elementwise pass) and blocked
    range sums (no emulated-f64 cumsums).

    Centering on the f32-pair value c' instead of the f64 mean m moves
    the moments by ~cnt * (c'-m)^2 with |c'-m| <= 2^-48|m| —
    far below f64 summation noise, so no shift correction is needed.
    Edge (overlap) contributions use the exact means as before.
    ``weights`` in {0,1} drop items (loglinear's non-finite logs,
    linear.rs:63-67).
    """
    from rmi_tpu.ops.select_kernel import window_moments
    dxx, dxy, ovf = window_moments(
        spans.t, mean_x, mean_y, x, y, B=spans.B, span=span,
        weights=weights, xx_only=x is y)
    px = blocked_partials(dxx)
    py = blocked_partials(dxy)
    i_m2 = range_sum_blocked(dxx, spans.starts, spans.ends, px)
    i_c = range_sum_blocked(dxy, spans.starts, spans.ends, py)

    def edge_terms(idx, present):
        i = jnp.clip(idx, 0, spans.n - 1)
        ex = x[i] - mean_x
        exx = ex * ex
        exy = ex * (y[i] - mean_y)
        if weights is not None:
            exx = exx * weights[i]
            exy = exy * weights[i]
        return (jnp.where(present, exx, 0.0),
                jnp.where(present, exy, 0.0))

    pxx, pxy = edge_terms(spans.starts - 1, spans.has_prev)
    nxx, nxy = edge_terms(spans.ends, spans.has_next)
    return i_m2 + pxx + nxx, i_c + pxy + nxy, ovf


def aug_masked_stats_blocked(spans: Spans, values: jax.Array,
                             weights: jax.Array):
    """aug_masked_stats via blocked partial sums (the Pallas fit path —
    no emulated-f64 cumsums)."""
    cnt = range_sum_blocked(weights, spans.aug_starts, spans.aug_ends)
    s = range_sum_blocked(values * weights, spans.aug_starts,
                          spans.aug_ends)
    return cnt, s


def fill_forward(values_list, starts, nonempty, n: int):
    """EXACT piecewise-constant broadcast: element k gets its own
    leaf's values.  Selection-only segmented scan (keep-last-set
    combiner) — no arithmetic touches the values, so unlike
    leaf_constant_expand this is bit-exact and safe for floor-sensitive
    consumers (the error sweep).  Non-empty leaves have unique start
    indices, so scatter order is well-defined.
    """
    tgt = jnp.where(nonempty, starts, n)   # drop empties out of bounds
    flags = jnp.zeros((n,), bool).at[tgt].set(True, mode="drop")
    zs = [jnp.zeros((n,), v.dtype).at[tgt].set(v, mode="drop")
          for v in values_list]

    def comb(a, b):
        fa = a[0]
        fb = b[0]
        return (fa | fb,) + tuple(
            jnp.where(fb, vb, va) for va, vb in zip(a[1:], b[1:]))

    out = jax.lax.associative_scan(comb, (flags,) + tuple(zs))
    return list(out[1:])
