"""Equi-depth histogram root model (histogram.rs:14-104).

num_bins = the container's LAST raw target after scaling
(histogram.rs:24, via RMITrainingData::get => raw offset), so it is
statically computable from (n, branching_factor) on the host:
num_bins = trunc((n-1) * B/n).  Pivots are the raw keys at multiples of
items_per_bin; prediction is upper_bound(pivots, key) - 1
(histogram.rs:57-61).  A 20-bit radix acceleration index over the
pivots (utils.rs:55-102) is built for artifact/serving parity; on
device the prediction itself is a searchsorted.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rmi_tpu.keys import as_int
from rmi_tpu.models.base import ModelDef, Restriction, register

RADIX_INDEX_BITS = 20  # histogram.rs:48


def build_radix_index(points_u64, num_bits: int = RADIX_INDEX_BITS):
    """radix_index (utils.rs:55-102): for each 2^bits bucket, the index
    of the first point whose top bits reach it; one trailing entry of
    len(points).  Monotone buckets => a sorted-into-sorted count;
    sorted_starts replaces the searchsorted (whose XLA lowering is a
    while-loop of 2^bits x log2(npts) dependent gathers) with blocked
    full-lane compare-reduces."""
    from rmi_tpu.utils.segments import sorted_starts
    npts = points_u64.shape[0]
    radix = points_u64 >> jnp.uint64(64 - num_bits)
    idx = sorted_starts(radix, 1 << num_bits).astype(jnp.uint64)
    return jnp.concatenate([idx, jnp.full((1,), npts, dtype=jnp.uint64)])


_ROW = 128           # lanes per gathered pivot row
_FAN = 64            # subsampling factor between levels
_UB_CHUNK = 1 << 20  # bounds the [chunk, 128] row-gather transient


def _hier_upper_bound(pivots, ki):
    """#{j : pivots[j] <= q} per query, via hierarchical row counts.

    jnp.searchsorted lowers to a per-query binary-search loop —
    log2(P) DEPENDENT 1-element gathers per query, the worst access
    shape for TPU HBM (measured ~4x slowdown of the whole serving path
    at P=4096).  Monotone counting needs no such loop: a level ladder
    pivots[::64^k] down to <=128 entries gives the count at the top
    level from ONE broadcast compare, and each finer level refines it
    with ONE full-lane row gather + compare-reduce (the coarse count c
    brackets the finer count inside [64(c-1)+1, 64c], so the row at
    (64c-63)>>6 always covers it).  Queries are chunked so the
    [chunk, 128] gather transient stays bounded at build-sweep scale.
    """
    maxv = np.iinfo(np.dtype(pivots.dtype)).max
    levels = [pivots]
    while levels[-1].shape[0] > _ROW:
        levels.append(levels[-1][::_FAN])
    top = levels[-1]
    top_row = jnp.concatenate(
        [top, jnp.full((_ROW - top.shape[0],), maxv, top.dtype)])
    row_views = []
    for lvl in levels[-2::-1]:
        m = lvl.shape[0]
        nrows = max(1, -(-m // _FAN))
        padded = jnp.concatenate(
            [lvl, jnp.full((nrows * _FAN + _ROW - m,), maxv, lvl.dtype)])
        lo = padded[:nrows * _FAN].reshape(nrows, _FAN)
        hi = padded[_FAN:nrows * _FAN + _FAN].reshape(nrows, _FAN)
        row_views.append((m, jnp.concatenate([lo, hi], axis=1)))

    def count_chunk(q):
        cnt = jnp.sum(top_row[None, :] <= q[:, None], axis=1,
                      dtype=jnp.int32).astype(jnp.int64)
        cnt = jnp.minimum(cnt, top.shape[0])
        for m, rows in row_views:
            lb = jnp.maximum(cnt * _FAN - (_FAN - 1), 0)
            r = jnp.clip(lb >> 6, 0, rows.shape[0] - 1)
            cnt = r * _FAN + jnp.sum(rows[r] <= q[:, None], axis=1,
                                     dtype=jnp.int32)
            cnt = jnp.minimum(cnt, m)
        return cnt

    nq = ki.shape[0]
    if nq <= _UB_CHUNK:
        return count_chunk(ki)
    pad = (-nq) % _UB_CHUNK
    kp = jnp.concatenate([ki, jnp.broadcast_to(ki[-1:], (pad,))]) \
        if pad else ki
    out = jax.lax.map(count_chunk, kp.reshape(-1, _UB_CHUNK))
    return out.reshape(-1)[:nq]


def _histogram_fit_top(keys_f, ys_f, ep_ys_f, n, keys=None, B=None,
                       scale=None, **_):
    # num_bins = data.get(len-1).1 scaled (histogram.rs:24): raw offset
    # n-1 through map_scale truncation (models/mod.rs:238-250).
    if abs(scale - 1.0) > 2.220446049250313e-16:
        num_bins = int(float(n - 1) * scale)
    else:
        num_bins = n - 1
    if num_bins <= 0:
        raise ValueError("not enough items for equidepth histogram")
    items_per_bin = n // num_bins
    if items_per_bin < 1:
        raise ValueError(
            "not enough items for equidepth histogram")  # histogram.rs:27
    pivot_idx = jnp.arange(num_bins, dtype=jnp.int64) * items_per_bin
    pivots = as_int(keys)[pivot_idx]
    return {"count": jnp.uint64(num_bins),
            "pivots": pivots,
            "radix_index": build_radix_index(pivots)}


def _histogram_predict(params, leaf_idx, keys, key_type=None):
    # upper_bound(pivots, key) - 1 (histogram.rs:57-61).  Keys below the
    # first pivot wrap to u64::MAX like the reference's usize underflow
    # (the later min(B-1, .) clamp sends them to the last leaf).
    ki = as_int(keys)
    ub = _hier_upper_bound(params["pivots"], ki)
    return (ub.astype(jnp.int64) - 1).astype(jnp.uint64)


register(ModelDef(
    name="histogram", ppm=3, restriction=Restriction.MUST_BE_TOP,
    needs_bounds_check=False, output_int=True, leaf_capable=False,
    fit_top=_histogram_fit_top, fit_leaves=None,
    predict=_histogram_predict, constant_params=None,
    bytes_per_model=None, function_name="ed_histogram"))
