"""Equi-depth histogram root model (histogram.rs:14-104).

num_bins = the container's LAST raw target after scaling
(histogram.rs:24, via RMITrainingData::get => raw offset), so it is
statically computable from (n, branching_factor) on the host:
num_bins = trunc((n-1) * B/n).  Pivots are the raw keys at multiples of
items_per_bin; prediction is upper_bound(pivots, key) - 1
(histogram.rs:57-61).  A 20-bit radix acceleration index over the
pivots (utils.rs:55-102) is built for artifact/serving parity; on
device the prediction itself is a hier_count ladder (segments.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from rmi_tpu.keys import as_int
from rmi_tpu.models.base import ModelDef, Restriction, register
from rmi_tpu.utils import segments as seg

RADIX_INDEX_BITS = 20  # histogram.rs:48


def build_radix_index(points_u64, num_bits: int = RADIX_INDEX_BITS):
    """radix_index (utils.rs:55-102): for each 2^bits bucket, the index
    of the first point whose top bits reach it; one trailing entry of
    len(points).  Monotone buckets => a sorted-into-sorted count;
    sorted_starts replaces the searchsorted (whose XLA lowering is a
    while-loop of 2^bits x log2(npts) dependent gathers) with blocked
    full-lane compare-reduces."""
    npts = points_u64.shape[0]
    radix = points_u64 >> jnp.uint64(64 - num_bits)
    idx = seg.sorted_starts(radix, 1 << num_bits).astype(jnp.uint64)
    return jnp.concatenate([idx, jnp.full((1,), npts, dtype=jnp.uint64)])


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
    # hier_count: per-query upper_bound without searchsorted's
    # dependent-gather loop (~4x on the whole serving path at B=4096)
    ub = seg.hier_count(params["pivots"], ki, strict=False)
    return (ub - 1).astype(jnp.uint64)


register(ModelDef(
    name="histogram", ppm=3, restriction=Restriction.MUST_BE_TOP,
    needs_bounds_check=False, output_int=True, leaf_capable=False,
    fit_top=_histogram_fit_top, fit_leaves=None,
    predict=_histogram_predict, constant_params=None,
    bytes_per_model=None, function_name="ed_histogram"))
