"""Pallas window-select kernel: per-key rows of a [B, 128] leaf table.

The generic building block behind the Pallas build path: leaf ids over
the sorted key array are non-decreasing, so each 2048-key block reads
one contiguous window of the table (single DMA) and selects per-key
values with a rank-3 one-hot matmul at HIGHEST precision (exact for
finite f32 tables, probes/probe_pallas5.py H1/H7).

Used by the fit stage to expand per-leaf means to per-key values —
the scatter+cumsum expansion (utils/segments.leaf_constant_expand)
costs ~9ns/key in emulated f64 and an f32 variant would drift by
B * eps_f32 (fatal for centered moments); this kernel is exact
(selects the true f32-pair means) at ~2-3ns/key.

Same window/overflow contract as the sweep kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rmi_tpu.ops.sweep_kernel import KB, use_interpret


def _select_kernel(blk_lo_ref, t_ref, w_ref, out_refs, ovf_ref,
                   wloc_ref, sem, *, ncols: int, B: int, span: int):
    # out_refs: the nested tuple of ncols output refs (pallas preserves
    # the out_shape pytree structure)
    g = pl.program_id(0)
    rows = min(span, B)
    SUB = KB // 128
    lo = jnp.minimum(blk_lo_ref[g], jnp.int32(max(B - rows, 0)))

    cp = pltpu.make_async_copy(w_ref.at[pl.ds(lo, rows), :], wloc_ref, sem)
    cp.start()
    cp.wait()

    flag = (t_ref[SUB - 1, 127] - lo > jnp.int32(rows - 1)
            ).astype(jnp.int32)
    prev = jnp.where(g == 0, jnp.int32(0), ovf_ref[0, 0])
    ovf_ref[0, 0] = jnp.maximum(prev, flag)

    # leading-column sel layout — see ops/sweep_kernel.py (trailing-dim
    # rank-3 slices cost ~4ns/key in relayouts; dim-0 indexing is free)
    tl = jnp.clip(t_ref[:] - lo, 0, rows - 1)
    onehotT = (jax.lax.broadcasted_iota(jnp.int32, (rows, SUB, 128), 0)
               == tl[None, :, :]).astype(jnp.float32)
    wn = wloc_ref[:][:, :ncols]
    wnT = jnp.transpose(wn, (1, 0))
    selT = jax.lax.dot_general(
        wnT, onehotT, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)       # [ncols, SUB, 128]
    for c in range(ncols):
        out_refs[c][:] = selT[c]


@functools.partial(jax.jit, static_argnames=("ncols", "B", "span"))
def _select_call(t, w_pad, blk_lo, *, ncols, B, span):
    n = t.shape[0]
    nblocks = n // KB
    SUB = KB // 128
    t2 = t.reshape(-1, 128)
    with jax.enable_x64(False):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblocks,),
            in_specs=[pl.BlockSpec((SUB, 128), lambda g, b: (g, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=(
                tuple(pl.BlockSpec((SUB, 128), lambda g, b: (g, 0),
                                   memory_space=pltpu.VMEM)
                      for _ in range(ncols)),
                pl.BlockSpec((1, 1), lambda g, b: (0, 0),
                             memory_space=pltpu.SMEM)),
            scratch_shapes=[
                pltpu.VMEM((min(span, B), 128), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ])
        kern = functools.partial(_select_kernel, ncols=ncols, B=B,
                                 span=span)
        outs, ovf = pl.pallas_call(
            kern,
            out_shape=(
                tuple(jax.ShapeDtypeStruct((nblocks * SUB, 128),
                                           jnp.float32)
                      for _ in range(ncols)),
                jax.ShapeDtypeStruct((1, 1), jnp.int32)),
            grid_spec=grid_spec, interpret=use_interpret(),
        )(blk_lo, t2, w_pad)
    return [o.reshape(-1) for o in outs], ovf[0, 0]


def _moments_kernel(blk_lo_ref, xh_ref, xl_ref, yh_ref, yl_ref, wt_ref,
                    t_ref, w_ref, out_refs, ovf_ref, wloc_ref, sem, *,
                    B: int, span: int, has_w: bool, xx_only: bool):
    """Fused select + centered products: selects each key's per-leaf
    df64 means (one-hot matmul over the DMA'd window) and computes
    dxx = (x-mx)^2 and dxy = (x-mx)(y-my) in-kernel as df64 pairs.

    Replaces the n-scale emulated-f64 elementwise pass that
    utils/segments.aug_centered_moments_pallas previously ran in XLA
    between the select kernel and the blocked range sums (~150ms at
    n=200M) — the differences and products now happen on data already
    resident in VMEM."""
    g = pl.program_id(0)
    rows = min(span, B)
    SUB = KB // 128
    lo = jnp.minimum(blk_lo_ref[g], jnp.int32(max(B - rows, 0)))

    cp = pltpu.make_async_copy(w_ref.at[pl.ds(lo, rows), :], wloc_ref, sem)
    cp.start()
    cp.wait()

    flag = (t_ref[SUB - 1, 127] - lo > jnp.int32(rows - 1)
            ).astype(jnp.int32)
    prev = jnp.where(g == 0, jnp.int32(0), ovf_ref[0, 0])
    ovf_ref[0, 0] = jnp.maximum(prev, flag)

    ncols = 2 if xx_only else 4
    tl = jnp.clip(t_ref[:] - lo, 0, rows - 1)
    onehotT = (jax.lax.broadcasted_iota(jnp.int32, (rows, SUB, 128), 0)
               == tl[None, :, :]).astype(jnp.float32)
    wn = wloc_ref[:][:, :ncols]
    wnT = jnp.transpose(wn, (1, 0))
    selT = jax.lax.dot_general(
        wnT, onehotT, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)       # [ncols, SUB, 128]

    from rmi_tpu.ops import df64
    dxh, dxl = df64.sub(xh_ref[:], xl_ref[:], selT[0], selT[1])
    xxh, xxl = df64.mul(dxh, dxl, dxh, dxl)
    if xx_only:
        xyh, xyl = xxh, xxl
    else:
        dyh, dyl = df64.sub(yh_ref[:], yl_ref[:], selT[2], selT[3])
        xyh, xyl = df64.mul(dxh, dxl, dyh, dyl)
    if has_w:
        w = wt_ref[:]          # 0/1 weights: exact on hi and lo alike
        xxh, xxl = xxh * w, xxl * w
        xyh, xyl = xyh * w, xyl * w
    out_refs[0][:] = xxh
    out_refs[1][:] = xxl
    out_refs[2][:] = xyh
    out_refs[3][:] = xyl


@functools.partial(jax.jit,
                   static_argnames=("B", "span", "has_w", "xx_only"))
def _moments_call(xh, xl, yh, yl, wt, t, w_pad, blk_lo, *, B, span,
                  has_w, xx_only):
    n = t.shape[0]
    nblocks = n // KB
    SUB = KB // 128
    planes = [xh, xl] + ([] if xx_only else [yh, yl]) \
        + ([wt] if has_w else [])
    planes2 = [p.reshape(-1, 128) for p in planes]
    t2 = t.reshape(-1, 128)
    with jax.enable_x64(False):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblocks,),
            in_specs=[pl.BlockSpec((SUB, 128), lambda g, b: (g, 0),
                                   memory_space=pltpu.VMEM)
                      ] * (len(planes2) + 1) +
                     [pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=(
                tuple(pl.BlockSpec((SUB, 128), lambda g, b: (g, 0),
                                   memory_space=pltpu.VMEM)
                      for _ in range(4)),
                pl.BlockSpec((1, 1), lambda g, b: (0, 0),
                             memory_space=pltpu.SMEM)),
            scratch_shapes=[
                pltpu.VMEM((min(span, B), 128), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ])

        def kern(blk_lo_ref, *refs):
            refs = list(refs)
            xh_r, xl_r = refs.pop(0), refs.pop(0)
            if xx_only:
                yh_r, yl_r = xh_r, xl_r
            else:
                yh_r, yl_r = refs.pop(0), refs.pop(0)
            wt_r = refs.pop(0) if has_w else None
            t_r, w_r, out_r, ovf_r, wloc_r, sem = refs
            return _moments_kernel(
                blk_lo_ref, xh_r, xl_r, yh_r, yl_r, wt_r, t_r, w_r,
                out_r, ovf_r, wloc_r, sem, B=B, span=span, has_w=has_w,
                xx_only=xx_only)

        outs, ovf = pl.pallas_call(
            kern,
            out_shape=(
                tuple(jax.ShapeDtypeStruct((nblocks * SUB, 128),
                                           jnp.float32)
                      for _ in range(4)),
                jax.ShapeDtypeStruct((1, 1), jnp.int32)),
            grid_spec=grid_spec, interpret=use_interpret(),
        )(blk_lo, *planes2, t2, w_pad)
    return [o.reshape(-1) for o in outs], ovf[0, 0]


def window_moments(t, mean_x, mean_y, x, y, *, B: int, span: int,
                   weights=None, xx_only: bool = False):
    """(dxx [n] f64, dxy [n] f64, ovf): fused per-key centered products.

    ``mean_x``/``mean_y`` are [B] f64 per-leaf centers; ``x``/``y`` [n]
    f64; ``weights`` optional [n] 0/1.  ``xx_only`` skips the dxy
    product (normal/lognormal variance: x is y) — dxy returns dxx.
    Same window/overflow contract as window_select."""
    from rmi_tpu.ops import df64
    n = t.shape[0]
    mxh, mxl = df64.from_f64(mean_x)
    cols = [mxh, mxl] if xx_only else \
        [mxh, mxl, *df64.from_f64(mean_y)]
    pad = jnp.zeros((B, 128 - len(cols)), jnp.float32)
    w_pad = jnp.concatenate([c[:, None] for c in cols] + [pad], axis=1)

    xh, xl = df64.from_f64(x)
    yh = yl = xh                         # placeholders when xx_only
    if not xx_only:
        yh, yl = df64.from_f64(y)
    wt = None if weights is None else weights.astype(jnp.float32)

    npad = (-n) % KB
    if npad:
        def padlast(a):
            return jnp.concatenate(
                [a, jnp.broadcast_to(a[-1:], (npad,))])
        xh, xl, yh, yl = map(padlast, (xh, xl, yh, yl))
        t = padlast(t)
        if wt is not None:
            wt = padlast(wt)
    tp = t.astype(jnp.int32)
    blk_lo = tp[::KB]
    outs, ovf = _moments_call(xh, xl, yh, yl, wt, tp, w_pad, blk_lo,
                              B=B, span=span, has_w=wt is not None,
                              xx_only=xx_only)
    dxx = df64.to_f64(outs[0][:n], outs[1][:n])
    dxy = df64.to_f64(outs[2][:n], outs[3][:n])
    return dxx, dxy, ovf


def window_select(t, cols, *, B: int, span: int):
    """Per-key selected values for each [B] f64 column in ``cols``.

    Returns ([n] f64 per column, ovf scalar): each column is split into
    an f32 (hi, lo) pair for exact transport through the f32 table.
    """
    from rmi_tpu.ops import df64
    n = t.shape[0]
    pairs = []
    for c in cols:
        hi, lo = df64.from_f64(c)
        pairs += [hi, lo]
    ncols = len(pairs)
    assert ncols <= 128
    pad = jnp.zeros((cols[0].shape[0], 128 - ncols), jnp.float32)
    w_pad = jnp.concatenate([p[:, None] for p in pairs] + [pad], axis=1)

    npad = (-n) % KB
    tp = jnp.concatenate([t.astype(jnp.int32),
                          jnp.broadcast_to(t[-1:].astype(jnp.int32),
                                           (npad,))]) if npad \
        else t.astype(jnp.int32)
    blk_lo = tp[::KB]
    outs, ovf = _select_call(tp, w_pad, blk_lo, ncols=ncols, B=B,
                             span=span)
    result = []
    for i in range(len(cols)):
        hi = outs[2 * i][:n]
        lo = outs[2 * i + 1][:n]
        result.append(hi.astype(jnp.float64) + lo.astype(jnp.float64))
    return result, ovf
