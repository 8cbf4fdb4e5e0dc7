"""Pallas single-pass running max/min (i32) with grid carries.

The build's two [n]-scale monotone scans (FixDups first-occurrence
cummax and the run-length reverse cummin, train/two_layer.py:77-132)
run in XLA as ~log2(512) shifted full-array passes after the blocked
rewrite (utils/segments._blocked_scan) — ~9x the array's HBM traffic.
TPU grid steps execute SEQUENTIALLY, so a Pallas kernel can instead
stream the array ONCE, keeping the running carry in SMEM across grid
steps: per [R, 128] block it does a 7-step lane scan + a log2(R)-step
sublane scan in VMEM (register-resident), combines the carry, and
writes the block — total HBM traffic = one read + one write.

Reverse scans reverse the GRID (index_map ``nb-1-g``) and the in-block
shift direction — no host-side array flips.

Exactness: max/min never round, so this kernel is bit-identical to
``lax.cummax/cummin`` and safe in both eval modes (unlike the df64
sweep kernels it does not change ``TrainedRMI.eval_mode``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rmi_tpu.ops.sweep_kernel import use_interpret

ROWS = 256         # [ROWS, 128] i32 block = 32768 elements (best of 256/512/1024 on v5e)


def _scan_kernel(x_ref, out_ref, carry_ref, *, is_max: bool, fill: int,
                 reverse: bool):
    # Mosaic rejects sub-tile concatenates/slices ("offset mismatch"),
    # so every shift is a cyclic pltpu.roll + an iota mask to the fill
    # value — both native vector ops.
    g = pl.program_id(0)
    op = jnp.maximum if is_max else jnp.minimum
    red = jnp.max if is_max else jnp.min
    x = x_ref[:]                                   # [R, 128] i32
    R = x.shape[0]
    fill_v = jnp.asarray(fill, x.dtype)

    def shifted(v, sh, axis):
        """v shifted by ``sh`` along ``axis`` in the scan direction,
        vacated positions filled with the op identity."""
        size = v.shape[axis]
        pos = jax.lax.broadcasted_iota(jnp.int32, v.shape, axis)
        if reverse:
            rolled = pltpu.roll(v, jnp.int32(size - sh), axis=axis)
            mask = pos < size - sh
        else:
            rolled = pltpu.roll(v, jnp.int32(sh), axis=axis)
            mask = pos >= sh
        return jnp.where(mask, rolled, fill_v)

    # lane scan (within each 128-lane row)
    sh = 1
    while sh < 128:
        x = op(x, shifted(x, sh, 1))
        sh *= 2

    # sublane scan of the per-row totals (broadcast to full lanes: the
    # inclusive row scan's reduce IS its directional total)
    t = jnp.broadcast_to(red(x, axis=1, keepdims=True), x.shape)
    sh = 1
    while sh < R:
        t = op(t, shifted(t, sh, 0))
        sh *= 2
    excl = shifted(t, 1, 0)                        # exclusive row carry

    prev = jnp.where(g == 0, fill_v, carry_ref[0, 0])
    out_ref[:] = op(op(x, excl), prev)
    carry_ref[0, 0] = op(prev, red(x_ref[:]))


@functools.partial(jax.jit,
                   static_argnames=("is_max", "fill", "reverse"))
def _scan_call(x2, *, is_max: bool, fill: int, reverse: bool):
    nb = x2.shape[0] // ROWS
    if reverse:
        def imap(g):
            return (nb - 1 - g, 0)
    else:
        def imap(g):
            return (g, 0)
    kern = functools.partial(_scan_kernel, is_max=is_max, fill=fill,
                             reverse=reverse)
    with jax.enable_x64(False):   # index-map literals must trace as i32
        out, _ = pl.pallas_call(
            kern,
            grid=(nb,),
            in_specs=[pl.BlockSpec((ROWS, 128), imap,
                                   memory_space=pltpu.VMEM)],
            out_specs=(pl.BlockSpec((ROWS, 128), imap,
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((1, 1), lambda g: (0, 0),
                                    memory_space=pltpu.SMEM)),
            out_shape=(jax.ShapeDtypeStruct(x2.shape, x2.dtype),
                       jax.ShapeDtypeStruct((1, 1), x2.dtype)),
            interpret=use_interpret(),
        )(x2)
    return out


def scan_i32(v: jax.Array, *, is_max: bool, fill: int,
             reverse: bool = False) -> jax.Array:
    """Inclusive running max/min over an [n] i32 array, one HBM pass."""
    assert v.dtype == jnp.int32
    n = v.shape[0]
    blk = ROWS * 128
    pad = (-n) % blk
    vp = jnp.concatenate(
        [v, jnp.full((pad,), jnp.asarray(fill, v.dtype))]) if pad else v
    out = _scan_call(vp.reshape(-1, 128), is_max=is_max, fill=fill,
                     reverse=reverse)
    return out.reshape(-1)[:n]
