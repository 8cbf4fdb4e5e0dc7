"""Pallas elementwise leaf-eval kernel — the serving twin of the sweep
kernel.

Serving correctness requires that the prediction served for a key is
the SAME number the error sweep measured: the bound contract
|guess - lower_bound| <= err (tests/*/main.cpp in the reference) is a
statement about one arithmetic, not about real numbers.  On CPU both
sides are IEEE f64 and agree for free; on TPU the sweep kernel uses
explicit float-float (ops/df64.py), so the serving path must evaluate
leaves with the identical df64 code compiled by the same Mosaic
compiler.  This module provides that: a trivial elementwise kernel
that takes pre-gathered hi/lo parameter columns and hi/lo inputs and
returns the clamped integer prediction.

The caller (lookup_fast / two_layer's epsilon probes) does the row
GATHER in XLA — random-row gathers are XLA's strength on this
hardware (~25ns/row) and manual DMA loses 50x (probe_pallas3 D4) —
and only the ARITHMETIC runs in-kernel.  All kernel data is 2-D
[rows, 128]: Mosaic runs 1-D vectors at ~1/3 VPU throughput
(probes/probe_pallas5.py H2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rmi_tpu.ops import df64
from rmi_tpu.ops.sweep_kernel import leaf_eval_df64, use_interpret


_EB = 2048   # eval block (keys per grid step)


def _eval_kernel(*refs, leaf_type: str, ppm: int, n: int):
    xh_ref, xl_ref = refs[0], refs[1]
    col_refs = refs[2:2 + 2 * ppm]
    o_ref = refs[2 + 2 * ppm]

    def cols(j):
        return col_refs[j][:], col_refs[ppm + j][:]

    ph, plo = leaf_eval_df64(leaf_type, cols, xh_ref[:], xl_ref[:])
    o_ref[:] = df64.floor_to_i32(ph, plo, 0, n)


@functools.partial(jax.jit, static_argnames=("leaf_type", "ppm", "n"))
def _eval_call(xh, xl, col_list, *, leaf_type, ppm, n):
    m = xh.shape[0]
    SUB = _EB // 128
    nblocks = m // _EB
    ins = [xh.reshape(-1, 128), xl.reshape(-1, 128)] + \
        [c.reshape(-1, 128) for c in col_list]
    with jax.enable_x64(False):
        grid_spec = pl.GridSpec(
            grid=(nblocks,),
            in_specs=[pl.BlockSpec((SUB, 128), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM)] * len(ins),
            out_specs=pl.BlockSpec((SUB, 128), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM))
        kern = functools.partial(_eval_kernel, leaf_type=leaf_type,
                                 ppm=ppm, n=n)
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((m // 128, 128), jnp.int32),
            grid_spec=grid_spec, interpret=use_interpret())(*ins)
    return out.reshape(-1)


def leaf_eval_clamped(xn, sel_pairs, *, leaf_type: str, ppm: int, n: int):
    """Clamped integer predictions max(0, min(n, floor(leaf(x)))).

    ``xn``      [m] f64 normalized inputs;
    ``sel_pairs`` [m, >=2*ppm] f32 — per-element (hi..., lo...) param
    columns, typically XLA-gathered rows of
    sweep_kernel.pad_param_table's output.
    Returns [m] i32.
    """
    xh, xl = df64.from_f64(xn)
    m = xh.shape[0]
    pad = (-m) % _EB
    if pad:
        xh = jnp.concatenate([xh, jnp.zeros((pad,), jnp.float32)])
        xl = jnp.concatenate([xl, jnp.zeros((pad,), jnp.float32)])
        sel_pairs = jnp.concatenate(
            [sel_pairs, jnp.zeros((pad, sel_pairs.shape[1]), jnp.float32)])
    cols = [sel_pairs[:, j] for j in range(2 * ppm)]
    out = _eval_call(xh, xl, cols, leaf_type=leaf_type, ppm=ppm, n=n)
    return out[:m]
