"""Pallas error-sweep kernel: per-key |floor(leaf(x)) - y| without
per-key HBM gathers.

The XLA sweep (train/two_layer.py stage C) fetches each key's leaf
parameters with per-key column gathers — ~30ns/element on this TPU,
the dominant cost of large builds.  This kernel exploits the central
structural fact of the framework (utils/segments.py): leaf ids over
the sorted key array are NON-DECREASING, so a block of consecutive
keys touches a CONTIGUOUS range of leaves.  Per 2048-key block it DMAs
that parameter range into VMEM once and selects each key's row with a
one-hot matmul — the whole sweep becomes a streaming pass at a
measured ~7ns/key (probes/probe_pallas4.py G6), vs ~60+ns/key for the
gather-based XLA path.

Mosaic facts this design is built on (probes/probe_pallas*.py):
  * 64-bit types are rejected — everything here is f32/i32, with
    predictions in explicit float-float (ops/df64.py), the same
    precision class as XLA's TPU f64 emulation;
  * in-kernel vector gathers (take_along_axis) miscompile — row
    selection uses a one-hot matmul at HIGHEST precision, which is
    EXACTLY correct for finite tables (each one-hot row has a single
    1.0, exact in bf16, and the bf16x3 decomposition of an f32 is
    exact);
  * VMEM slices must be 128-lane aligned — the parameter table is
    lane-padded to [B, 128] (hi columns 0..ppm, lo columns ppm..2ppm);
  * manual per-row DMAs cost ~1.5us — only ONE block-level DMA is
    issued per 2048 keys.

Leaf families covered: linear / robust_linear / linear_spline (shared
eval), cubic, loglinear.  Others fall back to the XLA sweep, as do
blocks whose leaf span exceeds the DMA window (``max_block_leaf_span``
guard — adversarially skewed assignments).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rmi_tpu.ops import df64

KB = 2048          # keys per block (VMEM-fit sweet spot, probe G4-G6)


def use_interpret() -> bool:
    """Mosaic kernels interpret on CPU (tests); compile elsewhere."""
    import jax as _jax
    return _jax.default_backend() == "cpu"

SPANS = (64, 256, 1024)   # supported per-block leaf-row windows

PALLAS_SWEEP_LEAVES = ("linear", "robust_linear", "linear_spline",
                       "cubic", "loglinear", "normal", "lognormal")

# df64 pair of the normal-CDF logistic constant (normal.rs:24-26);
# -1.65451 is not f32-representable, so it travels as an (hi, lo) pair.
_PHI_K_H, _PHI_K_L = df64.from_np(-1.65451)


def df64_eval_input(leaf_type: str, leaf_in):
    """The f64 per-key input the df64 kernels expect.

    lognormal predicts on fmax(0, ln(x)) with NaN -> 0 (normal.rs:166);
    the ln is a PER-KEY input transform, so it runs in exact XLA f64
    OUTSIDE the kernel and the kernel then treats lognormal exactly as
    normal — no in-kernel transcendental needed.  Every df64 consumer
    (error sweep, epsilon probes, both serving paths) must route its
    input through this function so build and serve agree bit-for-bit.
    """
    if leaf_type == "lognormal":
        raw = jnp.log(leaf_in)
        return jnp.where(jnp.isnan(raw), 0.0, jnp.maximum(raw, 0.0))
    return leaf_in


def _exp1_df64(vh, vl):
    """exp1(v) = (1 + v/64)^64 (linear.rs:156-166): 6 df64 squarings."""
    vh, vl = df64.mul_f32(vh, vl, jnp.float32(1.0 / 64.0))
    vh, vl = df64.add_f32(vh, vl, jnp.float32(1.0))
    for _ in range(6):
        vh, vl = df64.mul(vh, vl, vh, vl)
    return vh, vl


def leaf_eval_df64(leaf_type: str, cols, xh, xl):
    """df64 leaf eval from hi/lo column pairs.

    ``cols`` maps j -> (hi, lo) f32 arrays for param column j.  The
    operation order mirrors the reference exactly: linear is
    fma(beta, x, alpha) (linear.rs:89), cubic is three chained fmas
    (cubic_spline.rs:144-149), loglinear is exp1(fma(beta, x, alpha))
    (linear.rs:156-166), normal/lognormal are
    phi((x - mean)/stdev) * scale with the logistic phi
    (normal.rs:24-26, 163-167; the lognormal ln is precomputed —
    see df64_eval_input).
    """
    if leaf_type in ("linear", "robust_linear", "linear_spline"):
        ah, al = cols(0)
        bh, bl = cols(1)
        return df64.fma(bh, bl, xh, xl, ah, al)
    if leaf_type == "cubic":
        ph, plo = cols(0)
        for j in (1, 2, 3):
            ch, cl = cols(j)
            ph, plo = df64.fma(ph, plo, xh, xl, ch, cl)
        return ph, plo
    if leaf_type == "loglinear":
        ah, al = cols(0)
        bh, bl = cols(1)
        vh, vl = df64.fma(bh, bl, xh, xl, ah, al)
        return _exp1_df64(vh, vl)
    if leaf_type in ("normal", "lognormal"):
        mh, ml = cols(0)
        sh, sl = cols(1)
        ch, cl = cols(2)
        dh, dl = df64.sub(xh, xl, mh, ml)
        zh, zl = df64.div(dh, dl, sh, sl)
        uh, ul = df64.mul(zh, zl, jnp.float32(_PHI_K_H),
                          jnp.float32(_PHI_K_L))
        eh, el = _exp1_df64(uh, ul)
        qh, ql = df64.add_f32(eh, el, jnp.float32(1.0))
        ph, plo = df64.div(jnp.float32(1.0), jnp.float32(0.0), qh, ql)
        return df64.mul(ph, plo, ch, cl)
    raise ValueError(leaf_type)


def _sweep_kernel(blk_lo_ref, xh_ref, xl_ref, y_ref, t_ref, w_ref,
                  err_ref, ovf_ref, wloc_ref, sem, *, leaf_type: str,
                  ppm: int, n: int, B: int, span: int):
    g = pl.program_id(0)
    rows = min(span, B)
    SUB = KB // 128
    lo = jnp.minimum(blk_lo_ref[g], jnp.int32(max(B - rows, 0)))

    cp = pltpu.make_async_copy(w_ref.at[pl.ds(lo, rows), :], wloc_ref, sem)
    cp.start()
    cp.wait()

    # window-overflow flag, max-accumulated across the (sequential)
    # grid into one SMEM scalar: the block's last leaf id (t is
    # non-decreasing) must fall inside the DMA'd window.  Overflowed
    # blocks produce garbage errors; the caller discards the whole
    # build and retries with a wider span / the XLA sweep.
    flag = (t_ref[SUB - 1, 127] - lo > jnp.int32(rows - 1)
            ).astype(jnp.int32)
    prev = jnp.where(g == 0, jnp.int32(0), ovf_ref[0, 0])
    ovf_ref[0, 0] = jnp.maximum(prev, flag)

    # Everything stays 2-D [SUB, 128]: Mosaic runs 1-D vectors at ~1/3
    # of VPU throughput (probes/probe_pallas5.py H2 vs probe_pallas4
    # G6).  The one-hot select produces sel in a LEADING-column layout
    # [2ppm, SUB, 128]: consuming trailing-dim slices of a rank-3
    # result costs ~4.3ns/key in lane relayouts, while dim-0 indexing
    # is free (probes/probe_sweep_bisect.py: 6.1 -> 1.8 ns/key).
    tl = jnp.clip(t_ref[:] - lo, 0, rows - 1)             # [SUB, 128]
    onehotT = (jax.lax.broadcasted_iota(jnp.int32, (rows, SUB, 128), 0)
               == tl[None, :, :]).astype(jnp.float32)
    wn = wloc_ref[:][:, :2 * ppm]   # VALUE lane-slice (probe H7)
    wnT = jnp.transpose(wn, (1, 0))                       # [2ppm, rows]
    selT = jax.lax.dot_general(
        wnT, onehotT,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)         # [2ppm, SUB, 128]

    def cols(j):
        return selT[j], selT[ppm + j]

    ph, plo = leaf_eval_df64(leaf_type, cols, xh_ref[:], xl_ref[:])
    pred = df64.floor_to_i32(ph, plo, 0, n)               # [0, n]
    y = jnp.minimum(y_ref[:], jnp.int32(n))
    err_ref[:] = jnp.abs(pred - y)


@functools.partial(jax.jit,
                   static_argnames=("leaf_type", "ppm", "n", "B", "span"))
def _sweep_call(xh, xl, yfix, t, w_pad, blk_lo, *, leaf_type, ppm, n, B,
                span):
    nblocks = xh.shape[0] // KB
    SUB = KB // 128
    # 2-D [rows, 128] views (row-major reshape: free relayout)
    xh2 = xh.reshape(-1, 128)
    xl2 = xl.reshape(-1, 128)
    y2 = yfix.reshape(-1, 128)
    t2 = t.reshape(-1, 128)
    with jax.enable_x64(False):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblocks,),
            in_specs=[pl.BlockSpec((SUB, 128), lambda g, b: (g, 0),
                                   memory_space=pltpu.VMEM)] * 4 +
                     [pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=(pl.BlockSpec((SUB, 128), lambda g, b: (g, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((1, 1), lambda g, b: (0, 0),
                                    memory_space=pltpu.SMEM)),
            scratch_shapes=[
                pltpu.VMEM((min(span, B), 128), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ])
        kern = functools.partial(_sweep_kernel, leaf_type=leaf_type,
                                 ppm=ppm, n=n, B=B, span=span)
        err2, ovf = pl.pallas_call(
            kern,
            out_shape=(
                jax.ShapeDtypeStruct((nblocks * SUB, 128), jnp.int32),
                jax.ShapeDtypeStruct((1, 1), jnp.int32)),
            grid_spec=grid_spec, interpret=use_interpret(),
        )(blk_lo, xh2, xl2, y2, t2, w_pad)
    return err2.reshape(-1), ovf


def pad_param_table(w: jax.Array) -> jax.Array:
    """[B, ppm] f64 -> [B, 128] f32 (hi cols 0..ppm, lo cols ppm..2ppm)."""
    wh, wl = df64.from_f64(w)
    B, ppm = w.shape
    pad = jnp.zeros((B, 128 - 2 * ppm), jnp.float32)
    return jnp.concatenate([wh, wl, pad], axis=1)


def block_leaf_bounds(t: jax.Array):
    """(blk_lo [nblocks] i32, max span) for KB-sized blocks of t."""
    n = t.shape[0]
    nblocks = -(-n // KB)
    pad = nblocks * KB - n
    tp = jnp.concatenate([t, jnp.full((pad,), t[-1], t.dtype)]) if pad else t
    firsts = tp[::KB].astype(jnp.int32)
    lasts = tp[KB - 1::KB].astype(jnp.int32)
    return firsts, jnp.max(lasts - firsts + 1)


def sweep_errors(xn, yfix, t, w_pad, blk_lo, *, leaf_type: str, n: int,
                 B: int, ppm: int, span: int):
    """Per-key sweep errors via the Pallas kernel.

    ``xn`` f64 normalized keys; ``w_pad`` from pad_param_table; ``span``
    is the static DMA window in leaf rows.  Returns (err [n] i32,
    overflow scalar i32): a nonzero overflow means some block's leaf
    span exceeded the window and the ERRORS ARE INVALID — the caller
    must retry with a wider span or the XLA sweep.
    """
    xh, xl = df64.from_f64(xn)
    nfull = xh.shape[0]
    pad = (-nfull) % KB
    if pad:
        xh = jnp.concatenate([xh, jnp.broadcast_to(xh[-1:], (pad,))])
        xl = jnp.concatenate([xl, jnp.broadcast_to(xl[-1:], (pad,))])
        yfix = jnp.concatenate([yfix, jnp.broadcast_to(yfix[-1:], (pad,))])
        t = jnp.concatenate([t, jnp.broadcast_to(t[-1:], (pad,))])
    err, ovf = _sweep_call(xh, xl, yfix.astype(jnp.int32),
                           t.astype(jnp.int32), w_pad, blk_lo,
                           leaf_type=leaf_type, ppm=ppm, n=n, B=B,
                           span=span)
    return err[:nfull], ovf[0, 0]
