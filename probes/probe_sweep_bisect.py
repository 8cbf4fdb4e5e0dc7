"""Bisect the 2-D sweep kernel's ~5ns/key at 25M: DMA vs one-hot dot
vs df64 eval vs streaming, and the KB (block size) effect."""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from rmi_tpu.ops import df64  # noqa: E402
from rmi_tpu.ops.sweep_kernel import leaf_eval_df64  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_variant(name, mode, KB=2048, span=64, n=25_001_984, B=262144,
                ppm=2):
    SUB = KB // 128

    def kern(blk_lo_ref, xh_ref, xl_ref, y_ref, t_ref, w_ref, err_ref,
             ovf_ref, wloc_ref, sem):
        g = pl.program_id(0)
        rows = span
        lo = jnp.minimum(blk_lo_ref[g], jnp.int32(B - rows))
        if mode != "nodma":
            cp = pltpu.make_async_copy(w_ref.at[pl.ds(lo, rows), :],
                                       wloc_ref, sem)
            cp.start()
            cp.wait()
        ovf_ref[0, 0] = jnp.int32(0)
        tl = jnp.clip(t_ref[:] - lo, 0, rows - 1)
        if mode in ("nodot", "nodma"):
            v = wloc_ref[0, 0]
            sel = jnp.full((SUB, 128, 2 * ppm), v, jnp.float32)
        elif mode == "tlead":
            onehotT = (jax.lax.broadcasted_iota(
                jnp.int32, (rows, SUB, 128), 0) == tl[None, :, :]
                ).astype(jnp.float32)
            wn = wloc_ref[:][:, :2 * ppm]
            wnT = jnp.transpose(wn, (1, 0))           # [2ppm, R]
            selT = jax.lax.dot_general(
                wnT, onehotT,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)  # [2ppm, SUB, 128]

            def cols(j):
                return selT[j], selT[ppm + j]

            ph, plo = leaf_eval_df64("linear", cols, xh_ref[:], xl_ref[:])
            pred = df64.floor_to_i32(ph, plo, 0, n)
            err_ref[:] = jnp.abs(pred - jnp.minimum(y_ref[:],
                                                    jnp.int32(n)))
            return
        elif mode == "percol":
            onehot = (tl[:, :, None] == jax.lax.broadcasted_iota(
                jnp.int32, (SUB, 128, rows), 2)).astype(jnp.float32)
            w_all = wloc_ref[:]
            cols2d = []
            for j in range(2 * ppm):
                cj = jax.lax.dot_general(
                    onehot, w_all[:, j:j + 1],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                cols2d.append(cj[:, :, 0])

            def cols(j):
                return cols2d[j], cols2d[ppm + j]

            ph, plo = leaf_eval_df64("linear", cols, xh_ref[:], xl_ref[:])
            pred = df64.floor_to_i32(ph, plo, 0, n)
            err_ref[:] = jnp.abs(pred - jnp.minimum(y_ref[:],
                                                    jnp.int32(n)))
            return
        else:
            onehot = (tl[:, :, None] == jax.lax.broadcasted_iota(
                jnp.int32, (SUB, 128, rows), 2)).astype(jnp.float32)
            wn = wloc_ref[:][:, :2 * ppm]
            sel = jax.lax.dot_general(
                onehot, wn, dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        if mode == "dotonly":
            err_ref[:] = sel[:, :, 0].astype(jnp.int32)
            return

        def cols(j):
            return sel[:, :, j], sel[:, :, ppm + j]

        ph, plo = leaf_eval_df64("linear", cols, xh_ref[:], xl_ref[:])
        pred = df64.floor_to_i32(ph, plo, 0, n)
        err_ref[:] = jnp.abs(pred - jnp.minimum(y_ref[:], jnp.int32(n)))

    @jax.jit
    def call(xh, xl, y, t, w, blk_lo):
        nblocks = n // KB
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
                    pltpu.VMEM((span, 128), jnp.float32),
                    pltpu.SemaphoreType.DMA,
                ])
            return pl.pallas_call(
                kern,
                out_shape=(
                    jax.ShapeDtypeStruct((n // 128, 128), jnp.int32),
                    jax.ShapeDtypeStruct((1, 1), jnp.int32)),
                grid_spec=grid_spec)(blk_lo, xh, xl, y, t, w)

    rng = np.random.default_rng(1)
    rows2 = n // 128
    xh = jnp.asarray(rng.uniform(0, 1, (rows2, 128)).astype(np.float32))
    xl = jnp.zeros((rows2, 128), jnp.float32)
    y = jnp.arange(n, dtype=jnp.int32).reshape(rows2, 128)
    t = jnp.minimum(jnp.arange(n, dtype=jnp.int32) // (n // B),
                    B - 1).reshape(rows2, 128)
    w = jnp.asarray(rng.normal(size=(B, 128)).astype(np.float32))
    blk_lo = t.reshape(-1)[::KB].astype(jnp.int32)

    out = call(xh, xl, y, t, w, blk_lo)
    _ = int(jnp.max(out[0][:1, :1]))
    t0 = time.time()
    for _i in range(3):
        out = call(xh, xl, y, t, w, blk_lo)
        _ = int(jnp.max(out[0][:1, :1]))
    dt = (time.time() - t0) / 3
    log(f"{name:32s}: {dt*1e3:8.1f} ms = {dt/n*1e9:5.2f} ns/key")


if __name__ == "__main__":
    run_variant("tlead KB=2048", "tlead")
