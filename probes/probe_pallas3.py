"""Probe round 3: x64-promotion workarounds + DMA traceback.

  C6. take_along_axis under jax.experimental.disable_x64 tracing
  C7. one-hot matmul with precision=HIGHEST
  D4. pipelined random-row DMA — full traceback on failure
"""

import time
import sys
import traceback

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def test(name, tb=False):
    def deco(fn):
        def run():
            try:
                fn()
                log(f"[OK]   {name}")
            except Exception as e:
                log(f"[FAIL] {name}: {type(e).__name__}: {str(e)[:200]}")
                if tb:
                    log(traceback.format_exc()[-3000:])
        return run
    return deco


@test("C6 take_along_axis under disable_x64")
def t_c6():
    m, T, L = 8192, 2048, 16

    def k(tbl_ref, idx_ref, o_ref):
        idx2 = jnp.broadcast_to(idx_ref[:][:, None], (m, L))
        o_ref[:] = jnp.take_along_axis(tbl_ref[:], idx2, axis=0)

    tbl = jnp.arange(T * L, dtype=jnp.float32).reshape(T, L)
    idx = jnp.asarray(np.random.default_rng(1).integers(
        0, T, (m,), dtype=np.int32))

    def call(t, i):
        with jax.enable_x64(False):
            return pl.pallas_call(
                k, out_shape=jax.ShapeDtypeStruct((m, L), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(t, i)

    fn = jax.jit(call)
    out = fn(tbl, idx)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(tbl)[idx])
    t0 = time.time()
    for _ in range(50):
        out = fn(tbl, idx)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / 50
    log(f"     {dt*1e6:8.1f} us per call  {dt/m*1e9:6.2f} ns/row")


@test("C7 one-hot matmul HIGHEST precision")
def t_c7():
    m, T, L = 1024, 128, 16

    def k(tbl_ref, idx_ref, o_ref):
        onehot = (idx_ref[:][:, None] ==
                  jax.lax.broadcasted_iota(jnp.int32, (m, T), 1)
                  ).astype(jnp.float32)
        o_ref[:] = jax.lax.dot_general(
            onehot, tbl_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    tbl = (jnp.arange(T * L, dtype=jnp.float32).reshape(T, L)
           * jnp.float32(1.7)) + jnp.float32(0.1)
    idx = jnp.asarray(np.random.default_rng(1).integers(0, T, (m,),
                                                        dtype=np.int32))
    with jax.enable_x64(False):
        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((m, L), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(tbl, idx)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(tbl)[idx])


def _dma_rate(width, iters=4096, slots=16):
    nrows = 1 << 17

    def kern(hbm_ref, o_ref):
        def body(scratch, sems):
            def get(i, slot):
                row = jax.lax.rem(i * jnp.int32(7919), jnp.int32(nrows))
                return pltpu.make_async_copy(
                    hbm_ref.at[pl.ds(row, 1), :],
                    scratch.at[pl.ds(slot, 1), :],
                    sems.at[slot])

            for i in range(slots):
                get(jnp.int32(i), jnp.int32(i)).start()

            def loop(i, acc):
                slot = jax.lax.rem(i, jnp.int32(slots))
                get(i, slot).wait()
                v = scratch[slot, 0]

                @pl.when(i + slots < iters)
                def _():
                    get(i + jnp.int32(slots), slot).start()
                return acc + v

            acc = jax.lax.fori_loop(jnp.int32(0), jnp.int32(iters), loop,
                                    jnp.float32(0.0))
            o_ref[0, 0] = acc

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((slots, width), jnp.float32),
            sems=pltpu.SemaphoreType.DMA((slots,)))

    x = jnp.ones((nrows, width), jnp.float32)

    def call(x):
        with jax.enable_x64(False):
            return pl.pallas_call(
                kern, out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
                compiler_params=pltpu.CompilerParams(
                    has_side_effects=True))(x)

    fn = jax.jit(call)
    r = fn(x)
    _ = float(r[0, 0])
    t0 = time.time()
    reps = 5
    for _i in range(reps):
        r = fn(x)
    _ = float(r[0, 0])
    dt = (time.time() - t0) / reps
    return dt / iters * 1e9


@test("D4 pipelined random-row DMA (traceback)", tb=True)
def t_d4():
    for width in (128, 512, 2048):
        ns = _dma_rate(width)
        log(f"     width={width:5d}: {ns:7.1f} ns/row  "
            f"{1e3/ns:6.1f} M rows/s  {width*4/ns:6.1f} GB/s")


@test("D5 DMA rate vs slots (width=128)")
def t_d5():
    for slots in (2, 8, 32):
        ns = _dma_rate(128, slots=slots)
        log(f"     slots={slots:3d}: {ns:7.1f} ns/row  "
            f"{1e3/ns:6.1f} M rows/s")


@test("C8 take_along_axis per-lane varying idx")
def t_c8():
    m, T = 512, 256

    def k(tbl_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(tbl_ref[:], idx_ref[:], axis=0)

    tbl = jnp.asarray(
        np.random.default_rng(0).normal(size=(T, 128)).astype(np.float32))
    idx = jnp.asarray(np.random.default_rng(1).integers(
        0, T, (m, 128), dtype=np.int32))

    def call(t, i):
        with jax.enable_x64(False):
            return pl.pallas_call(
                k, out_shape=jax.ShapeDtypeStruct((m, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(t, i)

    out = jax.jit(call)(tbl, idx)
    exp = np.take_along_axis(np.asarray(tbl), np.asarray(idx), axis=0)
    np.testing.assert_array_equal(np.asarray(out), exp)


if __name__ == "__main__":
    log(f"device: {jax.devices()[0]}")
    for t in (t_c6, t_c7, t_c8, t_d4, t_d5):
        t()
