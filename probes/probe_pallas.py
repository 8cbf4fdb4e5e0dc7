"""Probe: Pallas/Mosaic feature support + perf on the tunneled TPU.

Each sub-test is independent (try/except) so one unsupported feature
doesn't mask the rest.  Feeds the PLAN.md item-1/2 kernel designs:

  A. minimal kernel compiles + runs
  B. 64-bit integer compares inside a kernel (keys are u64) — native
     i64/u64, or do we need u32-pair lexicographic compares?
  C. vector gather from a VMEM-resident table (per-query leaf-param
     fetch): tbl[idx_vector] lowering
  D. async-DMA random-row fetch rate from HBM (the last-mile key row),
     pipelined N-deep
  E. scalar reads from an SMEM-resident index block (drives D's
     addresses in the real kernel)
"""

import functools
import time
import sys

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def test(name):
    def deco(fn):
        def run():
            try:
                fn()
                log(f"[OK]   {name}")
            except Exception as e:
                log(f"[FAIL] {name}: {type(e).__name__}: {str(e)[:300]}")
        return run
    return deco


@test("A minimal kernel")
def t_a():
    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2)


@test("B1 native int64 compare")
def t_b1():
    def k(x_ref, q_ref, o_ref):
        o_ref[:] = (x_ref[:] < q_ref[:]).astype(jnp.int32)

    x = jnp.arange(8 * 128, dtype=jnp.int64).reshape(8, 128) << 40
    q = jnp.full((8, 128), (500 << 40), dtype=jnp.int64)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x, q)
    exp = (np.asarray(x) < np.asarray(q)).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(out), exp)


@test("B2 native uint64 compare")
def t_b2():
    def k(x_ref, q_ref, o_ref):
        o_ref[:] = (x_ref[:] < q_ref[:]).astype(jnp.int32)

    x = (jnp.arange(8 * 128, dtype=jnp.uint64).reshape(8, 128)
         << jnp.uint64(40)) + jnp.uint64(2**63)
    q = jnp.full((8, 128), 2**63 + (500 << 40), dtype=jnp.uint64)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x, q)
    exp = (np.asarray(x) < np.asarray(q)).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(out), exp)


@test("B3 u32-pair lexicographic compare")
def t_b3():
    def k(hi_ref, lo_ref, qh_ref, ql_ref, o_ref):
        lt = ((hi_ref[:] < qh_ref[:]) |
              ((hi_ref[:] == qh_ref[:]) & (lo_ref[:] < ql_ref[:])))
        o_ref[:] = lt.astype(jnp.int32)

    rng = np.random.default_rng(0)
    x = rng.integers(0, 2**64, (8, 128), dtype=np.uint64)
    q = rng.integers(0, 2**64, (8, 128), dtype=np.uint64)
    hi = jnp.asarray((x >> 32).astype(np.uint32))
    lo = jnp.asarray((x & 0xFFFFFFFF).astype(np.uint32))
    qh = jnp.asarray((q >> 32).astype(np.uint32))
    ql = jnp.asarray((q & 0xFFFFFFFF).astype(np.uint32))
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(hi, lo, qh, ql)
    np.testing.assert_array_equal(np.asarray(out), (x < q).astype(np.int32))


@test("C1 VMEM vector gather tbl[idx] (2D rows)")
def t_c1():
    def k(tbl_ref, idx_ref, o_ref):
        o_ref[:] = tbl_ref[idx_ref[:], :]

    tbl = jnp.arange(512 * 128, dtype=jnp.float32).reshape(512, 128)
    idx = jnp.asarray(np.random.default_rng(1).integers(0, 512, (256,),
                                                        dtype=np.int32))
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(tbl, idx)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(tbl)[idx])


@test("C2 VMEM vector gather jnp.take 1-D")
def t_c2():
    def k(tbl_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take(tbl_ref[:], idx_ref[:], axis=0)

    tbl = jnp.arange(4096, dtype=jnp.float32)
    idx = jnp.asarray(np.random.default_rng(1).integers(0, 4096, (1024,),
                                                        dtype=np.int32))
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((1024,), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(tbl, idx)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(tbl)[idx])


@test("C3 VMEM take_along_axis lanes")
def t_c3():
    def k(tbl_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(tbl_ref[:], idx_ref[:], axis=1)

    tbl = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    idx = jnp.asarray(np.random.default_rng(1).integers(0, 128, (8, 128),
                                                        dtype=np.int32))
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(tbl, idx)
    exp = np.take_along_axis(np.asarray(tbl), np.asarray(idx), axis=1)
    np.testing.assert_array_equal(np.asarray(out), exp)


def _dma_rate(width, iters=4096, slots=16):
    """Pipelined random-row DMA HBM->VMEM; returns ns/row."""
    nrows = 1 << 17

    def k(hbm_ref, o_ref):
        def body(scratch, sems):
            def get(i, slot):
                row = (i * 7919) % nrows      # pseudo-random walk
                return pltpu.make_async_copy(
                    hbm_ref.at[pl.ds(row, 1), :],
                    scratch.at[pl.ds(slot, 1), :],
                    sems.at[slot])

            for i in range(min(slots, iters)):
                get(i, i % slots).start()

            def loop(i, acc):
                slot = i % slots
                get(i, slot).wait()
                v = scratch[slot, 0]

                @pl.when(i + slots < iters)
                def _():
                    get(i + slots, slot).start()
                return acc + v

            acc = jax.lax.fori_loop(0, iters, loop, jnp.float32(0.0))
            o_ref[0, 0] = acc

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((slots, width), jnp.float32),
            sems=pltpu.SemaphoreType.DMA((slots,)))

    x = jnp.ones((nrows, width), jnp.float32)

    fn = jax.jit(lambda x: pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        compiler_params=pltpu.CompilerParams(has_side_effects=True))(x))
    r = fn(x)
    _ = float(r[0, 0])
    t0 = time.time()
    reps = 5
    for _i in range(reps):
        r = fn(x)
    _ = float(r[0, 0])
    dt = (time.time() - t0) / reps
    return dt / iters * 1e9


@test("D pipelined random-row DMA rate")
def t_d():
    for width in (128, 256, 512, 1024, 2048):
        ns = _dma_rate(width)
        log(f"     width={width:5d}: {ns:7.1f} ns/row  "
            f"{1e3/ns:6.1f} M rows/s  {width*4/ns:6.1f} GB/s")


@test("E SMEM scalar-driven DMA addressing")
def t_e():
    nrows, width, nq = 4096, 128, 256

    def k(idx_smem, hbm_ref, o_ref):
        def body(scratch, sems):
            def get(i, slot):
                row = idx_smem[i]
                return pltpu.make_async_copy(
                    hbm_ref.at[pl.ds(row, 1), :],
                    scratch.at[pl.ds(slot, 1), :],
                    sems.at[slot])

            get(0, 0).start()
            get(1, 1).start()

            def loop(i, _):
                slot = i % 2
                get(i, slot).wait()

                @pl.when(i + 2 < nq)
                def _():
                    get(i + 2, slot).start()
                o_ref[i, :] = scratch[slot, :]
                return 0

            jax.lax.fori_loop(0, nq, loop, 0)

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((2, width), jnp.float32),
            sems=pltpu.SemaphoreType.DMA((2,)))

    x = (jnp.arange(nrows, dtype=jnp.float32)[:, None]
         * jnp.ones((1, width), jnp.float32))
    idx = jnp.asarray(np.random.default_rng(3).integers(
        0, nrows, (nq,), dtype=np.int32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((nq, width), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True))(idx, x)
    exp = np.asarray(x)[np.asarray(idx)]
    np.testing.assert_array_equal(np.asarray(out), exp)


if __name__ == "__main__":
    log(f"device: {jax.devices()[0]}")
    for t in (t_a, t_b1, t_b2, t_b3, t_c1, t_c2, t_c3, t_d, t_e):
        t()
