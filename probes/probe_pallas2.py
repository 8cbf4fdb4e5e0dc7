"""Probe round 2: fixes from probe_pallas findings.

Mosaic constraints discovered: no 64-bit types in kernels (remote
compiler crash / verification errors), DMA slice starts must be i32,
plain int indexing unsupported.  Retests:

  C4. take_along_axis axis=0 with [m, 128] broadcast i32 indices
      (the "2D gather" form the error message hints at)
  C5. one-hot matmul row select (guaranteed-available fallback)
  D2. pipelined random-row DMA with strict i32 addressing
  E2. SMEM scalar-driven DMA addressing, i32
  F.  df64 (float-float) arithmetic sanity in-kernel vs numpy f64
"""

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


@test("C4 take_along_axis axis=0 broadcast idx")
def t_c4():
    def k(tbl_ref, idx_ref, o_ref):
        idx2 = jnp.broadcast_to(idx_ref[:][:, None], (256, 128))
        o_ref[:] = jnp.take_along_axis(tbl_ref[:], idx2, axis=0)

    tbl = jnp.arange(512 * 128, dtype=jnp.float32).reshape(512, 128)
    idx = jnp.asarray(np.random.default_rng(1).integers(0, 512, (256,),
                                                        dtype=np.int32))
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(tbl, idx)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(tbl)[idx])


@test("C4b take_along_axis timing 8192x [2048,16]")
def t_c4b():
    m, T, L = 8192, 2048, 16

    def k(tbl_ref, idx_ref, o_ref):
        idx2 = jnp.broadcast_to(idx_ref[:][:, None], (m, L))
        o_ref[:] = jnp.take_along_axis(tbl_ref[:], idx2, axis=0)

    tbl = jnp.arange(T * L, dtype=jnp.float32).reshape(T, L)
    idx = jnp.asarray(np.random.default_rng(1).integers(
        0, T, (m,), dtype=np.int32))
    fn = jax.jit(lambda t, i: pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((m, L), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(t, i))
    out = fn(tbl, idx)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(tbl)[idx])
    t0 = time.time()
    for _ in range(50):
        out = fn(tbl, idx)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / 50
    log(f"     {dt*1e6:8.1f} us per call  {dt/m*1e9:6.2f} ns/row")


@test("C5 one-hot matmul row select")
def t_c5():
    m, T, L = 1024, 128, 16

    def k(tbl_ref, idx_ref, o_ref):
        onehot = (idx_ref[:][:, None] ==
                  jax.lax.broadcasted_iota(jnp.int32, (m, T), 1)
                  ).astype(jnp.float32)
        o_ref[:] = jnp.dot(onehot, tbl_ref[:],
                           preferred_element_type=jnp.float32)

    tbl = (jnp.arange(T * L, dtype=jnp.float32).reshape(T, L)
           * jnp.float32(1.7)) + jnp.float32(0.1)
    idx = jnp.asarray(np.random.default_rng(1).integers(0, T, (m,),
                                                        dtype=np.int32))
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((m, L), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(tbl, idx)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(tbl)[idx])


def _dma_rate(width, iters=4096, slots=16):
    nrows = 1 << 17

    def k(o_ref):
        def body(scratch, sems):
            def get(i, slot):
                row = jax.lax.rem(i * jnp.int32(7919), jnp.int32(nrows))
                return pltpu.make_async_copy(
                    k.hbm_ref.at[pl.ds(row, 1), :],
                    scratch.at[pl.ds(slot, 1), :],
                    sems.at[slot])
            # bound via closure set below
            pass
        pass

    # build kernel with hbm ref as input instead
    def kern(hbm_ref, o_ref):
        def body(scratch, sems):
            def get(i, slot):
                row = jax.lax.rem(i * jnp.int32(7919), jnp.int32(nrows))
                return pltpu.make_async_copy(
                    hbm_ref.at[pl.ds(row, 1), :],
                    scratch.at[pl.ds(slot, 1), :],
                    sems.at[slot])

            for i in range(slots):
                get(jnp.int32(i), i).start()

            def loop(i, acc):
                i = i.astype(jnp.int32)
                slot = jax.lax.rem(i, jnp.int32(slots))
                get(i, slot).wait()
                v = scratch[slot, 0]

                @pl.when(i + slots < iters)
                def _():
                    get(i + jnp.int32(slots), slot).start()
                return acc + v

            acc = jax.lax.fori_loop(0, iters, loop, jnp.float32(0.0))
            o_ref[0, 0] = acc

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((slots, width), jnp.float32),
            sems=pltpu.SemaphoreType.DMA((slots,)))

    x = jnp.ones((nrows, width), jnp.float32)
    fn = jax.jit(lambda x: pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
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


@test("D2 pipelined random-row DMA rate (i32)")
def t_d2():
    for width in (128, 512, 2048):
        ns = _dma_rate(width)
        log(f"     width={width:5d}: {ns:7.1f} ns/row  "
            f"{1e3/ns:6.1f} M rows/s  {width*4/ns:6.1f} GB/s")


@test("D3 DMA rate vs slots (width=128)")
def t_d3():
    for slots in (2, 8, 32):
        ns = _dma_rate(128, slots=slots)
        log(f"     slots={slots:3d}: {ns:7.1f} ns/row  "
            f"{1e3/ns:6.1f} M rows/s")


@test("E2 SMEM scalar-driven DMA addressing (i32)")
def t_e2():
    nrows, width, nq = 4096, 128, 256

    def k(idx_smem, hbm_ref, o_ref):
        def body(scratch, sems):
            def get(i, slot):
                row = idx_smem[i]
                return pltpu.make_async_copy(
                    hbm_ref.at[pl.ds(row, 1), :],
                    scratch.at[pl.ds(slot, 1), :],
                    sems.at[slot])

            get(jnp.int32(0), 0).start()
            get(jnp.int32(1), 1).start()

            def loop(i, _):
                i = i.astype(jnp.int32)
                slot = jax.lax.rem(i, jnp.int32(2))
                get(i, slot).wait()

                @pl.when(i + 2 < nq)
                def _():
                    get(i + jnp.int32(2), slot).start()
                o_ref[pl.ds(i, 1), :] = scratch[pl.ds(slot, 1), :]
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


@test("F df64 arithmetic in-kernel")
def t_f():
    m = 1024

    def two_sum(a, b):
        s = a + b
        bb = s - a
        e = (a - (s - bb)) + (b - bb)
        return s, e

    def split(a):
        c = a * jnp.float32(4097.0)
        hi = c - (c - a)
        lo = a - hi
        return hi, lo

    def two_prod(a, b):
        p = a * b
        ah, al = split(a)
        bh, bl = split(b)
        e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
        return p, e

    def df_mul(xh, xl, yh, yl):
        p, e = two_prod(xh, yh)
        e = e + (xh * yl + xl * yh)
        return two_sum(p, e)

    def df_add(xh, xl, yh, yl):
        s, e = two_sum(xh, yh)
        e = e + (xl + yl)
        return two_sum(s, e)

    def k(bh_ref, bl_ref, xh_ref, xl_ref, ah_ref, al_ref, oh_ref, ol_ref):
        ph, plo = df_mul(bh_ref[:], bl_ref[:], xh_ref[:], xl_ref[:])
        sh, sl = df_add(ph, plo, ah_ref[:], al_ref[:])
        oh_ref[:] = sh
        ol_ref[:] = sl

    rng = np.random.default_rng(5)
    beta = rng.uniform(1e6, 3e8, (8, 128))
    x = rng.uniform(0, 1, (8, 128))
    alpha = rng.uniform(-1e8, 1e8, (8, 128))

    def sp(v):
        h = v.astype(np.float32)
        l = (v - h.astype(np.float64)).astype(np.float32)
        return jnp.asarray(h), jnp.asarray(l)

    bh, bl = sp(beta)
    xh, xl = sp(x)
    ah, al = sp(alpha)
    oh, ol = pl.pallas_call(
        k, out_shape=(jax.ShapeDtypeStruct((8, 128), jnp.float32),
                      jax.ShapeDtypeStruct((8, 128), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)))(
        bh, bl, xh, xl, ah, al)
    got = np.asarray(oh).astype(np.float64) + np.asarray(ol)
    exp = (beta * x + alpha)
    rel = np.max(np.abs(got - exp) / np.maximum(np.abs(exp), 1.0))
    log(f"     max rel err vs f64: {rel:.3e}")
    assert rel < 1e-11, rel


if __name__ == "__main__":
    log(f"device: {jax.devices()[0]}")
    for t in (t_c4, t_c4b, t_c5, t_d2, t_d3, t_e2, t_f):
        t()
