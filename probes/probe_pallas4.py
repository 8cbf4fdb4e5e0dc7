"""Probe round 4: the sweep kernel's exact shape plan.

  G1. 1-D [KB] f32/i32 VMEM blocks: load, broadcast to [KB, R] one-hot,
      matmul HIGHEST against [R, 8] table, df64 eval, 1-D i32 out
  G2. grid version of G1 with scalar-prefetch blk_lo + per-block DMA
      of the table slice from HBM (the real kernel structure)
  G3. in-kernel reshape (32, 128) -> (4096, 1) feasibility (fallback)
"""

import sys
import time
import traceback

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def test(name, tb=True):
    def deco(fn):
        def run():
            try:
                fn()
                log(f"[OK]   {name}")
            except Exception as e:
                log(f"[FAIL] {name}: {type(e).__name__}: {str(e)[:200]}")
                if tb:
                    log(traceback.format_exc()[-1500:])
        return run
    return deco


KB, R, C = 1024, 128, 8


@test("G1 1-D blocks + one-hot select + df64")
def t_g1():
    def k(x_ref, tl_ref, tbl_ref, o_ref):
        tl = tl_ref[:]
        onehot = (tl[:, None] ==
                  jax.lax.broadcasted_iota(jnp.int32, (KB, R), 1)
                  ).astype(jnp.float32)
        sel = jax.lax.dot_general(
            onehot, tbl_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        pred = sel[:, 1] * x_ref[:] + sel[:, 0]
        o_ref[:] = pred.astype(jnp.int32)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (KB,)).astype(np.float32))
    tl = jnp.asarray(np.sort(rng.integers(0, R, (KB,), dtype=np.int32)))
    tbl = jnp.asarray(rng.normal(size=(R, C)).astype(np.float32) * 100)

    def call(x, tl, tbl):
        with jax.enable_x64(False):
            return pl.pallas_call(
                k, out_shape=jax.ShapeDtypeStruct((KB,), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x, tl, tbl)

    out = jax.jit(call)(x, tl, tbl)
    sel = np.asarray(tbl)[np.asarray(tl)]
    exp = (sel[:, 1] * np.asarray(x) + sel[:, 0]).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(out), exp)


@test("G2 grid + scalar prefetch + table DMA")
def t_g2():
    nblocks, B = 8, 64

    def k(blk_lo_ref, x_ref, tl_ref, w_ref, o_ref, wloc_ref, sem):
        g = pl.program_id(0)
        lo = blk_lo_ref[g]
        lo = jnp.minimum(lo, jnp.int32(B - R)) if B > R else lo * 0
        rows = min(R, B)
        cp = pltpu.make_async_copy(
            w_ref.at[pl.ds(lo, rows), :], wloc_ref, sem)
        cp.start()
        cp.wait()
        tl = jnp.clip(tl_ref[:] - lo, 0, rows - 1)
        onehot = (tl[:, None] ==
                  jax.lax.broadcasted_iota(jnp.int32, (KB, rows), 1)
                  ).astype(jnp.float32)
        sel = jax.lax.dot_general(
            onehot, wloc_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        o_ref[:] = (sel[:, 1] * x_ref[:] + sel[:, 0]).astype(jnp.int32)

    rng = np.random.default_rng(1)
    n = nblocks * KB
    x = jnp.asarray(rng.uniform(0, 1, (n,)).astype(np.float32))
    t_global = jnp.asarray(np.sort(rng.integers(0, B, (n,),
                                                dtype=np.int32)))
    w8 = rng.normal(size=(B, C)).astype(np.float32) * 100
    w = jnp.asarray(np.concatenate(
        [w8, np.zeros((B, 128 - C), np.float32)], axis=1))
    blk_lo = t_global[::KB].astype(jnp.int32)

    def call(x, tl, w, blk_lo):
        with jax.enable_x64(False):
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(nblocks,),
                in_specs=[
                    pl.BlockSpec((KB,), lambda g, b: (g,),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((KB,), lambda g, b: (g,),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec((KB,), lambda g, b: (g,),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((min(R, B), 128), jnp.float32),
                    pltpu.SemaphoreType.DMA,
                ])
            return pl.pallas_call(
                k, out_shape=jax.ShapeDtypeStruct((n,), jnp.int32),
                grid_spec=grid_spec)(blk_lo, x, tl, w)

    out = jax.jit(call)(x, t_global, w, blk_lo)
    lo_np = np.minimum(np.asarray(blk_lo), B - min(R, B)) \
        if B > R else np.zeros(nblocks, np.int32)
    tl_np = np.asarray(t_global).reshape(nblocks, KB)
    sel_rows = np.clip(tl_np - lo_np[:, None], 0,
                       min(R, B) - 1) + lo_np[:, None]
    sel = w8[sel_rows.reshape(-1)]
    exp = (sel[:, 1] * np.asarray(x) + sel[:, 0]).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(out), exp)


@test("G2b G2 timing at scale (n=8M, B=64k)")
def t_g2b():
    pass  # placeholder; timed separately once G2 passes


@test("G3 in-kernel reshape (8,128)->(1024,1)")
def t_g3():
    def k(x_ref, o_ref):
        v = x_ref[:].reshape(KB, 1)
        o_ref[:] = (v * 2.0).reshape(8, 128)

    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x) * 2)


if __name__ == "__main__":
    log(f"device: {jax.devices()[0]}")
    for t in (t_g1, t_g2, t_g3):
        t()


def t_g4(n=16_000_000, B=262144, KB4=4096, R4=256):
    """Timing at scale: linear-leaf sweep shape, ns/key."""
    def k(blk_lo_ref, xh_ref, xl_ref, y_ref, tl_ref, w_ref, o_ref,
          wloc_ref, sem):
        g = pl.program_id(0)
        lo = jnp.minimum(blk_lo_ref[g], jnp.int32(B - R4))
        cp = pltpu.make_async_copy(
            w_ref.at[pl.ds(lo, R4), :], wloc_ref, sem)
        cp.start()
        cp.wait()
        tl = jnp.clip(tl_ref[:] - lo, 0, R4 - 1)
        onehot = (tl[:, None] ==
                  jax.lax.broadcasted_iota(jnp.int32, (KB4, R4), 1)
                  ).astype(jnp.float32)
        sel = jax.lax.dot_general(
            onehot, wloc_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        # df64 linear eval + floor-to-int (per ops/df64.py)
        ah, al = sel[:, 0], sel[:, 2]
        bh, bl = sel[:, 1], sel[:, 3]
        xh, xl = xh_ref[:], xl_ref[:]
        ph = bh * xh
        c = bh * jnp.float32(4097.0)
        hi = c - (c - bh)
        lo2 = bh - hi
        c2 = xh * jnp.float32(4097.0)
        xhi = c2 - (c2 - xh)
        xlo = xh - xhi
        e = ((hi * xhi - ph) + hi * xlo + lo2 * xhi) + lo2 * xlo
        e = e + (bh * xl + bl * xh)
        s = ph + ah
        bb = s - ph
        e2 = (ph - (s - bb)) + (ah - bb)
        tot_h = s
        tot_l = e + e2 + al
        fh = jnp.floor(tot_h)
        frac = tot_h - fh
        f2 = jnp.floor(frac + tot_l)
        pred = fh.astype(jnp.int32) + f2.astype(jnp.int32)
        pred = jnp.clip(pred, 0, n)
        o_ref[:] = jnp.abs(pred - jnp.minimum(y_ref[:], jnp.int32(n)))

    rng = np.random.default_rng(7)
    nblocks = n // KB4
    xh = jnp.asarray(rng.uniform(0, 1, (n,)).astype(np.float32))
    xl = jnp.asarray((rng.uniform(0, 1, (n,)) * 1e-8).astype(np.float32))
    y = jnp.arange(n, dtype=jnp.int32)
    t_glob = jnp.minimum((y // (n // B)).astype(jnp.int32), B - 1)
    w = jnp.asarray(rng.normal(size=(B, 128)).astype(np.float32))
    blk_lo = t_glob[::KB4].astype(jnp.int32)

    def call(xh, xl, y, t, w, blk_lo):
        with jax.enable_x64(False):
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(nblocks,),
                in_specs=[pl.BlockSpec((KB4,), lambda g, b: (g,),
                                       memory_space=pltpu.VMEM)] * 4 +
                         [pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec((KB4,), lambda g, b: (g,),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((R4, 128), jnp.float32),
                    pltpu.SemaphoreType.DMA,
                ])
            return pl.pallas_call(
                k, out_shape=jax.ShapeDtypeStruct((n,), jnp.int32),
                grid_spec=grid_spec)(blk_lo, xh, xl, y, t, w)

    fn = jax.jit(call)
    out = fn(xh, xl, y, t_glob, w, blk_lo)
    _ = int(jnp.max(out))
    perturb = jax.jit(lambda y0, o: y0 + (o[:1] & 1))
    yv = y
    t0 = time.time()
    for _ in range(3):
        out = fn(xh, xl, yv, t_glob, w, blk_lo)
        yv = perturb(y, out)
    _ = int(jnp.max(out))
    dt = (time.time() - t0) / 3
    log(f"G4 sweep kernel: {dt*1e3:.1f} ms for {n} keys = "
        f"{dt/n*1e9:.2f} ns/key")


def t_g5(n=16_000_000, KB4=2048, mode="copy"):
    """Pipeline-overhead baseline: stream 4 f32/i32 1-D arrays through
    the same grid and write |y| out, no matmul/df64."""
    def k(blk_lo_ref, xh_ref, xl_ref, y_ref, tl_ref, o_ref):
        if mode == "copy":
            o_ref[:] = jnp.abs(y_ref[:])
        else:
            o_ref[:] = (jnp.abs(y_ref[:]) + tl_ref[:]
                        + xh_ref[:].astype(jnp.int32)
                        + xl_ref[:].astype(jnp.int32))

    rng = np.random.default_rng(7)
    nblocks = n // KB4
    xh = jnp.asarray(rng.uniform(0, 1, (n,)).astype(np.float32))
    xl = jnp.asarray((rng.uniform(0, 1, (n,)) * 1e-8).astype(np.float32))
    y = jnp.arange(n, dtype=jnp.int32)
    t_glob = (y // 61).astype(jnp.int32)
    blk_lo = t_glob[::KB4].astype(jnp.int32)

    def call(xh, xl, y, t, blk_lo):
        with jax.enable_x64(False):
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(nblocks,),
                in_specs=[pl.BlockSpec((KB4,), lambda g, b: (g,),
                                       memory_space=pltpu.VMEM)] * 4,
                out_specs=pl.BlockSpec((KB4,), lambda g, b: (g,),
                                       memory_space=pltpu.VMEM))
            return pl.pallas_call(
                k, out_shape=jax.ShapeDtypeStruct((n,), jnp.int32),
                grid_spec=grid_spec)(blk_lo, xh, xl, y, t_glob)

    fn = jax.jit(call)
    out = fn(xh, xl, y, t_glob, blk_lo)
    _ = int(jnp.max(out))
    t0 = time.time()
    for _ in range(3):
        out = fn(xh, xl, y, t_glob, blk_lo)
        _ = int(jnp.max(out))
    dt = (time.time() - t0) / 3
    log(f"G5[{mode},KB={KB4}]: {dt*1e3:.1f} ms = {dt/n*1e9:.2f} ns/key")


def t_g6(n=16_000_000, B=262144, KB4=2048, R4=64, mode="full"):
    """Bisect G4's 13ns/key: mode in {nodma, nodot, dotonly, default_prec,
    full}."""
    def k(blk_lo_ref, xh_ref, xl_ref, y_ref, tl_ref, w_ref, o_ref,
          wloc_ref, sem):
        g = pl.program_id(0)
        lo = jnp.minimum(blk_lo_ref[g], jnp.int32(B - R4))
        if mode != "nodma":
            cp = pltpu.make_async_copy(
                w_ref.at[pl.ds(lo, R4), :], wloc_ref, sem)
            cp.start()
            cp.wait()
        tl = jnp.clip(tl_ref[:] - lo, 0, R4 - 1)
        if mode in ("nodot", "nodma"):
            sel = jnp.broadcast_to(wloc_ref[0:1, :], (KB4, 128))
        else:
            onehot = (tl[:, None] ==
                      jax.lax.broadcasted_iota(jnp.int32, (KB4, R4), 1)
                      ).astype(jnp.float32)
            prec = (jax.lax.Precision.DEFAULT if mode == "default_prec"
                    else jax.lax.Precision.HIGHEST)
            sel = jax.lax.dot_general(
                onehot, wloc_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
        if mode == "dotonly":
            o_ref[:] = sel[:, 0].astype(jnp.int32)
            return
        ah, al = sel[:, 0], sel[:, 2]
        bh, bl = sel[:, 1], sel[:, 3]
        xh, xl = xh_ref[:], xl_ref[:]
        ph = bh * xh
        c = bh * jnp.float32(4097.0)
        hi = c - (c - bh)
        lo2 = bh - hi
        c2 = xh * jnp.float32(4097.0)
        xhi = c2 - (c2 - xh)
        xlo = xh - xhi
        e = ((hi * xhi - ph) + hi * xlo + lo2 * xhi) + lo2 * xlo
        e = e + (bh * xl + bl * xh)
        s = ph + ah
        bb = s - ph
        e2 = (ph - (s - bb)) + (ah - bb)
        fh = jnp.floor(s)
        frac = s - fh
        f2 = jnp.floor(frac + e + e2 + al)
        pred = jnp.clip(fh.astype(jnp.int32) + f2.astype(jnp.int32), 0, n)
        o_ref[:] = jnp.abs(pred - jnp.minimum(y_ref[:], jnp.int32(n)))

    rng = np.random.default_rng(7)
    nblocks = n // KB4
    xh = jnp.asarray(rng.uniform(0, 1, (n,)).astype(np.float32))
    xl = jnp.asarray((rng.uniform(0, 1, (n,)) * 1e-8).astype(np.float32))
    y = jnp.arange(n, dtype=jnp.int32)
    t_glob = jnp.minimum((y // (n // B)).astype(jnp.int32), B - 1)
    w = jnp.asarray(rng.normal(size=(B, 128)).astype(np.float32))
    blk_lo = t_glob[::KB4].astype(jnp.int32)

    def call(xh, xl, y, t, w, blk_lo):
        with jax.enable_x64(False):
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(nblocks,),
                in_specs=[pl.BlockSpec((KB4,), lambda g, b: (g,),
                                       memory_space=pltpu.VMEM)] * 4 +
                         [pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec((KB4,), lambda g, b: (g,),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((R4, 128), jnp.float32),
                    pltpu.SemaphoreType.DMA,
                ])
            return pl.pallas_call(
                k, out_shape=jax.ShapeDtypeStruct((n,), jnp.int32),
                grid_spec=grid_spec)(blk_lo, xh, xl, y, t, w)

    fn = jax.jit(call)
    out = fn(xh, xl, y, t_glob, w, blk_lo)
    _ = int(jnp.max(out))
    t0 = time.time()
    for _ in range(3):
        out = fn(xh, xl, y, t_glob, w, blk_lo)
        _ = int(jnp.max(out))
    dt = (time.time() - t0) / 3
    log(f"G6[{mode},KB={KB4},R={R4}]: {dt*1e3:.1f} ms = "
        f"{dt/n*1e9:.2f} ns/key")
