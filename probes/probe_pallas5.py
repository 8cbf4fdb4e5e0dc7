"""Probe round 5: 2-D layouts + fit-kernel building blocks.

G6 showed the df64 eval costs ~4.5ns/key on 1-D [2048] blocks — far
above VPU speed-of-light, suggesting poor lane utilization for 1-D
vectors.  Tests:

  H1. rank-3 one-hot select: onehot[16,128,R] . tbl[R,C] via
      dot_general (keeps everything 128-lane)
  H2. df64 linear eval+floor on 2-D [16,128] blocks — ns/key
  H3. i32 shift/mask limb extraction in-kernel
  H4. block limb accumulation: ones[1,KB] @ limbs[KB,L] exact sums
  H5. one-hot^T count/limb accumulation [R,KB]@[KB,L]
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
                log(f"[FAIL] {name}: {type(e).__name__}: {str(e)[:160]}")
                if tb:
                    log(traceback.format_exc()[-1200:])
        return run
    return deco


def _bench(fn, args, n_items, reps=5):
    out = fn(*args)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        _ = jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    dt = (time.time() - t0) / reps
    return dt / n_items * 1e9


SUB, LANE, R, C = 16, 128, 64, 8
KB2 = SUB * LANE


@test("H1 rank-3 one-hot select")
def t_h1():
    def k(tl_ref, tbl_ref, o_ref):
        oh = (tl_ref[:][:, :, None] ==
              jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE, R), 2)
              ).astype(jnp.float32)
        sel = jax.lax.dot_general(
            oh, tbl_ref[:],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)   # [SUB, LANE, C]
        o_ref[:] = sel[:, :, 0] + sel[:, :, 1]

    rng = np.random.default_rng(0)
    tl = jnp.asarray(rng.integers(0, R, (SUB, LANE), dtype=np.int32))
    tbl = jnp.asarray(rng.normal(size=(R, C)).astype(np.float32))

    def call(tl, tbl):
        with jax.enable_x64(False):
            return pl.pallas_call(
                k, out_shape=jax.ShapeDtypeStruct((SUB, LANE),
                                                  jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(tl, tbl)

    out = jax.jit(call)(tl, tbl)
    sel = np.asarray(tbl)[np.asarray(tl)]
    np.testing.assert_array_equal(np.asarray(out), sel[..., 0] + sel[..., 1])


@test("H2 df64 eval+floor on 2-D blocks (timing)")
def t_h2():
    n = 16_000_000
    rows = n // LANE

    def k(xh_ref, xl_ref, ah_ref, o_ref):
        xh, xl = xh_ref[:], xl_ref[:]
        bh = jnp.float32(1.7e7)
        bl = jnp.float32(0.23)
        ah = ah_ref[:]
        p = bh * xh
        c = bh * jnp.float32(4097.0)
        hi = c - (c - bh)
        lo2 = bh - hi
        c2 = xh * jnp.float32(4097.0)
        xhi = c2 - (c2 - xh)
        xlo = xh - xhi
        e = ((hi * xhi - p) + hi * xlo + lo2 * xhi) + lo2 * xlo
        e = e + (bh * xl + bl * xh)
        s = p + ah
        bb = s - p
        e2 = (p - (s - bb)) + (ah - bb)
        fh = jnp.floor(s)
        frac = s - fh
        f2 = jnp.floor(frac + e + e2)
        o_ref[:] = fh.astype(jnp.int32) + f2.astype(jnp.int32)

    BS = 128  # sublane rows per block

    def call(xh, xl, ah):
        with jax.enable_x64(False):
            grid_spec = pl.GridSpec(
                grid=(rows // BS,),
                in_specs=[pl.BlockSpec((BS, LANE), lambda g: (g, 0),
                                       memory_space=pltpu.VMEM)] * 3,
                out_specs=pl.BlockSpec((BS, LANE), lambda g: (g, 0),
                                       memory_space=pltpu.VMEM))
            return pl.pallas_call(
                k, out_shape=jax.ShapeDtypeStruct((rows, LANE),
                                                  jnp.int32),
                grid_spec=grid_spec)(xh, xl, ah)

    rng = np.random.default_rng(1)
    xh = jnp.asarray(rng.uniform(0, 1, (rows, LANE)).astype(np.float32))
    xl = jnp.asarray((rng.uniform(0, 1, (rows, LANE)) * 1e-8
                      ).astype(np.float32))
    ah = jnp.asarray(rng.uniform(0, 1e6, (rows, LANE)).astype(np.float32))
    ns = _bench(jax.jit(call), (xh, xl, ah), n)
    log(f"     {ns:.2f} ns/key (2-D df64 eval+floor)")


@test("H3 i32 shift/mask limbs in-kernel")
def t_h3():
    def k(y_ref, o_ref):
        y = y_ref[:]
        l0 = y & 255
        l1 = (y >> 8) & 255
        l2 = (y >> 16) & 255
        l3 = (y >> 24) & 255
        o_ref[:] = l0 + l1 * 1000 + l2 * 1000000 + l3 * 100000000

    y = jnp.asarray(np.random.default_rng(2).integers(
        0, 2 ** 31 - 1, (8, 128), dtype=np.int32))
    with jax.enable_x64(False):
        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(y)
    yn = np.asarray(y)
    exp = ((yn & 255) + ((yn >> 8) & 255) * 1000
           + ((yn >> 16) & 255) * 1000000 + ((yn >> 24) & 255) * 100000000)
    np.testing.assert_array_equal(np.asarray(out), exp)


@test("H4 block limb sums: ones @ limbs exact")
def t_h4():
    L = 8

    def k(limb_ref, o_ref):
        ones = jnp.ones((1, KB2), jnp.float32)
        o_ref[:] = jax.lax.dot_general(
            ones, limb_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    rng = np.random.default_rng(3)
    limbs = jnp.asarray(rng.integers(0, 256, (KB2, L)).astype(np.float32))
    with jax.enable_x64(False):
        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((1, L), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(limbs)
    np.testing.assert_array_equal(np.asarray(out)[0],
                                  np.asarray(limbs).sum(0))


@test("H5 one-hot^T limb accumulation [R,KB]@[KB,L]")
def t_h5():
    L = 32

    def k(tl_ref, limb_ref, o_ref):
        oh = (tl_ref[:][:, None] ==
              jax.lax.broadcasted_iota(jnp.int32, (KB2, R), 1)
              ).astype(jnp.float32)
        o_ref[:] = jax.lax.dot_general(
            oh, limb_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # [R, L]

    rng = np.random.default_rng(4)
    tl = jnp.asarray(np.sort(rng.integers(0, R, KB2)).astype(np.int32))
    limbs = jnp.asarray(rng.integers(0, 256, (KB2, L)).astype(np.float32))
    with jax.enable_x64(False):
        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((R, L), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(tl, limbs)
    exp = np.zeros((R, L), np.float32)
    np.add.at(exp, np.asarray(tl), np.asarray(limbs))
    np.testing.assert_array_equal(np.asarray(out), exp)


if __name__ == "__main__":
    log(f"device: {jax.devices()[0]}")
    for t in (t_h1, t_h2, t_h3, t_h4, t_h5):
        t()


@test("H6 double-contraction accumulate [S,L,R]x[S,L,C]->[R,C]")
def t_h6():
    S, LN, R6, C6 = 16, 128, 64, 32

    def k(tl_ref, limb_ref, o_ref):
        oh = (tl_ref[:][:, :, None] ==
              jax.lax.broadcasted_iota(jnp.int32, (S, LN, R6), 2)
              ).astype(jnp.float32)
        o_ref[:] = jax.lax.dot_general(
            oh, limb_ref[:],
            dimension_numbers=(((0, 1), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32)    # [R6, C6]

    rng = np.random.default_rng(6)
    tl = jnp.asarray(np.sort(rng.integers(0, R6, S * LN))
                     .reshape(S, LN).astype(np.int32))
    limbs = jnp.asarray(rng.integers(0, 256, (S, LN, C6))
                        .astype(np.float32))

    def call(tl, limbs):
        with jax.enable_x64(False):
            return pl.pallas_call(
                k, out_shape=jax.ShapeDtypeStruct((R6, C6), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(tl, limbs)

    out = jax.jit(call)(tl, limbs)
    exp = np.zeros((R6, C6), np.float32)
    np.add.at(exp, np.asarray(tl).reshape(-1),
              np.asarray(limbs).reshape(-1, C6))
    np.testing.assert_array_equal(np.asarray(out), exp)


@test("H7 value lane-slice + rank-3 dot rhs")
def t_h7():
    S, LN, R7, C7 = 8, 128, 64, 8

    def k(tl_ref, tbl_ref, o_ref):
        w = tbl_ref[:]                # [R7, 128]
        wn = w[:, :C7]                # value slice -> [R7, 8]
        oh = (tl_ref[:][:, :, None] ==
              jax.lax.broadcasted_iota(jnp.int32, (S, LN, R7), 2)
              ).astype(jnp.float32)
        sel = jax.lax.dot_general(
            oh, wn, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        o_ref[:] = sel[:, :, 0] + sel[:, :, 5]

    rng = np.random.default_rng(8)
    tl = jnp.asarray(rng.integers(0, R7, (S, LN), dtype=np.int32))
    tbl = jnp.asarray(rng.normal(size=(R7, 128)).astype(np.float32))

    def call(tl, tbl):
        with jax.enable_x64(False):
            return pl.pallas_call(
                k, out_shape=jax.ShapeDtypeStruct((S, LN), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(tl, tbl)

    out = jax.jit(call)(tl, tbl)
    sel = np.asarray(tbl)[np.asarray(tl)]
    np.testing.assert_allclose(np.asarray(out), sel[..., 0] + sel[..., 5],
                               rtol=0, atol=0)
