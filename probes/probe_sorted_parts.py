"""Breakdown: where does the sorted-serve path spend its time?"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import gen_books_like  # noqa: E402
from rmi_tpu.data import RMIDataset  # noqa: E402
from rmi_tpu.keys import KeyType  # noqa: E402
from rmi_tpu import lookup_fast as lf  # noqa: E402
from rmi_tpu.ops import sorted_serve_kernel as ssk  # noqa: E402
from rmi_tpu.train.api import train  # noqa: E402


def timeit(fn, iters=20):
    r = fn()
    _ = int(jnp.max(r[0] if isinstance(r, tuple) else r))
    t0 = time.time()
    for _i in range(iters):
        r = fn()
    _ = int(jnp.max(r[0] if isinstance(r, tuple) else r))
    return (time.time() - t0) / iters


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 25_000_000
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 4_194_304

    keys = gen_books_like(n)
    ds = RMIDataset(keys=keys, key_type=KeyType.U64)
    r = train(ds, "cubic,linear", 262144)
    plan = lf.get_plan(r)
    q = jnp.sort(jax.random.randint(
        jax.random.PRNGKey(7), (nq,), 0, 2**62,
        dtype=jnp.int64).astype(jnp.uint64))

    stats = lambda: lf._sorted_stats(  # noqa: E731
        q, r.device_top_params, plan.rows_u32,
        jnp.float64(r.norm_offset), jnp.float64(r.norm_scale),
        r.keys[0], r.keys[-1], top_type=r.top_type,
        B=r.branching_factor, S=plan.S, key_type=r.key_type)
    t_stats = timeit(lambda: stats()[0])
    print(f"stats (routing) pass: {t_stats*1e9/nq:7.2f} ns/q")

    midx, base_sf, maxes = stats()
    import numpy as np
    m_leaf, m_sub, m_blk = (int(v) for v in np.asarray(maxes))
    from rmi_tpu.ops import sorted_serve_kernel as _ssk
    W_leaf = next(w for w in _ssk.W_LEAF_TIERS if m_leaf + 8 <= w)
    W_sub = next(w for w in _ssk.W_SUB_TIERS if m_sub + 8 <= w)
    W0 = next(w for w in _ssk.W0_TIERS
              if m_blk + 8 <= w and w >= W_sub)
    print(f"tiers: W_leaf={W_leaf} W0={W0} W_sub={W_sub}")
    offs = lambda: lf._sorted_offsets(  # noqa: E731
        midx, base_sf, B_pad=plan.rows_u32.shape[0],
        nrows0_pad=plan.level0_pair.shape[0], W_leaf=W_leaf, W0=W0,
        W_sub=W_sub)
    t_offs = timeit(lambda: offs()[0])
    print(f"offsets pass:         {t_offs*1e9/nq:7.2f} ns/q")

    leaf_lo, blk_lo, sub_lo = offs()
    from rmi_tpu import keys as keymod
    qi = keymod.ordered_u64(q, r.key_type)
    qhi = (qi >> jnp.uint64(32)).astype(jnp.uint32)
    qlo = qi.astype(jnp.uint32)
    nrows0 = max(1, -(-plan.n // lf.STRIDE))
    kern = lambda: ssk.serve_sorted_call(  # noqa: E731
        qhi, qlo, midx, leaf_lo, blk_lo, sub_lo, plan.rows_u32,
        plan.level0_pair, S=plan.S, B=r.branching_factor,
        nrows0=nrows0, n=plan.n, W_leaf=W_leaf, W0=W0, W_sub=W_sub)
    t_kern = timeit(kern)
    print(f"window kernel:        {t_kern*1e9/nq:7.2f} ns/q")

    e2e = lambda: lf.fast_search_sorted(r, q)  # noqa: E731
    t_e2e = timeit(e2e)
    print(f"end-to-end:           {t_e2e*1e9/nq:7.2f} ns/q "
          f"({nq/t_e2e/1e6:.1f} M/s)")


if __name__ == "__main__":
    main()
