"""Probe: random-batch serving via sort -> sorted kernel -> unsort.

The gather serve path sits at the TPU's dynamic-gather issue-rate cap
(~2 row gathers/query ~= 50ns, RESULTS.md round-1 facts).  The sorted
kernel (ops/sorted_serve_kernel.py) is gather-free at ~94 M/s e2e, so
a random batch could pay for a device sort + inverse permutation if
XLA's TPU sort is cheap enough:

  (1) sort_key_val(q, iota)      -> q_sorted, order     [u64/i32 sort]
  (2) search_sorted(q_sorted)    -> idx_s               [kernel]
  (3) sort_key_val(order, idx_s) -> idx                 [i32/i32 sort]

This probe times each stage and the end-to-end pipeline against the
gather path.  Run on the real TPU:
  python probes/probe_sort_pipeline.py [n] [nq]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import gen_books_like, measure_search  # noqa: E402
from rmi_tpu.data import RMIDataset  # noqa: E402
from rmi_tpu.keys import KeyType  # noqa: E402
from rmi_tpu import lookup_fast as lf  # noqa: E402


def timeit(fn, reps=10):
    out = fn(0)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[-1:])
    t0 = time.time()
    for i in range(reps):
        out = fn(i + 1)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[-1:])
    return (time.time() - t0) / reps


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 25_000_000
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 4_194_304
    from rmi_tpu.train.api import train

    keys = gen_books_like(n)
    ds = RMIDataset(keys=keys, key_type=KeyType.U64)
    r = train(ds, "cubic,linear", 262144)

    q = jax.random.randint(
        jax.random.PRNGKey(7), (nq,), 0, 2**62,
        dtype=jnp.int64).astype(jnp.uint64)

    # stage timings
    iota = jnp.arange(nq, dtype=jnp.int32)

    @jax.jit
    def s1(qq):
        return jax.lax.sort_key_val(qq, iota)

    @jax.jit
    def s3(order, vals):
        return jax.lax.sort_key_val(order, vals)[1]

    t_sort1 = timeit(lambda i: s1(q ^ jnp.uint64(i)))
    print(f"sort u64+i32:  {t_sort1*1e3:8.2f} ms "
          f"({nq/t_sort1/1e6:6.1f} M/s)")

    qs, order = s1(q)
    t_kernel = timeit(lambda i: lf.fast_search_sorted(
        r, qs ^ jnp.uint64(0)))  # same batch; tiers stay hot
    print(f"sorted serve:  {t_kernel*1e3:8.2f} ms "
          f"({nq/t_kernel/1e6:6.1f} M/s)")

    idx_s = lf.fast_search_sorted(r, qs).astype(jnp.int32)
    t_sort3 = timeit(lambda i: s3(order, idx_s + i))
    print(f"sort i32+i32:  {t_sort3*1e3:8.2f} ms "
          f"({nq/t_sort3/1e6:6.1f} M/s)")

    # scatter alternative for the inverse permutation
    @jax.jit
    def inv_scatter(o, v):
        return jnp.zeros_like(v).at[o].set(v)

    t_scat = timeit(lambda i: inv_scatter(order, idx_s + i))
    print(f"inv scatter:   {t_scat*1e3:8.2f} ms "
          f"({nq/t_scat/1e6:6.1f} M/s)")

    # gather baseline
    rate_g = measure_search(r, q, 10)
    print(f"gather path:   {nq/rate_g*1e3:8.2f} ms "
          f"({rate_g/1e6:6.1f} M/s)")

    # end-to-end pipeline (host-orchestrated, same speculation reuse)
    def pipe(i):
        qq = q ^ jnp.uint64(i)
        qs_, order_ = s1(qq)
        idx_ = lf.fast_search_sorted(r, qs_).astype(jnp.int32)
        return s3(order_, idx_)

    t_pipe = timeit(pipe)
    print(f"pipeline:      {t_pipe*1e3:8.2f} ms "
          f"({nq/t_pipe/1e6:6.1f} M/s)  "
          f"[{nq/t_pipe/rate_g:.2f}x gather]")

    # correctness
    got = jax.device_get(pipe(0))
    want = jax.device_get(jnp.searchsorted(ds.keys, q, side="left"))
    print(f"mismatches: {(got != want).sum()} / {nq}")


if __name__ == "__main__":
    main()
