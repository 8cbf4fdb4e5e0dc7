"""Probe: does sorting queries speed up the packed 2-gather serve?

The packed plan's cost floor is 2 dynamic row gathers per query
(lookup_fast.py:319-357).  Sorted queries hit monotonically
non-decreasing rows, so if the TPU memory system rewards gather
locality at all, (b) beats (a).  (c) measures the end-to-end deal a
user would actually get: argsort + sorted serve + inverse scatter.

Run on the real TPU: python probes/probe_query_sort.py [n] [nq]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import gen_books_like, measure_search  # noqa: E402
from rmi_tpu.data import RMIDataset  # noqa: E402
from rmi_tpu.keys import KeyType  # noqa: E402
from rmi_tpu.lookup import search  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 25_000_000
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 4_194_304
    iters = 20
    from rmi_tpu.train.api import train

    keys = gen_books_like(n)
    ds = RMIDataset(keys=keys, key_type=KeyType.U64)
    r = train(ds, "cubic,linear", 262144)

    qkey = jax.random.PRNGKey(7)
    q = jax.random.randint(
        qkey, (nq,), 0, 2**62, dtype=jnp.int64).astype(jnp.uint64)
    q_sorted = jnp.sort(q)

    rate_rand = measure_search(r, q, iters)
    print(f"(a) random queries:  {rate_rand/1e6:8.2f} M/s")

    rate_sort = measure_search(r, q_sorted, iters)
    print(f"(b) sorted queries:  {rate_sort/1e6:8.2f} M/s "
          f"({rate_sort/rate_rand:.2f}x)")

    # (c) end-to-end: argsort + serve + inverse permutation
    def chained(qq):
        order = jnp.argsort(qq)
        idx_s = search(r, qq[order])
        return jnp.zeros_like(idx_s).at[order].set(idx_s)

    cj = jax.jit(chained)
    out = cj(q)
    _ = int(jnp.max(out))
    t0 = time.time()
    reps = 10
    for i in range(reps):
        out = cj(q ^ jnp.uint64(i + 1))
    _ = int(jnp.max(out))
    rate_e2e = nq * reps / (time.time() - t0)
    print(f"(c) sort+serve+inv:  {rate_e2e/1e6:8.2f} M/s "
          f"({rate_e2e/rate_rand:.2f}x)")


if __name__ == "__main__":
    main()
