"""Probe: sorted-batch gather-free kernel vs the packed 2-gather path.

Run on the real TPU: python probes/probe_sorted_serve.py [n] [nq]
Asserts exactness (vs device searchsorted) then times both paths on
the same sorted batch.
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import gen_books_like  # noqa: E402
from rmi_tpu.data import RMIDataset  # noqa: E402
from rmi_tpu.keys import KeyType  # noqa: E402
from rmi_tpu import lookup_fast as lf  # noqa: E402
from rmi_tpu.train.api import train  # noqa: E402


def fence(x):
    return int(jnp.max(x))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 25_000_000
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 4_194_304
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    keys = gen_books_like(n)
    ds = RMIDataset(keys=keys, key_type=KeyType.U64)
    r = train(ds, "cubic,linear", 262144)
    plan = lf.get_plan(r)
    print(f"plan kind={plan.kind} S={plan.S} nrows0={plan.level0_pair.shape[0]}")

    q = jnp.sort(jax.random.randint(
        jax.random.PRNGKey(7), (nq,), 0, 2**62,
        dtype=jnp.int64).astype(jnp.uint64))

    # correctness
    t0 = time.time()
    out = lf.fast_search_sorted(r, q)
    if out is None:
        print("kernel path REFUSED (None)")
        return
    fence(out)
    print(f"first sorted-serve call (incl compile): {time.time()-t0:.1f}s")
    want = jnp.searchsorted(ds.keys, q, side="left")
    bad = int(jnp.sum(out != want))
    print(f"mismatches vs searchsorted: {bad} / {nq}")
    assert bad == 0

    # throughput: gather path on the same sorted batch
    gout = lf.fast_search(r, q)
    fence(gout)
    t0 = time.time()
    for i in range(iters):
        gout = lf.fast_search(r, q ^ jnp.uint64(0))
    fence(gout)
    rate_g = nq * iters / (time.time() - t0)
    print(f"(a) gather path, sorted batch: {rate_g/1e6:8.2f} M/s")

    t0 = time.time()
    for i in range(iters):
        out = lf.fast_search_sorted(r, q)
    fence(out)
    rate_k = nq * iters / (time.time() - t0)
    print(f"(b) sorted kernel:             {rate_k/1e6:8.2f} M/s "
          f"({rate_k/rate_g:.2f}x)")


if __name__ == "__main__":
    main()
