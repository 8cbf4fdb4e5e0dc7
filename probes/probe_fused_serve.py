"""Probe: fused sorted search (lax.switch tiers, no host syncs) vs the
v1 speculative path, on random batches through the full sort pipeline.

Run on the real TPU:  python probes/probe_fused_serve.py [n] [nq]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import gen_books_like  # noqa: E402
from rmi_tpu.data import RMIDataset  # noqa: E402
from rmi_tpu.keys import KeyType  # noqa: E402
from rmi_tpu import lookup_fast as lf  # noqa: E402


def chained_rate(fn, q, reps=15):
    out = fn(q)
    _ = int(jnp.max(out))
    t0 = time.time()
    for i in range(reps):
        out = fn(q ^ (jnp.max(out).astype(jnp.uint64) & jnp.uint64(1023)))
    _ = int(jnp.max(out))
    return q.shape[0] * reps / (time.time() - t0)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000_000
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 4_194_304
    from rmi_tpu.train.api import train

    keys = gen_books_like(n)
    ds = RMIDataset(keys=keys, key_type=KeyType.U64)
    r = train(ds, "cubic,linear", 262144)
    kmax = int(keys[-1])

    q = jax.random.randint(
        jax.random.PRNGKey(7), (nq,), 0, kmax,
        dtype=jnp.int64).astype(jnp.uint64)

    # exactness first (fused)
    os.environ["RMI_SORTED_FUSED"] = "1"
    got = jax.device_get(lf.fast_search_via_sort(r, q))
    want = jax.device_get(jnp.searchsorted(ds.keys, q, side="left"))
    print(f"fused mismatches: {(got != want).sum()} / {nq}")

    rate_f = chained_rate(lambda qq: lf.fast_search_via_sort(r, qq), q)
    print(f"fused pipeline:  {rate_f/1e6:8.1f} M/s")

    os.environ["RMI_SORTED_FUSED"] = "0"
    rate_v1 = chained_rate(lambda qq: lf.fast_search_via_sort(r, qq), q)
    print(f"v1 pipeline:     {rate_v1/1e6:8.1f} M/s "
          f"(fused = {rate_f/rate_v1:.2f}x)")

    rate_g = chained_rate(lambda qq: lf.fast_search(r, qq), q, reps=8)
    print(f"gather path:     {rate_g/1e6:8.1f} M/s "
          f"(fused = {rate_f/rate_g:.2f}x)")


if __name__ == "__main__":
    main()
