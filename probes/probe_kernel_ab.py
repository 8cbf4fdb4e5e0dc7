"""A/B: direct-count vs v1 (fused) sorted-serve kernel on 2-gather plans.

Run on the real TPU: python probes/probe_kernel_ab.py [n] [nq] [iters]
Builds 2-gather-plan configs, asserts both kernels are exact, then
times each on the same sorted in-range batch.  The winner decides the
'auto' default in lookup_fast._sorted_dispatch.
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
from rmi_tpu.train.api import train  # noqa: E402


def fence(x):
    return int(jnp.max(x))


def time_mode(r, q, mode, iters):
    os.environ["RMI_SORTED_KERNEL"] = mode
    out = lf.fast_search_sorted(r, q)
    if out is None:
        return None, None
    fence(out)
    t0 = time.time()
    for _ in range(iters):
        out = lf.fast_search_sorted(r, q)
    fence(out)
    return q.shape[0] * iters / (time.time() - t0), out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 25_000_000
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 4_194_304
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    keys = gen_books_like(n)
    ds = RMIDataset(keys=keys, key_type=KeyType.U64)
    lo, hi = int(keys[0]), int(keys[-1])
    q = jnp.sort(
        jax.random.randint(jax.random.PRNGKey(7), (nq,), lo, hi,
                           dtype=jnp.int64).astype(jnp.uint64))
    want = jnp.searchsorted(ds.keys, q, side="left")

    for spec, B in (("cubic,linear", 262144),
                    ("linear_spline,linear", 65536)):
        r = train(ds, spec, B)
        plan = lf.get_plan(r)
        print(f"== {spec} {B}: plan kind={plan.kind} "
              f"F={getattr(plan, 'F', 1)} lanes={plan.rows_u32.shape[1]}")
        for mode in ("legacy", "direct"):
            # fresh tier speculation per mode
            plan._sorted_tiers = None
            rate, out = time_mode(r, q, mode, iters)
            if rate is None:
                print(f"  {mode:7s}: REFUSED")
                continue
            bad = int(jnp.sum(out[:nq] != want))
            print(f"  {mode:7s}: {rate / 1e6:8.2f} M/s   mismatches={bad}")
            assert bad == 0, (spec, mode, bad)
    os.environ.pop("RMI_SORTED_KERNEL", None)


if __name__ == "__main__":
    main()
