"""A/B the 3-gather wide packed plan vs the hierarchical path on TPU.

The wide plan (lookup_fast._fast_search_packed_wide) replaces the
4-gather hier resolve for monotone tops whose leaf spans exceed the
2-gather window (small branching factors on large arrays).  This probe
builds the three family-table configs that used to fall to hier,
serves the same uniform batch through both plans, and prints M/s.

Usage: python probes/probe_wide_plan.py [n] [nq_log2]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bench import gen_books_like, measure_search  # noqa: E402
from rmi_tpu.data import RMIDataset  # noqa: E402
from rmi_tpu.keys import KeyType  # noqa: E402
from rmi_tpu.train.api import train  # noqa: E402
from rmi_tpu import lookup_fast  # noqa: E402
from rmi_tpu.lookup import search  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 25_000_000
    nq = 1 << (int(sys.argv[2]) if len(sys.argv) > 2 else 21)
    iters = 20
    keys = gen_books_like(n)
    ds = RMIDataset(keys=keys, key_type=KeyType.U64)
    q = jax.random.randint(jax.random.PRNGKey(3), (nq,), 0,
                           int(keys[-1]), dtype=jnp.int64
                           ).astype(jnp.uint64)

    for spec, B in (("linear,linear", 4096), ("radix,linear", 1024),
                    ("bradix,linear", 1024)):
        res = train(ds, spec, B)
        want = None
        for mode in ("wide", "hier"):
            res._search_plan = None
            if mode == "hier":
                os.environ["RMI_SERVE_PLAN"] = "hier"
            else:
                os.environ.pop("RMI_SERVE_PLAN", None)
            plan = lookup_fast.get_plan(res)
            rate = measure_search(res, q, iters)
            got = np.asarray(search(res, q[:65536]))
            if want is None:
                want = np.asarray(jnp.searchsorted(keys, q[:65536],
                                                   side="left"))
            mism = int((got != want).sum())
            extra = (f" S={plan.S} F={plan.F}"
                     if plan.kind.startswith("packed") else
                     f" K={plan.K}")
            print(f"{spec} {B}: plan={plan.kind}{extra} "
                  f"{rate/1e6:.1f} M/s mismatches={mism}", flush=True)
        os.environ.pop("RMI_SERVE_PLAN", None)


if __name__ == "__main__":
    main()
