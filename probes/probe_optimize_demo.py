"""Timed --optimize demo on the real TPU (RESULTS.md OPTIMIZE_DEMO).

Runs the reference's prime workload — the two-phase Pareto sweep
(optimizer.rs:233-249) — on 25M books-like keys with the fast profile,
through the B-bucketed compile-once grid path.  Reports wall time,
number of grid programs dispatched, and the resulting front.

  RMI_OPTIMIZER_PROFILE=fast python probes/probe_optimize_demo.py [n]
"""

import os
import sys
import time

os.environ.setdefault("RMI_OPTIMIZER_PROFILE", "fast")

sys.path.insert(0, ".")
from bench import gen_books_like  # noqa: E402
from rmi_tpu.data import RMIDataset  # noqa: E402
from rmi_tpu.keys import KeyType  # noqa: E402
from rmi_tpu import optimizer  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 25_000_000
    keys = gen_books_like(n)
    ds = RMIDataset(keys=keys, key_type=KeyType.U64)

    ngrids = 0
    orig = optimizer.grid_measure_rmis

    def counting(*a, **kw):
        nonlocal ngrids
        ngrids += len(a[1]) if len(a) > 1 else 0
        return orig(*a, **kw)

    optimizer.grid_measure_rmis = counting

    t0 = time.time()
    front = optimizer.find_pareto_efficient_configs(ds, restrict=10)
    wall = time.time() - t0
    optimizer.grid_measure_rmis = orig

    print(f"n={n} profile={os.environ['RMI_OPTIMIZER_PROFILE']} "
          f"wall={wall:.1f}s grid_programs~={ngrids}")
    print(optimizer.display_table(front))


if __name__ == "__main__":
    main()
