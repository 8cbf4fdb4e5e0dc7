"""Minimized reproducer for the round-4 cubic-leaf B-generic grid
fault (VERDICT r4 weak#3 / next#5).

Round-4 observation: B-generic grid points (_metrics_grid_point) with
leaf_type=cubic at n > 2^25 reproducibly crashed the tunneled TPU
worker, while (a) the same points with linear/robust_linear leaves,
(b) the same n on the per-build Pallas path, and (c) cubic leaves at
n <= 2^25 all ran clean.  optimizer.grid_safe routes those pairs to
per-build measurement.

The implicated kernel was the chunked L1 fallback-comparison interior
(_abs_err_interior_chunked, models/cubic.py): the grid path runs the
XLA (pallas_span=None) cubic fit, which at n > _L1_CHUNK swept the
cubic-vs-linear_spline comparison with jax.ops.segment_sum — a
scatter-add over 2^25-element chunks into [B] bins.  That scatter was
replaced with blocked range sums (clipped per-chunk spans) in round 5,
which also cut the cubic-leaf warm build at 200M from ~38s to 0.63s.

Usage (on the real TPU):
    python probes/probe_grid_cubic_fault.py [n] [bucket]
defaults: n = 48_000_000 (> 2^25, well inside HBM), bucket = 2^21.

Exit 0 with a metrics line = no fault (grid_safe exclusion can be
dropped); a TPU worker crash / SIGSEGV = the fault is back — re-route
cubic leaves through optimizer.grid_safe and record the trigger here.

RESULT (2026-08-20, round 5, tunneled v5e-lite): PASSED at the
defaults — b=65536 avg_log2=5.5816/max_err=91, b=262144 4.6692/47,
b=2097152 3.4890/42, grid in 307s incl. cold compiles, no fault.
The cubic exclusion in optimizer.grid_safe was retired on this
evidence.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

n = int(sys.argv[1]) if len(sys.argv) > 1 else 48_000_000
bucket = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 21

import jax
from bench import gen_books_like
from rmi_tpu.keys import KeyType
from rmi_tpu.train import two_layer

t0 = time.time()
keys = gen_books_like(n)
print(f"keygen {time.time()-t0:.1f}s n={n} bucket={bucket}", flush=True)

# the exact faulting shape class: one compiled grid program per
# (pair, bucket), cubic leaves, branching factors spanning the bucket
bs = [1 << 16, 1 << 18, 1 << 21]
bs = [b for b in bs if b <= bucket]
t0 = time.time()
md = two_layer.metrics_grid_async(keys, KeyType.U64, "robust_linear",
                                  "cubic", bs, bucket)
from rmi_tpu.train.api import _fetch_host
(mh,) = _fetch_host([md])
dt = time.time() - t0
for i, b in enumerate(bs):
    print(f"  b={b}: avg_log2={float(mh['model_avg_log2_error'][i]):.4f} "
          f"max_err={int(mh['model_max_error'][i])}", flush=True)
print(f"grid OK in {dt:.1f}s — no worker fault", flush=True)
