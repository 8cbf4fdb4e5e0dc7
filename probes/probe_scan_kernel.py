"""Probe: Pallas single-pass scan kernel vs the XLA blocked scan.

Validates TPU compilation (pltpu.roll on lane AND sublane axes) and
measures per-element cost at build scale.  Run on the real TPU:
    python probes/probe_scan_kernel.py [n]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from rmi_tpu.utils import segments as seg              # noqa: E402
from rmi_tpu.ops.scan_kernel import scan_i32           # noqa: E402


def timeit(f, *args, iters=10):
    out = f(*args)
    _ = int(jnp.max(out))          # tunnel-safe fence
    t0 = time.time()
    for _i in range(iters):
        out = f(*args)
    _ = int(jnp.max(out))
    return (time.time() - t0) / iters


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000_000
    imin = np.iinfo(np.int32).min
    imax = np.iinfo(np.int32).max
    v = jnp.asarray(
        np.random.default_rng(0).integers(0, 2**31 - 1, n, dtype=np.int32))

    # correctness at scale vs the XLA blocked path
    import os
    os.environ["RMI_SCAN_KERNEL"] = "0"
    want_f = seg.blocked_cummax(v)
    want_r = seg.blocked_cummin(v, reverse=True)
    got_f = scan_i32(v, is_max=True, fill=imin)
    got_r = scan_i32(v, is_max=False, fill=imax, reverse=True)
    ok_f = bool(jnp.all(want_f == got_f))
    ok_r = bool(jnp.all(want_r == got_r))
    print(f"parity fwd={ok_f} rev={ok_r}")
    assert ok_f and ok_r

    t_blk_f = timeit(lambda: seg.blocked_cummax(v))
    t_blk_r = timeit(lambda: seg.blocked_cummin(v, reverse=True))
    t_krn_f = timeit(lambda: scan_i32(v, is_max=True, fill=imin))
    t_krn_r = timeit(lambda: scan_i32(v, is_max=False, fill=imax,
                                      reverse=True))
    for name, t in (("xla fwd", t_blk_f), ("xla rev", t_blk_r),
                    ("pallas fwd", t_krn_f), ("pallas rev", t_krn_r)):
        print(f"{name}: {t * 1e3:8.2f} ms  ({t / n * 1e9:.3f} ns/elem)")


if __name__ == "__main__":
    main()
