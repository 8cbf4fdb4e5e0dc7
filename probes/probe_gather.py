"""Probe: XLA row-gather issue rate vs row width on the real TPU.

Questions this answers (feeding the Pallas lookup-kernel design,
PLAN.md item 2):
  1. Does the ~45M rows/s gather issue-rate cap depend on row width?
     If wide rows (1024-4096 lanes) gather at the same issue rate, a
     2-gather serving path (packed leaf row + ONE wide key row) beats
     the current 3-gather hierarchical resolve.
  2. Do independent gathers pipeline (2 gathers in one program ->
     45M/s each, or 22.5M/s total)?

Run: python probes/probe_gather.py  (on the tunneled TPU)
"""

import time
import sys

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


N = 25_000_000          # keys
NQ = 1 << 20             # queries per dispatch
ITERS = 5


def gen_keys(n):
    @jax.jit
    def gen(key):
        u = jax.random.uniform(key, (n,), dtype=jnp.float32,
                               minval=1e-7, maxval=1.0)
        csum = jnp.cumsum(-jnp.log(u).astype(jnp.float64))
        scale = (2.0 ** 62) / csum[-1]
        return (csum * scale).astype(jnp.uint64)
    k = gen(jax.random.PRNGKey(0))
    k.block_until_ready()
    return k


def overlapped(keys, stride, width):
    m = keys.shape[0]
    nrows = max(1, -(-m // stride))
    padded_len = nrows * stride + width
    pad = jnp.full((padded_len - m,), np.uint64(2**64 - 1), keys.dtype)
    padded = jnp.concatenate([keys, pad])

    @jax.jit
    def build(p):
        parts = [p[i * stride:(nrows + i) * stride].reshape(nrows, stride)
                 for i in range(width // stride)]
        return jnp.concatenate(parts, axis=1)
    r = build(padded)
    r.block_until_ready()
    return r


def timeit(fn, q0, iters=ITERS):
    perturb = jax.jit(lambda q, i: q + (i.astype(jnp.uint64) & jnp.uint64(1)))
    r = fn(q0)
    _ = int(jnp.max(r))
    q = q0
    t0 = time.time()
    for _ in range(iters):
        r = fn(q)
        q = perturb(q0, r)
    _ = int(jnp.max(r))
    dt = (time.time() - t0) / iters
    return dt


def main():
    dev = jax.devices()[0]
    log(f"device: {dev}")
    keys = gen_keys(N)
    rows_idx = jax.random.randint(jax.random.PRNGKey(1), (NQ,), 0,
                                  N // 64, dtype=jnp.int32)
    rows_idx.block_until_ready()
    qkeys = jax.random.randint(jax.random.PRNGKey(2), (NQ,), 0,
                               np.iinfo(np.int64).max,
                               dtype=jnp.int64).astype(jnp.uint64)

    results = {}
    for stride, width in [(64, 128), (256, 512), (512, 1024),
                          (1024, 2048), (2048, 4096)]:
        R = overlapped(keys, stride, width)
        nrows = R.shape[0]
        ridx = (rows_idx % nrows).astype(jnp.int32)
        ridx.block_until_ready()

        @jax.jit
        def count_one(q, ridx=ridx, R=R, stride=stride):
            r = jnp.clip(ridx + (q & jnp.uint64(0)).astype(jnp.int32),
                         0, R.shape[0] - 1)
            blk = R[r]
            cnt = jnp.sum(blk < q[:, None], axis=1).astype(jnp.int64)
            return r.astype(jnp.int64) * stride + cnt

        dt = timeit(count_one, qkeys)
        rate = NQ / dt
        per_row = dt / NQ * 1e9
        bw = NQ * width * 8 / dt / 1e9
        results[(stride, width)] = rate
        log(f"W={width:5d} S={stride:5d}: {dt*1e3:7.2f} ms  "
            f"{rate/1e6:6.1f} M rows/s  {per_row:6.1f} ns/row  "
            f"{bw:6.1f} GB/s")
        del R

    # dependent chains of narrow gathers (the current serving shape)
    R = overlapped(keys, 64, 128)
    for chain in (1, 2, 3):
        @jax.jit
        def chained(q, R=R, ridx=(rows_idx % R.shape[0]), chain=chain):
            r = ridx
            lb = jnp.zeros(q.shape, jnp.int64)
            for _ in range(chain):
                blk = R[jnp.clip(r, 0, R.shape[0] - 1)]
                cnt = jnp.sum(blk < q[:, None], axis=1).astype(jnp.int64)
                lb = r.astype(jnp.int64) * 64 + cnt
                r = (lb % R.shape[0]).astype(jnp.int32)  # dependent
            return lb
        dt = timeit(chained, qkeys)
        log(f"chain={chain} narrow gathers: {dt*1e3:7.2f} ms  "
            f"{NQ/dt/1e6:6.1f} M queries/s  "
            f"{dt/NQ*1e9/chain:6.1f} ns/gather")


if __name__ == "__main__":
    main()
