"""Probe: where does the build spend its time? (micro-op level)

Standalone stage-B/C programs segfault the remote compiler at >= 25M,
so this probes the building-block costs directly at n=RMI_PROBE_N:
u64->f64 conversion, f64 (emulated) cumsum, i32 cummax, per-key
column gathers, df64-style elementwise chains, range_max hierarchy,
delta-scatter expansion — plus stage A standalone and both monolith
builds for end-to-end context.
"""

import os
import time
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from rmi_tpu.keys import KeyType  # noqa: E402
from rmi_tpu.train import two_layer as tl  # noqa: E402
from rmi_tpu.utils import segments as seg  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def gen_books_like(n, seed=42):
    @jax.jit
    def gen(key):
        u = jax.random.uniform(key, (n,), dtype=jnp.float32,
                               minval=1e-7, maxval=1.0)
        csum = jnp.cumsum(-jnp.log(u).astype(jnp.float64))
        scale = (2.0 ** 62) / csum[-1]
        return (csum * scale).astype(jnp.uint64)
    k = gen(jax.random.PRNGKey(seed))
    _ = int(k[-1])
    return k


def _force(out):
    for v in jax.tree_util.tree_leaves(out):
        if hasattr(v, "ravel") and v.size:
            jax.device_get(v.ravel()[0])


def timed(name, fn, *args, iters=2, **kw):
    try:
        out = fn(*args, **kw)
        _force(out)
    except Exception as e:
        log(f"{name:45s}: FAILED {type(e).__name__} {str(e)[:80]}")
        return None, None
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args, **kw)
        _force(out)
    dt = (time.time() - t0) / iters
    log(f"{name:45s}: {dt*1e3:9.1f} ms")
    return out, dt


def main():
    n = int(os.environ.get("RMI_PROBE_N", 25_000_000))
    B = 262144
    key_type = KeyType.U64
    log(f"n={n} B={B} on {jax.devices()[0]}")

    keys = gen_books_like(n)
    kminf, s = tl.norm_constants(keys, key_type)
    kd, sd = jnp.float64(kminf), jnp.float64(s)

    # ---- micro ops ----
    @jax.jit
    def m_xconv(keys):
        return (keys.astype(jnp.float64) - kd) * sd

    xn, _ = timed("u64->f64 conv + normalize", m_xconv, keys)

    timed("f64 cumsum", jax.jit(lambda v: jnp.cumsum(v)), xn)
    timed("f32 cumsum", jax.jit(
        lambda v: jnp.cumsum(v.astype(jnp.float32))), xn)

    t = jnp.minimum((jnp.arange(n, dtype=jnp.int32)
                     // max(n // B, 1)), B - 1)
    t = jax.jit(lambda x: x)(t)
    _force(t)
    timed("i32 cummax", jax.jit(jax.lax.cummax), t)

    timed("fixdups (cummax of where)", jax.jit(
        lambda k: tl._fixdups_i32(k)), keys)

    timed("run_lengths (2 scans)", jax.jit(
        lambda k: tl._run_lengths_i32(k, n)), keys)

    w = jnp.ones((B, 2), dtype=jnp.float64)
    w = jax.jit(lambda x: x * 1.5)(w)
    _force(w)

    timed("2 param column gathers [n]", jax.jit(
        lambda w, t: (seg.iso_take(w[:, 0], t),
                      seg.iso_take(w[:, 1], t))), w, t)

    @jax.jit
    def m_f64_linear_floor(a, b, xn):
        pred = b * xn + a
        p = jnp.floor(pred)
        return jnp.where(jnp.isnan(p), 0.0,
                         jnp.clip(p, 0.0, jnp.float64(n))).astype(jnp.int32)

    ag = jnp.full((n,), 1.0, jnp.float64)
    bg = jnp.full((n,), 2.0, jnp.float64)
    ag = jax.jit(lambda x: x + 0)(ag); _force(ag)
    bg = jax.jit(lambda x: x + 0)(bg); _force(bg)
    timed("emulated-f64 linear+floor elementwise", m_f64_linear_floor,
          ag, bg, xn)

    @jax.jit
    def m_cubic_f64(xn):
        a, b, c, d = (jnp.float64(0.1), jnp.float64(0.2),
                      jnp.float64(0.3), jnp.float64(0.4))
        return ((a * xn + b) * xn + c) * xn + d

    timed("emulated-f64 cubic poly elementwise", m_cubic_f64, xn)

    err = jnp.ones((n,), jnp.int32)
    err = jax.jit(lambda x: x + 0)(err); _force(err)
    starts = jnp.arange(B, dtype=jnp.int64) * (n // B)
    ends = jnp.concatenate([starts[1:], jnp.full((1,), n, jnp.int64)])
    timed("range_max hierarchy [n]->[B]", jax.jit(
        lambda e, st, en: seg.range_max(e, st, en, 0)), err, starts, ends)

    means = jnp.ones((B,), jnp.float64)
    timed("leaf_constant_expand (scatter+cumsum)", jax.jit(
        lambda m, st: seg.leaf_constant_expand(m, st, n)), means, starts)

    timed("range_sum (cumsum+2 gathers)", jax.jit(
        lambda v, st, en: seg.range_sum(v, st, en)), xn, starts, ends)

    # ---- stages ----
    timed("stage A standalone (cubic top)", tl._stage_assign,
          keys, kd, sd, top_type="cubic", B=B, key_type=key_type)

    timed("XLA monolith (cubic,linear)", tl._train_core_mono,
          keys, kd, sd, top_type="cubic", leaf_type="linear", B=B,
          key_type=key_type)

    timed("pallas monolith (cubic,linear)", tl._train_core_pallas,
          keys, kd, sd, top_type="cubic", leaf_type="linear", B=B,
          key_type=key_type, span=tl.default_span(n, B))


if __name__ == "__main__":
    main()
