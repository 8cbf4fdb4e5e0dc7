"""Probe: where does the 200M build spend its time?

Runs the three staged build programs separately (assign / fit / sweep)
on the real TPU and times each, plus micro-variants isolating the
suspected hot spots inside the sweep (per-key param column gathers,
emulated-f64 elementwise predict, range_max hierarchy).

Env: RMI_PROBE_N (default 50M).
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
    k.block_until_ready()
    return k


def _force(out):
    """Materialize one element of every output leaf — block_until_ready
    is unreliable over the tunneled device."""
    leaves = jax.tree_util.tree_leaves(out)
    for v in leaves:
        if hasattr(v, "ravel") and v.size:
            jax.device_get(v.ravel()[0])


def timed(name, fn, *args, warm=True, iters=2, **kw):
    out = fn(*args, **kw)
    _force(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args, **kw)
        _force(out)
    dt = (time.time() - t0) / iters
    log(f"{name:45s}: {dt*1e3:9.1f} ms")
    return out, dt


def main():
    n = int(os.environ.get("RMI_PROBE_N", 50_000_000))
    B = 262144
    top_type, leaf_type = "cubic", "linear"
    key_type = KeyType.U64
    log(f"n={n} B={B} {top_type},{leaf_type} on {jax.devices()[0]}")

    keys = gen_books_like(n)
    kminf, s = tl.norm_constants(keys, key_type)
    kd, sd = jnp.float64(kminf), jnp.float64(s)

    (yfix, top_params, t), dt_a = timed(
        "stage A (fixdups+top fit+assign)", tl._stage_assign,
        keys, kd, sd, top_type=top_type, B=B, key_type=key_type)

    fit_out, dt_b = timed(
        "stage B (leaf fits + LB fills)", tl._stage_fit,
        keys, yfix, t, kd, sd, leaf_type=leaf_type, B=B,
        key_type=key_type)
    (leaf_params, patch, next_idx, next_key, prev_key, starts, ends,
     nonempty) = fit_out

    _, dt_c = timed(
        "stage C (error sweep + metrics)", tl._stage_sweep,
        keys, yfix, t, {"w": leaf_params["w"]}, next_idx, next_key,
        prev_key, starts, ends, nonempty, kd, sd, leaf_type=leaf_type,
        B=B, key_type=key_type)

    log(f"total staged: {(dt_a+dt_b+dt_c)*1e3:.1f} ms")

    _, dt_p = timed(
        "mono+pallas build (df64 sweep)", tl._train_core_pallas,
        keys, kd, sd, top_type=top_type, leaf_type=leaf_type, B=B,
        key_type=key_type, span=tl.default_span(n, B))
    log(f"pallas vs xla staged: {dt_p*1e3:.1f} vs "
        f"{(dt_a+dt_b+dt_c)*1e3:.1f} ms")

    # --- micro: pieces of the sweep ---
    w = leaf_params["w"]

    @jax.jit
    def m_xconv(keys):
        xraw = keys.astype(jnp.float64)
        return (xraw - kd) * sd

    xn, _ = timed("  u64->f64 conv + normalize", m_xconv, keys)

    @jax.jit
    def m_gather2(w, t):
        return seg.iso_take(w[:, 0], t), seg.iso_take(w[:, 1], t)

    (a_g, b_g), _ = timed("  2 param column gathers [n]", m_gather2, w, t)

    @jax.jit
    def m_predict(a_g, b_g, xn, yfix):
        pred_f = b_g * xn + a_g
        p = jnp.floor(pred_f)
        p = jnp.where(jnp.isnan(p), 0.0, jnp.clip(p, 0.0, jnp.float64(n)))
        pred = p.astype(jnp.int32)
        return jnp.abs(jnp.minimum(pred, n) -
                       jnp.minimum(yfix, n))

    err, _ = timed("  f64 predict+floor+err elementwise", m_predict,
                   a_g, b_g, xn, yfix)

    timed("  range_max hierarchy [n]->[B]", jax.jit(
        lambda e, st, en: seg.range_max(e, st, en, 0)), err, starts, ends)

    timed("  run_lengths elementwise+cummax", jax.jit(
        functools_partial_runs), keys)

    @jax.jit
    def m_cumsum(xn):
        return jnp.cumsum(xn)

    timed("  f64 cumsum [n]", m_cumsum, xn)

    @jax.jit
    def m_cumsum32(t):
        return jnp.cumsum(t.astype(jnp.float32))

    timed("  f32 cumsum [n]", m_cumsum32, t)

    @jax.jit
    def m_cummax(t):
        return jax.lax.cummax(t)

    timed("  i32 cummax [n]", m_cummax, t)


def functools_partial_runs(keys):
    return tl._run_lengths_i32(keys, keys.shape[0])


if __name__ == "__main__":
    main()
