"""Bisect which stage-B output crashes the remote TPU compiler.

The monolith (A+B+C, no n-scale outputs) compiles; stage B standalone
and fused A+B segfault tpu_compile_helper at n >= 25M.  Try A+B
variants that return successively fewer outputs.

Env: RMI_PROBE_N (default 25M).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

import functools  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def gen(n, seed=42):
    @jax.jit
    def g(key):
        u = jax.random.uniform(key, (n,), dtype=jnp.float32,
                               minval=1e-7, maxval=1.0)
        csum = jnp.cumsum(-jnp.log(u).astype(jnp.float64))
        return (csum * ((2.0 ** 62) / csum[-1])).astype(jnp.uint64)
    k = g(jax.random.PRNGKey(seed))
    _ = int(k[-1])
    return k


def main():
    from rmi_tpu.keys import KeyType
    from rmi_tpu.train import two_layer as tl

    n = int(os.environ.get("RMI_PROBE_N", 25_000_000))
    B = 262144
    key_type = KeyType.U64
    keys = gen(n)
    kminf, s = tl.norm_constants(keys, key_type)
    kd, sd = jnp.float64(kminf), jnp.float64(s)

    def variant(name, outputs):
        @functools.partial(jax.jit, static_argnames=())
        def fn(keys, kd, sd):
            yfix, top_params, t = tl._assign_body(
                keys, kd, sd, top_type="cubic", B=B, key_type=key_type)
            (leaf_params, patch, next_idx, next_key, prev_key, starts,
             ends, nonempty) = tl._fit_body(
                keys, yfix, t, kd, sd, leaf_type="linear", B=B,
                key_type=key_type)
            env = dict(yfix=yfix, t=t, top=top_params,
                       w=leaf_params["w"], patch=patch,
                       next_idx=next_idx, next_key=next_key,
                       prev_key=prev_key, starts=starts, ends=ends,
                       nonempty=nonempty)
            return {k: env[k] for k in outputs}

        t0 = time.time()
        try:
            out = fn(keys, kd, sd)
            _ = jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
            log(f"[OK]   {name} ({time.time()-t0:.0f}s)")
            return True
        except Exception as e:
            log(f"[FAIL] {name}: {type(e).__name__} {str(e)[:120]} "
                f"({time.time()-t0:.0f}s)")
            return False

    # most likely culprits first
    variant("v1 w only", ["w"])
    variant("v2 w+t+yfix", ["w", "t", "yfix"])
    variant("v3 w+t+yfix+top+Bsmall",
            ["w", "t", "yfix", "top", "patch", "next_idx", "next_key",
             "prev_key"])
    variant("v4 all (baseline, expect FAIL)",
            ["w", "t", "yfix", "top", "patch", "next_idx", "next_key",
             "prev_key", "starts", "ends", "nonempty"])


if __name__ == "__main__":
    main()
