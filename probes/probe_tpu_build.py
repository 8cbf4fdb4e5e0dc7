"""Integration probe: full train() on the real TPU, Pallas df64 sweep
vs the XLA monolith — build time, metric parity, bound contract.

Env: RMI_PROBE_N (default 25M), RMI_PROBE_CONFIG (cubic,linear),
RMI_PROBE_BRANCH (262144).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


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


def build(ds, spec, branch, mode):
    from rmi_tpu.train.api import train
    os.environ["RMI_PALLAS"] = mode
    t0 = time.time()
    res = train(ds, spec, branch)
    cold = time.time() - t0
    t0 = time.time()
    res = train(ds, spec, branch)
    warm = time.time() - t0
    log(f"mode={mode}: cold={cold:.2f}s warm={warm:.3f}s "
        f"eval_mode={res.eval_mode} max_err={res.model_max_error} "
        f"avg_log2={res.model_avg_log2_error:.6f}")
    return res, warm


def main():
    from rmi_tpu.data import RMIDataset
    from rmi_tpu.keys import KeyType
    from rmi_tpu.lookup import lookup, search

    n = int(os.environ.get("RMI_PROBE_N", 25_000_000))
    spec = os.environ.get("RMI_PROBE_CONFIG", "cubic,linear")
    branch = int(os.environ.get("RMI_PROBE_BRANCH", 262144))
    log(f"n={n} {spec} {branch} on {jax.devices()[0]}")

    keys = gen_books_like(n)
    ds = RMIDataset(keys=keys, key_type=KeyType.U64)

    res_x, warm_x = build(ds, spec, branch, "0")
    res_p, warm_p = build(ds, spec, branch, "1")

    ex = np.asarray(res_x.leaf_errors, dtype=np.int64)
    ep = np.asarray(res_p.leaf_errors, dtype=np.int64)
    log(f"leaf-error diff: max={np.max(np.abs(ex - ep))} "
        f"(#diff={int(np.sum(ex != ep))}/{len(ex)})")
    log(f"speedup warm: {warm_x / warm_p:.2f}x")

    # bound contract under df64 serving, sampled keys + random queries
    sample = ds.keys[:: max(1, n // 500_000)]
    g, e = lookup(res_p, sample)
    true_lb = jnp.searchsorted(ds.keys, sample, side="left")
    viol = int(jnp.sum(jnp.abs(g - true_lb.astype(jnp.int64)) > e))
    log(f"df64 bound violations (sampled keys): {viol}")

    q = jax.random.randint(jax.random.PRNGKey(5), (1 << 20,), 0,
                           np.iinfo(np.int64).max,
                           dtype=jnp.int64).astype(jnp.uint64)
    idx = search(res_p, q)
    true_q = jnp.searchsorted(ds.keys, q, side="left")
    log(f"df64 fast_search mismatches: {int(jnp.sum(idx != true_q))}")

    # serving throughput comparison (chained batches)
    def rate(res, nq=1 << 21, iters=10):
        qq = jax.random.randint(jax.random.PRNGKey(7), (nq,), 0,
                                np.iinfo(np.int64).max,
                                dtype=jnp.int64).astype(jnp.uint64)
        perturb = jax.jit(
            lambda q, i: q ^ (i.astype(jnp.uint64) & jnp.uint64(1023)))
        idx = search(res, qq)
        _ = int(jnp.max(idx))
        cur = qq
        t0 = time.time()
        for _i in range(iters):
            idx = search(res, cur)
            cur = perturb(qq, idx)
        _ = int(jnp.max(idx))
        return nq * iters / (time.time() - t0)

    log(f"search rate xla:  {rate(res_x)/1e6:.2f} M/s")
    log(f"search rate df64: {rate(res_p)/1e6:.2f} M/s")

    # cross-arithmetic: serve the df64-built index with the XLA path
    res_p.eval_mode = "xla"
    res_p._search_plan = None
    idx = search(res_p, q)
    log(f"xla-serve-of-df64-build mismatches: "
        f"{int(jnp.sum(idx != true_q))}")
    log(f"xla-serve-of-df64-build rate: {rate(res_p)/1e6:.2f} M/s")
    res_p.eval_mode = "df64"
    res_p._search_plan = None

    # df64 serve piece timing: row gather vs eval kernel vs resolve
    import time as _t
    from rmi_tpu import lookup_fast as lf
    from rmi_tpu.ops import eval_kernel, df64 as dfm
    plan = lf.get_plan(res_p)
    nq = 1 << 21
    qq = jax.random.randint(jax.random.PRNGKey(9), (nq,), 0,
                            np.iinfo(np.int64).max,
                            dtype=jnp.int64).astype(jnp.uint64)
    midx = jax.random.randint(jax.random.PRNGKey(10), (nq,), 0,
                              res_p.branching_factor, dtype=jnp.int32)

    def timeit(fn, *args):
        out = fn(*args)
        _ = jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        t0 = _t.time()
        for _i in range(5):
            out = fn(*args)
            _ = jax.device_get(
                jax.tree_util.tree_leaves(out)[0].ravel()[0])
        return (_t.time() - t0) / 5

    g1 = jax.jit(lambda rows, m: rows[m])
    dt = timeit(g1, plan.packed_rows, midx)
    log(f"  [B,16] f32 row gather: {dt/nq*1e9:6.1f} ns/q")

    rows = g1(plan.packed_rows, midx)
    import rmi_tpu.keys as keymod
    xn = jax.jit(lambda q: (keymod.as_float(q)
                            - jnp.float64(res_p.norm_offset))
                 * jnp.float64(res_p.norm_scale))(qq)

    ek = jax.jit(functools_partial_eval(eval_kernel, res_p))
    dt = timeit(ek, xn, rows)
    log(f"  df64 eval kernel:      {dt/nq*1e9:6.1f} ns/q")


def functools_partial_eval(eval_kernel, res_p):
    import functools
    from rmi_tpu.models import get_model
    return functools.partial(
        eval_kernel.leaf_eval_clamped,
        leaf_type=res_p.leaf_type, ppm=get_model(res_p.leaf_type).ppm,
        n=res_p.num_rmi_rows - 1)


if __name__ == "__main__":
    main()
