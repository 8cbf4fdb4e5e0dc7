"""Where do the random-batch nanoseconds go?  (VERDICT weak#2)

Headline r02: sorted kernel ~94M/s but random batches 46.5M/s through
sort -> direct kernel -> unsort.  This probe times each pipeline stage
at the headline shape (200M keys, cubic,linear 262144, 4M uniform
queries) with the same chained-batch methodology bench.py uses.

Run on the TPU:  python probes/probe_random_pipeline.py
Env: N (default 200M), NQ (4M), ITERS (20).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from rmi_tpu.data import RMIDataset
    from rmi_tpu.keys import KeyType
    from rmi_tpu.train.api import train
    from rmi_tpu import lookup_fast as lf
    from rmi_tpu.lookup import search
    from bench import gen_books_like, measure_search

    n = int(os.environ.get("N", 200_000_000))
    nq = int(os.environ.get("NQ", 1 << 22))
    iters = int(os.environ.get("ITERS", 20))

    t0 = time.time()
    keys = gen_books_like(n)
    print(f"keygen {time.time()-t0:.1f}s", flush=True)
    ds = RMIDataset(keys=keys, key_type=KeyType.U64)
    t0 = time.time()
    res = train(ds, os.environ.get("CONFIG", "cubic,linear"),
                int(os.environ.get("B", 262144)))
    print(f"train {time.time()-t0:.1f}s", flush=True)

    qkey = jax.random.PRNGKey(7)
    q = jax.random.randint(qkey, (nq,), 0, int(keys[-1]),
                           dtype=jnp.int64).astype(jnp.uint64)
    qs = jnp.sort(q)
    plan = lf.get_plan(res)
    print(f"plan kind={plan.kind} S={plan.S} F={getattr(plan,'F',1)}",
          flush=True)

    def timeit(label, fn, queries):
        rate = measure_search(res, queries, iters,
                              search_fn=lambda r, x: fn(x))
        ms = queries.shape[0] / rate * 1e3
        print(f"{label:28s} {ms:8.2f} ms  {rate/1e6:7.1f} M/s",
              flush=True)
        return ms

    # end-to-end
    timeit("e2e random (search auto)", lambda x: search(res, x), q)
    timeit("e2e random (via_sort)",
           lambda x: lf.fast_search_via_sort(res, x), q)
    timeit("e2e sorted (kernel)",
           lambda x: lf._sorted_kernel_search_direct(res, plan, x), qs)
    timeit("gather path (random)", lambda x: lf.fast_search(res, x), q)

    # components
    timeit("sort_with_order", lambda x: lf._sort_with_order(x)[0], q)
    order = lf._sort_with_order(q)[1]
    lb = lf._sorted_kernel_search_direct(res, plan, qs).astype(jnp.int32)

    def unsort_only(x):
        # chain: perturb changes x (i32-ified) -> unsort depends on it
        return lf._unsort_i32(order, x.astype(jnp.int32))
    timeit("unsort (i32 sort)", unsort_only, lb.astype(jnp.uint64))

    def stats_only(x):
        LB1_f, maxes = lf._sorted_stats_direct(
            x, res.device_top_params, plan.rows_u32,
            jnp.float64(res.norm_offset), jnp.float64(res.norm_scale),
            plan.kmin_key, plan.kmax_key, top_type=res.top_type,
            B=res.branching_factor, S=plan.S, F=getattr(plan, "F", 1),
            key_type=res.key_type)
        return LB1_f[:1]          # (1,) broadcasts in the perturb chain
    timeit("stats (boundary rows)", stats_only, qs)


if __name__ == "__main__":
    main()
