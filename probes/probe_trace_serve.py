"""Trace the sorted-serve program and print the top device ops.

Op-level ground truth for where the sorted pipeline's milliseconds go
(probe_random_pipeline.py gives the stage split; this names the ops).

Env: N (default 200M), NQ (4M), CONFIG/B, WHAT=sorted|stats|sort|all.
"""

import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def dump_trace(tdir, top=30):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xp = glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)[0]
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(xp, "rb").read())
    for p in xs.planes:
        if "TPU" not in p.name:
            continue
        tot = defaultdict(float)
        cnt = defaultdict(int)
        for line in p.lines:
            for ev in line.events:
                md = p.event_metadata[ev.metadata_id]
                tot[md.name] += ev.duration_ps / 1e9
                cnt[md.name] += 1
        for name, ms in sorted(tot.items(), key=lambda kv: -kv[1])[:top]:
            log(f"{ms:9.2f} x{cnt[name]:<4d} {name[:110]}")


def main():
    import jax
    import jax.numpy as jnp
    from rmi_tpu.data import RMIDataset
    from rmi_tpu.keys import KeyType
    from rmi_tpu.train.api import train
    from rmi_tpu import lookup_fast as lf
    from bench import gen_books_like

    n = int(os.environ.get("N", 200_000_000))
    nq = int(os.environ.get("NQ", 1 << 22))
    what = os.environ.get("WHAT", "sorted")

    keys = gen_books_like(n)
    ds = RMIDataset(keys=keys, key_type=KeyType.U64)
    res = train(ds, os.environ.get("CONFIG", "cubic,linear"),
                int(os.environ.get("B", 262144)))
    plan = lf.get_plan(res)
    log(f"plan kind={plan.kind} S={plan.S} F={getattr(plan, 'F', 1)}")

    q = jax.random.randint(jax.random.PRNGKey(7), (nq,), 0,
                           int(keys[-1]),
                           dtype=jnp.int64).astype(jnp.uint64)
    qs = jnp.sort(q)

    def run_sorted():
        return lf._sorted_kernel_search_direct(res, plan, qs)

    def run_stats():
        LB1_f, maxes = lf._sorted_stats_direct(
            qs, res.device_top_params, plan.rows_u32,
            jnp.float64(res.norm_offset), jnp.float64(res.norm_scale),
            res.keys[0], res.keys[-1], top_type=res.top_type,
            B=res.branching_factor, S=plan.S, F=getattr(plan, "F", 1),
            key_type=res.key_type)
        return LB1_f

    def run_sort():
        return lf._sort_with_order(q)[0]

    fns = {"sorted": run_sorted, "stats": run_stats, "sort": run_sort}
    targets = fns.keys() if what == "all" else [what]
    for name in targets:
        fn = fns[name]
        _ = int(jnp.max(fn()))            # warm
        tdir = f"/tmp/rmi_trace_serve_{name}"
        os.system(f"rm -rf {tdir}")
        with jax.profiler.trace(tdir):
            out = fn()
            for _ in range(4):
                out = fn()
            _ = int(jnp.max(out))
        log(f"===== {name} (5 iterations) =====")
        dump_trace(tdir)


if __name__ == "__main__":
    main()
