"""Per-family build+serve audit at 200M keys, one FRESH PROCESS per
configuration.

Running all 17 family configs back-to-back in one process OOMs from
row 3 on (even with every per-row buffer freed): after the headline
build + two 200M family builds, the device server no longer finds
contiguous room for the next build's working set.  Process isolation
resets the device heap between rows and matches how the reference's
CI treats each config (one `rmi` invocation per test dir,
tests/Makefile).

Usage:
    python tools/bench_families_200m.py            # all configs
    python tools/bench_families_200m.py --only cubic,radix8
    python tools/bench_families_200m.py --one <label>   # child mode

Parent writes FAMILIES_200M.json at the repo root.
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# (label-spec, branching factor); " u32"/" f64" suffixes select the key
# domain exactly as bench.bench_families does
CONFIGS = [
    ("cubic,linear", 262144),
    ("linear,linear u32", 100),
    ("linear,linear", 4096),
    ("linear_spline,linear", 65536),
    ("robust_linear,cubic", 65536),
    ("radix,linear", 1024),
    ("bradix,linear", 1024),
    ("radix18,linear", 65536),
    ("radix22,cubic", 65536),
    ("histogram,linear", 4096),
    ("loglinear,linear", 16384),
    ("normal,linear", 4096),
    ("lognormal,linear", 4096),
    ("cubic,loglinear", 65536),
    ("cubic,normal", 65536),
    ("cubic,radix8", 4096),
    ("cubic,linear f64", 262144),
]


def run_one(name: str, ebr: int, n: int, nq: int, iters: int) -> dict:
    import numpy as np
    import jax
    import jax.numpy as jnp
    from bench import gen_books_like, measure_search
    from rmi_tpu.data import RMIDataset
    from rmi_tpu.keys import KeyType
    from rmi_tpu.lookup import search
    from rmi_tpu import lookup_fast
    from rmi_tpu.train.api import train

    t_start = time.time()
    keys = gen_books_like(n)
    ds = RMIDataset(keys=keys, key_type=KeyType.U64)
    qkey = jax.random.PRNGKey(11)
    q = jax.random.randint(qkey, (nq,), 0, int(keys[-1]),
                           dtype=jnp.int64).astype(jnp.uint64)

    if name.endswith(" u32"):
        k32 = (keys >> jnp.uint64(32)).astype(jnp.uint32)
        ds = RMIDataset(keys=k32, key_type=KeyType.U32)
        q = (q >> jnp.uint64(32)).astype(jnp.uint32)
        del keys
    elif name.endswith(" f64"):
        kf = jnp.asarray(np.asarray(keys).astype(np.float64)
                         * (1.0 / 512.0))
        ds = RMIDataset(keys=kf, key_type=KeyType.F64)
        q = jnp.asarray(np.asarray(q).astype(np.float64) * (1.0 / 512.0))
        del keys

    spec = name.split(" ")[0]
    t0 = time.time()
    r0 = train(ds, spec, ebr)
    cold = time.time() - t0
    t0 = time.time()
    r0 = train(ds, spec, ebr)
    warm = time.time() - t0
    rate = measure_search(r0, q, iters)
    samp = q[:65536]
    got = np.asarray(search(r0, samp))
    want = np.asarray(jnp.searchsorted(ds.keys, samp, side="left"))
    plan = lookup_fast.get_plan(r0)
    return {
        "serve_mps": round(rate / 1e6, 2),
        "nq": nq,
        "plan": plan.kind,
        "build_s": round(warm, 3),
        "build_cold_s": round(cold, 2),
        "max_err": int(r0.model_max_error),
        "avg_log2": round(float(r0.model_avg_log2_error), 4),
        "exact_mismatches": int((got != want).sum()),
        "eval_mode": r0.eval_mode,
        "wall_s": round(time.time() - t_start, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    ap.add_argument("--one", default="")
    ap.add_argument("--n", type=int,
                    default=int(os.environ.get("RMI_BENCH_FAMILIES_N",
                                               200_000_000)))
    # 4M query batches: above the ~2.3M sorted-pipeline density gate
    # at n=200M, so family serve rates are comparable with the
    # headline instead of recording the gather-path floor
    ap.add_argument("--nq", type=int, default=1 << 22)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    by_label = {f"{name.replace(' ', '_')}_{ebr}": (name, ebr)
                for name, ebr in CONFIGS}

    if args.one:
        name, ebr = by_label[args.one]
        out = run_one(name, ebr, args.n, args.nq, args.iters)
        print("RESULT " + json.dumps(out), flush=True)
        return 0

    labels = [lb for lb in by_label
              if not args.only or any(p in lb
                                      for p in args.only.split(";"))]
    table = {}
    for lb in labels:
        print(f"[families-200m] {lb} ...", flush=True)
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", lb,
             "--n", str(args.n), "--nq", str(args.nq),
             "--iters", str(args.iters)],
            cwd=REPO, capture_output=True, text=True, timeout=3600)
        row = None
        for line in p.stdout.splitlines():
            if line.startswith("RESULT "):
                row = json.loads(line[len("RESULT "):])
        if row is None:
            tail = (p.stdout + p.stderr).strip().splitlines()[-8:]
            row = {"error": f"rc={p.returncode}: " + " | ".join(tail)[-300:]}
        table[lb] = row
        print(f"  -> {json.dumps(row)}  ({time.time()-t0:.0f}s)",
              flush=True)
    out_path = os.path.join(REPO, "FAMILIES_200M.json")
    rows = {}
    file_n = args.n
    if os.path.exists(out_path):
        try:
            prev = json.load(open(out_path))
            rows = prev.get("rows", {})       # merge partial re-runs
            file_n = prev.get("n", args.n)
        except Exception:
            pass
    if args.n == file_n:
        rows.update(table)
    else:
        # reduced-scale fallback rows keep their own n in the label and
        # never displace same-config full-scale rows
        for lb, row in table.items():
            row = dict(row, n=args.n)
            rows[f"{lb}@{args.n}"] = row
    report = {"n": file_n, "nq": args.nq, "generated_unix": time.time(),
              "rows": rows}
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
