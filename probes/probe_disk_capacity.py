"""Capacity probe for the optimizer disk profile's giant branching
factors (VERDICT r4 next#8).

The disk profile enumerates branching factors up to 2^27
(/root/reference/rmi_lib/src/optimizer.rs:44-57).  At n=200M a grid
point at b=2^25..2^27 sizes its per-leaf arrays (leaf params, span
starts/ends, next/prev keys) at the same scale as the key array
itself; this probe measures, per factor, whether one B-generic grid
point fits the 16GB chip and how long it takes — each factor in a
fresh subprocess so an OOM/crash of one tier doesn't poison the next.

Usage (on the real TPU):
    python probes/probe_disk_capacity.py [mode] [n]     # parent: all tiers
    python probes/probe_disk_capacity.py --one mode B n # child: one tier
modes: grid (default, the B-generic grid program — the path --optimize
uses) and build (train_async — the per-build degradation target);
defaults: n = 200_000_000, tiers 2^24..2^27 with robust_linear,linear
(the pair class every disk front contains).

Measured 2026-08-20 at n=200M on the tunneled v5e chip:
  grid  2^24: OK (grid_s 521-1839, avg_log2 3.2786)
  grid  2^25: TPU worker crash after ~850s
  grid  2^26/2^27: fast failure (~150-350s)
The outcome calibrates the optimizer's grid capacity guard.
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def child(mode: str, b: int, n: int) -> None:
    from bench import gen_books_like
    from rmi_tpu.data import RMIDataset
    from rmi_tpu.keys import KeyType
    from rmi_tpu.train import two_layer
    from rmi_tpu.train.api import _fetch_host, train_async

    t0 = time.time()
    keys = gen_books_like(n)
    kg = time.time() - t0
    t0 = time.time()
    if mode == "grid":
        md = two_layer.metrics_grid_async(keys, KeyType.U64,
                                          "robust_linear", "linear",
                                          [b], b)
        (mh,) = _fetch_host([md])
        avg = float(mh["model_avg_log2_error"][0])
        mx = int(mh["model_max_error"][0])
    else:
        ds = RMIDataset(keys=keys, key_type=KeyType.U64)
        p = train_async(ds, "robust_linear,linear", b)
        (h,) = _fetch_host([p.fetchable()])
        res = p.result(prefetched=h)
        avg = res.model_avg_log2_error
        mx = res.model_max_error
    dt = time.time() - t0
    print("RESULT " + json.dumps({
        "mode": mode, "b": b, "n": n, "keygen_s": round(kg, 1),
        "measure_s": round(dt, 1),
        "avg_log2": round(avg, 4), "max_err": mx,
    }), flush=True)


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--one":
        child(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
        return 0
    mode = sys.argv[1] if len(sys.argv) > 1 else "grid"
    assert mode in ("grid", "build"), mode
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000_000
    out = {}
    for exp in (24, 25, 26, 27):
        b = 1 << exp
        print(f"[disk-capacity] mode={mode} b=2^{exp} n={n} ...",
              flush=True)
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one",
             mode, str(b), str(n)],
            cwd=REPO, capture_output=True, text=True, timeout=3600)
        row = None
        for line in p.stdout.splitlines():
            if line.startswith("RESULT "):
                row = json.loads(line[len("RESULT "):])
        if row is None:
            txt = (p.stdout + p.stderr).strip().splitlines()
            err = next((ln.strip() for ln in txt
                        if "Error" in ln or "RESOURCE" in ln), "")
            row = {"error": f"rc={p.returncode}: {err[:200]} | "
                            + " | ".join(txt[-3:])[-200:]}
        out[f"2^{exp}"] = row
        print(f"  -> {json.dumps(row)}  ({time.time()-t0:.0f}s)",
              flush=True)
    print("SUMMARY " + json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
