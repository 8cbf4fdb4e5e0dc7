"""Execute the reference's six CI configurations end-to-end on
SYNTHETIC SOSD-shaped files (zero-egress stand-in for the real
wiki/osm downloads, tests/Makefile:12-16).

The real-data harness (tests/test_sosd.py) encodes the six configs
verbatim but skips without files.  This driver closes the loop as far
as this environment allows: it synthesizes wiki- and osm-shaped key
files (rmi_tpu.data.synthetic_dataset) at full 200M scale in the
SOSD binary format, then runs the harness against them — the REAL
file-loading path, REAL builds, and the reference drivers' every-key
bound check (tests/simple_model_wiki/main.cpp:26-41).

Usage:
    python tools/run_sosd_synth.py [--n 200000000] [--sample 1]
        [--configs simple_model_wiki,...]   (default: all six)

Artifacts: key files under .data/ (gitignored), report lines appended
to SOSD_SYNTH.json at the repo root.
"""

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WIKI = "wiki_ts_200M_uint64"
OSM = "osm_cellids_200M_uint64"


def synth(path, kind, n):
    import numpy as np
    from rmi_tpu.data import synthetic_dataset, write_sosd_file
    from rmi_tpu.keys import KeyType

    if os.path.exists(path):
        with open(path, "rb") as f:
            count = int(np.frombuffer(f.read(8), "<u8")[0])
        if count == n:
            print(f"[sosd-synth] reusing {path} (n={count})", flush=True)
            return
    t0 = time.time()
    keys = synthetic_dataset(kind, n, KeyType.U64, seed=7)
    write_sosd_file(path, keys)
    print(f"[sosd-synth] wrote {path} n={n} in {time.time()-t0:.1f}s",
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000_000)
    ap.add_argument("--sample", type=int, default=1)
    ap.add_argument("--configs", default="")
    ap.add_argument("--tpu", action="store_true", default=True)
    args = ap.parse_args()

    data_dir = os.path.join(REPO, ".data")
    os.makedirs(data_dir, exist_ok=True)
    synth(os.path.join(data_dir, WIKI), "wiki", args.n)
    synth(os.path.join(data_dir, OSM), "osm", args.n)

    env = dict(os.environ)
    env["RMI_SOSD_DIR"] = data_dir
    env["RMI_SOSD_SAMPLE"] = str(args.sample)
    env["RMI_SOSD_REPORT"] = os.path.join(REPO, "SOSD_SYNTH.json")
    env["RMI_SOSD_TPU"] = "1" if args.tpu else "0"
    sel = ["-k", args.configs.replace(",", " or ")] if args.configs else []
    cmd = [sys.executable, "-m", "pytest", "tests/test_sosd.py",
           "-v", "-x", "--no-header", "-p", "no:cacheprovider"] + sel
    print(f"[sosd-synth] running: {' '.join(cmd)}", flush=True)
    raise SystemExit(subprocess.call(cmd, cwd=REPO, env=env))


if __name__ == "__main__":
    main()
