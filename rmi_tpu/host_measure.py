"""Host-RAM measurement of optimizer grid points that exceed chip HBM.

The disk profile enumerates branching factors up to 2^27
(/root/reference/rmi_lib/src/optimizer.rs:44-57).  A 16GB chip cannot
hold the build working set for those tiers at n=200M: the grid program
carries ~60B/key of n-scale f64 temporaries plus ~80B/leaf of
bucket-scale arrays, and probes/probe_disk_capacity.py measured the
2^24 bucket passing (~13.3GB modeled) while 2^25 crashes the TPU
worker and 2^26/2^27 fail outright — and the per-build Pallas path
fails the same tiers at the remote-compile step.  The reference has no
such wall because it streams from mmap and keeps only b-scale model
state in RAM (two_layer.rs:20-99).

So giant-tier grid points degrade to THIS module: fresh subprocesses
pinned to the CPU backend train the points in host RAM (125GB here)
with the exact XLA-f64 monolith the grid uses, and report the same
optimizer metrics.  Data reaches the subprocess by path: the original
SOSD file when the dataset has one (RMIDataset.source_path), else one
temp SOSD copy per subprocess.  Configs fan out over parallel
subprocesses when the host has cores (_default_procs /
RMI_HOST_MEASURE_PROCS — the analogue of the reference's rayon pool
over configs, optimizer.rs:224); on this single-core box that is one
sequential subprocess.

The subprocess must flip the backend BEFORE first device use — the
container's sitecustomize force-registers the tunneled TPU, so env
JAX_PLATFORMS=cpu alone is ignored; ``jax.config.update`` is the
reliable override (same pattern as tests/conftest.py).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
from typing import List, Sequence, Tuple


class HostMeasurement:
    """A launched host-side measurement subprocess.  ``wait()`` joins it
    and returns one dict per config (order preserved):
    {models, branching_factor, avg_log2, max_log2, wall_s}.
    """

    def __init__(self, data, configs: Sequence[Tuple[str, int]],
                 timeout_s: int):
        self.configs = list(configs)
        self.timeout_s = timeout_s
        src = getattr(data, "source_path", None)
        if src is not None and os.path.exists(src):
            # data came from an SOSD file: reopen it from disk — a
            # full-array device->host fetch through the tunnel is a
            # multi-minute stall class at 200M
            self.path = src
            self._owns_path = False
        else:
            import numpy as np

            from rmi_tpu.data import write_sosd_file

            # KeyType.value is the filename token from_filename
            # dispatches on (src/main.rs:122-132): uint32/uint64/f64
            fd, self.path = tempfile.mkstemp(
                suffix=f"_{data.key_type.value}", prefix="rmi_host_")
            os.close(fd)
            write_sosd_file(self.path, np.asarray(data.keys))
            self._owns_path = True
        spec = json.dumps([[m, int(b)] for m, b in self.configs])
        env = dict(os.environ)
        # belt (config.py honors RMI_FORCE_CPU at import) and braces
        # (main() flips jax_platforms before first device use)
        env["RMI_FORCE_CPU"] = "1"
        env["JAX_PLATFORMS"] = "cpu"
        # stdout+stderr stream to a file (not a pipe) so multi-hour
        # measurements are tail-able and can't block on pipe buffers
        fd, self.out_path = tempfile.mkstemp(suffix=".log",
                                             prefix="rmi_host_")
        os.close(fd)
        self._out = open(self.out_path, "w")
        self.proc = subprocess.Popen(
            [sys.executable, "-m", "rmi_tpu.host_measure",
             self.path, spec],
            stdout=self._out, stderr=subprocess.STDOUT, text=True,
            env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    def wait(self) -> List[dict]:
        try:
            self.proc.wait(timeout=self.timeout_s)
        except subprocess.TimeoutExpired:
            self.proc.kill()
            self.proc.wait()
        finally:
            self._out.close()
            if self._owns_path:
                os.unlink(self.path)
        with open(self.out_path) as f:
            out = f.read()
        rows = [json.loads(ln[len("RESULT "):])
                for ln in out.splitlines()
                if ln.startswith("RESULT ")]
        if len(rows) != len(self.configs):
            tail = out.strip().splitlines()[-8:]
            raise RuntimeError(
                f"host measurement returned {len(rows)}/"
                f"{len(self.configs)} rows (rc={self.proc.returncode}): "
                + " | ".join(tail))
        os.unlink(self.out_path)
        return rows


def _default_timeout(n_configs: int) -> int:
    # one giant-tier 200M build measured at ~316s on this single-core
    # host; budget generously per sequential config plus startup
    return 1800 + 1800 * n_configs


def _default_procs(n_configs: int) -> int:
    """Subprocess fan-out: the host analogue of the reference's rayon
    pool over configs (optimizer.rs:224).  Each 200M build's working
    set is ~15-25GB, so the count is bounded by RAM as well as cores;
    on this box (1 core) it is 1.  RMI_HOST_MEASURE_PROCS overrides.
    """
    env = os.environ.get("RMI_HOST_MEASURE_PROCS")
    if env is not None:
        return max(1, int(env))
    return max(1, min(4, (os.cpu_count() or 1) // 2, n_configs))


class MultiHostMeasurement:
    """Round-robin partition of configs over several HostMeasurement
    subprocesses; ``wait()`` merges rows back into config order."""

    def __init__(self, data, configs, timeout_s, procs):
        self.configs = list(configs)
        parts = [self.configs[i::procs] for i in range(procs)]
        self.parts = [p for p in parts if p]
        self.handles = [HostMeasurement(data, p, timeout_s)
                        for p in self.parts]

    def wait(self) -> List[dict]:
        by_cfg = {}
        errors = []
        for part, h in zip(self.parts, self.handles):
            try:
                for cfg, row in zip(part, h.wait()):
                    by_cfg[cfg] = row
            except RuntimeError as e:   # join every subprocess first
                errors.append(str(e))
        if errors:
            raise RuntimeError("; ".join(errors))
        return [by_cfg[c] for c in self.configs]


def launch_measure_host(data, configs: Sequence[Tuple[str, int]],
                        timeout_s: int = None):
    """Start measuring ``configs`` on the host CPU backend WITHOUT
    blocking — the caller overlaps on-chip grid measurement and joins
    with ``.wait()``.  Configs fan out over parallel subprocesses when
    the host has cores to spare (_default_procs)."""
    if timeout_s is None:
        timeout_s = _default_timeout(len(configs))
    procs = _default_procs(len(configs))
    if procs == 1:
        return HostMeasurement(data, configs, timeout_s)
    return MultiHostMeasurement(data, configs, timeout_s, procs)


def measure_host(data, configs: Sequence[Tuple[str, int]],
                 timeout_s: int = None) -> List[dict]:
    """Blocking convenience wrapper around launch_measure_host."""
    return launch_measure_host(data, configs, timeout_s).wait()


def main(argv: Sequence[str]) -> int:
    path, spec = argv[0], argv[1]
    import jax
    jax.config.update("jax_platforms", "cpu")

    import time

    from rmi_tpu.data import load_data
    from rmi_tpu.train.api import _fetch_host, train_async

    data = load_data(path)
    configs = [(m, int(b)) for m, b in json.loads(spec)]
    for models, bf in configs:
        print(f"START {models} {bf}", flush=True)
        t0 = time.time()
        p = train_async(data, models, bf)
        (h,) = _fetch_host([p.fetchable()])
        res = p.result(prefetched=h)
        print("RESULT " + json.dumps({
            "models": models, "branching_factor": bf,
            "avg_log2": res.model_avg_log2_error,
            "max_log2": res.model_max_log2_error,
            "wall_s": round(time.time() - t0, 1),
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
