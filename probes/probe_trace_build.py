"""Trace the warm Pallas build and print the top device ops.

Env: RMI_PROBE_N (default 25M), RMI_PROBE_CONFIG, RMI_PROBE_BRANCH.
Requires tensorflow's tsl xplane protos (PROTOCOL_BUFFERS_PYTHON_
IMPLEMENTATION=python is set automatically for the parse step).
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from rmi_tpu.data import RMIDataset
    from rmi_tpu.keys import KeyType
    from rmi_tpu.train.api import train

    n = int(os.environ.get("RMI_PROBE_N", 25_000_000))
    spec = os.environ.get("RMI_PROBE_CONFIG", "cubic,linear")
    branch = int(os.environ.get("RMI_PROBE_BRANCH", 262144))

    @jax.jit
    def gen(key):
        u = jax.random.uniform(key, (n,), dtype=jnp.float32,
                               minval=1e-7, maxval=1.0)
        csum = jnp.cumsum(-jnp.log(u).astype(jnp.float64))
        return (csum * ((2.0 ** 62) / csum[-1])).astype(jnp.uint64)

    keys = gen(jax.random.PRNGKey(42))
    _ = int(keys[-1])
    ds = RMIDataset(keys=keys, key_type=KeyType.U64)
    res = train(ds, spec, branch)
    log("warm, eval_mode:", res.eval_mode)

    tdir = "/tmp/rmi_trace_build"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        res = train(ds, spec, branch)

    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xp = glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)[0]
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(xp, "rb").read())
    from collections import defaultdict
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
        for name, ms in sorted(tot.items(), key=lambda kv: -kv[1])[:40]:
            log(f"{ms:9.2f} x{cnt[name]:<4d} {name[:100]}")


if __name__ == "__main__":
    main()
