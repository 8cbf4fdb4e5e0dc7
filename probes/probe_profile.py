"""Capture a device trace of the warm Pallas build and dump the top
self-time ops (requires tensorboard_plugin_profile)."""
import os
import sys
import glob

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

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

    @jax.jit
    def gen(key):
        u = jax.random.uniform(key, (n,), dtype=jnp.float32,
                               minval=1e-7, maxval=1.0)
        csum = jnp.cumsum(-jnp.log(u).astype(jnp.float64))
        return (csum * ((2.0 ** 62) / csum[-1])).astype(jnp.uint64)

    keys = gen(jax.random.PRNGKey(42))
    _ = int(keys[-1])
    ds = RMIDataset(keys=keys, key_type=KeyType.U64)

    res = train(ds, "cubic,linear", 262144)   # compile (cached)
    log("warm; tracing...")
    tdir = "/tmp/rmi_trace"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        res = train(ds, "cubic,linear", 262144)
    log("traced; eval_mode=", res.eval_mode)

    # parse: find the xplane and print top ops by self time
    xp = glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)
    log("xplane files:", xp)
    if not xp:
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        xp, "framework_op_stats", {})
    out = "/tmp/rmi_trace/op_stats.csv"
    mode = "wb" if isinstance(data, bytes) else "w"
    with open(out, mode) as f:
        f.write(data)
    log("wrote", out)


if __name__ == "__main__":
    main()
