"""Global JAX configuration for rmi_tpu.

The reference implementation does all model math in f64 with FMA
(rmi_lib/src/models/linear.rs:89) and manipulates raw u64 keys
(models/mod.rs:77-99).  Representing either requires 64-bit types, so
x64 mode is enabled at import time, before any arrays are created.

TPU note: f64 on TPU is emulated (float32-pair arithmetic) but every
hot pass in this framework is HBM-bandwidth-bound (cumulative sums,
gathers, elementwise chains), not FLOP-bound, so the emulation cost is
acceptable and buys exact numeric parity with the reference's error
metrics (two_layer.rs:266-287).
"""

import os

import jax

jax.config.update("jax_enable_x64", True)

# RMI_FORCE_CPU=1 pins the CPU backend (host RAM) even when the
# container's sitecustomize force-registers a TPU at interpreter start
# (env JAX_PLATFORMS alone is ignored once that registration has run).
# This is the documented escape hatch for direct builds whose working
# set exceeds chip HBM — e.g. the disk profile's giant branching
# factors, where per-build programs at B >= 2^24 fail the remote
# compile at n=200M (probes/probe_disk_capacity.py); the optimizer
# degrades those automatically (rmi_tpu.host_measure), a direct CLI
# build opts in with this flag.
if os.environ.get("RMI_FORCE_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")

# Keep compilation deterministic and quiet in CI contexts.
os.environ.setdefault("JAX_TRACEBACK_FILTERING", "auto")

# Persistent compilation cache: the monolithic build programs take
# minutes to compile (remote compiler on tunneled TPUs, emulated-f64
# expansion); caching across processes amortizes that to one-time.
# Disable with RMI_NO_COMPILE_CACHE=1.
def _cpu_fingerprint():
    """Host CPU feature fingerprint (see tests/conftest.py, where this
    is duplicated for bootstrap-order reasons): persistent XLA:CPU AOT
    entries from a pre-migration host's wider ISA abort the process
    when loaded, so CPU-backend runs get a cache scoped to the host's
    feature set."""
    import hashlib
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform
    return platform.machine()


if not os.environ.get("RMI_NO_COMPILE_CACHE"):
    _repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if (os.environ.get("RMI_FORCE_CPU") == "1"
            or os.environ.get("JAX_PLATFORMS", "").startswith("cpu")):
        # CPU-pinned process: host-scoped cache (TPU programs compile
        # remotely and are host-independent; XLA:CPU AOT results are not)
        _default_cache = os.path.join(
            _repo_root, f".jax_cache_cpu_{_cpu_fingerprint()}")
    else:
        _default_cache = os.path.join(_repo_root, ".jax_cache")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", _default_cache))
    # persist even sub-second compiles: on the tunneled TPU a "fast"
    # compile is still a remote RPC whose latency varies with compiler
    # load by orders of magnitude (the round-2 driver bench lost ~100s
    # to re-compiling small programs) — cache everything
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


# Deterministic Pallas cache keys.  JAX's persistent-cache key strips
# debug info from the outer StableHLO module (cache_key._canonicalize_ir)
# but a Mosaic kernel travels as an opaque serialized-bytecode string
# inside the tpu_custom_call backend_config, WITH the file:line
# locations of the Python call stack baked in.  Consequence: editing any
# caller (bench.py line numbers, a different entry script, tracing a
# build from a test vs the CLI) changes the payload bytes and forces a
# full recompile of the monolithic build program (~5 minutes on the
# tunneled remote compiler) even though the program is semantically
# identical.  Strip locations from the Mosaic module before
# serialization — they only feed kernel-compile diagnostics.
# RMI_KEEP_KERNEL_LOCS=1 restores upstream behavior for debugging.
if not os.environ.get("RMI_KEEP_KERNEL_LOCS"):
    try:
        from jax._src import tpu_custom_call as _tcc
        from jax._src.lib.mlir import passmanager as _pm

        _orig_lower_to_asm = _tcc._lower_mosaic_module_to_asm

        def _lower_mosaic_stripped(module, **kw):
            # Defensive: if a future JAX changes the Module/Operation
            # contract mid-flight, fall back to upstream lowering (only
            # costs cache-key determinism, never correctness).
            try:
                with module.context as ctx:
                    op = module.operation.clone()
                    prev = ctx.allow_unregistered_dialects
                    ctx.allow_unregistered_dialects = True
                    try:
                        _pm.PassManager.parse(
                            "builtin.module(strip-debuginfo)").run(op)
                    finally:
                        ctx.allow_unregistered_dialects = prev
            except Exception:
                return _orig_lower_to_asm(module, **kw)
            return _orig_lower_to_asm(op, **kw)

        _tcc._lower_mosaic_module_to_asm = _lower_mosaic_stripped
    except (ImportError, AttributeError):  # jax internals moved: skip —
        pass  # only costs cache determinism, not correctness
