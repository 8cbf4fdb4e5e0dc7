"""Test configuration: run everything on a virtual 8-device CPU mesh so
sharding paths are exercised without TPU hardware; bench.py separately
targets the real chip.

The container's sitecustomize registers the tunneled TPU ("axon") and
force-sets jax_platforms="axon,cpu" at interpreter start, so the env
var alone is not enough — the config must be re-overridden after jax
import, before any backend is touched.
"""

import os

# RMI_SOSD_TPU=1: leave the real TPU selected so the opt-in real-SOSD
# harness (test_sosd.py) verifies 200M-key builds at hardware speed.
_use_tpu = os.environ.get("RMI_SOSD_TPU") == "1"

flags = os.environ.get("XLA_FLAGS", "")
if not _use_tpu and "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
if not _use_tpu:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if not _use_tpu:
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is XLA-compile-bound (every
# (model pair, branching factor) is a fresh executable); caching across
# runs turns repeat suites from hours into minutes on small hosts.


def _cpu_fingerprint():
    """Host CPU feature fingerprint.  VMs resurface on different
    physical hosts after migration; persistent XLA:CPU AOT entries
    compiled for the old host's wider ISA ABORT the process when
    loaded on a narrower one (observed 2026-08-20: SIGABRT in
    grid_measure_rmis loading avx512/amx-era cache entries).  Scoping
    the CPU cache dir by the feature set makes a migrated host start
    a fresh cache instead of crashing.  (Duplicated in
    rmi_tpu/config.py for the RMI_FORCE_CPU path — this file must not
    import the package before jax config is settled.)"""
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


jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 f"/tmp/rmi_tpu_jax_cache_{_cpu_fingerprint()}"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


import zlib  # noqa: E402


@pytest.fixture()
def rng(request):
    # deterministic per test, independent of execution order
    seed = zlib.crc32(request.node.nodeid.encode())
    return np.random.default_rng(seed)


# Quick tier (`pytest -m quick`, ~3 min on a 1-core box with a warm
# compile cache): the bound-contract core — every test in these modules
# that isn't explicitly marked slow.  The full suite stays the nightly
# bar (ci.sh runs quick first for fail-fast).
_QUICK_MODULES = frozenset({
    "test_two_layer", "test_models", "test_data", "test_lookup_fast",
})


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.nodeid.split("::", 1)[0].rsplit("/", 1)[-1]
        if (mod.removesuffix(".py") in _QUICK_MODULES
                and item.get_closest_marker("slow") is None):
            item.add_marker(pytest.mark.quick)
