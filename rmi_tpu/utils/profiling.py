"""Build-phase profiling hooks.

The reference exposes build observability through RUST_LOG tracing and
the BUILD_TIME_NS artifact constant (train/mod.rs:103-118); the TPU
equivalents here are:

  * ``RMI_PROFILE_BUILD=1`` — run the build staged and log per-phase
    wall time (captured into ``last_phase_times`` for tests/tools);
  * ``RMI_PROFILE_TRACE=<dir>`` — wrap each phase in a named
    ``jax.profiler.TraceAnnotation`` so device timelines captured with
    ``jax.profiler.trace(dir)`` (e.g. via RMI_PROFILE in bench.py) show
    the build phases as labeled spans.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time
from typing import Dict

log = logging.getLogger("rmi_tpu.profile")

# phase -> seconds of the most recent profiled build
last_phase_times: Dict[str, float] = {}


@contextlib.contextmanager
def phase(name: str, enabled: bool = True):
    """Time one build phase; callers block on the phase's outputs
    inside the context so the wall time covers the device work."""
    if not enabled:
        yield
        return
    ctx = contextlib.nullcontext()
    if os.environ.get("RMI_PROFILE_TRACE"):
        import jax
        ctx = jax.profiler.TraceAnnotation(f"rmi_build/{name}")
    t0 = time.perf_counter()
    with ctx:
        yield
    dt = time.perf_counter() - t0
    last_phase_times[name] = dt
    log.info("build phase %-8s: %8.1f ms", name, dt * 1e3)
