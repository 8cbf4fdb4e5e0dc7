"""Multi-host scaling: jax.distributed + DCN-aware meshes.

The reference is a single-process tool (rayon threads, main.rs:104-109);
its largest axis of scale is the optimizer sweep (hundreds of full
builds, optimizer.rs:220-231).  On TPU pods that axis maps onto
multi-host data parallelism:

  * WITHIN a pod slice, chips communicate over ICI — shard the key
    array across chips (`dp_train_two_layer`) or fan configs across
    chips (`parallel_measure_rmis`);
  * ACROSS slices/hosts, traffic rides DCN — keep it to per-config
    statistics (tiny) by fanning whole CONFIGS across hosts and whole
    KEY-ARRAYS across the chips inside each host.

This module provides the environment plumbing.  Typical pod usage:

    # on every host (torchrun-style env or TPU metadata supplies
    # coordinator/process_id/num_processes automatically on Cloud TPU):
    from rmi_tpu.parallel.multihost import initialize, global_mesh
    initialize()                       # no-op when single-process
    mesh = global_mesh()               # ('data',) over ALL chips
    dp_train_two_layer(keys, key_type, "cubic", "linear", B, mesh)

`initialize()` is safe to call unconditionally: it only activates when
a multi-process environment is detected (JAX_COORDINATOR_ADDRESS /
Cloud TPU metadata), so single-chip runs and the CPU test mesh are
unaffected.

Mesh layout note (DCN vs ICI): for a 2-D layout use
``hybrid_mesh(ici_axis='data', dcn_axis='config')`` — configs
(independent builds, no communication) map onto the DCN axis, the
sharded key array onto the ICI axis, so collectives
(psum/all_gather in parallel/dp_trainer.py) never cross DCN.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when running multi-process.

    Returns True if distributed mode is active.  Detection: explicit
    args > JAX_COORDINATOR_ADDRESS env > Cloud TPU metadata (handled
    inside jax.distributed.initialize with no args).
    """
    if jax.process_count() > 1:
        return True               # already initialized
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    num = num_processes if num_processes is not None else \
        int(os.environ.get("JAX_NUM_PROCESSES", "0") or 0)
    pid = process_id if process_id is not None else \
        int(os.environ.get("JAX_PROCESS_ID", "-1") or -1)
    if coordinator and num > 1 and pid >= 0:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num, process_id=pid)
        return True
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    if hosts and "," in hosts:
        # Cloud TPU pod: metadata-driven auto-configuration.  Must run
        # before any backend-touching JAX call; surface a clear False
        # instead of crashing when that ship has sailed (or when the
        # env var is a platform warning string rather than hostnames).
        try:
            jax.distributed.initialize()
            return True
        except RuntimeError:
            return False
    return False


def global_mesh(axis: str = "data") -> Mesh:
    """1-D mesh over every addressable chip in the job (all hosts)."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def hybrid_mesh(ici_axis: str = "data", dcn_axis: str = "config") -> Mesh:
    """2-D (dcn, ici) mesh: process (host) granularity on the DCN axis,
    per-host chips on the ICI axis.  Shard key arrays over ``ici_axis``
    and independent work (optimizer configs, datasets) over
    ``dcn_axis`` so collectives stay on ICI."""
    per_host = jax.local_device_count()
    hosts = jax.process_count()
    devs = np.asarray(jax.devices()).reshape(hosts, per_host)
    return Mesh(devs, (dcn_axis, ici_axis))
