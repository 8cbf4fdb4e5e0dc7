"""Config-level parallelism for the optimizer sweep.

The reference fans RMI configurations across rayon threads
(optimizer.rs:220-231, main.rs:241-248).  The TPU-native equivalent is
one *device* per configuration: the training data is replicated onto
each device once, configs are dispatched round-robin, and — crucially —
NO host synchronization happens until every config is in flight
(train_async / PendingRMI, train/api.py).  JAX's async dispatch then
keeps all devices busy; the host only blocks once, on a single batched
transfer of every build's (metrics, overflow-flag) pair.

Each (models, branching_factor) pair compiles its own program unless
B-bucketing is active (see rmi_tpu.optimizer.bucket_for); compiles are
host-side and serialize regardless, so the persistent compile cache +
bucketing is what makes first sweeps cheap, and the all-async dispatch
is what makes the execution overlap.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
from rmi_tpu.data import RMIDataset
from rmi_tpu.optimizer import RMIStatistics
from rmi_tpu.serialize import rmi_size


def parallel_train_grid(data: RMIDataset,
                        configs: Sequence[Tuple[str, int]],
                        devices: Optional[List] = None,
                        progress=None):
    """Train every (models, branching_factor) config with all builds in
    flight before the first host sync — the device-pool analogue of the
    reference's par_iter over --param-grid configs (main.rs:241-248).
    Returns the full TrainedRMI per config (unlike
    parallel_measure_rmis, which keeps only the statistics), so callers
    can serialize/emit each one afterwards."""
    from rmi_tpu.train.api import _fetch_host, train_async

    if devices is None:
        devices = jax.devices()
    replicas = [
        RMIDataset(keys=jax.device_put(data.keys, d),
                   key_type=data.key_type)
        for d in devices
    ]
    pending = [train_async(replicas[i % len(replicas)], models, bf)
               for i, (models, bf) in enumerate(configs)]
    fetched = _fetch_host([p.fetchable() for p in pending])
    out = []
    for p, h in zip(pending, fetched):
        res = p.result(prefetched=h)
        out.append(res)
        if progress is not None:
            progress(res)
    return out


def parallel_measure_rmis(data: RMIDataset,
                          configs: Sequence[Tuple[str, int]],
                          devices: Optional[List] = None,
                          progress=None) -> List[RMIStatistics]:
    """measure_rmis (optimizer.rs:220-231) across a device pool."""
    from rmi_tpu.train.api import _fetch_host, train_async

    if devices is None:
        devices = jax.devices()
    replicas = [
        RMIDataset(keys=jax.device_put(data.keys, d),
                   key_type=data.key_type)
        for d in devices
    ]

    # Phase 1: dispatch everything.  train_async never blocks the
    # host, so device i starts executing its first build while the
    # host is still dispatching (or compiling) for device i+1.
    pending = [train_async(replicas[i % len(replicas)], models, bf)
               for i, (models, bf) in enumerate(configs)]

    # Phase 2: ONE host transfer for every build's (metrics, ovf).
    fetched = _fetch_host([p.fetchable() for p in pending])

    out: List[RMIStatistics] = []
    for p, h, (models, bf) in zip(pending, fetched, configs):
        res = p.result(prefetched=h)
        stat = RMIStatistics(
            models=models, branching_factor=bf,
            average_log2_error=res.model_avg_log2_error,
            max_log2_error=res.model_max_log2_error,
            size=rmi_size(res))
        out.append(stat)
        if progress is not None:
            progress(stat)
    return out
