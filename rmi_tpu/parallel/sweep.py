"""Config-level parallelism for the optimizer sweep.

The reference fans RMI configurations across rayon threads
(optimizer.rs:220-231, main.rs:241-248).  The TPU-native equivalent is
one *device* per configuration: the training data is replicated onto
each device once, and configs are dispatched round-robin — JAX's async
dispatch keeps all devices busy without host threads.

Each (models, branching_factor) pair compiles its own program (shapes
depend on B), so there is no benefit to vmapping across configs; the
parallel axis is the device pool.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
from rmi_tpu.data import RMIDataset
from rmi_tpu.optimizer import RMIStatistics
from rmi_tpu.serialize import rmi_size


def parallel_measure_rmis(data: RMIDataset,
                          configs: Sequence[Tuple[str, int]],
                          devices: Optional[List] = None,
                          progress=None) -> List[RMIStatistics]:
    """measure_rmis (optimizer.rs:220-231) across a device pool."""
    from rmi_tpu.train.api import train

    if devices is None:
        devices = jax.devices()
    replicas = [
        RMIDataset(keys=jax.device_put(data.keys, d),
                   key_type=data.key_type)
        for d in devices
    ]

    # dispatch round-robin; train() blocks on each build's metrics, so
    # interleave via device order (async dispatch overlaps transfers
    # and the next device's compile with the previous device's run).
    out: List[RMIStatistics] = []
    for i, (models, bf) in enumerate(configs):
        ds = replicas[i % len(replicas)]
        res = train(ds, models, bf)
        stat = RMIStatistics(
            models=models, branching_factor=bf,
            average_log2_error=res.model_avg_log2_error,
            max_log2_error=res.model_max_log2_error,
            size=rmi_size(res))
        out.append(stat)
        if progress is not None:
            progress(stat)
    return out
