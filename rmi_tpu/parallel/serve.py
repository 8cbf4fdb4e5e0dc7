"""Multi-chip serving: shard query batches across a device mesh.

The reference serves lookups from a single-threaded C++ function
(codegen.rs:612-718); the TPU-native scaling axis for serving is the
QUERY batch.  The trained index (key rows, packed leaf rows, top
params) is small enough to replicate per chip (a 200M-key u64 plan is
~1.6GB of HBM), so serving shards the queries with
``PartitionSpec('q')`` and replicates every table — XLA SPMD then runs
the existing jitted search programs (rmi_tpu.lookup / lookup_fast)
per-shard with NO collectives on the hot path: every gather hits
chip-local HBM and throughput scales linearly with chip count.

Validated on the virtual CPU mesh (tests/test_parallel.py); on a pod
the same two calls measure real scaling with zero code changes
(bench.py RMI_BENCH_SHARD).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

QUERY_AXIS = "q"


def serving_mesh(devices=None) -> Mesh:
    import numpy as np
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (QUERY_AXIS,))


def _replicated(x, mesh: Mesh):
    if x is None:
        return None
    sh = NamedSharding(mesh, P())
    if isinstance(x, dict):
        return {k: jax.device_put(v, sh) for k, v in x.items()}
    return jax.device_put(x, sh)


def replicate_rmi(rmi, mesh: Optional[Mesh] = None):
    """A copy of ``rmi`` with every serving array replicated over the
    mesh.  Derived serving caches (search plans, packed rows) are NOT
    copied: they rebuild from the replicated inputs on first use and
    inherit the replication (jit of replicated inputs yields replicated
    outputs), so lookup/search/fast_search work unchanged."""
    if mesh is None:
        mesh = serving_mesh()
    return dataclasses.replace(
        rmi,
        keys=_replicated(rmi.keys, mesh),
        leaf_errors=_replicated(rmi.leaf_errors, mesh),
        device_top_params=_replicated(rmi.device_top_params, mesh),
        device_leaf_params=_replicated(rmi.device_leaf_params, mesh),
    )


def shard_queries(queries, mesh: Optional[Mesh] = None):
    """Place a query batch sharded over the mesh's query axis.  The
    batch is padded (with its last element) up to a multiple of the
    device count; callers slice results back to the true length."""
    if mesh is None:
        mesh = serving_mesh()
    queries = jnp.asarray(queries)
    m = queries.shape[0]
    nd = mesh.devices.size
    pad = (-m) % nd
    if pad:
        queries = jnp.concatenate(
            [queries, jnp.broadcast_to(queries[-1:], (pad,))])
    return jax.device_put(queries, NamedSharding(mesh, P(QUERY_AXIS))), m


# ---------------------------------------------------------------------------
# per-device serving: host-split batches, full single-chip fast paths
# ---------------------------------------------------------------------------

def replicate_rmi_per_device(rmi, devices=None):
    """One independent single-device copy of the serving arrays per
    chip.  Unlike ``replicate_rmi`` (SPMD replication), each copy runs
    the COMPLETE single-chip serving stack — including the sorted
    kernel pipeline, whose per-batch sort must stay chip-local (a
    global SPMD sort would ride collectives).  Serving caches (search
    plans) build per copy on first use."""
    import dataclasses as _dc
    if devices is None:
        devices = jax.devices()

    def put(x, d):
        if x is None:
            return None
        if isinstance(x, dict):
            return {k: jax.device_put(v, d) for k, v in x.items()}
        return jax.device_put(x, d)

    return [_dc.replace(
        rmi,
        keys=put(rmi.keys, d),
        leaf_errors=put(rmi.leaf_errors, d),
        device_top_params=put(rmi.device_top_params, d),
        device_leaf_params=put(rmi.device_leaf_params, d),
    ) for d in devices]


def search_sharded(rmis, queries):
    """Exact lower bounds for ``queries`` split across per-device RMI
    copies (``replicate_rmi_per_device``).  Dispatch is round-robin and
    fully async — every shard is in flight before any result is
    fetched; device executions overlap (the config-sweep pattern,
    optimizer.rs:220-231 in substance)."""
    from rmi_tpu.lookup import search

    nd = len(rmis)
    queries = jnp.asarray(queries)
    m = queries.shape[0]
    per = -(-m // nd)
    pad = per * nd - m
    if pad:
        queries = jnp.concatenate(
            [queries, jnp.broadcast_to(queries[-1:], (pad,))])
    parts = []
    for i, r in enumerate(rmis):
        dev = r.keys.devices().pop()
        q_i = jax.device_put(queries[i * per:(i + 1) * per], dev)
        parts.append(search(r, q_i))
    out = jnp.concatenate([jax.device_put(p, rmis[0].keys.devices().pop())
                           for p in parts])
    return out[:m]
