"""Data layer: SOSD binary files -> device-resident training data.

Replaces the reference's mmap adapters (src/load.rs:15-157) with a
single device upload.  File format is identical to SOSD / the reference
(README.md:29-33): 8-byte little-endian u64 item count followed by
packed little-endian keys; dtype chosen from the file name
(src/main.rs:122-132).

Duplicate-key handling: the reference wraps every training iteration in
``FixDupsIter`` (models/mod.rs:143-185) so that *all* occurrences of a
duplicated key report the offset of its FIRST occurrence (lower-bound
semantics).  Here that becomes a one-shot vectorized transform:
``lb_positions[i] = index of first occurrence of keys[i]`` computed with
a cumulative max over change-flags.  ``unique`` mirrors ``DedupIter``
(models/mod.rs:187-231): the first (key, offset) pair of each run.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rmi_tpu.keys import KeyType


def _first_occurrence_positions(keys: jax.Array) -> jax.Array:
    """positions[i] = smallest j with keys[j] == keys[i] (uint64).

    Vectorized FixDupsIter (models/mod.rs:154-185): a change-flag marks
    the start of each duplicate run; a cumulative max of flag*index
    broadcasts the run-start index to every member of the run.
    """
    n = keys.shape[0]
    idx = jnp.arange(n, dtype=jnp.int64)
    changed = jnp.concatenate(
        [jnp.ones((1,), dtype=bool), keys[1:] != keys[:-1]]
    )
    starts = jnp.where(changed, idx, jnp.int64(0))
    return jax.lax.cummax(starts).astype(jnp.uint64)


@jax.jit
def _fixdups_jit(keys):
    return _first_occurrence_positions(keys)


@dataclasses.dataclass
class RMIDataset:
    """Sorted key array + lower-bound positions, resident on device.

    Equivalent of ``RMITrainingData`` (models/mod.rs:233-317) minus the
    ``scale`` field: scaling by branching_factor/n is applied inside the
    trainer (two_layer.rs:109) rather than stored as container state,
    because under jit it is just one fused multiply.
    """

    keys: jax.Array          # [n] sorted, dtype = key_type
    key_type: KeyType
    _positions: Optional[jax.Array] = None  # [n] uint64, lazy
    # On-disk origin when loaded from an SOSD file (load_data).  Lets
    # host-RAM fallbacks (rmi_tpu.host_measure) reopen the data from
    # disk instead of fetching the full key array back through the
    # device tunnel — a 1.6GB device->host transfer that measured as a
    # multi-minute stall class on tunneled chips.
    source_path: Optional[str] = None

    def __len__(self) -> int:
        return int(self.keys.shape[0])

    @property
    def n(self) -> int:
        return int(self.keys.shape[0])

    @property
    def positions(self) -> jax.Array:
        """Lower-bound targets: first-occurrence index per key (FixDups)."""
        if self._positions is None:
            self._positions = _fixdups_jit(self.keys)
        return self._positions

    def unique(self) -> Tuple[np.ndarray, np.ndarray]:
        """(keys, first offsets) of each duplicate run — DedupIter
        semantics (models/mod.rs:198-231).  Host-side (used by the
        cache_fix spline pass)."""
        k = np.asarray(self.keys)
        changed = np.concatenate([[True], k[1:] != k[:-1]])
        idx = np.nonzero(changed)[0]
        return k[idx], idx.astype(np.uint64)

    @classmethod
    def from_numpy(cls, arr: np.ndarray, key_type: Optional[KeyType] = None,
                   device=None) -> "RMIDataset":
        if key_type is None:
            key_type = {
                np.dtype(np.uint32): KeyType.U32,
                np.dtype(np.uint64): KeyType.U64,
                np.dtype(np.float64): KeyType.F64,
            }[arr.dtype]
        keys = jnp.asarray(arr, dtype=key_type.jnp_dtype)
        if device is not None:
            keys = jax.device_put(keys, device)
        return cls(keys=keys, key_type=key_type)

    def as_u64(self) -> "RMIDataset":
        """RMIMMap::into_u64 analogue (src/load.rs:123-128): cache_fix
        (--bounded) requires u64 keys."""
        if self.key_type is KeyType.U64:
            return self
        if self.key_type is KeyType.U32:
            return RMIDataset(
                keys=self.keys.astype(jnp.uint64),
                key_type=KeyType.U64,
                _positions=self._positions,
            )
        raise ValueError("Can only construct a bounded RMI on integer data.")


def load_data(path: str, key_type: Optional[KeyType] = None,
              device=None) -> RMIDataset:
    """Read an SOSD binary file (src/load.rs:132-157) onto device.

    Layout: u64 LE count, then `count` packed LE keys.
    """
    if key_type is None:
        key_type = KeyType.from_filename(os.path.basename(path))
    with open(path, "rb") as f:
        header = f.read(8)
        count = int(np.frombuffer(header, dtype="<u8")[0])
        raw = np.fromfile(f, dtype=np.dtype(key_type.np_dtype).newbyteorder("<"),
                          count=count)
    if raw.shape[0] != count:
        raise ValueError(
            f"{path}: header says {count} items but file holds {raw.shape[0]}"
        )
    ds = RMIDataset.from_numpy(raw.astype(key_type.np_dtype), key_type,
                               device=device)
    ds.source_path = os.path.abspath(path)
    return ds


def write_sosd_file(path: str, arr: np.ndarray) -> None:
    """Write keys in the SOSD binary format the reference consumes."""
    with open(path, "wb") as f:
        f.write(np.uint64(arr.shape[0]).tobytes())
        f.write(np.ascontiguousarray(arr).astype(
            np.dtype(arr.dtype).newbyteorder("<")).tobytes())


# ---------------------------------------------------------------------------
# Synthetic SOSD-like datasets (zero-egress stand-ins for books/osm/fb/wiki).
# ---------------------------------------------------------------------------

def synthetic_dataset(kind: str, n: int, key_type: KeyType = KeyType.U64,
                      seed: int = 0) -> np.ndarray:
    """Generate a sorted key array shaped like the SOSD benchmark files.

    kinds:
      * ``books``  — roughly uniform with mild local clustering
      * ``osm``    — heavy-tailed cell ids (clustered, large gaps)
      * ``fb``     — lognormal-ish ids with duplicates
      * ``wiki``   — timestamps: near-linear with bursts + duplicates
    """
    rng = np.random.default_rng(seed)
    if kind == "books":
        gaps = rng.exponential(scale=float(2**63) / n, size=n)
        keys = np.cumsum(gaps)
    elif kind == "osm":
        centers = rng.uniform(0, 2**62, size=max(n // 4096, 4))
        which = rng.integers(0, len(centers), size=n)
        keys = centers[which] + rng.exponential(2**34, size=n)
    elif kind == "fb":
        keys = rng.lognormal(mean=30.0, sigma=2.5, size=n)
        keys = np.minimum(keys, 1.8e18)
        dup = rng.random(n) < 0.05
        keys[dup] = np.round(keys[dup], -3)
    elif kind == "wiki":
        base = np.linspace(1.0e9, 1.7e9, n)
        jitter = rng.exponential(50.0, size=n)
        keys = np.floor(base + jitter)
    else:
        raise ValueError(f"unknown synthetic dataset kind: {kind}")

    keys = np.sort(keys)
    if key_type is KeyType.F64:
        return keys.astype(np.float64)
    hi = float(np.iinfo(key_type.np_dtype).max)
    keys = np.clip(keys, 0, hi)
    if kind == "books" and key_type is KeyType.U32:
        keys = keys / keys[-1] * (hi - 1.0)
    return np.sort(keys.astype(key_type.np_dtype))
