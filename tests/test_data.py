"""Data-layer tests: SOSD binary IO (src/load.rs:132-157), FixDups /
Dedup semantics (models/mod.rs:143-231)."""

import numpy as np
import pytest

from rmi_tpu.data import (RMIDataset, load_data, write_sosd_file,
                          synthetic_dataset)
from rmi_tpu.keys import KeyType

import reference_oracle as oracle


def test_roundtrip_u64(tmp_path, rng):
    keys = np.sort(rng.integers(0, 2**60, size=1000, dtype=np.uint64))
    p = str(tmp_path / "test_1000_uint64")
    write_sosd_file(p, keys)
    ds = load_data(p)
    assert ds.key_type is KeyType.U64
    np.testing.assert_array_equal(np.asarray(ds.keys), keys)


def test_roundtrip_u32(tmp_path, rng):
    keys = np.sort(rng.integers(0, 2**31, size=500).astype(np.uint32))
    p = str(tmp_path / "test_500_uint32")
    write_sosd_file(p, keys)
    ds = load_data(p)
    assert ds.key_type is KeyType.U32
    np.testing.assert_array_equal(np.asarray(ds.keys), keys)


def test_roundtrip_f64(tmp_path, rng):
    keys = np.sort(rng.uniform(size=500))
    p = str(tmp_path / "test_500_f64")
    write_sosd_file(p, keys)
    ds = load_data(p)
    assert ds.key_type is KeyType.F64
    np.testing.assert_array_equal(np.asarray(ds.keys), keys)


def test_bad_filename(tmp_path):
    with pytest.raises(ValueError):
        KeyType.from_filename("data_bin")


def test_fixdups_matches_iterator(rng):
    keys = np.sort(rng.integers(0, 50, size=300, dtype=np.uint64))
    ds = RMIDataset.from_numpy(keys)
    got = np.asarray(ds.positions)
    want = [y for _, y in
            oracle.fixdups([(int(k), i) for i, k in enumerate(keys)])]
    np.testing.assert_array_equal(got, np.asarray(want))


def test_unique_matches_dedup(rng):
    keys = np.sort(rng.integers(0, 50, size=300, dtype=np.uint64))
    ds = RMIDataset.from_numpy(keys)
    uk, uo = ds.unique()
    # DedupIter keeps the first (key, offset) pair of each run
    want_k, want_i = [], []
    last = None
    for i, k in enumerate(keys.tolist()):
        if k != last:
            want_k.append(k)
            want_i.append(i)
            last = k
    np.testing.assert_array_equal(uk, np.asarray(want_k, dtype=np.uint64))
    np.testing.assert_array_equal(uo, np.asarray(want_i, dtype=np.uint64))


def test_as_u64():
    keys = np.arange(100, dtype=np.uint32)
    ds = RMIDataset.from_numpy(keys).as_u64()
    assert ds.key_type is KeyType.U64
    with pytest.raises(ValueError):
        RMIDataset.from_numpy(np.arange(4.0)).as_u64()


@pytest.mark.parametrize("kind", ["books", "osm", "fb", "wiki"])
def test_synthetic_sorted(kind):
    keys = synthetic_dataset(kind, 10000)
    assert (np.diff(keys.astype(np.float64)) >= 0).all()
    assert keys.dtype == np.uint64
