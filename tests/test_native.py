"""Native C++ runtime tests: cache_fix parity with the Python
implementation, and artifact serving parity with the JAX path."""

import subprocess

import numpy as np
import pytest

import jax.numpy as jnp

from rmi_tpu import native
from rmi_tpu.cache_fix import _cache_fix_py
from rmi_tpu.data import RMIDataset
from rmi_tpu.train.api import train, train_bounded
from rmi_tpu.serialize import save_artifact
from rmi_tpu.lookup import lookup, search


@pytest.fixture(scope="module", autouse=True)
def build_native():
    subprocess.run(["make", "-C", "native"], check=True,
                   capture_output=True)
    assert native.available()


def test_cache_fix_native_matches_python(rng):
    keys = np.sort(rng.integers(10, 2**40, size=5000, dtype=np.uint64))
    keys = np.unique(keys)
    offs = np.arange(keys.shape[0], dtype=np.uint64)
    pk, pv = _cache_fix_py(keys, offs, 8)
    nk, nv = native.cache_fix(keys, offs, 8)
    np.testing.assert_array_equal(pk, nk)
    np.testing.assert_array_equal(pv, nv)


@pytest.mark.parametrize("spec,B", [
    ("linear,linear", 32),
    ("cubic,linear", 64),
    ("radix,linear", 32),
    ("bradix,linear", 32),
    ("radix8,linear", 16),
    ("histogram,linear", 16),
    ("normal,cubic", 16),
    ("loglinear,lognormal", 16),
])
def test_native_matches_jax(tmp_path, rng, spec, B):
    keys = np.sort(rng.integers(0, 2**40, size=3000, dtype=np.uint64))
    ds = RMIDataset.from_numpy(keys)
    res = train(ds, spec, B)
    meta = save_artifact(res, "nat", data_dir=str(tmp_path))

    srv = native.NativeRMI(meta)
    q = np.concatenate([keys[::7],
                        rng.integers(0, 2**40, 500, dtype=np.uint64)])
    ng, ne = srv.lookup(q)
    jg, je = lookup(res, jnp.asarray(q))
    np.testing.assert_array_equal(ng.astype(np.int64), np.asarray(jg))
    np.testing.assert_array_equal(ne.astype(np.int64), np.asarray(je))

    nidx = srv.search(q, keys)
    np.testing.assert_array_equal(nidx, np.searchsorted(keys, q))
    srv.close()


def test_native_cachefix(tmp_path, rng):
    keys = np.sort(rng.integers(10, 2**40, size=4000, dtype=np.uint64))
    ds = RMIDataset.from_numpy(keys)
    res = train_bounded(ds, "linear_spline,linear", 64, 8)
    meta = save_artifact(res, "cfn", data_dir=str(tmp_path))
    srv = native.NativeRMI(meta)
    q = keys[::5]
    ng, ne = srv.lookup(q)
    jg, je = lookup(res, jnp.asarray(q))
    np.testing.assert_array_equal(ng.astype(np.int64), np.asarray(jg))
    lb = np.searchsorted(keys, q)
    assert (np.abs(ng.astype(np.int64) - lb) <= 8).all()
    nidx = srv.search(q, keys)
    np.testing.assert_array_equal(nidx, lb)
    srv.close()
