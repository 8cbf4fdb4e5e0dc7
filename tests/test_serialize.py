"""Serialization tests: rmi_size accounting (codegen.rs:375-394),
binary layout (codegen.rs:288-316), artifact save/load round trip."""

import numpy as np
import pytest

import jax.numpy as jnp

from rmi_tpu.data import RMIDataset
from rmi_tpu.train.api import train, train_bounded
from rmi_tpu.serialize import (rmi_size, save_artifact, load_artifact,
                               leaf_layer_blob)
from rmi_tpu.lookup import lookup, search


def _train(rng, spec="linear,linear", B=32, n=2000):
    keys = np.sort(rng.integers(0, 2**40, size=n, dtype=np.uint64))
    ds = RMIDataset.from_numpy(keys)
    return keys, ds, train(ds, spec, B)


def test_rmi_size_linear(rng):
    _, _, res = _train(rng, "linear,linear", 32)
    # top: 2 f64 = 16; leaves: 32 * 16; errors: 32 * 8
    assert rmi_size(res) == 16 + 32 * 16 + 32 * 8


def test_rmi_size_cubic(rng):
    _, _, res = _train(rng, "cubic,cubic", 16)
    assert rmi_size(res) == 32 + 16 * 32 + 16 * 8


def test_rmi_size_radix_table(rng):
    _, _, res = _train(rng, "radix18,linear", 16)
    assert rmi_size(res) == 4 * (1 << 18) + 16 * 16 + 16 * 8


def test_rmi_size_histogram(rng):
    _, _, res = _train(rng, "histogram,linear", 16)
    nb = int(np.asarray(res.top_params["count"]))
    assert rmi_size(res) == 8 * (1 + (1 << 20) + 1 + nb) + 16 * 16 + 16 * 8


def test_leaf_blob_layout(rng):
    _, _, res = _train(rng, "linear,linear", 8)
    blob = leaf_layer_blob(res, include_errors=True)
    rec = np.frombuffer(blob, dtype="<u8").reshape(8, 3)
    params = rec[:, :2].copy().view("<f8")
    np.testing.assert_allclose(params, np.asarray(res.leaf_params))
    np.testing.assert_array_equal(rec[:, 2],
                                  np.asarray(res.leaf_errors))


@pytest.mark.parametrize("spec,B", [
    ("linear,linear", 32),
    ("cubic,linear", 64),
    ("radix,linear", 32),
    ("bradix,linear", 32),
    ("radix8,linear", 16),
    ("histogram,linear", 16),
    ("normal,cubic", 16),
])
def test_artifact_roundtrip(tmp_path, rng, spec, B):
    keys, ds, res = _train(rng, spec, B)
    meta = save_artifact(res, "t", data_dir=str(tmp_path))
    loaded = load_artifact(meta)

    q = keys[::7]
    g1, e1 = lookup(res, jnp.asarray(q))
    g2, e2 = lookup(loaded, jnp.asarray(q))
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))

    idx = search(loaded, jnp.asarray(q), keys=jnp.asarray(keys))
    np.testing.assert_array_equal(np.asarray(idx),
                                  np.searchsorted(keys, q))


def test_artifact_roundtrip_cachefix(tmp_path, rng):
    keys = np.sort(rng.integers(0, 2**40, size=3000, dtype=np.uint64))
    ds = RMIDataset.from_numpy(keys)
    res = train_bounded(ds, "linear_spline,linear", 64, 8)
    meta = save_artifact(res, "cf", data_dir=str(tmp_path))
    loaded = load_artifact(meta)
    q = keys[::11]
    g1, e1 = lookup(res, jnp.asarray(q))
    g2, e2 = lookup(loaded, jnp.asarray(q))
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
    # bound contract: |pos - lb| <= line_size
    lb = np.searchsorted(keys, q)
    assert (np.abs(np.asarray(g1, dtype=np.int64) - lb) <= 8).all()


def test_no_errors_size(tmp_path, rng):
    _, _, res = _train(rng, "linear,linear", 32)
    save_artifact(res, "ne", data_dir=str(tmp_path), include_errors=False)
    import json
    with open(tmp_path / "ne.json") as f:
        meta = json.load(f)
    assert meta["rmi_size"] == rmi_size(res) - 8 * 32
    assert meta["include_errors"] is False
