"""Property-based fuzzing (hypothesis) over adversarial key patterns.

The north-star property from the reference's integration tests
(tests/*/main.cpp): for EVERY trained key,
|guess - lower_bound(key)| <= err, and exact search equals
searchsorted — under any key distribution, duplicate structure, model
pair, or branching factor.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest
from hypothesis import given, settings, strategies as st, HealthCheck

from rmi_tpu.data import RMIDataset
from rmi_tpu.keys import KeyType
from rmi_tpu.lookup import lookup, search
from rmi_tpu.train.api import train


def _keys_strategy():
    """Sorted u64 arrays with adversarial structure: clusters, huge
    gaps, duplicate runs, near-2^64 values, tiny arrays."""
    scalar = st.integers(min_value=0, max_value=2 ** 64 - 1)

    @st.composite
    def arrays(draw):
        style = draw(st.sampled_from(
            ["uniform", "clustered", "dup_heavy", "edges", "tiny"]))
        rng = np.random.default_rng(draw(st.integers(0, 2 ** 31)))
        if style == "tiny":
            n = draw(st.integers(1, 8))
            vals = np.array(sorted(draw(st.lists(scalar, min_size=n,
                                                 max_size=n))),
                            dtype=np.uint64)
            return vals
        n = draw(st.integers(16, 600))
        if style == "uniform":
            vals = rng.integers(0, 2 ** 63, n, dtype=np.uint64)
        elif style == "clustered":
            centers = rng.integers(0, 2 ** 62, max(n // 50, 1),
                                   dtype=np.uint64)
            vals = (centers[rng.integers(0, len(centers), n)]
                    + rng.integers(0, 64, n).astype(np.uint64))
        elif style == "dup_heavy":
            base = rng.integers(0, 2 ** 40, max(n // 10, 1),
                                dtype=np.uint64)
            vals = base[rng.integers(0, len(base), n)]
        else:  # edges
            vals = np.concatenate([
                np.zeros(n // 3, dtype=np.uint64),
                rng.integers(2 ** 63, 2 ** 64 - 1, n - 2 * (n // 3),
                             dtype=np.uint64),
                np.full(n // 3, 2 ** 64 - 1, dtype=np.uint64)])
        return np.sort(vals)

    return arrays()


_SPECS = ["linear,linear", "cubic,linear", "linear_spline,cubic",
          "radix,linear", "bradix,linear_spline", "histogram,linear",
          "normal,loglinear", "radix18,linear", "linear,radix8"]


@pytest.mark.parametrize("pallas_mode", ["0", "1"])
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.data_too_large])
@given(keys=_keys_strategy(),
       spec_i=st.integers(0, len(_SPECS) - 1),
       B=st.sampled_from([1, 4, 32, 256]))
def test_bound_contract_fuzz(pallas_mode, keys, spec_i, B):
    spec = _SPECS[spec_i]
    old = os.environ.get("RMI_PALLAS")
    os.environ["RMI_PALLAS"] = pallas_mode
    try:
        ds = RMIDataset.from_numpy(keys, KeyType.U64)
        r = train(ds, spec, B)
    except ValueError as exc:
        if "equidepth histogram" in str(exc):
            # the reference panics here too: num_bins truncates to 0 and
            # items_per_bin divides by it (histogram.rs:24-27)
            return
        raise
    finally:
        if old is None:
            os.environ.pop("RMI_PALLAS", None)
        else:
            os.environ["RMI_PALLAS"] = old

    g, e = lookup(r, ds.keys)
    lb = jnp.searchsorted(ds.keys, ds.keys, side="left")
    viol = int(jnp.sum(jnp.abs(g - lb) > e))
    assert viol == 0, (spec, B, viol)

    idx = np.asarray(search(r, ds.keys))
    np.testing.assert_array_equal(idx, np.asarray(lb))
