"""Pallas (df64) build/serve mode: bound contract + consistency.

On CPU the Mosaic kernels run in interpret mode (numerics identical to
the compiled kernels' op sequence); RMI_PALLAS=1 forces the df64 path.
The invariants checked here are the ones that must hold on ANY
backend:

  * the every-key bound contract |guess - lower_bound| <= err under
    df64 serving (the reference's tests/*/main.cpp property);
  * exact search equals searchsorted for trained keys and random
    queries;
  * df64 error metrics agree with the f64 oracle path closely (the
    arithmetics differ below ~2^-45 relative — floor flips move
    individual leaf errors by at most 1);
  * the per-block leaf-span guard falls back to the XLA sweep on
    adversarially skewed assignments.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from rmi_tpu.data import RMIDataset
from rmi_tpu.keys import KeyType
from rmi_tpu.lookup import lookup, search


def _train_mode(keys_np, spec, branch, mode):
    """Train with RMI_PALLAS forced on (df64) or off (xla oracle)."""
    from rmi_tpu.train.api import train
    old = os.environ.get("RMI_PALLAS")
    os.environ["RMI_PALLAS"] = mode
    try:
        ds = RMIDataset.from_numpy(keys_np, KeyType.U64)
        return train(ds, spec, branch), ds
    finally:
        if old is None:
            del os.environ["RMI_PALLAS"]
        else:
            os.environ["RMI_PALLAS"] = old


def books_like(rng, n):
    gaps = rng.exponential(size=n)
    csum = np.cumsum(gaps)
    return (csum * (2.0 ** 55 / csum[-1])).astype(np.uint64)


@pytest.mark.parametrize("spec", ["linear,linear", "cubic,linear",
                                  "cubic,cubic", "linear,loglinear",
                                  "radix,linear_spline", "cubic,normal",
                                  "cubic,lognormal", "normal,normal",
                                  "linear,robust_linear"])
def test_df64_bound_contract(rng, spec):
    keys = books_like(rng, 20_000)
    r, ds = _train_mode(keys, spec, 64, "1")
    assert r.eval_mode == "df64"

    g, e = lookup(r, ds.keys)
    lb = jnp.searchsorted(ds.keys, ds.keys, side="left")
    assert int(jnp.sum(jnp.abs(g - lb) > e)) == 0

    idx = search(r, ds.keys)
    assert int(jnp.sum(idx != lb)) == 0

    q = rng.integers(0, 2 ** 56, 5_000).astype(np.uint64)
    idx2 = np.asarray(search(r, jnp.asarray(q)))
    true2 = np.searchsorted(keys, q, side="left")
    np.testing.assert_array_equal(idx2, true2)


def test_df64_metrics_near_oracle(rng):
    keys = books_like(rng, 30_000)
    r_df, _ = _train_mode(keys, "cubic,linear", 128, "1")
    r_xla, _ = _train_mode(keys, "cubic,linear", 128, "0")
    assert r_df.eval_mode == "df64" and r_xla.eval_mode == "xla"
    # float-float vs f64: individual leaf errors can differ by 1 where
    # floor() lands within ~2^-45 of an integer; aggregates must agree
    # tightly.
    assert abs(r_df.model_avg_log2_error
               - r_xla.model_avg_log2_error) < 1e-3
    assert abs(int(r_df.model_max_error) - int(r_xla.model_max_error)) <= 1
    e_df = np.asarray(r_df.leaf_errors, dtype=np.int64)
    e_xla = np.asarray(r_xla.leaf_errors, dtype=np.int64)
    assert np.max(np.abs(e_df - e_xla)) <= 1


def test_df64_duplicates_and_empties(rng):
    # heavy duplicates + empty leaves stress FixDups semantics and the
    # constant patching under the kernel path
    base = np.sort(rng.integers(0, 2 ** 40, 500).astype(np.uint64))
    keys = np.sort(np.repeat(base, rng.integers(1, 40, size=500)))
    r, ds = _train_mode(keys, "linear,linear", 128, "1")
    assert r.eval_mode == "df64"
    g, e = lookup(r, ds.keys)
    lb = jnp.searchsorted(ds.keys, ds.keys, side="left")
    assert int(jnp.sum(jnp.abs(g - lb) > e)) == 0
    assert int(jnp.sum(search(r, ds.keys) != lb)) == 0


def test_span_guard_falls_back(rng):
    # B far larger than n concentrates thousands of leaves into one
    # 2048-key block only if assignments jump; craft a skewed top by
    # using a tiny dataset with a huge branching factor: the top model
    # spreads ~n keys over B >> n leaves, so consecutive keys span
    # leaf ids far apart and the kernel window cannot cover a block.
    keys = books_like(rng, 4_096)
    r, ds = _train_mode(keys, "linear,linear", 65_536, "1")
    # Regardless of which path was taken, the contract must hold...
    g, e = lookup(r, ds.keys)
    lb = jnp.searchsorted(ds.keys, ds.keys, side="left")
    assert int(jnp.sum(jnp.abs(g - lb) > e)) == 0
    # ...and the span guard must have forced the XLA fallback.
    assert r.eval_mode == "xla"


def test_unsupported_leaf_stays_xla(rng):
    # int-output radix-table leaves have no df64 eval; everything else
    # in the zoo is kernel-covered (sweep_kernel.PALLAS_SWEEP_LEAVES)
    keys = books_like(rng, 8_000)
    r, _ = _train_mode(keys, "cubic,radix8", 32, "1")
    assert r.eval_mode == "xla"


@pytest.mark.parametrize("spec,masked", [
    ("cubic,normal", False), ("cubic,lognormal", False),
    ("linear,loglinear", True)])
def test_df64_transcendental_metrics_near_oracle(rng, spec, masked):
    """normal/lognormal/loglinear leaves: the df64 logistic-phi / exp1
    pipeline (six squarings + two divisions, ~2^-44 accumulated) may
    move floor()s by an ulp more often than the polynomial leaves —
    leaf errors within 2.  phi is bounded in [0, 1] so normal leaves
    compare strictly; raw exp1 (loglinear) can exceed f32 range
    (f64 reaches 1e308, f32 pairs 3.4e38), where df64 clamps to n —
    errors stay self-consistent with serving (the contract test above)
    but not oracle-comparable, so those leaves are masked out."""
    keys = books_like(rng, 30_000)
    r_df, _ = _train_mode(keys, spec, 128, "1")
    r_xla, _ = _train_mode(keys, spec, 128, "0")
    assert r_df.eval_mode == "df64" and r_xla.eval_mode == "xla"
    e_df = np.asarray(r_df.leaf_errors, dtype=np.int64)
    e_xla = np.asarray(r_xla.leaf_errors, dtype=np.int64)
    ok = e_xla < (1 << 12) if masked else np.ones_like(e_xla, bool)
    assert np.mean(ok) > 0.25
    assert np.max(np.abs(e_df[ok] - e_xla[ok])) <= 2


def test_l1_interior_chunked_matches_oneshot(rng):
    """The chunked cubic-vs-linear L1 sweep (models/cubic.py, the
    200M-scale memory path) must reproduce the one-shot
    window_select + range_sum interior sums."""
    import jax.numpy as jnp
    from rmi_tpu.models.cubic import _l1_interior_chunked
    from rmi_tpu.ops.select_kernel import window_select
    from rmi_tpu.utils import segments as seg

    n, B = 3 * 4096 + 517, 64           # non-multiple of every chunk
    t = np.sort(rng.integers(0, B, size=n).astype(np.int32))
    xf = jnp.asarray(np.sort(rng.uniform(0.0, 1.0, size=n)))
    yf = jnp.asarray(np.arange(n, dtype=np.float64))
    chans = [jnp.asarray(rng.uniform(-2.0, 2.0, size=B)) for _ in range(4)]
    chans += [jnp.asarray(rng.uniform(-2.0, 2.0, size=B)) for _ in range(2)]
    t = jnp.asarray(t)

    sel, _ = window_select(t, chans, B=B, span=B)
    ca, cb, cc, cd, la, lb = sel
    pred_c = ((ca * xf + cb) * xf + cc) * xf + cd
    pred_l = lb * xf + la
    import jax
    want_c = jax.ops.segment_sum(jnp.abs(pred_c - yf), t, num_segments=B)
    want_l = jax.ops.segment_sum(jnp.abs(pred_l - yf), t, num_segments=B)

    got_c, got_l, ovf = _l1_interior_chunked(
        t, xf, yf, chans, B=B, span=B, chunk=4096)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(got_l), np.asarray(want_l),
                               rtol=1e-12)
    assert int(ovf) == 0
