"""Radix hint tables as LEAF layers (radix.rs:83-170 with restriction
None, radix.rs:167-169).

The reference permits RadixTable at any layer but can only emit correct
code for it at the top (its shared emitted function bakes one prefix,
radix.rs:146-160, while leaf prefixes differ per container); rmi_tpu
supports the full capability with per-leaf prefixes and documents the
artifact-layout divergence.
"""

import json
import os
import subprocess

import numpy as np
import jax.numpy as jnp
import pytest

from rmi_tpu.data import RMIDataset
from rmi_tpu.keys import KeyType
from rmi_tpu.lookup import lookup, search
from rmi_tpu.train.api import train
from rmi_tpu.serialize import output_rmi, load_artifact


def _dataset(rng, n=6000):
    gaps = rng.exponential(size=n)
    csum = np.cumsum(gaps)
    keys = (csum * (2.0 ** 51 / csum[-1])).astype(np.uint64)
    return RMIDataset.from_numpy(keys, KeyType.U64)


@pytest.mark.parametrize("top", ["cubic", "linear", "radix"])
def test_radix_leaf_bound_contract(rng, top):
    ds = _dataset(rng)
    r = train(ds, f"{top},radix8", 32)
    g, e = lookup(r, ds.keys)
    lb = jnp.searchsorted(ds.keys, ds.keys, side="left")
    assert int(jnp.sum(jnp.abs(g - lb) > e)) == 0
    assert int(jnp.sum(search(r, ds.keys) != lb)) == 0
    # random queries
    q = rng.integers(0, 2 ** 52, 4000).astype(np.uint64)
    idx = np.asarray(search(r, jnp.asarray(q)))
    np.testing.assert_array_equal(
        idx, np.searchsorted(np.asarray(ds.keys), q, side="left"))


def test_radix_leaf_sequential_oracle(rng):
    """Per-leaf tables match a literal transcription of RadixTable::new
    run per leaf container (radix.rs:90-120)."""
    ds = _dataset(rng, n=3000)
    B = 16
    r = train(ds, "linear,radix8", B)
    keys = np.asarray(ds.keys, dtype=np.uint64)
    n = len(keys)

    # recompute assignments like the trainer
    from rmi_tpu.train.two_layer import (predict_top_assignment,
                                         norm_constants)
    from rmi_tpu.models import get_model
    import rmi_tpu.keys as keymod
    kmin, s = norm_constants(ds.keys, ds.key_type)
    xraw = keymod.as_float(ds.keys)
    xn = (xraw - kmin) * s
    t = np.asarray(predict_top_assignment(
        get_model("linear"), r.device_top_params, ds.keys, xn, xraw,
        B - 1))

    yfix = np.zeros(n, dtype=np.uint64)
    for i in range(1, n):
        yfix[i] = yfix[i - 1] if keys[i] == keys[i - 1] else i

    tables = np.asarray(r.leaf_params["tables"])
    prefixes = np.asarray(r.leaf_params["prefixes"])
    bits = 8
    for j in range(B):
        sel = np.where(t == j)[0]
        if len(sel) == 0:
            exp = np.full(1 << bits, 1 << bits, dtype=np.uint32)
            exp[0] = 0
            np.testing.assert_array_equal(tables[j], exp)
            continue
        lo, hi = sel[0], sel[-1]
        # augmented container (two_layer.rs:52-82)
        lo = max(lo - 1, 0)
        hi = min(hi + 1, n - 1)
        ck = keys[lo:hi + 1]
        cy = yfix[lo:hi + 1]
        # common_prefix_size (utils.rs:23-36)
        ones = np.uint64(0)
        zeros = np.uint64(0)
        for k in ck:
            ones |= k
            zeros |= ~k
        constant = ~(np.uint64(ones & zeros))
        prefix = 0
        m = np.uint64(1) << np.uint64(63)
        while m and (constant & m):
            prefix += 1
            m >>= np.uint64(1)
        assert prefixes[j] == prefix

        # RadixTable::new loop
        table = np.zeros(1 << bits, dtype=np.uint32)
        last = 0
        nb = 0 if prefix + bits > 64 else 64 - prefix - bits
        for k, y in zip(ck, cy):
            cur = int(((int(k) << prefix) % (1 << 64)) >> prefix) >> nb
            if cur == last:
                continue
            table[cur] = np.uint32(y)
            for i in range(last + 1, cur):
                table[i] = np.uint32(y)
            last = cur
        for i in range(last + 1, 1 << bits):
            table[i] = np.uint32(1 << bits)
        np.testing.assert_array_equal(tables[j], table)


def test_radix_leaf_artifact_roundtrip(rng, tmp_path):
    ds = _dataset(rng)
    r = train(ds, "cubic,radix8", 16)
    meta = output_rmi("rtl", r, data_dir=str(tmp_path / "rmi_data"),
                      include_errors=True, emit_cpp=False)
    r2 = load_artifact(meta)
    np.testing.assert_array_equal(np.asarray(r.leaf_params["tables"]),
                                  np.asarray(r2.leaf_params["tables"]))
    np.testing.assert_array_equal(np.asarray(r.leaf_errors),
                                  np.asarray(r2.leaf_errors))
    r2.keys = ds.keys
    r2.num_rmi_rows = r.num_rmi_rows
    g1, e1 = lookup(r, ds.keys)
    g2, e2 = lookup(r2, ds.keys)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


def test_radix_leaf_codegen_compiles(rng, tmp_path):
    ds = _dataset(rng, n=2000)
    r = train(ds, "linear,radix8", 8)
    output_rmi("rtc", r, data_dir=str(tmp_path / "rmi_data"),
               include_errors=True, emit_cpp=True,
               cpp_dir=str(tmp_path))
    keys = np.asarray(ds.keys, dtype=np.uint64)
    lb = np.searchsorted(keys, keys, side="left")
    g, e = lookup(r, ds.keys)

    driver = tmp_path / "main.cpp"
    driver.write_text(f"""
#include "rtc.h"
#include <cstdio>
#include <cstdlib>
#include <cstdint>
int main() {{
  if (!rtc::load("rmi_data")) {{ printf("load fail\\n"); return 2; }}
  FILE* f = fopen("queries.bin", "rb");
  uint64_t n; fread(&n, 8, 1, f);
  for (uint64_t i = 0; i < n; i++) {{
    uint64_t k, eg, ee; fread(&k, 8, 1, f);
    fread(&eg, 8, 1, f); fread(&ee, 8, 1, f);
    size_t err;
    uint64_t g = rtc::lookup(k, &err);
    if (g != eg || err != ee) {{
      printf("mismatch at %llu: %llu/%zu vs %llu/%llu\\n",
             (unsigned long long)i, (unsigned long long)g, err,
             (unsigned long long)eg, (unsigned long long)ee);
      return 1;
    }}
  }}
  rtc::cleanup();
  printf("OK\\n");
  return 0;
}}
""")
    with open(tmp_path / "queries.bin", "wb") as f:
        f.write(np.uint64(len(keys)).tobytes())
        rec = np.stack([keys, np.asarray(g, np.uint64),
                        np.asarray(e, np.uint64)], axis=1)
        f.write(rec.astype("<u8").tobytes())
    subprocess.run(["g++", "-O2", "-std=c++17", "rtc.cpp", "main.cpp",
                    "-o", "drv"], cwd=tmp_path, check=True)
    out = subprocess.run(["./drv"], cwd=tmp_path, capture_output=True,
                         text=True)
    assert out.returncode == 0, out.stdout + out.stderr


def test_radix_leaf_native_runtime(rng, tmp_path):
    from rmi_tpu import native
    if not native.available():
        pytest.skip("native library not built")
    ds = _dataset(rng, n=3000)
    r = train(ds, "linear,radix8", 16)
    meta = output_rmi("rtn", r, data_dir=str(tmp_path / "rmi_data"),
                      include_errors=True, emit_cpp=False)
    srv = native.NativeRMI(meta)
    keys = np.asarray(ds.keys, dtype=np.uint64)
    g_n, e_n = srv.lookup(keys)
    g_j, e_j = lookup(r, ds.keys)
    np.testing.assert_array_equal(g_n, np.asarray(g_j, np.uint64))
    np.testing.assert_array_equal(e_n, np.asarray(e_j, np.uint64))
    srv.close()
