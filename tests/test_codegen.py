"""Codegen integration tests: emit C++ sources, compile them with a
driver shaped like the reference's integration harness
(tests/simple_model_wiki/main.cpp), and verify the error-bound
contract for EVERY key plus exact parity with the JAX serving path."""

import os
import subprocess
import textwrap

import numpy as np
import pytest

from rmi_tpu.data import RMIDataset, write_sosd_file
from rmi_tpu.train.api import train, train_bounded
from rmi_tpu.serialize import save_artifact, rmi_size
from rmi_tpu.codegen import generate_cpp
from rmi_tpu.lookup import lookup


DRIVER = textwrap.dedent("""
    #include "{ns}.h"
    #include <cstdio>
    #include <cstdlib>
    #include <cstring>
    #include <cstdint>
    #include <vector>

    int main(int argc, char** argv) {{
      // argv: data_dir keys_file out_file
      if (!{ns}::load(argv[1])) {{ printf("LOAD FAIL\\n"); return 2; }}
      FILE* f = fopen(argv[2], "rb");
      uint64_t n; fread(&n, 8, 1, f);
      std::vector<{key_c}> keys(n);
      fread(keys.data(), sizeof({key_c}), n, f);
      fclose(f);
      FILE* out = fopen(argv[3], "wb");
      for (uint64_t i = 0; i < n; i++) {{
        size_t err;
        uint64_t guess = {ns}::lookup(keys[i], &err);
        uint64_t e64 = err;
        fwrite(&guess, 8, 1, out);
        fwrite(&e64, 8, 1, out);
      }}
      fclose(out);
      {ns}::cleanup();
      printf("RMI_SIZE=%zu\\n", {ns}::RMI_SIZE);
      return 0;
    }}
""")


def compile_and_run(tmp_path, res, ns, keys, include_errors=True):
    data_dir = str(tmp_path / "rmi_data")
    save_artifact(res, ns, data_dir=data_dir, include_errors=include_errors)
    generate_cpp(ns, res, out_dir=str(tmp_path),
                 include_errors=include_errors)

    key_c = "uint64_t" if res.cache_fix is not None else res.key_type.c_type
    with open(tmp_path / "driver.cpp", "w") as f:
        f.write(DRIVER.format(ns=ns, key_c=key_c))

    exe = str(tmp_path / "driver")
    subprocess.run(
        ["g++", "-O2", "-std=c++17", "-o", exe,
         str(tmp_path / "driver.cpp"), str(tmp_path / f"{ns}.cpp"),
         "-I", str(tmp_path)],
        check=True, capture_output=True)

    kf = str(tmp_path / "keys.bin")
    write_sosd_file(kf, keys)
    of = str(tmp_path / "out.bin")
    r = subprocess.run([exe, data_dir, kf, of], check=True,
                       capture_output=True, text=True)
    raw = np.fromfile(of, dtype="<u8").reshape(-1, 2)
    size_line = [l for l in r.stdout.splitlines() if "RMI_SIZE" in l][0]
    return raw[:, 0], raw[:, 1], int(size_line.split("=")[1])


@pytest.mark.parametrize("spec,B", [
    ("linear,linear", 32),
    ("cubic,linear", 64),
    ("radix,linear", 32),
    ("bradix,linear", 32),
    ("histogram,linear", 16),
    ("radix8,linear", 16),
    ("loglinear,cubic", 16),
    ("normal,linear_spline", 16),
])
def test_generated_cpp_matches_jax(tmp_path, rng, spec, B):
    keys = np.sort(rng.integers(0, 2**40, size=2500, dtype=np.uint64))
    ds = RMIDataset.from_numpy(keys)
    res = train(ds, spec, B)
    ns = "g" + spec.replace(",", "_").replace("robust_", "")
    cg, ce, csize = compile_and_run(tmp_path, res, ns, keys)

    jg, je = lookup(res, ds.keys)
    np.testing.assert_array_equal(cg.astype(np.int64), np.asarray(jg))
    np.testing.assert_array_equal(ce.astype(np.int64), np.asarray(je))
    assert csize == rmi_size(res)

    # reference driver contract: |guess - lower_bound| <= err for all keys
    lb = np.searchsorted(keys, keys)
    assert (np.abs(cg.astype(np.int64) - lb) <= ce.astype(np.int64)).all()


def test_generated_cpp_cachefix(tmp_path, rng):
    keys = np.sort(rng.integers(10, 2**40, size=4000, dtype=np.uint64))
    ds = RMIDataset.from_numpy(keys)
    res = train_bounded(ds, "linear_spline,linear", 64, 8)
    cg, ce, csize = compile_and_run(tmp_path, res, "gcf", keys)
    jg, je = lookup(res, ds.keys)
    np.testing.assert_array_equal(cg.astype(np.int64), np.asarray(jg))
    lb = np.searchsorted(keys, keys)
    assert (np.abs(cg.astype(np.int64) - lb) <= 8).all()  # cache_fix_wiki/main.cpp:36


def test_generated_cpp_u32(tmp_path, rng):
    keys = np.sort(rng.integers(0, 2**31, size=2000).astype(np.uint32))
    ds = RMIDataset.from_numpy(keys)
    res = train(ds, "linear,linear", 32)
    cg, ce, _ = compile_and_run(tmp_path, res, "gu32", keys)
    jg, je = lookup(res, ds.keys)
    np.testing.assert_array_equal(cg.astype(np.int64), np.asarray(jg))


def test_no_errors_signature(tmp_path, rng):
    """--no-errors changes the lookup signature (README.md:66-70)."""
    keys = np.sort(rng.integers(0, 2**40, size=1000, dtype=np.uint64))
    ds = RMIDataset.from_numpy(keys)
    res = train(ds, "linear,linear", 16)
    generate_cpp("gne", res, out_dir=str(tmp_path), include_errors=False)
    hdr = (tmp_path / "gne.h").read_text()
    assert "uint64_t lookup(uint64_t key);" in hdr
    assert "size_t* err" not in hdr
