"""CLI tests (src/main.rs surface): namespace mode, param-grid mode,
--optimize, --bounded, --stats-file, --dump-ll-errors, --no-code."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from rmi_tpu.data import write_sosd_file


@pytest.fixture()
def dataset(tmp_path, rng):
    keys = np.sort(rng.integers(0, 2**40, size=3000, dtype=np.uint64))
    p = str(tmp_path / "test_3000_uint64")
    write_sosd_file(p, keys)
    return p, keys


def run_cli(args, cwd):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = "/root/repo"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rmi_tpu_jax_cache")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
    r = subprocess.run([sys.executable, "-m", "rmi_tpu", *args],
                       cwd=cwd, env=env, capture_output=True, text=True,
                       timeout=600)
    assert r.returncode == 0, r.stderr
    return r


def test_namespace_mode(tmp_path, dataset):
    p, keys = dataset
    run_cli([p, "myrmi", "linear,linear", "100", "--stats-file",
             "stats.json", "--dump-ll-errors", "--zero-build-time"],
            cwd=str(tmp_path))
    assert (tmp_path / "myrmi.cpp").exists()
    assert (tmp_path / "myrmi.h").exists()
    assert (tmp_path / "myrmi_data.h").exists()
    assert (tmp_path / "rmi_data" / "myrmi_L1_PARAMETERS").exists()
    assert (tmp_path / "rmi_data" / "myrmi.json").exists()
    stats = json.load(open(tmp_path / "stats.json"))
    assert stats["layers"] == "linear,linear"
    assert stats["branching factor"] == 100
    errs = json.load(open(tmp_path / "ll_errors.json"))
    assert len(errs["errors"]) == 100
    hdr = (tmp_path / "myrmi.h").read_text()
    assert "BUILD_TIME_NS = 0" in hdr


def test_no_code(tmp_path, dataset):
    p, _ = dataset
    run_cli([p, "nc", "linear,linear", "50", "--no-code"],
            cwd=str(tmp_path))
    assert not (tmp_path / "nc.cpp").exists()


def test_bounded_mode(tmp_path, dataset):
    p, _ = dataset
    run_cli([p, "bd", "linear,linear", "64", "--bounded", "8"],
            cwd=str(tmp_path))
    assert (tmp_path / "rmi_data" / "bd_L2_PARAMETERS").exists()
    meta = json.load(open(tmp_path / "rmi_data" / "bd.json"))
    assert meta["cache_fix"]["line_size"] == 8


def test_param_grid(tmp_path, dataset):
    p, _ = dataset
    grid = {"configs": [
        {"layers": "linear,linear", "branching factor": 64},
        {"layers": "cubic,linear", "branching factor": 32,
         "namespace": "pg1"},
    ]}
    gf = tmp_path / "grid.json"
    gf.write_text(json.dumps(grid))
    run_cli([p, "--param-grid", str(gf)], cwd=str(tmp_path))
    results = json.load(open(str(gf) + "_results"))["results"]
    assert len(results) == 2
    assert results[0]["layers"] == "linear,linear"
    assert "average log2 error" in results[0]
    assert (tmp_path / "pg1.cpp").exists()


def test_param_grid_sequential_matches_parallel(tmp_path, dataset):
    """--disable-parallel-training forces the one-build-at-a-time path
    (main.rs:241-248 seq branch); metrics must equal the device-pool
    parallel dispatch path exactly."""
    p, _ = dataset
    grid = {"configs": [
        {"layers": "linear,linear", "branching factor": 64},
        {"layers": "linear_spline,linear", "branching factor": 32},
        {"layers": "cubic,linear", "branching factor": 16},
    ]}
    gp = tmp_path / "gridp.json"
    gp.write_text(json.dumps(grid))
    run_cli([p, "--param-grid", str(gp)], cwd=str(tmp_path))
    gs = tmp_path / "grids.json"
    gs.write_text(json.dumps(grid))
    run_cli([p, "--param-grid", str(gs), "--disable-parallel-training"],
            cwd=str(tmp_path))
    rp = json.load(open(str(gp) + "_results"))["results"]
    rs = json.load(open(str(gs) + "_results"))["results"]
    assert len(rp) == len(rs) == 3
    for a, b in zip(rp, rs):
        assert a == b


def test_optimize_mode(tmp_path, dataset):
    p, _ = dataset
    env_extra = {"RMI_OPTIMIZER_PROFILE": "fast"}
    env = dict(os.environ, **env_extra)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = "/root/repo"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rmi_tpu_jax_cache")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
    r = subprocess.run(
        [sys.executable, "-m", "rmi_tpu", p, "--optimize", "opt.json"],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=900)
    assert r.returncode == 0, r.stderr
    out = json.load(open(tmp_path / "opt.json"))
    assert len(out["configs"]) >= 2
    c = out["configs"][0]
    assert set(c) >= {"layers", "branching factor", "namespace", "size",
                      "average log2 error", "binary"}
    assert "AvgLg2" in r.stdout  # optimizer table printed


def test_force_cpu_pins_backend(tmp_path):
    """RMI_FORCE_CPU=1 (config.py) must pin the CPU backend even where
    the container's sitecustomize force-registers a TPU — the
    documented escape hatch for direct builds over chip HBM (the disk
    profile's giant branching factors)."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("PYTHONPATH", None)  # keep any TPU plugin registration live
    env["RMI_FORCE_CPU"] = "1"
    r = subprocess.run(
        [sys.executable, "-c",
         "import rmi_tpu, jax; print('PLATFORM', "
         "jax.devices()[0].platform)"],
        cwd="/root/repo", env=env, capture_output=True, text=True,
        timeout=120)
    assert r.returncode == 0, r.stderr
    assert "PLATFORM cpu" in r.stdout
