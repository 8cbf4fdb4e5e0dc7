"""Opt-in real-SOSD integration harness — the reference's six test
configurations (tests/*/Makefile) run against REAL dataset files.

The reference CI downloads wiki/osm SOSD files and, per config, builds
an RMI and asserts the error-bound contract for EVERY key
(tests/simple_model_wiki/main.cpp:26-41; cachefix variants assert an
absolute diff <= line_size, tests/cache_fix_wiki/main.cpp:36;
max_size_wiki additionally asserts RMI_SIZE <= 50MB,
tests/max_size_wiki/main.cpp:25-28).  This environment has no network,
so these tests are OPT-IN: set

    RMI_SOSD_DIR=/path/with/{wiki_ts_200M_uint64,osm_cellids_200M_uint64}

and they run; otherwise every test skips cleanly.  Tuning knobs:

    RMI_SOSD_SAMPLE=k   check every k-th key (default 1 = every key,
                        exactly like the reference drivers)
    RMI_SOSD_TPU=1      run on the real TPU instead of the CPU mesh
                        (handled in conftest.py, must be set before
                        pytest starts)
    RMI_SOSD_REPORT=f   append one JSON line per config (max_err,
                        avg_log2, size, build seconds) for parity audit

Configs (verbatim from tests/*/Makefile):
  simple_model_wiki   wiki  cubic,linear 262144
  simple_model_osm    osm   robust_linear,linear 262144
  radix_model_wiki    wiki  radix,linear 1024
  cache_fix_wiki      wiki  linear_spline,linear 4194304 --bounded 8
  cache_fix_osm       osm   cubic,linear 786432 --bounded 8
  max_size_wiki       wiki  --max-size 50000000 (RMI_OPTIMIZER_PROFILE=fast)
"""

import json
import os
import time

import numpy as np
import pytest

WIKI = "wiki_ts_200M_uint64"
OSM = "osm_cellids_200M_uint64"

CONFIGS = [
    # (test name, file, models, branch, mode)
    ("simple_model_wiki", WIKI, "cubic,linear", 262144, "plain"),
    ("simple_model_osm", OSM, "robust_linear,linear", 262144, "plain"),
    ("radix_model_wiki", WIKI, "radix,linear", 1024, "plain"),
    ("cache_fix_wiki", WIKI, "linear_spline,linear", 4194304, "bounded"),
    ("cache_fix_osm", OSM, "cubic,linear", 786432, "bounded"),
    ("max_size_wiki", WIKI, None, None, "max_size"),
]

CHUNK = 1 << 22          # keys verified per device dispatch
LINE_SIZE = 8            # --bounded 8 in both cachefix configs
MAX_SIZE = 50_000_000    # tests/max_size_wiki/Makefile


def _sosd_path(fname):
    d = os.environ.get("RMI_SOSD_DIR")
    if not d:
        pytest.skip("RMI_SOSD_DIR not set (opt-in real-SOSD harness)")
    p = os.path.join(d, fname)
    if not os.path.exists(p):
        pytest.skip(f"SOSD file absent: {p}")
    return p


_DATA_CACHE = {}


def _load(fname):
    """Load + cache one SOSD file (they are 1.6GB; load once)."""
    if fname not in _DATA_CACHE:
        from rmi_tpu.data import load_data
        _DATA_CACHE.clear()          # keep at most one file resident
        _DATA_CACHE[fname] = load_data(_sosd_path(fname))
    return _DATA_CACHE[fname]


def _report(name, payload):
    path = os.environ.get("RMI_SOSD_REPORT")
    line = json.dumps({"config": name, **payload})
    print(f"\n[sosd] {line}")
    if path:
        with open(path, "a") as f:
            f.write(line + "\n")


def _verify_every_key(res, ds, bound_fn, sample: int):
    """The reference driver's loop, device-batched: for (every sample-th)
    key, lookup -> assert bound_fn(guess, true_lower_bound, err)."""
    import jax.numpy as jnp
    from rmi_tpu.lookup import lookup

    n = ds.n
    positions = ds.positions          # FixDups lower-bound targets
    checked = 0
    for lo in range(0, n, CHUNK * sample):
        idx = jnp.arange(lo, min(lo + CHUNK * sample, n), sample)
        chunk = ds.keys[idx]
        true_lb = positions[idx].astype(jnp.int64)
        g, e = lookup(res, chunk)
        bad = bound_fn(g.astype(jnp.int64), true_lb, e.astype(jnp.int64))
        nbad = int(jnp.sum(bad))
        if nbad:
            first = int(jnp.argmax(bad))
            raise AssertionError(
                f"bound violated for {nbad} keys in [{lo}, {lo+CHUNK*sample});"
                f" first: key={chunk[first]} guess={g[first]}"
                f" err={e[first]} true={true_lb[first]}")
        checked += int(idx.shape[0])
    return checked


@pytest.mark.parametrize(
    "name,fname,models,branch,mode",
    CONFIGS, ids=[c[0] for c in CONFIGS])
def test_sosd_config(name, fname, models, branch, mode):
    _sosd_path(fname)                 # skip early if absent
    from rmi_tpu.serialize import rmi_size
    from rmi_tpu.train.api import train, train_bounded, train_for_size

    sample = int(os.environ.get("RMI_SOSD_SAMPLE", "1"))
    ds = _load(fname)

    t0 = time.time()
    if mode == "plain":
        res = train(ds, models, branch)
    elif mode == "bounded":
        res = train_bounded(ds, models, branch, LINE_SIZE)
    else:                             # max_size (optimizer-driven)
        os.environ["RMI_OPTIMIZER_PROFILE"] = "fast"
        try:
            res = train_for_size(ds, MAX_SIZE)
        finally:
            del os.environ["RMI_OPTIMIZER_PROFILE"]
    build_s = time.time() - t0

    size = rmi_size(res)
    if mode == "max_size":
        assert size <= MAX_SIZE, (
            f"RMI was larger than 50MB: {size}")  # max_size_wiki/main.cpp:25

    if mode == "bounded":
        # |lookup(key) - true_index| <= 8 (cache_fix_wiki/main.cpp:36);
        # cachefix lookups need the ORIGINAL keys for the quantized lerp
        def bound(g, t, e):
            return abs(g - t) > LINE_SIZE
    else:
        def bound(g, t, e):
            return abs(g - t) > e

    checked = _verify_every_key(res, ds, bound, sample)

    _report(name, {
        "models": res.models,
        "branching_factor": res.branching_factor,
        "max_err": int(res.model_max_error),
        "avg_log2": float(res.model_avg_log2_error),
        "size_bytes": int(size),
        "build_s": round(build_s, 3),
        "keys_checked": checked,
        "sample": sample,
    })


def test_sosd_harness_smoke(tmp_path, monkeypatch, rng):
    """The harness itself (loader, every-key verifier, report) on a
    small synthetic file — runs in CI where real SOSD files are absent."""
    from rmi_tpu.data import synthetic_dataset, write_sosd_file
    from rmi_tpu.keys import KeyType
    from rmi_tpu.train.api import train

    keys = synthetic_dataset("wiki", 50_000, KeyType.U64,
                             seed=int(rng.integers(1 << 30)))
    path = tmp_path / WIKI
    write_sosd_file(str(path), keys)
    monkeypatch.setenv("RMI_SOSD_DIR", str(tmp_path))
    report = tmp_path / "report.jsonl"
    monkeypatch.setenv("RMI_SOSD_REPORT", str(report))
    _DATA_CACHE.clear()

    ds = _load(WIKI)
    assert ds.n == 50_000 and ds.key_type is KeyType.U64
    res = train(ds, "cubic,linear", 256)
    checked = _verify_every_key(
        res, ds, lambda g, t, e: abs(g - t) > e, sample=1)
    assert checked == ds.n
    _report("smoke", {"max_err": int(res.model_max_error)})
    assert json.loads(report.read_text())["config"] == "smoke"
    _DATA_CACHE.clear()
