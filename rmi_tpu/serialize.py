"""Artifact serialization + size accounting.

The reference's artifact is three generated C++ files plus binary
parameter blobs under ``rmi_data/`` (codegen.rs:503-558).  Here the
primary artifact is a metadata JSON + the SAME binary parameter layout
(``<ns>_L<i>_PARAMETERS``, little-endian, leaf errors zipped after each
leaf's parameters — codegen.rs:288-316), consumable by:

  * ``load_artifact``       -> device arrays for the JAX serving path,
  * the native C++ runtime  (native/rmi_native.cpp),
  * ``rmi_tpu.codegen``     -> standalone C++ sources with the
                               reference's public API.

``rmi_size`` reproduces codegen.rs:375-394: per-layer parameter bytes
(+8 per leaf when errors are kept, +16 per cachefix spline knot).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from rmi_tpu.keys import KeyType
from rmi_tpu.models import get_model


def _top_param_bytes(rmi) -> int:
    """Byte size of the single top model's parameter list."""
    m = get_model(rmi.top_type)
    if m.bytes_per_model is not None:
        return m.bytes_per_model
    if rmi.top_type == "histogram":
        tp = rmi.top_params
        num_bins = int(np.asarray(tp["count"]))
        radix_len = int(tp["radix_index"].shape[0])
        return 8 * (1 + radix_len + num_bins)
    raise ValueError(f"unknown array-parameter model {rmi.top_type}")


def rmi_size(rmi) -> int:
    """In-memory artifact size in bytes (codegen.rs:375-394)."""
    total = _top_param_bytes(rmi)
    leaf = get_model(rmi.leaf_type)
    total += leaf.bytes_per_model * rmi.branching_factor
    if rmi.leaf_errors is not None:
        total += 8 * rmi.branching_factor
    if rmi.cache_fix is not None:
        total += 16 * len(rmi.cache_fix[1])
    return total


def predicted_rmi_size(models: str, branching_factor: int,
                       with_errors: bool = True) -> int:
    """rmi_size computed from the configuration alone.

    For every model pair the optimizer sweeps, the artifact size is
    shape-determined (codegen.rs:375-394: per-model parameter bytes +8
    per leaf for the error bound) — only histogram tops (data-dependent
    bin count) and cachefix knots escape this, and neither appears in
    the optimizer grid (optimizer.rs:16-57).  Lets the B-generic grid
    sweep skip materializing trained parameters entirely.
    """
    top_type, leaf_type = models.split(",")
    mt = get_model(top_type)
    if mt.bytes_per_model is None:
        raise ValueError(f"{top_type} has data-dependent size; "
                         "train and use rmi_size()")
    ml = get_model(leaf_type)
    total = mt.bytes_per_model + ml.bytes_per_model * branching_factor
    if with_errors:
        total += 8 * branching_factor
    return total


# ---------------------------------------------------------------------------
# binary parameter blobs (little-endian, reference layout)
# ---------------------------------------------------------------------------

def top_layer_blob(rmi) -> Optional[bytes]:
    """Binary blob for layer 0, or None when the layer is header-
    constant in the reference (scalar params, <= 4KB: codegen.rs:57-62).
    """
    t = rmi.top_type
    tp = rmi.top_params
    if t == "histogram":
        parts = [np.uint64(int(np.asarray(tp["count"]))).tobytes(),
                 np.asarray(tp["radix_index"], dtype="<u8").tobytes(),
                 np.asarray(tp["pivots"], dtype="<u8").tobytes()]
        return b"".join(parts)
    if t.startswith("radix") and t != "radix":
        return np.asarray(tp["table"], dtype="<u4").tobytes()
    return None  # scalar-parameter tops are constants


def top_constants(rmi):
    """Scalar top-layer parameters as (c_type, value) pairs for codegen
    and the JSON metadata."""
    t = rmi.top_type
    tp = rmi.top_params
    if t in ("linear", "robust_linear", "linear_spline", "loglinear"):
        w = np.asarray(tp["w"]).reshape(-1)
        return [("double", float(w[0])), ("double", float(w[1]))]
    if t == "cubic":
        w = np.asarray(tp["w"]).reshape(-1)
        return [("double", float(w[i])) for i in range(4)]
    if t in ("normal", "lognormal"):
        w = np.asarray(tp["w"]).reshape(-1)
        return [("double", float(w[i])) for i in range(3)]
    if t == "radix":
        w = np.asarray(tp["w_int"]).reshape(-1)
        return [("uint64_t", int(w[0])), ("uint64_t", int(w[1]))]
    if t == "bradix":
        w = np.asarray(tp["w_int"]).reshape(-1)
        return [("uint64_t", int(w[i])) for i in range(3)]
    return []


def leaf_layer_blob(rmi, include_errors: bool) -> bytes:
    """Layer-1 blob: per leaf, ppm f64 params then (optionally) the
    zipped u64 max error (codegen.rs:288-316).

    Radix-table leaves use per-leaf records [u64 prefix | u32 table |
    (u64 max_err)] — the reference cannot serialize this layer
    correctly (its emitted radix_table bakes ONE prefix into shared
    code, radix.rs:146-160, while prefixes are per-leaf), so this
    layout is a documented correcting divergence.
    """
    if isinstance(rmi.leaf_params, dict):
        tables = np.asarray(rmi.leaf_params["tables"], dtype="<u4")
        prefixes = np.asarray(rmi.leaf_params["prefixes"], dtype="<u8")
        B, size = tables.shape
        inc = include_errors and rmi.leaf_errors is not None
        rec_words = 2 + size + (2 if inc else 0)
        rec = np.zeros((B, rec_words), dtype="<u4")
        rec[:, 0:2] = prefixes[:, None].view("<u4").reshape(B, 2)
        rec[:, 2:2 + size] = tables
        if inc:
            errs = np.asarray(rmi.leaf_errors, dtype="<u8")
            rec[:, 2 + size:] = errs[:, None].view("<u4").reshape(B, 2)
        return rec.tobytes()
    params = np.asarray(rmi.leaf_params, dtype=np.float64)
    B, ppm = params.shape
    if include_errors and rmi.leaf_errors is not None:
        errs = np.asarray(rmi.leaf_errors, dtype=np.uint64)
        rec = np.zeros((B, ppm + 1), dtype="<u8")
        rec[:, :ppm] = params.astype("<f8").view("<u8")
        rec[:, ppm] = errs
        return rec.tobytes()
    return params.astype("<f8").tobytes()


def cachefix_blob(rmi) -> Optional[bytes]:
    """Spline knots as packed (u64 key, u64 value) pairs
    (codegen.rs:407-410, 487-496)."""
    if rmi.cache_fix is None:
        return None
    _, sk, sv = rmi.cache_fix
    rec = np.zeros((len(sk), 2), dtype="<u8")
    rec[:, 0] = sk
    rec[:, 1] = sv
    return rec.tobytes()


# ---------------------------------------------------------------------------
# artifact save/load
# ---------------------------------------------------------------------------

def save_artifact(rmi, namespace: str, data_dir: str = "rmi_data",
                  include_errors: bool = True) -> str:
    """Write binary parameter files + metadata JSON; returns the
    metadata path."""
    os.makedirs(data_dir, exist_ok=True)
    layers = []

    blob0 = top_layer_blob(rmi)
    if blob0 is not None:
        p = os.path.join(data_dir, f"{namespace}_L0_PARAMETERS")
        with open(p, "wb") as f:
            f.write(blob0)
        layers.append({"index": 0, "kind": "array",
                       "file": os.path.basename(p), "bytes": len(blob0)})
    else:
        layers.append({"index": 0, "kind": "constant",
                       "values": [v for (_t, v) in top_constants(rmi)],
                       "c_types": [t for (t, _v) in top_constants(rmi)]})

    inc = include_errors and rmi.leaf_errors is not None
    blob1 = leaf_layer_blob(rmi, inc)
    p1 = os.path.join(data_dir, f"{namespace}_L1_PARAMETERS")
    with open(p1, "wb") as f:
        f.write(blob1)
    ppm = get_model(rmi.leaf_type).ppm
    layer1_meta = {"index": 1, "kind": "array",
                   "file": os.path.basename(p1), "bytes": len(blob1),
                   "params_per_model": ppm + (1 if inc else 0),
                   "zipped_errors": inc}
    if isinstance(rmi.leaf_params, dict):
        layer1_meta["leaf_table_bits"] = int(
            np.log2(np.asarray(rmi.leaf_params["tables"]).shape[1]))
    layers.append(layer1_meta)

    meta = {
        "namespace": namespace,
        "models": rmi.models,
        "norm_offset": rmi.norm_offset,
        "norm_scale": rmi.norm_scale,
        "branching_factor": rmi.branching_factor,
        "key_type": rmi.key_type.value,
        "num_rmi_rows": rmi.num_rmi_rows,
        "num_data_rows": rmi.num_data_rows,
        "rmi_size": rmi_size(rmi) if inc or rmi.leaf_errors is None
        else rmi_size(rmi) - 8 * rmi.branching_factor,
        "build_time_ns": int(rmi.build_time),
        "include_errors": inc,
        "layers": layers,
        "metrics": {
            "model_max_error": rmi.model_max_error,
            "model_max_error_idx": rmi.model_max_error_idx,
            "model_avg_error": rmi.model_avg_error,
            "model_avg_l2_error": rmi.model_avg_l2_error,
            "model_avg_log2_error": rmi.model_avg_log2_error,
            "model_max_log2_error": rmi.model_max_log2_error,
        },
    }
    if rmi.top_type == "histogram":
        meta["histogram"] = {
            "num_bins": int(np.asarray(rmi.top_params["count"])),
            "radix_bits": 20,
        }
    if rmi.top_type.startswith("radix") and rmi.top_type != "radix":
        w = np.asarray(rmi.top_params["w_int"]).reshape(-1)
        meta["radix_table"] = {"prefix": int(w[0]), "bits": int(w[1])}
    if rmi.top_type == "bradix":
        meta["bradix_high"] = bool(int(np.asarray(rmi.top_params["high"])))
    if rmi.cache_fix is not None:
        cfp = os.path.join(data_dir, f"{namespace}_L2_PARAMETERS")
        with open(cfp, "wb") as f:
            f.write(cachefix_blob(rmi))
        meta["cache_fix"] = {
            "line_size": rmi.cache_fix[0],
            "num_points": len(rmi.cache_fix[1]),
            "file": os.path.basename(cfp),
        }

    meta_path = os.path.join(data_dir, f"{namespace}.json")
    with open(meta_path, "w") as f:
        json.dump(meta, f, indent=1)
    return meta_path


def load_artifact(meta_path: str):
    """Rebuild a servable TrainedRMI from a saved artifact."""
    from rmi_tpu.train.api import TrainedRMI

    with open(meta_path) as f:
        meta = json.load(f)
    data_dir = os.path.dirname(meta_path)
    key_type = KeyType(meta["key_type"])
    top_type, leaf_type = meta["models"].split(",")
    B = meta["branching_factor"]
    ppm = get_model(leaf_type).ppm

    layer1 = next(l for l in meta["layers"] if l["index"] == 1)
    if "leaf_table_bits" in layer1:
        # radix-table leaves: [u64 prefix | u32 table | (u64 err)]
        size = 1 << layer1["leaf_table_bits"]
        inc = layer1.get("zipped_errors")
        rec_words = 2 + size + (2 if inc else 0)
        raw4 = np.fromfile(os.path.join(data_dir, layer1["file"]),
                           dtype="<u4").reshape(B, rec_words)
        prefixes = raw4[:, 0:2].copy().view("<u8").reshape(B)
        tables = raw4[:, 2:2 + size].copy()
        leaf_errors = (jnp.asarray(
            raw4[:, 2 + size:].copy().view("<u8").reshape(B))
            if inc else None)
        tb = np.uint64(layer1["leaf_table_bits"])
        shifts = np.where(prefixes + tb > 64, np.uint64(0),
                          np.uint64(64) - prefixes - tb)
        leaf_params = {"tables": jnp.asarray(tables),
                       "prefixes": jnp.asarray(prefixes),
                       "shifts": jnp.asarray(shifts)}
    else:
        raw = np.fromfile(os.path.join(data_dir, layer1["file"]),
                          dtype="<u8")
        stride = layer1["params_per_model"]
        raw = raw.reshape(B, stride)
        leaf_params = jnp.asarray(raw[:, :ppm].copy().view("<f8"))
        leaf_errors = (jnp.asarray(raw[:, ppm].copy())
                       if layer1.get("zipped_errors") else None)

    layer0 = next(l for l in meta["layers"] if l["index"] == 0)
    if layer0["kind"] == "constant":
        vals = layer0["values"]
        if top_type in ("radix", "bradix"):
            tp = {"w_int": jnp.asarray(np.asarray(vals, dtype=np.uint64))}
            if top_type == "bradix":
                tp["high"] = jnp.uint64(1 if meta.get("bradix_high") else 0)
        else:
            tp = {"w": jnp.asarray(np.asarray(vals, dtype=np.float64)
                                   ).reshape(1, -1)}
    else:
        blob = np.fromfile(os.path.join(data_dir, layer0["file"]),
                           dtype=np.uint8)
        if top_type == "histogram":
            num_bins = meta["histogram"]["num_bins"]
            u = blob.view("<u8")
            radix_len = (1 << 20) + 1
            tp = {"count": jnp.uint64(num_bins),
                  "radix_index": jnp.asarray(u[1:1 + radix_len].copy()),
                  "pivots": jnp.asarray(
                      u[1 + radix_len:1 + radix_len + num_bins].copy())}
        else:  # radix hint table
            rt = meta["radix_table"]
            tp = {"w_int": jnp.asarray(
                np.asarray([rt["prefix"], rt["bits"]], dtype=np.uint64)),
                "table": jnp.asarray(blob.view("<u4").copy())}

    cache_fix = None
    if "cache_fix" in meta:
        cf = meta["cache_fix"]
        rec = np.fromfile(os.path.join(data_dir, cf["file"]),
                          dtype="<u8").reshape(-1, 2)
        cache_fix = (cf["line_size"], rec[:, 0].copy(), rec[:, 1].copy())

    m = meta["metrics"]
    from rmi_tpu import convert as _convert
    kmin = meta.get("norm_offset", 0.0)
    s_ = meta.get("norm_scale", 1.0)
    if isinstance(leaf_params, dict):
        dev_leaf = dict(leaf_params)     # domain-free integer params
    else:
        raw_leaf_np = np.asarray(leaf_params)
        dev_leaf = {"w": jnp.asarray(_convert.device_leaf_params(
            leaf_type, raw_leaf_np, kmin, s_))}
    dev_top = {k: jnp.asarray(v) for k, v in _convert.device_top_params(
        top_type, {k: np.asarray(v) for k, v in tp.items()},
        kmin, s_).items()}
    return TrainedRMI(
        models=meta["models"], branching_factor=B, key_type=key_type,
        num_rmi_rows=meta["num_rmi_rows"],
        num_data_rows=meta["num_data_rows"],
        raw_top=tp, raw_leaf=leaf_params, leaf_errors=leaf_errors,
        model_avg_error=m["model_avg_error"],
        model_avg_l2_error=m["model_avg_l2_error"],
        model_avg_log2_error=m["model_avg_log2_error"],
        model_max_error=m["model_max_error"],
        model_max_error_idx=m["model_max_error_idx"],
        model_max_log2_error=m["model_max_log2_error"],
        device_top_params=dev_top, device_leaf_params=dev_leaf,
        norm_offset=kmin, norm_scale=s_,
        build_time=meta["build_time_ns"], cache_fix=cache_fix)


def output_rmi(namespace: str, rmi, data_dir: str = "rmi_data",
               include_errors: bool = True, emit_cpp: bool = True,
               cpp_dir: str = ".") -> str:
    """Full artifact emission (codegen.rs:757-788): binary blobs +
    metadata, plus the generated C++ sources unless disabled."""
    meta_path = save_artifact(rmi, namespace, data_dir,
                              include_errors=include_errors)
    if emit_cpp:
        from rmi_tpu import codegen
        codegen.generate_cpp(namespace, rmi, out_dir=cpp_dir,
                             include_errors=include_errors)
    return meta_path
