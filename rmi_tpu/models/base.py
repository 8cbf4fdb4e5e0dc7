"""Model registry: the contract every RMI layer model satisfies.

Vectorized counterpart of the reference's ``Model`` trait
(models/mod.rs:730-764).  Instead of one trained object per leaf, a
model here is a *definition* whose fit functions produce parameter
arrays for ALL leaves at once ([B, ppm] for scalar-parameter models),
and whose predict functions evaluate batched keys — the form XLA/TPU
wants.

predict_to_int semantics (models/mod.rs:735-737): max(0, floor(f)) as
u64, with NaN mapping to 0 (Rust's f64::max(0.0, NaN) == 0.0).  Since
every consumer immediately clamps to some bound, ``predict_clamped``
fuses floor/max/min/NaN-handling and returns int64.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Callable, Dict, Optional

import jax.numpy as jnp


class Restriction(enum.Enum):
    # models/mod.rs:724-728
    NONE = "none"
    MUST_BE_TOP = "top"
    MUST_BE_BOTTOM = "bottom"


def predict_clamped(pred_f: jnp.ndarray, bound) -> jnp.ndarray:
    """min(bound, predict_to_int(pred)) as int64.

    Implements `u64::min(bound, max(0, floor(f)) as u64)` including the
    NaN->0 rule; valid whenever bound < 2^53 (branching factors are
    <= 2^24 and row counts < 2^40 in practice).
    """
    p = jnp.floor(pred_f)
    p = jnp.where(jnp.isnan(p), 0.0, jnp.clip(p, 0.0, jnp.float64(bound)))
    return p.astype(jnp.int64)


def clamp_int(pred_i: jnp.ndarray, bound) -> jnp.ndarray:
    """min(bound, pred) for integer-output models (u64 domain)."""
    b = jnp.asarray(bound, dtype=pred_i.dtype)
    return jnp.minimum(pred_i, b).astype(jnp.int64)


@dataclasses.dataclass(frozen=True)
class ModelDef:
    """One RMI layer model type.

    fit_top(keys, key_type, ys_f, ep_ys_f, ys_last_f, n, B) -> params
        Train a single top model.  ``ys_f`` are the FixDups positions
        scaled by B/n and truncated (models/mod.rs:238-250); ``ep_ys_f``
        the raw-index scaled positions used for container endpoints
        (RMITrainingData::get bypasses FixDups, models/mod.rs:268-274).
    fit_leaves(xf, yf, spans, keys_f64_sorted) -> params [B, ...]
        Batched per-leaf fit over augmented spans (leaf-capable only).
    predict_f(params, leaf_idx_or_None, keys, key_type) -> f64 preds
        ``leaf_idx`` selects per-leaf parameter rows (None => top /
        row 0).
    constant_params(value_f) -> row
        set_to_constant_model (models/mod.rs:761-763); None if the
        model cannot be constant-patched (normal/lognormal/loglinear).
    """

    name: str
    ppm: int                      # parameters per model (scalar models)
    restriction: Restriction
    needs_bounds_check: bool
    output_int: bool              # int-output (radix family / histogram)
    leaf_capable: bool
    fit_top: Callable
    fit_leaves: Optional[Callable]
    predict: Callable
    constant_params: Optional[Callable]
    bytes_per_model: Optional[int]  # None => data-dependent (arrays)
    function_name: str            # codegen function name (e.g. "linear")
    # key domain the float fit/predict expects: 'affine' models run in
    # the normalized x' = (x-kmin)*s domain (see rmi_tpu.convert);
    # 'raw' models (lognormal: log is not affine-covariant) take raw
    # key floats.  Int-output models always take raw keys.
    input_domain: str = "affine"


REGISTRY: Dict[str, ModelDef] = {}


def register(model: ModelDef) -> ModelDef:
    REGISTRY[model.name] = model
    return model


def get_model(name: str) -> ModelDef:
    if name not in REGISTRY:
        raise ValueError(f"Unknown model type: {name}")  # train/mod.rs:53
    return REGISTRY[name]


def validate_spec(spec_list) -> None:
    """Layer-restriction validation (train/mod.rs:59-85)."""
    num_layers = len(spec_list)
    for idx, name in enumerate(spec_list):
        m = get_model(name)
        if m.restriction is Restriction.MUST_BE_TOP and idx != 0:
            raise ValueError(
                f"if used, model type {name} must be the root model")
        if m.restriction is Restriction.MUST_BE_BOTTOM and idx != num_layers - 1:
            raise ValueError(
                f"if used, model type {name} must be the bottommost model")
        if idx == num_layers - 1 and num_layers > 1 and not m.leaf_capable:
            raise NotImplementedError(
                f"model type {name} is not supported as a leaf layer in "
                f"rmi_tpu (the reference restricts it to the top in "
                f"practice; see optimizer.rs:15-41)")
