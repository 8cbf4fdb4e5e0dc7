"""Training facade: train / train_for_size / train_bounded and the
TrainedRMI result (train/mod.rs:18-184)."""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from rmi_tpu import convert
from rmi_tpu.data import RMIDataset
from rmi_tpu.keys import KeyType
from rmi_tpu.train import two_layer


@dataclasses.dataclass
class TrainedRMI:
    """Result of a training run (train/mod.rs:18-33).

    Two parameter views are kept:
      * ``top_params`` / ``leaf_params`` — RAW key-domain parameters in
        the reference's layout (what the artifact, generated C++ and
        native runtime consume).  These are computed LAZILY on first
        access: the device->host transfer + exact f64 conversion is an
        artifact-layout concern (the reference does it at codegen
        time, codegen.rs:450-558) and costs ~0.3-0.5s over tunneled
        devices — serving never needs it.
      * ``device_top_params`` / ``device_leaf_params`` — normalized
        key-domain device arrays used by the JAX serving path, with
        ``norm_offset`` / ``norm_scale`` defining
        x' = (x - offset) * scale.
    """

    models: str
    branching_factor: int
    key_type: KeyType
    num_rmi_rows: int
    num_data_rows: int
    raw_top: Optional[Dict[str, Any]]
    raw_leaf: Any                             # [B, ppm] raw f64
    leaf_errors: Optional[jax.Array]
    model_avg_error: float
    model_avg_l2_error: float
    model_avg_log2_error: float
    model_max_error: int
    model_max_error_idx: int
    model_max_log2_error: float
    device_top_params: Optional[Dict[str, jax.Array]] = None
    device_leaf_params: Optional[Dict[str, jax.Array]] = None
    norm_offset: float = 0.0
    norm_scale: float = 1.0
    build_time: int = 0                       # ns
    cache_fix: Optional[Tuple[int, np.ndarray, np.ndarray]] = None
    # device copy of what the RMI serves over (for lookup/search):
    keys: Optional[jax.Array] = None
    # leaf-eval arithmetic the error bounds were computed under:
    # "xla" = XLA f64 (true f64 on CPU, emulated on TPU), "df64" =
    # explicit float-float Pallas kernels (ops/).  Serving MUST eval
    # leaves with the same arithmetic or the bound contract can break
    # by one at floor() boundaries.
    eval_mode: str = "xla"
    # deferred raw-parameter conversion: () -> (raw_top, raw_leaf)
    raw_thunk: Optional[Any] = None

    @property
    def top_type(self) -> str:
        return self.models.split(",")[0]

    @property
    def leaf_type(self) -> str:
        return self.models.split(",")[-1]

    def _materialize_raw(self):
        if self.raw_thunk is not None:
            self.raw_top, self.raw_leaf = self.raw_thunk()
            self.raw_thunk = None

    @property
    def top_params(self) -> Dict[str, Any]:
        self._materialize_raw()
        return self.raw_top

    @property
    def leaf_params(self):
        self._materialize_raw()
        return self.raw_leaf


def _fetch_host(tree):
    """The single host-synchronizing transfer of a build.  A named
    function so tests can observe WHEN syncs happen (the parallel
    sweep's no-per-build-sync contract, parallel/sweep.py)."""
    return jax.device_get(tree)


def _norm_cached(data: RMIDataset):
    """norm_constants once per dataset object: keys[0]/keys[-1] are
    1-element host transfers (~30ms each over tunneled devices) that
    must not run once per sweep config."""
    cached = getattr(data, "_norm_cache", None)
    if cached is None:
        cached = two_layer.norm_constants(data.keys, data.key_type)
        try:
            data._norm_cache = cached
        except AttributeError:
            pass
    return cached


@dataclasses.dataclass
class PendingRMI:
    """A dispatched (not yet synchronized) build.

    ``result()`` performs the single host transfer and constructs the
    TrainedRMI; until then the host never blocks, so many PendingRMIs
    across a device pool genuinely overlap (the rayon-par_iter
    analogue, optimizer.rs:220-231).  ``prefetched`` lets a caller
    batch many builds' (metrics, ovf) pairs into ONE device_get."""

    models: str
    branching_factor: int
    data: RMIDataset
    start_ns: int
    metrics_dev: Any
    ovf_dev: Any
    _finish: Any
    _result: Optional[TrainedRMI] = None

    def fetchable(self):
        """(metrics, ovf) device tree for a batched host transfer."""
        ovf = self.ovf_dev if self.ovf_dev is not None else 0
        return (self.metrics_dev, ovf)

    def result(self, prefetched=None) -> TrainedRMI:
        if self._result is not None:
            return self._result
        m, ovf = (_fetch_host(self.fetchable()) if prefetched is None
                  else prefetched)
        out, retried = self._finish(int(ovf))
        if retried:
            m = _fetch_host(out[5])
        build_time = time.monotonic_ns() - self.start_ns
        self._result = _build_trained(self.data, self.models,
                                      self.branching_factor, out, m,
                                      build_time)
        return self._result


def train_async(data: RMIDataset, model_spec: str,
                branch_factor: int) -> PendingRMI:
    """Dispatch a build without blocking the host (see PendingRMI).

    The staged/profiled build paths (RMI_BUILD_STAGED / RMI_PROFILE_BUILD)
    synchronize internally by design; under them this degrades to a
    resolved pending."""
    import os
    start = time.monotonic_ns()
    layers = model_spec.split(",")
    if len(layers) != 2:
        raise ValueError(
            "rmi_tpu supports exactly two model layers (the reference's "
            "multi-layer trainer is disabled upstream, train/mod.rs:125)")
    top_type, leaf_type = layers

    if (os.environ.get("RMI_BUILD_STAGED") == "1"
            or os.environ.get("RMI_PROFILE_BUILD") == "1"):
        out = two_layer.train_two_layer(
            data.keys, data.key_type, None, top_type, leaf_type,
            branch_factor)
        return PendingRMI(models=model_spec,
                          branching_factor=int(branch_factor), data=data,
                          start_ns=start, metrics_dev=out[5], ovf_dev=None,
                          _finish=lambda _ovf: (out, False))

    metrics_dev, ovf_dev, finish = two_layer.train_two_layer_async(
        data.keys, data.key_type, top_type, leaf_type, branch_factor,
        norm=_norm_cached(data))
    return PendingRMI(models=model_spec,
                      branching_factor=int(branch_factor), data=data,
                      start_ns=start, metrics_dev=metrics_dev,
                      ovf_dev=ovf_dev, _finish=finish)


def train(data: RMIDataset, model_spec: str, branch_factor: int) -> TrainedRMI:
    """Train an RMI (train/mod.rs:100-126).  Only 2-layer specs are
    supported — the reference panics on anything else (train/mod.rs:125,
    multi_layer is commented out of its module tree)."""
    return train_async(data, model_spec, branch_factor).result()


def _build_trained(data: RMIDataset, model_spec: str, branch_factor: int,
                   out, m, build_time: int) -> TrainedRMI:
    (top_params, leaf_params, patch, next_idx, leaf_errors, _metrics,
     kminf, s, eval_mode) = out
    top_type, leaf_type = model_spec.split(",")

    if leaf_params.get("w") is None:
        # int-parameter leaves (radix hint tables): domain-free integer
        # params; serving uses the device dict.
        dev_leaf = {k: v for k, v in leaf_params.items() if k != "ovf"}
    else:
        dev_leaf = {"w": leaf_params["w"]}

    def raw_thunk(leaf_params=leaf_params, top_params=top_params,
                  patch=patch, next_idx=next_idx):
        # one batched host transfer of everything raw-parameter
        # conversion needs (per-transfer round trips cost ~30ms on
        # tunneled devices), then exact host-f64 conversion
        host = jax.device_get((leaf_params.get("w"),
                               leaf_params.get("aux"), patch, next_idx,
                               {k: v for k, v in top_params.items()
                                if k != "aux"}, top_params.get("aux")))
        (leaf_w_np, leaf_aux, patch_np, next_idx_np, top_np,
         top_aux) = host
        if leaf_w_np is None:
            raw_leaf = {k: np.asarray(v) for k, v in leaf_params.items()
                        if k != "ovf"}
        else:
            raw_leaf = convert.raw_leaf_params(
                leaf_type, leaf_w_np, leaf_aux, patch_np,
                np.asarray(next_idx_np).astype(np.float64), kminf, s)
        raw_top = convert.raw_top_params(top_type, top_np, top_aux,
                                         kminf, s)
        return raw_top, raw_leaf

    return TrainedRMI(
        models=model_spec,
        branching_factor=int(branch_factor),
        key_type=data.key_type,
        num_rmi_rows=data.n,
        num_data_rows=data.n,
        raw_top=None,
        raw_leaf=None,
        raw_thunk=raw_thunk,
        leaf_errors=leaf_errors,
        model_avg_error=float(m["model_avg_error"]),
        model_avg_l2_error=float(m["model_avg_l2_error"]),
        model_avg_log2_error=float(m["model_avg_log2_error"]),
        model_max_error=int(m["model_max_error"]),
        model_max_error_idx=int(m["model_max_error_idx"]),
        model_max_log2_error=float(m["model_max_log2_error"]),
        device_top_params={k: v for k, v in top_params.items()
                           if k != "aux"},
        device_leaf_params=dev_leaf,
        norm_offset=kminf,
        norm_scale=s,
        build_time=build_time,
        keys=data.keys,
        eval_mode=eval_mode,
    )


def train_for_size(data: RMIDataset, max_size: int) -> TrainedRMI:
    """--max-size: Pareto-search then first config under the byte budget
    (train/mod.rs:128-154)."""
    from rmi_tpu.optimizer import find_pareto_efficient_configs

    start = time.monotonic_ns()
    pareto = find_pareto_efficient_configs(data, restrict=1000)
    chosen = next((c for c in pareto if c.size < max_size), None)
    if chosen is None:
        raise RuntimeError(
            f"Could not find any configurations smaller than {max_size}")
    res = train(data, chosen.models, chosen.branching_factor)
    res.build_time = time.monotonic_ns() - start
    return res


def train_bounded(data: RMIDataset, model_spec: str, branch_factor: int,
                  line_size: int) -> TrainedRMI:
    """--bounded: cachefix spline -> reindex -> RMI over the knots
    (train/mod.rs:156-184)."""
    from rmi_tpu.cache_fix import cache_fix

    start = time.monotonic_ns()
    data64 = data.as_u64()
    spline_keys, spline_vals = cache_fix(data64, line_size)

    spline_ds = RMIDataset.from_numpy(spline_keys, KeyType.U64)
    res = train(spline_ds, model_spec, branch_factor)
    res.cache_fix = (int(line_size), spline_keys, spline_vals)
    res.num_data_rows = data.n
    res.build_time = time.monotonic_ns() - start
    return res
