"""rmi_tpu — a TPU-native learned-index (RMI) engine.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
``learnedsystems/RMI`` (reference: /root/reference, Rust).  Where the
reference is an ahead-of-time compiler emitting C++ source
(codegen.rs:757), this framework trains Recursive Model Indexes directly
on device and serves them with fused batched-lookup kernels.  A thin
C++ native runtime plus an optional C++ code generator reproduce the
reference's deployable-artifact surface (load()/cleanup()/lookup()).

Public API (mirrors rmi_lib/src/lib.rs:1-12):
    train, train_for_size, train_bounded  -- training entry points
    find_pareto_efficient_configs         -- the --optimize sweep
    rmi_size                              -- artifact size accounting
    output_rmi                            -- artifact serialization + C++ codegen
    RMIDataset / load_data                -- SOSD binary data layer
    TrainedRMI                            -- training result
    lookup / search                       -- batched device serving path
"""

from rmi_tpu import config as _config  # noqa: F401  (enables x64 on import)

from rmi_tpu.keys import KeyType
from rmi_tpu.data import RMIDataset, load_data, write_sosd_file
from rmi_tpu.train.api import train, train_for_size, train_bounded, TrainedRMI
from rmi_tpu.lookup import (lookup, search, search_sorted,
                            lookup_and_search)
from rmi_tpu.optimizer import find_pareto_efficient_configs, RMIStatistics
from rmi_tpu.serialize import rmi_size, output_rmi, save_artifact, load_artifact

__version__ = "0.1.0"

__all__ = [
    "KeyType",
    "RMIDataset",
    "load_data",
    "write_sosd_file",
    "train",
    "train_for_size",
    "train_bounded",
    "TrainedRMI",
    "lookup",
    "search",
    "search_sorted",
    "lookup_and_search",
    "find_pareto_efficient_configs",
    "RMIStatistics",
    "rmi_size",
    "output_rmi",
    "save_artifact",
    "load_artifact",
]
