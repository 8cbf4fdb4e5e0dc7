"""Model zoo registry.  Importing this package registers every model
type the reference supports (train/mod.rs:35-57): linear,
robust_linear, linear_spline, cubic, loglinear, normal, lognormal,
radix, radix8/18/22/26/28, bradix, histogram.
"""

from rmi_tpu.models.base import (
    ModelDef,
    Restriction,
    REGISTRY,
    get_model,
    validate_spec,
    predict_clamped,
    clamp_int,
)

# Importing these modules populates REGISTRY.
from rmi_tpu.models import linear as _linear      # noqa: F401
from rmi_tpu.models import cubic as _cubic        # noqa: F401
from rmi_tpu.models import normal as _normal      # noqa: F401
from rmi_tpu.models import radix as _radix        # noqa: F401
from rmi_tpu.models import histogram as _histogram  # noqa: F401

__all__ = [
    "ModelDef", "Restriction", "REGISTRY", "get_model", "validate_spec",
    "predict_clamped", "clamp_int",
]
