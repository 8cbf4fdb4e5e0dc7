"""Key/type system for rmi_tpu.

Mirrors the reference's ``KeyType`` / ``TrainingKey`` machinery
(rmi_lib/src/models/mod.rs:40-111) as a vectorized dtype registry:

* ``U32`` / ``U64`` / ``F64`` key types, chosen by file-name suffix
  exactly as the reference CLI does (src/main.rs:122-132).
* ``plus_epsilon`` / ``minus_epsilon`` probing used by the lower-bound
  error inflation (two_layer.rs:229-247): integers move by +/-1 with
  saturation (models/mod.rs:449-465); floats move by the *absolute*
  f64 machine epsilon (models/mod.rs:102-104) — deliberately preserving
  the reference's quirk that large float keys are unchanged by it.
"""

from __future__ import annotations

import enum
import sys

import jax
import jax.numpy as jnp
import numpy as np


class KeyType(enum.Enum):
    """Key dtypes.  U128 exists at exactly the reference's depth: the
    enum variant and its codegen type name are declared
    (models/mod.rs:42,51,59) but NO loader constructs U128 data
    (src/load.rs:97-129 produces only u64/u32/f64 mmaps) and no model
    implements 128-bit arithmetic — so requesting U128 training data
    raises a ValueError here, where the reference simply has no code
    path that could reach it."""

    U32 = "uint32"
    U64 = "uint64"
    F64 = "f64"
    U128 = "uint128"

    def _no_u128(self):
        if self is KeyType.U128:
            raise ValueError(
                "KeyType.U128 is declared for codegen parity with the "
                "reference (models/mod.rs:40-63) but has no data "
                "representation: the reference's loader never produces "
                "u128 keys (src/load.rs:97-129) and neither does "
                "rmi_tpu (no 128-bit numpy/JAX dtype)")

    @property
    def np_dtype(self):
        self._no_u128()
        return {
            KeyType.U32: np.uint32,
            KeyType.U64: np.uint64,
            KeyType.F64: np.float64,
        }[self]

    @property
    def jnp_dtype(self):
        self._no_u128()
        return {
            KeyType.U32: jnp.uint32,
            KeyType.U64: jnp.uint64,
            KeyType.F64: jnp.float64,
        }[self]

    @property
    def c_type(self) -> str:
        # codegen type names (models/mod.rs:46-53)
        return {
            KeyType.U32: "uint32_t",
            KeyType.U64: "uint64_t",
            KeyType.F64: "double",
            KeyType.U128: "uint128_t",
        }[self]

    @property
    def is_float(self) -> bool:
        return self is KeyType.F64

    @property
    def itemsize(self) -> int:
        if self is KeyType.U128:
            return 16
        return 4 if self is KeyType.U32 else 8

    @property
    def max_value(self):
        """T::max_value() (models/mod.rs:81,93,105)."""
        self._no_u128()
        if self is KeyType.U32:
            return np.uint32(0xFFFFFFFF)
        if self is KeyType.U64:
            return np.uint64(0xFFFFFFFFFFFFFFFF)
        return np.float64(sys.float_info.max)

    @property
    def zero_value(self):
        """T::zero_value() (models/mod.rs:79,91,103)."""
        if self is KeyType.F64:
            return np.float64(0.0)
        return self.np_dtype(0)

    @classmethod
    def from_filename(cls, path: str) -> "KeyType":
        """File-extension -> dtype dispatch (src/main.rs:122-132)."""
        if "uint64" in path:
            return cls.U64
        if "uint32" in path:
            return cls.U32
        if "f64" in path:
            return cls.F64
        raise ValueError(
            f"Data file name must contain uint64, uint32, or f64: {path}"
        )


_F64_EPS = np.float64(sys.float_info.epsilon)  # f64::EPSILON = 2^-52


def minus_epsilon(keys, key_type: KeyType):
    """Vectorized TrainingKey::minus_epsilon (models/mod.rs:78,90,102).

    ModelInput::minus_epsilon saturates integers at 0
    (models/mod.rs:449-454); floats subtract the absolute machine
    epsilon, which is a no-op for |x| > ~2 (reference quirk, kept).
    """
    if key_type.is_float:
        return keys - _F64_EPS
    z = jnp.asarray(0, dtype=keys.dtype)
    return jnp.where(keys > z, keys - jnp.asarray(1, keys.dtype), z)


def plus_epsilon(keys, key_type: KeyType):
    """Vectorized TrainingKey::plus_epsilon (models/mod.rs:80,92,104)."""
    if key_type.is_float:
        return keys + _F64_EPS
    mx = jnp.asarray(key_type.max_value, dtype=keys.dtype)
    return jnp.where(keys < mx, keys + jnp.asarray(1, keys.dtype), mx)


def as_float(keys):
    """ModelInput::as_float — cast key to f64 (models/mod.rs:421-426).

    Lossy above 2^53 for u64 keys, matching the reference (`*x as f64`).
    """
    return keys.astype(jnp.float64)


def _exp2i(k):
    """EXACT 2.0**k for integer arrays k with |k| <= 1023.

    jnp.exp2 is a libm approximation and lands ulps off even at
    integer arguments, which breaks the exact-scaling argument below.
    A product ladder of 2^(2^j) constants is exact: every factor and
    every running product is a representable power of two (ascending-j
    order keeps intermediates inside the normal range for |k| <= 1023).
    """
    mag = jnp.abs(k)
    neg = k < 0
    f = jnp.ones(k.shape, jnp.float64)
    for j in range(10):
        bit = (mag >> j) & 1
        c = jnp.where(neg, 2.0 ** -(2 ** j), 2.0 ** (2 ** j))
        f = f * jnp.where(bit == 1, c, 1.0)
    return f


def _pow2_scale(v, k):
    """v * 2**k exact for integer k in [-2046, 2046], two factors so
    each exponent stays inside the exact-ladder range."""
    k2 = k // 2
    k1 = k - k2
    return v * _exp2i(k1) * _exp2i(k2)


def _f64_magnitude_bits(a):
    """IEEE-754 bit pattern of finite a >= 0, computed ARITHMETICALLY.

    TPU's X64 rewriter has no 64-bit bitcast at all (f64 values ride
    as u32 pairs whose concatenated bits are not exposed), so
    lax.bitcast_convert_type(f64, u64) — and jnp.frexp, which lowers
    through it — fail to compile (HTTP 500 from the remote compiler).
    Power-of-two scaling is exact in IEEE arithmetic, so the bits can
    be recovered instead: scale a into [2^52, 2^53) where f64 values
    ARE their mantissa integer, convert to u64, and re-attach the
    exponent.  The floor(log2) exponent guess is verified and fixed up
    with exact comparisons, so boundary values (exact powers of two)
    are handled.  Subnormals map to 0: XLA arithmetic flushes them
    (DAZ/FTZ) — log2 sees them as 0 and every on-device compare
    treats them as 0 — so the zero image IS the device's own ordering
    of those values (numpy round-trip parity holds for all normals).
    """
    pos = a > 0.0
    safe = jnp.where(pos, a, 1.0)
    e0 = jnp.floor(jnp.log2(safe)).astype(jnp.int32)
    e0 = jnp.clip(e0, -1074, 1023)

    def mant_at(e):
        return _pow2_scale(safe, 52 - e)

    m0 = mant_at(e0)
    e = jnp.where(m0 < 2.0 ** 52, e0 - 1,
                  jnp.where(m0 >= 2.0 ** 53, e0 + 1, e0))
    m = jnp.where(e == e0, m0, mant_at(e))
    # f64 -> u64 convert of 2^52-magnitude values is off by +-1 for
    # ~1/6000 values on TPU's emulated-f64 path (shape-dependent; the
    # same convert is exact at small shapes) — split the mantissa into
    # two 26-bit halves so every convert stays small-magnitude.  All
    # splits are exact: m is integer-valued, power-of-two scaling and
    # sub-2^53 integer add/sub round to themselves.
    frac = m - 2.0 ** 52                   # [0, 2^52), integer-valued
    hi26 = jnp.floor(frac * 2.0 ** -26)    # [0, 2^26)
    lo26 = frac - hi26 * 2.0 ** 26         # [0, 2^26)
    mant_frac = ((hi26.astype(jnp.uint64) << jnp.uint64(26))
                 | lo26.astype(jnp.uint64))
    bits_normal = (((e.astype(jnp.int64) + 1023).astype(jnp.uint64)
                    << jnp.uint64(52)) | mant_frac)
    bits = jnp.where(e >= -1022, bits_normal, jnp.uint64(0))
    bits = jnp.where(jnp.isfinite(safe), bits,
                     jnp.uint64(0x7FF0000000000000))      # +inf
    return jnp.where(pos, bits, jnp.uint64(0))            # +-0.0 -> 0


@jax.jit
def _ordered_u64_f64(x):
    b = _f64_magnitude_bits(jnp.abs(x))
    neg = x < 0.0
    mapped = jnp.where(neg, ~(b | (jnp.uint64(1) << jnp.uint64(63))),
                       b | (jnp.uint64(1) << jnp.uint64(63)))
    return jnp.where(jnp.isnan(x), jnp.uint64(0), mapped)


# Chunk width for the large-n f64 image: the magnitude-bit arithmetic
# holds ~10 n-sized f64/u64 intermediates at once (~16GB at 200M keys,
# the round-4 f64 serving-plan OOM), so big arrays are converted in
# fixed-size pieces.
_ORDERED_CHUNK = 1 << 25


def ordered_u64(keys, key_type: KeyType):
    """Order-preserving u64 image of a key array.

    Integers are their u64 view.  f64 keys use the IEEE total-order
    bit trick (sign-flip for positives, bit-complement for negatives)
    so u64 lane compares implement f64 lower_bound — this is what lets
    the packed u32-pair serving plan (lookup_fast) cover float keys
    with the same single-gather rows as integer keys.  -0.0 is
    normalized to +0.0 first (IEEE: they compare equal); NaN queries
    map to 0, matching std::lower_bound's first-element result when
    every comparison is false.  The bit pattern is reconstructed
    arithmetically (_f64_magnitude_bits) because TPU has no 64-bit
    bitcast.
    """
    if not key_type.is_float:
        return keys.astype(jnp.uint64)
    x = keys.astype(jnp.float64)
    n = x.shape[0]
    if n <= _ORDERED_CHUNK:
        return _ordered_u64_f64(x)
    parts = [_ordered_u64_f64(x[s:min(s + _ORDERED_CHUNK, n)])
             for s in range(0, n, _ORDERED_CHUNK)]
    return jnp.concatenate(parts)


def as_int(keys):
    """ModelInput::as_int — u64 view of the key (models/mod.rs:428-433).

    Float keys truncate toward zero (`*x as u64` in Rust saturates; for
    in-range sorted CDF keys the behaviors coincide).
    """
    if jnp.issubdtype(keys.dtype, jnp.floating):
        f = jnp.clip(keys, 0.0, float(np.uint64(0xFFFFFFFFFFFFFFFF)))
        return f.astype(jnp.uint64)
    return keys.astype(jnp.uint64)
