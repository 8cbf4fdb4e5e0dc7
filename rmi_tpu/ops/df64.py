"""Double-float (float-float, "df64") arithmetic for TPU kernels.

The TPU has no native f64; XLA emulates it with f32 pairs, which is
both slow to compile and opaque.  Pallas kernels cannot use 64-bit
types at all on this stack (the Mosaic compiler rejects them — see
probes/probe_pallas.py).  This module provides explicit float-float
arithmetic over (hi, lo) f32 pairs with ~2^-48 relative accuracy —
the same precision class as XLA's TPU f64 emulation — usable both
inside Pallas kernels and in plain jnp code.

Algorithms: Knuth TwoSum, Dekker Split/TwoProd (no FMA assumed),
following Hida/Li/Bailey's double-double building blocks restricted to
the f32 base type.

Shared by the build's error-sweep kernel and the serving kernel so
that training-time error bounds and serve-time predictions use
IDENTICAL arithmetic — the bound contract then holds by construction
(the role exact IEEE f64 plays on CPU in the reference,
two_layer.rs:205-217 vs the generated C++).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_SPLITTER = np.float32(4097.0)     # 2^12 + 1 for f32 (24-bit mantissa)


def two_sum(a, b):
    """Error-free a + b -> (s, e) with s = fl(a+b), s + e == a + b."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """Error-free sum assuming |a| >= |b|."""
    s = a + b
    e = b - (s - a)
    return s, e


def split(a):
    """Dekker split: a == hi + lo with hi, lo each 12-bit mantissas."""
    c = a * _SPLITTER
    hi = c - (c - a)
    lo = a - hi
    return hi, lo


def two_prod(a, b):
    """Error-free a * b -> (p, e) with p = fl(a*b), p + e == a * b."""
    p = a * b
    ah, al = split(a)
    bh, bl = split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def add(xh, xl, yh, yl):
    """(xh, xl) + (yh, yl), ~2^-47 relative accuracy (sloppy variant)."""
    s, e = two_sum(xh, yh)
    e = e + (xl + yl)
    return fast_two_sum(s, e)


def sub(xh, xl, yh, yl):
    return add(xh, xl, -yh, -yl)


def mul(xh, xl, yh, yl):
    """(xh, xl) * (yh, yl)."""
    p, e = two_prod(xh, yh)
    e = e + (xh * yl + xl * yh)
    return fast_two_sum(p, e)


def mul_f32(xh, xl, y):
    """(xh, xl) * y for a plain f32 y."""
    p, e = two_prod(xh, y)
    e = e + xl * y
    return fast_two_sum(p, e)


def add_f32(xh, xl, y):
    s, e = two_sum(xh, y)
    e = e + xl
    return fast_two_sum(s, e)


def fma(ah, al, xh, xl, bh, bl):
    """(a * x) + b in df64 — the chained-FMA building block of every
    model's predict (linear.rs:89, cubic_spline.rs:144-149)."""
    ph, plo = mul(ah, al, xh, xl)
    return add(ph, plo, bh, bl)


def div(xh, xl, yh, yl):
    """(xh, xl) / (yh, yl), ~2^-46 relative (long division: leading
    quotient + one residual correction).

    Matches IEEE propagation loosely only: y == 0 yields NaN (not
    +/-inf) because the residual multiplies inf*0.  Both the error
    sweep and the serving eval run THIS code, so the bound contract is
    unaffected (see module docstring); zero-stdev normal leaves differ
    from the reference's f64 inf only in df64 mode, like every other
    df64 rounding divergence."""
    q1 = xh / yh
    p, e = two_prod(q1, yh)
    rh, rl = add(xh, xl, -p, -(e + q1 * yl))
    q2 = rh / yh
    return fast_two_sum(q1, q2)


def neg(xh, xl):
    return -xh, -xl


def lt(xh, xl, yh, yl):
    """(xh,xl) < (yh,yl) for normalized pairs."""
    return (xh < yh) | ((xh == yh) & (xl < yl))


def from_f64(v):
    """Host/XLA-side: split an f64 array into an (hi, lo) f32 pair.
    Exact: hi = f32(v), lo = f32(v - hi); v == hi + lo whenever
    v - hi is representable (always, for |v| < f32 max)."""
    hi = v.astype(jnp.float32)
    lo = (v - hi.astype(v.dtype)).astype(jnp.float32)
    return hi, lo


def to_f64(hi, lo):
    """XLA-side recombination (exact)."""
    return hi.astype(jnp.float64) + lo.astype(jnp.float64)


def from_np(v):
    v = np.asarray(v, dtype=np.float64)
    hi = v.astype(np.float32)
    lo = (v - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def floor_to_i32(xh, xl, lo_bound, hi_bound):
    """max(lo_bound, min(hi_bound, floor(xh + xl))) as i32.

    Implements predict_to_int's max(0, floor(f)) (models/mod.rs:735-737)
    plus the serving clamp, entirely in 32-bit ops.  Valid for
    |result| < 2^31; NaN maps to lo_bound (jnp.where on NaN comparisons
    is False -> clamps low, matching the sweep's NaN->0 handling).
    """
    fh = jnp.floor(xh)
    frac = xh - fh                       # exact (Sterbenz-adjacent)
    f2 = jnp.floor(frac + xl)            # in {-1, 0} almost always
    # i32 conversion: fh is an integral f32; may exceed i32 range ->
    # clamp in float first using f32 bounds that are exactly
    # representable.
    fh = jnp.clip(fh, jnp.float32(-2147483648.0), jnp.float32(2147483520.0))
    res = fh.astype(jnp.int32) + f2.astype(jnp.int32)
    res = jnp.maximum(res, jnp.int32(lo_bound))
    res = jnp.minimum(res, jnp.int32(hi_bound))
    nan = jnp.isnan(xh)
    return jnp.where(nan, jnp.int32(lo_bound), res)
