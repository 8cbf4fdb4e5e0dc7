"""CacheFix: error-bounded greedy spline over unique keys
(cache_fix.rs:5-150).

Produces knots (key, offset) such that for every training point the
interpolated prediction lands in the point's cache line:
trunc(lerp(key)) / line_size == offset / line_size (cache_fix.rs:96-103).
Before each unique key an extra knot candidate at key-1 preserves
lower-bound semantics (cache_fix.rs:118-128).

This is the single genuinely sequential algorithm in the reference, so
it runs on the host: a C++ streaming pass (native/rmi_native.cpp) when
the native library is built, else a NumPy/Python fallback with
identical output (used by the tests, which compare the two).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from rmi_tpu.data import RMIDataset


def _fma(a: float, b: float, c: float) -> float:
    """Exact double fused multiply-add (one rounding), matching the
    reference's f64::mul_add (cache_fix.rs:41).  math.fma only landed
    in Python 3.13; Fraction arithmetic is exact and float() rounds
    correctly, so this IS the fma result."""
    from fractions import Fraction
    return float(Fraction(a) * Fraction(b) + Fraction(c))


def _predict(fx: int, fy: int, tx: int, ty: int, x: int) -> int:
    """Spline::predict (cache_fix.rs:36-42): f64 lerp (mul_add) cast to
    usize.  The fused multiply-add matters: a double-rounded lerp can
    flip a cache-line accept/reject and the greedy knot stream diverges
    from the reference's from that point on.

    Fast path: the double-rounded lerp is within 1 ulp of the fma
    result, so when truncation is stable under a +/-5e-16 relative
    wiggle the cheap value IS the fma truncation; only near-integer
    values pay the exact Fraction fma."""
    t = float(x - fx) / float(tx - fx)
    a, b, c = 1.0 - t, float(fy), t * float(ty)
    v = a * b + c
    lo = int(v * (1.0 - 5e-16))
    if lo == int(v * (1.0 + 5e-16)):
        return lo
    return int(_fma(a, b, c))


def _cache_fix_py(keys: np.ndarray, offsets: np.ndarray,
                  line_size: int) -> Tuple[np.ndarray, np.ndarray]:
    """Greedy SplineFit (cache_fix.rs:45-104) over the candidate-point
    stream (cache_fix.rs:117-136)."""
    out_k, out_v = [], []

    # fit state: current spline (fx,fy)->(tx,ty), accumulated points
    have = False
    fx = fy = tx = ty = 0
    curr = []  # points the current spline must keep covering

    def add_point(px: int, py: int):
        nonlocal have, fx, fy, tx, ty, curr
        if not have:
            have = True
            fx, fy, tx, ty = px, py, px, py
            out_k.append(px)
            out_v.append(py)
            return
        # proposal: same origin, new destination (cache_fix.rs:67-87)
        curr.append((tx, ty))
        ok = True
        if px != fx:
            for (cx, cy) in curr:
                if _predict(fx, fy, px, py, cx) // line_size != cy // line_size:
                    ok = False
                    break
        else:
            ok = False
        if ok:
            tx, ty = px, py
        else:
            prev = (tx, ty)
            out_k.append(prev[0])
            out_v.append(prev[1])
            fx, fy = prev
            tx, ty = px, py
            curr = [(px, py)]

    last_key = 0
    for k, off in zip(keys.tolist(), offsets.tolist()):
        if k - 1 != last_key:
            add_point(k - 1, off)
        add_point(k, off)
        last_key = k

    if have:
        out_k.append(tx)
        out_v.append(ty)

    return (np.asarray(out_k, dtype=np.uint64),
            np.asarray(out_v, dtype=np.uint64))


def cache_fix(data: RMIDataset, line_size: int
              ) -> Tuple[np.ndarray, np.ndarray]:
    """Spline knots (keys, offsets) for --bounded (cache_fix.rs:106-150)."""
    if data.n <= line_size:
        raise ValueError(
            "Cannot apply a cachefix with fewer items than the line size")
    uk, uo = data.unique()

    try:
        from rmi_tpu import native
        if native.available():
            return native.cache_fix(uk.astype(np.uint64),
                                    uo.astype(np.uint64), line_size)
    except ImportError:
        pass

    return _cache_fix_py(uk.astype(np.uint64), uo.astype(np.uint64),
                         int(line_size))
