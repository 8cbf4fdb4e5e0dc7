"""ctypes bindings for the native C++ runtime (native/).

The reference's host-side work is native Rust; ours is native C++:
  * cache_fix greedy spline (the one sequential algorithm),
  * a batched artifact-serving runtime (load / lookup / bounded search)
    equivalent to the reference's generated C++ + test drivers.

Falls back gracefully (``available() == False``) when the shared
library has not been built; ``make -C native`` builds it.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "native",
                 "librmi_native.so"),
    os.path.join(os.path.dirname(__file__), "librmi_native.so"),
]

_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    for p in _LIB_PATHS:
        p = os.path.abspath(p)
        if os.path.exists(p):
            lib = ctypes.CDLL(p)
            lib.rmi_cache_fix.restype = ctypes.c_int64
            lib.rmi_cache_fix.argtypes = [
                ctypes.POINTER(ctypes.c_uint64),   # keys
                ctypes.POINTER(ctypes.c_uint64),   # offsets
                ctypes.c_uint64,                   # n
                ctypes.c_uint64,                   # line_size
                ctypes.POINTER(ctypes.c_uint64),   # out keys
                ctypes.POINTER(ctypes.c_uint64),   # out vals
            ]
            lib.rmi_load.restype = ctypes.c_void_p
            lib.rmi_load.argtypes = [ctypes.c_char_p]
            lib.rmi_free.argtypes = [ctypes.c_void_p]
            lib.rmi_lookup_batch.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_uint64), ctypes.c_uint64,
                ctypes.POINTER(ctypes.c_uint64),
                ctypes.POINTER(ctypes.c_uint64)]
            lib.rmi_search_batch.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_uint64), ctypes.c_uint64,
                ctypes.POINTER(ctypes.c_uint64), ctypes.c_uint64,
                ctypes.POINTER(ctypes.c_uint64)]
            _lib = lib
            return lib
    return None


def available() -> bool:
    return _load() is not None


def cache_fix(keys: np.ndarray, offsets: np.ndarray,
              line_size: int) -> Tuple[np.ndarray, np.ndarray]:
    """Native greedy spline (mirrors cache_fix.rs:45-150)."""
    lib = _load()
    n = keys.shape[0]
    # worst case: 2 knots per unique key + final knot
    cap = 2 * n + 2
    ok = np.empty(cap, dtype=np.uint64)
    ov = np.empty(cap, dtype=np.uint64)
    keys = np.ascontiguousarray(keys, dtype=np.uint64)
    offsets = np.ascontiguousarray(offsets, dtype=np.uint64)
    count = lib.rmi_cache_fix(
        keys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        n, line_size,
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        ov.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
    if count < 0:
        raise RuntimeError("native cache_fix failed")
    return ok[:count].copy(), ov[:count].copy()


class NativeRMI:
    """Native artifact server: loads a saved artifact's metadata JSON
    and serves lookups/searches on the CPU."""

    def __init__(self, meta_path: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library not built (make -C native)")
        self._lib = lib
        self._h = lib.rmi_load(meta_path.encode())
        if not self._h:
            raise RuntimeError(f"rmi_load failed for {meta_path}")

    def close(self):
        if self._h:
            self._lib.rmi_free(self._h)
            self._h = None

    def lookup(self, queries: np.ndarray):
        q = np.ascontiguousarray(queries, dtype=np.uint64)
        guess = np.empty(q.shape[0], dtype=np.uint64)
        err = np.empty(q.shape[0], dtype=np.uint64)
        self._lib.rmi_lookup_batch(
            self._h, q.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            q.shape[0],
            guess.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            err.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
        return guess, err

    def search(self, queries: np.ndarray, keys: np.ndarray):
        q = np.ascontiguousarray(queries, dtype=np.uint64)
        k = np.ascontiguousarray(keys, dtype=np.uint64)
        out = np.empty(q.shape[0], dtype=np.uint64)
        self._lib.rmi_search_batch(
            self._h, q.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            q.shape[0],
            k.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), k.shape[0],
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
        return out
