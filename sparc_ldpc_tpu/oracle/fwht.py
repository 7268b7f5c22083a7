"""CPU fast Walsh-Hadamard transform: native C++ with NumPy fallback.

Natural (Sylvester) ordering: H_N = H_2 ⊗ H_2 ⊗ ... ⊗ H_2, unnormalized
(H_N H_N = N I).  Must match the JAX mode-contraction transform in
sparc_ldpc_tpu/ops/fwht.py bit-for-bit in exact arithmetic (tested in
tests/test_fwht.py).  SURVEY.md §2 #8.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_LIB_TRIED = False


def _load_native():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    path = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                        "libsparcfwht.so")
    path = os.path.abspath(path)
    try:
        lib = ctypes.CDLL(path)
        lib.fwht_f64.argtypes = [ctypes.POINTER(ctypes.c_double),
                                 ctypes.c_int64, ctypes.c_int64]
        lib.fwht_f32.argtypes = [ctypes.POINTER(ctypes.c_float),
                                 ctypes.c_int64, ctypes.c_int64]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def fwht_np(x: np.ndarray) -> np.ndarray:
    """Pure-NumPy vectorized butterfly FWHT over the last axis (any batch)."""
    x = np.asarray(x)
    N = x.shape[-1]
    assert N & (N - 1) == 0, "length must be a power of two"
    y = x.copy()
    lead = x.shape[:-1]
    h = 1
    while h < N:
        y = y.reshape(lead + (N // (2 * h), 2, h))
        a = y[..., 0, :]
        b = y[..., 1, :]
        y = np.stack((a + b, a - b), axis=-2)
        h *= 2
    return y.reshape(lead + (N,))


def fwht(x: np.ndarray, force_numpy: bool = False) -> np.ndarray:
    """FWHT over the last axis; native C++ when available (not in-place)."""
    x = np.ascontiguousarray(x)
    if x.dtype not in (np.float64, np.float32):
        x = x.astype(np.float64)
    lib = None if force_numpy else _load_native()
    if lib is None:
        return fwht_np(x)
    out = x.copy()
    batch = int(np.prod(out.shape[:-1])) if out.ndim > 1 else 1
    n = out.shape[-1]
    if out.dtype == np.float64:
        lib.fwht_f64(out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                     batch, n)
    else:
        lib.fwht_f32(out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                     batch, n)
    return out


def has_native() -> bool:
    return _load_native() is not None
