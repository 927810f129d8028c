"""ctypes bridge to the native C++ CABAC coder (build-on-demand, cached .so).

The Python implementation in ``cabac.py`` is the specification; this loads
``native/cabac.cpp`` compiled with -O3 for the production path (≈10^3–10^4×
faster on the sequential symbol loop).  Falls back to Python transparently if
no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "cabac.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "native", "build")
_SO = os.path.join(_BUILD_DIR, "libcabac.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _build() -> bool:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-o", _SO, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if not os.path.exists(_SO) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
        ):
            if not _build():
                _load_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _load_failed = True
            return None
        lib.ic2t_cabac_encode.restype = ctypes.c_int64
        lib.ic2t_cabac_encode.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint16),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ]
        lib.ic2t_cabac_decode.restype = ctypes.c_int32
        lib.ic2t_cabac_decode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint16),
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return _lib


def _priors_ptr(priors):
    if priors is None:
        return None, ctypes.POINTER(ctypes.c_uint16)()
    arr = np.ascontiguousarray(priors, np.uint16)
    return arr, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16))


def native_available() -> bool:
    return _load() is not None


def encode_native(
    data: np.ndarray, n_symbols: int, priors: Optional[np.ndarray] = None
) -> Optional[bytes]:
    """Encode via the C++ coder; None if the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    data = np.ascontiguousarray(data, np.int32)
    B, T, D = data.shape
    # worst case ~ 2 bytes/symbol at n_symbols<=2^16 plus coder tail
    cap = data.size * 4 + 64
    out = np.empty(cap, np.uint8)
    prior_arr, prior_ptr = _priors_ptr(priors)
    n = lib.ic2t_cabac_encode(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        data.size, B, T, D, n_symbols, prior_ptr,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
    )
    if n < 0:
        raise ValueError("native cabac encode failed (symbols out of range?)")
    return bytes(out[:n].tobytes())


def decode_native(
    payload: bytes,
    shape: Tuple[int, int, int],
    n_symbols: int,
    priors: Optional[np.ndarray] = None,
) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    B, T, D = shape
    out = np.zeros(B * T * D, np.int32)
    buf = np.frombuffer(bytearray(payload), np.uint8) if payload else np.zeros(1, np.uint8)
    prior_arr, prior_ptr = _priors_ptr(priors)
    rc = lib.ic2t_cabac_decode(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(payload),
        B, T, D, n_symbols, prior_ptr,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        raise ValueError(f"native cabac decode failed (rc={rc})")
    return out.reshape(B, T, D)
