"""ctypes bindings for the C++ host-ops library, with numpy fallback.

Build-on-first-use: `runtime/host_ops.cpp` compiles with g++ into the
package directory (cached by source mtime). Everything degrades to numpy if
the toolchain is unavailable, so the framework never hard-depends on the
native path — it is a throughput optimisation for the input pipeline.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "host_ops.cpp")
_LIB = os.path.join(_HERE, "_libhost.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        _SRC, "-o", _LIB,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """The loaded shared library, or None when native is unavailable."""
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        needs_build = (
            not os.path.exists(_LIB)
            or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        )
        if needs_build and not _build():
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _build_failed = True
            return None
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C")
        u16p = np.ctypeslib.ndpointer(np.uint16, flags="C")
        lib.gather_scale_f32.argtypes = [
            f32p, i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_float, f32p
        ]
        lib.gather_residual_f32.argtypes = [
            f32p, f32p, i64p, ctypes.c_int64, ctypes.c_int64, f32p
        ]
        lib.u16_to_f32_scale.argtypes = [
            u16p, ctypes.c_int64, ctypes.c_float, f32p
        ]
        _lib = lib
        return _lib


def gather_scale(src: np.ndarray, idx: np.ndarray, scale: float = 1.0) -> np.ndarray:
    """out[i] = src[idx[i]] / scale, over axis 0. Native when available."""
    src = np.ascontiguousarray(src, np.float32)
    idx = np.ascontiguousarray(idx, np.int64)
    lib = get_lib()
    if lib is None:
        return src[idx] * np.float32(1.0 / scale)
    item = int(np.prod(src.shape[1:], dtype=np.int64))
    out = np.empty((len(idx), *src.shape[1:]), np.float32)
    lib.gather_scale_f32(src, idx, len(idx), item, 1.0 / scale, out)
    return out


def gather_residual(hr: np.ndarray, lms: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """out[i] = hr[idx[i]] - lms[idx[i]]. Native when available."""
    hr = np.ascontiguousarray(hr, np.float32)
    lms = np.ascontiguousarray(lms, np.float32)
    idx = np.ascontiguousarray(idx, np.int64)
    lib = get_lib()
    if lib is None:
        return hr[idx] - lms[idx]
    item = int(np.prod(hr.shape[1:], dtype=np.int64))
    out = np.empty((len(idx), *hr.shape[1:]), np.float32)
    lib.gather_residual_f32(hr, lms, idx, len(idx), item, out)
    return out


def counts_to_float(src: np.ndarray, scale: float) -> np.ndarray:
    """uint16 sensor counts → float32 in [0, 1]. Native when available."""
    if src.dtype != np.uint16:
        return np.asarray(src, np.float32) / np.float32(scale)
    src = np.ascontiguousarray(src)
    lib = get_lib()
    if lib is None:
        return src.astype(np.float32) / np.float32(scale)
    out = np.empty(src.shape, np.float32)
    lib.u16_to_f32_scale(src.reshape(-1), src.size, 1.0 / scale,
                         out.reshape(-1))
    return out
