"""Native (C++) host-side kernels, loaded via ctypes.

The reference's only compiled host code is a numba JIT kernel
(tasks/anomaly_detection.py:215); here the equivalents are a small C++
library compiled on first use with the system toolchain. All callers have
pure-numpy fallbacks, so the framework works without a compiler.
"""

from __future__ import annotations

import ctypes
import subprocess
import warnings
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_LIB = None
_TRIED = False


def _build() -> Path | None:
    src = _HERE / "pointadjust.cpp"
    out = _HERE / "libnative.so"
    if out.exists() and out.stat().st_mtime >= src.stat().st_mtime:
        return out
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", str(out), str(src)],
            check=True, capture_output=True, timeout=120)
        return out
    except Exception as e:  # no toolchain: numpy fallbacks take over
        warnings.warn(f"native kernel build failed ({e}); using numpy fallbacks")
        return None


def get_lib():
    global _LIB, _TRIED
    if _LIB is None and not _TRIED:
        _TRIED = True
        path = _build()
        if path is not None:
            lib = ctypes.CDLL(str(path))
            lib.adjust_anomalies.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64]
            lib.stitch_windows_f32.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64]
            _LIB = lib
    return _LIB


def adjust_anomalies_native(pred: np.ndarray, gt: np.ndarray) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    pred = np.ascontiguousarray(pred, dtype=np.int32).copy()
    gt = np.ascontiguousarray(gt, dtype=np.int32)
    lib.adjust_anomalies(
        pred.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        gt.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(len(pred)))
    return pred
