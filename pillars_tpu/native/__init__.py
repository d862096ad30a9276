"""ctypes loader for the native geometry library (csrc/geometry_ops.cc).

Replaces the reference's on-demand pybind11/nvcc build harness
(second/utils/buildtools/pybind11_build.py:76-115): on first use we invoke
``make`` in csrc/ if the shared object is missing, then bind through ctypes.
Everything degrades gracefully to the NumPy implementations when no
toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import threading
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False
_LOCK = threading.Lock()

_CSRC = pathlib.Path(__file__).resolve().parent.parent.parent / "csrc"
_SO = _CSRC / "libpillars_native.so"


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", str(_CSRC)], check=True,
                       capture_output=True, timeout=120)
        return _SO.exists()
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or None."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if not _SO.exists() and not _build():
            return None
        try:
            lib = ctypes.CDLL(str(_SO))
            lib.rotated_overlap_matrix.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
            lib.rotated_overlap_matrix.restype = None
            lib.nms_standup.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_float, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64)]
            lib.nms_standup.restype = ctypes.c_int64
            _LIB = lib
        except OSError:
            _LIB = None
        return _LIB


def available() -> bool:
    return load() is not None


def rotated_overlap_matrix(boxes1: np.ndarray, boxes2: np.ndarray,
                           criterion: int = -1) -> Optional[np.ndarray]:
    """[N,5] x [K,5] -> [N,K] float32, or None if the library is missing."""
    lib = load()
    if lib is None:
        return None
    b1 = np.ascontiguousarray(boxes1, dtype=np.float32)
    b2 = np.ascontiguousarray(boxes2, dtype=np.float32)
    n, k = b1.shape[0], b2.shape[0]
    out = np.empty((n, k), dtype=np.float32)
    if n and k:
        lib.rotated_overlap_matrix(
            b1.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
            b2.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), k,
            criterion, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def nms_standup(boxes_sorted: np.ndarray, iou_threshold: float,
                post_max: int) -> Optional[np.ndarray]:
    """Greedy NMS over score-sorted [N,4] standup boxes -> kept indices."""
    lib = load()
    if lib is None:
        return None
    b = np.ascontiguousarray(boxes_sorted, dtype=np.float32)
    keep = np.empty((b.shape[0],), dtype=np.int64)
    n = lib.nms_standup(
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), b.shape[0],
        iou_threshold, post_max,
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return keep[:n]
