"""ctypes bindings for the native host geometry kernels.

Builds ``geometry.cpp`` with g++ on first import (cached as a .so beside
the source); every entry point has a pure-numpy fallback elsewhere in the
package, so environments without a toolchain still work — ``AVAILABLE``
tells callers which path is live.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "geometry.cpp")
_SO = os.path.join(_DIR, "_geometry.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
AVAILABLE = False


def _build() -> bool:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return True
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, AVAILABLE
    with _lock:
        if _lib is not None:
            return _lib
        if not _build():
            return None
        lib = ctypes.CDLL(_SO)
        D = ctypes.POINTER(ctypes.c_double)
        U8 = ctypes.POINTER(ctypes.c_uint8)
        I32 = ctypes.POINTER(ctypes.c_int32)
        lib.mr_polygon_area.restype = ctypes.c_double
        lib.mr_polygon_area.argtypes = [D, ctypes.c_int]
        lib.mr_offset_polygon.restype = ctypes.c_int
        lib.mr_offset_polygon.argtypes = [D, ctypes.c_int, ctypes.c_double, D]
        lib.mr_polygon_inter_area.restype = ctypes.c_double
        lib.mr_polygon_inter_area.argtypes = [D, ctypes.c_int, D, ctypes.c_int]
        lib.mr_batch_quad_iou.restype = None
        lib.mr_batch_quad_iou.argtypes = [D, ctypes.c_int, D, ctypes.c_int, D]
        lib.mr_connected_components.restype = ctypes.c_int
        lib.mr_connected_components.argtypes = [U8, ctypes.c_int, ctypes.c_int, I32]
        _lib = lib
        AVAILABLE = True
        return lib


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def offset_polygon(poly: np.ndarray, distance: float) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    p = np.ascontiguousarray(poly, np.float64)
    out = np.empty_like(p)
    rc = lib.mr_offset_polygon(_dptr(p), len(p), float(distance), _dptr(out))
    return out.astype(np.float32) if rc == 0 else None


def polygon_iou(p1: np.ndarray, p2: np.ndarray) -> Optional[float]:
    lib = _load()
    if lib is None:
        return None
    a = np.ascontiguousarray(p1, np.float64)
    b = np.ascontiguousarray(p2, np.float64)
    inter = lib.mr_polygon_inter_area(_dptr(a), len(a), _dptr(b), len(b))
    ua = lib.mr_polygon_area(_dptr(a), len(a)) + lib.mr_polygon_area(_dptr(b), len(b)) - inter
    return inter / ua if ua > 0 else 0.0


def polygon_intersection_area(p1: np.ndarray, p2: np.ndarray) -> Optional[float]:
    lib = _load()
    if lib is None:
        return None
    a = np.ascontiguousarray(p1, np.float64)
    b = np.ascontiguousarray(p2, np.float64)
    return lib.mr_polygon_inter_area(_dptr(a), len(a), _dptr(b), len(b))


def batch_quad_iou(preds: np.ndarray, gts: np.ndarray) -> Optional[np.ndarray]:
    """preds (P, 4, 2), gts (G, 4, 2) -> IoU matrix (P, G)."""
    lib = _load()
    if lib is None:
        return None
    p = np.ascontiguousarray(preds, np.float64)
    g = np.ascontiguousarray(gts, np.float64)
    out = np.zeros((len(p), len(g)), np.float64)
    lib.mr_batch_quad_iou(_dptr(p), len(p), _dptr(g), len(g), _dptr(out))
    return out


def connected_components(mask: np.ndarray) -> Optional[np.ndarray]:
    """(H, W) bool -> int32 labels, 0 = background, 1..n components."""
    lib = _load()
    if lib is None:
        return None
    m = np.ascontiguousarray(mask, np.uint8)
    labels = np.zeros(m.shape, np.int32)
    lib.mr_connected_components(
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        m.shape[0],
        m.shape[1],
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return labels
