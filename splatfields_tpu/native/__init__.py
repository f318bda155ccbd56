"""Native (C++) host-runtime components with ctypes bindings.

Builds ``libhullcarve.so`` on first use with the system toolchain (g++) and
caches it next to the source; every entry point has a NumPy fallback so the
framework works without a compiler. See hullcarve.cpp for the kernel.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build_and_load():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        here = os.path.dirname(os.path.abspath(__file__))
        src = os.path.join(here, "hullcarve.cpp")
        so = os.path.join(here, "libhullcarve.so")
        try:
            if (not os.path.exists(so)
                    or os.path.getmtime(so) < os.path.getmtime(src)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     "-pthread", src, "-o", so],
                    check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(so)
            lib.carve_points.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int32, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32,
            ]
            lib.carve_points.restype = None
            _LIB = lib
        except (OSError, subprocess.SubprocessError) as e:  # no toolchain
            print(f"native hullcarve unavailable ({e}); using NumPy fallback")
            _LIB = None
        return _LIB


def available() -> bool:
    return _build_and_load() is not None


def carve_points(points: np.ndarray, mats: np.ndarray, masks: list,
                 mode: int, n_threads: int = 0) -> np.ndarray:
    """Multithreaded mask carving. Returns keep mask [n_pts] bool.

    Args:
        points: [N, 3] float32.
        mats: mode 0: [C, 4, 4] transposed full projections;
              mode 1: [C, 3, 4] KRT pixel projections.
        masks: list of [H, W] arrays (any numeric dtype; nonzero = inside).
        mode: projection convention (see hullcarve.cpp).
    """
    lib = _build_and_load()
    if lib is None:
        raise RuntimeError("native carve unavailable")
    pts = np.ascontiguousarray(points, np.float32)
    m = np.ascontiguousarray(mats, np.float32)
    n_cams = len(masks)
    widths = np.array([mk.shape[1] for mk in masks], np.int32)
    heights = np.array([mk.shape[0] for mk in masks], np.int32)
    flat = np.concatenate(
        [np.ascontiguousarray((mk != 0), np.uint8).reshape(-1)
         for mk in masks])
    offsets = np.zeros(n_cams, np.int64)
    acc = 0
    for i, mk in enumerate(masks):
        offsets[i] = acc
        acc += mk.size
    keep = np.zeros(pts.shape[0], np.uint8)

    lib.carve_points(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(pts.shape[0]),
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        widths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        heights.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int32(n_cams), ctypes.c_int32(mode),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int32(n_threads),
    )
    return keep.astype(bool)
