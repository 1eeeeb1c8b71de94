"""ctypes loader for the native map compiler (native/map_builder.cpp).

The shared library is built by ``make -C native`` (or lazily here on
first use if a compiler is available).  Python/numpy fallbacks exist for
every function, so the native library is a pure speedup.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libmcl3dl_native.so"))
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR), "-s"],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.mcl3dl_build_distance_field.restype = ctypes.c_int
        lib.mcl3dl_build_distance_field.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.c_double, ctypes.c_double,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        lib.mcl3dl_build_occupancy.restype = ctypes.c_int
        lib.mcl3dl_build_occupancy.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_int64, ctypes.c_double,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def build_distance_field_native(
    points_scaled: np.ndarray, cell: float, trunc: float,
    origin: np.ndarray, dims, n_threads: int = 0,
) -> Optional[np.ndarray]:
    """Exact truncated distance splat in C++. Returns the float32 field
    [nx, ny, nz] or None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    nx, ny, nz = (int(d) for d in dims)
    pts = np.ascontiguousarray(points_scaled, np.float64)
    org = np.ascontiguousarray(origin, np.float64)
    field = np.full(nx * ny * nz, np.float32(trunc), np.float32)
    rc = lib.mcl3dl_build_distance_field(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        pts.shape[0], float(cell), float(trunc),
        org.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        nx, ny, nz,
        field.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        int(n_threads),
    )
    if rc != 0:
        return None
    return field.reshape(nx, ny, nz)


def build_occupancy_native(
    points: np.ndarray, labels: Optional[np.ndarray], cell: float,
    origin: np.ndarray, dims,
):
    """Occupancy/min-label/mean-point build in C++.

    Returns (occupied bool, min_label u32, mean_point u8 offsets) flat
    arrays, or None when unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    nx, ny, nz = (int(d) for d in dims)
    total = nx * ny * nz
    pts = np.ascontiguousarray(points, np.float64)
    lbl = (np.ascontiguousarray(labels, np.uint32)
           if labels is not None else None)
    org = np.ascontiguousarray(origin, np.float64)
    occupied = np.zeros(total, np.uint8)
    min_label = np.full(total, 0xFFFFFFFF, np.uint32)
    sum_xyz = np.zeros(total * 3, np.float32)
    count = np.zeros(total, np.int32)
    rc = lib.mcl3dl_build_occupancy(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        lbl.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)) if lbl is not None
        else None,
        pts.shape[0], float(cell),
        org.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        nx, ny, nz,
        occupied.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        min_label.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        sum_xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        count.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        return None
    cnt = np.maximum(count, 1)[:, None]
    mean = sum_xyz.reshape(total, 3) / cnt
    idx = np.stack(np.unravel_index(np.arange(total), (nx, ny, nz)), axis=1)
    off = mean / cell - (np.asarray(origin) / cell + idx)
    off_q = np.clip(np.round(off * 255.0), 0, 255).astype(np.uint8)
    off_q[count == 0] = 127
    return occupied.astype(bool), min_label, off_q
