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
        # AttributeError: a stale .so from before a symbol rename — the
        # library is a pure speedup, so fall back to numpy rather than
        # crash map loading
        lib = ctypes.CDLL(_LIB_PATH)
        lib.mcl3dl_build_distance_field.restype = ctypes.c_int
        lib.mcl3dl_build_distance_field.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.c_double, ctypes.c_double,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        lib.mcl3dl_build_occupancy_rep.restype = ctypes.c_int
        lib.mcl3dl_build_occupancy_rep.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_int64, ctypes.c_double,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
    except (OSError, AttributeError):
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


def build_occupancy_rep_native(
    points: np.ndarray, labels: Optional[np.ndarray], cell: float,
    origin: np.ndarray, dims, rep_points: int,
):
    """Occupancy/min-label/representative-point build in C++ — the
    native twin of ``occupancy.build_occupancy_grid`` (identical
    REP_POINTS stride sampling and uint8 offset quantization, so the
    grids are bit-identical).

    Returns flat ``(occupied bool [V], min_label u32 [V],
    rep_offsets u8 [V, rep_points, 3])`` or None when unavailable.
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
    rep = np.full(total * rep_points * 3, 127, np.uint8)
    rc = lib.mcl3dl_build_occupancy_rep(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        lbl.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)) if lbl is not None
        else None,
        pts.shape[0], float(cell),
        org.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        nx, ny, nz, int(rep_points),
        occupied.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        min_label.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        rep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        return None
    return (occupied.astype(bool), min_label,
            rep.reshape(total, rep_points, 3))
