"""ctypes loader for the native map compiler (native/map_builder.cpp).

The shared library is built by ``make -C native`` (or lazily here on
first use if a compiler is available).  Python/numpy fallbacks exist for
every function, so the native library is a pure speedup.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import warnings
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libmcl3dl_native.so"))
_funcs: Optional[dict] = None

_SIGNATURES = {
    "mcl3dl_build_distance_field": [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ],
    "mcl3dl_build_occupancy_rep": [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_uint32),
        ctypes.c_int64, ctypes.c_double,
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint8),
    ],
}


def _load_funcs() -> dict:
    """Bind each native entry point INDEPENDENTLY: a stale .so missing
    one (renamed) symbol must not silently disable the others — the
    library is a pure speedup, so each missing/failed symbol falls back
    to numpy with a one-line warning instead of crashing map loading."""
    global _funcs
    if _funcs is not None:
        return _funcs
    _funcs = {}
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR), "-s"],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return _funcs
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return _funcs
    for name, argtypes in _SIGNATURES.items():
        try:
            fn = getattr(lib, name)
        except AttributeError:
            warnings.warn(
                f"native map builder symbol {name} missing from "
                f"{_LIB_PATH} (stale build?) — using the numpy fallback; "
                f"rebuild with `make -C native`", RuntimeWarning)
            continue
        fn.restype = ctypes.c_int
        fn.argtypes = argtypes
        _funcs[name] = fn
    return _funcs


def _func(name: str):
    return _load_funcs().get(name)


def native_available() -> bool:
    return len(_load_funcs()) == len(_SIGNATURES)


def build_distance_field_native(
    points_scaled: np.ndarray, cell: float, trunc: float,
    origin: np.ndarray, dims, n_threads: int = 0,
) -> Optional[np.ndarray]:
    """Exact truncated distance splat in C++. Returns the float32 field
    [nx, ny, nz] or None when the native library is unavailable."""
    fn = _func("mcl3dl_build_distance_field")
    if fn is None:
        return None
    nx, ny, nz = (int(d) for d in dims)
    pts = np.ascontiguousarray(points_scaled, np.float64)
    org = np.ascontiguousarray(origin, np.float64)
    field = np.full(nx * ny * nz, np.float32(trunc), np.float32)
    rc = fn(
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
    fn = _func("mcl3dl_build_occupancy_rep")
    if fn is None:
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
    rc = fn(
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
