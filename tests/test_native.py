"""Native map-compiler parity: C++ splat == numpy splat."""

import numpy as np
import pytest

from mcl_3dl_tpu.map import native
from mcl_3dl_tpu.map.distance_field import build_distance_field


@pytest.mark.skipif(not native.native_available(), reason="native lib absent")
def test_native_distance_field_matches_numpy():
    rng = np.random.default_rng(0)
    points = rng.uniform(-1.0, 1.0, (300, 3))
    cell, trunc = 0.05, 0.4

    # numpy path: force fallback by calling through the module with the
    # native loader monkeypatched off
    orig = native.build_distance_field_native
    try:
        native.build_distance_field_native = lambda *a, **k: None
        df_np = build_distance_field(points, cell, trunc)
    finally:
        native.build_distance_field_native = orig
    df_nat = build_distance_field(points, cell, trunc)

    a = np.asarray(df_np.field)
    b = np.asarray(df_nat.field)
    assert a.shape == b.shape
    # uint8 quantization: allow 1 lsb of difference from float rounding
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


@pytest.mark.skipif(not native.native_available(), reason="native lib absent")
def test_native_occupancy_matches_numpy():
    rng = np.random.default_rng(1)
    points = rng.uniform(0.0, 3.0, (500, 3))
    labels = rng.integers(0, 5, 500).astype(np.uint32)
    origin = points.min(axis=0)
    dims = ((points.max(axis=0) - origin) / 0.2).astype(np.int64) + 1

    out = native.build_occupancy_native(points, labels, 0.2, origin, dims)
    assert out is not None
    occupied, min_label, mean_off = out

    from mcl_3dl_tpu.map.occupancy import build_occupancy_grid

    grid = build_occupancy_grid(points, 0.2, labels)
    assert (np.asarray(grid.occupied).reshape(-1) == occupied).all()
    got_lbl = np.asarray(grid.min_label).reshape(-1)
    assert (got_lbl == min_label).all()
