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
def test_native_occupancy_rep_matches_numpy():
    """build_occupancy_grid routes through the native REP_POINTS builder
    when available; the numpy fallback must produce a BIT-IDENTICAL grid
    (same stride-sampled representatives, same uint8 quantization)."""
    rng = np.random.default_rng(1)
    points = rng.uniform(0.0, 3.0, (500, 3))
    labels = rng.integers(0, 5, 500).astype(np.uint32)

    from mcl_3dl_tpu.map.occupancy import build_occupancy_grid

    grid_nat = build_occupancy_grid(points, 0.2, labels)

    orig = native.build_occupancy_rep_native
    try:
        native.build_occupancy_rep_native = lambda *a, **k: None
        grid_np = build_occupancy_grid(points, 0.2, labels)
    finally:
        native.build_occupancy_rep_native = orig

    assert (np.asarray(grid_nat.occupied)
            == np.asarray(grid_np.occupied)).all()
    assert (np.asarray(grid_nat.min_label)
            == np.asarray(grid_np.min_label)).all()
    assert (np.asarray(grid_nat.rep_point)
            == np.asarray(grid_np.rep_point)).all()
    np.testing.assert_allclose(np.asarray(grid_nat.origin),
                               np.asarray(grid_np.origin))
