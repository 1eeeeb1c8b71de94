"""Correlative (FFT) global localization tests."""

import numpy as np
import pytest
import jax.numpy as jnp

from mcl_3dl_tpu.config import Params
from mcl_3dl_tpu.engine import MCL3DL
from mcl_3dl_tpu.map.correlative import (
    build_planar_field,
    correlate_scan,
    top_candidates,
)
from mcl_3dl_tpu.map.distance_field import build_distance_field

from worlds import make_room, simulate_scan


def test_planar_field_peaks_at_walls():
    # wall at x=2: collapsed planar contribution peaks along that line
    ys = np.arange(-2, 2, 0.1)
    zs = np.arange(0, 1, 0.1)
    gy, gz = np.meshgrid(ys, zs, indexing="ij")
    wall = np.stack([np.full(gy.size, 2.0), gy.ravel(), gz.ravel()], axis=1)
    df = build_distance_field(wall, 0.1, 0.5)
    f2 = build_planar_field(df, 0.2, 0.05, 5.0, -np.inf, np.inf, pad_cells=16)
    w2 = np.asarray(f2.w2)
    nx, ny = f2.shape_unpadded
    # the wall's x column should contain the max contribution
    col_sums = w2[:nx, :ny].sum(axis=1)
    peak_x = float(df.origin[0]) + col_sums.argmax() * df.cell
    assert abs(peak_x - 2.0) < 0.15


def test_correlation_recovers_translation():
    rng = np.random.default_rng(0)
    # L-shaped point set (asymmetric)
    pts = np.concatenate([
        np.stack([np.arange(0, 2, 0.1), np.zeros(20), np.zeros(20)], 1),
        np.stack([np.zeros(10), np.arange(0, 1, 0.1), np.zeros(10)], 1),
    ])
    df = build_distance_field(pts, 0.1, 0.5)
    f2 = build_planar_field(df, 0.2, 0.05, 5.0, -np.inf, np.inf, pad_cells=40)
    # "scan" = the same shape observed from a sensor at (0.7, 0.3)
    sensor = np.array([0.7, 0.3])
    scan_xy = pts[:, :2] - sensor
    scores = correlate_scan(
        f2, jnp.asarray(scan_xy, jnp.float32), jnp.asarray([0.0], jnp.float32)
    )
    xs, ys, yaw_i, vals = top_candidates(scores, f2, 5)
    best = np.array([float(xs[0]), float(ys[0])])
    assert np.linalg.norm(best - sensor) < 0.15, (best, sensor)
    assert int(yaw_i[0]) == 0


@pytest.mark.slow
def test_correlative_global_localization_end_to_end():
    room = make_room(grid=0.15)
    # asymmetric pillar
    zz = np.arange(0.0, 2.0, 0.15)
    yy = np.arange(-2.5, -1.5, 0.15)
    xx = np.arange(2.5, 3.5, 0.15)
    gx, gy, gz = np.meshgrid(xx, yy, zz, indexing="ij")
    room = np.concatenate(
        [room, np.stack([gx.ravel(), gy.ravel(), gz.ravel()], axis=1)]
    )

    eng = MCL3DL(Params(
        num_particles=64, use_beam_model=False, seed=5,
        init_x=-4.0, init_y=-4.0,   # wrong prior
        init_var_x=0.1, init_var_y=0.1,
    ))
    eng.load_map(room)

    true_pos = np.array([1.0, 0.5, 0.0], np.float32)
    rot = np.array([0, 0, 0, 1], np.float32)
    scan = simulate_scan(room, true_pos, rot, n_rays=256,
                         fov_elev=(0.05, 0.5), seed=0)
    n = eng.global_localization_correlative(
        num_seeds=256, scan_points_base=scan
    )
    assert n > 0
    pos, _, w = eng.get_particles()
    d = np.linalg.norm(pos[:, :2] - true_pos[:2], axis=1)
    # the highest-weight seed is the truth (score-weighted seeding)
    assert d[w.argmax()] < 0.3, (pos[w.argmax()], true_pos)
    assert d.min() < 0.3, d.min()

    # refinement keeps the true mode alive and decays the particle count
    # (the reference's global-loc test likewise asserts a particle near
    # the truth, test_global_localization.cpp:179-327; the square room's
    # rotational near-symmetry makes full mean convergence slow for any
    # likelihood-field filter)
    res = None
    for i in range(8):
        s = simulate_scan(room, true_pos, rot, n_rays=192,
                          fov_elev=(0.05, 0.5), seed=i + 1)
        res = eng.measure_direct(s, np.zeros((1, 3), np.float32),
                                 np.zeros(len(s), np.int32), 0.1 * (i + 1))
    pos, _, w = eng.get_particles()
    d = np.linalg.norm(pos[:, :2] - true_pos[:2], axis=1)
    assert d.min() < 0.3, d.min()
    assert res.particle_size == eng.params.num_particles
