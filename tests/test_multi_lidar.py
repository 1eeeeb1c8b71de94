"""Dual-LIDAR accumulation with per-cloud beam origins (the reference's
label-tagged accumulation, src/mcl_3dl.cpp:274-302 + origins collection
:343-359, consumed by the beam model at
lidar_measurement_model_beam.cpp:142-145)."""

import numpy as np
import jax.numpy as jnp

from mcl_3dl_tpu.config import Params
from mcl_3dl_tpu.engine import MCL3DL
from mcl_3dl_tpu.models.beam import BeamStatus, beam_measure
from mcl_3dl_tpu.math import quat as mq

from worlds import make_room, simulate_scan


def test_dual_lidar_accumulation_and_measure():
    room = make_room(grid=0.15)
    eng = MCL3DL(Params(
        num_particles=64, accum_cloud=2, use_beam_model=True,
        init_x=0.0, init_y=0.0, init_z=0.5,
        init_var_x=0.2, init_var_y=0.2, init_var_z=0.05, seed=3,
    ))
    eng.load_map(room)
    eng.odometry(np.zeros(3), np.array([0, 0, 0, 1.0]), 0.0)

    true_pos = np.array([0.0, 0.0, 0.5], np.float32)
    rot = np.array([0, 0, 0, 1.0], np.float32)
    # sensor a on the left, sensor b on the right of base_link
    off_a = np.array([0.0, 0.3, 0.1], np.float32)
    off_b = np.array([0.0, -0.3, 0.1], np.float32)

    results = []
    t = 0.0
    for i in range(6):
        for key, off in (("a", off_a), ("b", off_b)):
            t += 0.05
            scan = simulate_scan(room, true_pos + off, rot, n_rays=96,
                                 seed=i * 2 + (key == "b"))
            scan_odom = scan + (true_pos + off)
            results.append(
                eng.push_cloud(key, scan_odom, true_pos + off, t)
            )
    fired = [r for r in results if r is not None and r.pos is not None]
    assert len(fired) >= 2
    # a round holds accum_cloud occurrences of the first key plus the
    # other sensor's clouds (cloud_accum.cpp:82-96)
    assert len(eng._accum_origins) <= 4
    err = np.linalg.norm(np.asarray(fired[-1].raw_pos) - true_pos)
    assert err < 0.35, fired[-1].raw_pos


def test_beam_origins_respected_per_label():
    # wall at x=2 + back wall; sensor origin far forward means the beam
    # to the wall is SHORT/HIT depending on which origin the label picks
    ys = np.arange(-3, 3, 0.1)
    zs = np.arange(-1, 1, 0.1)
    gy, gz = np.meshgrid(ys, zs, indexing="ij")
    wall = np.stack([np.full(gy.size, 2.0), gy.ravel(), gz.ravel()], 1)
    back = np.stack([np.full(gy.size, -4.0), gy.ravel(), gz.ravel()], 1)
    world = np.concatenate([wall, back])

    from mcl_3dl_tpu.map.distance_field import build_distance_field
    from mcl_3dl_tpu.map.occupancy import build_occupancy_grid

    df = build_distance_field(world, 0.1, 0.6)
    occ = build_occupancy_grid(world, 0.2)

    origins = jnp.asarray([[0.0, 0.0, 0.0], [1.8, 0.0, 0.0]], jnp.float32)
    scan = jnp.asarray([[2.0, 0.0, 0.0]] * 2, jnp.float32)
    labels = jnp.asarray([0, 1], jnp.int32)

    kwargs = dict(
        use_dda=False, map_grid_min=0.1, map_grid_max=0.1, hit_range=0.3,
        beam_likelihood_min=0.2, num_points_default=2,
        sin_total_ref=0.5, filter_label_max=0xFFFFFFFF,
        add_penalty_short_only_mode=True, num_steps=64,
    )
    _, _, status = beam_measure(
        df, occ, jnp.zeros((1, 3), jnp.float32), mq.identity()[None, :],
        scan, labels, jnp.ones(2, bool), origins, **kwargs,
    )
    # both beams end at the wall; origin 0 travels 2 m, origin 1 only
    # 0.2 m — both classify HIT (collision within hit_range of endpoint)
    assert int(status[0, 0]) == BeamStatus.HIT
    assert int(status[0, 1]) in (BeamStatus.HIT, BeamStatus.LONG)
