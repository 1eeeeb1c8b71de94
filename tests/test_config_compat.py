"""Config loading and synthetic-sensor (fake_imu / fake_odom) tests."""

import numpy as np
import pytest

from mcl_3dl_tpu.config import Params
from mcl_3dl_tpu.engine import MCL3DL

from worlds import make_room


def test_from_dict_nested_and_legacy():
    p = Params.from_dict({
        "num_particles": 128,
        "likelihood": {"num_points": 48, "match_dist_min": 0.25},
        "beam": {"num_points": 5},
        # legacy flat names (compatibility.h rename table)
        "clip_far": 8.0,
        "num_points_beam": 7,        # overridden by nested? last wins
        "ang_total_ref": 0.5,
    })
    assert p.num_particles == 128
    assert p.likelihood.num_points == 48
    assert p.likelihood.match_dist_min == 0.25
    assert p.likelihood.clip_far == 8.0
    assert p.beam.ang_total_ref == 0.5


def test_from_dict_defaults_match_reference():
    p = Params.from_dict({})
    # spot-check reference defaults (src/parameters.cpp)
    assert p.num_particles == 64
    assert p.likelihood.num_points == 96
    assert p.likelihood.num_points_global == 8
    assert p.beam.num_points == 3
    assert p.beam.clip_far == 4.0
    assert p.map_downsample_x == 0.1
    assert p.global_localization_div_yaw == 12  # round(2pi/0.524)
    assert p.dist_weight == (1.0, 1.0, 5.0)
    assert p.odom_err_integ_lin_tc == 10.0


def test_fake_imu_and_fake_odom_exclusive():
    with pytest.raises(ValueError):
        Params(fake_imu=True, fake_odom=True)


def test_fake_imu_synthesizes_imu_from_odometry():
    eng = MCL3DL(Params(fake_imu=True, num_particles=32, use_beam_model=False))
    eng.load_map(make_room(grid=0.3))
    q = np.array([0, 0, 0, 1.0], np.float32)
    eng.odometry(np.zeros(3), q, 0.0)   # first msg returns early (:211-217)
    assert not eng.has_imu
    eng.odometry(np.array([0.1, 0, 0]), q, 0.2)
    assert eng.has_odom and eng.has_imu  # second odom fed the fake IMU


def test_fake_odom_synthesizes_odometry_from_imu():
    eng = MCL3DL(Params(fake_odom=True, num_particles=32, use_beam_model=False))
    eng.load_map(make_room(grid=0.3))
    up = np.array([0.0, 0.0, 1.0], np.float32)
    q = np.array([0, 0, 0, 1.0], np.float32)
    eng.imu(up, q, 0.0)
    eng.imu(up, q, 0.2)
    assert eng.has_odom  # fake odom fed from IMU orientation
