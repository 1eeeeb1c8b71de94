"""Moving-robot regression (synthetic stand-in for the short_test3.bag
Tier-3 gate, test/tests/localization_rostest.test.in): drive a circuit
through a room with drifting odometry + IMU + simulated scans; the
engine must track the true pose within the reference's 0.3 m budget and
stay 3-sigma consistent (compare_pose.cpp:89-98)."""

import numpy as np

from mcl_3dl_tpu.config import Params
from mcl_3dl_tpu.engine import MCL3DL
from mcl_3dl_tpu.math import quat_np as mqn

from worlds import make_room, simulate_scan


def test_trajectory_tracking_with_odom_drift():
    room = make_room(x0=-6, x1=6, y0=-6, y1=6, grid=0.15)
    # asymmetric pillar so yaw is observable
    zz = np.arange(0.0, 2.0, 0.2)
    yy = np.arange(2.0, 3.0, 0.2)
    xx = np.arange(3.0, 4.0, 0.2)
    gx, gy, gz = np.meshgrid(xx, yy, zz, indexing="ij")
    room = np.concatenate(
        [room, np.stack([gx.ravel(), gy.ravel(), gz.ravel()], axis=1)]
    )

    eng = MCL3DL(Params(
        num_particles=128,
        init_x=-3.0, init_y=0.0, init_z=0.4,
        init_yaw=np.pi / 2,     # trajectory starts facing +y
        init_var_x=0.2, init_var_y=0.2, init_var_z=0.05,
        init_var_roll=0.02, init_var_pitch=0.02, init_var_yaw=0.1,
        use_beam_model=False,
        odom_err_lin_lin=0.1, odom_err_lin_ang=0.05,
        # process every cloud immediately: the synthetic 0.2 s steps are
        # ~10x coarser than real scan rates, so the reference's
        # one-cloud accumulation lag would smear half a meter
        accum_cloud=0,
        seed=11,
    ))
    eng.load_map(room)

    rng = np.random.default_rng(0)
    n_steps = 25
    dt = 0.2
    # circuit: arc around the room at radius 3
    errors = []
    drift = np.zeros(3)
    t = 0.0
    for i in range(n_steps):
        ang = 2.0 * np.pi * i / 40.0
        true_pos = np.array([-3.0 * np.cos(ang), -3.0 * np.sin(ang), 0.4],
                            np.float32)
        yaw = ang + np.pi / 2
        true_rot = mqn.from_rpy(np.array([0.0, 0.0, yaw])).astype(np.float32)

        # odometry: truth + slowly accumulating translation drift
        drift += rng.normal(0, 0.004, 3) + np.array([0.004, 0.0, 0.0])
        drift[2] = 0.0
        odom_pos = true_pos + drift
        t += dt
        eng.odometry(odom_pos, true_rot, t)

        # IMU: gravity in base frame from the true attitude
        acc = mqn.rotate(mqn.inv(true_rot), np.array([0.0, 0.0, 1.0]))
        eng.imu(acc.astype(np.float32), true_rot, t + 0.001)

        # scan from the true pose, pushed in odom frame
        scan_base = simulate_scan(room, true_pos, true_rot, n_rays=256,
                                  seed=i, noise=0.01)
        scan_odom = mqn.rotate(true_rot, scan_base) + odom_pos
        res = eng.push_cloud("lidar0", scan_odom, odom_pos, t + 0.002)
        if res is not None and res.pos is not None and i >= 3:
            err_vec = np.asarray(res.raw_pos) - true_pos
            errors.append(np.linalg.norm(err_vec))
            # 3-sigma consistency on the smoothed/published covariance
            cov = np.asarray(res.cov)
            for axis in range(3):
                sigma = np.sqrt(max(cov[axis, axis], 1e-12))
                assert abs(err_vec[axis]) <= 3.0 * sigma + 0.15, (
                    i, axis, err_vec, sigma,
                )

    errors = np.asarray(errors)
    assert len(errors) >= 15
    # reference gate: position error <= 0.3 m (localization_rostest.test.in:9)
    assert errors[5:].max() < 0.3, errors
    assert errors[-1] < 0.2, errors[-5:]
