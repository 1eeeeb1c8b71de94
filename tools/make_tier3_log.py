#!/usr/bin/env python
"""Generate the committed Tier-3 regression log (synthetic stand-in for
short_test3.bag, test/CMakeLists.txt:122-132).

The image has no network access, so the reference's MD5-pinned bag
cannot be fetched; this generator produces a DETERMINISTIC recorded
drive — a circuit through an asymmetric room with drifting odometry,
IMU, and simulated scans, plus the embedded ground-truth trajectory —
in the same ReplayLog format ``tools/bag_to_npz.py`` emits for real
bags.  ``tools/run_tier3.py`` replays it through the engine and applies
the reference's EXACT gate math (compare_pose.cpp:89-98 position +
3-sigma consistency; compare_tf.cpp:84-85 TF agreement).  When the real
bag becomes obtainable, convert it with bag_to_npz.py and point
run_tier3.py at it — the gates are identical.

Usage: python tools/make_tier3_log.py out.npz [--steps 25]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def build_log(n_steps=50, seed=0):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from worlds import make_room, simulate_scan

    from mcl_3dl_tpu.io.replay import CLOUD, IMU, ODOM, ReplayLog
    from mcl_3dl_tpu.math import quat_np as mqn

    room = make_room(x0=-6, x1=6, y0=-6, y1=6, grid=0.15)
    zz = np.arange(0.0, 2.0, 0.2)
    yy = np.arange(2.0, 3.0, 0.2)
    xx = np.arange(3.0, 4.0, 0.2)
    gx, gy, gz = np.meshgrid(xx, yy, zz, indexing="ij")
    room = np.concatenate(
        [room, np.stack([gx.ravel(), gy.ravel(), gz.ravel()], 1)])

    rng = np.random.default_rng(seed)
    times, kinds = [], []
    opos, orot, iacc, irot = [], [], [], []
    cstart, clen, corig, cframe = [], [], [], []
    rt, rp, rr = [], [], []
    allpts = []
    drift = np.zeros(3)
    t = 0.0

    def pad(skip_odom=False, skip_imu=False, skip_cloud=False):
        if not skip_odom:
            opos.append(np.zeros(3)); orot.append(np.zeros(4))
        if not skip_imu:
            iacc.append(np.zeros(3)); irot.append(np.zeros(4))
        if not skip_cloud:
            cstart.append(0); clen.append(0)
            corig.append(np.zeros(3)); cframe.append(0)

    # 10 Hz updates with ~2 cm/s odometric drift — the regime of the
    # reference's demo bag (README.md:56-68); the TF gate (0.05 m LPF
    # lag budget, compare_tf.cpp:84-85) is only meaningful at realistic
    # drift rates, since the smoothed map->odom transform lags the
    # drift-correction rate, not the robot velocity
    for i in range(n_steps):
        ang = 2.0 * np.pi * i / 80.0
        tp = np.array([-3.0 * np.cos(ang), -3.0 * np.sin(ang), 0.4],
                      np.float32)
        yaw = ang + np.pi / 2
        tr = mqn.from_rpy(np.array([0.0, 0.0, yaw])).astype(np.float32)
        drift += rng.normal(0, 0.001, 3) + np.array([0.001, 0.0, 0.0])
        drift[2] = 0.0
        op = tp + drift
        t += 0.1
        times.append(t); kinds.append(ODOM)
        opos.append(op); orot.append(tr); pad(skip_odom=True)
        acc = mqn.rotate(mqn.inv(tr), np.array([0.0, 0.0, 1.0]))
        times.append(t + 0.001); kinds.append(IMU)
        iacc.append(acc); irot.append(tr); pad(skip_imu=True)
        sb = simulate_scan(room, tp, tr, n_rays=512, seed=i, noise=0.005)
        so = mqn.rotate(tr, sb) + op
        times.append(t + 0.002); kinds.append(CLOUD)
        cstart.append(sum(len(a) for a in allpts)); clen.append(len(so))
        corig.append(op); cframe.append(0)
        allpts.append(so); pad(skip_cloud=True)
        rt.append(t + 0.002); rp.append(tp); rr.append(tr)

    return ReplayLog(
        times=np.asarray(times), kinds=np.asarray(kinds, np.int32),
        odom_pos=np.asarray(opos, np.float32),
        odom_rot=np.asarray(orot, np.float32),
        imu_acc=np.asarray(iacc, np.float32),
        imu_rot=np.asarray(irot, np.float32),
        cloud_start=np.asarray(cstart, np.int64),
        cloud_len=np.asarray(clen, np.int64),
        cloud_origin=np.asarray(corig, np.float32),
        cloud_frame=np.asarray(cframe, np.int32),
        cloud_points=np.concatenate(allpts).astype(np.float32),
        map_points=room.astype(np.float32),
        ref_times=np.asarray(rt), ref_pos=np.asarray(rp, np.float32),
        ref_rot=np.asarray(rr, np.float32),
    )


TIER3_PARAMS = dict(
    num_particles=256,
    init_x=-3.0, init_y=0.0, init_z=0.4, init_yaw=float(np.pi / 2),
    init_var_x=0.2, init_var_y=0.2, init_var_z=0.05,
    init_var_roll=0.02, init_var_pitch=0.02, init_var_yaw=0.1,
    use_beam_model=False,
    odom_err_lin_lin=0.1, odom_err_lin_ang=0.05,
    accum_cloud=0, seed=11,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    log = build_log(args.steps, args.seed)
    log.save(args.out)
    print(f"wrote {args.out}: {len(log.times)} events, "
          f"{len(log.map_points)} map points")


if __name__ == "__main__":
    main()
