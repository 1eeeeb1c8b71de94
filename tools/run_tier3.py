#!/usr/bin/env python
"""Tier-3 regression gate (the reference's bag-replay CI stage,
test/CMakeLists.txt:120-168) on the committed synthetic drive.

Applies the reference's exact gate math:
  - compare_pose.cpp:89-98 — every output pose within 0.3 m of the
    time-interpolated reference trajectory AND within 3 sigma of the
    self-reported covariance per axis;
  - compare_tf.cpp:84-85 — the TF-composed (smoothed) pose agrees with
    the published pose within 0.05 m.
Run twice, with and without IMU, like test/CMakeLists.txt:147-159.

Prints one JSON object (committed as docs/TIER3_GATE.json).  Pass
``--log bag.npz`` to gate a converted real bag instead (the math is
identical; only the input changes).

Usage: python tools/run_tier3.py [--log converted_bag.npz]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def run_gate(log, use_imu=True):
    from mcl_3dl_tpu import MCL3DL, Params
    from mcl_3dl_tpu.io.replay import IMU, ReplayDriver
    from tools.make_tier3_log import TIER3_PARAMS

    if not use_imu:
        # drop IMU events (the no-imu rostest variant)
        keep = log.kinds != IMU
        import dataclasses
        log = dataclasses.replace(
            log,
            times=log.times[keep], kinds=log.kinds[keep],
            odom_pos=log.odom_pos[keep], odom_rot=log.odom_rot[keep],
            imu_acc=log.imu_acc[keep], imu_rot=log.imu_rot[keep],
            cloud_start=log.cloud_start[keep], cloud_len=log.cloud_len[keep],
            cloud_origin=log.cloud_origin[keep],
            cloud_frame=log.cloud_frame[keep],
        )
    eng = MCL3DL(Params(**TIER3_PARAMS))
    driver = ReplayDriver(eng, log)
    driver.run()
    max_err, violations = driver.compare_to_reference(0.3)
    tf_diff, tf_violations = driver.compare_tf(0.05)
    return {
        "poses": len(driver.poses),
        "max_error_m": round(float(max_err), 4),
        "tolerance_m": 0.3,
        "pose_violations": len(violations),
        "max_tf_diff_m": round(float(tf_diff), 4),
        "tf_tolerance_m": 0.05,
        "tf_violations": len(tf_violations),
        "pass": not violations and not tf_violations,
    }


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", default=None,
                    help="converted real bag (ReplayLog npz); default: "
                         "the committed synthetic drive")
    args = ap.parse_args()

    from mcl_3dl_tpu.io.replay import ReplayLog
    from tools.make_tier3_log import build_log

    if args.log:
        log = ReplayLog.load(args.log)
        source = os.path.basename(args.log)
    else:
        log = build_log()
        source = "synthetic_circuit_v1 (tools/make_tier3_log.py, seed 0)"

    result = {
        "source": source,
        "with_imu": run_gate(log, use_imu=True),
        "no_imu": run_gate(log, use_imu=False),
    }
    result["pass"] = result["with_imu"]["pass"] and result["no_imu"]["pass"]
    print(json.dumps(result, indent=1))
    sys.exit(0 if result["pass"] else 1)


if __name__ == "__main__":
    main()
