#!/usr/bin/env python
"""Replay a converted log through the localizer (the offline equivalent
of launching the reference node on a bag).

Usage:
  python tools/run_replay.py log.npz [--params config.yaml]
      [--out trajectory.npz] [--compare] [--tolerance 0.3]
      [--t-end SECONDS] [--cpu]

``--params`` accepts a YAML file with the reference's parameter names
(nested ``likelihood:`` / ``beam:`` namespaces or the legacy flat names
— same loader as Params.from_dict).  ``--compare`` applies the
compare_pose.cpp regression gates against the log's embedded reference
trajectory.
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("log")
    ap.add_argument("--params", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--compare", action="store_true")
    ap.add_argument("--tolerance", type=float, default=0.3)
    ap.add_argument("--t-end", type=float, default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from mcl_3dl_tpu import MCL3DL, Params
    from mcl_3dl_tpu.io.replay import ReplayDriver, ReplayLog

    if args.params:
        import yaml
        with open(args.params) as f:
            params = Params.from_dict(yaml.safe_load(f) or {})
    else:
        params = Params()

    log = ReplayLog.load(args.log)
    print(f"log: {len(log.times)} events, map {len(log.map_points)} points")

    eng = MCL3DL(params)
    driver = ReplayDriver(eng, log)
    t0 = time.monotonic()
    poses = driver.run(t_end=args.t_end)
    wall = time.monotonic() - t0
    span = (log.times[-1] - log.times[0]) if len(log.times) else 0.0
    print(f"{len(poses)} pose outputs in {wall:.1f}s wall "
          f"({span / max(wall, 1e-9):.2f}x realtime)")

    if args.out and poses:
        np.savez_compressed(
            args.out,
            times=np.asarray([p[0] for p in poses]),
            pos=np.stack([p[1] for p in poses]),
            rot=np.stack([p[2] for p in poses]),
            cov=np.stack([p[3] for p in poses]),
        )
        print(f"wrote {args.out}")

    if args.compare:
        max_err, violations = driver.compare_to_reference(args.tolerance)
        tf_diff, tf_violations = driver.compare_tf()
        print(json.dumps({
            "max_error_m": float(max_err),
            "tolerance_m": args.tolerance,
            "violations": len(violations),
            "max_tf_diff_m": float(tf_diff),
            "tf_violations": len(tf_violations),
            "pass": not violations and not tf_violations,
        }))
        if violations or tf_violations:
            for v in (violations + tf_violations)[:10]:
                print("  violation:", v, file=sys.stderr)
            sys.exit(1)


if __name__ == "__main__":
    main()
