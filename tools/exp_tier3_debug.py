"""Per-pose diagnostic replay of the Tier-3 v2 drive (tuning tool)."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from mcl_3dl_tpu import MCL3DL, Params
    from mcl_3dl_tpu.io.replay import ReplayDriver
    from tools.make_tier3_log import TIER3_PARAMS, build_log

    kidnap = "--kidnap" in sys.argv
    steps = int(sys.argv[sys.argv.index("--steps") + 1]) if "--steps" in sys.argv else 30
    log = build_log(n_steps=steps, kidnap_step=24 if kidnap else -1)
    eng = MCL3DL(Params.from_dict(TIER3_PARAMS))
    driver = ReplayDriver(eng, log)

    gl = "--gl" in sys.argv
    called = [0]

    def on_pose(t, res):
        if gl and res.expanded and not called[0]:
            from mcl_3dl_tpu.math import quat_np as mqn
            yw = float(mqn.to_rpy(np.asarray(res.rot, np.float64))[2])
            n = eng.global_localization_correlative(
                num_seeds=512, yaw_prior=(yw, 0.4),
                seed_z=float(res.pos[2]))
            called[0] = 1
            pos, rot, w = eng.get_particles()
            from mcl_3dl_tpu.math import quat_np as mqn
            order = np.argsort(-w)[:8]
            print(f"  -> correlative GL seeded {n} particles; top seeds:")
            for k in order:
                rpy = mqn.to_rpy(np.asarray(rot[k], np.float64))
                print(f"     w={w[k]:.4f} pos={np.round(pos[k],2)} "
                      f"yaw={rpy[2]:+.2f}")
            imu_rpy = mqn.to_rpy(np.asarray(eng.imu_quat, np.float64))
            print(f"     imu rpy={np.round(imu_rpy,2)}")
        j = np.searchsorted(log.ref_times, t)
        j = min(max(j, 1), len(log.ref_times) - 1)
        t0, t1 = log.ref_times[j - 1], log.ref_times[j]
        a = 0.0 if t1 == t0 else (t - t0) / (t1 - t0)
        ref = (1 - a) * log.ref_pos[j - 1] + a * log.ref_pos[j]
        err = np.linalg.norm(np.asarray(res.pos) - ref)
        tfd = np.linalg.norm(np.asarray(res.pos) - np.asarray(res.raw_pos))
        print(f"t={t:5.2f} err={err:6.3f} tf={tfd:6.3f} "
              f"mr=[{res.match_ratio_min:5.2f},{res.match_ratio_max:5.2f}] "
              f"exp={int(res.expanded)} jump={int(res.jumped)} "
              f"pos={np.round(np.asarray(res.pos),2)} ref={np.round(ref,2)}")

    driver.on_pose = on_pose
    driver.run()


if __name__ == "__main__":
    main()
