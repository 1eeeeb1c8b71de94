"""Checkpoint / resume.

The reference has none (SURVEY §5: state is lost on restart; closest
analogs are initialpose re-seed and the PCD dump).  Here resume is a
first-class feature: serialize the full filter pytree — particles,
weights, smoothing-filter states, odometry/IMU bookkeeping, and RNG key
— and restore it into a fresh engine bit-exactly.
"""

from __future__ import annotations

import json

import jax
import numpy as np

_FORMAT_VERSION = 1


def save_checkpoint(engine, path) -> None:
    arrays = {}

    def put(prefix, tree):
        leaves, _ = jax.tree.flatten(tree)
        for i, leaf in enumerate(leaves):
            arrays[f"{prefix}.{i}"] = np.asarray(leaf)

    put("pstate", engine.pstate)
    put("f_pos", engine.f_pos)
    put("f_ang", engine.f_ang)
    put("f_acc", engine.f_acc)
    put("localize_rate", engine.localize_rate)
    arrays["key"] = np.asarray(engine._key)
    arrays["state_prev_pos"] = np.asarray(engine.state_prev_pos)
    arrays["state_prev_rot"] = np.asarray(engine.state_prev_rot)
    arrays["odom_pos"] = engine.odom_pos
    arrays["odom_rot"] = engine.odom_rot
    arrays["odom_prev_pos"] = engine.odom_prev_pos
    arrays["odom_prev_rot"] = engine.odom_prev_rot
    arrays["imu_quat"] = engine.imu_quat

    meta = {
        "version": _FORMAT_VERSION,
        "has_odom": engine.has_odom,
        "has_imu": engine.has_imu,
        "odom_last": engine.odom_last,
        "imu_last": engine.imu_last,
        "tf_tolerance_base": engine.tf_tolerance_base,
        "localized_last": engine.localized_last,
        "global_localization_fix_cnt": engine.global_localization_fix_cnt,
        "cnt_measure": engine.cnt_measure,
        "tf_seeded": engine._tf_seeded,
    }
    np.savez_compressed(path, __meta__=json.dumps(meta), **arrays)


def load_checkpoint(engine, path) -> None:
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    if meta["version"] != _FORMAT_VERSION:
        raise ValueError(f"checkpoint version {meta['version']} unsupported")

    def get(prefix, template):
        leaves, treedef = jax.tree.flatten(template)
        new = [data[f"{prefix}.{i}"] for i in range(len(leaves))]
        import jax.numpy as jnp
        return jax.tree.unflatten(treedef, [jnp.asarray(a) for a in new])

    engine.pstate = get("pstate", engine.pstate)
    engine.f_pos = get("f_pos", engine.f_pos)
    engine.f_ang = get("f_ang", engine.f_ang)
    engine.f_acc = get("f_acc", engine.f_acc)
    engine.localize_rate = get("localize_rate", engine.localize_rate)
    engine._key = jax.numpy.asarray(data["key"])
    engine.state_prev_pos = jax.numpy.asarray(data["state_prev_pos"])
    engine.state_prev_rot = jax.numpy.asarray(data["state_prev_rot"])
    engine.odom_pos = data["odom_pos"]
    engine.odom_rot = data["odom_rot"]
    engine.odom_prev_pos = data["odom_prev_pos"]
    engine.odom_prev_rot = data["odom_prev_rot"]
    engine.imu_quat = data["imu_quat"]
    for k in ("has_odom", "has_imu", "odom_last", "imu_last",
              "tf_tolerance_base", "localized_last",
              "global_localization_fix_cnt", "cnt_measure"):
        setattr(engine, k, meta[k])
    engine._n_active_host = int(engine.pstate.n_active)
    # The restored f_pos/f_ang carry the smoothing continuity only once
    # the source engine had measured (and so seeded map->odom); a
    # checkpoint saved before the first measurement must restore with
    # the first-measurement re-seed still pending, or the cold identity
    # seed would drag the first published poses under fake_odom.  Old
    # files (no key) predate the flag: preserve their behaviour.
    engine._tf_seeded = bool(meta.get("tf_seeded", True))
