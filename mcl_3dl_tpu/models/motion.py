"""Differential-drive motion prediction.

Mirrors ``MotionPredictionModelDifferentialDrive``
(motion_prediction_models/motion_prediction_model_differential_drive.h:
46-67) vectorized over the particle axis.  The odometry delta is
computed once per odom message (``OdomDelta.from_poses`` =
``setOdoms``), then applied per particle with that particle's four noise
scalars (redrawn after each resample, src/mcl_3dl.cpp:817-825).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from mcl_3dl_tpu.math import quat as mq
from mcl_3dl_tpu.state import ParticleState


class OdomDelta(NamedTuple):
    """Relative odometry motion in the previous odom frame."""

    translation: jnp.ndarray        # [3]
    rotation: jnp.ndarray           # [4] quaternion
    angle: jnp.ndarray              # [] rotation angle
    translation_norm: jnp.ndarray   # []
    dt: jnp.ndarray                 # [] seconds

    @classmethod
    def from_poses(cls, pos_prev, rot_prev, pos_cur, rot_cur, dt) -> "OdomDelta":
        """setOdoms (motion_prediction_model_differential_drive.h:46-54)."""
        inv_prev = mq.inv(rot_prev)
        translation = mq.rotate(inv_prev, pos_cur - pos_prev)
        rotation = mq.mul(inv_prev, rot_cur)
        _, angle = mq.to_axis_angle(rotation)
        return cls(
            translation=translation,
            rotation=rotation,
            angle=angle,
            translation_norm=jnp.linalg.norm(translation),
            dt=jnp.asarray(dt, jnp.float32),
        )


def predict_differential_drive(
    state: ParticleState,
    delta: OdomDelta,
    odom_err_integ_lin_tc: float,
    odom_err_integ_ang_tc: float,
) -> ParticleState:
    """predict() (motion_prediction_model_differential_drive.h:56-67).

    noise columns: (ll, la, al, aa) — state_6dof.h:55-58.
    """
    noise_ll = state.noise[:, 0:1]
    noise_la = state.noise[:, 1]
    noise_al = state.noise[:, 2]
    noise_aa = state.noise[:, 3]

    rel_t = delta.translation
    diff = rel_t * (1.0 + noise_ll) + jnp.stack(
        [noise_al * delta.angle, jnp.zeros_like(noise_al), jnp.zeros_like(noise_al)],
        axis=-1,
    )
    odom_err_lin = state.odom_err_lin + (diff - rel_t)
    pos = state.pos + mq.rotate(state.rot, diff)

    yaw_diff = noise_la * delta.translation_norm + noise_aa * delta.angle
    half = yaw_diff * 0.5
    yaw_quat = jnp.stack(
        [jnp.zeros_like(half), jnp.zeros_like(half), jnp.sin(half), jnp.cos(half)],
        axis=-1,
    )
    rot = mq.normalize(mq.mul(mq.mul(yaw_quat, state.rot), delta.rotation))

    odom_err_ang = state.odom_err_ang.at[:, 2].add(yaw_diff)
    decay_lin = 1.0 - delta.dt / odom_err_integ_lin_tc
    decay_ang = 1.0 - delta.dt / odom_err_integ_ang_tc
    return state._replace(
        pos=pos,
        rot=rot,
        odom_err_lin=odom_err_lin * decay_lin,
        odom_err_ang=odom_err_ang * decay_ang,
    )


def reset_error_integrals(state: ParticleState) -> ParticleState:
    """Zero odometry error integrals (src/mcl_3dl.cpp:190-195, 653-658)."""
    return state._replace(
        odom_err_lin=jnp.zeros_like(state.odom_err_lin),
        odom_err_ang=jnp.zeros_like(state.odom_err_ang),
    )
