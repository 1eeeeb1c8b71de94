"""Landmark (absolute pose) measurement.

Mirrors the node's landmark callback (src/mcl_3dl.cpp:899-940): a 6-D
Gaussian over the pose difference ``s - measured`` (State6DOF operator-,
state_6dof.h:262-274: positions subtract, rotations compose as
``measured.rot^-1 * s.rot``), evaluated through ``NormalLikelihoodNd``.
"""

from __future__ import annotations

import jax.numpy as jnp

from mcl_3dl_tpu.math import quat as mq
from mcl_3dl_tpu.math.nd import NormalLikelihoodNd


def landmark_likelihood(
    pos: jnp.ndarray,          # [N, 3]
    rot: jnp.ndarray,          # [N, 4]
    meas_pos: jnp.ndarray,     # [3]
    meas_rot: jnp.ndarray,     # [4]
    nd: NormalLikelihoodNd,    # built from the 6x6 measurement covariance
) -> jnp.ndarray:
    d_pos = pos - meas_pos
    d_rot = mq.mul(mq.inv(meas_rot), rot)
    d_rpy = mq.to_rpy(d_rot)
    diff6 = jnp.concatenate([d_pos, d_rpy], axis=-1)
    return nd(diff6)
