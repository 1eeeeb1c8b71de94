"""IMU gravity posture measurement model.

Mirrors ``ImuMeasurementModelGravity``
(imu_measurement_models/imu_measurement_model_gravity.h:40-66): the
likelihood is a Gaussian over the angle between the measured
acceleration direction and the particle's body-frame gravity
``rot^-1 * (0, 0, 1)``.
"""

from __future__ import annotations

import jax.numpy as jnp

from mcl_3dl_tpu.math import quat as mq
from mcl_3dl_tpu.math.nd import normal_likelihood


def imu_gravity_likelihood(
    rot: jnp.ndarray,          # [N, 4]
    acc_measure: jnp.ndarray,  # [3] measured accel (base frame, LPF'd)
    acc_var: float,
) -> jnp.ndarray:
    acc_estim = mq.rotate(mq.inv(rot), jnp.asarray([0.0, 0.0, 1.0], jnp.float32))
    acc_norm = jnp.linalg.norm(acc_measure)
    estim_norm = jnp.linalg.norm(acc_estim, axis=-1)
    cos = jnp.sum(acc_estim * acc_measure, axis=-1) / (acc_norm * estim_norm)
    diff = jnp.arccos(jnp.clip(cos, -1.0, 1.0))
    return normal_likelihood(diff, acc_var)
