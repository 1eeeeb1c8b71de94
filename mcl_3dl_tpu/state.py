"""Particle state as a struct-of-arrays pytree.

The reference's ``State6DOF`` (include/mcl_3dl/state_6dof.h:49-275) is a
13-component AoS particle: pos(3), quat(4), odom error integrals(3+3),
plus 4 per-particle odometry-noise scalars.  Here those become columns of
fixed-capacity arrays, with a scalar ``n_active`` carried in the pytree so
the particle count can change (global localization grows to ~100k and
decays back) without recompilation as long as capacity is unchanged.

Weight bookkeeping (``prob``, ``prob_bias``) lives here too, mirroring
``pf::Particle`` (pf.h:89-110).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mcl_3dl_tpu.math import quat as mq


class ParticleState(NamedTuple):
    """SoA particle set.  All arrays have leading dim = capacity.

    noise columns are (ll, la, al, aa) matching state_6dof.h:55-58.
    """

    pos: jnp.ndarray            # [C, 3] float32
    rot: jnp.ndarray            # [C, 4] float32 quaternion (x, y, z, w)
    odom_err_lin: jnp.ndarray   # [C, 3] float32
    odom_err_ang: jnp.ndarray   # [C, 3] float32
    noise: jnp.ndarray          # [C, 4] float32 (ll, la, al, aa)
    prob: jnp.ndarray           # [C] float32
    prob_bias: jnp.ndarray      # [C] float32
    n_active: jnp.ndarray       # [] int32

    @property
    def capacity(self) -> int:
        return self.pos.shape[0]

    def active_mask(self) -> jnp.ndarray:
        return jnp.arange(self.capacity, dtype=jnp.int32) < self.n_active


def zeros(capacity: int, n_active=None) -> ParticleState:
    return ParticleState(
        pos=jnp.zeros((capacity, 3), jnp.float32),
        rot=jnp.broadcast_to(mq.identity(), (capacity, 4)),
        odom_err_lin=jnp.zeros((capacity, 3), jnp.float32),
        odom_err_ang=jnp.zeros((capacity, 3), jnp.float32),
        noise=jnp.zeros((capacity, 4), jnp.float32),
        prob=jnp.zeros((capacity,), jnp.float32),
        prob_bias=jnp.ones((capacity,), jnp.float32),
        n_active=jnp.asarray(capacity if n_active is None else n_active, jnp.int32),
    )


def apply_noise_6dof(state: ParticleState, noise6: jnp.ndarray) -> ParticleState:
    """Compose a batch of 6-dof noise samples into the state.

    Mirrors ``State6DOF::generateNoise`` + ``operator+``
    (state_6dof.h:226-261): position noise is added to both ``pos`` and
    ``odom_err_lin`` (indices 7-9 receive the same values as 0-2), rpy
    noise is added to ``odom_err_ang`` and applied as a world-frame
    (left-multiplied) quaternion to ``rot``.

    noise6: [C, 6] = (dx, dy, dz, droll, dpitch, dyaw), zero-mean.
    """
    dpos = noise6[:, :3]
    drpy = noise6[:, 3:]
    return state._replace(
        pos=state.pos + dpos,
        rot=mq.mul(mq.from_rpy(drpy), state.rot),
        odom_err_lin=state.odom_err_lin + dpos,
        odom_err_ang=state.odom_err_ang + drpy,
    )


def init_diagonal(
    key: jax.Array,
    capacity: int,
    n_active,
    mean_pos: jnp.ndarray,
    mean_rpy: jnp.ndarray,
    sigma6: jnp.ndarray,
) -> ParticleState:
    """Initialize particles with per-dimension Gaussian noise.

    Mirrors ``ParticleFilter::init`` via ``DiagonalNoiseGenerator``
    (pf.h:169-181, diagonal_noise_generator.h:66-78) through the
    ``State6DOF::generateNoise`` mapping (state_6dof.h:226-248):

    * ``pos``           = absolute position sample (mean + noise)
    * ``rot``           = quaternion of the absolute rpy sample
    * ``odom_err_lin``  = the absolute position sample (reference quirk:
                          indices 7-9 are assigned the same org_noise as
                          0-2; callers that care reset the integrals)
    * ``odom_err_ang``  = the rpy noise (sample - mean)
    * ``prob``          = 1 / n_active
    """
    st = zeros(capacity, n_active)
    n = jax.random.normal(key, (capacity, 6), jnp.float32) * jnp.asarray(
        sigma6, jnp.float32
    )
    pos_sample = jnp.asarray(mean_pos, jnp.float32) + n[:, :3]
    rpy_sample = jnp.asarray(mean_rpy, jnp.float32) + n[:, 3:]
    st = st._replace(
        pos=pos_sample,
        rot=mq.from_rpy(rpy_sample),
        odom_err_lin=pos_sample,
        odom_err_ang=n[:, 3:],
        prob=st.active_mask() / st.n_active.astype(jnp.float32),
    )
    return st


def init_multivariate(
    key: jax.Array,
    capacity: int,
    n_active,
    mean_pos: jnp.ndarray,
    mean_rpy: jnp.ndarray,
    cov66: jnp.ndarray,
) -> ParticleState:
    """Initialize from a full 6x6 covariance (initialpose seeding).

    Mirrors ``MultivariateNoiseGenerator`` (multivariate_noise_generator.h:
    63-91): transform = V @ sqrt(diag(lambda)) from a self-adjoint
    eigendecomposition, sample = mean + transform @ n.
    """
    st = zeros(capacity, n_active)
    cov66 = jnp.asarray(cov66, jnp.float32)
    w, v = jnp.linalg.eigh(cov66)
    transform = v * jnp.sqrt(jnp.maximum(w, 0.0))[None, :]
    n = jax.random.normal(key, (capacity, 6), jnp.float32) @ transform.T
    pos_sample = jnp.asarray(mean_pos, jnp.float32) + n[:, :3]
    rpy_sample = jnp.asarray(mean_rpy, jnp.float32) + n[:, 3:]
    st = st._replace(
        pos=pos_sample,
        rot=mq.from_rpy(rpy_sample),
        odom_err_lin=pos_sample,
        odom_err_ang=n[:, 3:],
        prob=st.active_mask() / st.n_active.astype(jnp.float32),
    )
    return st


def weighted_mean(
    state: ParticleState, weights: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Quaternion-safe weighted mean -> (mean_pos[3], mean_quat[4]).

    Mirrors ``ParticleWeightedMeanQuat`` (state_6dof.h:316-355): average
    the rotated front=(1,0,0) and up=(0,0,1) vectors and rebuild the
    quaternion from the mean frame — this vectorizes perfectly and avoids
    the sign-ambiguity of naive quaternion averaging.
    """
    w = weights * state.active_mask()
    p_sum = jnp.sum(w)
    mean_pos = jnp.sum(state.pos * w[:, None], axis=0) / p_sum
    # rotate(q, ex) and rotate(q, ez) are columns of the rotation matrix;
    # compute them directly instead of materializing full matrices.
    x, y, z, qw = state.rot[..., 0], state.rot[..., 1], state.rot[..., 2], state.rot[..., 3]
    front = jnp.stack(
        [1.0 - 2.0 * (y * y + z * z), 2.0 * (x * y + qw * z), 2.0 * (x * z - qw * y)],
        axis=-1,
    )
    up = jnp.stack(
        [2.0 * (x * z + qw * y), 2.0 * (y * z - qw * x), 1.0 - 2.0 * (x * x + y * y)],
        axis=-1,
    )
    front_sum = jnp.sum(front * w[:, None], axis=0)
    up_sum = jnp.sum(up * w[:, None], axis=0)
    return mean_pos, mq.from_frame(front_sum, up_sum)


def wrap_angle(a):
    """Wrap to [-pi, pi] (state_6dof.h:175-179)."""
    return a - 2.0 * jnp.pi * jnp.round(a / (2.0 * jnp.pi))


def covariance6(
    state: ParticleState,
    weights: jnp.ndarray,
    mean_pos: jnp.ndarray,
    mean_rot: jnp.ndarray,
) -> jnp.ndarray:
    """Weighted 6x6 covariance over (xyz, rpy) with angle wrapping.

    Mirrors ``ParticleFilter::covariance`` + ``State6DOF::covElement``
    (pf.h:304-360, state_6dof.h:162-184).  The reference randomly
    subsamples particles to cut CPU cost; on TPU the full reduction is a
    single [N,6]x[6,N] MXU matmul, so we always use every particle (the
    ``random_sample_ratio`` knob is accepted by the engine for API parity
    and ignored).
    """
    w = weights * state.active_mask()
    p_sum = jnp.sum(w)
    mean_rpy = mq.to_rpy(mean_rot)
    d_pos = state.pos - mean_pos
    d_rpy = wrap_angle(mq.to_rpy(state.rot) - mean_rpy)
    d = jnp.concatenate([d_pos, d_rpy], axis=-1)  # [C, 6]
    cov = jnp.einsum("ni,nj->ij", d * w[:, None], d,
                     preferred_element_type=jnp.float32)
    return cov / p_sum
