"""Batched quaternion kernels.

Quaternions are arrays with trailing dimension 4 in ``(x, y, z, w)``
component order, vectors have trailing dimension 3.  All functions
broadcast over arbitrary leading batch dimensions and are jit/vmap
compatible.

The formulas intentionally match the reference implementation
(``include/mcl_3dl/quat.h``) so the pose track is comparable:

* Hamilton product               — quat.h:131-138
* vector rotation q v q*         — quat.h:139-143
* RPY <-> quat conversions       — quat.h:191-215
* axis-angle <-> quat            — quat.h:216-239
* frame construction (fwd, up)   — quat.h:59-75
* ``weighted`` angle scaling     — quat.h:168-174
* ``rotate_axis``                — quat.h:240-246
"""

from __future__ import annotations

import jax.numpy as jnp

_AXIS_EPS = 1e-6


def identity(shape=(), dtype=jnp.float32):
    """Identity quaternion (0, 0, 0, 1) broadcast to ``shape + (4,)``."""
    q = jnp.zeros(tuple(shape) + (4,), dtype=dtype)
    return q.at[..., 3].set(1.0)


def mul(q1, q2):
    """Hamilton product ``q1 * q2`` (quat.h:131-138)."""
    x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    x2, y2, z2, w2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 + y1 * w2 + z1 * x2 - x1 * z2,
            w1 * z2 + z1 * w2 + x1 * y2 - y1 * x2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def conj(q):
    """Conjugate (-x, -y, -z, w) (quat.h:183-186)."""
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def inv(q):
    """Inverse: conj / |q|^2 (quat.h:187-190)."""
    return conj(q) / jnp.sum(q * q, axis=-1, keepdims=True)


def norm(q):
    return jnp.sqrt(jnp.sum(q * q, axis=-1))


def normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def rotate(q, v):
    """Rotate vector(s) ``v`` by quaternion(s) ``q``: q v q* (quat.h:139-143).

    Expanded to the standard cross-product form (mathematically identical
    to the reference's double Hamilton product, fewer flops on the VPU):
    ``v' = v + 2 w (u x v) + 2 (u x (u x v))`` with u = (x, y, z).
    """
    u = q[..., :3]
    w = q[..., 3:4]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def rotation_matrix(q):
    """Rotation matrix ``[..., 3, 3]`` such that ``R @ v == rotate(q, v)``.

    Used to turn the per-particle point-cloud transform into a single
    MXU-friendly matmul over ``[particles, points]``.
    """
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return r.reshape(r.shape[:-1] + (3, 3))


def from_rpy(rpy):
    """Quaternion from roll/pitch/yaw vector (quat.h:202-215)."""
    t2 = jnp.cos(rpy[..., 0] / 2)
    t3 = jnp.sin(rpy[..., 0] / 2)
    t4 = jnp.cos(rpy[..., 1] / 2)
    t5 = jnp.sin(rpy[..., 1] / 2)
    t0 = jnp.cos(rpy[..., 2] / 2)
    t1 = jnp.sin(rpy[..., 2] / 2)
    return jnp.stack(
        [
            t0 * t3 * t4 - t1 * t2 * t5,
            t0 * t2 * t5 + t1 * t3 * t4,
            t1 * t2 * t4 - t0 * t3 * t5,
            t0 * t2 * t4 + t1 * t3 * t5,
        ],
        axis=-1,
    )


def to_rpy(q):
    """Roll/pitch/yaw from quaternion (quat.h:191-201)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    ysq = y * y
    t0 = -2.0 * (ysq + z * z) + 1.0
    t1 = 2.0 * (x * y + w * z)
    t2 = jnp.clip(-2.0 * (x * z - w * y), -1.0, 1.0)
    t3 = 2.0 * (y * z + w * x)
    t4 = -2.0 * (x * x + ysq) + 1.0
    return jnp.stack(
        [jnp.arctan2(t3, t4), jnp.arcsin(t2), jnp.arctan2(t1, t0)], axis=-1
    )


def from_axis_angle(axis, ang):
    """Quaternion from (axis, angle); axis is normalized (quat.h:216-225).

    Note: the reference normalizes the resulting quaternion again after
    construction; with a unit axis the result is already unit so a single
    normalize matches to float precision.
    """
    a = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    ang = jnp.asarray(ang)
    s = jnp.sin(ang / 2)[..., None]
    q = jnp.concatenate([a * s, jnp.cos(ang / 2)[..., None]], axis=-1)
    return normalize(q)


def to_axis_angle(q):
    """(axis, angle) from quaternion (quat.h:226-239).

    Matches the reference's guard: for |w| >= 1 - 1e-6 the rotation is
    treated as zero with axis (0, 0, 1).  The angle is wrapped into
    (-pi, pi].
    """
    w = q[..., 3]
    near_identity = jnp.abs(w) >= 1.0 - _AXIS_EPS
    ang = jnp.arccos(jnp.clip(w, -1.0, 1.0)) * 2.0
    ang = jnp.where(ang > jnp.pi, ang - 2.0 * jnp.pi, ang)
    ang = jnp.where(near_identity, 0.0, ang)
    wsq = jnp.maximum(1.0 - w * w, _AXIS_EPS * _AXIS_EPS)
    axis = q[..., :3] / jnp.sqrt(wsq)[..., None]
    default_axis = jnp.zeros_like(axis).at[..., 2].set(1.0)
    axis = jnp.where(near_identity[..., None], default_axis, axis)
    return axis, ang


def angle(q):
    """Rotation angle only (cheaper than to_axis_angle when axis unused)."""
    w = q[..., 3]
    near_identity = jnp.abs(w) >= 1.0 - _AXIS_EPS
    ang = jnp.arccos(jnp.clip(w, -1.0, 1.0)) * 2.0
    ang = jnp.where(ang > jnp.pi, ang - 2.0 * jnp.pi, ang)
    return jnp.where(near_identity, 0.0, ang)


def weighted(q, s):
    """Scale the rotation angle by ``s`` (quat.h:168-174)."""
    axis, ang = to_axis_angle(q)
    return from_axis_angle(axis, ang * s)


def rotate_axis(q, r):
    """Rotate the rotation axis of ``q`` by quaternion ``r`` (quat.h:240-246)."""
    axis, ang = to_axis_angle(q)
    return from_axis_angle(rotate(r, axis), ang)


def from_frame(forward, up):
    """Quaternion from a (forward, up) frame (quat.h:59-75).

    Builds the orthonormal frame x=forward, y=up x forward, z=x x y and
    extracts the quaternion via the component-wise square-root method with
    the reference's sign fix-up.  This is the kernel behind the
    quaternion-safe weighted particle mean (state_6dof.h:316-355).
    """
    xv = forward / jnp.linalg.norm(forward, axis=-1, keepdims=True)
    yv = jnp.cross(up, xv)
    yv = yv / jnp.linalg.norm(yv, axis=-1, keepdims=True)
    zv = jnp.cross(xv, yv)
    zv = zv / jnp.linalg.norm(zv, axis=-1, keepdims=True)

    xx, yy, zz = xv[..., 0], yv[..., 1], zv[..., 2]
    w = jnp.sqrt(jnp.maximum(0.0, 1.0 + xx + yy + zz)) / 2.0
    x = jnp.sqrt(jnp.maximum(0.0, 1.0 + xx - yy - zz)) / 2.0
    y = jnp.sqrt(jnp.maximum(0.0, 1.0 - xx + yy - zz)) / 2.0
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - xx - yy + zz)) / 2.0
    x = jnp.where(zv[..., 1] - yv[..., 2] > 0, -x, x)
    y = jnp.where(xv[..., 2] - zv[..., 0] > 0, -y, y)
    z = jnp.where(yv[..., 0] - xv[..., 1] > 0, -z, z)
    return jnp.stack([x, y, z, w], axis=-1)
