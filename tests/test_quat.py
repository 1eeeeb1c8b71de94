"""Quaternion kernel tests (mirrors reference test/src/test_quat.cpp)."""

import numpy as np
import jax.numpy as jnp

from mcl_3dl_tpu.math import quat as mq


def scipy_free_rpy_matrix(roll, pitch, yaw):
    """Rotation matrix from extrinsic XYZ (roll-pitch-yaw)."""
    cr, sr = np.cos(roll), np.sin(roll)
    cp, sp = np.cos(pitch), np.sin(pitch)
    cy, sy = np.cos(yaw), np.sin(yaw)
    rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    return rz @ ry @ rx


def test_mul_identity():
    q = mq.from_rpy(jnp.asarray([0.3, -0.2, 1.1]))
    assert np.allclose(mq.mul(q, mq.identity()), q, atol=1e-6)
    assert np.allclose(mq.mul(mq.identity(), q), q, atol=1e-6)


def test_mul_matches_rotation_composition():
    rng = np.random.default_rng(0)
    for _ in range(20):
        r1, r2 = rng.uniform(-np.pi, np.pi, (2, 3))
        q1 = mq.from_rpy(jnp.asarray(r1, jnp.float32))
        q2 = mq.from_rpy(jnp.asarray(r2, jnp.float32))
        v = rng.normal(size=3).astype(np.float32)
        got = mq.rotate(mq.mul(q1, q2), jnp.asarray(v))
        want = mq.rotate(q1, mq.rotate(q2, jnp.asarray(v)))
        assert np.allclose(got, want, atol=1e-5)


def test_rotate_matches_matrix():
    rng = np.random.default_rng(1)
    rpy = rng.uniform(-np.pi / 2, np.pi / 2, (50, 3)).astype(np.float32)
    q = mq.from_rpy(jnp.asarray(rpy))
    v = rng.normal(size=(50, 3)).astype(np.float32)
    got = np.asarray(mq.rotate(q, jnp.asarray(v)))
    for i in range(50):
        want = scipy_free_rpy_matrix(*rpy[i]) @ v[i]
        assert np.allclose(got[i], want, atol=1e-5), i


def test_rotation_matrix_equals_rotate():
    rng = np.random.default_rng(2)
    rpy = rng.uniform(-np.pi, np.pi, (30, 3)).astype(np.float32)
    q = mq.from_rpy(jnp.asarray(rpy))
    v = rng.normal(size=(30, 3)).astype(np.float32)
    r = mq.rotation_matrix(q)
    got = np.einsum("nij,nj->ni", np.asarray(r), v)
    want = np.asarray(mq.rotate(q, jnp.asarray(v)))
    assert np.allclose(got, want, atol=1e-5)


def test_rpy_roundtrip():
    rng = np.random.default_rng(3)
    rpy = rng.uniform(-1.4, 1.4, (100, 3)).astype(np.float32)
    q = mq.from_rpy(jnp.asarray(rpy))
    back = np.asarray(mq.to_rpy(q))
    assert np.allclose(back, rpy, atol=1e-5)


def test_axis_angle_roundtrip():
    rng = np.random.default_rng(4)
    for _ in range(30):
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        ang = rng.uniform(-3.0, 3.0)
        q = mq.from_axis_angle(jnp.asarray(axis, jnp.float32), ang)
        got_axis, got_ang = mq.to_axis_angle(q)
        # (axis, ang) and (-axis, -ang) are the same rotation; compare the
        # reconstructed quaternion up to global sign.
        q2 = mq.from_axis_angle(got_axis, got_ang)
        qn, q2n = np.asarray(q), np.asarray(q2)
        if np.dot(qn, q2n) < 0:
            q2n = -q2n
        assert np.allclose(qn, q2n, atol=1e-4)
        assert np.allclose(abs(float(got_ang)), abs(ang), atol=1e-4)


def test_axis_angle_identity_guard():
    axis, ang = mq.to_axis_angle(mq.identity())
    assert float(ang) == 0.0
    assert np.allclose(np.asarray(axis), [0, 0, 1])


def test_inv():
    q = mq.from_rpy(jnp.asarray([0.5, 0.2, -0.7]))
    assert np.allclose(mq.mul(q, mq.inv(q)), mq.identity(), atol=1e-6)


def test_weighted():
    axis = jnp.asarray([0.0, 0.0, 1.0])
    q = mq.from_axis_angle(axis, 1.0)
    h = mq.weighted(q, 0.5)
    _, ang = mq.to_axis_angle(h)
    assert np.allclose(float(ang), 0.5, atol=1e-5)


def test_from_frame_matches_yaw():
    # yaw-only rotations: forward = (cos, sin, 0), up = z
    for yaw in np.linspace(-2.5, 2.5, 11):
        fw = jnp.asarray([np.cos(yaw), np.sin(yaw), 0.0], jnp.float32)
        up = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
        q = mq.from_frame(fw, up)
        want = mq.from_rpy(jnp.asarray([0.0, 0.0, yaw], jnp.float32))
        qn, wn = np.asarray(q), np.asarray(want)
        if np.dot(qn, wn) < 0:
            wn = -wn
        assert np.allclose(qn, wn, atol=1e-5), yaw


def test_from_frame_general():
    rng = np.random.default_rng(5)
    for _ in range(20):
        rpy = rng.uniform(-1.0, 1.0, 3).astype(np.float32)
        q0 = mq.from_rpy(jnp.asarray(rpy))
        fw = mq.rotate(q0, jnp.asarray([1.0, 0.0, 0.0]))
        up = mq.rotate(q0, jnp.asarray([0.0, 0.0, 1.0]))
        q = mq.from_frame(fw, up)
        qn, wn = np.asarray(q), np.asarray(q0)
        if np.dot(qn, wn) < 0:
            wn = -wn
        assert np.allclose(qn, wn, atol=1e-4)


def test_rotate_axis():
    # rotating the axis of a yaw rotation by a 90deg roll gives a pitch rot
    yaw_q = mq.from_axis_angle(jnp.asarray([0.0, 0.0, 1.0]), 0.7)
    roll90 = mq.from_axis_angle(jnp.asarray([1.0, 0.0, 0.0]), np.pi / 2)
    out = mq.rotate_axis(yaw_q, roll90)
    axis, ang = mq.to_axis_angle(out)
    assert np.allclose(float(ang), 0.7, atol=1e-5)
    assert np.allclose(np.asarray(axis), [0.0, -1.0, 0.0], atol=1e-5)
