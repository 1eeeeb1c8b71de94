"""Measurement / prediction model tests (mirror
test_motion_prediction_model_differential_drive.cpp,
test_imu_measurement_model_gravity.cpp, test_beam_likelihood.cpp,
test_raycast.cpp)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from mcl_3dl_tpu import state as st
from mcl_3dl_tpu.map.distance_field import build_distance_field
from mcl_3dl_tpu.map.occupancy import build_occupancy_grid
from mcl_3dl_tpu.math import quat as mq
from mcl_3dl_tpu.math.nd import normal_likelihood
from mcl_3dl_tpu.models.beam import (
    BeamStatus,
    beam_measure,
    raycast_df,
    raycast_occ,
)
from mcl_3dl_tpu.models.imu_gravity import imu_gravity_likelihood
from mcl_3dl_tpu.models.likelihood import clip_mask, likelihood_measure
from mcl_3dl_tpu.models.motion import OdomDelta, predict_differential_drive


def _wall_points(x=2.0, half=3.0, grid=0.1):
    ys = np.arange(-half, half + grid / 2, grid)
    zs = np.arange(-1.0, 1.0 + grid / 2, grid)
    gy, gz = np.meshgrid(ys, zs, indexing="ij")
    return np.stack([np.full(gy.size, x), gy.ravel(), gz.ravel()], axis=1)


def _wall_world(x=2.0, half=3.0, grid=0.1):
    """Wall at +x plus a far back wall so the sensor origin sits inside
    the map AABB (RaycastUsingDDA ignores rays starting outside it,
    raycast_using_dda.h:70-75)."""
    return np.concatenate([_wall_points(x, half, grid),
                           _wall_points(-4.0, half, grid)], axis=0)


# ------------------------------------------------------------------ motion


def test_motion_prediction_no_noise():
    # closed-form: pure forward translation
    n = 4
    s = st.zeros(n)
    delta = OdomDelta.from_poses(
        jnp.zeros(3), mq.identity(),
        jnp.asarray([1.0, 0.0, 0.0]), mq.identity(), 0.1,
    )
    s2 = predict_differential_drive(s, delta, 10.0, 10.0)
    assert np.allclose(np.asarray(s2.pos), [[1, 0, 0]] * n, atol=1e-6)
    assert np.allclose(np.asarray(s2.rot), [[0, 0, 0, 1]] * n, atol=1e-6)


def test_motion_prediction_rotated_frame():
    # particle facing +y: odom delta (1,0,0) in odom frame is applied in
    # the particle's frame -> moves along +y
    s = st.zeros(1)
    yaw90 = mq.from_rpy(jnp.asarray([0.0, 0.0, np.pi / 2], jnp.float32))
    s = s._replace(rot=yaw90[None, :])
    delta = OdomDelta.from_poses(
        jnp.zeros(3), mq.identity(),
        jnp.asarray([1.0, 0.0, 0.0]), mq.identity(), 0.1,
    )
    s2 = predict_differential_drive(s, delta, 10.0, 10.0)
    assert np.allclose(np.asarray(s2.pos[0]), [0, 1, 0], atol=1e-5)


def test_motion_prediction_noise_ll():
    # noise_ll scales translation (motion_prediction_model_...h:58)
    s = st.zeros(1)
    s = s._replace(noise=jnp.asarray([[0.5, 0.0, 0.0, 0.0]], jnp.float32))
    delta = OdomDelta.from_poses(
        jnp.zeros(3), mq.identity(),
        jnp.asarray([2.0, 0.0, 0.0]), mq.identity(), 0.1,
    )
    s2 = predict_differential_drive(s, delta, 10.0, 10.0)
    assert np.allclose(np.asarray(s2.pos[0]), [3.0, 0, 0], atol=1e-5)
    # error integral accumulates the noise-induced offset, decayed
    want_err = (3.0 - 2.0) * (1.0 - 0.1 / 10.0)
    assert np.allclose(np.asarray(s2.odom_err_lin[0]), [want_err, 0, 0], atol=1e-5)


def test_motion_prediction_yaw_noise():
    # noise_aa adds yaw proportional to the rotation angle (:61-62)
    s = st.zeros(1)
    s = s._replace(noise=jnp.asarray([[0.0, 0.0, 0.0, 1.0]], jnp.float32))
    ang = 0.3
    rot_cur = mq.from_rpy(jnp.asarray([0.0, 0.0, ang], jnp.float32))
    delta = OdomDelta.from_poses(
        jnp.zeros(3), mq.identity(), jnp.zeros(3), rot_cur, 0.1
    )
    s2 = predict_differential_drive(s, delta, 10.0, 10.0)
    rpy = np.asarray(mq.to_rpy(s2.rot[0]))
    assert abs(rpy[2] - 2 * ang) < 1e-5  # odom ang + equal noise yaw
    assert abs(float(s2.odom_err_ang[0, 2]) - ang * (1 - 0.1 / 10.0)) < 1e-5


# ------------------------------------------------------------------ imu


def test_imu_gravity_upright_peak():
    rots = jnp.stack([
        mq.identity(),
        mq.from_rpy(jnp.asarray([0.5, 0.0, 0.0], jnp.float32)),
    ])
    acc = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
    lik = np.asarray(imu_gravity_likelihood(rots, acc, math.pi / 4))
    assert lik[0] > lik[1]
    peak = float(normal_likelihood(jnp.asarray(0.0), math.pi / 4))
    assert abs(lik[0] - peak) < 1e-5


def test_imu_gravity_tilt_matches_angle():
    ang = 0.4
    rot = mq.from_rpy(jnp.asarray([ang, 0.0, 0.0], jnp.float32))[None, :]
    acc = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
    lik = float(imu_gravity_likelihood(rot, acc, math.pi / 4)[0])
    want = float(normal_likelihood(jnp.asarray(ang), math.pi / 4))
    assert abs(lik - want) < 1e-5


# ------------------------------------------------------------------ clip


def test_clip_mask():
    pts = jnp.asarray([
        [0.1, 0.0, 0.0],    # too near
        [3.0, 0.0, 0.0],    # ok
        [20.0, 0.0, 0.0],   # too far
        [3.0, 0.0, -5.0],   # below z
        [3.0, 0.0, 5.0],    # above z
    ])
    keep = np.asarray(clip_mask(pts, 0.5, 10.0, -2.0, 2.0))
    assert keep.tolist() == [False, True, False, False, False]


# ------------------------------------------------------------- likelihood


def test_likelihood_prefers_true_pose():
    wall = _wall_points()
    df = build_distance_field(wall, 0.1, 0.6)
    # scan of the wall seen from the origin: points at x=2 in base frame
    scan = _wall_points(x=2.0, half=1.0, grid=0.2)
    pos = jnp.asarray([[0, 0, 0], [0.5, 0, 0], [-0.5, 0, 0]], jnp.float32)
    rot = jnp.broadcast_to(mq.identity(), (3, 4))
    lik, qual = likelihood_measure(
        df, pos, rot, jnp.asarray(scan, jnp.float32),
        jnp.ones(len(scan), bool), 0.2, 0.05, 5.0,
    )
    lik = np.asarray(lik)
    assert lik[0] > lik[1] and lik[0] > lik[2]
    assert float(qual[0]) > 0.9


def test_likelihood_score_formula():
    # single map point, single scan point at known offset
    df = build_distance_field(np.array([[1.0, 0.0, 0.0]]), 0.02, 0.6)
    scan = jnp.asarray([[1.0, 0.0, 0.1]], jnp.float32)  # 0.1 away
    pos = jnp.zeros((1, 3))
    rot = mq.identity()[None, :]
    lik, qual = likelihood_measure(
        df, pos, rot, scan, jnp.ones(1, bool), 0.2, 0.05, 5.0
    )
    want = 5.0 * (0.2 - 0.1)
    assert abs(float(lik[0]) - want) < 0.05
    assert float(qual[0]) == 1.0
    # inside the flat floor: distance clamps at match_dist_flat
    scan2 = jnp.asarray([[1.0, 0.0, 0.01]], jnp.float32)
    lik2, _ = likelihood_measure(
        df, pos, rot, scan2, jnp.ones(1, bool), 0.2, 0.05, 5.0
    )
    assert abs(float(lik2[0]) - 5.0 * (0.2 - 0.05)) < 0.05


def test_likelihood_local_kernel_matches_xla_path():
    """The local-table Pallas path (converged particles, interpret mode
    on CPU) must reproduce the plain nearest-cell XLA scoring."""
    rng = np.random.default_rng(3)
    wall = _wall_points()
    df = build_distance_field(wall, 0.1, 0.6, weights=(1.0, 1.0, 0.5))
    scan = _wall_points(x=2.0, half=1.0, grid=0.25)[:24]
    K = len(scan)
    N = 256   # multiple of 128 so the kernel path is eligible
    pos = jnp.asarray(
        np.array([0.1, -0.05, 0.0]) + rng.normal(0, 0.15, (N, 3)),
        jnp.float32,
    )
    rpy = rng.normal(0, 0.05, (N, 3))
    rot = jnp.asarray(
        np.stack([np.asarray(mq.from_rpy(jnp.asarray(r))) for r in rpy]),
        jnp.float32,
    )
    valid = jnp.asarray(rng.uniform(size=K) < 0.8)
    args = (df, pos, rot, jnp.asarray(scan, jnp.float32), valid,
            0.2, 0.05, 5.0)
    lik_ref, qual_ref = likelihood_measure(*args, trilinear=False)
    lik_loc, qual_loc = likelihood_measure(
        *args, trilinear=False, local_kernel=True)
    np.testing.assert_allclose(np.asarray(lik_loc), np.asarray(lik_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(qual_loc), np.asarray(qual_ref),
                               rtol=1e-6, atol=1e-6)

    # spread particles far beyond the local box: the runtime cond must
    # fall back to the XLA path and still agree
    pos_wide = jnp.asarray(rng.uniform(-3.0, 3.0, (N, 3)), jnp.float32)
    args_w = (df, pos_wide, rot, jnp.asarray(scan, jnp.float32), valid,
              0.2, 0.05, 5.0)
    lik_ref2, _ = likelihood_measure(*args_w, trilinear=False)
    lik_loc2, _ = likelihood_measure(
        *args_w, trilinear=False, local_kernel=True)
    np.testing.assert_allclose(np.asarray(lik_loc2), np.asarray(lik_ref2),
                               rtol=1e-5, atol=1e-5)


def test_likelihood_grouped_kernel_matches_xla_path():
    """The yaw-grouped local-table path (ops/grouped.py, interpret mode
    on CPU) must reproduce nearest-cell XLA scoring in the regime it was
    built for: yaw spread large enough that the per-point global box
    (tier 2) overflows, yet per-yaw-bin boxes fit."""
    from mcl_3dl_tpu.ops import grouped as og

    rng = np.random.default_rng(7)
    wall = _wall_points()
    df = build_distance_field(wall, 0.1, 0.6, weights=(1.0, 1.0, 0.5))
    scan = _wall_points(x=2.0, half=2.0, grid=0.5)[:16]
    K = len(scan)
    N = og.TILE  # multiple of the grouped tile so the path is eligible
    pos = jnp.asarray(
        np.array([0.1, -0.05, 0.0]) + rng.normal(0, 0.03, (N, 3)),
        jnp.float32,
    )
    # wide yaw fan: +-1.0 rad * ~2.8 m scan radius > the 3.2 m tier-2
    # box; a 16th of it fits the 1.2 m grouped box comfortably
    rpy = np.stack([
        rng.normal(0, 0.01, N), rng.normal(0, 0.01, N),
        rng.uniform(-1.0, 1.0, N),
    ], axis=1)
    rot = jnp.asarray(
        np.stack([np.asarray(mq.from_rpy(jnp.asarray(r))) for r in rpy]),
        jnp.float32,
    )
    valid = jnp.asarray(rng.uniform(size=K) < 0.85)
    active = jnp.asarray(np.arange(N) < N - 100)   # stale tail slots
    rmat = mq.rotation_matrix(mq.normalize(rot))

    # regime check: grouped fits, the per-point exact box does not
    cap = og.default_overflow_cap(N)
    stats = og.group_stats(pos, rmat, rot, df.weights, float(df.cell),
                           df.origin, active)
    lo, fits_kg = og.group_boxes(stats, jnp.asarray(scan, jnp.float32),
                                 df.field.shape)
    fits = jnp.all(fits_kg | ~valid[:, None]) & (stats.n_over <= cap)
    assert bool(fits)
    transformed = (
        jnp.einsum("kj,nij->kni", jnp.asarray(scan, jnp.float32), rmat)
        + pos[None, :, :]
    )
    iq = jnp.round(
        (transformed * jnp.asarray(df.weights) - df.origin) / df.cell
    ).astype(jnp.int32)
    ext = jnp.max(iq, axis=1) - jnp.min(iq, axis=1)
    assert not bool(jnp.all(
        (ext < jnp.asarray([32, 32, 16])) | ~valid[:, None]))

    args = (df, pos, rot, jnp.asarray(scan, jnp.float32), valid,
            0.2, 0.05, 5.0)
    lik_ref, qual_ref = likelihood_measure(*args, trilinear=False)
    lik_g, qual_g = likelihood_measure(
        *args, trilinear=False, local_kernel=True, active=active)
    # inactive tail slots (prob 0, never read downstream) are excluded
    # from the group boxes, so only active slots are specified
    act = np.asarray(active)
    np.testing.assert_allclose(np.asarray(lik_g)[act],
                               np.asarray(lik_ref)[act],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(qual_g)[act],
                               np.asarray(qual_ref)[act],
                               rtol=1e-6, atol=1e-6)

    # position spread far beyond any local box: every tier falls back to
    # the XLA path and still agrees
    pos_wide = jnp.asarray(rng.uniform(-4.0, 4.0, (N, 3)), jnp.float32)
    args_w = (df, pos_wide, rot, jnp.asarray(scan, jnp.float32), valid,
              0.2, 0.05, 5.0)
    lik_ref2, _ = likelihood_measure(*args_w, trilinear=False)
    lik_g2, _ = likelihood_measure(
        *args_w, trilinear=False, local_kernel=True, active=active)
    np.testing.assert_allclose(np.asarray(lik_g2), np.asarray(lik_ref2),
                               rtol=1e-5, atol=1e-5)


def test_likelihood_grouped_random_map_parity():
    """Adversarial parity for the block-skip fast path: a RANDOM
    scattered map produces arbitrary code patterns around the
    match_dist_min threshold in every table block, so any inexactness
    in the query-band skip logic (ops/grouped.block_min_dist /
    pack_block_skip) shows up as a score difference vs the XLA
    nearest-cell path."""
    from mcl_3dl_tpu.ops import grouped as og

    rng = np.random.default_rng(42)
    # sparse random clutter: most window blocks are empty (skippable),
    # the rest have near-threshold codes
    pts = rng.uniform(-3.0, 3.0, (400, 3))
    df = build_distance_field(pts, 0.1, 0.6, weights=(1.0, 1.0, 2.0))
    scan = rng.uniform(-2.0, 2.0, (24, 3)).astype(np.float32)
    K = len(scan)
    N = og.TILE
    pos = jnp.asarray(rng.normal(0, 0.04, (N, 3)), jnp.float32)
    rpy = np.stack([rng.normal(0, 0.02, N), rng.normal(0, 0.02, N),
                    rng.uniform(-0.4, 0.4, N)], axis=1)
    rot = jnp.asarray(
        np.stack([np.asarray(mq.from_rpy(jnp.asarray(r))) for r in rpy]),
        jnp.float32)
    valid = jnp.asarray(rng.uniform(size=K) < 0.9)
    active = jnp.ones((N,), bool)

    for mdm in (0.2, 0.3):
        args = (df, pos, rot, jnp.asarray(scan), valid, mdm, 0.05, 5.0)
        lik_ref, qual_ref = likelihood_measure(*args, trilinear=False)
        lik_g, qual_g, tier = likelihood_measure(
            *args, trilinear=False, local_kernel=True, active=active,
            with_info=True)
        assert int(tier) == 0, "grouped tier did not engage"
        # the kernel's affine cell arithmetic and sample_nearest round
        # the same query through different fp association orders;
        # particles exactly on a cell boundary can flip one cell (and
        # with sparse random clutter, one whole contribution).  Verified
        # identical with the skip producer forced off — allow a
        # per-mille of such flips, require exact agreement elsewhere.
        mism = ~np.isclose(np.asarray(lik_g), np.asarray(lik_ref),
                           rtol=1e-5, atol=1e-5)
        mism |= ~np.isclose(np.asarray(qual_g), np.asarray(qual_ref),
                            rtol=1e-6, atol=1e-6)
        assert mism.mean() < 0.005, (mdm, mism.sum())


def test_likelihood_grouped_envelope_outliers_exact():
    """A few resample-jitter tail particles far outside the cluster must
    not blow the bin envelopes (fits stays true) and must still be
    scored exactly via the overflow rescore path (ops/grouped.py
    overflow_*) — results bit-equal to the XLA path for EVERY particle."""
    from mcl_3dl_tpu.ops import grouped as og

    rng = np.random.default_rng(11)
    wall = _wall_points()
    df = build_distance_field(wall, 0.1, 0.6, weights=(1.0, 1.0, 0.5))
    scan = _wall_points(x=2.0, half=2.0, grid=0.5)[:16]
    K = len(scan)
    N = og.TILE
    pos_np = np.array([0.1, -0.05, 0.0]) + rng.normal(0, 0.02, (N, 3))
    # 8 far outliers: metres away, way beyond any per-bin box
    out_idx = rng.choice(N, 8, replace=False)
    pos_np[out_idx] += rng.uniform(-2.5, 2.5, (8, 3))
    pos = jnp.asarray(pos_np, jnp.float32)
    rpy = np.stack([
        rng.normal(0, 0.01, N), rng.normal(0, 0.01, N),
        rng.uniform(-0.5, 0.5, N),
    ], axis=1)
    rot = jnp.asarray(
        np.stack([np.asarray(mq.from_rpy(jnp.asarray(r))) for r in rpy]),
        jnp.float32,
    )
    valid = jnp.ones(K, bool)
    active = jnp.ones(N, bool)
    rmat = mq.rotation_matrix(mq.normalize(rot))

    cap = og.default_overflow_cap(N)
    stats = og.group_stats(pos, rmat, rot, df.weights, float(df.cell),
                           df.origin, active)
    lo, fits_kg = og.group_boxes(stats, jnp.asarray(scan, jnp.float32),
                                 df.field.shape)
    n_over = int(np.asarray(stats.n_over))
    assert 1 <= n_over <= cap          # outliers detected, within capacity
    assert bool(jnp.all(fits_kg | ~valid[:, None]))  # envelopes still fit
    # every injected outlier was routed to the overflow bin
    g_np = np.asarray(stats.g)
    assert (g_np[out_idx] == og.G_GROUPS - 1).all()

    args = (df, pos, rot, jnp.asarray(scan, jnp.float32), valid,
            0.2, 0.05, 5.0)
    lik_ref, qual_ref = likelihood_measure(*args, trilinear=False)
    lik_g, qual_g, tier = likelihood_measure(
        *args, trilinear=False, local_kernel=True, active=active,
        with_info=True)
    assert int(np.asarray(tier)) == 0   # the grouped tier engaged
    np.testing.assert_allclose(np.asarray(lik_g), np.asarray(lik_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(qual_g), np.asarray(qual_ref),
                               rtol=1e-6, atol=1e-6)


def test_likelihood_empty_cloud():
    df = build_distance_field(np.array([[0.0, 0.0, 0.0]]), 0.1, 0.6)
    lik, qual = likelihood_measure(
        df, jnp.zeros((2, 3)), jnp.broadcast_to(mq.identity(), (2, 4)),
        jnp.zeros((4, 3)), jnp.zeros(4, bool), 0.2, 0.05, 5.0,
    )
    assert np.allclose(np.asarray(lik), 1.0)
    assert np.allclose(np.asarray(qual), 0.0)


# ---------------------------------------------------------------- raycast


def test_raycast_occ_two_surface_voxel():
    """The DDA perpendicular-distance check must test every stored
    representative point (raycast_using_dda.h:237-258): a ray grazing
    one of two surfaces sharing a voxel collides with that surface,
    even though the voxel's MEAN point lies in the empty gap between
    them (out of the perpendicular threshold)."""
    from mcl_3dl_tpu.map.occupancy import build_occupancy_grid

    cell = 0.4
    pts = np.array([
        [0.0, 0.0, 0.0], [2.2, 0.4, 0.4],       # AABB anchors
        [1.0, 0.02, 0.2],                        # surface 1 (far from ray)
        [1.0, 0.36, 0.2],                        # surface 2 (on the ray)
    ])
    occ = build_occupancy_grid(pts, cell)
    begin = jnp.asarray([0.0, 0.35, 0.2], jnp.float32)
    end = jnp.asarray([2.0, 0.35, 0.2], jnp.float32)
    thr_sq = 0.05 ** 2
    col, cpos, _ = raycast_occ(
        occ, begin, end, hit_tolerance=0.2, filter_label_max=0xFFFFFFFF,
        num_steps=64, ray_angle_half=0.0, min_dist_thr_sq=thr_sq)
    assert bool(col)
    # collided with surface 2's point, not the voxel mean (y ~ 0.19)
    assert abs(float(cpos[1]) - 0.36) < 0.02
    # sanity: the voxel mean would have failed the perpendicular test
    mean_perp_sq = (0.35 - (0.02 + 0.36) / 2) ** 2
    assert mean_perp_sq > thr_sq


def test_raycast_df_hits_wall():
    wall = _wall_points()
    df = build_distance_field(wall, 0.1, 0.6)
    begin = jnp.asarray([0.0, 0.0, 0.0], jnp.float32)
    end = jnp.asarray([3.0, 0.0, 0.0], jnp.float32)
    col, cpos, sin_ang = raycast_df(df, begin, end, 0.1, 0.1, 0.3, 64)
    assert bool(col)
    assert abs(float(cpos[0]) - 2.0) < 0.2


def test_raycast_df_no_collision():
    wall = _wall_points()
    df = build_distance_field(wall, 0.1, 0.6)
    begin = jnp.asarray([0.0, 0.0, 0.0], jnp.float32)
    end = jnp.asarray([1.0, 0.0, 0.0], jnp.float32)  # stops before wall
    col, _, _ = raycast_df(df, begin, end, 0.1, 0.1, 0.3, 64)
    assert not bool(col)


def test_raycast_occ_hits_wall():
    wall = _wall_world()
    occ = build_occupancy_grid(wall, 0.2)
    begin = jnp.asarray([0.0, 0.0, 0.0], jnp.float32)
    end = jnp.asarray([3.0, 0.0, 0.0], jnp.float32)
    col, cpos, sin_ang = raycast_occ(occ, begin, end, 0.3, 0xFFFFFFFF, 64)
    assert bool(col)
    assert abs(float(cpos[0]) - 2.0) < 0.25
    assert float(sin_ang) == 1.0  # DDA hardcodes sin (raycast_using_dda.h:151)


def test_raycast_occ_perpendicular_refinement_corner_clip():
    """raycast_using_dda.h:237-258: a ray that clips an occupied voxel's
    corner far from the voxel's map point must NOT collide (LONG), while
    the naive any-occupied-voxel check says SHORT.  min_dist_thr_sq uses
    the reference's gx^2+gy^2+gy^2 formula; at map grid 0.1 the floor is
    sqrt(0.03) ~ 0.173 m."""
    # back wall keeps the ray origin inside the map AABB; the target
    # point sits at the far corner of its 0.2 m voxel
    pts = np.concatenate([
        _wall_points(-4.0, 3.0, 0.1),
        np.array([[2.19, 0.199, 0.0]]),
    ])
    occ = build_occupancy_grid(pts, 0.2)
    begin = jnp.asarray([0.0, 0.001, 0.001], jnp.float32)
    end = jnp.asarray([4.0, 0.001, 0.001], jnp.float32)
    # perpendicular distance point<->ray ~ 0.198 > 0.173: refined = LONG
    col_ref, _, _ = raycast_occ(
        occ, begin, end, 0.3, 0xFFFFFFFF, 128,
        ray_angle_half=0.25 * math.pi / 180.0, min_dist_thr_sq=0.03)
    assert not bool(col_ref)
    # naive occupied-voxel check (parameters zero) disagrees: SHORT
    col_naive, _, _ = raycast_occ(occ, begin, end, 0.3, 0xFFFFFFFF, 128)
    assert bool(col_naive)
    # control: point near the ray axis still collides under refinement
    pts2 = np.concatenate([
        _wall_points(-4.0, 3.0, 0.1),
        np.array([[2.1, 0.02, 0.01]]),
    ])
    occ2 = build_occupancy_grid(pts2, 0.2)
    col_hit, cpos, _ = raycast_occ(
        occ2, begin, end, 0.3, 0xFFFFFFFF, 128,
        ray_angle_half=0.25 * math.pi / 180.0, min_dist_thr_sq=0.03)
    assert bool(col_hit)
    assert abs(float(cpos[0]) - 2.1) < 0.05


def test_raycast_occ_outside_map_is_long():
    wall = _wall_world()
    occ = build_occupancy_grid(wall, 0.2)
    begin = jnp.asarray([-50.0, 0.0, 0.0], jnp.float32)
    end = jnp.asarray([3.0, 0.0, 0.0], jnp.float32)
    col, _, _ = raycast_occ(occ, begin, end, 0.3, 0xFFFFFFFF, 512)
    assert not bool(col)  # raycast_using_dda.h:70-75


def test_raycast_occ_label_transparency():
    wall = _wall_world()
    labels = np.full(len(wall), 5, np.uint32)
    occ = build_occupancy_grid(wall, 0.2, labels)
    begin = jnp.asarray([0.0, 0.0, 0.0], jnp.float32)
    end = jnp.asarray([3.0, 0.0, 0.0], jnp.float32)
    col_blocked, _, _ = raycast_occ(occ, begin, end, 0.3, 0xFFFFFFFF, 64)
    col_clear, _, _ = raycast_occ(occ, begin, end, 0.3, 4, 64)
    assert bool(col_blocked)
    assert not bool(col_clear)  # labels > filter_label_max are transparent


# ------------------------------------------------------------------- beam


def _beam_setup(scan_x, use_dda):
    wall = _wall_world()
    df = build_distance_field(_wall_points(), 0.1, 0.6)
    occ = build_occupancy_grid(wall, 0.2)
    scan = jnp.asarray([[scan_x, 0.0, 0.0]], jnp.float32)
    kwargs = dict(
        use_dda=use_dda, map_grid_min=0.1, map_grid_max=0.1, hit_range=0.3,
        beam_likelihood_min=0.2, num_points_default=1,
        sin_total_ref=math.sin(math.pi / 6), filter_label_max=0xFFFFFFFF,
        add_penalty_short_only_mode=True, num_steps=80,
    )
    return df, occ, scan, kwargs


def _run_beam(df, occ, scan, kwargs, pos):
    return beam_measure(
        df, occ, jnp.asarray([pos], jnp.float32),
        mq.identity()[None, :], scan,
        jnp.zeros(1, jnp.int32), jnp.ones(1, bool),
        jnp.zeros((1, 3), jnp.float32), **kwargs,
    )


def _sweep(use_dda):
    # beam endpoint at the wall from the true pose
    df, occ, scan, kwargs = _beam_setup(2.0, use_dda)
    # true pose: ray ends at wall -> HIT
    lik, _, status = _run_beam(df, occ, scan, kwargs, [0.0, 0.0, 0.0])
    assert int(status[0, 0]) == BeamStatus.HIT
    assert abs(float(lik[0]) - 1.0) < 1e-6
    # particle shifted forward: scan endpoint lands beyond the wall,
    # ray collides well before it -> SHORT, penalized
    lik_s, _, status_s = _run_beam(df, occ, scan, kwargs, [1.0, 0.0, 0.0])
    assert int(status_s[0, 0]) == BeamStatus.SHORT
    assert abs(float(lik_s[0]) - 0.2) < 1e-6
    # particle shifted back: ray stops short of the wall -> LONG, not
    # penalized in short-only mode
    lik_l, _, status_l = _run_beam(df, occ, scan, kwargs, [-1.5, 0.0, 0.0])
    assert int(status_l[0, 0]) == BeamStatus.LONG
    assert abs(float(lik_l[0]) - 1.0) < 1e-6


def test_beam_sweep_kdtree_mode():
    _sweep(use_dda=False)


def test_beam_sweep_dda_mode():
    _sweep(use_dda=True)


def test_beam_long_penalty_mode():
    df, occ, scan, kwargs = _beam_setup(2.0, False)
    kwargs["add_penalty_short_only_mode"] = False
    lik_l, _, status_l = _run_beam(df, occ, scan, kwargs, [-1.5, 0.0, 0.0])
    assert int(status_l[0, 0]) == BeamStatus.LONG
    assert abs(float(lik_l[0]) - 0.2) < 1e-6  # LONG penalized now


def test_beam_score_floor():
    # many SHORT beams: score floors at beam_likelihood_min
    # (lidar_measurement_model_beam.cpp:151-152)
    df, occ, _, kwargs = _beam_setup(2.0, False)
    kwargs["num_points_default"] = 3
    scan3 = jnp.asarray([[2.5, 0.0, 0.0]] * 3, jnp.float32)
    lik, _, _ = beam_measure(
        df, occ, jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32),
        mq.identity()[None, :], scan3,
        jnp.zeros(3, jnp.int32), jnp.ones(3, bool),
        jnp.zeros((1, 3), jnp.float32), **kwargs,
    )
    assert abs(float(lik[0]) - 0.2) < 1e-5


# ---------------------------------------------------------------- landmark


def test_landmark_likelihood_peaks_at_measurement():
    from mcl_3dl_tpu.math.nd import NormalLikelihoodNd
    from mcl_3dl_tpu.models.landmark import landmark_likelihood

    nd = NormalLikelihoodNd(np.diag([0.1] * 6))
    pos = jnp.asarray([[1.0, 2.0, 0.5], [1.5, 2.0, 0.5]], jnp.float32)
    rot = jnp.broadcast_to(mq.identity(), (2, 4))
    lik = np.asarray(landmark_likelihood(
        pos, rot, jnp.asarray([1.0, 2.0, 0.5], jnp.float32),
        mq.identity(), nd,
    ))
    assert lik[0] > lik[1]
    # rotation offset also penalized via the rpy difference
    rot2 = jnp.stack([mq.identity(),
                      mq.from_rpy(jnp.asarray([0, 0, 0.5], jnp.float32))])
    pos2 = jnp.broadcast_to(jnp.asarray([1.0, 2.0, 0.5]), (2, 3))
    lik2 = np.asarray(landmark_likelihood(
        pos2, rot2, jnp.asarray([1.0, 2.0, 0.5], jnp.float32),
        mq.identity(), nd,
    ))
    assert lik2[0] > lik2[1]


def test_beam_grouped_kernel_matches_fixed_march():
    """The grouped beam kernel (ops/grouped.grouped_beam_pen, interpret
    mode on CPU) must reproduce the pure-XLA fixed march + reference
    classification (raycast_fixed + lidar_measurement_model_beam.cpp:
    124-192 scoring) over a yaw fan of particles."""
    from mcl_3dl_tpu.models.beam import beam_measure_grouped, raycast_fixed
    from mcl_3dl_tpu.ops import grouped as og

    rng = np.random.default_rng(3)
    wall = _wall_points(x=2.0, half=3.0, grid=0.1)
    df = build_distance_field(wall, 0.1, 0.6, weights=(1.0, 1.0, 1.0),
                              pack_corners=False)

    B = 3
    N = og.TILE
    # beam endpoints on the wall, one per origin slot
    ends = np.array([[2.0, 0.3, 0.1], [2.0, -0.8, -0.2], [2.0, 1.4, 0.4]],
                    np.float32)
    origins = np.array([[0.0, 0.0, 0.2], [0.05, -0.02, 0.25]], np.float32)
    origin_idx = np.array([0, 1, 0], np.int32)
    valid = jnp.asarray([True, True, False])

    pos = jnp.asarray(np.array([0.05, -0.02, 0.0])
                      + rng.normal(0, 0.05, (N, 3)), jnp.float32)
    rpy = np.stack([
        rng.normal(0, 0.02, N), rng.normal(0, 0.02, N),
        rng.uniform(-0.5, 0.5, N)], axis=1)
    rot = jnp.asarray(
        np.stack([np.asarray(mq.from_rpy(jnp.asarray(r))) for r in rpy]),
        jnp.float32)

    grid_min, grid_max, hit_range = 0.1, 0.15, 0.3
    num_steps = int(math.ceil((3.0 + hit_range) / grid_min)) + 2
    blm, npd, sin_tr = 0.2, 3, math.sin(math.pi / 6.0)

    lik_g = beam_measure_grouped(
        df, pos, rot, jnp.asarray(ends), jnp.asarray(origin_idx), valid,
        jnp.asarray(origins),
        map_grid_min=grid_min, map_grid_max=grid_max, hit_range=hit_range,
        beam_likelihood_min=blm, num_points_default=npd,
        sin_total_ref=sin_tr, add_penalty_short_only_mode=False,
        num_steps=num_steps, active=jnp.ones((N,), bool),
        fallback=lambda: jnp.full((N,), -1.0),   # poison: fits must hold
    )
    assert float(jnp.min(lik_g)) >= 0.0, "grouped path did not engage"

    # oracle: fixed march + reference classification, done in XLA
    rmat = mq.rotation_matrix(mq.normalize(rot))
    e = (jnp.einsum("bj,nij->nbi", jnp.asarray(ends), rmat)
         + pos[:, None, :])
    o = (jnp.einsum("bj,nij->nbi", jnp.asarray(origins[origin_idx]), rmat)
         + pos[:, None, :])
    coll, cpos, sin_a = raycast_fixed(df, o, e, grid_min, grid_max,
                                      hit_range, num_steps)
    dist_sq = jnp.sum((e - cpos) ** 2, axis=-1)
    graze = coll & (sin_a <= sin_tr)
    short = coll & ~graze & (dist_sq >= hit_range**2)
    long_ = ~coll
    pen = (short | long_) & valid[None, :]
    n_pen = jnp.sum(pen, axis=-1).astype(jnp.float32)
    lik_ref = jnp.maximum((blm ** (1.0 / npd)) ** n_pen, blm)

    # the kernel's affine cell arithmetic and sample_nearest round the
    # same query through different fp association orders, so particles
    # sitting exactly on a cell boundary can flip one probe — allow a
    # per-mille of such flips, require exact agreement elsewhere
    mismatch = ~np.isclose(np.asarray(lik_g), np.asarray(lik_ref),
                           rtol=1e-6, atol=1e-6)
    assert mismatch.mean() < 0.005, (
        mismatch.sum(), np.asarray(lik_g)[mismatch][:4],
        np.asarray(lik_ref)[mismatch][:4])


def test_fixed_march_total_reflection_geometry():
    """Pin the incidence estimate (raycast_using_kdtree.h:88-102): for a
    ray hitting a dense wall at angle alpha to the surface, the probe-
    delta estimate must approximate sin(alpha) — grazing rays classify
    TOTAL_REFLECTION, steep rays don't."""
    from mcl_3dl_tpu.models.beam import raycast_fixed

    grid = 0.05
    wall = _wall_points(x=2.0, half=4.0, grid=grid)
    df = build_distance_field(wall, grid, 0.6, weights=(1.0, 1.0, 1.0),
                              pack_corners=False)

    def cast(alpha):
        # ray in the xy plane; angle alpha between ray and the wall
        # plane (x = 2) means direction (sin a, cos a, 0)
        d = np.array([math.sin(alpha), math.cos(alpha), 0.0])
        begin = np.array([[2.0 - 3.0 * d[0], -3.0 * d[1], 0.0]], np.float32)
        end = begin + (3.2 * d).astype(np.float32)
        coll, _, sin_a = raycast_fixed(
            df, jnp.asarray(begin), jnp.asarray(end), grid, grid, 0.3,
            int((3.2 + 0.3) / grid) + 2)
        return bool(coll[0]), float(sin_a[0])

    hit_g, sin_g = cast(math.radians(8.0))     # grazing
    hit_s, sin_s = cast(math.radians(60.0))    # steep
    assert hit_g and hit_s
    # quantization tolerance: probes snap to 0.05 m cells over a 0.1 m
    # baseline, so allow a loose band — the classification threshold
    # (sin 30 deg = 0.5) still separates cleanly
    assert abs(sin_g - math.sin(math.radians(8.0))) < 0.25, sin_g
    assert sin_g < 0.5 < sin_s, (sin_g, sin_s)
