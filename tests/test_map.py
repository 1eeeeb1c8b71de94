"""Map pipeline tests (mirror test_chunked_kdtree.cpp correctness vs
brute force, plus voxel downsample and occupancy semantics)."""

import numpy as np
import jax.numpy as jnp

from mcl_3dl_tpu.config import Params
from mcl_3dl_tpu.map import (
    MapData,
    build_distance_field,
    build_occupancy_grid,
    voxel_downsample,
)


def brute_force_dist(points, queries, weights, trunc):
    w = np.asarray(weights)
    d = np.linalg.norm(
        (queries[:, None, :] - points[None, :, :]) * w, axis=-1
    ).min(axis=1)
    return np.minimum(d, trunc)


def test_voxel_downsample_centroid():
    pts = np.array(
        [[0.01, 0.01, 0.01], [0.09, 0.09, 0.09], [0.55, 0.0, 0.0]], np.float64
    )
    out = voxel_downsample(pts, 0.1)
    assert out.shape == (2, 3)
    assert np.allclose(sorted(out[:, 0]), [0.05, 0.55], atol=1e-6)


def test_voxel_downsample_attrs_average():
    pts = np.array([[0.0, 0, 0], [0.05, 0, 0]], np.float64)
    out, attrs = voxel_downsample(pts, 0.1, attrs=np.array([[2.0], [4.0]]))
    assert out.shape == (1, 3)
    assert np.allclose(attrs, [[3.0]])


def test_voxel_downsample_negative_coords():
    pts = np.array([[-0.05, -0.05, -0.05], [-0.02, -0.02, -0.02]], np.float64)
    out = voxel_downsample(pts, 0.1)
    assert out.shape == (1, 3)
    assert np.allclose(out[0], [-0.035, -0.035, -0.035], atol=1e-6)


def test_distance_field_matches_brute_force():
    rng = np.random.default_rng(0)
    points = rng.uniform(-1.0, 1.0, (200, 3))
    cell, trunc = 0.05, 0.4
    df = build_distance_field(points, cell, trunc)
    queries = rng.uniform(-1.2, 1.2, (500, 3)).astype(np.float32)
    want = brute_force_dist(points, queries, (1, 1, 1), trunc)
    got = np.asarray(df.sample_nearest(jnp.asarray(queries)))
    # nearest-cell sampling error <= half cell diagonal + quantization
    err = np.abs(got - want)
    tol = cell * np.sqrt(3) / 2 + trunc / 255 + 1e-3
    assert (err <= tol).all(), err.max()


def test_corner_packed_trilinear_matches_unpacked():
    """The single-row-gather corner-packed path must reproduce the
    8-gather trilinear loop bit-for-bit, including per-corner OOB
    handling at and beyond the field boundary."""
    rng = np.random.default_rng(7)
    points = rng.uniform(-1.0, 1.0, (150, 3))
    cell, trunc = 0.05, 0.4
    weights = (1.0, 1.0, 0.4)
    df_packed = build_distance_field(points, cell, trunc, weights)
    df_plain = build_distance_field(points, cell, trunc, weights,
                                    pack_corners=False)
    assert df_packed.packed is not None and df_plain.packed is None
    # interior, boundary-straddling, and far-outside queries
    queries = np.concatenate([
        rng.uniform(-1.2, 1.2, (400, 3)),
        rng.uniform(-3.0, 3.0, (200, 3)),
        np.array([[50.0, 0.0, 0.0], [-50.0, -50.0, -50.0]]),
    ]).astype(np.float32)
    got = np.asarray(df_packed.sample_trilinear(jnp.asarray(queries)))
    want = np.asarray(df_plain.sample_trilinear(jnp.asarray(queries)))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_distance_field_trilinear_accuracy():
    rng = np.random.default_rng(1)
    points = rng.uniform(-1.0, 1.0, (100, 3))
    cell, trunc = 0.05, 0.4
    df = build_distance_field(points, cell, trunc)
    queries = rng.uniform(-0.9, 0.9, (300, 3)).astype(np.float32)
    want = brute_force_dist(points, queries, (1, 1, 1), trunc)
    got = np.asarray(df.sample_trilinear(jnp.asarray(queries)))
    sel = want < trunc - 2 * cell  # away from the truncation shell
    assert np.abs(got[sel] - want[sel]).max() < cell


def test_distance_field_anisotropic():
    # the z axis counts 5x, mirroring dist_weight_z (parameters.cpp:110)
    points = np.array([[0.0, 0.0, 0.0]])
    weights = (1.0, 1.0, 5.0)
    df = build_distance_field(points, 0.05, 0.5, weights)
    d_x = float(df.sample_nearest(jnp.asarray([0.2, 0.0, 0.0])))
    d_z = float(df.sample_nearest(jnp.asarray([0.0, 0.0, 0.2])))
    assert abs(d_x - 0.2) < 0.05
    assert abs(d_z - min(1.0, 0.5)) < 0.05  # 0.2 * 5 = 1.0, truncated to 0.5


def test_distance_field_cross_boundary():
    # mirror test_chunked_kdtree.cpp:38-88 — queries near points must see
    # them regardless of any internal partitioning
    pts = np.array([[0.5, 0.5, 0.5]])
    df = build_distance_field(pts, 0.1, 0.6)
    for off in ([0.2, 0, 0], [0, 0.2, 0], [0, 0, 0.2], [-0.2, 0, 0]):
        q = jnp.asarray(np.array([0.5, 0.5, 0.5]) + off, jnp.float32)
        assert abs(float(df.sample_trilinear(q)) - 0.2) < 0.05


def test_out_of_bounds_is_truncated():
    df = build_distance_field(np.array([[0.0, 0.0, 0.0]]), 0.1, 0.5)
    assert float(df.sample_nearest(jnp.asarray([50.0, 0.0, 0.0]))) == 0.5
    assert float(df.sample_trilinear(jnp.asarray([-50.0, 0.0, 0.0]))) == 0.5


def test_occupancy_grid_basic():
    pts = np.array([[0.05, 0.05, 0.05], [1.05, 0.05, 0.05]])
    occ = build_occupancy_grid(pts, 0.2, labels=np.array([3, 7], np.uint32))
    o, lbl, pos = occ.lookup(jnp.asarray([[0.1, 0.1, 0.1], [0.5, 0.1, 0.1]]))
    assert bool(o[0]) and not bool(o[1])
    assert int(lbl[0]) == 3
    # all representative slots hold the voxel's single point
    assert np.allclose(np.asarray(pos[0]),
                       [[0.05, 0.05, 0.05]] * pos.shape[-2], atol=0.01)


def test_occupancy_representative_points_two_surfaces():
    """A voxel holding two separated point clusters must expose both as
    representatives (the reference stores every point per voxel,
    raycast_using_dda.h:162-190); a mean point would fall in the gap."""
    # two "surfaces" inside one 0.4 m voxel: x ~ 0.02 and x ~ 0.38
    pts = np.array([
        [0.02, 0.1, 0.1], [0.02, 0.2, 0.1], [0.02, 0.3, 0.1],
        [0.38, 0.1, 0.1], [0.38, 0.2, 0.1], [0.38, 0.3, 0.1],
    ])
    occ = build_occupancy_grid(pts, 0.4)
    _, _, pos = occ.lookup(jnp.asarray([0.2, 0.2, 0.2]))
    xs = np.asarray(pos)[:, 0]
    assert (np.abs(xs - 0.02) < 0.01).any()    # first surface present
    assert (np.abs(xs - 0.38) < 0.01).any()    # second surface present
    assert not ((np.abs(xs - 0.2) < 0.05).any())   # no mean-point smear


def test_occupancy_min_label():
    pts = np.array([[0.05, 0.05, 0.05], [0.06, 0.05, 0.05]])
    occ = build_occupancy_grid(pts, 0.2, labels=np.array([9, 2], np.uint32))
    _, lbl, _ = occ.lookup(jnp.asarray([0.1, 0.1, 0.1]))
    assert int(lbl) == 2


def test_map_data_build_and_merge():
    rng = np.random.default_rng(2)
    pts = rng.uniform(0, 2.0, (500, 3))
    params = Params()
    m = MapData.build(pts, params)
    assert m.points.shape[0] <= 500
    d = float(m.df.sample_trilinear(jnp.asarray(m.points[0], jnp.float32)))
    assert d < 0.1

    extra = np.array([[5.0, 5.0, 5.0]])
    m2 = m.merged_with(extra)
    d2 = float(m2.df.sample_trilinear(jnp.asarray([5.0, 5.0, 5.0], jnp.float32)))
    assert d2 < 0.1
    # the original map is unchanged (out of its bounds -> truncated)
    d_old = float(m.df.sample_trilinear(jnp.asarray([5.0, 5.0, 5.0], jnp.float32)))
    assert abs(d_old - m.df.trunc) < 1e-5
