"""Point sampler tests (mirror test_point_cloud_random_sampler*.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np

from mcl_3dl_tpu.models.samplers import (
    estimate_normals_host,
    sample_uniform,
    sample_weighted_without_replacement,
    sampler_with_normal_weights,
)


def test_uniform_sampler_statistics():
    p = 1000
    pts = jnp.asarray(np.arange(p, dtype=np.float32)[:, None].repeat(3, 1))
    valid = jnp.asarray(np.ones(p, bool))
    sampled, ok, idx = sample_uniform(jax.random.PRNGKey(0), pts, valid, 5000)
    assert bool(ok.all())
    i = np.asarray(idx)
    # uniform over [0, p): mean ~ p/2, all within range
    assert (i >= 0).all() and (i < p).all()
    assert abs(i.mean() - p / 2) < p * 0.05


def test_uniform_sampler_respects_validity():
    p = 100
    pts = jnp.asarray(np.random.rand(p, 3).astype(np.float32))
    valid = np.zeros(p, bool)
    valid[10:20] = True
    _, ok, idx = sample_uniform(
        jax.random.PRNGKey(1), pts, jnp.asarray(valid), 200
    )
    i = np.asarray(idx)
    assert ((i >= 10) & (i < 20)).all()
    assert bool(ok.all())


def test_uniform_sampler_empty():
    pts = jnp.zeros((16, 3))
    _, ok, _ = sample_uniform(jax.random.PRNGKey(2), pts, jnp.zeros(16, bool), 8)
    assert not bool(ok.any())


def test_normal_estimation_plane():
    # points on z=0 plane -> normals along z
    rng = np.random.default_rng(0)
    pts = np.concatenate(
        [rng.uniform(0, 2, (300, 2)), np.zeros((300, 1))], axis=1
    )
    normals = estimate_normals_host(pts, 0.4)
    nz = np.abs(normals[:, 2])
    assert (nz > 0.95).mean() > 0.9


def test_with_normal_weights_prefer_aligned():
    # dominant uncertainty along x (cov x >> y,z): points with x-normals
    # should be up-weighted
    normals = jnp.asarray(
        np.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]], np.float32)
    )
    valid = jnp.ones(3, bool)
    pos_cov = jnp.asarray(np.diag([1.0, 0.01, 0.01]), jnp.float32)
    ident = jnp.asarray([0.0, 0.0, 0.0, 1.0], jnp.float32)
    w = np.asarray(
        sampler_with_normal_weights(normals, valid, pos_cov, ident,
                                    2.0, 5.0, 5.0)
    )
    assert w[0] > w[1] and w[0] > w[2]
    assert abs(w[0] - 5.0) < 0.2   # fully ramped at ratio 10 >> 5


def test_with_normal_weights_isotropic_no_amplification():
    normals = jnp.asarray(np.eye(3, dtype=np.float32))
    pos_cov = jnp.asarray(np.eye(3) * 0.1, jnp.float32)
    ident = jnp.asarray([0.0, 0.0, 0.0, 1.0], jnp.float32)
    w = np.asarray(
        sampler_with_normal_weights(normals, jnp.ones(3, bool), pos_cov,
                                    ident, 2.0, 5.0, 5.0)
    )
    assert np.allclose(w, 1.0, atol=0.05)


def test_weighted_without_replacement_no_duplicates():
    p = 64
    pts = jnp.asarray(np.arange(p, dtype=np.float32)[:, None].repeat(3, 1))
    weights = jnp.asarray(np.random.default_rng(1).uniform(0.1, 1, p))
    _, ok, idx = sample_weighted_without_replacement(
        jax.random.PRNGKey(3), pts, weights, 32
    )
    i = np.asarray(idx)
    assert len(np.unique(i)) == 32
    assert bool(ok.all())


def test_weighted_without_replacement_prefers_heavy():
    p = 200
    pts = jnp.zeros((p, 3))
    w = np.full(p, 0.01, np.float32)
    w[:20] = 10.0
    hits = 0
    for s in range(20):
        _, _, idx = sample_weighted_without_replacement(
            jax.random.PRNGKey(s), pts, jnp.asarray(w), 10
        )
        hits += (np.asarray(idx) < 20).sum()
    assert hits > 150  # heavy points dominate draws
