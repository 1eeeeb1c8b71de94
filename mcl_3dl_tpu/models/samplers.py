"""Scan-point random samplers (reference layer L3).

``sample_uniform`` mirrors ``PointCloudUniformSampler``
(point_cloud_random_samplers/point_cloud_uniform_sampler.h:44-75):
``num_points`` draws with replacement, uniform over the clipped cloud.
Operates on a fixed-capacity padded point buffer + validity mask so the
draw runs on device with static shapes.

``sample_with_normal`` mirrors ``PointCloudSamplerWithNormal``
(point_cloud_random_samplers/point_cloud_sampler_with_normal.h:54-186):
points whose estimated surface normal aligns with the dominant
uncertainty direction of the particle cloud are up-weighted, and draws
are without replacement via the cumulative-weight walk.  Normal
estimation (PCA of neighbors within ``normal_search_range``) runs on
host at scan ingest; the weighted draw runs on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def sample_uniform(
    key: jax.Array,
    points: jnp.ndarray,       # [P, 3+] padded point buffer
    valid: jnp.ndarray,        # [P] bool
    num_points: int,
):
    """Returns ``(sampled [num_points, C], sampled_valid [num_points])``.

    Sampled slots are uniform-with-replacement over valid points; if no
    point is valid, ``sampled_valid`` is all-False (the engine raises
    the reference's ERROR_POINTS_NOT_FOUND in that case,
    src/mcl_3dl.cpp:385-391).
    """
    n_valid = jnp.sum(valid)
    p = valid / jnp.maximum(n_valid, 1)
    idx = jax.random.choice(key, points.shape[0], (num_points,), replace=True, p=p)
    sampled = points[idx]
    ok = (n_valid > 0) & jnp.ones((num_points,), bool)
    return sampled, ok, idx


def estimate_normals_host(
    points: np.ndarray, search_range: float
) -> np.ndarray:
    """Estimate per-point surface normals by neighborhood PCA (host).

    Equivalent of PCL ``NormalEstimation`` with a radius search
    (point_cloud_sampler_with_normal.h:95-109): the normal is the
    eigenvector of the neighborhood covariance with the smallest
    eigenvalue.  Uses a voxel-hash neighbor search; points with < 3
    neighbors get a zero normal.
    """
    from scipy.spatial import cKDTree

    points = np.asarray(points, np.float64).reshape(-1, 3)
    m = points.shape[0]
    normals = np.zeros((m, 3), np.float32)
    if m == 0:
        return normals
    tree = cKDTree(points)
    neigh = tree.query_ball_point(points, search_range, workers=-1)
    counts = np.fromiter((len(n) for n in neigh), np.int64, m)
    idx = np.concatenate([np.asarray(n, np.int64) for n in neigh]) \
        if counts.sum() else np.zeros((0,), np.int64)
    starts = np.zeros((m,), np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    q = points[idx]
    # per-point neighborhood scatter matrix from segment moments:
    # cov = sum(q q^T) - n * mean mean^T  (same eigenvectors as the
    # centered form the reference's PCL NormalEstimation uses)
    s1 = np.add.reduceat(q, starts, axis=0) if m else q.sum(0)
    outer = q[:, :, None] * q[:, None, :]
    s2 = np.add.reduceat(outer.reshape(-1, 9), starts, axis=0)
    # reduceat quirk: a zero-length segment returns the element at its
    # start index — mask those out below via counts
    ok = counts >= 3
    n = np.maximum(counts, 1).astype(np.float64)[:, None]
    mean = s1 / n
    cov = s2.reshape(-1, 3, 3) - (n[..., None] * mean[:, :, None]
                                  * mean[:, None, :])
    cov_ok = cov[ok]
    if cov_ok.shape[0]:
        _, v = np.linalg.eigh(cov_ok)
        normals[ok] = v[:, :, 0].astype(np.float32)
    return normals


def sampler_with_normal_weights(
    normals: jnp.ndarray,        # [P, 3] per-point normals (base frame)
    valid: jnp.ndarray,          # [P]
    pos_cov: jnp.ndarray,        # [3, 3] particle position covariance (map)
    mean_rot: jnp.ndarray,       # [4] mean pose quaternion
    perform_weighting_ratio: float,
    max_weight_ratio: float,
    max_weight: float,
):
    """Per-point importance weights from the particle covariance.

    Mirrors point_cloud_sampler_with_normal.h:110-158: take the dominant
    position-uncertainty eigenvector (of the elementwise-abs covariance,
    :83), rotate it into the mean pose's local frame (:128-129, where the
    scan normals live), and ramp each point's weight linearly in the
    angle between its normal and that direction
    (``w = 1 + (max_w-1)(pi/2 - angle)/(pi/2)``, :154-155); the overall
    amplification ramps with the sqrt eigenvalue ratio between
    ``perform_weighting_ratio`` and ``max_weight_ratio`` (:110-127).
    """
    from mcl_3dl_tpu.math import quat as mq

    w, v = jnp.linalg.eigh(jnp.abs(pos_cov))
    # eigh sorts ascending: largest eigenvalue last, second-largest before.
    ratio = jnp.sqrt(jnp.maximum(w[2], 0.0) / jnp.maximum(w[1], 1e-12))
    direction = mq.rotate(mq.inv(mean_rot), v[:, 2])
    t = (ratio - perform_weighting_ratio) / (
        max_weight_ratio - perform_weighting_ratio
    )
    amp = 1.0 + jnp.clip(t, 0.0, 1.0) * (max_weight - 1.0)
    cos = jnp.clip(jnp.abs(jnp.sum(normals * direction, axis=-1)), 0.0, 1.0)
    angle = jnp.arccos(cos)
    half_pi = jnp.pi / 2
    weights = 1.0 + (amp - 1.0) * ((half_pi - angle) / half_pi)
    # zero normals (too few neighbors) keep weight 1 like the NaN guard
    # at :144-156
    no_normal = jnp.sum(normals * normals, axis=-1) < 1e-12
    weights = jnp.where(no_normal, 1.0, weights)
    return jnp.where(valid, weights, 0.0)


def sample_weighted_without_replacement(
    key: jax.Array,
    points: jnp.ndarray,       # [P, C]
    weights: jnp.ndarray,      # [P] nonnegative
    num_points: int,
):
    """Weighted draw without duplicates (point_cloud_sampler_with_normal.h:
    159-172) via the Gumbel top-k trick (equivalent distribution to
    sequential CDF draws with removal)."""
    g = jax.random.gumbel(key, weights.shape)
    scores = jnp.where(weights > 0, jnp.log(jnp.maximum(weights, 1e-30)) + g,
                       -jnp.inf)
    k = min(num_points, points.shape[0])
    idx = jax.lax.top_k(scores, k)[1]
    sampled = points[idx]
    ok = jnp.take(weights, idx) > 0
    return sampled, ok, idx
