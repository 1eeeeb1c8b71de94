"""Procedural point-cloud test worlds.

Ports the generators the reference integration tests build inline
(e.g. test/src/test_global_localization.cpp:50-127,
test_expansion_resetting.cpp:50-108): an axis-aligned room with floor
and walls, plus a simulated LIDAR scan of it from a given pose.
"""

from __future__ import annotations

import numpy as np

from mcl_3dl_tpu.math import quat as mq
import jax.numpy as jnp


def make_room(
    x0=-5.0, x1=5.0, y0=-5.0, y1=5.0, z0=0.0, z1=2.0, grid=0.1,
    with_ceiling=False,
):
    """Floor + four walls (optionally ceiling) sampled on a grid."""
    pts = []
    xs = np.arange(x0, x1 + grid / 2, grid)
    ys = np.arange(y0, y1 + grid / 2, grid)
    zs = np.arange(z0, z1 + grid / 2, grid)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    pts.append(np.stack([gx.ravel(), gy.ravel(), np.full(gx.size, z0)], axis=1))
    if with_ceiling:
        pts.append(np.stack([gx.ravel(), gy.ravel(), np.full(gx.size, z1)], axis=1))
    gx, gz = np.meshgrid(xs, zs, indexing="ij")
    for y in (y0, y1):
        pts.append(np.stack([gx.ravel(), np.full(gx.size, y), gz.ravel()], axis=1))
    gy, gz = np.meshgrid(ys, zs, indexing="ij")
    for x in (x0, x1):
        pts.append(np.stack([np.full(gy.size, x), gy.ravel(), gz.ravel()], axis=1))
    return np.concatenate(pts, axis=0)


def simulate_scan(
    map_points: np.ndarray,
    pos: np.ndarray,
    rot: np.ndarray,
    n_rays: int = 256,
    max_range: float = 10.0,
    fov_elev=(-0.3, 0.3),
    noise: float = 0.0,
    seed: int = 0,
):
    """Simulate a LIDAR scan: for rays from the sensor pose, return the
    nearest map point along each ray (within an angular tolerance).

    Output points are in the SENSOR (base) frame.  Crude but adequate
    for synthetic-world convergence tests.
    """
    rng = np.random.default_rng(seed)
    az = rng.uniform(-np.pi, np.pi, n_rays)
    el = rng.uniform(fov_elev[0], fov_elev[1], n_rays)
    dirs = np.stack(
        [np.cos(el) * np.cos(az), np.cos(el) * np.sin(az), np.sin(el)], axis=1
    )
    # world-frame ray directions
    dirs_w = np.asarray(mq.rotate(jnp.asarray(rot, jnp.float32),
                                  jnp.asarray(dirs, jnp.float32)))
    rel = map_points - np.asarray(pos)[None, :]
    dist = np.linalg.norm(rel, axis=1)
    ok = dist < max_range
    rel, dist_ok = rel[ok], dist[ok]
    unit = rel / dist_ok[:, None]

    hits = []
    for d in dirs_w:
        along = unit @ d
        cand = along > 0.999  # within ~2.5 deg of the ray
        if not cand.any():
            continue
        i = np.argmin(np.where(cand, dist_ok, np.inf))
        hits.append(rel[i])
    if not hits:
        return np.zeros((0, 3), np.float32)
    hits = np.asarray(hits)
    if noise > 0:
        hits = hits + rng.normal(0, noise, hits.shape)
    # back to sensor frame
    inv = mq.inv(jnp.asarray(rot, jnp.float32))
    return np.asarray(mq.rotate(inv, jnp.asarray(hits, jnp.float32)))
