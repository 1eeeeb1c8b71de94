"""Correlative global localization — dense (x, y, yaw) scoring by FFT.

A TPU-native alternative to the reference's seed-everywhere-and-decay
global localization (src/mcl_3dl.cpp:1039-1099 + the 0.75x particle
decay): instead of evaluating ~100k particle hypotheses over many
measurement updates, evaluate the likelihood-field score of **every**
(x, y) cell for each yaw bin in one shot:

    S_yaw[t] = sum_k W2[t + q_k(yaw)]

is a 2-D cross-correlation of the planar contribution field ``W2`` with
the impulse image of the yaw-rotated scan — computed exactly by FFT on
the MXU-friendly XLA FFT, O(cells log cells) instead of
O(particles x points) gathers.  Top-scoring cells seed the particle
filter (z from the standable-surface map), which then refines z / roll /
pitch / fine pose with the normal measurement updates.

The planar field collapses z over the scan's clip band (max of the
per-cell contribution), so peaks are (x, y, yaw) candidates; vertical
discrimination is left to the particle phase — the same split the
reference makes by seeding only on standable surfaces.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from mcl_3dl_tpu.map.distance_field import DistanceField


@dataclass(frozen=True)
class PlanarField:
    """Planar contribution field + cached FFT (device)."""

    w2: jnp.ndarray          # [fx, fy] float32 contribution, zero-padded
    w2_fft: jnp.ndarray      # [fx, fy] complex64
    origin_xy: jnp.ndarray   # [2] weighted-space origin of cell (0, 0)
    cell: float
    shape_unpadded: tuple


def build_planar_field(
    df: DistanceField,
    match_dist_min: float,
    match_dist_flat: float,
    match_weight: float,
    z_lo: float,
    z_hi: float,
    pad_cells: int,
) -> PlanarField:
    """Collapse the 3-D distance field into a planar contribution field.

    ``z_lo/z_hi`` bound the (unweighted) world z band to collapse —
    normally the map's full z range; the scan's own z clip happens when
    building the impulse image.
    """
    scale = jnp.float32(df.trunc / 255.0)
    d = df.field.astype(jnp.float32) * scale            # [nx, ny, nz]
    wz = float(df.weights[2])
    nz = d.shape[2]
    z0 = float(df.origin[2])
    zs = (z0 + jnp.arange(nz, dtype=jnp.float32) * df.cell) / wz
    zmask = (zs >= z_lo) & (zs <= z_hi)

    contrib = jnp.where(
        d <= match_dist_min,
        match_weight * (match_dist_min - jnp.maximum(d, match_dist_flat)),
        0.0,
    )
    contrib = jnp.where(zmask[None, None, :], contrib, 0.0)
    w2 = jnp.max(contrib, axis=2)                        # [nx, ny]

    nx, ny = w2.shape
    fx, fy = nx + pad_cells, ny + pad_cells
    w2p = jnp.zeros((fx, fy), jnp.float32).at[:nx, :ny].set(w2)
    return PlanarField(
        w2=w2p,
        w2_fft=jnp.fft.rfft2(w2p),
        origin_xy=df.origin[:2],
        cell=df.cell,
        shape_unpadded=(nx, ny),
    )


def correlate_scan(
    pf_field: PlanarField,
    scan_xy_weighted: jnp.ndarray,   # [K, 2] scan points * (wx, wy), base frame
    yaws: jnp.ndarray,               # [J] yaw angles to test
):
    """Score every (translation cell, yaw) -> [J, fx, fy].

    The impulse image counts scan points per cell offset; its
    correlation with w2 gives, for each translation of the scan origin,
    the summed per-point contribution (each point scored by the max-z
    contribution at its landing cell).
    """
    fx, fy = pf_field.w2.shape
    cell = pf_field.cell

    cos = jnp.cos(yaws)[:, None]
    sin = jnp.sin(yaws)[:, None]
    x = scan_xy_weighted[None, :, 0]
    y = scan_xy_weighted[None, :, 1]
    # NOTE: rotating weighted coords by yaw is exact when wx == wy
    # (the default: dist_weight x = y = 1).
    rx = cos * x - sin * y                              # [J, K]
    ry = sin * x + cos * y

    ox = jnp.round(rx / cell).astype(jnp.int32) % fx
    oy = jnp.round(ry / cell).astype(jnp.int32) % fy

    def impulse(oxj, oyj):
        img = jnp.zeros((fx, fy), jnp.float32)
        return img.at[oxj, oyj].add(1.0)

    imgs = jax.vmap(impulse)(ox, oy)                    # [J, fx, fy]
    imgs_fft = jnp.fft.rfft2(imgs)
    # correlation: IFFT( conj(FFT(impulse)) * FFT(w2) )
    scores = jnp.fft.irfft2(
        jnp.conj(imgs_fft) * pf_field.w2_fft[None], s=(fx, fy)
    )
    return scores


def top_candidates(scores: jnp.ndarray, pf_field: PlanarField, n: int):
    """Top-n (x_weighted, y_weighted, yaw_index, score) from the score
    volume, restricted to in-map cells."""
    j, fx, fy = scores.shape
    nx, ny = pf_field.shape_unpadded
    xm = jnp.arange(fx) < nx
    ym = jnp.arange(fy) < ny
    valid = xm[:, None] & ym[None, :]
    flat = jnp.where(valid[None], scores, -jnp.inf).reshape(-1)
    vals, idx = jax.lax.top_k(flat, n)
    yaw_i = idx // (fx * fy)
    rem = idx % (fx * fy)
    cx = rem // fy
    cy = rem % fy
    x = pf_field.origin_xy[0] + cx.astype(jnp.float32) * pf_field.cell
    y = pf_field.origin_xy[1] + cy.astype(jnp.float32) * pf_field.cell
    return x, y, yaw_i, vals
