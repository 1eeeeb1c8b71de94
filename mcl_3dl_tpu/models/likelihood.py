"""Likelihood-field LIDAR measurement model — the flagship hot kernel.

Re-designs ``LidarMeasurementModelLikelihood``
(src/lidar_measurement_model_likelihood.cpp:105-139): the reference
transforms the sampled scan by each particle's pose and runs one kd-tree
``radiusSearch(match_dist_min)`` per point per particle; here the
transform is a single ``[N,3,3] x [K,3]`` batched matmul (MXU) and the
nearest-distance query is a gather from the precomputed distance field
(HBM), fused with the clamp+sum score reduction.

Score per particle (lidar_measurement_model_likelihood.cpp:124-135):

    for each matched point (weighted nearest dist d <= match_dist_min):
        score += match_weight * (match_dist_min - max(d, match_dist_flat))
    quality = matched / num_points

Two device paths for nearest-cell sampling:

* XLA gather (robust, any particle spread) — ~117M lookups/s on v5e.
* **Local-table Pallas kernel** (``local_kernel=True``): for each scan
  point, all particle-transformed copies land in a small cell box once
  the filter has converged; a per-point local table is extracted with
  cheap XLA gathers and ``ops.local_score`` evaluates the full
  ``[points, particles]`` grid at VPU gather rate (~2.5G lookups/s,
  tools/exp_gather.py).  A ``lax.cond`` falls back to the XLA path
  whenever the spread exceeds the box (startup, global localization,
  expansion resets).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mcl_3dl_tpu.map.distance_field import DistanceField
from mcl_3dl_tpu.math import quat as mq
from mcl_3dl_tpu.ops.grouped import TILE as _GTILE
from mcl_3dl_tpu.ops.grouped import grouped_prepare, grouped_score
from mcl_3dl_tpu.ops.local_gather import local_score

# Local box, in (weighted-space) distance-field cells.  32x32x16 at the
# default 0.1 m grid = 3.2 x 3.2 x 1.6 m of per-point particle spread —
# comfortably above converged-tracking spread (including the lever-arm
# smear of far points under residual yaw uncertainty), far below
# global-localization spread.
_BOX = (32, 32, 16)


def clip_mask(points, clip_near, clip_far, clip_z_min, clip_z_max):
    """Annulus + z-band clip in the sensor/base frame
    (lidar_measurement_model_likelihood.cpp:84-93).  Returns keep-mask."""
    r2 = points[..., 0] ** 2 + points[..., 1] ** 2
    keep = (r2 <= clip_far**2) & (r2 >= clip_near**2)
    keep &= (points[..., 2] >= clip_z_min) & (points[..., 2] <= clip_z_max)
    return keep


def _finalize(score, mcount, valid):
    """Empty-cloud guard (lidar_measurement_model_likelihood.cpp:111-114):
    an all-invalid cloud returns (1, 0) per particle."""
    num = jnp.sum(valid)
    has_points = num > 0
    quality = mcount / jnp.maximum(num, 1)
    likelihood = jnp.where(has_points, score, 1.0)
    quality = jnp.where(has_points, quality, 0.0)
    return likelihood, quality


def likelihood_measure(
    df: DistanceField,
    pos: jnp.ndarray,          # [N, 3] particle positions
    rot: jnp.ndarray,          # [N, 4] particle quaternions
    points: jnp.ndarray,       # [K, 3] sampled scan points (base_link frame)
    valid: jnp.ndarray,        # [K] bool — sampled-slot validity
    match_dist_min: float,
    match_dist_flat: float,
    match_weight: float,
    trilinear: bool = True,
    local_kernel: bool = False,
    active: jnp.ndarray | None = None,
):
    """Returns ``(likelihood[N], quality[N])``.

    ``trilinear=False`` uses nearest-cell sampling (1 gather per query
    instead of 8) — the engine switches to it during global localization
    where particle counts are ~100k-1M and half-cell quantization is far
    below the pose uncertainty.

    ``active`` masks trailing inactive capacity slots (stale poses) out
    of the yaw-grouped fast path's interval bounds; their own scores are
    still produced (harmlessly — out-of-box queries read ``trunc``).

    With ``local_kernel=True`` and nearest sampling, three device paths
    are tried in order of speed (each guarded by a lax.cond):

    1. **yaw-grouped local tables** (ops/grouped.py) — engages at any
       converged-tracking spread, the 1M-particle steady state included;
    2. **per-point global box** (ops/local_gather.py) — tight clusters;
    3. **XLA gather** — any spread (startup, global localization).
    """
    N = pos.shape[0]
    use_local = (
        local_kernel
        and not trilinear
        and N % 128 == 0
        and N >= 128
        and float(df.trunc) > float(match_dist_min)
    )
    rmat = mq.rotation_matrix(mq.normalize(rot))          # [N, 3, 3]

    if not use_local:
        # [N, K, 3] = points @ R^T + pos
        transformed = (
            jnp.einsum("kj,nij->nki", points, rmat,
                       preferred_element_type=jnp.float32)
            + pos[:, None, :]
        )
        if trilinear:
            d = df.sample_trilinear(transformed)           # [N, K]
        else:
            d = df.sample_nearest(transformed)
        matched = (d <= match_dist_min) & valid[None, :]
        contrib = match_weight * (
            match_dist_min - jnp.maximum(d, match_dist_flat))
        contrib = jnp.maximum(contrib, 0.0)                # "if dist<0 continue"
        score = jnp.sum(jnp.where(matched, contrib, 0.0), axis=-1)
        return _finalize(score, jnp.sum(matched, axis=-1), valid)

    # ---- local-table kernel paths ([K, N] layout; no [N,K] transpose) ----
    K = points.shape[0]
    BX, BY, BZ = _BOX
    R = BX * BY * BZ // 128
    nx, ny, nz = df.field.shape
    dims = jnp.asarray([nx, ny, nz], jnp.int32)
    w = jnp.asarray(df.weights, jnp.float32)
    trunc = float(df.trunc)

    def _transform_kn():
        return (
            jnp.einsum("kj,nij->kni", points, rmat,
                       preferred_element_type=jnp.float32)
            + pos[None, :, :]
        )                                                  # [K, N, 3]

    def slow(_):
        dq = df.sample_nearest(_transform_kn())            # [K, N]
        matched = (dq <= match_dist_min) & valid[:, None]
        contrib = match_weight * (
            match_dist_min - jnp.maximum(dq, match_dist_flat))
        contrib = jnp.maximum(contrib, 0.0)
        score = jnp.sum(jnp.where(matched, contrib, 0.0), axis=0)
        return score, jnp.sum(matched, axis=0).astype(jnp.float32)

    def tier_box(_):
        """Per-point exact global box: all [K, N] queries quantized,
        per-point min/max; kernel engages only if every point's box
        fits _BOX.  Exact (not interval-conservative) but pays the
        [K, N, 3] transform even when it then falls back."""
        transformed = _transform_kn()
        u = (transformed * w - df.origin) / jnp.float32(df.cell)
        iq = jnp.round(u).astype(jnp.int32)                # [K, N, 3]
        lo = jnp.min(iq, axis=1)                           # [K, 3]
        ext = jnp.max(iq, axis=1) - lo
        boxa = jnp.asarray(_BOX, jnp.int32)
        fits = jnp.all((ext < boxa) | ~valid[:, None])

        def fast(_):
            offs = jnp.stack(
                jnp.meshgrid(jnp.arange(BX), jnp.arange(BY), jnp.arange(BZ),
                             indexing="ij"),
                axis=-1,
            ).reshape(-1, 3).astype(jnp.int32)             # [BX*BY*BZ, 3]
            g = lo[:, None, :] + offs[None]                # [K, BOXC, 3]
            oob = jnp.any((g < 0) | (g >= dims), axis=-1)
            gc = jnp.clip(g, 0, dims - 1)
            flat = (gc[..., 0] * ny + gc[..., 1]) * nz + gc[..., 2]
            scale = jnp.float32(trunc / 255.0)
            vals = jnp.take(df.field.reshape(-1), flat,
                            axis=0).astype(jnp.float32) * scale
            vals = jnp.where(oob, trunc, vals)
            # fold point validity: all-trunc table => unmatched, 0 contrib
            vals = jnp.where(valid[:, None], vals, trunc)
            tables = vals.reshape(K, R, 128)

            dl = iq - lo[:, None, :]
            lidx = (dl[..., 0] * BY + dl[..., 1]) * BZ + dl[..., 2]
            lidx = jnp.clip(lidx, 0, R * 128 - 1)
            return local_score(
                tables, lidx,
                match_dist_min=float(match_dist_min),
                match_dist_flat=float(match_dist_flat),
                match_weight=float(match_weight),
                trunc=trunc,
            )

        return jax.lax.cond(fits, fast, slow, None)

    # Tier 1: yaw-grouped local tables.  grouped_prepare is O(N) row ops
    # (no [K, N] tensor), so when its interval boxes fit — the converged
    # steady state at any particle count — the step never materializes
    # the [K, N, 3] transform at all.
    if N % _GTILE == 0 and df.field2d is not None:
        act = jnp.ones((N,), bool) if active is None else active
        plan = grouped_prepare(df, pos, rot, rmat, points, valid, act)

        def grouped_fast(_):
            return grouped_score(
                df, plan, points, valid,
                match_dist_min=float(match_dist_min),
                match_dist_flat=float(match_dist_flat),
                match_weight=float(match_weight),
            )

        score, mcount = jax.lax.cond(plan.fits, grouped_fast, tier_box, None)
    else:
        score, mcount = tier_box(None)
    return _finalize(score, mcount, valid)
