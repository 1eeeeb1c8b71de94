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

Three device paths for nearest-cell sampling, fastest first, each
engaging behind a ``lax.cond`` so only the taken tier executes:

1. **pose-grouped local tables** (ops/grouped.py) — converged-tracking
   spreads at any particle count; envelope-outlier particles are
   re-scored exactly by a small gather path, so results stay bit-equal
   to the XLA path.
2. **per-point global box** (ops/local_gather.py) — tight clusters.
3. **XLA gather** — any spread (startup, global localization).

Tier 2 and 3 share one [K, N, 3] transform + quantization (computed
inside their common fallback branch, never on the grouped tier).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mcl_3dl_tpu.map.distance_field import DistanceField
from mcl_3dl_tpu.math import quat as mq
from mcl_3dl_tpu.ops import grouped as og
from mcl_3dl_tpu.ops.local_gather import local_score

# Local box, in (weighted-space) distance-field cells.  32x32x16 at the
# default 0.1 m grid = 3.2 x 3.2 x 1.6 m of per-point particle spread —
# comfortably above tight-cluster spread, far below global-localization
# spread.
_BOX = (32, 32, 16)

TIER_GROUPED = 0
TIER_BOX = 1
TIER_XLA = 2


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


def _score_from_dist(d, valid_k, match_dist_min, match_dist_flat,
                     match_weight, axis):
    """The reference's clamp+sum reduction over the points axis."""
    matched = (d <= match_dist_min) & valid_k
    contrib = match_weight * (
        match_dist_min - jnp.maximum(d, match_dist_flat))
    contrib = jnp.maximum(contrib, 0.0)                # "if dist<0 continue"
    score = jnp.sum(jnp.where(matched, contrib, 0.0), axis=axis)
    return score, jnp.sum(matched, axis=axis).astype(jnp.float32)


def grouped_like_apply(df, stats, layout, lo, points, valid, *,
                       match_dist_min, match_dist_flat, match_weight):
    """Run the grouped Pallas scoring kernel + exact overflow rescore.

    Only call under the engaged ``fits`` branch; results are then
    bit-equal to the XLA nearest-cell path for EVERY particle —
    in-envelope particles via the kernel, envelope outliers via
    ``overflow_*`` exact gathers scattered over the kernel output.
    """
    ny = df.field.shape[1]
    nzp = df.field2d.shape[1]
    trunc = float(df.trunc)
    tables, z_used = og.extract_tables(df.field2d, ny, nzp, lo, valid, trunc)
    # Block-skip words: a 16-row block whose minimum distance (over the
    # envelope's reachable z band) exceeds match_dist_min can only
    # produce unmatched rows (contribution 0, match 0 — exactly the
    # fill value's effect), so the kernel elides its 16 lane-gathers; a
    # fully-skippable (point, group) table skips the whole point.
    min_d = og.block_min_dist(
        tables, trunc, lo=lo, z_used=z_used,
        bands=og.query_bands(stats, points))               # [K, G, NBLK]
    skipw = og.pack_block_skip(min_d > jnp.float32(match_dist_min))
    s_sorted, m_sorted = og.grouped_like_score(
        layout.A, layout.tile_group, og.make_meta(lo, z_used),
        og.points_fp(points), skipw, tables,
        match_dist_min=float(match_dist_min),
        match_dist_flat=float(match_dist_flat),
        match_weight=float(match_weight),
        trunc=trunc,
    )
    score = jnp.take(s_sorted, layout.dest)
    mcount = jnp.take(m_sorted, layout.dest)

    # exact rescore of the envelope outliers (sentinel rows scatter-drop)
    q_of = og.overflow_transform(stats.A, layout.over_idx, points)
    code = og.overflow_field_lookup(df.field, q_of)              # [C, K]
    d_of = code.astype(jnp.float32) * jnp.float32(trunc / 255.0)
    s_of, m_of = _score_from_dist(
        d_of, valid[None, :], match_dist_min, match_dist_flat,
        match_weight, axis=1)
    score = score.at[layout.over_idx].set(s_of)
    mcount = mcount.at[layout.over_idx].set(m_of)
    return score, mcount


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
    rmat: jnp.ndarray | None = None,
    grouped=None,
    with_info: bool = False,
):
    """Returns ``(likelihood[N], quality[N])`` (+ the engaged tier id
    with ``with_info=True``).

    ``trilinear=False`` uses nearest-cell sampling (1 gather per query
    instead of 8) — the engine switches to it during global localization
    where particle counts are ~100k-1M and half-cell quantization is far
    below the pose uncertainty.

    ``grouped``: optional ``(stats, layout, lo, fits)`` prepared by the
    caller (the engine shares ONE sorted layout between this model and
    the beam model).  When omitted but eligible, it is built here.

    ``active`` masks trailing inactive capacity slots (stale poses) out
    of the grouped fast path's bin envelopes; their own scores are
    still produced (harmlessly — out-of-box queries read ``trunc``).
    """
    N = pos.shape[0]
    use_local = (
        local_kernel
        and not trilinear
        and N % 128 == 0
        and N >= 128
        and float(df.trunc) > float(match_dist_min)
    )
    if rmat is None:
        rmat = mq.rotation_matrix(mq.normalize(rot))      # [N, 3, 3]

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
        score, mcount = _score_from_dist(
            d, valid[None, :], match_dist_min, match_dist_flat,
            match_weight, axis=-1)
        lik, qual = _finalize(score, mcount, valid)
        if with_info:
            return lik, qual, jnp.int32(TIER_XLA)
        return lik, qual

    # ---- local-table kernel paths ([K, N] layout; no [N,K] transpose) ----
    K = points.shape[0]
    BX, BY, BZ = _BOX
    R = BX * BY * BZ // 128
    nx, ny, nz = df.field.shape
    dims = jnp.asarray([nx, ny, nz], jnp.int32)
    w = jnp.asarray(df.weights, jnp.float32)
    trunc = float(df.trunc)
    scale = jnp.float32(trunc / 255.0)

    def fallback(_):
        """Tiers 2+3: ONE [K, N, 3] transform + quantization, shared by
        the per-point box kernel and the plain XLA gather."""
        transformed = (
            jnp.einsum("kj,nij->kni", points, rmat,
                       preferred_element_type=jnp.float32)
            + pos[None, :, :]
        )                                                  # [K, N, 3]
        u = (transformed * w - df.origin) / jnp.float32(df.cell)
        iq = jnp.round(u).astype(jnp.int32)                # [K, N, 3]
        lo = jnp.min(iq, axis=1)                           # [K, 3]
        ext = jnp.max(iq, axis=1) - lo
        boxa = jnp.asarray(_BOX, jnp.int32)
        fits_box = jnp.all((ext < boxa) | ~valid[:, None])

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

        def slow(_):
            # nearest-cell gather straight from the shared iq
            # (== df.sample_nearest on the same queries)
            oob = jnp.any((iq < 0) | (iq >= dims), axis=-1)
            ic = jnp.clip(iq, 0, dims - 1)
            flat = (ic[..., 0] * ny + ic[..., 1]) * nz + ic[..., 2]
            d = jnp.take(df.field.reshape(-1), flat,
                         axis=0).astype(jnp.float32) * scale
            d = jnp.where(oob, trunc, d)                   # [K, N]
            return _score_from_dist(
                d, valid[:, None], match_dist_min, match_dist_flat,
                match_weight, axis=0)

        s, m = jax.lax.cond(fits_box, fast, slow, None)
        return s, m, jnp.where(fits_box, jnp.int32(TIER_BOX),
                               jnp.int32(TIER_XLA))

    if grouped is None and N % og.TILE == 0 and df.field2d is not None:
        act = jnp.ones((N,), bool) if active is None else active
        cap = og.default_overflow_cap(N)
        stats = og.group_stats(pos, rmat, rot, df.weights, float(df.cell),
                               df.origin, act)
        lo, fits_kg = og.group_boxes(stats, points, df.field.shape)
        fits = jnp.all(fits_kg | ~valid[:, None]) & (stats.n_over <= cap)
        layout = jax.lax.cond(
            fits,
            lambda: og.build_layout(stats, cap),
            lambda: og.empty_layout(N, cap),
        )
        grouped = (stats, layout, lo, fits)

    if grouped is not None:
        stats, layout, lo, fits = grouped

        def grouped_fast(_):
            s, m = grouped_like_apply(
                df, stats, layout, lo, points, valid,
                match_dist_min=match_dist_min,
                match_dist_flat=match_dist_flat,
                match_weight=match_weight,
            )
            return s, m, jnp.int32(TIER_GROUPED)

        score, mcount, tier = jax.lax.cond(fits, grouped_fast, fallback, None)
    else:
        score, mcount, tier = fallback(None)
    lik, qual = _finalize(score, mcount, valid)
    if with_info:
        return lik, qual, tier
    return lik, qual
