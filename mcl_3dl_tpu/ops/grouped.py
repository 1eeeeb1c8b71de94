"""Yaw-grouped, z-lane local-table scoring — the generalized fast path.

Why the per-point axis-aligned box (ops/local_gather.py) is not enough:
measured steady-state tracking (no global localization) has yaw spread
~0.4 rad and roll/pitch spread ~0.1-0.5 rad; at 6 m point range the
rotation lever arm smears each scan point's particle-transformed queries
over metres — and the z axis is 5x worse in the field's weighted space
(``dist_weight_z``).  An axis-aligned box over ALL particles is huge,
and Mosaic's only full-2D gather scheme (row loop + lane gather) costs
O(rows) per query.

This module fixes both axes structurally:

* **z as lanes**: the distance field is stored z-major, so a 128-lane
  table row is a contiguous z *window* (12.8 weighted units = 2.56 m of
  real z at defaults).  The kernel's lane gather resolves z exactly —
  z spread costs nothing as long as it fits one window.
* **yaw grouping**: particles are counting-sorted into ``G`` yaw bins
  (cheap: one scatter histogram + G masked cumsums + one row scatter,
  all at XLA row-op rate — no comparison sort).  Within a bin the yaw
  lever arm collapses, so the per-(point, group) xy box stays ~1 m.

Queries have the affine form ``q = A_n @ p + b_n`` where ``A_n`` is the
particle's weighted/scaled rotation and ``p`` a *virtual point* — a
sampled scan point for the likelihood model (p = point_k), or a fixed
ray-march probe for the beam model (p = origin_b + t_s * dir_b).  The
same sorted layout and interval-arithmetic group boxes therefore serve
both measurement models; only the in-kernel reduction differs.

Reference semantics preserved: nearest-cell distance lookup equals
``DistanceField.sample_nearest`` (chunked_kdtree.h:217-237 radiusSearch
replacement) wherever the group boxes fit; a ``fits`` flag lets the
caller ``lax.cond`` back to the XLA gather path otherwise (startup,
global localization, kidnapped-robot spreads).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tunables (static): G yaw groups, particle tile (8 sublanes x 128
# lanes), xy box in weighted-space distance-field cells, z window =
# one 128-lane row.
G_GROUPS = 16
TILE = 1024
BX = 12
BY = 12
R_ROWS = BX * BY
ZW = 128


class GroupedParticles(NamedTuple):
    """Particles counting-sorted into yaw groups, in kernel layout."""

    A: jnp.ndarray           # [nt, 12, 8, 128] f32 — rows 0..8: W@R/cell, 9..11: (pos*w - origin)/cell
    dest: jnp.ndarray        # [N] i32 — sorted slot of original particle i
    tile_group: jnp.ndarray  # [nt] i32
    a_min: jnp.ndarray       # [G, 12] f32 per-group coefficient bounds
    a_max: jnp.ndarray       # [G, 12] f32
    any_active: jnp.ndarray  # [G] bool


def _yaw_from_quat(rot):
    x, y, z, w = rot[..., 0], rot[..., 1], rot[..., 2], rot[..., 3]
    return jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))


def build_groups(pos, rot_mat, rot, weights3, cell, origin3, active) -> GroupedParticles:
    """Counting-sort particles into yaw bins and build the affine layout.

    ``rot_mat`` is the [N, 3, 3] rotation matrix batch the caller already
    computed for its own transform path (no duplicate quat->matrix work).
    Inactive particles are placed in the last bin and excluded from the
    per-group interval bounds (their scores are never read).
    """
    n = pos.shape[0]
    w = jnp.asarray(weights3, jnp.float32)
    inv_cell = jnp.float32(1.0 / cell)

    yaw = _yaw_from_quat(rot)
    big = jnp.float32(1e9)
    ylo = jnp.min(jnp.where(active, yaw, big))
    yhi = jnp.max(jnp.where(active, yaw, -big))
    span = jnp.maximum(yhi - ylo, 1e-6)
    g = jnp.clip(((yaw - ylo) / span * G_GROUPS).astype(jnp.int32), 0, G_GROUPS - 1)
    g = jnp.where(active, g, G_GROUPS - 1)

    # A = diag(w) @ R / cell (9), b = (pos * w - origin) / cell (3)
    a9 = (rot_mat * w[:, None]).reshape(n, 9) * inv_cell
    b3 = (pos * w - jnp.asarray(origin3, jnp.float32)) * inv_cell
    A = jnp.concatenate([a9, b3], axis=-1)                       # [N, 12]

    counts = jnp.zeros((G_GROUPS,), jnp.int32).at[g].add(1)
    counts_p = ((counts + TILE - 1) // TILE) * TILE
    starts_p = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts_p)[:-1]]
    )
    rank = jnp.zeros((n,), jnp.int32)
    for gg in range(G_GROUPS):
        m = g == gg
        rank = jnp.where(m, jnp.cumsum(m.astype(jnp.int32)) - 1, rank)
    dest = starts_p[g] + rank                                    # [N]

    n_pad = n + G_GROUPS * TILE
    nt = n_pad // TILE
    a_sorted = jnp.zeros((n_pad, 12), jnp.float32).at[dest].set(A)
    a_tiles = a_sorted.reshape(nt, 8, 128, 12).transpose(0, 3, 1, 2)

    ends_p = jnp.cumsum(counts_p)
    tile_starts = jnp.arange(nt, dtype=jnp.int32) * TILE
    tile_group = jnp.clip(
        jnp.searchsorted(ends_p, tile_starts, side="right"), 0, G_GROUPS - 1
    ).astype(jnp.int32)

    mins, maxs, anys = [], [], []
    for gg in range(G_GROUPS):
        m = ((g == gg) & active)[:, None]
        mins.append(jnp.min(jnp.where(m, A, big), axis=0))
        maxs.append(jnp.max(jnp.where(m, A, -big), axis=0))
        anys.append(jnp.any(m))
    return GroupedParticles(
        A=a_tiles, dest=dest, tile_group=tile_group,
        a_min=jnp.stack(mins), a_max=jnp.stack(maxs),
        any_active=jnp.stack(anys),
    )


def group_boxes(gp: GroupedParticles, pts):
    """Interval-arithmetic query bounds per (virtual point, group).

    ``pts`` [K, 3]: virtual points in base_link frame.  Returns
    ``lo [K, G, 3] i32`` (window origin; z clipped later by the
    extractor) and ``fits [K, G]`` — whether the conservative extent
    fits (BX, BY, ZW).  Empty groups trivially fit.
    """
    p = pts.astype(jnp.float32)                                  # [K, 3]
    lo_f = jnp.zeros((pts.shape[0], G_GROUPS, 3), jnp.float32)
    hi_f = jnp.zeros_like(lo_f)
    for i in range(3):
        lo_i = gp.a_min[:, 9 + i][None, :]
        hi_i = gp.a_max[:, 9 + i][None, :]
        for j in range(3):
            amin = gp.a_min[:, 3 * i + j][None, :]               # [1, G]
            amax = gp.a_max[:, 3 * i + j][None, :]
            pj = p[:, j][:, None]                                # [K, 1]
            lo_i = lo_i + jnp.minimum(amin * pj, amax * pj)
            hi_i = hi_i + jnp.maximum(amin * pj, amax * pj)
        lo_f = lo_f.at[..., i].set(lo_i)
        hi_f = hi_f.at[..., i].set(hi_i)
    lo = jnp.floor(lo_f).astype(jnp.int32)
    ext = jnp.ceil(hi_f).astype(jnp.int32) - lo + 1
    box = jnp.asarray([BX, BY, ZW], jnp.int32)
    fits = jnp.all(ext <= box, axis=-1) | ~gp.any_active[None, :]
    return lo, fits


def extract_tables(field2d, ny, nzp, lo, point_valid, trunc):
    """Gather per-(virtual point, group) local tables from the z-major
    field.

    ``field2d`` [nx*ny, nzp] u8 (z padded to >= 128 with 255 = trunc).
    ``lo`` [K, G, 3].  Returns ``(tables [K, G, R, ZW] f32, z_used
    [K, G] i32)`` — ``z_used`` is the clipped window start the kernel
    must subtract.  Invalid points get all-trunc tables (no match, zero
    contribution), mirroring ops/local_gather.local_score.
    """
    kk, gg = lo.shape[0], lo.shape[1]
    nxy = field2d.shape[0]
    nx = nxy // ny
    dx = jnp.arange(BX, dtype=jnp.int32)
    dy = jnp.arange(BY, dtype=jnp.int32)
    ix = lo[..., 0, None, None] + dx[:, None]                    # [K, G, BX, 1]
    iy = lo[..., 1, None, None] + dy[None, :]                    # [K, G, 1, BY] -> broadcast
    ix = jnp.broadcast_to(ix, (kk, gg, BX, BY))
    iy = jnp.broadcast_to(iy, (kk, gg, BX, BY))
    row_ok = (ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny)
    xyrow = jnp.clip(ix * ny + iy, 0, nxy - 1).reshape(kk, gg, R_ROWS)
    z_used = jnp.clip(lo[..., 2], 0, nzp - ZW)                   # [K, G]

    starts = jnp.stack(
        [xyrow, jnp.broadcast_to(z_used[..., None], xyrow.shape)], axis=-1
    )                                                            # [K, G, R, 2]
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(3,), collapsed_slice_dims=(0,), start_index_map=(0, 1)
    )
    rows = jax.lax.gather(
        field2d, starts, dn, slice_sizes=(1, ZW),
        mode=jax.lax.GatherScatterMode.CLIP,
    )                                                            # [K, G, R, ZW] u8
    vals = rows.astype(jnp.float32) * jnp.float32(trunc / 255.0)
    vals = jnp.where(row_ok.reshape(kk, gg, R_ROWS)[..., None], vals, trunc)
    vals = jnp.where(point_valid[:, None, None, None], vals, trunc)
    return vals, z_used


def _affine_query(a_ref, px, py, pz, lox, loy, zlo):
    """In-kernel query: relative cell coords of A @ p + b."""
    a = a_ref[0]                                                 # [12, 8, 128]
    ux = a[0] * px + a[1] * py + a[2] * pz + a[9]
    uy = a[3] * px + a[4] * py + a[5] * pz + a[10]
    uz = a[6] * px + a[7] * py + a[8] * pz + a[11]
    ix = jnp.round(ux).astype(jnp.int32) - lox
    iy = jnp.round(uy).astype(jnp.int32) - loy
    iz = jnp.round(uz).astype(jnp.int32) - zlo
    inbox = (
        (ix >= 0) & (ix < BX) & (iy >= 0) & (iy < BY) & (iz >= 0) & (iz < ZW)
    )
    row = jnp.clip(ix * BY + iy, 0, R_ROWS - 1)
    lane = jnp.clip(iz, 0, ZW - 1)
    return row, lane, inbox


def _row_select(tab_ref, row, lane, fill):
    """Full-2D lookup: loop table rows, lane-gather, select on row match
    (the only Mosaic-supported arbitrary-gather scheme; see
    tools/exp_gather2.py for the failed direct alternatives)."""
    def body(r, d):
        rowv = tab_ref[0, 0, pl.ds(r, 1), :]
        rowb = jnp.broadcast_to(rowv, row.shape)
        v = jnp.take_along_axis(rowb, lane, axis=1)
        return jnp.where(row == r, v, d)

    return jax.lax.fori_loop(0, R_ROWS, body, jnp.full(row.shape, fill, jnp.float32))


def _like_kernel(tgrp_ref, meta_ref, pts_ref, tab_ref, a_ref,
                 score_ref, match_ref, *, trunc, mdm, mdf, mw):
    t = pl.program_id(0)
    k = pl.program_id(1)
    gsel = tgrp_ref[t]
    lox = meta_ref[k, gsel, 0]
    loy = meta_ref[k, gsel, 1]
    zlo = meta_ref[k, gsel, 2]
    scale = jnp.float32(1.0 / 65536.0)
    px = pts_ref[k, 0].astype(jnp.float32) * scale
    py = pts_ref[k, 1].astype(jnp.float32) * scale
    pz = pts_ref[k, 2].astype(jnp.float32) * scale

    row2, lane2, inbox = _affine_query(a_ref, px, py, pz, lox, loy, zlo)
    row = row2.reshape(8, 128)
    lane = lane2.reshape(8, 128)
    d = _row_select(tab_ref, row, lane, trunc)
    d = jnp.where(inbox.reshape(8, 128), d, trunc)

    matched = d <= mdm
    contrib = jnp.maximum(mw * (mdm - jnp.maximum(d, mdf)), 0.0)
    contrib = jnp.where(matched, contrib, 0.0)

    @pl.when(k == 0)
    def _():
        score_ref[...] = jnp.zeros_like(score_ref)
        match_ref[...] = jnp.zeros_like(match_ref)

    score_ref[...] += contrib
    match_ref[...] += matched.astype(jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("match_dist_min", "match_dist_flat", "match_weight",
                     "trunc"),
)
def grouped_like_score(
    gp_A: jnp.ndarray,         # [nt, 12, 8, 128]
    tile_group: jnp.ndarray,   # [nt] i32
    meta: jnp.ndarray,         # [K, G, 4] i32: lo_x, lo_y, z_used, pad
    pts_fp: jnp.ndarray,       # [K, 4] i32 — point coords * 2^16
    tables: jnp.ndarray,       # [K, G, R, ZW] f32
    *,
    match_dist_min: float,
    match_dist_flat: float,
    match_weight: float,
    trunc: float,
):
    """Likelihood-field scoring over the sorted layout.

    Returns ``(score [nt*8*128], match_count [nt*8*128])`` in SORTED
    slot order; the caller gathers back with ``GroupedParticles.dest``.
    Scoring semantics match lidar_measurement_model_likelihood.cpp:124-135
    (flat-floor clamp, matched mask, per-particle sum + match count).
    """
    nt = gp_A.shape[0]
    kk = tables.shape[0]
    kern = functools.partial(
        _like_kernel, trunc=float(trunc), mdm=float(match_dist_min),
        mdf=float(match_dist_flat), mw=float(match_weight),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nt, kk),
        in_specs=[
            pl.BlockSpec(
                (1, 1, R_ROWS, ZW),
                lambda t, k, tg, mt, pf: (k, tg[t], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 12, 8, 128),
                lambda t, k, tg, mt, pf: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, 128), lambda t, k, tg, mt, pf: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda t, k, tg, mt, pf: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    score, match = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nt, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((nt, 8, 128), jnp.float32),
        ],
        interpret=jax.default_backend() == "cpu",
    )(tile_group, meta, pts_fp, tables, gp_A)
    return score.reshape(-1), match.reshape(-1)


# ---------------------------------------------------------------------------
# Orchestration: the caller-facing two-phase API used by
# models/likelihood.py.  Phase 1 (prepare) is cheap — counting sort +
# interval boxes, O(N*12 + K*G) row ops, no [K, N] tensor — so the
# caller can test ``fits`` BEFORE paying for table extraction, and keep
# the whole extraction+kernel inside the taken branch of a lax.cond.
# ---------------------------------------------------------------------------


class GroupedPlan(NamedTuple):
    gp: GroupedParticles
    lo: jnp.ndarray        # [K, G, 3] i32 window origins
    fits: jnp.ndarray      # [] bool — every (valid point, group) box fits


def grouped_prepare(df, pos, rot, rot_mat, points, valid, active) -> GroupedPlan:
    """Counting-sort the particles and bound every (point, group) query
    box.  ``df`` is a map.distance_field.DistanceField with ``field2d``;
    ``rot_mat`` the [N, 3, 3] matrices the caller already has."""
    gp = build_groups(pos, rot_mat, rot, df.weights, float(df.cell),
                      df.origin, active)
    lo, fits_kg = group_boxes(gp, points)
    fits = jnp.all(fits_kg | ~valid[:, None])
    return GroupedPlan(gp=gp, lo=lo, fits=fits)


def grouped_score(df, plan: GroupedPlan, points, valid, *,
                  match_dist_min, match_dist_flat, match_weight):
    """Extract local tables and run the grouped scoring kernel.

    Returns ``(score [N], match_count [N])`` in ORIGINAL particle order.
    Only call under ``plan.fits`` (lax.cond); semantics then equal the
    XLA nearest-cell path (lidar_measurement_model_likelihood.cpp:124-135).
    """
    nx, ny, nz = df.field.shape
    nzp = df.field2d.shape[1]
    tables, z_used = extract_tables(
        df.field2d, ny, nzp, plan.lo, valid, float(df.trunc))
    meta = jnp.concatenate(
        [plan.lo[..., :2], z_used[..., None],
         jnp.zeros(z_used.shape + (1,), jnp.int32)], axis=-1)      # [K, G, 4]
    pts_fp = jnp.round(points.astype(jnp.float32) * 65536.0).astype(jnp.int32)
    pts_fp = jnp.concatenate(
        [pts_fp, jnp.zeros((points.shape[0], 1), jnp.int32)], axis=-1)
    s_sorted, m_sorted = grouped_like_score(
        plan.gp.A, plan.gp.tile_group, meta, pts_fp, tables,
        match_dist_min=float(match_dist_min),
        match_dist_flat=float(match_dist_flat),
        match_weight=float(match_weight),
        trunc=float(df.trunc),
    )
    return jnp.take(s_sorted, plan.gp.dest), jnp.take(m_sorted, plan.gp.dest)
