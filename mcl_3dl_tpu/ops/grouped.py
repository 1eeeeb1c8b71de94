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


def group_boxes(gp: GroupedParticles, pts, offset=(0.0, 0.0, 0.0)):
    """Interval-arithmetic query bounds per (virtual point, group).

    ``pts`` [K, 3]: virtual points in base_link frame.  Returns
    ``lo [K, G, 3] i32`` (window origin; z clipped later by the
    extractor) and ``fits [K, G]`` — whether the conservative extent
    fits (BX, BY, ZW).  Empty groups trivially fit.

    ``offset`` (cells): constant shift applied to the query bounds —
    used when the lookup field's origin differs from the one
    ``build_groups`` encoded (df vs the label-filtered df_beam share
    cell/weights, so the frames differ by a constant).
    """
    p = pts.astype(jnp.float32)                                  # [K, 3]
    lo_f = jnp.zeros((pts.shape[0], G_GROUPS, 3), jnp.float32)
    hi_f = jnp.zeros_like(lo_f)
    for i in range(3):
        lo_i = gp.a_min[:, 9 + i][None, :] + jnp.float32(offset[i])
        hi_i = gp.a_max[:, 9 + i][None, :] + jnp.float32(offset[i])
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
    ``lo`` [K, G, 3].  Returns ``(tables [K, G, R, ZW] bf16 CODES in
    [0, 255] — distance = code * trunc/255, and u8 codes are exact in
    bf16 so the kernel's one-hot matmul reproduces ``sample_nearest``
    bit-for-bit — and ``z_used [K, G] i32``, the clipped window start
    the kernel must subtract).  Invalid points get all-255 (= trunc)
    tables: no match, zero contribution."""
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
    codes = rows.astype(jnp.bfloat16)
    full = jnp.bfloat16(255.0)
    codes = jnp.where(row_ok.reshape(kk, gg, R_ROWS)[..., None], codes, full)
    codes = jnp.where(point_valid[:, None, None, None], codes, full)
    return codes, z_used


def _affine_query(a, px, py, pz, lox, loy, zlo):
    """In-kernel query: relative cell coords of A @ p + b.

    ``a`` is the [12, 8, 128] coefficient block — everything stays in
    the compact (8, 128) vreg layout (a [TILE, 1]-oriented variant pads
    every elementwise op to 128 lanes and measured 128x slot waste).
    Returns [8, 128] row / lane indices + in-box mask.
    """
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


def _row_select(read_block, row, lane, fill):
    """Full-2D lookup: loop table rows, lane-gather, select on row match
    — the scheme ops/local_gather.py sustains ~2.5G lookups/s with.  (An
    MXU one-hot-matmul variant was tried and measured 3x slower end to
    end: the one-hot build and z-select run on [TILE, 1]-padded vectors,
    and the padding waste dwarfs the matmul win.)

    ``read_block(b) -> [16, ZW]`` reads one aligned 16-row bf16 block
    straight from the VMEM ref: Mosaic cannot dynamic-slice a
    materialized value, and a single dynamically-indexed row load fails
    sublane-alignment proving under the (16, 128) bf16 tiling — a
    ``pl.ds(b*16, 16)`` block start is provably aligned.  Returns
    selected codes [8, 128] f32.
    """
    nblk = R_ROWS // 16
    assert nblk * 16 == R_ROWS

    def body(bidx, d):
        blk = read_block(bidx).astype(jnp.float32)          # [16, ZW]
        for j in range(16):
            rowb = jnp.broadcast_to(blk[j:j + 1, :], row.shape)
            v = jnp.take_along_axis(rowb, lane, axis=1)
            d = jnp.where(row == bidx * 16 + j, v, d)
        return d

    return jax.lax.fori_loop(
        0, nblk, body, jnp.full(row.shape, fill, jnp.float32))


def _like_kernel(tgrp_ref, meta_ref, pts_ref, tab_ref, a_ref,
                 score_ref, match_ref, *, kk, trunc, mdm, mdf, mw):
    t = pl.program_id(0)
    gsel = tgrp_ref[t]
    a = a_ref[0]                                                 # [12, 8, 128]
    code_scale = jnp.float32(trunc / 255.0)
    pt_scale = jnp.float32(1.0 / 65536.0)

    def body(k, carry):
        acc, mac = carry
        mbase = (k * G_GROUPS + gsel) * 4
        lox = meta_ref[mbase + 0]
        loy = meta_ref[mbase + 1]
        zlo = meta_ref[mbase + 2]
        px = pts_ref[k * 4 + 0].astype(jnp.float32) * pt_scale
        py = pts_ref[k * 4 + 1].astype(jnp.float32) * pt_scale
        pz = pts_ref[k * 4 + 2].astype(jnp.float32) * pt_scale
        row, lane, inbox = _affine_query(a, px, py, pz, lox, loy, zlo)
        code = _row_select(
            lambda b: tab_ref[pl.ds(k, 1), 0, pl.ds(b * 16, 16), :][0],
            row, lane, 255.0)
        d = jnp.where(inbox, code * code_scale, trunc)           # [8, 128]
        matched = d <= mdm
        contrib = jnp.maximum(mw * (mdm - jnp.maximum(d, mdf)), 0.0)
        contrib = jnp.where(matched, contrib, 0.0)
        return acc + contrib, mac + matched.astype(jnp.float32)

    zero = jnp.zeros((8, 128), jnp.float32)
    acc, mac = jax.lax.fori_loop(0, kk, body, (zero, zero))
    score_ref[0] = acc
    match_ref[0] = mac


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
    tables: jnp.ndarray,       # [K, G, R, ZW] bf16 codes
    *,
    match_dist_min: float,
    match_dist_flat: float,
    match_weight: float,
    trunc: float,
):
    """Likelihood-field scoring over the sorted layout.

    Returns ``(score [nt*TILE], match_count [nt*TILE])`` in SORTED
    slot order; the caller gathers back with ``GroupedParticles.dest``.
    Scoring semantics match lidar_measurement_model_likelihood.cpp:124-135
    (flat-floor clamp, matched mask, per-particle sum + match count).

    Grid is (nt,) with all K scan points looped INSIDE the kernel: a
    grid of (nt, K) programs measured 13x slower (1.33 s vs ~0.1 s for
    1M x 96) purely from per-program dispatch/DMA overhead, and the
    tile's full [K, 1, R, ZW] table block (~3.5 MB bf16 at K=96)
    re-DMAs only when the tile's yaw group changes.
    """
    nt = gp_A.shape[0]
    kk = tables.shape[0]
    kern = functools.partial(
        _like_kernel, kk=kk, trunc=float(trunc), mdm=float(match_dist_min),
        mdf=float(match_dist_flat), mw=float(match_weight),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(
                (kk, 1, R_ROWS, ZW),
                lambda t, tg, mt, pf: (0, tg[t], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 12, 8, 128),
                lambda t, tg, mt, pf: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, 128), lambda t, tg, mt, pf: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda t, tg, mt, pf: (t, 0, 0),
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
    )(tile_group, meta.reshape(-1), pts_fp.reshape(-1), tables, gp_A)
    return score.reshape(-1), match.reshape(-1)


# ---------------------------------------------------------------------------
# Beam-model kernel: fixed-march raycast over the same sorted layout.
#
# The reference's kd-tree raycast (raycast_using_kdtree.h:58-109) probes
# every map_grid_min along each ray; every probe position is an affine
# function of PARTICLE pose with a particle-INDEPENDENT virtual point
# p_{b,s} = org_b + dir_b * (s-1) * grid_min (rotation preserves ray
# length, so the probe schedule is shared by all particles).  Each
# (tile, beam) program marches its probes in order, carrying the
# d-history needed for the incidence estimate (sin = |d(i-2) - d(i)| /
# (2 grid_min), raycast_using_kdtree.h:88-102; two lead probes at
# i = -1, 0 seed the chain exactly like the reference's march from the
# ray origin), and classifies HIT/SHORT/LONG/TOTAL_REFLECTION
# (lidar_measurement_model_beam.cpp:157-192) entirely in-kernel,
# emitting only the per-particle penalized-beam count.
# ---------------------------------------------------------------------------


def _beam_kernel(tgrp_ref, meta_ref, pts_ref, aux_ref, tab_ref, a_ref,
                 npen_ref, *, nprobe, trunc, grid_min, radius,
                 hit_range, sin_total_ref, long_pen, tol):
    t = pl.program_id(0)
    b = pl.program_id(1)
    gsel = tgrp_ref[t]
    a = a_ref[0]                                                 # [12, 8, 128]
    code_scale = jnp.float32(trunc / 255.0)
    pt_scale = jnp.float32(1.0 / 65536.0)

    len_b = aux_ref[b * 2 + 0].astype(jnp.float32) * pt_scale
    bvalid = aux_ref[b * 2 + 1] > 0
    # probes at i*grid_min for 1 <= i < L_b (max_t = floor((len+tol)/g)*g)
    l_b = jnp.floor((len_b + tol) / grid_min)
    d_entry_thr = trunc * 0.99

    def body(s, carry):
        # `found` carried as f32 0/1: a bool loop carry fails Mosaic's
        # scf.for legalization
        found_f, t_hit, d_hit, t_entry, d_entry = carry
        found = found_f > 0.5
        kg = b * nprobe + s
        mbase = (kg * G_GROUPS + gsel) * 4
        lox = meta_ref[mbase + 0]
        loy = meta_ref[mbase + 1]
        zlo = meta_ref[mbase + 2]
        px = pts_ref[kg * 4 + 0].astype(jnp.float32) * pt_scale
        py = pts_ref[kg * 4 + 1].astype(jnp.float32) * pt_scale
        pz = pts_ref[kg * 4 + 2].astype(jnp.float32) * pt_scale
        row, lane, inbox = _affine_query(a, px, py, pz, lox, loy, zlo)
        code = _row_select(
            lambda blk: tab_ref[0, pl.ds(s, 1), 0, pl.ds(blk * 16, 16), :][0],
            row, lane, 255.0)
        d = jnp.where(inbox, code * code_scale, trunc)           # [8, 128]

        i = (s - 1).astype(jnp.float32)
        elig = (i >= 1.0) & (i < l_b) & bvalid
        enter = elig & ~found & (d < d_entry_thr) & (t_entry < 0.0)
        t_entry = jnp.where(enter, i * grid_min, t_entry)
        d_entry = jnp.where(enter, d, d_entry)
        hit_now = elig & ~found & (d <= radius)
        t_hit = jnp.where(hit_now, i * grid_min, t_hit)
        d_hit = jnp.where(hit_now, d, d_hit)
        return (jnp.where(hit_now, 1.0, found_f), t_hit, d_hit,
                t_entry, d_entry)

    zero = jnp.zeros((8, 128), jnp.float32)
    init = (zero, zero, zero,
            jnp.full((8, 128), -1.0, jnp.float32),
            jnp.full((8, 128), trunc, jnp.float32))
    found_f, t_hit, d_hit, t_entry, d_entry = jax.lax.fori_loop(
        0, nprobe, body, init)
    found = found_f > 0.5

    # incidence over the field-entry -> hit span (estimator rationale in
    # models/beam.raycast_df)
    span = t_hit - t_entry
    sin = jnp.where(
        found & (t_entry >= 0.0) & (span > grid_min),
        jnp.clip((d_entry - d_hit) / jnp.maximum(span, 1e-6), 0.0, 1.0),
        1.0,
    )
    graze = found & (sin <= sin_total_ref)
    dist = len_b - t_hit
    short = found & ~graze & (dist * dist >= hit_range * hit_range)
    long_p = (~found) & long_pen
    pen = ((short | long_p) & bvalid).astype(jnp.float32)     # [8, 128]

    @pl.when(b == 0)
    def _():
        npen_ref[...] = jnp.zeros_like(npen_ref)

    npen_ref[0] += pen


@functools.partial(
    jax.jit,
    static_argnames=("nprobe", "trunc", "grid_min", "radius",
                     "hit_range", "sin_total_ref", "long_pen", "tol"),
)
def grouped_beam_pen(
    gp_A: jnp.ndarray,         # [nt, 12, 8, 128]
    tile_group: jnp.ndarray,   # [nt] i32
    meta: jnp.ndarray,         # [B*nprobe, G, 4] i32
    pts_fp: jnp.ndarray,       # [B*nprobe, 4] i32 — virtual points * 2^16
    aux: jnp.ndarray,          # [B, 2] i32 — (ray length * 2^16, valid)
    tables: jnp.ndarray,       # [B, nprobe, G, R, ZW] bf16 codes
    *,
    nprobe: int,
    trunc: float,
    grid_min: float,
    radius: float,
    hit_range: float,
    sin_total_ref: float,
    long_pen: bool,
    tol: float,
):
    """Penalized-beam count per particle, SORTED slot order [nt*TILE].

    Classification semantics = lidar_measurement_model_beam.cpp:157-192
    over the reference's fixed kd-tree march; the caller turns the count
    into the score beam_likelihood_min^(n_pen/num_points_default)
    (:146-152).
    """
    nt = gp_A.shape[0]
    bb = tables.shape[0]
    kern = functools.partial(
        _beam_kernel, nprobe=nprobe, trunc=float(trunc),
        grid_min=float(grid_min), radius=float(radius),
        hit_range=float(hit_range),
        sin_total_ref=float(sin_total_ref), long_pen=bool(long_pen),
        tol=float(tol),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nt, bb),
        in_specs=[
            pl.BlockSpec(
                (1, nprobe, 1, R_ROWS, ZW),
                lambda t, b, tg, mt, pf, ax: (b, 0, tg[t], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 12, 8, 128),
                lambda t, b, tg, mt, pf, ax: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, 128), lambda t, b, tg, mt, pf, ax: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    (npen,) = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nt, 8, 128), jnp.float32)],
        interpret=jax.default_backend() == "cpu",
    )(tile_group, meta.reshape(-1), pts_fp.reshape(-1), aux.reshape(-1),
      tables, gp_A)
    return npen.reshape(-1)


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
