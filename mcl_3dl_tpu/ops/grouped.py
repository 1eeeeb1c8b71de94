"""Pose-grouped, z-lane local-table scoring — the generalized fast path.

Why the per-point axis-aligned box (ops/local_gather.py) is not enough:
converged tracking (measured at the bench equilibrium: pos sigma ~0.065 m,
roll/pitch sigma ~0.05 rad, yaw span ~0.4 rad) still smears each scan
point's particle-transformed queries over metres at 5-10 m range — the
rotation lever arm — and the z axis is 5x worse in the field's weighted
space (``dist_weight_z``).  An axis-aligned box over ALL particles is
huge, and Mosaic's only full-2D gather scheme (row loop + lane gather)
costs O(rows) per query.

This module fixes both axes structurally:

* **z as lanes**: the distance field is stored z-major, so a 128-lane
  table row is a contiguous z *window* (12.8 weighted units = 2.56 m of
  real z at defaults).  The kernel's lane gather resolves z exactly —
  z spread costs nothing as long as the *in-map* interval fits one
  window (out-of-map queries read the truncation value by
  construction, so intervals are clipped to the map before the fits
  test).
* **(yaw x pitch x roll) binning**: particles are counting-sorted into
  ``G_YAW x G_PITCH x G_ROLL`` pose bins.  Within a bin the yaw lever
  arm (xy axes) and the pitch/roll lever arms (the 5x-weighted z axis)
  collapse — roll binning alone cuts steady-state z extents from ~112
  to ~80 cells (tools/exp_envelope_sweep.py).
* **envelope bounds + outlier overflow**: per-bin query boxes are
  interval arithmetic over an mean +/- ``ENV_SIGMA``*std *envelope* of
  the bin's affine coefficients (clipped to the true min/max), not the
  raw min/max — so a handful of resample-jitter tail particles cannot
  blow the box for everyone.  Particles outside their bin's envelope
  are routed to the last bin and re-scored EXACTLY by a small XLA
  gather path (``overflow_*``, capacity ``cap`` slots); the fast path
  stays bit-exact for every particle.

Queries have the affine form ``q = A_n @ p + b_n`` where ``A_n`` is the
particle's weighted/scaled rotation and ``p`` a *virtual point* — a
sampled scan point for the likelihood model (p = point_k), or a fixed
ray-march probe for the beam model (p = origin_b + t_s * dir_b).  The
same sorted layout and interval-arithmetic group boxes therefore serve
both measurement models; only the in-kernel reduction differs.  The
likelihood field ``df`` and the label-filtered beam field ``df_beam``
are built on the SAME grid (map/map_data.py), so ONE sorted layout per
step feeds both kernels.

Reference semantics preserved: nearest-cell distance lookup equals
``DistanceField.sample_nearest`` (chunked_kdtree.h:217-237 radiusSearch
replacement) wherever the group boxes fit; a ``fits`` flag lets the
caller ``lax.cond`` back to the XLA gather path otherwise (startup,
global localization, kidnapped-robot spreads).

The expensive layout build (counting sort + row scatter) is split from
the cheap statistics (``group_stats`` — pure reductions) so the caller
pays for it only under the engaged branch of the ``fits`` cond.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tunables (static): G_YAW x G_PITCH x G_ROLL content bins + 1
# outlier/inactive bin, particle tile (8 sublanes x 128 lanes), xy box
# in weighted-space distance-field cells, z window = one 128-lane row.
# Values from the steady-state sweeps on the 16k AND 1M dumps
# (tools/exp_envelope_sweep.py, docs/CONVERGE_{CPU_16K,TPU_1M}.json):
# 24x2x2 bins @ ENV_SIGMA=3.0 with absolute envelope floors give
# max in-map extents [12, 12, 82] vs the (12, 12, 128) box with ~5%
# envelope outliers at BOTH scales.  Roll binning collapses the
# 5x-weighted z extents (112 -> ~80 cells); the floors stop the
# heavy-tailed DIAGONAL rotation coefficients (quadratic in in-bin
# angle deviations, kurtosis ~16-19, sigma tiny) from marking ~4% of
# particles as outliers while costing <1 cell of box extent.
# Bin counts are env-overridable (process-wide, read at import): the
# 24x2x2 default is tuned for the 1M flagship; per-(point, bin) costs
# — table extraction ([K, G, R, ZW] row gathers, ~33 ms at G=97) and
# tile padding (up to G_GROUPS extra TILE-sized tiles) — are
# PARTICLE-COUNT-INDEPENDENT, so small-N workloads (a fleet's 10k
# particles per robot) can run a much smaller grid where the converged
# envelopes still fit (tools/exp_fleet_chip.py measures 6x1x1).
import os

G_YAW = int(os.environ.get("MCL_G_YAW", "24"))
G_PITCH = int(os.environ.get("MCL_G_PITCH", "2"))
G_ROLL = int(os.environ.get("MCL_G_ROLL", "2"))
if G_YAW < 1 or G_PITCH not in (1, 2) or G_ROLL not in (1, 2):
    # pitch/roll binning is a binary above/below-mean split
    raise ValueError(
        f"MCL_G_YAW must be >= 1 and MCL_G_PITCH/MCL_G_ROLL in (1, 2); "
        f"got {G_YAW}x{G_PITCH}x{G_ROLL}")
G_SPLIT = G_YAW * G_PITCH * G_ROLL
G_GROUPS = G_SPLIT + 1         # last bin: envelope outliers + inactive
TILE = 1024
BX = 12
BY = 12
R_ROWS = BX * BY
ZW = 128
ENV_SIGMA_TRIM = 3.5           # pass-1 gross-outlier trim, in per-bin stds
ENV_SIGMA = 3.0                # pass-2 envelope half-width over inliers
ENV_FLOOR_ANG = 0.01           # abs envelope floor, rotation entries
ENV_FLOOR_POS = 0.5            # abs envelope floor, position (cells)
_ENV_EPS = 1e-3                # absolute slack against float jitter


class GroupStats(NamedTuple):
    """Cheap per-step grouping statistics (reductions only, no sort)."""

    g: jnp.ndarray           # [N] i32 — final bin (outliers/inactive: last)
    A: jnp.ndarray           # [N, 12] f32 — rows 0..8: W@R/cell, 9..11: (pos*w - origin)/cell
    a_min: jnp.ndarray       # [G, 12] f32 — per-bin envelope bounds
    a_max: jnp.ndarray       # [G, 12] f32
    any_active: jnp.ndarray  # [G] bool — content bins with members (last: False)
    n_over: jnp.ndarray      # [] i32 — active particles routed to overflow


class GroupedLayout(NamedTuple):
    """Counting-sorted kernel layout — build only in the engaged branch."""

    A: jnp.ndarray           # [nt, 12, 8, 128] f32 coefficient tiles
    dest: jnp.ndarray        # [N] i32 — sorted slot of original particle i
    tile_group: jnp.ndarray  # [nt] i32
    over_idx: jnp.ndarray    # [cap] i32 — original indices of the overflow
    #                          bin's leading slots (active outliers first;
    #                          padding slots hold N = out-of-bounds sentinel,
    #                          dropped by scatter)


def _ypr_from_quat(rot):
    x, y, z, w = rot[..., 0], rot[..., 1], rot[..., 2], rot[..., 3]
    yaw = jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))
    pitch = jnp.arcsin(jnp.clip(2.0 * (w * y - z * x), -1.0, 1.0))
    roll = jnp.arctan2(2.0 * (w * x + y * z), 1.0 - 2.0 * (x * x + y * y))
    return yaw, pitch, roll


def group_stats(pos, rot_mat, rot, weights3, cell, origin3, active) -> GroupStats:
    """Bin particles on (yaw, pitch) and bound each bin's coefficients.

    ``rot_mat`` is the [N, 3, 3] rotation matrix batch the caller already
    computed for its own transform path (no duplicate quat->matrix work).
    Cost: O(N * 12) element ops + G_SPLIT masked reductions — no sort, no
    scatter, no [K, N] tensor.

    Envelope: per-bin ``mean +/- max(ENV_SIGMA * std, floor)`` clipped
    to the wider of the inliers' true min/max and the floor band,
    computed in TWO passes — pass 1 marks gross outliers from the raw
    moments, pass 2 recomputes mean/std/min/max over pass-1 inliers
    only, so a handful of far tail particles cannot inflate the std
    (and thereby the envelope) for the whole bin.  The absolute floors
    (ENV_FLOOR_ANG per rotation entry, scaled by the row's w/cell;
    ENV_FLOOR_POS cells for b) keep tiny-sigma heavy-tailed
    coefficients from flagging outliers they cannot produce.  Active
    particles with any coefficient outside the final envelope are
    *outliers*: they go to the last bin together with inactive slots
    and must be re-scored by the exact overflow path.
    """
    n = pos.shape[0]
    w = jnp.asarray(weights3, jnp.float32)
    inv_cell = jnp.float32(1.0 / cell)

    yaw, pitch, roll = _ypr_from_quat(rot)
    big = jnp.float32(1e9)
    ylo = jnp.min(jnp.where(active, yaw, big))
    yhi = jnp.max(jnp.where(active, yaw, -big))
    yspan = jnp.maximum(yhi - ylo, 1e-6)
    yb = jnp.clip(((yaw - ylo) / yspan * G_YAW).astype(jnp.int32), 0, G_YAW - 1)
    nact = jnp.maximum(jnp.sum(active.astype(jnp.float32)), 1.0)
    if G_PITCH > 1:
        pmid = jnp.sum(jnp.where(active, pitch, 0.0)) / nact
        pb = (pitch > pmid).astype(jnp.int32)
    else:
        pb = jnp.zeros_like(yb)
    if G_ROLL > 1:
        rmid = jnp.sum(jnp.where(active, roll, 0.0)) / nact
        rb = (roll > rmid).astype(jnp.int32)
    else:
        rb = jnp.zeros_like(yb)
    g0 = (yb * G_PITCH + pb) * G_ROLL + rb                       # [N] content bin

    # A = diag(w) @ R / cell (9), b = (pos * w - origin) / cell (3)
    a9 = (rot_mat * w[:, None]).reshape(n, 9) * inv_cell
    b3 = (pos * w - jnp.asarray(origin3, jnp.float32)) * inv_cell
    A = jnp.concatenate([a9, b3], axis=-1)                       # [N, 12]
    # center before the variance pass: b3 is O(map extent / cell) and a
    # raw sum-of-squares over 1M rows cancels catastrophically in f32
    a_ctr = jnp.sum(jnp.where(active[:, None], A, 0.0), axis=0) / nact
    Ac = A - a_ctr

    floors = jnp.concatenate([
        jnp.repeat(w * inv_cell, 3) * jnp.float32(ENV_FLOOR_ANG),
        jnp.full((3,), ENV_FLOOR_POS, jnp.float32),
    ])                                                           # [12]

    def _moments(m):
        mf = m[:, None]
        cnt = jnp.maximum(jnp.sum(m.astype(jnp.float32)), 1.0)
        mean = jnp.sum(jnp.where(mf, Ac, 0.0), axis=0) / cnt
        var = jnp.sum(jnp.where(mf, (Ac - mean) ** 2, 0.0), axis=0) / cnt
        return mean, jnp.sqrt(var)

    # pass 0: per-bin moments + POOLED robust scale.  A single extreme
    # outlier can dominate its (small) bin's std and hide inside the
    # sigma cut ("masking"); the cross-bin median std cannot be
    # inflated by a few contaminated bins, so the trim width is
    # max(sigma_med, min(sigma_bin, 3*sigma_med)) — per-bin variation
    # honored up to 3x the pooled scale.
    members = [(g0 == gg) & active for gg in range(G_SPLIT)]
    moms = [_moments(m) for m in members]
    sig_all = jnp.stack([s for _, s in moms])                    # [G, 12]
    empty = ~jnp.stack([jnp.any(m) for m in members])
    sig_med = jnp.nanmedian(
        jnp.where(empty[:, None], jnp.nan, sig_all), axis=0)
    sig_med = jnp.nan_to_num(sig_med)                            # all-empty

    mins, maxs, anys = [], [], []
    outlier = jnp.zeros((n,), bool)
    for gg in range(G_SPLIT):
        m = members[gg]
        mean1, sd1 = moms[gg]
        s1 = jnp.maximum(sig_med, jnp.minimum(sd1, 3.0 * sig_med))
        h1 = jnp.maximum(ENV_SIGMA_TRIM * s1, floors) + _ENV_EPS
        inl = m & jnp.all(jnp.abs(Ac - mean1) <= h1, axis=-1)
        # pass 2: envelope over the trimmed inliers, clipped to the
        # wider of their true min/max and the floor band.  An
        # empty-inlier bin degenerates to the floor band around the
        # global center: members outside go to the exact overflow
        # path, members inside stay valid for the (tiny) box.
        mean2, sd2 = _moments(inl)
        half = jnp.maximum(ENV_SIGMA * sd2, floors) + _ENV_EPS
        gmin = jnp.min(jnp.where(inl[:, None], Ac, big), axis=0)
        gmax = jnp.max(jnp.where(inl[:, None], Ac, -big), axis=0)
        env_lo = jnp.maximum(mean2 - half, jnp.minimum(gmin, mean2 - floors))
        env_hi = jnp.minimum(mean2 + half, jnp.maximum(gmax, mean2 + floors))
        outlier |= m & jnp.any((Ac < env_lo) | (Ac > env_hi), axis=-1)
        mins.append(env_lo + a_ctr)
        maxs.append(env_hi + a_ctr)
        anys.append(jnp.any(m))
    # outlier/inactive bin: bounds never used (any_active False => its
    # boxes are excluded from `fits` and its table windows are clipped)
    mins.append(jnp.zeros((12,), jnp.float32))
    maxs.append(jnp.zeros((12,), jnp.float32))
    anys.append(jnp.zeros((), bool))

    g = jnp.where(active & ~outlier, g0, G_GROUPS - 1).astype(jnp.int32)
    return GroupStats(
        g=g, A=A,
        a_min=jnp.stack(mins), a_max=jnp.stack(maxs),
        any_active=jnp.stack(anys),
        n_over=jnp.sum((outlier & active).astype(jnp.int32)),
    )


def group_boxes(stats: GroupStats, pts, dims3):
    """Interval-arithmetic query bounds per (virtual point, bin), clipped
    to the map.

    ``pts`` [K, 3]: virtual points in base_link frame.  ``dims3``:
    static field dims (nx, ny, nz).  Returns ``lo [K, G, 3] i32`` (table
    window origin, clipped to [0, dim - box]) and ``fits [K, G]`` —
    whether the *in-map part* of the conservative interval fits
    (BX, BY, ZW).  Queries outside the map read the truncation distance
    in-kernel (inbox mask) exactly like ``sample_nearest``, so only the
    in-map extent constrains the window.  Empty bins trivially fit.
    """
    box = (BX, BY, ZW)
    bands = query_bands(stats, pts)   # the ONE producer of the query
    #                                   intervals (block-skip exactness
    #                                   depends on sharing it)
    lo_cols, fits = [], jnp.ones((pts.shape[0], G_GROUPS), bool)
    for i in range(3):
        lo_q, hi_q = bands[i]
        # in-map part only: out-of-map queries read trunc regardless
        lo_in = jnp.maximum(lo_q, 0)
        hi_in = jnp.minimum(hi_q, dims3[i] - 1)
        fits &= (hi_in - lo_in + 1) <= box[i]
        lo_cols.append(jnp.clip(lo_in, 0, max(dims3[i] - box[i], 0)))
    lo = jnp.stack(lo_cols, axis=-1)
    return lo, fits | ~stats.any_active[None, :]


def build_layout(stats: GroupStats, cap: int) -> GroupedLayout:
    """Counting-sort into the kernel tile layout (the expensive half:
    per-bin rank cumsums + one row scatter).  Call only under the
    engaged branch of the caller's ``fits`` lax.cond.

    ``cap`` (static): overflow slots exposed via ``over_idx``.  Within
    the last bin, rank order equals original index order, and active
    particles are a prefix of the state arrays — so active outliers
    occupy the bin's leading slots, followed by inactive slots (whose
    scores are never read), then ``N`` sentinels (dropped on scatter).
    """
    g = stats.g
    n = g.shape[0]
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
    a_sorted = jnp.zeros((n_pad, 12), jnp.float32).at[dest].set(stats.A)
    a_tiles = a_sorted.reshape(nt, 8, 128, 12).transpose(0, 3, 1, 2)

    ends_p = jnp.cumsum(counts_p)
    tile_starts = jnp.arange(nt, dtype=jnp.int32) * TILE
    tile_group = jnp.clip(
        jnp.searchsorted(ends_p, tile_starts, side="right"), 0, G_GROUPS - 1
    ).astype(jnp.int32)

    src = jnp.full((n_pad,), n, jnp.int32).at[dest].set(
        jnp.arange(n, dtype=jnp.int32))
    over_idx = jax.lax.dynamic_slice(src, (starts_p[G_GROUPS - 1],), (cap,))
    return GroupedLayout(A=a_tiles, dest=dest, tile_group=tile_group,
                         over_idx=over_idx)


def empty_layout(n: int, cap: int) -> GroupedLayout:
    """Shape-matched zero layout for the untaken branch of the build
    cond (sentinel over_idx = n drops every overflow scatter)."""
    n_pad = n + G_GROUPS * TILE
    nt = n_pad // TILE
    return GroupedLayout(
        A=jnp.zeros((nt, 12, 8, 128), jnp.float32),
        dest=jnp.zeros((n,), jnp.int32),
        tile_group=jnp.zeros((nt,), jnp.int32),
        over_idx=jnp.full((cap,), n, jnp.int32),
    )


def overflow_transform(A, over_idx, pts):
    """Exact cell-space queries for the overflow particles:
    ``q = A @ p + b`` -> [cap, K, 3].  Sentinel rows (over_idx == N)
    clamp-gather garbage; their results are dropped at scatter time."""
    rows = jnp.take(A, over_idx, axis=0)                         # [C, 12]
    rm = rows[:, :9].reshape(-1, 3, 3)
    return (
        jnp.einsum("kj,cij->cki", pts.astype(jnp.float32), rm,
                   preferred_element_type=jnp.float32)
        + rows[:, None, 9:]
    )


def overflow_field_lookup(field, q):
    """Nearest-cell distance codes at cell-space queries ``q`` [..., 3]
    from the u8 field [nx, ny, nz]; out-of-map reads 255 (= trunc).
    Bit-equal to ``DistanceField.sample_nearest`` on the same query."""
    nx, ny, nz = field.shape
    iq = jnp.round(q).astype(jnp.int32)
    dims = jnp.asarray([nx, ny, nz], jnp.int32)
    oob = jnp.any((iq < 0) | (iq >= dims), axis=-1)
    ic = jnp.clip(iq, 0, dims - 1)
    flat = (ic[..., 0] * ny + ic[..., 1]) * nz + ic[..., 2]
    code = jnp.take(field.reshape(-1), flat, axis=0)
    return jnp.where(oob, jnp.uint8(255), code)


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


def extract_tables(field2d, ny, nzp, lo, point_valid, trunc):
    """Gather per-(virtual point, bin) local tables from the z-major
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


NBLK = R_ROWS // 16            # 16-row aligned table blocks per window
# Skip granularity (rows per skip bit): 16 = whole-vreg-block bits
# (the default), 8 = half-block bits.  Finer bits skip more rows but
# cost two nested scf.ifs per live block — measured SLOWER on the v5e
# at the 1M flagship (633.5 ms vs 574.6 ms engaged, r5 A/B), so 16 is
# the default and 8 stays as the documented experiment.  Module
# constant baked into the kernels at trace time.
SKIP_GRAN = int(os.environ.get("MCL_SKIP_GRAN", "16"))
if SKIP_GRAN not in (8, 16):
    # any other value would misalign pack_block_skip's bit layout with
    # _row_select's per-block bit indexing -> silently wrong skips
    raise ValueError(f"MCL_SKIP_GRAN must be 8 or 16, got {SKIP_GRAN}")
NHALF = R_ROWS // SKIP_GRAN    # number of skip bits per window
SKIP_ALL = (1 << NHALF) - 1    # skip word with every skip bit set


# Process-wide implementation override for environments where the
# DEFAULT backend is not the backend the kernels actually run on (the
# driver's virtual-CPU-mesh dryrun under a remote-TPU sitecustomize
# that pins jax_platforms): set BEFORE any kernel is traced.
IMPL_OVERRIDE: str | None = None


def _resolve_impl(impl):
    """Kernel implementation tier.

    * ``"mosaic"`` — the compiled Pallas kernel (TPU).
    * ``"interpret"`` — Pallas interpret mode (CPU oracle of the exact
      kernel program; slow: the grid runs as a host loop).
    * ``"emulate"`` — vectorized pure-JAX re-statement of the kernel
      math (same f32 op sequence per element, same sequential
      accumulation order), bit-equal to the Pallas kernel on every slot
      the caller reads back (``GroupedLayout.dest`` / ``over_idx``;
      padding slots may differ only through the block-skip words, which
      are exact no-ops for in-envelope queries by construction).  This
      is the CPU default: it makes the virtual-mesh sharding tests and
      the driver's ``dryrun_multichip`` run in seconds instead of
      minutes, while ``tests/test_models.py`` pins emulate ==
      interpret-Pallas bit-equality at small scale.
    """
    if impl is None:
        if IMPL_OVERRIDE is not None:
            return IMPL_OVERRIDE
        return "emulate" if jax.default_backend() == "cpu" else "mosaic"
    return impl


def _emulate_like_score(tile_group, meta, pts_fp, skipw, tables, gp_A, *,
                        kk, trunc, mdm, mdf, mw):
    """Vectorized re-statement of ``_like_kernel`` over all tiles.

    Mirrors the kernel line for line: same fixed-point dequantization,
    same ``_affine_query`` expression order, same clamp/threshold ops,
    same sequential accumulation over scan points (``fori_loop`` k =
    0..kk-1, matching the kernel's in-program point loop) — so results
    are bit-equal on every real particle slot.  Block-skip words are
    not consulted: a skipped block is an exact no-op for in-envelope
    queries (that is the skip's correctness contract), and padding
    slots are never read back.
    """
    nt = gp_A.shape[0]
    gg = tables.shape[1]
    gsel = tile_group.astype(jnp.int32)                      # [nt]
    code_scale = jnp.float32(trunc / 255.0)
    pt_scale = jnp.float32(1.0 / 65536.0)
    meta_flat = meta.reshape(-1)
    pts_flat = pts_fp.reshape(-1)
    tab_flat = tables.reshape(-1)
    a = gp_A                                                 # [nt, 12, 8, 128]

    def body(k, carry):
        acc, mac = carry
        mbase = (k * gg + gsel) * 4                          # [nt]
        lox = jnp.take(meta_flat, mbase + 0)[:, None, None]
        loy = jnp.take(meta_flat, mbase + 1)[:, None, None]
        zlo = jnp.take(meta_flat, mbase + 2)[:, None, None]
        px = pts_flat[k * 4 + 0].astype(jnp.float32) * pt_scale
        py = pts_flat[k * 4 + 1].astype(jnp.float32) * pt_scale
        pz = pts_flat[k * 4 + 2].astype(jnp.float32) * pt_scale
        ux = a[:, 0] * px + a[:, 1] * py + a[:, 2] * pz + a[:, 9]
        uy = a[:, 3] * px + a[:, 4] * py + a[:, 5] * pz + a[:, 10]
        uz = a[:, 6] * px + a[:, 7] * py + a[:, 8] * pz + a[:, 11]
        ix = jnp.round(ux).astype(jnp.int32) - lox
        iy = jnp.round(uy).astype(jnp.int32) - loy
        iz = jnp.round(uz).astype(jnp.int32) - zlo
        inbox = (
            (ix >= 0) & (ix < BX) & (iy >= 0) & (iy < BY)
            & (iz >= 0) & (iz < ZW)
        )
        row = jnp.clip(ix * BY + iy, 0, R_ROWS - 1)
        lane = jnp.clip(iz, 0, ZW - 1)
        flat = ((k * gg + gsel)[:, None, None] * R_ROWS + row) * ZW + lane
        code = jnp.take(tab_flat, flat).astype(jnp.float32)
        d = jnp.where(inbox, code * code_scale, trunc)
        matched = d <= mdm
        contrib = jnp.maximum(mw * (mdm - jnp.maximum(d, mdf)), 0.0)
        contrib = jnp.where(matched, contrib, 0.0)
        return acc + contrib, mac + matched.astype(jnp.float32)

    zero = jnp.zeros((nt, 8, 128), jnp.float32)
    return jax.lax.fori_loop(0, kk, body, (zero, zero))


def _emulate_beam_pen(tile_group, meta, pts_fp, aux, tables, gp_A, *,
                      nprobe, trunc, grid_min, radius, hit_range,
                      sin_total_ref, long_pen, tol):
    """Vectorized re-statement of ``_beam_kernel`` over all tiles.

    Same march carry semantics as the kernel (enter bookkeeping checked
    before the hit update within each probe, f32 probe index times
    ``grid_min``), accumulated over beams in kernel order.
    """
    nt = gp_A.shape[0]
    bb = tables.shape[0]
    gg = tables.shape[2]
    gsel = tile_group.astype(jnp.int32)
    code_scale = jnp.float32(trunc / 255.0)
    pt_scale = jnp.float32(1.0 / 65536.0)
    meta_flat = meta.reshape(-1)
    pts_flat = pts_fp.reshape(-1)
    aux_flat = aux.reshape(-1)
    tab_flat = tables.reshape(-1)
    a = gp_A
    d_entry_thr = trunc * 0.99

    npen = jnp.zeros((nt, 8, 128), jnp.float32)
    for b in range(bb):
        len_b = aux_flat[b * 2 + 0].astype(jnp.float32) * pt_scale
        bvalid = aux_flat[b * 2 + 1] > 0
        l_b = jnp.floor((len_b + tol) / grid_min)

        def body(s, carry, b=b):
            found_f, t_hit, d_hit, t_entry, d_entry = carry
            found = found_f > 0.5
            kg = b * nprobe + s
            mbase = (kg * gg + gsel) * 4
            lox = jnp.take(meta_flat, mbase + 0)[:, None, None]
            loy = jnp.take(meta_flat, mbase + 1)[:, None, None]
            zlo = jnp.take(meta_flat, mbase + 2)[:, None, None]
            px = pts_flat[kg * 4 + 0].astype(jnp.float32) * pt_scale
            py = pts_flat[kg * 4 + 1].astype(jnp.float32) * pt_scale
            pz = pts_flat[kg * 4 + 2].astype(jnp.float32) * pt_scale
            ux = a[:, 0] * px + a[:, 1] * py + a[:, 2] * pz + a[:, 9]
            uy = a[:, 3] * px + a[:, 4] * py + a[:, 5] * pz + a[:, 10]
            uz = a[:, 6] * px + a[:, 7] * py + a[:, 8] * pz + a[:, 11]
            ix = jnp.round(ux).astype(jnp.int32) - lox
            iy = jnp.round(uy).astype(jnp.int32) - loy
            iz = jnp.round(uz).astype(jnp.int32) - zlo
            inbox = (
                (ix >= 0) & (ix < BX) & (iy >= 0) & (iy < BY)
                & (iz >= 0) & (iz < ZW)
            )
            row = jnp.clip(ix * BY + iy, 0, R_ROWS - 1)
            lane = jnp.clip(iz, 0, ZW - 1)
            flat = ((kg * gg + gsel)[:, None, None] * R_ROWS + row) * ZW \
                + lane
            code = jnp.take(tab_flat, flat).astype(jnp.float32)
            d = jnp.where(inbox, code * code_scale, trunc)

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

        zero = jnp.zeros((nt, 8, 128), jnp.float32)
        init = (zero, zero, zero,
                jnp.full((nt, 8, 128), -1.0, jnp.float32),
                jnp.full((nt, 8, 128), trunc, jnp.float32))
        found_f, t_hit, d_hit, t_entry, d_entry = jax.lax.fori_loop(
            0, nprobe, body, init)
        found = found_f > 0.5
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
        pen = ((short | long_p) & bvalid).astype(jnp.float32)
        npen = npen + pen
    return npen


def pack_block_skip(skip_bool):
    """Pack a [..., NHALF] bool half-block-skip mask into i32 words
    (bit b = 8-row half-block b; bits 2i and 2i+1 cover the two halves
    of 16-row aligned block i).  A set bit certifies the half-block
    cannot contribute (its minimum distance fails every trigger
    threshold), so the kernels' row loop may leave the fill value in
    place — an exact no-op.  8-row granularity doubles the skip
    resolution over whole (16, 128) vreg blocks while keeping the VMEM
    block reads 16-row aligned (a Mosaic bf16 tiling requirement)."""
    bits = skip_bool.astype(jnp.int32) << jnp.arange(NHALF, dtype=jnp.int32)
    return jnp.sum(bits, axis=-1).astype(jnp.int32)


def query_bands(stats: GroupStats, pts):
    """Conservative per-(point, bin) query intervals [lo, hi] in cell
    indices for each axis — ``group_boxes``'s interval arithmetic,
    recomputed with the identical f32 op sequence.  Every in-envelope
    particle's kernel query lands inside the bands (the kernel rounds
    ``u`` with u in [lo, hi] => round(u) in [floor(lo), ceil(hi)]);
    envelope outliers and inactive slots live in the last bin, whose
    kernel output is exactly rescored / never read, so their queries
    don't matter.  Returns ``[(x_lo, x_hi), (y_lo, y_hi), (z_lo,
    z_hi)]`` of [K, G] i32 pairs.

    The bands are computed from the kernels' 2^-16 fixed-point
    DEQUANTIZED point coordinates (the exact value sequence
    ``points_fp`` + the in-kernel ``pt_scale`` produce), not the raw
    f32 points — otherwise a query within the ~1.5e-5 quantization
    error of a band boundary could round one cell outside and have its
    block wrongly skipped."""
    p = (jnp.round(pts.astype(jnp.float32) * 65536.0)
         .astype(jnp.int32).astype(jnp.float32) * jnp.float32(1.0 / 65536.0))
    out = []
    for i in range(3):
        lo_i = stats.a_min[:, 9 + i][None, :]
        hi_i = stats.a_max[:, 9 + i][None, :]
        for j in range(3):
            amin = stats.a_min[:, 3 * i + j][None, :]
            amax = stats.a_max[:, 3 * i + j][None, :]
            pj = p[:, j][:, None]
            lo_i = lo_i + jnp.minimum(amin * pj, amax * pj)
            hi_i = hi_i + jnp.maximum(amin * pj, amax * pj)
        out.append((jnp.floor(lo_i).astype(jnp.int32),
                    jnp.ceil(hi_i).astype(jnp.int32)))
    return out


def block_min_dist(tables, trunc, lo=None, z_used=None, bands=None):
    """Per-8-row-half-block minimum distance [..., NHALF] of a
    [..., R, ZW] bf16 code table, computed with the kernels' exact f32
    scaling
    (code * trunc/255) so threshold comparisons are bit-consistent.

    ``lo`` [K, G, 3] (window origin), ``z_used`` [K, G] (window z
    origin) and ``bands`` (from :func:`query_bands`) restrict the min
    to cells an in-envelope particle can actually select.  Without the
    restriction the 12x12x128 window min is hugely conservative — the
    z window alone spans the room height, so the nearest surface
    anywhere in the column (the floor, typically) pulls every block's
    min below threshold and nothing skips; the envelope's true query
    extents are a few cells per axis at converged tracking.  Cells
    outside the bands are unreachable in-envelope, so excluding them
    keeps the skip exact."""
    lead = tables.shape[:-2]
    if bands is not None:
        xb, yb, zb = bands
        ax = lo[..., 0, None] + jnp.arange(BX, dtype=jnp.int32)  # [K, G, BX]
        ay = lo[..., 1, None] + jnp.arange(BY, dtype=jnp.int32)
        mx = (ax >= xb[0][..., None]) & (ax <= xb[1][..., None])
        my = (ay >= yb[0][..., None]) & (ay <= yb[1][..., None])
        rowm = (mx[..., :, None] & my[..., None, :]).reshape(
            lead + (R_ROWS,))
        z_abs = z_used[..., None] + jnp.arange(ZW, dtype=jnp.int32)
        mz = (z_abs >= zb[0][..., None]) & (z_abs <= zb[1][..., None])
        keep = rowm[..., None] & mz[..., None, :]            # [K, G, R, ZW]
        tables = jnp.where(keep, tables, jnp.bfloat16(255.0))
    m = tables.reshape(lead + (NHALF, SKIP_GRAN, ZW)).min(axis=(-2, -1))
    return m.astype(jnp.float32) * jnp.float32(trunc / 255.0)


def _row_select(read_block, row, lane, fill, skip_word=None):
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

    ``skip_word``: optional packed skip bits at ``SKIP_GRAN``-row
    granularity (a set bit certifies its rows can only yield codes the
    caller's thresholds treat exactly like the fill value, so their
    lane-gathers are elided).  The VMEM read stays a 16-row aligned
    block (bf16 tiling); at SKIP_GRAN=8 each half of the block runs
    under its own skip bit — static row indices, so no dynamic sublane
    addressing.
    """
    assert NBLK * 16 == R_ROWS

    if SKIP_GRAN == 16:
        def heavy(bidx, d):
            blk = read_block(bidx).astype(jnp.float32)      # [16, ZW]
            for j in range(16):
                rowb = jnp.broadcast_to(blk[j:j + 1, :], row.shape)
                v = jnp.take_along_axis(rowb, lane, axis=1)
                d = jnp.where(row == bidx * 16 + j, v, d)
            return d

        if skip_word is None:
            body = heavy
        else:
            def body(bidx, d):
                return jax.lax.cond(
                    ((skip_word >> bidx) & 1) == 0, heavy,
                    lambda _b, dd: dd, bidx, d)

        return jax.lax.fori_loop(
            0, NBLK, body, jnp.full(row.shape, fill, jnp.float32))

    def _half(blk, bidx, h, d):
        for j in range(8):
            r = h * 8 + j
            rowb = jnp.broadcast_to(blk[r:r + 1, :], row.shape)
            v = jnp.take_along_axis(rowb, lane, axis=1)
            d = jnp.where(row == bidx * 16 + r, v, d)
        return d

    def heavy(bidx, d):
        blk = read_block(bidx).astype(jnp.float32)          # [16, ZW]
        if skip_word is None:
            return _half(blk, bidx, 1, _half(blk, bidx, 0, d))
        d = jax.lax.cond(
            ((skip_word >> (2 * bidx)) & 1) == 0,
            lambda dd: _half(blk, bidx, 0, dd), lambda dd: dd, d)
        d = jax.lax.cond(
            ((skip_word >> (2 * bidx + 1)) & 1) == 0,
            lambda dd: _half(blk, bidx, 1, dd), lambda dd: dd, d)
        return d

    if skip_word is None:
        body = heavy
    else:
        def body(bidx, d):
            return jax.lax.cond(
                ((skip_word >> (2 * bidx)) & 3) != 3, heavy,
                lambda _b, dd: dd, bidx, d)

    return jax.lax.fori_loop(
        0, NBLK, body, jnp.full(row.shape, fill, jnp.float32))


def _like_kernel(tgrp_ref, meta_ref, pts_ref, skipw_ref, tab_ref, a_ref,
                 score_ref, match_ref, *, kk, trunc, mdm, mdf, mw):
    t = pl.program_id(0)
    gsel = tgrp_ref[t]
    a = a_ref[0]                                                 # [12, 8, 128]
    code_scale = jnp.float32(trunc / 255.0)
    pt_scale = jnp.float32(1.0 / 65536.0)

    def heavy(k, carry):
        acc, mac = carry
        mbase = (k * G_GROUPS + gsel) * 4
        lox = meta_ref[mbase + 0]
        loy = meta_ref[mbase + 1]
        zlo = meta_ref[mbase + 2]
        px = pts_ref[k * 4 + 0].astype(jnp.float32) * pt_scale
        py = pts_ref[k * 4 + 1].astype(jnp.float32) * pt_scale
        pz = pts_ref[k * 4 + 2].astype(jnp.float32) * pt_scale
        row, lane, inbox = _affine_query(a, px, py, pz, lox, loy, zlo)
        sw = skipw_ref[k * G_GROUPS + gsel]
        code = _row_select(
            lambda b: tab_ref[pl.ds(k, 1), 0, pl.ds(b * 16, 16), :][0],
            row, lane, 255.0, skip_word=sw)
        d = jnp.where(inbox, code * code_scale, trunc)           # [8, 128]
        matched = d <= mdm
        contrib = jnp.maximum(mw * (mdm - jnp.maximum(d, mdf)), 0.0)
        contrib = jnp.where(matched, contrib, 0.0)
        return acc + contrib, mac + matched.astype(jnp.float32)

    def body(k, carry):
        # Point skip: when every block of this (point, group) table is
        # skippable (all min distances > match_dist_min), no row can
        # match — contribution and match count are exactly zero.
        sw = skipw_ref[k * G_GROUPS + gsel]
        return jax.lax.cond(sw != SKIP_ALL, heavy, lambda _k, c: c, k, carry)

    zero = jnp.zeros((8, 128), jnp.float32)
    acc, mac = jax.lax.fori_loop(0, kk, body, (zero, zero))
    score_ref[0] = acc
    match_ref[0] = mac


@functools.partial(
    jax.jit,
    static_argnames=("match_dist_min", "match_dist_flat", "match_weight",
                     "trunc", "impl"),
)
def grouped_like_score(
    gp_A: jnp.ndarray,         # [nt, 12, 8, 128]
    tile_group: jnp.ndarray,   # [nt] i32
    meta: jnp.ndarray,         # [K, G, 4] i32: lo_x, lo_y, z_used, pad
    pts_fp: jnp.ndarray,       # [K, 4] i32 — point coords * 2^16
    skipw: jnp.ndarray,        # [K, G] i32 packed block-skip words
    tables: jnp.ndarray,       # [K, G, R, ZW] bf16 codes
    *,
    match_dist_min: float,
    match_dist_flat: float,
    match_weight: float,
    trunc: float,
    impl: str | None = None,
):
    """Likelihood-field scoring over the sorted layout.

    Returns ``(score [nt*TILE], match_count [nt*TILE])`` in SORTED
    slot order; the caller gathers back with ``GroupedLayout.dest``.
    Scoring semantics match lidar_measurement_model_likelihood.cpp:124-135
    (flat-floor clamp, matched mask, per-particle sum + match count).

    Grid is (nt,) with all K scan points looped INSIDE the kernel: a
    grid of (nt, K) programs measured 13x slower (1.33 s vs ~0.1 s for
    1M x 96) purely from per-program dispatch/DMA overhead, and the
    tile's full [K, 1, R, ZW] table block (~3.5 MB bf16 at K=96)
    re-DMAs only when the tile's bin changes.
    """
    nt = gp_A.shape[0]
    kk = tables.shape[0]
    impl = _resolve_impl(impl)
    if impl == "emulate":
        score, match = _emulate_like_score(
            tile_group, meta, pts_fp, skipw, tables, gp_A,
            kk=kk, trunc=float(trunc), mdm=float(match_dist_min),
            mdf=float(match_dist_flat), mw=float(match_weight),
        )
        return score.reshape(-1), match.reshape(-1)
    kern = functools.partial(
        _like_kernel, kk=kk, trunc=float(trunc), mdm=float(match_dist_min),
        mdf=float(match_dist_flat), mw=float(match_weight),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(
                (kk, 1, R_ROWS, ZW),
                lambda t, tg, mt, pf, sw: (0, tg[t], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 12, 8, 128),
                lambda t, tg, mt, pf, sw: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, 128), lambda t, tg, mt, pf, sw: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda t, tg, mt, pf, sw: (t, 0, 0),
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
        interpret=impl == "interpret",
    )(tile_group, meta.reshape(-1), pts_fp.reshape(-1), skipw.reshape(-1),
      tables, gp_A)
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


def _beam_kernel(tgrp_ref, meta_ref, pts_ref, aux_ref, skip_ref, tab_ref,
                 a_ref, npen_ref, *, nprobe, trunc, grid_min, radius,
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

    def heavy(s, carry):
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
        sw = skip_ref[kg * G_GROUPS + gsel]
        code = _row_select(
            lambda blk: tab_ref[0, pl.ds(s, 1), 0, pl.ds(blk * 16, 16), :][0],
            row, lane, 255.0, skip_word=sw)
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

    def body(s, carry):
        # Probe skip: when EVERY block of this probe's (point, group)
        # table is skippable (all min distances fail both the enter
        # threshold and the collision radius — empty space, the common
        # case for most of a long ray through a truncated field), the
        # heavy path is an exact identity on the carry (d == trunc
        # everywhere => enter and hit are both false), so skip it;
        # otherwise run it with per-block skips inside _row_select.
        sw = skip_ref[b * nprobe * G_GROUPS + s * G_GROUPS + gsel]
        return jax.lax.cond(sw != SKIP_ALL, heavy, lambda _s, c: c, s, carry)

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
                     "hit_range", "sin_total_ref", "long_pen", "tol",
                     "impl"),
)
def grouped_beam_pen(
    gp_A: jnp.ndarray,         # [nt, 12, 8, 128]
    tile_group: jnp.ndarray,   # [nt] i32
    meta: jnp.ndarray,         # [B*nprobe, G, 4] i32
    pts_fp: jnp.ndarray,       # [B*nprobe, 4] i32 — virtual points * 2^16
    aux: jnp.ndarray,          # [B, 2] i32 — (ray length * 2^16, valid)
    skip: jnp.ndarray,         # [B*nprobe, G] i32 packed block-skip
                               # words (bit b: 16-row block b cannot
                               # trigger enter/hit; SKIP_ALL = whole
                               # probe skipped)
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
    impl: str | None = None,
):
    """Penalized-beam count per particle, SORTED slot order [nt*TILE].

    Classification semantics = lidar_measurement_model_beam.cpp:157-192
    over the reference's fixed kd-tree march; the caller turns the count
    into the score beam_likelihood_min^(n_pen/num_points_default)
    (:146-152).
    """
    nt = gp_A.shape[0]
    bb = tables.shape[0]
    impl = _resolve_impl(impl)
    if impl == "emulate":
        npen = _emulate_beam_pen(
            tile_group, meta, pts_fp, aux, tables, gp_A,
            nprobe=nprobe, trunc=float(trunc), grid_min=float(grid_min),
            radius=float(radius), hit_range=float(hit_range),
            sin_total_ref=float(sin_total_ref), long_pen=bool(long_pen),
            tol=float(tol),
        )
        return npen.reshape(-1)
    kern = functools.partial(
        _beam_kernel, nprobe=nprobe, trunc=float(trunc),
        grid_min=float(grid_min), radius=float(radius),
        hit_range=float(hit_range),
        sin_total_ref=float(sin_total_ref), long_pen=bool(long_pen),
        tol=float(tol),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(nt, bb),
        in_specs=[
            pl.BlockSpec(
                (1, nprobe, 1, R_ROWS, ZW),
                lambda t, b, tg, mt, pf, ax, sk: (b, 0, tg[t], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 12, 8, 128),
                lambda t, b, tg, mt, pf, ax, sk: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, 128),
                         lambda t, b, tg, mt, pf, ax, sk: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    (npen,) = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nt, 8, 128), jnp.float32)],
        interpret=impl == "interpret",
    )(tile_group, meta.reshape(-1), pts_fp.reshape(-1), aux.reshape(-1),
      skip.reshape(-1), tables, gp_A)
    return npen.reshape(-1)


# ---------------------------------------------------------------------------
# Orchestration helpers shared by models/likelihood.py and models/beam.py.
# Phase 1 (group_stats + group_boxes) is cheap — reductions + interval
# boxes, O(N*12 + K*G) element ops, no sort, no [K, N] tensor — so the
# caller tests ``fits`` BEFORE paying for the layout build, the table
# extraction, and the kernel, all of which live inside the taken branch
# of a lax.cond.
# ---------------------------------------------------------------------------


def default_overflow_cap(n: int) -> int:
    """Static overflow capacity: the measured steady-state outlier
    fraction is ~3.7% of N (resample-jitter tails are much heavier than
    Gaussian; tools/exp_envelope_sweep.py), so expose 6.25% — the exact
    rescore costs ~cap*K gathers, a few percent of the XLA slow path."""
    return max(TILE, n >> 4)


def make_meta(lo, z_used):
    """Pack window origins for the kernels' scalar prefetch."""
    return jnp.concatenate(
        [lo[..., :2], z_used[..., None],
         jnp.zeros(z_used.shape + (1,), jnp.int32)], axis=-1)


def points_fp(pts):
    """Virtual points in the kernels' 2^16 fixed-point encoding."""
    fp = jnp.round(pts.astype(jnp.float32) * 65536.0).astype(jnp.int32)
    return jnp.concatenate(
        [fp, jnp.zeros((pts.shape[0], 1), jnp.int32)], axis=-1)
