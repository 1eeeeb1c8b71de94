"""Beam LIDAR measurement model with vectorized raycasting.

Re-designs ``LidarMeasurementModelBeam``
(src/lidar_measurement_model_beam.cpp:124-192) plus both raycaster
back-ends as bounded-step voxel marches over ``[particles, beams]``:

* **kd-tree mode** (raycasts/raycast_using_kdtree.h:58-109, the default):
  probes every ``map_grid_min`` along the ray with
  ``radiusSearch(sqrt(2) * map_grid_max / 2)``; here each probe samples
  the (label-filtered) distance field; the incidence-angle estimate
  is the field drop over the entry->hit span (see ``raycast_df`` for
  why the reference's two-probe delta, raycast_using_kdtree.h:88-102,
  cannot survive nearest-cell quantization).
* **DDA mode** (raycasts/raycast_using_dda.h:106-159): marches the
  occupancy grid; ``sin_angle`` is hardcoded 1.0 (their :151-152 TODO),
  so TOTAL_REFLECTION can never trigger in this mode.

Beam classification (lidar_measurement_model_beam.cpp:157-192):
first collision -> TOTAL_REFLECTION if grazing, else HIT when the
collision is within ``hit_range`` of the scan endpoint, else SHORT;
no collision -> LONG.  Score = beam_likelihood_min^(penalized/num)
floored at beam_likelihood_min (:146-152).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mcl_3dl_tpu.map.distance_field import DistanceField
from mcl_3dl_tpu.map.occupancy import OccupancyGrid
from mcl_3dl_tpu.math import quat as mq
from mcl_3dl_tpu.ops import grouped as og


class BeamStatus:
    HIT = 0
    SHORT = 1
    LONG = 2
    TOTAL_REFLECTION = 3


def raycast_df(
    df: DistanceField,
    begin: jnp.ndarray,       # [..., 3]
    end: jnp.ndarray,         # [..., 3]
    map_grid_min: float,
    map_grid_max: float,
    hit_tolerance: float,
    num_steps: int,
    early_exit: bool = True,
):
    """kd-tree-style raycast against the distance field.

    Returns ``(collision[...], collision_pos[..., 3], sin_angle[...])``.
    ``num_steps`` is the static march bound; rays longer than
    ``num_steps * map_grid_min`` are truncated (choose num_steps >=
    (clip_far + hit_tolerance) / map_grid_min).

    Probe schedule matches raycast_using_kdtree.h:58-71: length =
    floor((|ray| + hit_tolerance) / grid_min) steps of grid_min; probes
    run at i = 1 .. length-1 (the endpoint cell itself is the expected
    hit, probing stops *before* it).

    ``early_exit=False`` switches the march from ``while_loop`` to a
    fixed-trip ``fori_loop``.  Required when the ray batch is sharded
    over devices (GSPMD): a ``while_loop`` whose cond reduces over the
    sharded axis gives each shard its own trip count, so downstream
    collectives rendezvous with mismatched program counters and the run
    aborts (observed: XLA CPU rendezvous timeout, MULTICHIP_r01).
    """
    radius = float(2.0**0.5) * map_grid_max / 2.0
    seg = end - begin
    length = jnp.linalg.norm(seg, axis=-1)
    max_t = jnp.floor((length + hit_tolerance) / map_grid_min) * map_grid_min
    direction = seg / jnp.maximum(length, 1e-12)[..., None]
    shape = begin.shape[:-1]

    # Sphere tracing: the distance field value d bounds the weighted
    # distance to the nearest map point, and moving dt along unit ray
    # direction u changes any point's weighted distance by at most
    # dt * ||W u||, so dt = (d - radius) / ||W u|| can never skip a
    # collision.  A probe with d <= radius is a collision exactly as in
    # the reference's fixed map_grid_min march
    # (raycast_using_kdtree.h:58-109); the grid_min floor reproduces its
    # probe granularity near surfaces.  This cuts gathers/ray by ~3-5x
    # in open space, with an O(rays) carry (materializing [rays, steps]
    # probe tensors OOMs at 1M particles).
    w_vec = jnp.asarray(df.weights, jnp.float32)
    wu = jnp.linalg.norm(direction * w_vec, axis=-1)   # [...]: metric rate
    d_entry_thr = float(df.trunc) * 0.99

    def cond(carry):
        s, found, t, _, _, _, _ = carry
        return (s < num_steps) & jnp.any(~found & (t < max_t))

    def body(carry):
        s, found, t, cpos, d0_hit, t_entry, d_entry = carry
        pos = begin + direction * t[..., None]
        d = df.sample_nearest(pos)
        active = (t < max_t) & ~found
        # field-entry bookkeeping for the incidence span (see below)
        enter = active & (d < d_entry_thr) & (t_entry < 0.0)
        t_entry = jnp.where(enter, t, t_entry)
        d_entry = jnp.where(enter, d, d_entry)
        hit_now = (d <= radius) & active
        cpos = jnp.where(hit_now[..., None], pos, cpos)
        d0_hit = jnp.where(hit_now, d, d0_hit)
        advance = jnp.maximum((d - radius) / jnp.maximum(wu, 1e-6),
                              map_grid_min)
        t = jnp.where(active & ~hit_now, t + advance, t)
        return s + 1, found | hit_now, t, cpos, d0_hit, t_entry, d_entry

    init = (
        jnp.int32(0),
        jnp.zeros(shape, bool),
        jnp.full(shape, map_grid_min, jnp.float32),
        jnp.zeros(shape + (3,), jnp.float32),
        jnp.zeros(shape, jnp.float32),
        jnp.full(shape, -1.0, jnp.float32),
        jnp.full(shape, float(df.trunc), jnp.float32),
    )
    # while_loop (not fori): every ray resolves (hit, or t >= max_t), so
    # in steady-state tracking the march exits after a handful of
    # sphere-trace steps instead of always paying the worst-case bound;
    # num_steps stays as the hard cap.  NOTE: unrolling the body
    # (unroll=4) cuts per-iteration overhead but blows remote-compile
    # time from ~1 min to >18 min on this environment's compile service
    # — kept rolled for reliability.
    if early_exit:
        _, any_hit, _, collision_pos, d0_hit, t_entry, d_entry = (
            jax.lax.while_loop(cond, body, init))
    else:
        _, any_hit, _, collision_pos, d0_hit, t_entry, d_entry = (
            jax.lax.fori_loop(0, num_steps, lambda _, c: body(c), init))

    # Incidence estimate over the field-entry -> hit span.  DEVIATION
    # from the reference's two-probe delta (raycast_using_kdtree.h:
    # 88-102): the reference differentiates CONTINUOUS kd-tree point
    # distances, but nearest-cell field samples quantize a 2-step delta
    # to multiples of cell/(2*grid) — 0.5 at default geometry, useless
    # against sin(ang_total_ref) = 0.5.  The span from where the ray
    # entered the truncated field to the hit measures the same slope
    # with noise ~cell/span; the span grows as 1/sin for grazing rays,
    # so precision is best exactly where TOTAL_REFLECTION is decided
    # (tests/test_models.py::test_fixed_march_total_reflection_geometry).
    span = jnp.maximum(jnp.linalg.norm(
        collision_pos - (begin + direction * t_entry[..., None]), axis=-1),
        1e-6)
    sin_ang = jnp.where(
        any_hit & (t_entry >= 0.0) & (span > map_grid_min),
        jnp.clip((d_entry - d0_hit) / span, 0.0, 1.0),
        1.0,
    )
    sin_ang = jnp.where(any_hit, sin_ang, 0.0)
    return any_hit, collision_pos, sin_ang


def raycast_occ(
    occ: OccupancyGrid,
    begin: jnp.ndarray,
    end: jnp.ndarray,
    hit_tolerance: float,
    filter_label_max: int,
    num_steps: int,
    early_exit: bool = True,
    ray_angle_half: float = 0.0,
    min_dist_thr_sq: float = 0.0,
):
    """DDA-style raycast against the occupancy grid.

    Marches at half-cell spacing (a superset of the exact Amanatides-Woo
    voxel walk, raycast_using_dda.h:106-159).  A ray starting outside
    the map AABB never collides (:70-75); the voxel containing the ray
    origin is skipped (the reference increments the DDA cursor before
    the first intersection test).  Collision position is the voxel's
    mean map point.  Returns ``(collision, collision_pos, sin_angle=1)``.

    Perpendicular-distance refinement (raycast_using_dda.h:237-258): an
    occupied voxel blocks only if one of its stored points lies within
    ``max((ray_angle_half * foot)^2, min_dist_thr_sq)`` of the ray
    (squared perpendicular distance; ``foot`` = distance from ray begin
    to the point's perpendicular foot), so grazing rays that clip a
    voxel corner stay LONG.  ``min_dist_thr_sq`` mirrors the reference's
    own formula ``gx^2 + gy^2 + gy^2`` — y counted twice, quirk
    preserved (raycast_using_dda.h:59).  The reference tests every
    point stored in the voxel; here the voxel's ``REP_POINTS``
    spread-sampled representatives are all tested and the FIRST passing
    one is the collision point (exact when the voxel holds <=
    REP_POINTS points — multi-surface voxels classify correctly).  With
    both parameters 0 every occupied voxel blocks (the pre-refinement
    behaviour; collision point = first stored representative).
    """
    step = occ.cell * 0.5
    seg = end - begin
    length = jnp.linalg.norm(seg, axis=-1)
    direction = seg / jnp.maximum(length, 1e-12)[..., None]
    max_t = length + hit_tolerance

    nx, ny, nz = occ.shape
    dims_hi = occ.origin + jnp.asarray([nx, ny, nz], jnp.float32) * jnp.float32(
        occ.cell
    )
    begin_inside = jnp.all((begin >= occ.origin) & (begin <= dims_hi), axis=-1)
    begin_voxel = jnp.floor((begin - occ.origin) / occ.cell).astype(jnp.int32)

    shape = begin.shape[:-1]

    # Sequential march, O(rays) carry (see raycast_df).  while_loop so
    # the march exits once every ray has hit or run past its max range.
    def cond(carry):
        s, found, _ = carry
        t = jnp.float32(s + 1) * step
        return (s < num_steps) & jnp.any(~found & (t < max_t))

    def body(carry):
        s, found, cpos = carry
        t = jnp.float32(s + 1) * step
        pos = begin + direction * t
        occ_hit, label, rep_pos = occ.lookup(pos)       # rep_pos [..., R, 3]
        voxel = jnp.floor((pos - occ.origin) / occ.cell).astype(jnp.int32)
        same_as_begin = jnp.all(voxel == begin_voxel, axis=-1)
        # perpendicular-distance collision test (hasIntersection,
        # raycast_using_dda.h:243-256) against EVERY representative
        # point; the first passing one is the collision point (the
        # reference's first-in-list semantics)
        if ray_angle_half > 0.0 or min_dist_thr_sq > 0.0:
            rel = rep_pos - begin[..., None, :]          # [..., R, 3]
            foot = jnp.abs(jnp.sum(rel * direction[..., None, :], axis=-1))
            thr_sq = jnp.maximum(
                (jnp.float32(ray_angle_half) * foot) ** 2,
                jnp.float32(min_dist_thr_sq),
            )
            perp_sq = jnp.sum(rel * rel, axis=-1) - foot * foot
            pass_r = perp_sq < thr_sq                    # [..., R]
            near_ray = jnp.any(pass_r, axis=-1)
            first = jnp.argmax(pass_r, axis=-1)          # first passing rep
        else:
            near_ray = jnp.ones(occ_hit.shape, bool)
            first = jnp.zeros(occ_hit.shape, jnp.int32)
        point_pos = jnp.take_along_axis(
            rep_pos, first[..., None, None], axis=-2
        )[..., 0, :]
        blocked = (
            occ_hit
            & near_ray
            & (label <= jnp.uint32(filter_label_max))
            & ~same_as_begin
            & (t < max_t)
            & begin_inside
            & ~found
        )
        cpos = jnp.where(blocked[..., None], point_pos, cpos)
        return s + 1, found | blocked, cpos

    init = (jnp.int32(0), jnp.zeros(shape, bool),
            jnp.zeros(shape + (3,), jnp.float32))
    if early_exit:
        _, any_hit, collision_pos = jax.lax.while_loop(cond, body, init)
    else:
        # fixed-trip march for SPMD safety (see raycast_df docstring)
        _, any_hit, collision_pos = jax.lax.fori_loop(
            0, num_steps, lambda _, c: body(c), init
        )
    sin_ang = jnp.where(any_hit, 1.0, 0.0)
    return any_hit, collision_pos, sin_ang


def raycast_fixed(
    df: DistanceField,
    begin: jnp.ndarray,       # [..., 3]
    end: jnp.ndarray,         # [..., 3]
    map_grid_min: float,
    map_grid_max: float,
    hit_tolerance: float,
    num_steps: int,
):
    """The reference's exact fixed-step march (raycast_using_kdtree.h:58-109)
    as a pure-XLA fori_loop: probe every ``map_grid_min`` at t = i*grid
    for 1 <= i < floor((|ray|+tol)/grid); collision = field <= sqrt(2)*
    grid_max/2; incidence sin over the field-entry -> hit span (see the
    estimator rationale in ``raycast_df``).  Slower than the sphere
    trace at scale (no adaptive stride) — it exists as the semantics
    oracle for the grouped Pallas beam kernel
    (ops/grouped.grouped_beam_pen), which reproduces this march over
    the sorted particle layout.

    Returns ``(collision[...], collision_pos[..., 3], sin_angle[...])``.
    """
    radius = float(2.0**0.5) * map_grid_max / 2.0
    d_entry_thr = float(df.trunc) * 0.99
    seg = end - begin
    length = jnp.linalg.norm(seg, axis=-1)
    direction = seg / jnp.maximum(length, 1e-12)[..., None]
    l_b = jnp.floor((length + hit_tolerance) / map_grid_min)
    shape = begin.shape[:-1]

    def body(s, carry):
        found, t_hit, d_hit, t_entry, d_entry = carry
        i = jnp.float32(s - 1)
        pos = begin + direction * (i * map_grid_min)
        d = df.sample_nearest(pos)
        elig = (i >= 1.0) & (i < l_b)
        enter = elig & ~found & (d < d_entry_thr) & (t_entry < 0.0)
        t_entry = jnp.where(enter, i * map_grid_min, t_entry)
        d_entry = jnp.where(enter, d, d_entry)
        hit_now = elig & ~found & (d <= radius)
        t_hit = jnp.where(hit_now, i * map_grid_min, t_hit)
        d_hit = jnp.where(hit_now, d, d_hit)
        return found | hit_now, t_hit, d_hit, t_entry, d_entry

    zero = jnp.zeros(shape, jnp.float32)
    init = (jnp.zeros(shape, bool), zero, zero,
            jnp.full(shape, -1.0, jnp.float32),
            jnp.full(shape, float(df.trunc), jnp.float32))
    found, t_hit, d_hit, t_entry, d_entry = jax.lax.fori_loop(
        0, num_steps + 1, body, init)

    span = t_hit - t_entry
    sin_ang = jnp.where(
        found & (t_entry >= 0.0) & (span > map_grid_min),
        jnp.clip((d_entry - d_hit) / jnp.maximum(span, 1e-6), 0.0, 1.0),
        1.0,
    )
    sin_ang = jnp.where(found, sin_ang, 0.0)
    cpos = begin + direction * t_hit[..., None]
    cpos = jnp.where(found[..., None], cpos, 0.0)
    return found, cpos, sin_ang


class BeamVirtualPoints:
    """Particle-independent probe schedule for the grouped fixed march.

    Every probe position is affine in the particle pose with virtual
    point ``org_b + dir_b * i*grid`` (rotation preserves ray length, so
    the schedule is shared by all particles).  ``vpf``/``chainf`` are
    the [B*nprobe] flattened virtual points / chain-validity used for
    the group boxes and table extraction."""

    def __init__(self, points, origin_idx, valid, origins, map_grid_min,
                 hit_range, num_steps):
        self.nprobe = num_steps + 1                            # i = -1..S-1
        sensor_org = origins[origin_idx]                       # [B, 3]
        seg = points - sensor_org
        self.length = jnp.linalg.norm(seg, axis=-1)            # [B]
        dirb = seg / jnp.maximum(self.length, 1e-12)[..., None]
        i_vals = jnp.arange(self.nprobe, dtype=jnp.float32) - 1.0
        vp = (sensor_org[:, None, :]
              + dirb[:, None, :] * (i_vals[None, :, None] * map_grid_min))
        l_b = jnp.floor((self.length + hit_range) / map_grid_min)
        chain = (i_vals[None, :] < l_b[:, None]) & valid[:, None]
        self.bb = points.shape[0]
        self.vpf = vp.reshape(self.bb * self.nprobe, 3)
        self.chainf = chain.reshape(self.bb * self.nprobe)


def _overflow_beam_pen(df_beam, pos, rot, over_idx, points, origin_idx,
                       valid, origins, *, map_grid_min, map_grid_max,
                       hit_range, sin_total_ref, long_pen, num_steps):
    """Exact penalized-beam counts for the envelope-outlier particles:
    the reference fixed march (``raycast_fixed``) + classification on
    the [cap, B] subset — the same semantics the grouped kernel
    computes for in-envelope particles.  Sentinel rows (over_idx == N)
    clamp-gather garbage; their results are dropped at scatter time."""
    posc = jnp.take(pos, over_idx, axis=0)                     # [C, 3]
    rotc = jnp.take(rot, over_idx, axis=0)
    rmatc = mq.rotation_matrix(mq.normalize(rotc))
    sensor_org = origins[origin_idx]                           # [B, 3]
    begins = (
        jnp.einsum("bj,cij->cbi", sensor_org, rmatc,
                   preferred_element_type=jnp.float32)
        + posc[:, None, :]
    )
    ends = (
        jnp.einsum("bj,cij->cbi", points, rmatc,
                   preferred_element_type=jnp.float32)
        + posc[:, None, :]
    )
    found, cpos, sin_ang = raycast_fixed(
        df_beam, begins, ends, map_grid_min, map_grid_max, hit_range,
        num_steps)
    dist_sq = jnp.sum((ends - cpos) ** 2, axis=-1)
    graze = found & (sin_ang <= sin_total_ref)
    short = found & ~graze & (dist_sq >= hit_range * hit_range)
    long_p = (~found) & long_pen
    pen = (short | long_p) & valid[None, :]
    return jnp.sum(pen, axis=-1).astype(jnp.float32)           # [C]


def beam_measure_grouped(
    df_beam: DistanceField,
    pos: jnp.ndarray,          # [N, 3]
    rot: jnp.ndarray,          # [N, 4]
    points: jnp.ndarray,       # [B, 3] sampled beam endpoints (base frame)
    origin_idx: jnp.ndarray,   # [B] int32
    valid: jnp.ndarray,        # [B] bool
    origins: jnp.ndarray,      # [L, 3]
    *,
    map_grid_min: float,
    map_grid_max: float,
    hit_range: float,
    beam_likelihood_min: float,
    num_points_default: int,
    sin_total_ref: float,
    add_penalty_short_only_mode: bool,
    num_steps: int,
    active: jnp.ndarray,
    fallback,
    grouped=None,
    rmat: jnp.ndarray | None = None,
    with_info: bool = False,
):
    """Beam likelihood via the grouped fixed-march Pallas kernel.

    Semantics = the reference kd-tree raycast + beam classification
    (raycast_using_kdtree.h:58-109, lidar_measurement_model_beam.cpp:
    124-192) over the same pose-grouped local tables as the likelihood
    model; envelope-outlier particles are re-scored exactly by
    ``_overflow_beam_pen``.  ``fallback() -> likelihood[N]`` is taken
    (under a lax.cond) when the group boxes don't fit — startup, global
    localization, kidnapped spreads.

    ``grouped``: optional ``(stats, layout, lo, fits, vp)`` prepared by
    the engine (one sorted layout shared with the likelihood model —
    df and df_beam live on the same grid, map/map_data.py).  When
    omitted, it is built here.

    Returns ``likelihood [N]`` (+ engaged tier with ``with_info``).
    """
    if grouped is None:
        if rmat is None:
            rmat = mq.rotation_matrix(mq.normalize(rot))
        vp = BeamVirtualPoints(points, origin_idx, valid, origins,
                               map_grid_min, hit_range, num_steps)
        cap = og.default_overflow_cap(pos.shape[0])
        stats = og.group_stats(pos, rmat, rot, df_beam.weights,
                               float(df_beam.cell), df_beam.origin, active)
        lo, fits_kg = og.group_boxes(stats, vp.vpf, df_beam.field.shape)
        fits = (jnp.all(fits_kg | ~vp.chainf[:, None])
                & (stats.n_over <= cap))
        layout = jax.lax.cond(
            fits,
            lambda: og.build_layout(stats, cap),
            lambda: og.empty_layout(pos.shape[0], cap),
        )
    else:
        stats, layout, lo, fits, vp = grouped

    nprobe = vp.nprobe
    bb = vp.bb
    radius = float(2.0**0.5) * map_grid_max / 2.0
    per_beam = beam_likelihood_min ** (1.0 / float(num_points_default))
    has_points = jnp.sum(valid) > 0

    def fast(_):
        nzp = df_beam.field2d.shape[1]
        tables, z_used = og.extract_tables(
            df_beam.field2d, df_beam.field.shape[1], nzp, lo, vp.chainf,
            float(df_beam.trunc))
        aux = jnp.stack(
            [jnp.round(vp.length * 65536.0).astype(jnp.int32),
             valid.astype(jnp.int32)], axis=-1)                # [B, 2]
        # Block-skip words: a 16-row table block whose minimum distance
        # (min code * trunc/255 over the envelope's reachable z band;
        # out-of-window reads give 255 = trunc) is >= the enter
        # threshold trunc*0.99 AND > the collision radius is an exact
        # no-op in the kernel (its rows can neither enter nor hit); a
        # probe with ALL blocks skippable is empty space and skips
        # entirely — the common case for most of a long ray through a
        # truncated field.
        min_d = og.block_min_dist(
            tables, float(df_beam.trunc), lo=lo, z_used=z_used,
            bands=og.query_bands(stats, vp.vpf))            # [K, G, NBLK]
        skip = og.pack_block_skip(
            (min_d >= jnp.float32(float(df_beam.trunc) * 0.99))
            & (min_d > jnp.float32(radius)))
        npen_sorted = og.grouped_beam_pen(
            layout.A, layout.tile_group, og.make_meta(lo, z_used),
            og.points_fp(vp.vpf), aux, skip,
            tables.reshape(bb, nprobe, og.G_GROUPS, og.R_ROWS, og.ZW),
            nprobe=nprobe, trunc=float(df_beam.trunc),
            grid_min=float(map_grid_min), radius=radius,
            hit_range=float(hit_range), sin_total_ref=float(sin_total_ref),
            long_pen=not add_penalty_short_only_mode,
            tol=float(hit_range),
        )
        n_pen = jnp.take(npen_sorted, layout.dest)
        n_pen_of = _overflow_beam_pen(
            df_beam, pos, rot, layout.over_idx, points, origin_idx, valid,
            origins, map_grid_min=map_grid_min, map_grid_max=map_grid_max,
            hit_range=hit_range, sin_total_ref=sin_total_ref,
            long_pen=not add_penalty_short_only_mode, num_steps=num_steps)
        n_pen = n_pen.at[layout.over_idx].set(n_pen_of)
        score = jnp.maximum(per_beam**n_pen, beam_likelihood_min)
        return jnp.where(has_points, score, 1.0)

    lik = jax.lax.cond(fits, fast, lambda _: fallback(), None)
    if with_info:
        return lik, jnp.where(fits, jnp.int32(0), jnp.int32(2))
    return lik


def beam_measure(
    df_beam: DistanceField,
    occ: OccupancyGrid,
    pos: jnp.ndarray,          # [N, 3]
    rot: jnp.ndarray,          # [N, 4]
    points: jnp.ndarray,       # [B, 3] sampled beam endpoints (base frame)
    origin_idx: jnp.ndarray,   # [B] int32 — per-point sensor origin index
    valid: jnp.ndarray,        # [B] bool
    origins: jnp.ndarray,      # [L, 3] sensor origins (base frame)
    *,
    use_dda: bool,
    map_grid_min: float,
    map_grid_max: float,
    hit_range: float,
    beam_likelihood_min: float,
    num_points_default: int,
    sin_total_ref: float,
    filter_label_max: int,
    add_penalty_short_only_mode: bool,
    num_steps: int,
    early_exit: bool = True,
    ray_angle_half: float = 0.0,
    min_dist_thr_sq: float = 0.0,
):
    """Returns ``(likelihood[N], quality[N], status[N, B])``.

    ``beam_likelihood_`` = beam_likelihood_min^(1/num_points_default)
    (refreshParameters, lidar_measurement_model_beam.cpp:66).
    """
    rmat = mq.rotation_matrix(mq.normalize(rot))
    ends = (
        jnp.einsum("bj,nij->nbi", points, rmat,
                   preferred_element_type=jnp.float32)
        + pos[:, None, :]
    )                                                          # [N, B, 3]
    sensor_org = origins[origin_idx]                           # [B, 3]
    begins = (
        jnp.einsum("bj,nij->nbi", sensor_org, rmat,
                   preferred_element_type=jnp.float32)
        + pos[:, None, :]
    )

    if use_dda:
        collision, cpos, sin_ang = raycast_occ(
            occ, begins, ends, hit_range, filter_label_max, num_steps,
            early_exit=early_exit, ray_angle_half=ray_angle_half,
            min_dist_thr_sq=min_dist_thr_sq,
        )
    else:
        collision, cpos, sin_ang = raycast_df(
            df_beam, begins, ends, map_grid_min, map_grid_max, hit_range,
            num_steps, early_exit=early_exit,
        )

    dist_sq = jnp.sum((ends - cpos) ** 2, axis=-1)
    graze = sin_ang <= sin_total_ref
    status = jnp.where(
        collision,
        jnp.where(
            graze,
            BeamStatus.TOTAL_REFLECTION,
            jnp.where(dist_sq < hit_range**2, BeamStatus.HIT, BeamStatus.SHORT),
        ),
        BeamStatus.LONG,
    )

    penalized = (status == BeamStatus.SHORT) | (
        (not add_penalty_short_only_mode) & (status == BeamStatus.LONG)
    )
    penalized = penalized & valid[None, :]
    n_pen = jnp.sum(penalized, axis=-1).astype(jnp.float32)
    per_beam = beam_likelihood_min ** (1.0 / float(num_points_default))
    score = jnp.maximum(per_beam**n_pen, beam_likelihood_min)

    has_points = jnp.sum(valid) > 0
    likelihood = jnp.where(has_points, score, 1.0)
    return likelihood, jnp.ones_like(likelihood), status
