"""Beam LIDAR measurement model with vectorized raycasting.

Re-designs ``LidarMeasurementModelBeam``
(src/lidar_measurement_model_beam.cpp:124-192) plus both raycaster
back-ends as bounded-step voxel marches over ``[particles, beams]``:

* **kd-tree mode** (raycasts/raycast_using_kdtree.h:58-109, the default):
  probes every ``map_grid_min`` along the ray with
  ``radiusSearch(sqrt(2) * map_grid_max / 2)``; here each probe samples
  the (label-filtered) distance field; the incidence-angle estimate
  ``sin = |d1 - d0| / (2 * map_grid_min)`` uses the field at the probe
  and two steps back, exactly like raycast_using_kdtree.h:88-102.
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
    inc = direction * map_grid_min
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

    def cond(carry):
        s, found, t, _, _ = carry
        return (s < num_steps) & jnp.any(~found & (t < max_t))

    def body(carry):
        s, found, t, cpos, d0_hit = carry
        pos = begin + direction * t[..., None]
        d = df.sample_nearest(pos)
        active = (t < max_t) & ~found
        hit_now = (d <= radius) & active
        cpos = jnp.where(hit_now[..., None], pos, cpos)
        d0_hit = jnp.where(hit_now, d, d0_hit)
        advance = jnp.maximum((d - radius) / jnp.maximum(wu, 1e-6),
                              map_grid_min)
        t = jnp.where(active & ~hit_now, t + advance, t)
        return s + 1, found | hit_now, t, cpos, d0_hit

    init = (
        jnp.int32(0),
        jnp.zeros(shape, bool),
        jnp.full(shape, map_grid_min, jnp.float32),
        jnp.zeros(shape + (3,), jnp.float32),
        jnp.zeros(shape, jnp.float32),
    )
    # while_loop (not fori): every ray resolves (hit, or t >= max_t), so
    # in steady-state tracking the march exits after a handful of
    # sphere-trace steps instead of always paying the worst-case bound;
    # num_steps stays as the hard cap.  NOTE: unrolling the body
    # (unroll=4) cuts per-iteration overhead but blows remote-compile
    # time from ~1 min to >18 min on this environment's compile service
    # — kept rolled for reliability.
    if early_exit:
        _, any_hit, _, collision_pos, d0_hit = jax.lax.while_loop(
            cond, body, init
        )
    else:
        _, any_hit, _, collision_pos, d0_hit = jax.lax.fori_loop(
            0, num_steps, lambda _, c: body(c), init
        )

    # Incidence estimate from the probe two steps back
    # (raycast_using_kdtree.h:88-102).
    prev_pos = collision_pos - inc * 2.0
    d1 = df.sample_nearest(prev_pos)
    prev_radius = map_grid_min * 2.0 + radius
    sin_ang = jnp.where(
        d1 <= prev_radius,
        jnp.abs(d1 - d0_hit) / (map_grid_min * 2.0),
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
    occupied voxel blocks only if its map point lies within
    ``max((ray_angle_half * foot)^2, min_dist_thr_sq)`` of the ray
    (squared perpendicular distance; ``foot`` = distance from ray begin
    to the point's perpendicular foot), so grazing rays that clip a
    voxel corner stay LONG.  ``min_dist_thr_sq`` mirrors the reference's
    own formula ``gx^2 + gy^2 + gy^2`` — y counted twice, quirk
    preserved (raycast_using_dda.h:59).  Deviation: the reference tests
    every point stored in the voxel; here the voxel's stored MEAN point
    stands in (occupancy.py rationale).  With both parameters 0 every
    occupied voxel blocks (the pre-refinement behaviour).
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
        occ_hit, label, point_pos = occ.lookup(pos)
        voxel = jnp.floor((pos - occ.origin) / occ.cell).astype(jnp.int32)
        same_as_begin = jnp.all(voxel == begin_voxel, axis=-1)
        # perpendicular-distance collision test (hasIntersection,
        # raycast_using_dda.h:243-256) against the voxel's mean point
        if ray_angle_half > 0.0 or min_dist_thr_sq > 0.0:
            rel = point_pos - begin
            foot = jnp.abs(jnp.sum(rel * direction, axis=-1))
            thr_sq = jnp.maximum(
                (jnp.float32(ray_angle_half) * foot) ** 2,
                jnp.float32(min_dist_thr_sq),
            )
            perp_sq = jnp.sum(rel * rel, axis=-1) - foot * foot
            near_ray = perp_sq < thr_sq
        else:
            near_ray = jnp.ones(occ_hit.shape, bool)
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
