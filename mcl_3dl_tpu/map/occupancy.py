"""Dense voxel occupancy / min-label grid for the beam model's raycast.

Replaces ``RaycastUsingDDA``'s host-built voxel point lists
(raycasts/raycast_using_dda.h:162-190): voxels covering the map AABB at
``dda_grid_size``; a voxel is occupied when any map point falls in it.
The minimum point label per voxel supports label transparency
(lidar_measurement_model_beam.cpp:168-169): a voxel blocks a ray iff it
contains at least one point with ``label <= filter_label_max``.

Per-voxel point lists are represented by up to ``REP_POINTS``
spread-sampled *representative points* (stored as quantized offsets):
the reference tests every point stored in a voxel against the ray's
perpendicular-distance criterion (raycast_using_dda.h:237-258); here
every representative is tested and the first passing one is the
collision point — multi-surface voxels (e.g. two walls clipping one
cell) classify correctly where a single mean point would smear them.
Voxels with <= REP_POINTS points are exact.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

# representative points stored per voxel; slots beyond the voxel's
# point count repeat the first point (idempotent under the any-of test)
REP_POINTS = 4


@dataclass(frozen=True)
class OccupancyGrid:
    occupied: jnp.ndarray       # [nx, ny, nz] bool
    min_label: jnp.ndarray      # [nx, ny, nz] uint32 (0xFFFFFFFF when empty)
    rep_point: jnp.ndarray      # [nx, ny, nz, REP_POINTS, 3] uint8 offsets
    origin: jnp.ndarray         # [3] float32 (min corner of voxel (0,0,0))
    cell: float

    @property
    def shape(self):
        return self.occupied.shape

    def lookup(self, q):
        """Query points ``q`` [..., 3] -> (occupied, label, rep_pos).

        ``rep_pos`` [..., REP_POINTS, 3] are the dequantized
        representative points of the voxel (voxel center when empty);
        out-of-bounds queries are unoccupied.
        """
        nx, ny, nz = self.occupied.shape
        dims = jnp.asarray([nx, ny, nz], jnp.int32)
        idx = jnp.floor((q - self.origin) / jnp.float32(self.cell)).astype(jnp.int32)
        oob = jnp.any((idx < 0) | (idx >= dims), axis=-1)
        ic = jnp.clip(idx, 0, dims - 1)
        flat = (ic[..., 0] * ny + ic[..., 1]) * nz + ic[..., 2]
        occ = jnp.take(self.occupied.reshape(-1), flat) & ~oob
        label = jnp.take(self.min_label.reshape(-1), flat)
        off = jnp.take(
            self.rep_point.reshape(-1, REP_POINTS, 3), flat, axis=0
        ).astype(jnp.float32) / 255.0
        pos = self.origin + (
            ic[..., None, :].astype(jnp.float32) + off
        ) * jnp.float32(self.cell)
        return occ, label, pos


jax.tree_util.register_pytree_node(
    OccupancyGrid,
    lambda g: ((g.occupied, g.min_label, g.rep_point, g.origin), (g.cell,)),
    lambda aux, ch: OccupancyGrid(
        occupied=ch[0], min_label=ch[1], rep_point=ch[2], origin=ch[3],
        cell=aux[0],
    ),
)


def build_occupancy_grid(
    points: np.ndarray,
    cell: float,
    labels: np.ndarray | None = None,
) -> OccupancyGrid:
    """Build the occupancy grid on host from map points [M, 3].

    Representative points per voxel: ``REP_POINTS`` stride samples of
    the voxel's point list including its first and last member — exact
    when the voxel holds <= REP_POINTS points, a spread subset
    otherwise."""
    points = np.asarray(points, dtype=np.float64).reshape(-1, 3)
    if labels is None:
        labels = np.zeros((points.shape[0],), np.uint32)
    labels = np.asarray(labels).astype(np.uint32)

    if points.shape[0] == 0:
        return OccupancyGrid(
            occupied=jnp.zeros((1, 1, 1), bool),
            min_label=jnp.full((1, 1, 1), 0xFFFFFFFF, jnp.uint32),
            rep_point=jnp.full((1, 1, 1, REP_POINTS, 3), 127, jnp.uint8),
            origin=jnp.zeros((3,), jnp.float32),
            cell=float(cell),
        )

    origin = points.min(axis=0)
    # +1 matches raycast_using_dda.h:179 (size = span/cell + 1).
    dims = ((points.max(axis=0) - origin) / cell).astype(np.int64) + 1
    nx, ny, nz = (int(d) for d in dims)

    from mcl_3dl_tpu.map import native as _native

    nat = _native.build_occupancy_rep_native(
        points, labels, cell, origin, dims, REP_POINTS)
    if nat is not None:
        occupied_n, min_label_n, rep_n = nat
        return OccupancyGrid(
            occupied=jnp.asarray(occupied_n.reshape(nx, ny, nz)),
            min_label=jnp.asarray(min_label_n.reshape(nx, ny, nz)),
            rep_point=jnp.asarray(
                rep_n.reshape(nx, ny, nz, REP_POINTS, 3)),
            origin=jnp.asarray(origin, jnp.float32),
            cell=float(cell),
        )

    idx = np.clip(
        np.floor((points - origin) / cell).astype(np.int64), 0, dims - 1
    )
    flat = (idx[:, 0] * ny + idx[:, 1]) * nz + idx[:, 2]

    order = np.argsort(flat, kind="stable")
    flat_s = flat[order]
    starts = np.flatnonzero(np.concatenate([[True], flat_s[1:] != flat_s[:-1]]))
    counts = np.diff(np.concatenate([starts, [flat.size]]))
    uids = flat_s[starts]

    occupied = np.zeros(nx * ny * nz, bool)
    occupied[uids] = True

    min_label = np.full(nx * ny * nz, 0xFFFFFFFF, np.uint32)
    min_label[uids] = np.minimum.reduceat(labels[order], starts)

    # stride-sample REP_POINTS representatives per voxel (first + last
    # always included; duplicates when the voxel has fewer points)
    rep_sel = np.stack([
        starts + (r * (counts - 1)) // max(REP_POINTS - 1, 1)
        for r in range(REP_POINTS)
    ], axis=1)                                        # [V, R] indices
    rep_pts = points[order][rep_sel]                  # [V, R, 3]
    off = rep_pts / cell - (origin / cell + idx[order][starts])[:, None, :]
    off_q = np.clip(np.round(off * 255.0), 0, 255).astype(np.uint8)
    rep_point = np.full((nx * ny * nz, REP_POINTS, 3), 127, np.uint8)
    rep_point[uids] = off_q

    return OccupancyGrid(
        occupied=jnp.asarray(occupied.reshape(nx, ny, nz)),
        min_label=jnp.asarray(min_label.reshape(nx, ny, nz)),
        rep_point=jnp.asarray(
            rep_point.reshape(nx, ny, nz, REP_POINTS, 3)),
        origin=jnp.asarray(origin, jnp.float32),
        cell=float(cell),
    )
