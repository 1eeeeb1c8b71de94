"""Truncated anisotropic voxel distance field.

Replaces ``ChunkedKdtree``'s per-point ``radiusSearch``
(chunked_kdtree.h:217-237): at map load we precompute, for every voxel
cell center, the distance to the nearest map point under the reference's
anisotropic metric (coordinates scaled by ``dist_weight``, set from
src/mcl_3dl.cpp:1270 / parameters.cpp:108-111), truncated at ``trunc``.
Every radius query the node performs (likelihood matching, kd-tree
raycast probes, matched/unmatched classification, standable-surface
check) then becomes a gather + compare, batched over
``[particles, points]`` on the TPU.

Build runs on host in numpy using a scatter-min over a fixed offset cube
(exact within the truncation radius, vectorized with
``np.minimum.reduceat`` segment reductions — no Python-level per-point
loops).  The field is stored quantized to uint8 (max error
``trunc/255`` ~ 2.4 mm at the default 0.6 m truncation, far below the
0.05 m ``match_dist_flat`` floor) to keep multi-hundred-megacell maps
resident in HBM.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class DistanceField:
    """Device-resident truncated distance field.

    ``field`` is uint8: distance = field / 255 * trunc.  The grid lives
    in **weighted space** (coordinates pre-multiplied by ``weights``), so
    interpolation error is uniform in the anisotropic query metric —
    heavily weighted axes get proportionally finer effective resolution,
    matching the kd-tree's rescaled point representation exactly.  Cell
    centers sit at ``origin + idx * cell`` (weighted coords);
    out-of-bounds queries read ``trunc``.
    """

    field: jnp.ndarray          # [nx, ny, nz] uint8
    origin: jnp.ndarray         # [3] float32 (weighted space)
    cell: float
    trunc: float
    weights: tuple              # (wx, wy, wz) anisotropic axis weights
    packed: jnp.ndarray | None = None   # [nx*ny*nz, 2] uint32 corner pack
    # z-major 2D view [nx*ny, max(nz, 128)] u8, z padded with 255 (=trunc):
    # row-slice gather source for the yaw-grouped local-table fast path
    # (ops/grouped.py) — a table row is a contiguous 128-cell z window.
    field2d: jnp.ndarray | None = None

    @property
    def shape(self):
        return self.field.shape

    def _scaled(self, q):
        return q * jnp.asarray(self.weights, jnp.float32)

    def sample_trilinear(self, q):
        """Trilinearly interpolated distance at query points ``q`` [..., 3].

        With ``packed`` present, all 8 corner cells of the interpolation
        cube come from ONE row gather of two uint32 words (XLA's TPU
        gather is op-bound at ~10^8 ops/s regardless of fetch width, so
        this is ~8x cheaper than the naive per-corner loop).
        """
        if self.packed is not None:
            return _sample_packed(
                self.packed, self.field.shape, self.origin, self.cell,
                self.trunc, self._scaled(q)
            )
        return _sample(
            self.field, self.origin, self.cell, self.trunc, self._scaled(q), True
        )

    def sample_nearest(self, q):
        """Nearest-cell distance at query points ``q`` [..., 3]."""
        return _sample(
            self.field, self.origin, self.cell, self.trunc, self._scaled(q), False
        )


jax.tree_util.register_pytree_node(
    DistanceField,
    lambda d: ((d.field, d.origin, d.packed, d.field2d),
               (d.cell, d.trunc, d.weights)),
    lambda aux, ch: DistanceField(
        field=ch[0], origin=ch[1], packed=ch[2], field2d=ch[3],
        cell=aux[0], trunc=aux[1], weights=aux[2],
    ),
)


def _pack_corners(q: np.ndarray) -> np.ndarray:
    """Pack, for every cell, the 8 cells of its +1 corner cube into two
    uint32 words (overlapping 2x2x2 windows): word0 = dx=0 corners, word1
    = dx=1, byte index = dz + 2*dy.  Out-of-range high edges pad with 255
    (= trunc); per-corner OOB is re-masked at sample time anyway."""
    nx, ny, nz = q.shape
    qp = np.pad(q, ((0, 1), (0, 1), (0, 1)), constant_values=255)
    words = []
    for dx in (0, 1):
        w = np.zeros((nx, ny, nz), np.uint32)
        for dy in (0, 1):
            for dz in (0, 1):
                c = qp[dx:dx + nx, dy:dy + ny, dz:dz + nz].astype(np.uint32)
                w |= c << np.uint32(8 * (dz + 2 * dy))
        words.append(w.reshape(-1))
    return np.stack(words, axis=-1)          # [nx*ny*nz, 2]


def _sample_packed(packed, shape, origin, cell, trunc, q):
    """Trilinear sampling from the corner-packed table: one row gather
    per query, then byte unpack + weight combine on the VPU."""
    nx, ny, nz = shape
    dims = jnp.asarray([nx, ny, nz], jnp.int32)
    scale = jnp.float32(trunc / 255.0)
    u = (q - origin) / jnp.float32(cell)
    i0 = jnp.floor(u).astype(jnp.int32)
    f = u - i0.astype(jnp.float32)
    ic = jnp.clip(i0, 0, dims - 2)
    flat = (ic[..., 0] * ny + ic[..., 1]) * nz + ic[..., 2]
    rows = jnp.take(packed, flat, axis=0)     # [..., 2] uint32

    wx = (1.0 - f[..., 0], f[..., 0])
    wy = (1.0 - f[..., 1], f[..., 1])
    wz = (1.0 - f[..., 2], f[..., 2])
    out = jnp.zeros(q.shape[:-1], jnp.float32)
    for dx in (0, 1):
        word = rows[..., dx]
        for dy in (0, 1):
            for dz in (0, 1):
                v = ((word >> jnp.uint32(8 * (dz + 2 * dy)))
                     & jnp.uint32(0xFF)).astype(jnp.float32) * scale
                idx = i0 + jnp.asarray([dx, dy, dz], jnp.int32)
                oob = jnp.any((idx < 0) | (idx >= dims), axis=-1)
                v = jnp.where(oob, jnp.float32(trunc), v)
                out = out + wx[dx] * wy[dy] * wz[dz] * v
    return out


def _sample(field, origin, cell, trunc, q, trilinear: bool):
    nx, ny, nz = field.shape
    dims = jnp.asarray([nx, ny, nz], jnp.int32)
    scale = jnp.float32(trunc / 255.0)
    u = (q - origin) / jnp.float32(cell)

    def gather(idx):
        oob = jnp.any((idx < 0) | (idx >= dims), axis=-1)
        ic = jnp.clip(idx, 0, dims - 1)
        flat = (ic[..., 0] * ny + ic[..., 1]) * nz + ic[..., 2]
        vals = jnp.take(field.reshape(-1), flat, axis=0).astype(jnp.float32) * scale
        return jnp.where(oob, jnp.float32(trunc), vals)

    if not trilinear:
        idx = jnp.round(u).astype(jnp.int32)
        return gather(idx)

    i0 = jnp.floor(u).astype(jnp.int32)
    f = u - i0.astype(jnp.float32)
    out = jnp.zeros(q.shape[:-1], jnp.float32)
    for dx in (0, 1):
        wx = (1.0 - f[..., 0]) if dx == 0 else f[..., 0]
        for dy in (0, 1):
            wy = (1.0 - f[..., 1]) if dy == 0 else f[..., 1]
            for dz in (0, 1):
                wz = (1.0 - f[..., 2]) if dz == 0 else f[..., 2]
                idx = i0 + jnp.asarray([dx, dy, dz], jnp.int32)
                out = out + wx * wy * wz * gather(idx)
    return out


def _segment_min_scatter(field_flat, target_ids, values):
    """field_flat[id] = min(field_flat[id], min(values where target==id)).

    ``target_ids`` must be sorted ascending.  Uses reduceat over runs of
    equal ids — C-speed, no ufunc.at scalar loop.
    """
    if target_ids.size == 0:
        return
    starts = np.flatnonzero(
        np.concatenate([[True], target_ids[1:] != target_ids[:-1]])
    )
    mins = np.minimum.reduceat(values, starts)
    ids = target_ids[starts]
    np.minimum.at(field_flat, ids, mins)  # unique ids -> plain indexed min
    # note: ids are unique here so this is one vectorized compare, but
    # np.minimum.at is used for in-place semantics; equivalent to:
    # field_flat[ids] = np.minimum(field_flat[ids], mins)


def _finish(q3d, origin, cell, trunc, weights, pack_corners):
    nx, ny, nz = q3d.shape
    pack = (
        pack_corners
        and min(nx, ny, nz) >= 2
        # packed table is 8 bytes/cell; skip when it would dwarf HBM
        and nx * ny * nz <= 192_000_000
    )
    from mcl_3dl_tpu.ops.grouped import ZW

    nzp = max(nz, ZW)
    q2d = np.pad(q3d, ((0, 0), (0, 0), (0, nzp - nz)),
                 constant_values=255).reshape(nx * ny, nzp)
    return DistanceField(
        field=jnp.asarray(q3d),
        origin=jnp.asarray(origin, jnp.float32),
        cell=float(cell),
        trunc=float(trunc),
        weights=weights,
        packed=jnp.asarray(_pack_corners(q3d)) if pack else None,
        field2d=jnp.asarray(q2d),
    )


def build_distance_field(
    points: np.ndarray,
    cell: float,
    trunc: float,
    weights=(1.0, 1.0, 1.0),
    padding: float | None = None,
    pack_corners: bool = True,
    grid: tuple | None = None,
) -> DistanceField:
    """Build the truncated distance field from map points [M, 3].

    Exact (not chamfer-propagated) within the truncation radius: every
    cell whose weighted distance to some point is <= trunc receives the
    true minimum.  ``pack_corners`` additionally stores the 2x2x2 corner
    pack for single-gather trilinear sampling (8 bytes/cell extra).

    ``grid``: optional ``(origin [3], (nx, ny, nz))`` in weighted space
    to build on a caller-fixed frame — used so the label-filtered beam
    field shares the likelihood field's grid exactly and one
    pose-grouped particle layout (ops/grouped.py) serves both kernels.
    """
    weights = tuple(float(w) for w in weights)
    w = np.asarray(weights, dtype=np.float64)
    # Work entirely in weighted space: scale once, then the metric is
    # Euclidean and the splat radius is isotropic.
    points = np.asarray(points, dtype=np.float64).reshape(-1, 3) * w
    if padding is None:
        padding = trunc
    pad = padding + cell
    if points.shape[0] == 0 and grid is None:
        return _finish(
            np.full((1, 1, 1), 255, np.uint8), np.zeros(3), cell, trunc,
            weights, False,
        )

    if grid is not None:
        origin = np.asarray(grid[0], dtype=np.float64)
        nx, ny, nz = (int(d) for d in grid[1])
        dims = np.asarray([nx, ny, nz], np.int64)
        if points.shape[0] == 0:
            return _finish(
                np.full((nx, ny, nz), 255, np.uint8), origin, cell, trunc,
                weights, False,
            )
    else:
        min_p = points.min(axis=0) - pad
        max_p = points.max(axis=0) + pad
        origin = min_p
        dims = np.ceil((max_p - origin) / cell).astype(np.int64) + 1
        nx, ny, nz = (int(d) for d in dims)

    from mcl_3dl_tpu.map.native import build_distance_field_native

    native = build_distance_field_native(points, cell, trunc, origin, dims)
    if native is not None:
        q = np.clip(np.round(native / trunc * 255.0), 0, 255).astype(np.uint8)
        return _finish(q, origin, cell, trunc, weights, pack_corners)

    field_flat = np.full(nx * ny * nz, np.float32(trunc), dtype=np.float32)

    # Base cell of each point and sort once so all per-offset target id
    # streams are sorted too (adding a constant preserves order).
    base = np.round((points - origin) / cell).astype(np.int64)
    base_flat = (base[:, 0] * ny + base[:, 1]) * nz + base[:, 2]
    order = np.argsort(base_flat, kind="stable")
    points = points[order]
    base = base[order]
    base_flat = base_flat[order]

    r = int(np.ceil(trunc / cell + 0.5))
    centers_base = origin + base * cell

    for dx in range(-r, r + 1):
        ix = base[:, 0] + dx
        vx = (ix >= 0) & (ix < nx)
        ddx = centers_base[:, 0] + dx * cell - points[:, 0]
        for dy in range(-r, r + 1):
            iy = base[:, 1] + dy
            vxy = vx & (iy >= 0) & (iy < ny)
            ddy = centers_base[:, 1] + dy * cell - points[:, 1]
            dxy2 = ddx * ddx + ddy * ddy
            if (dxy2.min() if dxy2.size else 0.0) >= trunc * trunc:
                continue
            for dz in range(-r, r + 1):
                iz = base[:, 2] + dz
                valid = vxy & (iz >= 0) & (iz < nz)
                ddz = centers_base[:, 2] + dz * cell - points[:, 2]
                dist = np.sqrt(dxy2 + ddz * ddz)
                sel = valid & (dist < trunc)
                if not sel.any():
                    continue
                const = (dx * ny + dy) * nz + dz
                _segment_min_scatter(
                    field_flat,
                    base_flat[sel] + const,
                    dist[sel].astype(np.float32),
                )

    q = np.clip(
        np.round(field_flat / trunc * 255.0), 0, 255
    ).astype(np.uint8)
    return _finish(q.reshape(nx, ny, nz), origin, cell, trunc, weights,
                   pack_corners)
