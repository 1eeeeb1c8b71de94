"""Map/spatial-index layer (reference layer L2).

The reference indexes the map with per-chunk FLANN kd-trees
(``chunked_kdtree.h``) and answers per-point ``radiusSearch`` queries in
a hot loop.  The TPU-native replacement precomputes, once per map load:

* a truncated anisotropic nearest-**distance field** on a voxel grid
  (:mod:`mcl_3dl_tpu.map.distance_field`) — each likelihood query becomes
  a trilinear gather, fully batched over ``[particles, points]``;
* a dense **occupancy / min-label grid**
  (:mod:`mcl_3dl_tpu.map.occupancy`) — the beam model's raycast becomes a
  bounded-step voxel march.

Both live in HBM for the lifetime of the map ("compile the map" replaces
``ChunkedKdtree::setInputCloud``, chunked_kdtree.h:124-216).
"""

from mcl_3dl_tpu.map.voxel import voxel_downsample
from mcl_3dl_tpu.map.distance_field import DistanceField, build_distance_field
from mcl_3dl_tpu.map.occupancy import OccupancyGrid, build_occupancy_grid
from mcl_3dl_tpu.map.map_data import MapData

__all__ = [
    "voxel_downsample",
    "DistanceField",
    "build_distance_field",
    "OccupancyGrid",
    "build_occupancy_grid",
    "MapData",
]
