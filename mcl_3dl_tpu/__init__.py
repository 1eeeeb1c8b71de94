"""mcl_3dl_tpu — TPU-native 6-DOF Monte Carlo localization.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
``at-wat/mcl_3dl`` ROS node (reference: /root/reference): a particle filter
that localizes a robot's 6-DOF pose against a 3-D point-cloud map using
LIDAR scans, wheel odometry, and IMU.

Architecture (TPU-first, not a port):

* Particles are a struct-of-arrays pytree (``state.ParticleState``),
  fixed capacity + active mask, sharded over a ``("robots", "particles")``
  device mesh.
* The map kd-tree (reference ``chunked_kdtree.h``) is replaced by a
  precomputed truncated voxel **distance field** resident in HBM
  (``map.DistanceField``); the likelihood model is a fused
  gather+clamp+reduce over ``[particles, points]``.
* The beam model's raycast (reference ``raycasts/raycast_using_dda.h``)
  is a vectorized bounded-step voxel march over ``[particles, beams]``.
* All filter steps (predict / measure / bias / resample / expectation /
  covariance / expansion-reset) are pure functions, jit-compiled
  end-to-end with no host round-trips per step.
"""

from mcl_3dl_tpu.config import Params
from mcl_3dl_tpu.state import ParticleState
from mcl_3dl_tpu.engine import MCL3DL

__version__ = "0.1.0"

__all__ = ["Params", "ParticleState", "MCL3DL", "__version__"]
