"""Multi-chip scaling (particle + robot axes over a device mesh).

The reference is single-process/single-thread (SURVEY §2: sequential
particle loop, pf.h:238-244).  Here the particle axis is sharded over a
``("robots", "particles")`` :class:`jax.sharding.Mesh`; weight
normalization, entropy, pose moments and the resampling CDF reduce via
XLA collectives (psum / all_gather) inserted by GSPMD from sharding
constraints — ICI within a slice, DCN across hosts.
"""

from mcl_3dl_tpu.parallel.sharding import (
    make_mesh,
    shard_state,
    sharded_filter_step,
    fleet_filter_step,
    fleet_filter_step_grouped,
)

__all__ = [
    "make_mesh",
    "shard_state",
    "sharded_filter_step",
    "fleet_filter_step",
    "fleet_filter_step_grouped",
]
