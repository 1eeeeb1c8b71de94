"""Mesh construction and sharded filter steps.

Design (SURVEY §2 parallelism table): particles are data-parallel over
the ``"particles"`` mesh axis; a fleet of robots adds a leading
``"robots"`` axis.  The map distance field / occupancy grid are
replicated (read-only, gathered locally).  All cross-shard interaction
happens inside one jit-compiled step: weight sums, entropy, pose
moments, covariance (psum), and the resampling CDF gather (all_gather of
selected states) — inserted automatically by GSPMD from the sharding
constraints below, riding ICI within a slice.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mcl_3dl_tpu.state import ParticleState


def make_mesh(
    n_devices: Optional[int] = None, robots: int = 1, devices=None
) -> Mesh:
    """Mesh over ("robots", "particles")."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % robots != 0:
        raise ValueError(f"{n} devices not divisible by {robots} robot groups")
    arr = np.asarray(devices).reshape(robots, n // robots)
    return Mesh(arr, ("robots", "particles"))


def _state_spec(batched: bool) -> ParticleState:
    lead = ("robots",) if batched else ()
    arr = P(*lead, "particles")
    scalar = P(*lead) if batched else P()
    return ParticleState(
        pos=arr, rot=arr, odom_err_lin=arr, odom_err_ang=arr, noise=arr,
        prob=arr, prob_bias=arr, n_active=scalar,
    )


def shard_state(state: ParticleState, mesh: Mesh, batched: bool = False):
    """Place a particle state onto the mesh (particle axis sharded)."""
    spec = _state_spec(batched)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        state, spec,
        is_leaf=lambda x: not isinstance(x, ParticleState),
    )


def sharded_filter_step(engine, mesh: Mesh):
    """Jit the engine's fused measurement step with particle sharding.

    Returns a function with the same signature as
    ``MCL3DL._measurement_step``; inputs other than the particle state
    are replicated.

    The measurement models run under ``shard_map`` on each shard's
    LOCAL particle slice (see ``MCL3DL._measure_models``), so the
    pose-grouped Pallas fast tiers and early-exit raycast marches
    engage per shard — the v5e-16 scaling story runs the same fast
    kernels as the single-chip path.  Only the filter boundaries
    (weight normalization, entropy, moments, covariance, resampling
    CDF) cross shards, via GSPMD-inserted collectives.
    """
    spec = _state_spec(False)
    state_sh = jax.tree.map(
        lambda s: NamedSharding(mesh, s), spec,
        is_leaf=lambda x: isinstance(x, P),
    )
    repl = NamedSharding(mesh, P())

    def step(state, key, df, df_beam, occ, cloud, cloud_label, cloud_valid,
             normals, origins, odom_pos, odom_rot, prev_pos, prev_rot,
             f_pos, f_ang, is_global_fix):
        return engine._measurement_step(
            state, key, df, df_beam, occ, cloud, cloud_label, cloud_valid,
            normals, origins, odom_pos, odom_rot, prev_pos, prev_rot,
            f_pos, f_ang, is_global_fix, shard_mesh=mesh,
        )

    return jax.jit(
        step,
        in_shardings=(
            state_sh, repl, None, None, None, repl, repl, repl, repl, repl,
            repl, repl, repl, repl, None, None, repl,
        ),
        out_shardings=(state_sh, None, None, repl, repl, None),
    )


def fleet_filter_step_grouped(engine, mesh: Mesh):
    """Fleet step with the FAST per-robot tiers (VERDICT r4 §3): robots
    are sharded over the mesh's ``"robots"`` axis via ``shard_map``;
    each shard runs its local robots SEQUENTIALLY (``lax.scan``) through
    the full single-robot fused step — pose-grouped Pallas kernels,
    early-exit raycast marches, per-robot lax.cond tiers — because
    inside shard_map control flow is device-local (the same property
    ``sharded_filter_step`` exploits for the particle axis).

    Two structural wins over the ``vmap`` + ``spmd_safe`` path
    (``fleet_filter_step``):

    * the measurement tiers ENGAGE — the vmapped path must run the
      shard-count-invariant XLA tier (Pallas has no GSPMD partitioning
      and no batching rule for scalar-prefetch grids);
    * the per-shard working set is ONE robot's measurement state at a
      time instead of all local robots' ``[R_local * P, K]`` transforms
      — the r4 128x10k OOM (22.3 GB) was exactly that XLA-tier working
      set, so the scan path re-opens the BASELINE config-5 robot counts
      on bounded memory.

    Same signature as ``fleet_filter_step``.  Robots must divide evenly
    over the robots mesh axis.

    Sizing note (measured, docs/FLEET_CHIP_SMALLBINS.json): the grouped
    machinery's per-(point, bin) costs are particle-count-independent
    and the default 24x2x2 pose grid is sized for the 1M flagship;
    fleet workloads at ~10k particles/robot should right-size it
    (``MCL_G_YAW=6 MCL_G_PITCH=1 MCL_G_ROLL=1``) — 7.3 ms per robot,
    flat from 64 to 768 robots on one chip, vs ~45 ms at the default
    grid; 1024 robots x 8192 particles fit one v5e chip at 152.8
    robot-updates/s.

    Placement note: pre-place the inputs with this step's shardings
    (``shard_state(..., batched=True)`` + ``jax.device_put`` with the
    robots/replicated NamedShardings) and keep them resident — on a
    remote-relay environment, per-call placement of unplaced arrays
    costs ~1.5 s flat per step (tools/exp_fleet_chip.py does this).

    Capacity note: build fleet engines at the EXACT (TILE-multiple)
    particle capacity (``MCL3DL(params, capacity=n)``), not the
    power-of-2 bucket — XLA stores two ``[R, capacity, 3]`` scan temps
    (8, 128)-tiled, padding the minor dim 42.7x, so bucket slack costs
    GBs of HBM and dead-slot compute; the exact capacity is what fits
    BASELINE config 5 (1024 x 10240) on one v5e chip.
    """
    if mesh.shape["particles"] != 1:
        # this path parallelizes over ROBOTS only (the per-robot scan
        # runs each robot's particles on one device); a >1 particles
        # axis would make GSPMD all-gather the whole fleet state onto
        # every particles-axis device for zero benefit
        raise ValueError(
            "fleet_filter_step_grouped needs a robots-only mesh "
            f"(particles axis = 1); got {dict(mesh.shape)} — build it "
            "with make_mesh(n, robots=n)")
    spec = _state_spec(True)
    state_sh = jax.tree.map(
        lambda s: NamedSharding(mesh, s), spec,
        is_leaf=lambda x: isinstance(x, P),
    )
    robot = NamedSharding(mesh, P("robots"))
    pr = P("robots")
    rr = P()

    def local(state_b, keys, df, df_beam, occ, cloud, cloud_label,
              cloud_valid, normals, origins, odom_pos, odom_rot, prev_pos,
              prev_rot, f_pos_b, f_ang_b, is_global_fix):
        xs = (state_b, keys, cloud, cloud_label, cloud_valid, normals,
              origins, odom_pos, odom_rot, prev_pos, prev_rot, f_pos_b,
              f_ang_b, is_global_fix)

        def one(carry, x):
            (st, key, cl, cll, clv, nrm, org, op, orot, pp, prot, fp, fa,
             gf) = x
            out = engine._measurement_step(
                st, key, df, df_beam, occ, cl, cll, clv, nrm, org, op,
                orot, pp, prot, fp, fa, gf,
            )
            return carry, out

        _, outs = jax.lax.scan(one, 0, xs)
        return outs

    in_specs = (pr, pr, rr, rr, rr, pr, pr, pr, pr, pr, pr, pr, pr, pr,
                pr, pr, pr)
    out_specs = (pr, pr, pr, pr, pr, pr)
    step_sm = jax.shard_map(
        local, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(
        step_sm,
        in_shardings=(
            state_sh, robot, None, None, None, robot, robot, robot, robot,
            robot, robot, robot, robot, robot, robot, robot, robot,
        ),
        out_shardings=(state_sh, robot, robot, robot, robot, robot),
    )


def fleet_filter_step(engine, mesh: Mesh):
    """Batched fleet step: vmap over a leading robots axis, sharded
    ``("robots", "particles")``; the map stays shared/replicated.

    The measurement models run ``spmd_safe`` (XLA tier): Pallas
    local-table kernels have no GSPMD partitioning and no batching rule
    for their scalar-prefetch grids, so the vmapped step cannot engage
    them — use :func:`fleet_filter_step_grouped` for the fast tiers.

    Signature: ``step(state_batched, keys[R,2], df, df_beam, occ,
    cloud[R,P,3], cloud_label[R,P], cloud_valid[R,P], normals[R,P,3],
    origins[R,L,3], odom_pos[R,3], odom_rot[R,4], prev_pos[R,3],
    prev_rot[R,4], f_pos_b, f_ang_b, is_global_fix[R])``.
    """
    spec = _state_spec(True)
    state_sh = jax.tree.map(
        lambda s: NamedSharding(mesh, s), spec,
        is_leaf=lambda x: isinstance(x, P),
    )
    robot = NamedSharding(mesh, P("robots"))

    from functools import partial

    vstep = jax.vmap(
        partial(engine._measurement_step, spmd_safe=True),
        in_axes=(0, 0, None, None, None, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0),
    )
    return jax.jit(
        vstep,
        in_shardings=(
            state_sh, robot, None, None, None, robot, robot, robot, robot,
            robot, robot, robot, robot, robot, None, None, robot,
        ),
        out_shardings=(state_sh, None, None, robot, robot, None),
    )
