"""Fleet batching: many robots, one shared map, one device mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from mcl_3dl_tpu.parallel import fleet_filter_step, make_mesh
from mcl_3dl_tpu import state as st


def test_fleet_step_runs_and_is_per_robot():
    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    import __graft_entry__ as ge

    R = 2
    eng, args = ge._build_engine_and_inputs(num_particles=64, cloud_points=256)
    mesh = make_mesh(8, robots=R)

    def batch(x):
        return jnp.stack([x] * R)

    state_b = jax.tree.map(batch, args[0])
    # robot 1 gets a shifted odometry pose -> different published pose
    odom_pos_b = jnp.stack([args[10], args[10] + 1.0])

    step = fleet_filter_step(eng, mesh)
    out = step(
        state_b,
        jax.random.split(jax.random.PRNGKey(0), R),
        args[2], args[3], args[4],
        batch(args[5]), batch(args[6]), batch(args[7]), batch(args[8]),
        batch(args[9]), odom_pos_b, batch(args[11]),
        batch(args[12]), batch(args[13]),
        jax.tree.map(batch, args[14]), jax.tree.map(batch, args[15]),
        batch(args[16]),
    )
    jax.block_until_ready(out)
    new_state, aux = out[0], out[-1]
    assert new_state.pos.shape[0] == R
    e_pos = np.asarray(aux["e_pos"])
    assert e_pos.shape == (R, 3)
    assert np.isfinite(e_pos).all()
    # the raw biased mean is odometry-independent, but the published
    # (smoothed, recomposed) pose must differ by the odom offset
    pub = np.asarray(aux["pub_pos"])
    assert not np.allclose(pub[0], pub[1], atol=1e-3)


def test_fleet_step_16_robots_1k_particles():
    """CI-sized slice of the BASELINE fleet config (1024 robots x 10k;
    the 64x10k smoke runs in tools/exp_scaling.py with its committed
    docs/SCALING_VMESH.json result): 16 robots x 1024 particles over the
    ("robots", "particles") mesh, two chained steps, per-robot RNG."""
    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    import __graft_entry__ as ge

    R, N = 16, 1024
    eng, args = ge._build_engine_and_inputs(num_particles=N, cloud_points=256,
                                            fast=True)
    mesh = make_mesh(8, robots=8)

    def batch(x):
        return jnp.broadcast_to(x[None], (R,) + x.shape)

    from mcl_3dl_tpu.parallel import shard_state
    state_b = shard_state(jax.tree.map(batch, args[0]), mesh, batched=True)
    keys = jax.random.split(jax.random.PRNGKey(3), R)
    rest = (args[2], args[3], args[4], batch(args[5]), batch(args[6]),
            batch(args[7]), batch(args[8]), batch(args[9]), batch(args[10]),
            batch(args[11]), batch(args[12]), batch(args[13]),
            jax.tree.map(batch, args[14]), jax.tree.map(batch, args[15]),
            batch(args[16]))
    step = fleet_filter_step(eng, mesh)
    out = step(state_b, keys, *rest)
    out = step(out[0], keys, *rest)
    jax.block_until_ready(out)
    aux = jax.device_get(out[-1])
    e = np.asarray(aux["e_pos"])
    assert e.shape == (R, 3) and np.isfinite(e).all()
    # distinct per-robot RNG keys -> resampling noise decorrelates robots
    assert not np.allclose(e[0], e[1], atol=1e-6)


def test_fleet_step_grouped_engages_fast_tiers():
    """The shard_map + per-robot-scan fleet step
    (``fleet_filter_step_grouped``) must (a) engage the grouped
    measurement tiers for every robot — the vmapped ``spmd_safe`` path
    structurally cannot — and (b) agree with the vmapped path on the
    per-robot fused pose (same state, same keys: the grouped kernels
    reproduce the XLA scoring for every particle)."""
    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    import __graft_entry__ as ge
    from mcl_3dl_tpu.parallel import fleet_filter_step_grouped, shard_state

    R, N = 4, 1024
    eng, args = ge._build_engine_and_inputs(num_particles=N, cloud_points=256,
                                            fast=True, like_points=8,
                                            beam_clip_far=2.0, beam_clip_z=1.0)
    # converged-tracking spread so the per-robot grouped envelopes fit
    eng.initial_pose(
        np.zeros(3), np.asarray([0.0, 0.0, 0.0, 1.0]),
        np.diag([0.02**2, 0.02**2, 0.02**2, 0.01**2, 0.01**2, 0.02**2]),
    )
    args = (eng.pstate,) + args[1:]
    mesh = make_mesh(4, robots=4)

    def batch(x):
        return jnp.broadcast_to(x[None], (R,) + x.shape)

    state_b = shard_state(jax.tree.map(batch, args[0]), mesh, batched=True)
    keys = jax.random.split(jax.random.PRNGKey(5), R)
    rest = (args[2], args[3], args[4], batch(args[5]), batch(args[6]),
            batch(args[7]), batch(args[8]), batch(args[9]), batch(args[10]),
            batch(args[11]), batch(args[12]), batch(args[13]),
            jax.tree.map(batch, args[14]), jax.tree.map(batch, args[15]),
            batch(args[16]))

    step_g = fleet_filter_step_grouped(eng, mesh)
    out_g = step_g(state_b, keys, *rest)
    jax.block_until_ready(out_g)
    aux_g = jax.device_get(out_g[-1])
    assert np.asarray(aux_g["e_pos"]).shape == (R, 3)
    assert np.isfinite(np.asarray(aux_g["e_pos"])).all()
    # fast tiers engaged for EVERY robot
    assert np.all(np.asarray(aux_g["tier_like"]) == 0), aux_g["tier_like"]
    assert np.all(np.asarray(aux_g["tier_beam"]) == 0), aux_g["tier_beam"]

    # parity vs the vmapped XLA-tier path on the fused pose.  NOT
    # bit-equal: the spmd_safe beam fallback marches the sphere trace
    # (models/beam.raycast_df) while the grouped kernel reproduces the
    # reference's fixed march — their incidence estimates differ at
    # grazing-edge beams, so per-particle beam scores can flip a
    # TOTAL_REFLECTION classification.  Pose agreement to a fraction
    # of a millimetre is the meaningful contract.
    step_v = fleet_filter_step(eng, mesh)
    out_v = step_v(state_b, keys, *rest)
    aux_v = jax.device_get(out_v[-1])
    np.testing.assert_allclose(
        np.asarray(aux_g["e_pos"]), np.asarray(aux_v["e_pos"]),
        rtol=0, atol=3e-4)
