"""Virtual-mesh scaling + fleet memory smoke (VERDICT r1 item 8).

Runs on 8 virtual CPU devices (no chip contention):
  A. sharded fused step at 1/2/4/8 devices, fixed 64k particles —
     correctness (finite, device-count-invariant pose) + a wall-clock
     table.  CPU timings only sanity-check that collectives don't
     serialize the step; real scaling needs real chips.
  B. fleet step at 64 robots x 10k particles over ("robots",
     "particles") — smokes the [robots, particles] memory layout toward
     BASELINE's 1024x10k config.
"""

import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    result = {"A_sharded_scaling": [], "B_fleet": None}
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    import __graft_entry__ as ge
    from mcl_3dl_tpu.parallel import (
        fleet_filter_step, make_mesh, shard_state, sharded_filter_step,
    )

    # ---- A: device-count scaling at fixed particle count
    eng, args = ge._build_engine_and_inputs(
        num_particles=1 << 16, cloud_points=512, fast=True)
    poses = {}
    for nd in (1, 2, 4, 8):
        mesh = make_mesh(nd)
        state = shard_state(args[0], mesh)
        step = sharded_filter_step(eng, mesh)
        out = step(state, *args[1:])
        jax.block_until_ready(out)
        # pose after ONE step from identical state: only reduction-order
        # noise (resampling thresholds amplify fp noise chaotically over
        # further steps, so later poses are not comparable)
        poses[nd] = np.asarray(jax.device_get(out[-1])["e_pos"])
        t0 = time.monotonic()
        iters = 3
        for _ in range(iters):
            out = step(out[0], *args[1:])
        jax.block_until_ready(out)
        dt = (time.monotonic() - t0) / iters
        aux = jax.device_get(out[-1])
        assert np.isfinite(poses[nd]).all()
        result["A_sharded_scaling"].append({
            "devices": nd, "particles": 65536,
            "step_ms": round(dt * 1e3, 1),
            "pose": [round(float(v), 4) for v in poses[nd]],
        })
        print(f"A scaling: {nd} dev, 65536 particles: {dt*1e3:.0f} ms/step "
              f"pose={np.round(poses[nd], 4)}")
    for nd in (2, 4, 8):
        np.testing.assert_allclose(poses[nd], poses[1], atol=1e-4)
    print("A scaling: first-step pose agrees across device counts OK")

    # ---- B: fleet memory smoke, 64 robots x 10k particles
    robots, npart = 64, 10240
    eng2, args2 = ge._build_engine_and_inputs(
        num_particles=npart, cloud_points=256, fast=True)
    mesh = make_mesh(8, robots=8)

    def tile(x):
        return jnp.broadcast_to(x[None], (robots,) + x.shape)

    state_b = jax.tree.map(tile, args2[0])
    state_b = shard_state(state_b, mesh, batched=True)
    keys = jax.random.split(args2[1], robots)
    cloud_b = tile(args2[5])
    label_b = tile(args2[6])
    valid_b = tile(args2[7])
    normals_b = tile(args2[8])
    origins_b = tile(args2[9])
    o_pos = tile(args2[10]); o_rot = tile(args2[11])
    p_pos = tile(args2[12]); p_rot = tile(args2[13])
    f_pos_b = jax.tree.map(tile, args2[14])
    f_ang_b = jax.tree.map(tile, args2[15])
    gfix = jnp.zeros((robots,), bool)

    step = fleet_filter_step(eng2, mesh)
    t0 = time.monotonic()
    out = step(state_b, keys, args2[2], args2[3], args2[4],
               cloud_b, label_b, valid_b, normals_b, origins_b,
               o_pos, o_rot, p_pos, p_rot, f_pos_b, f_ang_b, gfix)
    jax.block_until_ready(out)
    aux = jax.device_get(out[-1])
    e = np.asarray(aux["e_pos"])
    assert e.shape == (robots, 3) and np.isfinite(e).all()
    # steady-state step timing (post-compile)
    t0 = time.monotonic()
    iters = 3
    for _ in range(iters):
        out = step(out[0], keys, args2[2], args2[3], args2[4],
                   cloud_b, label_b, valid_b, normals_b, origins_b,
                   o_pos, o_rot, p_pos, p_rot, f_pos_b, f_ang_b, gfix)
    jax.block_until_ready(out)
    dt = (time.monotonic() - t0) / iters
    result["B_fleet"] = {
        "robots": robots, "particles_per_robot": npart,
        "step_ms": round(dt * 1e3, 1),
        "pose0": [round(float(v), 3) for v in e[0]],
    }
    print(f"B fleet: {robots} robots x {npart} particles "
          f"({dt*1e3:.0f} ms/step on 8 virtual CPU devices) pose[0]="
          f"{np.round(e[0], 3)} OK")

    # ---- C: BASELINE config-5 robot count (1024) on the virtual mesh.
    # The full 1024 x 10k x (96+3) step is a chip workload (see
    # tools/exp_fleet_chip.py and the BENCH_NOTES FLEET table); on the
    # 2-core CI host we validate the 1024-robot AXIS itself — sharding,
    # per-robot RNG/odometry, collectives — at reduced per-robot load.
    robots_c, npart_c = 1024, 1024
    eng3, args3 = ge._build_engine_and_inputs(
        num_particles=npart_c, cloud_points=64, fast=True, like_points=8)
    mesh_c = make_mesh(8, robots=8)

    def tile_c(x):
        return jnp.broadcast_to(x[None], (robots_c,) + x.shape)

    state_c = shard_state(jax.tree.map(tile_c, args3[0]), mesh_c,
                          batched=True)
    keys_c = jax.random.split(args3[1], robots_c)
    tiled = [tile_c(args3[i]) for i in range(5, 14)]
    f_pos_c = jax.tree.map(tile_c, args3[14])
    f_ang_c = jax.tree.map(tile_c, args3[15])
    gfix_c = jnp.zeros((robots_c,), bool)
    step_c = fleet_filter_step(eng3, mesh_c)
    out = step_c(state_c, keys_c, args3[2], args3[3], args3[4], *tiled,
                 f_pos_c, f_ang_c, gfix_c)
    jax.block_until_ready(out)
    t0 = time.monotonic()
    out = step_c(out[0], keys_c, args3[2], args3[3], args3[4], *tiled,
                 f_pos_c, f_ang_c, gfix_c)
    jax.block_until_ready(out)
    dt_c = time.monotonic() - t0
    e_c = np.asarray(jax.device_get(out[-1])["e_pos"])
    assert e_c.shape == (robots_c, 3) and np.isfinite(e_c).all()
    result["C_fleet_1024"] = {
        "robots": robots_c, "particles_per_robot": npart_c,
        "like_points": 8,
        "step_ms": round(dt_c * 1e3, 1),
    }
    print(f"C fleet: {robots_c} robots x {npart_c} particles "
          f"({dt_c*1e3:.0f} ms/step on 8 virtual CPU devices) OK")

    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "SCALING_VMESH.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {os.path.normpath(path)}")


if __name__ == "__main__":
    main()
