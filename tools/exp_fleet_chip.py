"""Single-chip fleet scaling toward BASELINE config 5 (1024 x 10k).

v2 (VERDICT r4 §3): measures BOTH fleet execution paths with the full
96+3-point measurement and the shared map replicated once:

* ``vmap_xla`` — the vmapped ``spmd_safe`` step
  (parallel.fleet_filter_step semantics).  The measurement tiers
  cannot engage (no GSPMD/batching rule for the Pallas kernels), and
  the whole-fleet ``[R*P, K]`` measurement working set binds HBM
  (r4: 128x10k needed 22.3 GB).
* ``scan_grouped`` — ``parallel.fleet_filter_step_grouped``: robots
  scanned sequentially per shard, each running the single-robot fused
  step with the pose-grouped Pallas tiers engaged; per-robot tiers are
  recorded.  The working set is ONE robot at a time, so the OOM
  boundary is set by the resident state, not the measurement.

Run SOLO on the chip:  python tools/exp_fleet_chip.py
Writes docs/FLEET_CHIP.json.
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _oom_row(exc, robots, npart, path):
    msg = str(exc)
    if "memory" in msg.lower() or "hbm" in msg.lower():
        import re as _re
        m = _re.search(r"Used [0-9.]+[GM] of [0-9.]+[GM] hbm[^.]*", msg)
        row = {
            "path": path,
            "robots": robots, "particles_per_robot": npart,
            "total_particles": robots * npart,
            "oom": m.group(0) if m else "HBM OOM",
        }
        print(f"[{path} {robots}x{npart}] OOM: {row['oom']}", flush=True)
        return row
    raise exc


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from mcl_3dl_tpu.parallel import fleet_filter_step_grouped, make_mesh

    results = []
    cpu = jax.devices("cpu")[0]
    npart = int(os.environ.get("FLEET_NPART", "10240"))
    only = os.environ.get("FLEET_ONLY", "")          # "scan" skips vmap
    out_name = os.environ.get("FLEET_OUT", "FLEET_CHIP.json")
    scan_configs = tuple(
        int(x) for x in os.environ.get(
            "FLEET_SCAN_ROBOTS", "16,64,128,256,1024").split(","))

    def build(robots):
        with jax.default_device(cpu):
            # exact capacity (not the power-of-2 bucket): the fleet's
            # dominant HBM consumers are [R, capacity, 3] scan temps
            # that XLA lays out (8, 128)-tiled — 42.7x padded on the
            # minor dim — so the bucket's 16384-vs-10240 slack costs
            # ~6 GB at 1024 robots (docs/FLEET_CHIP_1024.json OOM)
            eng, args_cpu = ge._build_engine_and_inputs(
                num_particles=npart, cloud_points=1024, fast=True,
                capacity=npart if npart % 1024 == 0 else None)
            # converged-tracking spread so the per-robot grouped
            # envelopes fit from the first step (same regime the 1M
            # flagship bench reaches after warmup)
            eng.initial_pose(
                np.zeros(3), np.asarray([0.0, 0.0, 0.0, 1.0]),
                np.diag([0.02**2] * 3 + [0.01**2, 0.01**2, 0.02**2]),
            )
            args_cpu = (eng.pstate,) + args_cpu[1:]
        args = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)), args_cpu)

        def tile(x):
            return jnp.broadcast_to(x[None], (robots,) + x.shape)

        state_b = jax.tree.map(tile, args[0])
        keys = jax.random.split(args[1], robots)
        tiled = [tile(args[i]) for i in range(5, 14)]
        f_pos_b = jax.tree.map(tile, args[14])
        f_ang_b = jax.tree.map(tile, args[15])
        gfix = jnp.zeros((robots,), bool)
        rest = (args[2], args[3], args[4], *tiled, f_pos_b, f_ang_b, gfix)
        return eng, state_b, keys, rest

    # ---- vmapped spmd_safe path (XLA tier) --------------------------------
    for robots in (() if only == "scan" else (16, 64, 128)):
        eng, state_b, keys, rest = build(robots)
        # pre-commit inputs to the default device so per-call relay
        # placement (~1.5 s flat, see the scan section) is excluded
        dev = jax.devices()[0]
        state_b = jax.tree.map(lambda a: jax.device_put(a, dev), state_b)
        keys = jax.device_put(keys, dev)
        rest = tuple(jax.tree.map(lambda a: jax.device_put(a, dev), r)
                     for r in rest)
        vstep = jax.jit(jax.vmap(
            partial(eng._measurement_step, spmd_safe=True),
            in_axes=(0, 0, None, None, None,
                     0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0),
        ))
        t0 = time.monotonic()
        try:
            out = vstep(state_b, keys, *rest)
            _ = float(np.asarray(out[0].prob[0, 0]))
        except Exception as exc:
            results.append(_oom_row(exc, robots, npart, "vmap_xla"))
            continue
        print(f"[vmap {robots}x{npart}] compile+first: "
              f"{time.monotonic()-t0:.0f}s", file=sys.stderr, flush=True)
        state = out[0]
        iters = 3
        t0 = time.monotonic()
        for _ in range(iters):
            out = vstep(state, keys, *rest)
            state = out[0]
        _ = float(np.asarray(state.prob[0, 0]))
        dt = (time.monotonic() - t0) / iters
        e = np.asarray(jax.device_get(out[-1])["e_pos"])
        assert e.shape == (robots, 3) and np.isfinite(e).all()
        row = {
            "path": "vmap_xla",
            "robots": robots, "particles_per_robot": npart,
            "total_particles": robots * npart,
            "step_ms": round(dt * 1e3, 1),
            "robot_updates_per_sec": round(robots / dt, 1),
            "state_mb": round(robots * npart * 17 * 4 / 1e6, 1),
        }
        results.append(row)
        print(f"[vmap {robots}x{npart}] step {dt*1e3:.0f} ms | "
              f"{robots/dt:.1f} robot-updates/s", flush=True)
        del out, state, state_b, vstep

    # ---- scan_grouped path (fast tiers per robot) -------------------------
    # Inputs are PRE-PLACED with the step's shardings: through this
    # environment's remote-TPU relay, per-call placement of unplaced
    # arrays costs ~1.5 s/step flat (measured: 1531 ms vs 53 ms at
    # robots=1 with identical compute) — a relay artifact, not program
    # cost.  Real deployments keep fleet state resident anyway.
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mcl_3dl_tpu.parallel import shard_state

    mesh = make_mesh(1, robots=1)
    robot_sh = NamedSharding(mesh, P("robots"))
    repl_sh = NamedSharding(mesh, P())

    def place(x, sh):
        return jax.tree.map(lambda a: jax.device_put(a, sh), x)

    for robots in scan_configs:
        eng, state_b, keys, rest = build(robots)
        state_b = shard_state(state_b, mesh, batched=True)
        keys = jax.device_put(keys, robot_sh)
        rest = tuple(
            place(r, repl_sh if i < 3 else robot_sh)
            for i, r in enumerate(rest))
        step = fleet_filter_step_grouped(eng, mesh)
        t0 = time.monotonic()
        try:
            out = step(state_b, keys, *rest)
            _ = float(np.asarray(out[0].prob[0, 0]))
        except Exception as exc:
            results.append(_oom_row(exc, robots, npart, "scan_grouped"))
            continue
        print(f"[scan {robots}x{npart}] compile+first: "
              f"{time.monotonic()-t0:.0f}s", file=sys.stderr, flush=True)
        state = out[0]
        iters = 3 if robots <= 128 else 1
        t0 = time.monotonic()
        for _ in range(iters):
            out = step(state, keys, *rest)
            state = out[0]
        _ = float(np.asarray(state.prob[0, 0]))
        dt = (time.monotonic() - t0) / iters
        aux = jax.device_get(out[-1])
        e = np.asarray(aux["e_pos"])
        assert e.shape == (robots, 3) and np.isfinite(e).all()
        tl = np.asarray(aux["tier_like"])
        tb = np.asarray(aux["tier_beam"])
        row = {
            "path": "scan_grouped",
            "robots": robots, "particles_per_robot": npart,
            "total_particles": robots * npart,
            "step_ms": round(dt * 1e3, 1),
            "robot_updates_per_sec": round(robots / dt, 1),
            "state_mb": round(robots * npart * 17 * 4 / 1e6, 1),
            "tiers_engaged_frac": [float((tl == 0).mean()),
                                   float((tb == 0).mean())],
        }
        results.append(row)
        print(f"[scan {robots}x{npart}] step {dt*1e3:.0f} ms | "
              f"{robots/dt:.1f} robot-updates/s | grouped frac "
              f"{row['tiers_engaged_frac']}", flush=True)
        del out, state, state_b, step

    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        out_name)
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {os.path.normpath(path)}")


if __name__ == "__main__":
    main()
