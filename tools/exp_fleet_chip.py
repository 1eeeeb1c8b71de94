"""Single-chip fleet scaling toward BASELINE config 5 (1024 x 10k).

Measures the vmapped fleet step (parallel.fleet_filter_step semantics,
but on ONE chip there is no mesh to shard over — the robots axis is a
plain leading batch) at increasing robots x particles with the full
96+3-point measurement and the shared map replicated once.  Records
step time and the resident state size; the likelihood working set
[R*P, K] is the binding HBM constraint.

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


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge

    results = []
    cpu = jax.devices("cpu")[0]
    for robots, npart in ((16, 10240), (64, 10240), (128, 10240)):
        with jax.default_device(cpu):
            eng, args_cpu = ge._build_engine_and_inputs(
                num_particles=npart, cloud_points=1024, fast=True)
        args = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)), args_cpu)

        def tile(x):
            return jnp.broadcast_to(x[None], (robots,) + x.shape)

        state_b = jax.tree.map(tile, args[0])
        keys = jax.random.split(args[1], robots)
        tiled = [tile(args[i]) for i in range(5, 14)]
        f_pos_b = jax.tree.map(tile, args[14])
        f_ang_b = jax.tree.map(tile, args[15])
        gfix = jnp.zeros((robots,), bool)

        vstep = jax.jit(jax.vmap(
            partial(eng._measurement_step, spmd_safe=True),
            in_axes=(0, 0, None, None, None,
                     0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0),
        ))
        t0 = time.monotonic()
        try:
            out = vstep(state_b, keys, args[2], args[3], args[4], *tiled,
                        f_pos_b, f_ang_b, gfix)
            _ = float(np.asarray(out[0].prob[0, 0]))
        except Exception as exc:  # OOM at scale is data, not failure
            msg = str(exc)
            if "memory" in msg.lower() or "hbm" in msg.lower():
                import re as _re
                m = _re.search(r"Used [0-9.]+[GM] of [0-9.]+[GM] hbm[^.]*",
                               msg)
                results.append({
                    "robots": robots, "particles_per_robot": npart,
                    "total_particles": robots * npart,
                    "oom": m.group(0) if m else "HBM OOM",
                })
                print(f"[{robots}x{npart}] OOM: "
                      f"{m.group(0) if m else 'HBM OOM'}", flush=True)
                continue
            raise
        compile_s = time.monotonic() - t0
        print(f"[{robots}x{npart}] compile+first: {compile_s:.0f}s",
              file=sys.stderr, flush=True)
        state = out[0]
        iters = 3
        t0 = time.monotonic()
        for _ in range(iters):
            out = vstep(state, keys, args[2], args[3], args[4], *tiled,
                        f_pos_b, f_ang_b, gfix)
            state = out[0]
        _ = float(np.asarray(state.prob[0, 0]))
        dt = (time.monotonic() - t0) / iters
        e = np.asarray(jax.device_get(out[-1])["e_pos"])
        assert e.shape == (robots, 3) and np.isfinite(e).all()
        state_mb = robots * npart * 17 * 4 / 1e6
        row = {
            "robots": robots, "particles_per_robot": npart,
            "total_particles": robots * npart,
            "step_ms": round(dt * 1e3, 1),
            "robot_updates_per_sec": round(robots / dt, 1),
            "state_mb": round(state_mb, 1),
        }
        results.append(row)
        print(f"[{robots}x{npart}] step {dt*1e3:.0f} ms | "
              f"{robots/dt:.0f} robot-updates/s | state {state_mb:.0f} MB",
              flush=True)
        del out, state, state_b, tiled, vstep

    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "FLEET_CHIP.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {os.path.normpath(path)}")


if __name__ == "__main__":
    main()
