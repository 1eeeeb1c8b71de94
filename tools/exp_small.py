"""Small-count latency sweep on the real chip (VERDICT r2 item 5;
methodology pinned per VERDICT r4 item 8).

The reference node's actual operating point is 64-500 particles at
sensor rate (src/parameters.cpp:118 default num_particles=64, ~10 Hz
demo).  This measures the fused measurement step's wall latency at
64 / 512 / 16384 particles with VALUE-FETCH timing (block_until_ready
lies through the axon relay — see bench.py), steady state, one process
on the chip.

Methodology (the r3->r4 rows moved 4x on relay variance): each config
runs REPEATS chained blocks of ``iters`` steps; the per-step time is
``(median(block) - fetch_overhead) / iters`` where ``fetch_overhead``
is the median cost of fetching an already-computed value through the
relay (measured in situ) — at 64 particles the relay round trip is a
third of the raw per-step number, so subtracting it and taking the
median across blocks is what makes the rows comparable across rounds.
The raw block spread is reported alongside.

Writes docs/SMALL_COUNT.json.  Run SOLO on the chip.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


REPEATS = 7


def run_config(n_particles, iters=50):
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        eng, args_cpu = ge._build_engine_and_inputs(
            num_particles=n_particles, cloud_points=4096, seed=0, fast=True)
    args = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)), args_cpu)
    step = jax.jit(eng._measurement_step)

    t0 = time.monotonic()
    out = step(*args)
    _ = float(np.asarray(out[0].prob[0]))
    compile_s = time.monotonic() - t0

    keys = jax.random.split(args[1], REPEATS * iters + 8)
    state = out[0]
    for i in range(6):   # converge to steady state
        out = step(state, keys[i], *args[2:])
        state = out[0]
    _ = float(np.asarray(state.prob[0]))

    # relay fetch overhead: median cost of pulling an already-computed
    # value (state is ready after the fetch above)
    fetches = []
    for _i in range(7):
        t0 = time.monotonic()
        _ = float(np.asarray(state.prob[0]))
        fetches.append(time.monotonic() - t0)
    t_fetch = float(np.median(fetches))

    blocks = []
    block_tiers = []
    k = 6
    for _r in range(REPEATS):
        t0 = time.monotonic()
        for _i in range(iters):
            out = step(state, keys[k], *args[2:])
            state = out[0]
            k += 1
        _ = float(np.asarray(state.prob[0]))
        blocks.append(time.monotonic() - t0)
        aux_r = jax.device_get(out[-1])
        block_tiers.append([int(np.asarray(aux_r["tier_like"])),
                            int(np.asarray(aux_r["tier_beam"]))])
    dt = (float(np.median(blocks)) - t_fetch) / iters

    like_pts = eng.params.likelihood.num_points
    beam_pts = eng.params.beam.num_points
    tier_like = int(np.asarray(out[-1]["tier_like"]))
    tier_beam = int(np.asarray(out[-1]["tier_beam"]))
    row = {
        "num_particles": n_particles,
        "step_ms": round(dt * 1e3, 3),
        "updates_per_sec": round(1.0 / dt, 1),
        "evals_per_sec": float(n_particles * (like_pts + beam_pts) / dt),
        "tier_like": tier_like,
        "tier_beam": tier_beam,
        "compile_s": round(compile_s, 1),
        "iters": iters,
        "repeats": REPEATS,
        "fetch_overhead_ms": round(t_fetch * 1e3, 2),
        "block_spread_ms_per_step": [
            round((min(blocks) - t_fetch) / iters * 1e3, 3),
            round((max(blocks) - t_fetch) / iters * 1e3, 3)],
        "block_end_tiers": block_tiers,
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    rows = [run_config(n) for n in (64, 512, 16384)]
    out = {
        "note": "fused measurement step, steady state, value-fetch timing "
                "through the axon relay; per-step time = (median of "
                f"{REPEATS} chained blocks - measured relay fetch "
                "overhead) / iters; reference operating point is "
                "64 particles at ~10 Hz (src/parameters.cpp:118)",
        "configs": rows,
    }
    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "SMALL_COUNT.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {os.path.normpath(path)}")


if __name__ == "__main__":
    main()
