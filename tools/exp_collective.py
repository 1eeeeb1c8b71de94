#!/usr/bin/env python
"""Bound the shard_map/GSPMD machinery cost in the multi-chip
projection (VERDICT r4 §6): on ONE chip, time the plain jit fused step
vs ``sharded_filter_step`` on a 1-device mesh at 1M particles.

The 10 Hz @ v5e-16 projection divides the single-chip step time by the
chip count; the quotient assumes the shard_map interior + collective
boundary machinery is free.  The 1-device sharded step runs the exact
multi-chip program (shard_map measurement interior, GSPMD-inserted
reduction boundary) with zero physical communication, so

    overhead_ms = sharded_1dev_step_ms - plain_step_ms

isolates the machinery cost; real ICI transfer time at 16 chips comes
on top (sub-ms for the [N/16] boundary reductions at 1M).

Run SOLO on the chip.  Writes docs/COLLECTIVE_1DEV.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def time_chained(step, state, keys, rest, iters):
    """Value-fetch chained timing (relay-safe, see bench.py)."""
    out = step(state, keys[0], *rest)
    st = out[0]
    _ = float(np.asarray(st.prob[0]))          # warm
    t0 = time.monotonic()
    for i in range(iters):
        out = step(st, keys[1 + i], *rest)
        st = out[0]
    _ = float(np.asarray(st.prob[0]))
    return (time.monotonic() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from mcl_3dl_tpu.parallel import (make_mesh, shard_state,
                                      sharded_filter_step)

    n = 1 << 20
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        eng, args_cpu = ge._build_engine_and_inputs(
            num_particles=n, cloud_points=4096, seed=0, fast=True)
    args = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)), args_cpu)
    keys = jax.random.split(args[1], 40)
    iters = 10

    # steady state first (same warmup as bench.py)
    step = jax.jit(eng._measurement_step)
    out = step(*args)
    st = out[0]
    _ = float(np.asarray(st.prob[0]))
    for i in range(6):
        out = step(st, keys[20 + i], *args[2:])
        st = out[0]
    _ = float(np.asarray(st.prob[0]))

    dt_plain = time_chained(step, st, keys, args[2:], iters)
    print(f"plain jit step: {dt_plain*1e3:.1f} ms", file=sys.stderr)
    tier = (int(np.asarray(out[-1]["tier_like"])),
            int(np.asarray(out[-1]["tier_beam"])))

    mesh = make_mesh(1)
    step_s = sharded_filter_step(eng, mesh)
    st_sh = shard_state(st, mesh)
    dt_sh = time_chained(step_s, st_sh, keys, args[2:], iters)
    print(f"sharded 1-device step: {dt_sh*1e3:.1f} ms", file=sys.stderr)

    out = {
        "particles": n,
        "iters": iters,
        "plain_step_ms": round(dt_plain * 1e3, 1),
        "sharded_1dev_step_ms": round(dt_sh * 1e3, 1),
        "machinery_overhead_ms": round((dt_sh - dt_plain) * 1e3, 1),
        "tiers_plain": tier,
        "note": ("1-device mesh runs the exact multi-chip program "
                 "(shard_map interior + GSPMD reduction boundary) with "
                 "zero physical communication; the difference bounds "
                 "the machinery cost the 16-chip projection assumes "
                 "is free."),
    }
    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "COLLECTIVE_1DEV.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
