"""One-process step-time breakdown at 1M particles on the chip.

Times three variants of the fused measurement step (steady state,
value-fetch timing):
  full        — likelihood(96) + beam(3) + machinery
  no_beam     — likelihood(96) + machinery
  machinery   — likelihood(1 pt) + no beam  (~pure filter machinery)

Batched into one run so the chip is grabbed once (CLAUDE.md).
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_variant(name, eng, args, iters=8, warmup=4):
    import jax
    import jax.numpy as jnp

    step = jax.jit(eng._measurement_step)
    t0 = time.monotonic()
    out = step(*args)
    _ = float(np.asarray(out[0].prob[0]))
    print(f"[{name}] compile+first: {time.monotonic()-t0:.0f}s",
          file=sys.stderr, flush=True)
    keys = jax.random.split(args[1], warmup + iters + 1)
    state = out[0]
    for i in range(warmup):
        out = step(state, keys[i], *args[2:])
        state = out[0]
    _ = float(np.asarray(state.prob[0]))
    t0 = time.monotonic()
    for i in range(iters):
        out = step(state, keys[warmup + i], *args[2:])
        state = out[0]
    _ = float(np.asarray(state.prob[0]))
    dt = (time.monotonic() - t0) / iters
    print(f"[{name}] step: {dt*1e3:.1f} ms", file=sys.stderr, flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge

    n = 1 << 20
    cpu = jax.devices("cpu")[0]

    def build():
        with jax.default_device(cpu):
            eng, args_cpu = ge._build_engine_and_inputs(
                num_particles=n, cloud_points=4096, seed=0, fast=True)
        args = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)), args_cpu)
        return eng, args

    eng, args = build()
    t_full = run_variant("full", eng, args)

    eng, args = build()
    eng.params.use_beam_model = False
    t_nobeam = run_variant("no_beam", eng, args)

    eng, args = build()
    eng.params.use_beam_model = False
    eng.params.likelihood = dataclasses.replace(
        eng.params.likelihood, num_points=1)
    t_mach = run_variant("machinery(1pt)", eng, args)

    print(f"SUMMARY full={t_full*1e3:.0f}ms no_beam={t_nobeam*1e3:.0f}ms "
          f"mach={t_mach*1e3:.0f}ms | beam={((t_full-t_nobeam)*1e3):.0f}ms "
          f"like96={((t_nobeam-t_mach)*1e3):.0f}ms", flush=True)


if __name__ == "__main__":
    main()
