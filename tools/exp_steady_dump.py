"""Dump the bench steady-state particle cloud to npz for offline
grouping-scheme design (bin sizes, group counts, box extents)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge

    n = 1 << 20
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        eng, args_cpu = ge._build_engine_and_inputs(
            num_particles=n, cloud_points=4096, seed=0, fast=True)
    args = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)), args_cpu)
    step = jax.jit(eng._measurement_step)

    t0 = time.monotonic()
    out = step(*args)
    _ = float(np.asarray(out[0].prob[0]))
    print(f"compile+first: {time.monotonic()-t0:.0f}s", file=sys.stderr)
    keys = jax.random.split(args[1], 16)
    state = out[0]
    for i in range(7):
        out = step(state, keys[i], *args[2:])
        state = out[0]
    _ = float(np.asarray(state.prob[0]))

    np.savez(
        "/tmp/steady_state.npz",
        pos=np.asarray(state.pos),
        rot=np.asarray(state.rot),
        prob=np.asarray(state.prob),
        scan=np.asarray(args[5]),
        like_num_points=eng.params.likelihood.num_points,
        weights=np.asarray(args[2].weights),
        cell=float(args[2].cell),
        origin=np.asarray(args[2].origin),
        trunc=float(args[2].trunc),
    )
    print("dumped /tmp/steady_state.npz", file=sys.stderr)


if __name__ == "__main__":
    main()
