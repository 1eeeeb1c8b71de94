"""Diagnose whether the grouped fast paths engage at bench steady state.

Runs the bench configuration to steady state (cached compile), then
reports particle spread and the `fits` flags both grouped paths would
see, plus per-group box extents.
"""

import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from mcl_3dl_tpu.math import quat as mq
    from mcl_3dl_tpu.ops import grouped as og

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
    keys = jax.random.split(args[1], 10)
    state = out[0]
    for i in range(7):
        out = step(state, keys[i], *args[2:])
        state = out[0]
    _ = float(np.asarray(state.prob[0]))

    pos = np.asarray(state.pos)
    rot = np.asarray(state.rot)
    yaw = np.arctan2(2 * (rot[:, 3] * rot[:, 2] + rot[:, 0] * rot[:, 1]),
                     1 - 2 * (rot[:, 1] ** 2 + rot[:, 2] ** 2))
    print(f"pos std {pos.std(0).round(4)}, yaw span "
          f"{(yaw.max()-yaw.min()):.3f} rad, yaw std {yaw.std():.4f}",
          file=sys.stderr)

    df = args[2]
    scan = args[5][: eng.params.likelihood.num_points]  # stand-in points
    posd = jnp.asarray(pos)
    rotd = jnp.asarray(rot)
    rmat = mq.rotation_matrix(mq.normalize(rotd))
    active = jnp.ones((n,), bool)
    gp = og.build_groups(posd, rmat, rotd, df.weights, float(df.cell),
                         df.origin, active)
    lo, fits_kg = og.group_boxes(gp, scan)
    ext_dbg = np.asarray(gp.a_max - gp.a_min)
    print(f"likelihood fits: {bool(jnp.all(fits_kg))} "
          f"({float(jnp.mean(fits_kg.astype(jnp.float32))):.3f} of (k,g))",
          file=sys.stderr)
    print(f"per-group coeff spreads (b cols): "
          f"{ext_dbg[:, 9:].max(0).round(2)}", file=sys.stderr)
    # worst extents
    lo_f, fits2 = og.group_boxes(gp, scan)
    print("done", file=sys.stderr)


if __name__ == "__main__":
    main()
