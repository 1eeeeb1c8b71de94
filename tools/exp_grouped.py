"""Chip validation for the yaw-grouped local-table kernel (ops/grouped.py).

Stages (each prints to stderr; run solo on the chip — see CLAUDE.md):

1. Mosaic compile + parity at small N vs the XLA nearest-cell path.
2. 1M-particle isolated likelihood timing: grouped tier vs XLA tier,
   value-fetch chained through iterations (the relay's
   block_until_ready returns early; see bench.py).

Usage:  python tools/exp_grouped.py [--skip-big]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        from mcl_3dl_tpu.map.distance_field import build_distance_field
        from mcl_3dl_tpu.math import quat as mq
        from mcl_3dl_tpu.models.likelihood import likelihood_measure
        from mcl_3dl_tpu.ops import grouped as og

        rng = np.random.default_rng(7)
        half, grid = 3.0, 0.1
        ys = np.arange(-half, half + grid / 2, grid)
        zs = np.arange(-1.0, 1.0 + grid / 2, grid)
        gy, gz = np.meshgrid(ys, zs, indexing="ij")
        wall = np.stack([np.full(gy.size, 2.0), gy.ravel(), gz.ravel()], 1)
        df_cpu = build_distance_field(wall, 0.1, 0.6, weights=(1.0, 1.0, 0.5))

        def mk(n, k, yaw_spread):
            scan = wall[:: max(1, len(wall) // k)][:k] + rng.normal(
                0, 0.02, (k, 3))
            pos = np.array([0.1, -0.05, 0.0]) + rng.normal(0, 0.03, (n, 3))
            rpy = np.stack([
                rng.normal(0, 0.01, n), rng.normal(0, 0.01, n),
                rng.uniform(-yaw_spread, yaw_spread, n)], 1)
            import mcl_3dl_tpu.math.quat_np as mqn
            rot = np.stack([mqn.from_rpy(r) for r in rpy])
            return (pos.astype(np.float32), rot.astype(np.float32),
                    scan.astype(np.float32))

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    df = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)), df_cpu)

    def put(*arrs):
        return tuple(jnp.asarray(np.asarray(a)) for a in arrs)

    # ---- stage 1: compile + parity, N=2048 ----
    pos, rot, scan = mk(2048, 16, 1.0)
    posd, rotd, scand = put(pos, rot, scan)
    valid = jnp.ones(16, bool)
    t0 = time.monotonic()
    lik_g, qual_g = likelihood_measure(
        df, posd, rotd, scand, valid, 0.2, 0.05, 5.0,
        trilinear=False, local_kernel=True)
    lik_g = np.asarray(lik_g)
    print(f"stage1 grouped compile+run: {time.monotonic()-t0:.1f}s",
          file=sys.stderr)
    lik_r = np.asarray(likelihood_measure(
        df, posd, rotd, scand, valid, 0.2, 0.05, 5.0,
        trilinear=False, local_kernel=False)[0])
    err = np.abs(lik_g - lik_r).max()
    print(f"stage1 parity max|diff| = {err:.2e} "
          f"({'OK' if err < 1e-4 else 'FAIL'})", file=sys.stderr)
    # confirm the grouped tier actually fired (fits must be true)
    rmat = mq.rotation_matrix(mq.normalize(rotd))
    active = jnp.ones(2048, bool)
    stats = og.group_stats(posd, rmat, rotd, df.weights, float(df.cell),
                           df.origin, active)
    _, fits_kg = og.group_boxes(stats, scand, df.field.shape)
    fits = bool(jnp.all(fits_kg | ~valid[:, None])
                & (stats.n_over <= og.default_overflow_cap(2048)))
    print(f"stage1 grouped fits: {fits}", file=sys.stderr)

    if "--skip-big" in sys.argv:
        return

    # ---- stage 2: 1M isolated timing, grouped vs XLA ----
    n, k = 1 << 20, 96
    pos, rot, scan = mk(n, k, 0.3)
    posd, rotd, scand = put(pos, rot, scan)
    valid = jnp.ones(k, bool)

    def run(local, iters):
        @jax.jit
        def step(p):
            lik, q = likelihood_measure(
                df, p, rotd, scand, valid, 0.2, 0.05, 5.0,
                trilinear=False, local_kernel=local)
            # chain: next position depends on this score (forces real
            # execution through the relay without changing the regime)
            return p + (lik * 1e-30)[:, None]

        t0 = time.monotonic()
        p = step(posd)
        _ = float(np.asarray(p[0, 0]))
        print(f"  compile+first: {time.monotonic()-t0:.1f}s",
              file=sys.stderr)
        t0 = time.monotonic()
        for _ in range(iters):
            p = step(p)
        _ = float(np.asarray(p[0, 0]))
        dt = (time.monotonic() - t0) / iters
        print(f"  steady: {dt*1e3:.1f} ms/call "
              f"({n*k/dt/1e9:.2f} G lookups/s)", file=sys.stderr)
        return dt

    print("stage2 XLA path (local_kernel=False):", file=sys.stderr)
    dt_x = run(False, 3)
    print("stage2 grouped path (local_kernel=True):", file=sys.stderr)
    dt_g = run(True, 3)
    print(f"stage2 speedup: {dt_x/dt_g:.2f}x", file=sys.stderr)


if __name__ == "__main__":
    main()
