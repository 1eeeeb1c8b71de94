"""Component timing for the grouped likelihood path on the chip.

Times (value-fetch chained, see bench.py):
  A. grouped_prepare alone
  B. grouped_prepare + grouped_score (branch forced, no cond)
  C. extract_tables alone (prepare recomputed, kernel skipped)
plus the runtime `fits` value at the stage-2 regime, so we know which
branch the exp_grouped.py stage-2 cond actually took.
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
        from mcl_3dl_tpu.ops import grouped as og
        import mcl_3dl_tpu.math.quat_np as mqn

        rng = np.random.default_rng(7)
        half, grid = 3.0, 0.1
        ys = np.arange(-half, half + grid / 2, grid)
        zs = np.arange(-1.0, 1.0 + grid / 2, grid)
        gy, gz = np.meshgrid(ys, zs, indexing="ij")
        wall = np.stack([np.full(gy.size, 2.0), gy.ravel(), gz.ravel()], 1)
        df_cpu = build_distance_field(wall, 0.1, 0.6, weights=(1.0, 1.0, 0.5))

        n, k = 1 << 20, 96
        scan = wall[:: max(1, len(wall) // k)][:k] + rng.normal(0, 0.02, (k, 3))
        pos = np.array([0.1, -0.05, 0.0]) + rng.normal(0, 0.03, (n, 3))
        rpy = np.stack([
            rng.normal(0, 0.01, n), rng.normal(0, 0.01, n),
            rng.uniform(-0.3, 0.3, n)], 1)
        rot = np.stack([mqn.from_rpy(r) for r in rpy])

    df = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)), df_cpu)
    posd = jnp.asarray(pos.astype(np.float32))
    rotd = jnp.asarray(rot.astype(np.float32))
    scand = jnp.asarray(scan.astype(np.float32))
    valid = jnp.ones(k, bool)
    active = jnp.ones(n, bool)
    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    def timed(name, fn, iters=3):
        t0 = time.monotonic()
        p = fn(posd)
        _ = float(np.asarray(p[0, 0]))
        print(f"{name}: compile+first {time.monotonic()-t0:.1f}s",
              file=sys.stderr)
        t0 = time.monotonic()
        for _ in range(iters):
            p = fn(p)
        _ = float(np.asarray(p[0, 0]))
        dt = (time.monotonic() - t0) / iters
        print(f"{name}: {dt*1e3:.1f} ms", file=sys.stderr)
        return dt

    def prep(p):
        rmat = mq.rotation_matrix(mq.normalize(rotd))
        return og.grouped_prepare(df, p, rotd, rmat, scand, valid, active)

    # fits at this regime
    plan0 = prep(posd)
    print(f"fits at 1M/0.3rad: {bool(plan0.fits)}", file=sys.stderr)

    # A: prepare only (chain through a_min sum)
    @jax.jit
    def step_a(p):
        plan = prep(p)
        return p + (jnp.sum(plan.gp.a_min) * 1e-30)

    timed("A prepare", step_a)

    # B: prepare + score, branch forced
    @jax.jit
    def step_b(p):
        plan = prep(p)
        s, m = og.grouped_score(df, plan, scand, valid,
                                match_dist_min=0.2, match_dist_flat=0.05,
                                match_weight=5.0)
        return p + (s * 1e-30)[:, None]

    timed("B prepare+score", step_b)

    # C: prepare + extract only
    @jax.jit
    def step_c(p):
        plan = prep(p)
        nzp = df.field2d.shape[1]
        tables, z_used = og.extract_tables(
            df.field2d, df.field.shape[1], nzp, plan.lo, valid,
            float(df.trunc))
        return p + (jnp.sum(tables[:, :, 0, 0]) * 1e-30)

    timed("C prepare+extract", step_c)


if __name__ == "__main__":
    main()
