"""Component timing for the grouped likelihood path on the chip.

Times (value-fetch chained, see bench.py):
  A. group_stats + group_boxes alone (the always-paid phase)
  B. full engaged path: layout + tables + kernel + overflow rescore
  C. stats + boxes + layout + extract_tables (kernel skipped)
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

    cap = og.default_overflow_cap(n)

    def prep(p):
        rmat = mq.rotation_matrix(mq.normalize(rotd))
        stats = og.group_stats(p, rmat, rotd, df.weights, float(df.cell),
                               df.origin, active)
        lo, fits_kg = og.group_boxes(stats, scand, df.field.shape)
        fits = (jnp.all(fits_kg | ~valid[:, None])
                & (stats.n_over <= cap))
        return stats, lo, fits

    # fits at this regime
    _, _, fits0 = prep(posd)
    print(f"fits at 1M/0.3rad: {bool(fits0)}", file=sys.stderr)

    # A: stats + boxes only (the always-paid phase)
    @jax.jit
    def step_a(p):
        stats, lo, fits = prep(p)
        return p + (jnp.sum(stats.a_min) * 1e-30)

    timed("A stats+boxes", step_a)

    # B: full engaged path — layout + tables + kernel + overflow rescore
    @jax.jit
    def step_b(p):
        from mcl_3dl_tpu.models.likelihood import grouped_like_apply
        stats, lo, fits = prep(p)
        layout = og.build_layout(stats, cap)
        s, m = grouped_like_apply(
            df, stats, layout, lo, scand, valid,
            match_dist_min=0.2, match_dist_flat=0.05, match_weight=5.0)
        return p + (s * 1e-30)[:, None]

    timed("B full engaged path", step_b)

    # C: stats + boxes + layout + extract (kernel skipped)
    @jax.jit
    def step_c(p):
        stats, lo, fits = prep(p)
        layout = og.build_layout(stats, cap)
        nzp = df.field2d.shape[1]
        tables, z_used = og.extract_tables(
            df.field2d, df.field.shape[1], nzp, lo, valid,
            float(df.trunc))
        return p + ((jnp.sum(tables[:, :, 0, 0])
                     + jnp.sum(layout.tile_group)) * 1e-30)

    timed("C +layout+extract", step_c)


if __name__ == "__main__":
    main()
