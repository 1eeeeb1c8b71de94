"""Chip timing for the grouped beam kernel vs the sphere-trace march.

Times (value-fetch chained, see bench.py):
  A. beam_measure_grouped (fixed-march Pallas kernel, branch must engage)
  B. beam_measure via raycast_df sphere trace (the XLA fallback)
at 1M particles x 3 beams on the bench-like wall world.
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

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        from mcl_3dl_tpu.map.distance_field import build_distance_field
        from mcl_3dl_tpu.map.occupancy import build_occupancy_grid
        import mcl_3dl_tpu.math.quat_np as mqn

        rng = np.random.default_rng(7)
        half, grid = 3.0, 0.1
        ys = np.arange(-half, half + grid / 2, grid)
        zs = np.arange(-1.0, 1.0 + grid / 2, grid)
        gy, gz = np.meshgrid(ys, zs, indexing="ij")
        wall = np.stack([np.full(gy.size, 2.0), gy.ravel(), gz.ravel()], 1)
        df_cpu = build_distance_field(wall, 0.1, 0.6, weights=(1.0, 1.0, 0.5))
        occ_cpu = build_occupancy_grid(wall, 0.2)

        n = 1 << 20
        ends = np.array([[2.0, 0.3, 0.1], [2.0, -0.8, -0.2], [2.0, 1.4, 0.4]],
                        np.float32)
        origins = np.array([[0.0, 0.0, 0.2]], np.float32)
        origin_idx = np.zeros(3, np.int32)
        pos = np.array([0.1, -0.05, 0.0]) + rng.normal(0, 0.03, (n, 3))
        rpy = np.stack([
            rng.normal(0, 0.01, n), rng.normal(0, 0.01, n),
            rng.uniform(-0.3, 0.3, n)], 1)
        rot = np.stack([mqn.from_rpy(r) for r in rpy])

    df = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)), df_cpu)
    occ = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)), occ_cpu)
    posd = jnp.asarray(pos.astype(np.float32))
    rotd = jnp.asarray(rot.astype(np.float32))
    endsd = jnp.asarray(ends)
    orgd = jnp.asarray(origins)
    oidx = jnp.asarray(origin_idx)
    valid = jnp.ones(3, bool)
    active = jnp.ones(n, bool)
    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    from mcl_3dl_tpu.models.beam import beam_measure, beam_measure_grouped

    grid_min, grid_max, hit_range = 0.1, 0.15, 0.3
    steps_g = int(math.ceil((math.hypot(4.0, 2.0) + hit_range + 1.0)
                            / grid_min)) + 2
    kw = dict(map_grid_min=grid_min, map_grid_max=grid_max,
              hit_range=hit_range, beam_likelihood_min=0.2,
              num_points_default=3, sin_total_ref=0.5)

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

    @jax.jit
    def step_a(p):
        lik = beam_measure_grouped(
            df, p, rotd, endsd, oidx, valid, orgd,
            add_penalty_short_only_mode=False, num_steps=steps_g,
            active=active, fallback=lambda: jnp.full((n,), -1.0), **kw)
        return p + (lik * 1e-30)[:, None]

    lik0 = jax.jit(lambda p: beam_measure_grouped(
        df, p, rotd, endsd, oidx, valid, orgd,
        add_penalty_short_only_mode=False, num_steps=steps_g,
        active=active, fallback=lambda: jnp.full((n,), -1.0), **kw))(posd)
    print(f"grouped engaged: {float(jnp.min(lik0)) >= 0.0} "
          f"(min lik {float(jnp.min(lik0)):.3f})", file=sys.stderr)
    timed("A grouped beam", step_a)

    @jax.jit
    def step_b(p):
        lik, _, _ = beam_measure(
            df, occ, p, rotd, endsd, oidx, valid, orgd,
            use_dda=False, filter_label_max=0xFFFFFFFF,
            add_penalty_short_only_mode=False, num_steps=24,
            early_exit=True, **kw)
        return p + (lik * 1e-30)[:, None]

    timed("B sphere-trace beam", step_b)


if __name__ == "__main__":
    main()
