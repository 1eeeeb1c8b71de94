#!/usr/bin/env python
"""Raycast micro-benchmark — port of test/src/performance_raycast.cpp.

Builds a 2M-point synthetic wall world, then times:
  * map compile (distance field + occupancy build) across DF cell sizes
  * batched raycasts (kd-tree-style DF march and DDA-style occupancy
    march) over ~7.6k rays, on whatever device JAX selects.

Prints a table of seconds, like the reference harness (no stored
baselines, not asserted).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def make_world(n_target=2_000_000):
    """Walls world: dense vertical planes (performance_raycast.cpp:52-84)."""
    rng = np.random.default_rng(0)
    pts = []
    n_walls = 40
    per_wall = n_target // n_walls
    for i in range(n_walls):
        x = -40.0 + 2.0 * i
        y = rng.uniform(-50, 50, per_wall)
        z = rng.uniform(0, 3, per_wall)
        pts.append(np.stack([np.full(per_wall, x), y, z], axis=1))
    return np.concatenate(pts, axis=0)


def main():
    import jax
    import jax.numpy as jnp

    from mcl_3dl_tpu.map.distance_field import build_distance_field
    from mcl_3dl_tpu.map.occupancy import build_occupancy_grid
    from mcl_3dl_tpu.models.beam import raycast_df, raycast_occ

    world = make_world()
    print(f"world: {len(world)} points")

    n_rays = 7600
    rng = np.random.default_rng(1)
    begins = np.stack([
        rng.uniform(-35, 35, n_rays), rng.uniform(-45, 45, n_rays),
        np.full(n_rays, 1.0),
    ], axis=1).astype(np.float32)
    az = rng.uniform(-np.pi, np.pi, n_rays)
    ends = begins + np.stack(
        [4.0 * np.cos(az), 4.0 * np.sin(az), np.zeros(n_rays)], axis=1
    ).astype(np.float32)

    for cell in (0.2, 0.4):
        t0 = time.monotonic()
        df = build_distance_field(world, cell, 0.6)
        build_s = time.monotonic() - t0
        b, e = jnp.asarray(begins), jnp.asarray(ends)
        fn = jax.jit(lambda b, e: raycast_df(df, b, e, cell, cell, 0.3, 32))
        out = fn(b, e)
        jax.block_until_ready(out)          # compile
        t0 = time.monotonic()
        for _ in range(10):
            out = fn(b, e)
        jax.block_until_ready(out)
        cast_s = (time.monotonic() - t0) / 10
        print(f"DF cell={cell:.1f}: build {build_s:7.2f}s  "
              f"{n_rays} casts {cast_s*1e3:8.2f} ms "
              f"({n_rays/cast_s:,.0f} rays/s)  field={df.shape}")

    for grid in (0.2, 0.5):
        t0 = time.monotonic()
        occ = build_occupancy_grid(world, grid)
        build_s = time.monotonic() - t0
        b, e = jnp.asarray(begins), jnp.asarray(ends)
        fn = jax.jit(
            lambda b, e: raycast_occ(occ, b, e, 0.3, 0xFFFFFFFF, 48)
        )
        out = fn(b, e)
        jax.block_until_ready(out)
        t0 = time.monotonic()
        for _ in range(10):
            out = fn(b, e)
        jax.block_until_ready(out)
        cast_s = (time.monotonic() - t0) / 10
        print(f"DDA grid={grid:.1f}: build {build_s:6.2f}s  "
              f"{n_rays} casts {cast_s*1e3:8.2f} ms "
              f"({n_rays/cast_s:,.0f} rays/s)  grid={occ.shape}")


if __name__ == "__main__":
    main()
