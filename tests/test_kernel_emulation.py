"""Bit-equality of the vectorized CPU emulation tier vs interpret-mode
Pallas for the grouped kernels (ops/grouped.py) and the per-point box
kernel (ops/local_gather.py).

On CPU the framework runs the grouped fast path through
``impl="emulate"`` — a pure-JAX re-statement of the kernel math — so
the virtual-mesh sharding tests and the driver's ``dryrun_multichip``
execute in seconds.  This test pins that substitution: on every slot
the caller reads back (``GroupedLayout.dest`` order for in-envelope
particles), the emulator must reproduce the interpret-mode Pallas
kernel EXACTLY (same f32 op sequence, same accumulation order).
Padding slots may differ only through block-skip words, which are
exact no-ops for in-envelope queries by construction.
"""

import numpy as np
import jax.numpy as jnp

from mcl_3dl_tpu.map.distance_field import build_distance_field
from mcl_3dl_tpu.math import quat as mq
from mcl_3dl_tpu.models.beam import BeamVirtualPoints
from mcl_3dl_tpu.ops import grouped as og
from mcl_3dl_tpu.ops.local_gather import local_score


def _setup(seed=5, K=8):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-3.0, 3.0, (300, 3))
    df = build_distance_field(pts, 0.1, 0.6, weights=(1.0, 1.0, 2.0))
    scan = rng.uniform(-1.5, 1.5, (K, 3)).astype(np.float32)
    N = og.TILE
    pos = jnp.asarray(rng.normal(0, 0.04, (N, 3)), jnp.float32)
    rpy = np.stack([rng.normal(0, 0.02, N), rng.normal(0, 0.02, N),
                    rng.uniform(-0.3, 0.3, N)], axis=1)
    rot = jnp.asarray(
        np.stack([np.asarray(mq.from_rpy(jnp.asarray(r))) for r in rpy]),
        jnp.float32)
    active = jnp.ones((N,), bool)
    rmat = mq.rotation_matrix(mq.normalize(rot))
    stats = og.group_stats(pos, rmat, rot, df.weights, float(df.cell),
                           df.origin, active)
    return rng, df, jnp.asarray(scan), N, pos, rot, stats


def test_grouped_like_emulate_matches_interpret():
    rng, df, scan, N, pos, rot, stats = _setup()
    K = scan.shape[0]
    valid = jnp.asarray(rng.uniform(size=K) < 0.9)
    cap = og.default_overflow_cap(N)
    lo, fits_kg = og.group_boxes(stats, scan, df.field.shape)
    assert bool(jnp.all(fits_kg | ~valid[:, None]))
    layout = og.build_layout(stats, cap)

    ny = df.field.shape[1]
    nzp = df.field2d.shape[1]
    trunc = float(df.trunc)
    tables, z_used = og.extract_tables(df.field2d, ny, nzp, lo, valid, trunc)
    min_d = og.block_min_dist(tables, trunc, lo=lo, z_used=z_used,
                              bands=og.query_bands(stats, scan))
    skipw = og.pack_block_skip(min_d > jnp.float32(0.2))
    kw = dict(match_dist_min=0.2, match_dist_flat=0.05, match_weight=5.0,
              trunc=trunc)
    args = (layout.A, layout.tile_group, og.make_meta(lo, z_used),
            og.points_fp(scan), skipw, tables)
    s_em, m_em = og.grouped_like_score(*args, impl="emulate", **kw)
    s_ip, m_ip = og.grouped_like_score(*args, impl="interpret", **kw)
    dest = np.asarray(layout.dest)
    np.testing.assert_array_equal(np.asarray(s_em)[dest],
                                  np.asarray(s_ip)[dest])
    np.testing.assert_array_equal(np.asarray(m_em)[dest],
                                  np.asarray(m_ip)[dest])
    # non-trivial workload check: some matches actually happened
    assert float(np.asarray(m_ip)[dest].sum()) > 0


def test_grouped_beam_emulate_matches_interpret():
    rng, df, scan, N, pos, rot, stats = _setup(seed=9, K=3)
    B = scan.shape[0]
    valid = jnp.ones((B,), bool)
    labels = jnp.zeros((B,), jnp.int32)
    origins = jnp.zeros((1, 3), jnp.float32)
    grid_min, hit_range = 0.1, 0.3
    num_steps = 20
    vp = BeamVirtualPoints(scan, labels, valid, origins, grid_min,
                           hit_range, num_steps)
    cap = og.default_overflow_cap(N)
    lo, fits_kg = og.group_boxes(stats, vp.vpf, df.field.shape)
    assert bool(jnp.all(fits_kg | ~vp.chainf[:, None]))
    layout = og.build_layout(stats, cap)

    nzp = df.field2d.shape[1]
    trunc = float(df.trunc)
    tables, z_used = og.extract_tables(
        df.field2d, df.field.shape[1], nzp, lo, vp.chainf, trunc)
    radius = float(2.0**0.5) * 0.1 / 2.0
    min_d = og.block_min_dist(tables, trunc, lo=lo, z_used=z_used,
                              bands=og.query_bands(stats, vp.vpf))
    skip = og.pack_block_skip(
        (min_d >= jnp.float32(trunc * 0.99)) & (min_d > jnp.float32(radius)))
    aux = jnp.stack([jnp.round(vp.length * 65536.0).astype(jnp.int32),
                     valid.astype(jnp.int32)], axis=-1)
    kw = dict(nprobe=vp.nprobe, trunc=trunc, grid_min=grid_min,
              radius=radius, hit_range=hit_range, sin_total_ref=0.5,
              long_pen=True, tol=hit_range)
    args = (layout.A, layout.tile_group, og.make_meta(lo, z_used),
            og.points_fp(vp.vpf), aux, skip,
            tables.reshape(B, vp.nprobe, og.G_GROUPS, og.R_ROWS, og.ZW))
    n_em = og.grouped_beam_pen(*args, impl="emulate", **kw)
    n_ip = og.grouped_beam_pen(*args, impl="interpret", **kw)
    dest = np.asarray(layout.dest)
    np.testing.assert_array_equal(np.asarray(n_em)[dest],
                                  np.asarray(n_ip)[dest])


def test_local_score_emulate_matches_interpret():
    rng = np.random.default_rng(3)
    K, R, N = 6, 16, 256
    tables = jnp.asarray(
        rng.uniform(0.0, 0.6, (K, R, 128)).astype(np.float32))
    lidx = jnp.asarray(rng.integers(0, R * 128, (K, N)), jnp.int32)
    kw = dict(match_dist_min=0.2, match_dist_flat=0.05, match_weight=5.0,
              trunc=0.6)
    s_em, m_em = local_score(tables, lidx, impl="emulate", **kw)
    s_ip, m_ip = local_score(tables, lidx, impl="interpret", **kw)
    np.testing.assert_array_equal(np.asarray(s_em), np.asarray(s_ip))
    np.testing.assert_array_equal(np.asarray(m_em), np.asarray(m_ip))
    assert float(np.asarray(m_ip).sum()) > 0
