"""Multi-device sharding tests on the virtual 8-CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcl_3dl_tpu.parallel import make_mesh, shard_state
from mcl_3dl_tpu import pf, state as st


def test_mesh_axes():
    mesh = make_mesh(8)
    assert mesh.axis_names == ("robots", "particles")
    assert mesh.devices.shape == (1, 8)
    mesh2 = make_mesh(8, robots=2)
    assert mesh2.devices.shape == (2, 4)


def test_shard_state_roundtrip():
    mesh = make_mesh(8)
    s = st.init_diagonal(
        jax.random.PRNGKey(0), 1024, 1024,
        jnp.zeros(3), jnp.zeros(3), jnp.ones(6),
    )
    sh = shard_state(s, mesh)
    assert np.allclose(np.asarray(sh.pos), np.asarray(s.pos))
    # sharded reduction matches unsharded
    m1, q1 = pf.expectation(s)
    m2, q2 = pf.expectation(sh)
    assert np.allclose(np.asarray(m1), np.asarray(m2), atol=1e-5)


def test_sharded_resample_matches_single_device():
    mesh = make_mesh(8)
    s = st.init_diagonal(
        jax.random.PRNGKey(1), 512, 512,
        jnp.zeros(3), jnp.zeros(3), jnp.ones(6),
    )
    prob = jax.random.uniform(jax.random.PRNGKey(2), (512,))
    s = s._replace(prob=prob / jnp.sum(prob))
    out1 = pf.resample(s, jax.random.PRNGKey(3), jnp.zeros(6))
    sh = shard_state(s, mesh)
    out2 = jax.jit(pf.resample)(sh, jax.random.PRNGKey(3), jnp.zeros(6))
    assert np.allclose(np.asarray(out1.pos), np.asarray(out2.pos), atol=1e-5)


@pytest.mark.slow
def test_graft_entry_single():
    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    aux = jax.device_get(out[-1])
    assert np.isfinite(aux["e_pos"]).all()


@pytest.mark.slow
def test_graft_entry_multichip():
    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    import __graft_entry__ as ge
    from mcl_3dl_tpu.ops import grouped as og

    before = og.IMPL_OVERRIDE
    ge.dryrun_multichip(8)
    # no leak: a later real-chip entry()/bench in this process must
    # still compile the Mosaic kernels, not the emulation tier
    assert og.IMPL_OVERRIDE == before


@pytest.mark.slow
def test_sharded_measure_models_grouped_tier_per_shard():
    """Under shard_map, each shard must run the pose-grouped Pallas
    tier on its LOCAL particle slice (tier 0), and the sharded scores
    must equal the single-device path's.  2 shards x TILE particles,
    tight tracking spread, small point count (interpret-mode kernels)."""
    from functools import partial

    from jax.sharding import NamedSharding, PartitionSpec as P

    from mcl_3dl_tpu.config import LikelihoodParams, Params
    from mcl_3dl_tpu.engine import MCL3DL
    from mcl_3dl_tpu.math import quat as mq
    from mcl_3dl_tpu.ops.grouped import TILE

    mesh = make_mesh(2)
    n = 2 * TILE
    rng = np.random.default_rng(3)

    def wall_points(x=2.0, half=3.0, grid=0.1):
        ys = np.arange(-half, half + grid / 2, grid)
        zs = np.arange(-1.0, 1.0 + grid / 2, grid)
        gy, gz = np.meshgrid(ys, zs, indexing="ij")
        return np.stack([np.full(gy.size, x), gy.ravel(), gz.ravel()], 1)

    params = Params(num_particles=n, use_beam_model=True,
                    likelihood=LikelihoodParams(interp="nearest",
                                                num_points=4))
    eng = MCL3DL(params, capacity=n)
    eng.load_map(wall_points())

    pos = jnp.asarray(
        np.array([0.1, -0.05, 0.0]) + rng.normal(0, 0.02, (n, 3)),
        jnp.float32)
    rpy = np.stack([rng.normal(0, 0.01, n), rng.normal(0, 0.01, n),
                    rng.uniform(-0.3, 0.3, n)], 1)
    rot = jnp.asarray(np.stack(
        [np.asarray(mq.from_rpy(jnp.asarray(r))) for r in rpy]), jnp.float32)
    mask = jnp.ones((n,), bool)
    n_active = jnp.asarray(n, jnp.int32)

    kpts = jnp.asarray(wall_points()[::40][:4] + 0.01, jnp.float32)
    kvalid = jnp.ones((kpts.shape[0],), bool)
    blabels = jnp.zeros((kpts.shape[0],), jnp.int32)
    origins = jnp.zeros((1, 3), jnp.float32)
    md = eng.map

    # single-device reference
    ref = eng._measure_models(
        pos, rot, mask, n_active, md.df, md.df_beam, md.occ,
        kpts, kvalid, kpts, blabels, kvalid, origins)
    assert int(ref[3]) == 0 and int(ref[4]) == 0   # grouped engaged

    pp = P("particles")

    def local(pos_l, rot_l, mask_l):
        lik_l, qual_l, lik_b, tl, tb = eng._measure_models(
            pos_l, rot_l, mask_l, n_active, md.df, md.df_beam, md.occ,
            kpts, kvalid, kpts, blabels, kvalid, origins)
        return lik_l, qual_l, lik_b, tl[None], tb[None]

    with mesh:
        sharded = jax.jit(jax.shard_map(
            local, mesh=mesh,
            in_specs=(pp, pp, pp), out_specs=(pp, pp, pp, pp, pp),
            check_vma=False,
        ))
        lik_l, qual_l, lik_b, tl_s, tb_s = sharded(
            jax.device_put(pos, NamedSharding(mesh, pp)),
            jax.device_put(rot, NamedSharding(mesh, pp)),
            jax.device_put(mask, NamedSharding(mesh, pp)),
        )
    # every shard took the grouped Pallas tier for both models
    assert np.asarray(tl_s).max() == 0
    assert np.asarray(tb_s).max() == 0
    np.testing.assert_allclose(np.asarray(lik_l), np.asarray(ref[0]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lik_b), np.asarray(ref[2]),
                               rtol=1e-5, atol=1e-5)
