"""Multi-device sharding tests on the virtual 8-CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

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


def test_graft_entry_single():
    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    aux = jax.device_get(out[-1])
    assert np.isfinite(aux["e_pos"]).all()


def test_graft_entry_multichip():
    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
