"""Filter-machinery component timings at 1M particles on the chip.

VERDICT r3 weak #6: ~0.3-0.4 s of the engaged-tier step is filter
machinery (resample, covariance, moments, sampling).  This times each
piece in isolation with chained value-fetch loops (CLAUDE.md: the relay
makes block_until_ready lie) so the attack order is data, not guesses.

Run SOLO on the chip:  python tools/exp_machinery.py [iters]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from mcl_3dl_tpu import pf, state as st
    from mcl_3dl_tpu.math import quat as mq
    from mcl_3dl_tpu.models.samplers import sample_uniform

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n = 1 << 20
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        s0_cpu = st.init_diagonal(
            jax.random.PRNGKey(0), n, n,
            jnp.zeros(3), jnp.zeros(3),
            jnp.asarray([0.05, 0.05, 0.05, 0.01, 0.01, 0.05]),
        )
        prob = jax.random.uniform(jax.random.PRNGKey(1), (n,), jnp.float32)
        s0_cpu = s0_cpu._replace(prob=prob / jnp.sum(prob),
                                 prob_bias=jnp.ones((n,), jnp.float32))
        cloud_cpu = jax.random.uniform(
            jax.random.PRNGKey(2), (4096, 3), jnp.float32, -4.0, 4.0)
    s0 = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)), s0_cpu)
    cloud = jnp.asarray(np.asarray(cloud_cpu))
    keep = jnp.ones((4096,), bool)
    sigma6 = jnp.asarray([0.02] * 3 + [0.005] * 3, jnp.float32)

    def timed(name, loop_fn):
        """loop_fn: (state, key) -> state; chained `iters` times."""
        f = jax.jit(loop_fn)
        keys = jax.random.split(jax.random.PRNGKey(7), iters + 1)
        s = f(s0, keys[0])
        _ = float(np.asarray(s.prob[0]))              # compile + warm
        t0 = time.monotonic()
        for i in range(iters):
            s = f(s, keys[1 + i])
        _ = float(np.asarray(s.prob[0]))
        dt = (time.monotonic() - t0) / iters
        print(f"{name:28s} {dt*1e3:8.2f} ms", flush=True)
        return dt

    def chain(s, v):
        """Value-preserving dependency of the state on ``v``."""
        return s._replace(prob=s.prob + 0.0 * v.reshape(-1)[0])

    timed("noop(chain only)", lambda s, k: chain(s, s.pos))

    timed("measure(weight+entropy)",
          lambda s, k: pf.measure(s, s.prob * 2.0)[0])

    def _bias_expect(s, k):
        lin = jnp.linalg.norm(s.pos, axis=-1)
        pb = jnp.exp(-lin) + 1e-6
        s = pf.bias(s, pb)
        e_pos, e_rot = pf.expectation_biased(s)
        return chain(s, e_pos)

    timed("bias+expectation_biased", _bias_expect)

    def _maxp(s, k):
        m = pf.max_particle(s)
        return chain(s, m["pos"])

    timed("max_particle", _maxp)

    def _cov(s, k):
        c = pf.covariance(s)
        return chain(s, c)

    timed("covariance(+expectation)", _cov)

    timed("resample(full)", lambda s, k: pf.resample(s, k, sigma6))

    def _select_only(s, k):
        idx = pf._systematic_select(
            s.prob, s.active_mask(), s.n_active, s.capacity,
            jnp.float32(1e-7), jnp.sum(s.prob) / s.n_active.astype(jnp.float32))
        return chain(s, idx.astype(jnp.float32))

    timed("resample: select(CDF)", _select_only)

    def _gather_only(s, k):
        idx = jnp.arange(s.capacity, dtype=jnp.int32)[::-1]
        g = pf._gather_states(s, idx)
        return chain(s, g.pos)

    timed("resample: row gather", _gather_only)

    def _noise_only(s, k):
        n6 = jax.random.normal(k, (s.capacity, 6), jnp.float32) * sigma6
        out = st.apply_noise_6dof(s, n6)
        rot = mq.normalize(out.rot)
        return chain(s, rot)

    timed("resample: noise+apply", _noise_only)

    def _redraw(s, k):
        nv = jax.random.normal(k, (s.capacity, 4), jnp.float32)
        return s._replace(noise=nv * 0.1)

    timed("noise redraw [N,4]", _redraw)

    def _sample(s, k):
        pts, ok, idx = sample_uniform(k, cloud, keep, 96)
        return chain(s, pts)

    timed("sample_uniform(4096->96)", _sample)


if __name__ == "__main__":
    main()
