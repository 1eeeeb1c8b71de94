"""Particle-filter core tests (mirrors reference test/src/test_pf.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np

from mcl_3dl_tpu import pf
from mcl_3dl_tpu import state as st
from mcl_3dl_tpu.math import quat as mq
from mcl_3dl_tpu.math.nd import normal_likelihood


def make_state(key, n, cap=None, mean_x=0.0, sigma_x=1.0):
    return st.init_diagonal(
        key, cap or n, n,
        jnp.asarray([mean_x, 0.0, 0.0]),
        jnp.zeros(3),
        jnp.asarray([sigma_x, 0.0, 0.0, 0.0, 0.0, 0.0]),
    )


def test_init_statistics():
    s = make_state(jax.random.PRNGKey(0), 4096, mean_x=3.0, sigma_x=0.5)
    x = np.asarray(s.pos[:, 0])
    assert abs(x.mean() - 3.0) < 0.05
    assert abs(x.std() - 0.5) < 0.05
    assert np.allclose(np.asarray(s.prob), 1.0 / 4096)


def test_bayes_posterior_matches_gaussian_product():
    # mirror test_pf.cpp:78-148 — measuring a Gaussian likelihood over a
    # Gaussian prior gives the analytic product posterior
    m0, s0 = 0.0, 1.0
    m1, s1 = 1.0, 0.7
    s = make_state(jax.random.PRNGKey(1), 1 << 15, mean_x=m0, sigma_x=s0)
    lik = normal_likelihood(s.pos[:, 0] - m1, s1)
    s2, _ = pf.measure(s, lik)

    var_post = 1.0 / (1.0 / s0**2 + 1.0 / s1**2)
    mean_post = var_post * (m0 / s0**2 + m1 / s1**2)
    x = np.asarray(s2.pos[:, 0])
    w = np.asarray(s2.prob)
    got_mean = np.sum(x * w)
    got_var = np.sum(w * (x - got_mean) ** 2)
    assert abs(got_mean - mean_post) < 0.02
    assert abs(got_var - var_post) < 0.02


def test_measure_normalizes_and_entropy():
    n = 10
    s = make_state(jax.random.PRNGKey(2), n)
    s2, entropy = pf.measure(s, jnp.ones(n))
    assert abs(float(jnp.sum(s2.prob)) - 1.0) < 1e-6
    # uniform weights: entropy == ln(n)  (test_pf.cpp:330-391)
    assert abs(float(entropy) - np.log(n)) < 1e-5
    assert abs(float(pf.entropy(s2)) - np.log(n)) < 1e-5


def test_measure_zero_likelihood_rollback():
    # pf.h:274-278 — all-zero weights restore the previous particle set
    n = 16
    s = make_state(jax.random.PRNGKey(3), n)
    s_prob_before = np.asarray(s.prob)
    s2, _ = pf.measure(s, jnp.zeros(n))
    assert np.allclose(np.asarray(s2.prob), s_prob_before)
    assert np.allclose(np.asarray(s2.pos), np.asarray(s.pos))


def test_flat_resample_is_identity():
    # test_pf.cpp:190-208 — resampling with uniform weights and zero
    # noise must reproduce the same particle set
    n = 64
    s = make_state(jax.random.PRNGKey(4), n)
    s = pf.uniform_weights(s)
    s2 = pf.resample(s, jax.random.PRNGKey(5), jnp.zeros(6))
    assert np.allclose(np.asarray(s2.pos), np.asarray(s.pos), atol=1e-6)
    assert np.allclose(
        np.asarray(mq.normalize(s2.rot)), np.asarray(mq.normalize(s.rot)),
        atol=1e-6,
    )


def test_resample_concentrates_on_heavy_particle():
    n = 64
    s = make_state(jax.random.PRNGKey(6), n)
    prob = np.full(n, 1e-9, np.float32)
    prob[17] = 1.0
    s = s._replace(prob=jnp.asarray(prob))
    s2 = pf.resample(s, jax.random.PRNGKey(7), jnp.zeros(6))
    want = np.asarray(s.pos[17])
    assert np.allclose(np.asarray(s2.pos), want[None, :], atol=1e-5)
    assert np.allclose(np.asarray(s2.prob), 1.0 / n)


def test_resample_duplicate_jitter():
    # pf.h:214-218 — only duplicated draws receive noise
    n = 64
    s = make_state(jax.random.PRNGKey(8), n)
    prob = np.full(n, 1e-9, np.float32)
    prob[5] = 1.0
    s = s._replace(prob=jnp.asarray(prob))
    sigma = jnp.asarray([0.1, 0.1, 0.1, 0.0, 0.0, 0.0])
    s2 = pf.resample(s, jax.random.PRNGKey(9), sigma)
    x = np.asarray(s2.pos)
    # all draws come from particle 5 and all but at most one are
    # consecutive duplicates -> jittered
    spread = x.std(axis=0)
    assert (spread[:3] > 0.01).all()
    assert np.allclose(x.mean(axis=0), np.asarray(s.pos[5]), atol=0.1)


def test_expectation_weighted_mean():
    n = 4
    s = st.zeros(n)
    pos = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0], [3, 0, 0]], np.float32)
    prob = np.array([0.1, 0.2, 0.3, 0.4], np.float32)
    s = s._replace(pos=jnp.asarray(pos), prob=jnp.asarray(prob))
    mean_pos, mean_rot = pf.expectation(s)
    assert abs(float(mean_pos[0]) - 2.0) < 1e-6
    assert np.allclose(np.asarray(mean_rot), [0, 0, 0, 1], atol=1e-6)


def test_expectation_quaternion_mean_yaw():
    # front/up averaging (state_6dof.h:316-355): mean of yaws +a, -a is 0
    n = 2
    s = st.zeros(n)
    rots = mq.from_rpy(jnp.asarray([[0, 0, 0.5], [0, 0, -0.5]], jnp.float32))
    s = s._replace(rot=rots, prob=jnp.asarray([0.5, 0.5], jnp.float32))
    _, mean_rot = pf.expectation(s)
    rpy = np.asarray(mq.to_rpy(mean_rot))
    assert np.allclose(rpy, 0.0, atol=1e-6)


def test_max_particle():
    n = 8
    s = make_state(jax.random.PRNGKey(10), n)
    prob = np.linspace(0.1, 1.0, n).astype(np.float32)
    s = s._replace(prob=jnp.asarray(prob))
    m = pf.max_particle(s)
    assert np.allclose(np.asarray(m["pos"]), np.asarray(s.pos[n - 1]))
    # biased flips the order
    bias = np.linspace(1.0, 0.01, n).astype(np.float32)
    s = s._replace(prob_bias=jnp.asarray(bias))
    mb = pf.max_biased(s)
    w = prob * bias
    assert np.allclose(np.asarray(mb["pos"]), np.asarray(s.pos[int(w.argmax())]))


def test_covariance_matches_numpy():
    n = 1 << 14
    s = st.init_diagonal(
        jax.random.PRNGKey(11), n, n,
        jnp.zeros(3), jnp.zeros(3),
        jnp.asarray([0.5, 0.3, 0.2, 0.05, 0.04, 0.1]),
    )
    s = pf.uniform_weights(s)
    cov = np.asarray(pf.covariance(s))
    want = np.diag([0.5**2, 0.3**2, 0.2**2, 0.05**2, 0.04**2, 0.1**2])
    assert np.allclose(cov, want, atol=0.01)


def test_resize_invariants():
    # test_pf.cpp:150-188 — growing/shrinking keeps the distribution
    n = 1024
    s = make_state(jax.random.PRNGKey(12), n, cap=4096, mean_x=2.0, sigma_x=1.0)
    up = pf.resize(s, 4096)
    assert int(up.n_active) == 4096
    assert abs(float(jnp.sum(up.prob)) - 1.0) < 1e-4
    x = np.asarray(up.pos[:4096, 0])
    assert abs(x.mean() - 2.0) < 0.1
    assert abs(x.std() - 1.0) < 0.1

    down = pf.resize(up, 256)
    assert int(down.n_active) == 256
    mask = np.asarray(down.active_mask())
    x = np.asarray(down.pos[:, 0])[mask]
    assert abs(x.mean() - 2.0) < 0.15
    assert abs(x.std() - 1.0) < 0.15


def test_add_noise_spreads():
    n = 512
    s = make_state(jax.random.PRNGKey(13), n, sigma_x=0.0)
    s2 = pf.add_noise(s, jax.random.PRNGKey(14), jnp.asarray([0.3, 0, 0, 0, 0, 0]))
    x = np.asarray(s2.pos[:, 0])
    assert abs(x.std() - 0.3) < 0.05
    # noise also integrates into odom_err_lin (state_6dof.h:238)
    assert np.allclose(np.asarray(s2.odom_err_lin[:, 0]) - np.asarray(
        s.odom_err_lin[:, 0]), x - np.asarray(s.pos[:, 0]), atol=1e-6)


def test_masked_inactive_particles_ignored():
    cap, n = 64, 40
    s = make_state(jax.random.PRNGKey(15), n, cap=cap, mean_x=1.0, sigma_x=0.1)
    # poison inactive slots
    pos = np.array(s.pos)
    pos[n:] = 1e6
    s = s._replace(pos=jnp.asarray(pos))
    mean_pos, _ = pf.expectation(s)
    assert abs(float(mean_pos[0]) - 1.0) < 0.1
    cov = np.asarray(pf.covariance(s))
    assert cov[0, 0] < 1.0
    s2 = pf.resample(s, jax.random.PRNGKey(16), jnp.zeros(6))
    mask = np.asarray(s2.active_mask())
    assert (np.asarray(s2.pos)[mask, 0] < 100).all()


def test_expectation_pass_ratio():
    """pf.h:280-293: descending-probability accumulation stops AFTER the
    particle that crosses pass_ratio (it is included in the mean)."""
    n = 4
    s = st.zeros(n)
    pos = np.zeros((n, 3), np.float32)
    pos[:, 0] = [10.0, 1.0, 2.0, 100.0]          # scrambled order
    prob = np.array([0.1, 0.4, 0.3, 0.2], np.float32)
    s = s._replace(pos=jnp.asarray(pos), prob=jnp.asarray(prob))
    # descending: p=.4 (x=1), p=.3 (x=2), p=.2 (x=100), p=.1 (x=10)
    # ratio 0.6: add .4 (tot .4), add .3 (tot .7 > .6, break) -> {1, 2}
    mean_pos, _ = pf.expectation(s, pass_ratio=0.6)
    want = (0.4 * 1.0 + 0.3 * 2.0) / 0.7
    assert abs(float(mean_pos[0]) - want) < 1e-5
    # ratio 1.0 (default): plain weighted mean over all
    mean_all, _ = pf.expectation(s)
    want_all = 0.4 * 1.0 + 0.3 * 2.0 + 0.2 * 100.0 + 0.1 * 10.0
    assert abs(float(mean_all[0]) - want_all) < 1e-4
    # ratio just below the first particle's weight: top particle only
    mean_top, _ = pf.expectation(s, pass_ratio=0.3)
    assert abs(float(mean_top[0]) - 1.0) < 1e-5
