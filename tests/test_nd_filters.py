"""Gaussian pdf + LPF/HPF tests (mirror test_nd.cpp / test_filter.cpp)."""

import numpy as np
import jax.numpy as jnp

from mcl_3dl_tpu.math import filters as mf
from mcl_3dl_tpu.math.nd import NormalLikelihoodNd, normal_likelihood


def test_normal_likelihood_integrates_to_one():
    # mirror test_nd.cpp:39-80 — numeric integration of the pdf
    for sigma in (0.5, 1.0, 2.0):
        x = np.linspace(-8 * sigma, 8 * sigma, 20001)
        y = np.asarray(normal_likelihood(jnp.asarray(x, jnp.float32), sigma))
        integral = np.trapezoid(y, x)
        assert abs(integral - 1.0) < 1e-3, sigma


def test_normal_likelihood_peak():
    sigma = 0.7
    peak = float(normal_likelihood(jnp.asarray(0.0), sigma))
    assert abs(peak - 1.0 / np.sqrt(2 * np.pi * sigma**2)) < 1e-6


def test_normal_likelihood_nd_matches_1d():
    sigma = 0.9
    nd = NormalLikelihoodNd(np.array([[sigma**2]]))
    for x in (0.0, 0.5, 1.5):
        got = float(nd(jnp.asarray([x], jnp.float32)))
        want = float(normal_likelihood(jnp.asarray(x), sigma))
        assert abs(got - want) < 1e-5


def test_normal_likelihood_nd_6dof():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(6, 6))
    cov = a @ a.T + np.eye(6)
    nd = NormalLikelihoodNd(cov)
    x = rng.normal(size=6).astype(np.float32)
    inv = np.linalg.inv(cov)
    want = (
        1.0 / (np.power(2 * np.pi, 3) * np.sqrt(np.linalg.det(cov)))
    ) * np.exp(-0.5 * x @ inv @ x)
    got = float(nd(jnp.asarray(x)))
    assert abs(got - want) < abs(want) * 1e-3 + 1e-12


def test_lpf_step_response():
    # mirror test_filter.cpp: LPF converges to a constant input
    f = mf.lpf_init(4.0, 0.0)
    out = 0.0
    for _ in range(200):
        f, out = mf.filter_step(f, 1.0)
    assert abs(float(out) - 1.0) < 1e-3


def test_lpf_initial_output():
    f = mf.lpf_init(16.0, 5.0)
    f, out = mf.filter_step(f, 5.0)
    assert abs(float(out) - 5.0) < 1e-4


def test_hpf_rejects_dc():
    f = mf.hpf_init(4.0, 0.0)
    out = 1.0
    for _ in range(200):
        f, out = mf.filter_step(f, 1.0)
    assert abs(float(out)) < 1e-3


def test_angle_wrap():
    # mirror filter.h:85-88 — angle mode must track through the 2pi seam
    f = mf.lpf_init(4.0, jnp.asarray(3.1), angle=True)
    out = None
    for _ in range(300):
        f, out = mf.filter_step(f, jnp.asarray(-3.1))
    # -3.1 is +0.083 rad away from 3.1 across the seam; the filter should
    # settle near +/-pi, not at the naive average 0.
    val = float(out)
    assert abs(abs(val) - np.pi) < 0.1


def test_filter_set():
    f = mf.lpf_init(16.0, 0.0)
    f = mf.filter_set(f, 7.0)
    assert abs(float(f.out) - 7.0) < 1e-6
    f, out = mf.filter_step(f, 7.0)
    assert abs(float(out) - 7.0) < 1e-3


def test_vector_filter_broadcast():
    f = mf.lpf_init(8.0, jnp.zeros(3), angle=jnp.asarray([False, False, True]))
    f, out = mf.filter_step(f, jnp.asarray([1.0, 2.0, 3.0]))
    assert out.shape == (3,)
