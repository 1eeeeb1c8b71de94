"""Gaussian likelihood evaluators (reference: include/mcl_3dl/nd.h).

``normal_likelihood`` is the 1-D pdf with the normalization constant
precomputed at trace time (nd.h:45-53); ``NormalLikelihoodNd`` is the
N-D pdf with determinant + inverse covariance precomputed once at
construction (nd.h:67-75) — in the engine these are built on host
(landmark updates, initialpose covariance) so the per-particle eval is a
pure batched quadratic form.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def normal_likelihood(x, sigma):
    """1-D Gaussian pdf N(x; 0, sigma^2) (nd.h:45-53)."""
    sigma = jnp.asarray(sigma)
    a = 1.0 / jnp.sqrt(2.0 * jnp.pi * sigma * sigma)
    return a * jnp.exp(-x * x / (sigma * sigma * 2.0))


class NormalLikelihoodNd:
    """N-D Gaussian pdf with precomputed inverse covariance (nd.h:60-80).

    The inverse/determinant are computed eagerly with numpy at
    construction (host side, once per measurement), matching the
    reference's constructor; ``__call__`` is jit-traceable.
    """

    def __init__(self, sigma):
        sigma = np.asarray(sigma, dtype=np.float64)
        dim = sigma.shape[-1]
        self.a = float(
            1.0 / (np.power(2.0 * np.pi, 0.5 * dim) * np.sqrt(np.linalg.det(sigma)))
        )
        self.sigma_inv = jnp.asarray(np.linalg.inv(sigma), dtype=jnp.float32)

    def __call__(self, x):
        """Evaluate pdf at ``x`` of shape ``[..., dim]``."""
        quad = jnp.einsum("...i,ij,...j->...", x, self.sigma_inv, x)
        return self.a * jnp.exp(-0.5 * quad)
