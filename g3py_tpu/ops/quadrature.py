"""Gauss-Hermite quadrature for warped-process moments.

Reference: ``WarpedGaussianProcess.gauss_hermite``
(``/root/reference/g3py/processes/gaussian.py:162-174``) computes
``E[f(X)]`` for ``X ~ N(mu, sigma^2)`` with an n-point (default 10) Hermite
rule.  Here the rule weights are baked in as constants at trace time and the
evaluation is a single vectorized ``f`` call — XLA fuses it into the
surrounding graph.
"""

import numpy as np
import jax.numpy as jnp

__all__ = ["gauss_hermite", "hermgauss"]


def hermgauss(n, dtype=jnp.float32):
    """Hermite nodes/weights as jnp constants."""
    a, w = np.polynomial.hermite.hermgauss(n)
    return jnp.asarray(a, dtype), jnp.asarray(w, dtype)


def gauss_hermite(f, mu, sigma, n=10):
    """E[f(X)], X ~ N(mu, sigma^2), elementwise over mu/sigma vectors.

    grid[j, i] = mu[i] + sqrt(2)*sigma[i]*a[j];  result = w @ f(grid) / sqrt(pi)

    ``f`` must be vectorized (it is applied to the flattened grid and
    reshaped, exactly like the reference's ``f(grille.flatten())``).
    """
    dtype = jnp.result_type(mu)
    a, w = hermgauss(n, dtype)
    mu = jnp.asarray(mu)
    sigma = jnp.asarray(sigma)
    grid = mu[None, :] + jnp.sqrt(jnp.asarray(2.0, dtype)) * sigma[None, :] * a[:, None]
    vals = f(grid.reshape(-1)).reshape(grid.shape)
    return jnp.dot(w, vals) / jnp.sqrt(jnp.asarray(np.pi, dtype))
