"""Random Fourier features + pathwise (Matheron) posterior sampling.

The reference draws posterior samples by Cholesky-coloring a full
posterior covariance (reference gaussian.py:75-97) — O(m^3) per query
batch and impossible at training sizes that cannot be factored.  The
TPU-native alternative for large N is PATHWISE sampling (Wilson et al.,
"Efficiently sampling functions from Gaussian process posteriors",
ICML 2020):

    f*(s) = f_prior(s) + K_sX (K + sigma^2 I)^{-1} (y - f_prior(X) - eps)

with the prior path f_prior drawn once globally from a random-Fourier
feature expansion of the stationary kernel (Rahimi & Recht 2007):

    f_prior(x) = sqrt(2 var / F) cos(x W^T + b) theta,
    W ~ spectral density,  b ~ U(0, 2pi),  theta ~ N(0, I_F)

For the SE kernel in this library's parametrization
(k = var * exp(-0.5 |rate o delta|^2), hypers/metrics.py ARD_L2) the
spectral density is exactly N(0, diag(rate^2)).  Every piece is
matmul-shaped: features are one (m, d) @ (d, F) matmul, the update one
multi-RHS CG against the training operator — O(n F + n^2) per draw batch,
no factorization, exact in the F -> infinity limit with O(1/sqrt(F))
feature error.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import random

from ..config import settings

__all__ = ["se_spectral_rff", "rff_prior_fn"]


def se_spectral_rff(key, ndim, n_features, rates, var):
    """Feature map ``phi(x) -> (len(x), n_features)`` for the SE kernel
    ``var * exp(-0.5 |rates o delta|^2)``: frequencies drawn from its
    spectral density N(0, diag(rates^2))."""
    kw, kb = random.split(key)
    rates = jnp.broadcast_to(jnp.asarray(rates, settings.dtype), (ndim,))
    w = random.normal(kw, (n_features, ndim), dtype=settings.dtype) \
        * rates[None, :]
    b = random.uniform(kb, (n_features,), dtype=settings.dtype,
                      maxval=2.0 * np.pi)
    scale = jnp.sqrt(jnp.asarray(2.0 * var / n_features, settings.dtype))

    def phi(x):
        return scale * jnp.cos(
            jnp.matmul(jnp.asarray(x, settings.dtype), w.T,
                       precision=jax.lax.Precision.HIGHEST) + b[None, :])

    return phi


def rff_prior_fn(key, ndim, n_features, rates, var, n_paths):
    """``prior(x) -> (len(x), n_paths)`` zero-mean GP prior paths from the
    SE feature expansion (one global function per path — evaluating at the
    training set and at query points gives CONSISTENT joint draws, which
    is what Matheron's update requires)."""
    k_feat, k_theta = random.split(key)
    phi = se_spectral_rff(k_feat, ndim, n_features, rates, var)
    theta = random.normal(k_theta, (n_features, n_paths),
                          dtype=settings.dtype)

    def prior(x):
        return jnp.matmul(phi(x), theta,
                          precision=jax.lax.Precision.HIGHEST)

    return prior
