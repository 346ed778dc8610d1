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

Spectral densities in this library's parametrization
(hypers/metrics.py ARD_L2 gram d = 0.5 |rate o delta|^2):

* SE  (k = var exp(-d)):            omega ~ N(0, diag(rate^2))
* Matern-nu (MAT32 nu=1.5, MAT52 nu=2.5; k evaluates the standard Matern
  at per-dim inverse lengthscale rate/sqrt(2)): omega is multivariate t
  with 2nu degrees of freedom at that scale —
  omega = z sqrt(2nu/u) * rate/sqrt(2), z ~ N(0, I), u ~ chi^2_{2nu}.
* RQ  (k = var (1 + d/alpha)^-alpha): a gamma scale mixture of SE —
  E_{g~Gamma(alpha, alpha)}[exp(-g d)] = (1 + d/alpha)^-alpha, so
  omega = z sqrt(g) * rate with g ~ Gamma(alpha, rate=alpha) per feature.

Every piece is matmul-shaped: features are one (m, d) @ (d, F) matmul,
the update one multi-RHS solve against the training operator — O(n F +
n^2) per draw batch, no factorization, exact in the F -> infinity limit
with O(1/sqrt(F)) feature error.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import random

from ..config import settings

__all__ = ["spectral_rff", "se_spectral_rff", "rff_prior_fn"]


def _frequencies(key, ndim, n_features, rates, nu=None, rq_alpha=None):
    """Spectral frequency draws (see module docstring)."""
    rates = jnp.broadcast_to(jnp.asarray(rates, settings.dtype), (ndim,))
    kz, ku = random.split(key)
    z = random.normal(kz, (n_features, ndim), dtype=settings.dtype)
    if rq_alpha is not None:  # RQ: gamma scale mixture of SE
        alpha = jnp.asarray(rq_alpha, settings.dtype)
        g = random.gamma(ku, alpha, (n_features,),
                         dtype=settings.dtype) / jnp.maximum(alpha, 1e-12)
        return z * jnp.sqrt(jnp.maximum(g, 1e-12))[:, None] * rates[None, :]
    if nu is None:  # SE
        return z * rates[None, :]
    df = jnp.asarray(2.0 * nu, settings.dtype)
    u = 2.0 * random.gamma(ku, df / 2.0, (n_features,),
                           dtype=settings.dtype)  # chi^2_{2nu}
    t_scale = jnp.sqrt(df / jnp.maximum(u, 1e-12))
    inv_len = rates[None, :] / np.asarray(np.sqrt(2.0), settings.floatx)
    return z * t_scale[:, None] * inv_len


def spectral_rff(key, ndim, n_features, rates, var, nu=None, rq_alpha=None):
    """Feature map ``phi(x) -> (len(x), n_features)`` with
    ``phi(x) phi(y)^T -> k(x, y)`` as ``n_features`` grows (Rahimi &
    Recht); ``nu=None`` for SE, 1.5/2.5 for MAT32/MAT52, ``rq_alpha``
    for the rational quadratic."""
    kw, kb = random.split(key)
    w = _frequencies(kw, ndim, n_features, rates, nu=nu, rq_alpha=rq_alpha)
    b = random.uniform(kb, (n_features,), dtype=settings.dtype,
                      maxval=2.0 * np.pi)
    scale = jnp.sqrt(jnp.asarray(2.0 * var / n_features, settings.dtype))

    def phi(x):
        return scale * jnp.cos(
            jnp.matmul(jnp.asarray(x, settings.dtype), w.T,
                       precision=jax.lax.Precision.HIGHEST) + b[None, :])

    return phi


def se_spectral_rff(key, ndim, n_features, rates, var):
    """SE-only alias of :func:`spectral_rff` (explicit-family call sites)."""
    return spectral_rff(key, ndim, n_features, rates, var, nu=None)


def rff_prior_fn(key, ndim, n_features, rates, var, n_paths, nu=None,
                 rq_alpha=None):
    """``prior(x) -> (len(x), n_paths)`` zero-mean GP prior paths from the
    feature expansion (one global function per path — evaluating at the
    training set and at query points gives CONSISTENT joint draws, which
    is what Matheron's update requires)."""
    k_feat, k_theta = random.split(key)
    phi = spectral_rff(k_feat, ndim, n_features, rates, var, nu=nu,
                       rq_alpha=rq_alpha)
    theta = random.normal(k_theta, (n_features, n_paths),
                          dtype=settings.dtype)

    def prior(x):
        return jnp.matmul(phi(x), theta,
                          precision=jax.lax.Precision.HIGHEST)

    return prior
