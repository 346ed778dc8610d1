"""Automatic Differentiation Variational Inference over the
unconstrained hyperparameter posterior.

The reference reached ADVI only through its pymc3 sandbox prototype
(reference sandbox/tgp.py:590-609 — ``pm.advi(vars=..., n=20000)``
used to seed Metropolis/NUTS; mean-field only, host-side iteration).
Here it is a first-class TPU-native inference engine: a Gaussian
``q(z) = N(mu, Sigma)`` over the flat unconstrained parameter vector,
fitted by stochastic reparameterized-gradient ascent on the ELBO

    ELBO(mu, L) = E_{eps~N(0,I)} [ logp(mu + L eps) ] + H[q],
    H[q] = sum_i log L_ii + ndim/2 (1 + log 2 pi),

with the WHOLE optimization one jitted ``lax.scan`` (no host
round-trips — the same dispatch-amortization lesson as the ensemble
and NUTS samplers), mean-field (diagonal) or full-rank ``L``.

Where it sits among the samplers: draws come from the fitted
*variational approximation*, not the exact posterior — a Gaussian in
the unconstrained space (which is log-space for positive hypers, so a
log-normal over natural-space amplitudes).  Use it when thousands of
iid posterior-ish draws are needed fast (model averaging, predictive
bands) or as a warm start/mass matrix for NUTS; use NUTS/NeuTra/
ensemble when the posterior's non-Gaussianity itself matters (funnel
tails, multimodality — ADVI will mode-seek and understate variance
there).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax, random

from ..config import settings
from ..utils import DictObj

__all__ = ["fit_advi", "advi_draws"]

_LOG2PI = float(np.log(2.0 * np.pi))


def _unpack(theta, ndim, full_rank):
    """Variational params vector -> (mu, scale_tril)."""
    mu = theta[:ndim]
    log_d = theta[ndim:2 * ndim]
    if full_rank:
        low = theta[2 * ndim:].reshape(ndim, ndim)
        l = jnp.diag(jnp.exp(log_d)) + jnp.tril(low, -1)
    else:
        l = jnp.diag(jnp.exp(log_d))
    return mu, l, log_d


def fit_advi(logp, z0, steps=2000, mc=8, lr=0.02, full_rank=True,
             seed=0, sigma0=0.1):
    """Fit a Gaussian variational approximation to ``exp(logp)``.

    ``logp``: traceable scalar log-density of the flat unconstrained
    vector (the same contract as the NUTS/ensemble samplers).
    ``z0`` (ndim,): initialization for the variational mean — start at
    the MAP; ADVI is mode-seeking, so a good start mostly buys speed.
    ``mc``: Monte-Carlo samples per gradient step (reparameterized).
    ``full_rank``: fit the full covariance Cholesky (default — hyper
    posteriors are few-dimensional, the O(ndim^2) cost is trivial and
    correlated scale/noise hypers are the norm); False = mean-field.

    Returns DictObj(mu (ndim,), scale_tril (ndim, ndim), elbo (steps,)
    smoothed ELBO trace, converged bool — last-decile improvement below
    1e-3 of its scale).  Guard values (-1e30 logps) pass through
    ``nan_to_num``-sanitized gradients, matching the optimizer
    objective's hardening (reference selection.py:24-34 semantics).
    """
    import optax

    z0 = jnp.asarray(np.asarray(z0, settings.floatx).reshape(-1))
    ndim = z0.shape[0]
    log_d0 = jnp.full((ndim,), float(np.log(sigma0)), settings.dtype)
    parts = [z0, log_d0]
    if full_rank:
        parts.append(jnp.zeros(ndim * ndim, settings.dtype))
    theta0 = jnp.concatenate([p.reshape(-1) for p in parts])

    def neg_elbo(theta, key):
        mu, l, log_d = _unpack(theta, ndim, full_rank)
        eps = random.normal(key, (int(mc), ndim), dtype=settings.dtype)
        z = mu[None, :] + jnp.matmul(
            eps, l.T, precision=settings.matmul_precision)
        lp = jax.vmap(logp)(z)
        lp = jnp.nan_to_num(lp, nan=-1e30, neginf=-1e30, posinf=-1e30)
        ent = jnp.sum(log_d) + 0.5 * ndim * (1.0 + _LOG2PI)
        return -(jnp.mean(lp) + ent)

    # decay the step toward 5% of lr (the mc-gradient noise floor
    # otherwise keeps the iterate jittering around the optimum), and
    # Polyak-average the last fifth of the trajectory — the averaged
    # iterate's error is the noise floor divided by sqrt(#averaged)
    schedule = optax.exponential_decay(float(lr), int(steps), 0.05)
    opt = optax.chain(optax.clip_by_global_norm(10.0),
                      optax.adam(schedule))
    tail_start = int(steps) - max(int(steps) // 5, 1)

    def step(carry, xs):
        theta, state, acc, cnt = carry
        i, k = xs
        val, g = jax.value_and_grad(neg_elbo)(theta, k)
        g = jnp.nan_to_num(g, nan=0.0, neginf=0.0, posinf=0.0)
        upd, state = opt.update(g, state, theta)
        theta = optax.apply_updates(theta, upd)
        in_tail = i >= tail_start
        acc = jnp.where(in_tail, acc + theta, acc)
        cnt = cnt + in_tail.astype(cnt.dtype)
        return (theta, state, acc, cnt), -val

    keys = random.split(random.PRNGKey(int(seed)), int(steps))
    (theta, _, acc, cnt), elbo = lax.scan(
        step, (theta0, opt.init(theta0), jnp.zeros_like(theta0),
               jnp.zeros((), settings.dtype)),
        (jnp.arange(int(steps)), keys))
    theta = acc / jnp.maximum(cnt, 1.0)
    mu, l, _ = _unpack(theta, ndim, full_rank)
    elbo = np.asarray(elbo)
    k = max(len(elbo) // 10, 1)
    tail, head = float(np.mean(elbo[-k:])), float(np.mean(elbo[:k]))
    scale = max(abs(tail - head), 1.0)
    prev = float(np.mean(elbo[-2 * k:-k])) if len(elbo) >= 2 * k else head
    converged = bool(tail - prev <= 1e-3 * scale + 1e-6) or (
        tail > prev - 1e-6)
    return DictObj(mu=np.asarray(mu), scale_tril=np.asarray(l),
                   elbo=elbo, converged=converged)


def advi_draws(fit, chains, samples, seed=0):
    """iid draws from the fitted q — (chains, samples, ndim), the
    ensemble/NUTS chain layout so the datatrace machinery applies
    unchanged (every draw is exact from q: zero burn-in, ESS = n)."""
    ndim = fit.mu.shape[0]
    eps = random.normal(random.PRNGKey(int(seed)),
                        (int(chains), int(samples), ndim),
                        dtype=settings.dtype)
    z = jnp.asarray(fit.mu)[None, None, :] + jnp.matmul(
        eps, jnp.asarray(fit.scale_tril).T,
        precision=settings.matmul_precision)
    return np.asarray(z, settings.floatx)
