"""Neural-transport (NeuTra) reparameterization for NUTS.

The warped-GP hyperparameter posteriors that this framework samples have
funnel-like curvature (noise/lengthscale vs amplitude ridges).  A dense mass
matrix — ``nuts_sampler(adapt_mass='dense')`` — removes the *linear*
correlation but an affine metric cannot straighten the funnel itself, and
divergences remain (measured: 105 -> 51 on the WGP bench workload, see
docs/samplers.md).  The reference had no answer at all: its only sampler was
gradient-free emcee (``/root/reference/g3py/bayesian/average.py:20-54``),
which sidesteps the funnel by never leapfrogging through it.

This module is the TPU-native cure (Hoffman et al. 2019, "NeuTra-lizing Bad
Geometry in Hamiltonian Monte Carlo Using Neural Transport"), adapted to
this framework's strengths: the affine-invariant ensemble sampler is *fast*
here (hundreds of effective samples/sec on-device), so instead of fitting
the flow to a variational bound we fit it by maximum likelihood on cheap
ensemble-warmup draws, then run the existing NUTS in the flow's latent
space:

    theta = f(z) = mean + L @ couplings(z)        (one whitening layer,
                                                   K affine couplings)
    logp_tilde(z) = logp(f(z)) + log|det df/dz|

* The whitening layer (sample mean + covariance Cholesky of the warmup
  draws) is *fixed*, not trained — it is the dense_e metric, so the
  couplings only have to model the residual nonlinearity.
* Couplings are RealNVP-style affine half-masks with small tanh MLPs whose
  last layers initialize to zero => the flow starts as exactly the
  whitening transport and training can only improve it.
* Everything (fit loop included) is jax under jit; the fit is a
  ``lax.scan`` of full-batch adam steps.

Entry points: :func:`fit_flow` (draws -> flow params),
:func:`neutra_logp` (pullback density), :func:`neutra_nuts` (ensemble
warmup -> fit -> NUTS in latent space -> chain mapped back), and the
model-level ``sample_hypers(method='neutra')``.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax, random

from ..config import settings

__all__ = ["fit_flow", "flow_forward", "flow_inverse", "neutra_logp",
           "neutra_nuts"]

_S_MAX = 4.0  # tanh bound on coupling log-scales (numerical safety)


# ---------------------------------------------------------------------------
# flow definition
# ---------------------------------------------------------------------------


def _make_masks(ndim, n_couplings):
    """Alternating even/odd binary masks, one per coupling layer."""
    if n_couplings == 0:
        return np.zeros((0, ndim), np.float32)
    base = (np.arange(ndim) % 2).astype(np.float32)
    return np.stack([base if k % 2 == 0 else 1.0 - base
                     for k in range(n_couplings)])


def _init_coupling(key, ndim, hidden, dtype):
    """One coupling MLP: ndim -> hidden (tanh) -> 2*ndim (scale||shift).
    The output layer is zero-initialized so the coupling starts as the
    identity map."""
    k1, _ = random.split(key)
    w1 = random.normal(k1, (ndim, hidden), dtype) / np.sqrt(ndim)
    b1 = jnp.zeros((hidden,), dtype)
    w2 = jnp.zeros((hidden, 2 * ndim), dtype)
    b2 = jnp.zeros((2 * ndim,), dtype)
    return {"w1": w1, "b1": b1, "w2": w2, "b2": b2}


def _coupling_st(layer, h_masked):
    """Scale/shift nets evaluated on the masked (pass-through) coordinates."""
    hdn = jnp.tanh(h_masked @ layer["w1"] + layer["b1"])
    out = hdn @ layer["w2"] + layer["b2"]
    ndim = out.shape[-1] // 2
    s = _S_MAX * jnp.tanh(out[..., :ndim] / _S_MAX)
    t = out[..., ndim:]
    return s, t


def init_flow(ndim, draws=None, n_couplings=4, hidden=32, key=None,
              dtype=None):
    """Build flow params.  ``draws`` (m, ndim) fixes the whitening layer at
    their sample mean/covariance (regularized Cholesky); without draws the
    whitening layer is the identity."""
    dtype = dtype or settings.dtype
    if key is None or isinstance(key, int):
        key = random.PRNGKey(0 if key is None else key)
    if draws is not None:
        draws = jnp.asarray(draws, dtype)
        mean = jnp.mean(draws, axis=0)
        centered = draws - mean
        cov = (centered.T @ centered) / jnp.maximum(draws.shape[0] - 1, 1)
        reg = 1e-6 * (jnp.trace(cov) / ndim + 1e-12)
        chol = jnp.linalg.cholesky(cov + reg * jnp.eye(ndim, dtype=dtype))
        # non-finite (degenerate draws) -> fall back to diagonal scales
        diag_l = jnp.sqrt(jnp.maximum(jnp.diagonal(cov), 1e-12))
        chol = jnp.where(jnp.all(jnp.isfinite(chol)), chol, jnp.diag(diag_l))
    else:
        mean = jnp.zeros((ndim,), dtype)
        chol = jnp.eye(ndim, dtype=dtype)
    keys = random.split(key, max(n_couplings, 1))
    layers = [_init_coupling(keys[k], ndim, hidden, dtype)
              for k in range(n_couplings)]
    masks = jnp.asarray(_make_masks(ndim, n_couplings), dtype)
    return {"mean": mean, "chol": chol, "masks": masks, "layers": layers}


def flow_forward(params, z):
    """z (latent) -> (theta, log|det df/dz|).  Couplings first, whitening
    last."""
    h = z
    logdet = jnp.zeros(z.shape[:-1], z.dtype)
    for layer, mask in zip(params["layers"], params["masks"]):
        s, t = _coupling_st(layer, h * mask)
        keep = 1.0 - mask
        h = mask * h + keep * (h * jnp.exp(s) + t)
        logdet = logdet + jnp.sum(keep * s, axis=-1)
    theta = params["mean"] + h @ params["chol"].T
    logdet = logdet + jnp.sum(jnp.log(jnp.diagonal(params["chol"])))
    return theta, logdet


def flow_inverse(params, theta):
    """theta -> (z, log|det dz/dtheta|) (exact inverse of
    :func:`flow_forward`)."""
    centered = theta - params["mean"]
    h = jnp.moveaxis(
        jax.scipy.linalg.solve_triangular(
            params["chol"], jnp.moveaxis(centered, -1, 0), lower=True),
        0, -1)
    logdet = -jnp.sum(jnp.log(jnp.diagonal(params["chol"])))
    logdet = jnp.broadcast_to(logdet, theta.shape[:-1]).astype(theta.dtype)
    for layer, mask in zip(reversed(params["layers"]),
                           reversed(list(params["masks"]))):
        s, t = _coupling_st(layer, h * mask)
        keep = 1.0 - mask
        h = mask * h + keep * ((h - t) * jnp.exp(-s))
        logdet = logdet - jnp.sum(keep * s, axis=-1)
    return h, logdet


# ---------------------------------------------------------------------------
# maximum-likelihood fit on warmup draws
# ---------------------------------------------------------------------------


def _nll(params, draws):
    """Mean negative log-likelihood of draws under push-forward of N(0, I):
    -log q(theta) = 0.5||z||^2 + 0.5 d log 2pi - log|det dz/dtheta|."""
    z, logdet_inv = flow_inverse(params, draws)
    d = draws.shape[-1]
    return jnp.mean(0.5 * jnp.sum(z * z, axis=-1) - logdet_inv) \
        + 0.5 * d * jnp.log(2.0 * jnp.pi)


@partial(jax.jit, static_argnames=("steps",))
def _fit_scan(params, draws, steps, lr):
    """Full-batch adam on the coupling layers (whitening stays fixed)."""
    layers0 = params["layers"]
    frozen = {k: params[k] for k in ("mean", "chol", "masks")}

    def loss_fn(layers):
        return _nll({**frozen, "layers": layers}, draws)

    grad_fn = jax.value_and_grad(loss_fn)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, layers0)
    b1, b2, eps = 0.9, 0.999, 1e-8

    def step(carry, i):
        layers, m, v = carry
        loss, g = grad_fn(layers)
        m = jax.tree_util.tree_map(lambda a, b: b1 * a + (1 - b1) * b, m, g)
        v = jax.tree_util.tree_map(lambda a, b: b2 * a + (1 - b2) * b * b,
                                   v, g)
        t = i.astype(draws.dtype) + 1.0
        mhat = jax.tree_util.tree_map(lambda a: a / (1 - b1**t), m)
        vhat = jax.tree_util.tree_map(lambda a: a / (1 - b2**t), v)
        layers = jax.tree_util.tree_map(
            lambda p, mh, vh: p - lr * mh / (jnp.sqrt(vh) + eps),
            layers, mhat, vhat)
        return (layers, m, v), loss

    (layers, _, _), losses = lax.scan(step, (layers0, zeros, zeros),
                                      jnp.arange(steps))
    return {**frozen, "layers": layers}, losses


def fit_flow(draws, n_couplings=4, hidden=32, steps=1000, lr=1e-2, key=None):
    """Fit the transport to posterior draws by maximum likelihood.

    Args:
      draws: (m, ndim) posterior samples (e.g. flattened ensemble warmup).
      n_couplings/hidden: flow capacity (defaults handle ~10-30 dim GP
        hyper posteriors; n_couplings=0 reduces to the whitening transport,
        i.e. exactly dense_e).
      steps/lr: full-batch adam schedule.

    Returns (flow_params, losses): fitted params and the per-step NLL
    trace (monitor convergence; a flat tail means capacity or steps are
    not the bottleneck).
    """
    draws = jnp.asarray(draws, settings.dtype)
    ndim = draws.shape[-1]
    params = init_flow(ndim, draws=draws, n_couplings=n_couplings,
                       hidden=hidden, key=key)
    if n_couplings == 0 or steps == 0:
        return params, np.zeros((0,), settings.floatx)
    params, losses = _fit_scan(params, draws,
                               int(steps), jnp.asarray(lr, settings.dtype))
    return params, np.asarray(losses)


# ---------------------------------------------------------------------------
# NUTS in latent space
# ---------------------------------------------------------------------------


def neutra_logp(logp, flow_params):
    """Pullback density: logp_tilde(z) = logp(f(z)) + log|det df/dz|."""

    def logp_tilde(z):
        theta, logdet = flow_forward(flow_params, z)
        return logp(theta) + logdet

    return logp_tilde


def neutra_nuts(logp, draws, samples, chains=4, warmup=200, key=None,
                max_depth=8, target_accept=0.8, n_couplings=4, hidden=32,
                fit_steps=1000, fit_lr=1e-2, adapt_mass=True):
    """NUTS through a transport fitted to ``draws``.

    Fits the flow to the draws, starts each chain at the latent image of a
    random draw, runs the standard warmup+NUTS in latent space (where the
    posterior is approximately standard normal), and maps the chain back.

    Returns (chain (chains, samples, ndim) in the ORIGINAL space,
    lnprob (chains, samples) of the original-space density, info dict with
    the usual NUTS diagnostics plus ``fit_nll`` — the flow's final training
    NLL).
    """
    from .nuts import nuts_sampler

    if key is None or isinstance(key, int):
        key = random.PRNGKey(0 if key is None else key)
    k_fit, k_start, k_run = random.split(key, 3)
    draws = jnp.asarray(draws, settings.dtype)
    flow, losses = fit_flow(draws, n_couplings=n_couplings, hidden=hidden,
                            steps=fit_steps, lr=fit_lr, key=k_fit)

    idx = random.choice(k_start, draws.shape[0], (chains,), replace=False)
    z0, _ = flow_inverse(flow, draws[idx])

    logp_tilde = neutra_logp(logp, flow)
    zchain, zlnprob, info = nuts_sampler(
        logp_tilde, np.asarray(z0), samples, warmup=warmup, key=k_run,
        max_depth=max_depth, chains=chains, adapt_mass=adapt_mass,
        target_accept=target_accept)

    theta, logdet = jax.jit(jax.vmap(jax.vmap(
        lambda z: flow_forward(flow, z))))(jnp.asarray(zchain))
    lnprob = jnp.asarray(zlnprob) - logdet
    info = dict(info)
    info["fit_nll"] = float(losses[-1]) if len(losses) else float("nan")
    return np.asarray(theta), np.asarray(lnprob), info
