"""TPU-native MCMC samplers.

The reference drove emcee's affine-invariant ensemble sampler and its
parallel-tempering variant from Python, optionally fanning chains across a
``multiprocessing.Pool`` (``/root/reference/g3py/bayesian/average.py:20-54``,
``stochastic.py:773-783``).  Here the samplers *are* the device program:

* :func:`ensemble_sampler` — the Goodman & Weare (2010) stretch move,
  vmapped over walkers with the two-half update scheme, the whole chain a
  single ``lax.scan`` under jit.  Chain parallelism is a sharding annotation
  (walker axis over the device mesh), not a process pool.
* :func:`pt_sampler` — parallel tempering: an extra temperature axis, the
  stretch move vmapped over temperatures, adjacent-temperature swaps each
  round (an ``ppermute``-pattern exchange when sharded over devices).
* :func:`hmc_sampler` — leapfrog HMC with jax autodiff (the reference's
  README promised HMC "for free"; here it actually is).

All samplers take a *traceable* ``logp`` (a pure jax function of the flat
unconstrained parameter vector) and return float32 host arrays shaped like
emcee's ``(chains, samples)`` lnprob and ``(chains, samples, ndim)`` chain.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax, random

from ..config import settings

__all__ = ["ensemble_sampler", "pt_sampler", "hmc_sampler", "mcmc_ensemble"]


def _safe_logp(logp):
    def f(p):
        v = logp(p)
        return jnp.where(jnp.isfinite(v), v, -jnp.inf)

    return f


def _stretch_half(key, x_move, lp_move, x_other, logp_vm, a):
    """Update one half of the ensemble against the complementary half
    (Goodman & Weare stretch move, emcee semantics)."""
    n, ndim = x_move.shape
    k1, k2, k3 = random.split(key, 3)
    u = random.uniform(k1, (n,), dtype=x_move.dtype)
    z = ((a - 1.0) * u + 1.0) ** 2 / a
    j = random.randint(k2, (n,), 0, x_other.shape[0])
    partner = x_other[j]
    y = partner + z[:, None] * (x_move - partner)
    lp_y = logp_vm(y)
    log_accept = (ndim - 1) * jnp.log(z) + lp_y - lp_move
    accept = jnp.log(random.uniform(k3, (n,), dtype=x_move.dtype)) < log_accept
    x_new = jnp.where(accept[:, None], y, x_move)
    lp_new = jnp.where(accept, lp_y, lp_move)
    return x_new, lp_new


def _ensemble_step(key, x, lp, logp_vm, a):
    half = x.shape[0] // 2
    k1, k2 = random.split(key)
    x1, lp1 = _stretch_half(k1, x[:half], lp[:half], x[half:], logp_vm, a)
    x2, lp2 = _stretch_half(k2, x[half:], lp[half:], x1, logp_vm, a)
    return jnp.concatenate([x1, x2]), jnp.concatenate([lp1, lp2])


@partial(jax.jit, static_argnames=("logp", "samples", "a"))
def _ensemble_scan(logp, p0, samples, key, a=2.0):
    logp_vm = jax.vmap(_safe_logp(logp))
    lp0 = logp_vm(p0)

    def body(carry, k):
        x, lp = carry
        x, lp = _ensemble_step(k, x, lp, logp_vm, a)
        return (x, lp), (x, lp)

    keys = random.split(key, samples)
    _, (chain, lnprob) = lax.scan(body, (p0, lp0), keys)
    # (samples, chains, ...) -> (chains, samples, ...), emcee layout
    return jnp.transpose(chain, (1, 0, 2)), jnp.transpose(lnprob, (1, 0))


def ensemble_sampler(logp, p0, samples, key=None, a=2.0, shard=False):
    """Affine-invariant ensemble sampler.

    Args:
      logp: traceable scalar log-density of a flat parameter vector.
      p0: (chains, ndim) initial walkers (chains must be even).
      samples: iterations.
      key: jax PRNG key (int seeds accepted).
      a: stretch-scale (emcee default 2).
      shard: place walkers across the device mesh (data-parallel chains; the
        TPU-native replacement for the reference's multiprocessing pool).

    Returns (chain (chains, samples, ndim), lnprob (chains, samples)).
    """
    if key is None or isinstance(key, int):
        key = random.PRNGKey(0 if key is None else key)
    p0 = jnp.asarray(p0, dtype=settings.dtype)
    if p0.shape[0] % 2:
        raise ValueError("chains must be even for the two-half stretch move")
    if shard and jax.device_count() > 1:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mesh = Mesh(np.array(jax.devices()), ("chains",))
        p0 = jax.device_put(p0, NamedSharding(mesh, P("chains", None)))
    chain, lnprob = _ensemble_scan(logp, p0, samples, key, a)
    return np.asarray(chain), np.asarray(lnprob)


# ---------------------------------------------------------------------------
# parallel tempering
# ---------------------------------------------------------------------------


def default_beta_ladder(ntemps):
    """Geometric inverse-temperature ladder beta_t = 2^(-t/2)."""
    return 0.5 ** (0.5 * np.arange(ntemps))


@partial(jax.jit, static_argnames=("loglike", "logprior", "samples", "a"))
def _pt_scan(loglike, logprior, p0, betas, samples, key, a=2.0):
    like_vm = jax.vmap(_safe_logp(loglike))
    prior_vm = jax.vmap(_safe_logp(logprior))

    def temp_logps(x_t):  # x_t: (chains, ndim) at one temperature
        return like_vm(x_t), prior_vm(x_t)

    def tempered_step(key_t, x_t, like_t, prior_t, beta):
        lp_t = beta * like_t + prior_t

        def logp_vm(y):
            return beta * like_vm(y) + prior_vm(y)

        x_new, _ = _ensemble_step(key_t, x_t, lp_t, logp_vm, a)
        like_new, prior_new = temp_logps(x_new)
        return x_new, like_new, prior_new

    def swap(key_s, x, like, prior):
        """Adjacent-temperature exchange, highest-to-lowest (the PTSampler
        recipe): accept with (beta_{t-1} - beta_t)(L_t - L_{t-1})."""
        ntemps = x.shape[0]
        nchains = x.shape[1]
        keys = random.split(key_s, ntemps - 1)

        def body(carry, t_rev):
            x_, like_, prior_ = carry
            t = ntemps - 1 - t_rev  # t from ntemps-1 down to 1
            kacc = keys[t_rev]
            log_alpha = (betas[t - 1] - betas[t]) * (like_[t] - like_[t - 1])
            acc = jnp.log(random.uniform(kacc, (nchains,), dtype=x.dtype)) < log_alpha
            hi_x, lo_x = x_[t], x_[t - 1]
            x_ = x_.at[t].set(jnp.where(acc[:, None], lo_x, hi_x))
            x_ = x_.at[t - 1].set(jnp.where(acc[:, None], hi_x, lo_x))
            hi_l, lo_l = like_[t], like_[t - 1]
            like_ = like_.at[t].set(jnp.where(acc, lo_l, hi_l))
            like_ = like_.at[t - 1].set(jnp.where(acc, hi_l, lo_l))
            hi_p, lo_p = prior_[t], prior_[t - 1]
            prior_ = prior_.at[t].set(jnp.where(acc, lo_p, hi_p))
            prior_ = prior_.at[t - 1].set(jnp.where(acc, hi_p, lo_p))
            return (x_, like_, prior_), None

        (x, like, prior), _ = lax.scan(body, (x, like, prior),
                                       jnp.arange(ntemps - 1))
        return x, like, prior

    like0 = jax.vmap(like_vm)(p0)
    prior0 = jax.vmap(prior_vm)(p0)

    def body(carry, k):
        x, like, prior = carry
        k_move, k_swap = random.split(k)
        keys_t = random.split(k_move, x.shape[0])
        x, like, prior = jax.vmap(tempered_step)(keys_t, x, like, prior, betas)
        x, like, prior = swap(k_swap, x, like, prior)
        lp = like + prior  # tempered lnprob at beta=1 row is row 0
        return (x, like, prior), (x[0], like[0] + prior[0])

    keys = random.split(key, samples)
    _, (chain0, lnprob0) = lax.scan(body, (p0, like0, prior0), keys)
    return jnp.transpose(chain0, (1, 0, 2)), jnp.transpose(lnprob0, (1, 0))


def pt_sampler(loglike, logprior, p0, samples, betas=None, key=None, a=2.0):
    """Parallel-tempered ensemble sampler; returns the temperature-0 chain
    (reference kept ``lnprob[0], chain[0]``, average.py:50-53)."""
    if key is None or isinstance(key, int):
        key = random.PRNGKey(0 if key is None else key)
    p0 = jnp.asarray(p0, dtype=settings.dtype)
    ntemps = p0.shape[0]
    if betas is None:
        betas = default_beta_ladder(ntemps)
    betas = jnp.asarray(betas, dtype=settings.dtype)
    chain, lnprob = _pt_scan(loglike, logprior, p0, betas, samples, key, a)
    return np.asarray(chain), np.asarray(lnprob)


# ---------------------------------------------------------------------------
# HMC
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("logp", "samples", "leapfrog_steps"))
def _hmc_scan(logp, p0, samples, key, step_size, leapfrog_steps):
    logp = _safe_logp(logp)
    grad = jax.grad(logp)

    def leapfrog(q, p):
        p = p + 0.5 * step_size * grad(q)

        def body(_, qp):
            q_, p_ = qp
            q_ = q_ + step_size * p_
            p_ = p_ + step_size * grad(q_)
            return q_, p_

        q, p = lax.fori_loop(0, leapfrog_steps - 1, body, (q, p))
        q = q + step_size * p
        p = p + 0.5 * step_size * grad(q)
        return q, p

    def step(carry, k):
        q, lq = carry
        k1, k2 = random.split(k)
        p = random.normal(k1, q.shape, dtype=q.dtype)
        q_new, p_new = leapfrog(q, p)
        lq_new = logp(q_new)
        log_accept = lq_new - lq - 0.5 * (jnp.sum(p_new**2) - jnp.sum(p**2))
        accept = jnp.log(random.uniform(k2, dtype=q.dtype)) < log_accept
        q = jnp.where(accept, q_new, q)
        lq = jnp.where(accept, lq_new, lq)
        return (q, lq), (q, lq)

    keys = random.split(key, samples)
    (_, _), (chain, lnprob) = lax.scan(step, (p0, logp(p0)), keys)
    return chain, lnprob


def hmc_sampler(logp, p0, samples, key=None, step_size=0.05, leapfrog_steps=10,
                chains=1):
    """Vanilla HMC over the unconstrained parameter vector; vmapped over
    chains."""
    if key is None or isinstance(key, int):
        key = random.PRNGKey(0 if key is None else key)
    p0 = jnp.asarray(p0, dtype=settings.dtype)
    if p0.ndim == 1:
        p0 = jnp.tile(p0[None, :], (chains, 1))
    keys = random.split(key, p0.shape[0])
    run = jax.vmap(lambda k, q: _hmc_scan(logp, q, samples, k, step_size,
                                          leapfrog_steps))
    chain, lnprob = run(keys, p0)
    return np.asarray(chain), np.asarray(lnprob)


# ---------------------------------------------------------------------------
# emcee-compatible driver
# ---------------------------------------------------------------------------


def mcmc_ensemble(ndim, samples=1000, chains=None, ntemps=None, start=None,
                  logp=None, loglike=None, logprior=None, noise_mult=0.1,
                  noise_sum=0.01, threads=1, parallel=False, seed=0):
    """Signature-compatible rebuild of the reference driver
    (``average.py:20-54``): jitter the start into an initial ensemble, run
    the (tempered) sampler, return ``(lnprob, chain)``.

    ``threads`` is accepted for API parity but chain parallelism is
    jax-native; pass ``parallel=True`` to shard walkers over devices."""
    if chains is None:
        chains = 2 * ndim
    chains = int(chains)
    if chains % 2:
        chains += 1
    rng = np.random.default_rng(seed)
    start = np.asarray(start, dtype=settings.floatx)

    if ntemps is None:
        if start.ndim == 2 and start.shape == (chains, ndim):
            p0 = start.copy()
        else:
            noise = rng.normal(loc=1, scale=noise_mult, size=(chains, ndim))
            p0 = noise * np.ones((chains, 1)) * start
        p0 += (p0 == 0) * rng.normal(loc=0, scale=noise_sum, size=p0.shape)
        chain, lnprob = ensemble_sampler(logp, p0.astype(settings.floatx),
                                         samples, key=seed, shard=bool(parallel))
        return lnprob, chain

    ntemps = int(ntemps)
    if start.ndim == 3 and start.shape == (ntemps, chains, ndim):
        p0 = start.copy()
    elif start.ndim == 2 and start.shape == (chains, ndim):
        noise = rng.normal(loc=1, scale=noise_mult, size=(ntemps, chains, ndim))
        p0 = noise * np.ones((ntemps, 1, 1)) * start
    else:
        noise = rng.normal(loc=1, scale=noise_mult, size=(ntemps, chains, ndim))
        p0 = noise * np.ones((ntemps, chains, 1)) * start
    p0 += (p0 == 0) * rng.normal(loc=0, scale=noise_sum, size=p0.shape)
    chain, lnprob = pt_sampler(loglike, logprior, p0.astype(settings.floatx),
                               samples, key=seed)
    return lnprob, chain
