"""No-U-Turn Sampler, iterative formulation, fully jax-native.

The reference's README promised that a symbolic-gradient backend gives HMC
"for free" but never shipped an HMC/NUTS implementation (PyMC3 was only used
for RV bookkeeping).  This module delivers the real thing as a single-device
program: multinomial NUTS (Betancourt 2017) with the **iterative
tree-doubling** scheme — O(max_depth) memory via a checkpoint stack instead
of recursion — so the entire chain is one ``lax.scan`` under jit and vmaps
over chains.

U-turn bookkeeping: within a subtree whose leaves are indexed 0..2^d-1, the
complete dyadic ranges [a*2^k, (a+1)*2^k) are exactly the subtrees the
recursive algorithm checks.  Slot k of the checkpoint stack holds the
momentum at the first leaf of the currently-open size-2^k range and the
momentum prefix-sum *before* that leaf; a range closes at leaf n when
(n+1) % 2^k == 0, at which point its momentum sum and endpoint momenta are
available for the generalized U-turn test.  Backward expansion integrates
with a negative step — leapfrog is time-reversible, so all momenta stay in
the canonical (forward-time) frame and one criterion serves both
directions.

Warmup: dual-averaging step-size adaptation (Hoffman & Gelman 2014,
Algorithm 5) targeting the mean leaf acceptance statistic; mass adaptation
by Welford posterior-(co)variance estimation — ``adapt_mass=True`` fits a
diagonal metric (Stan's diag_e), ``adapt_mass='dense'`` the full covariance
(dense_e: ``inv_mass`` is the regularized posterior covariance, momentum
drawn as ``L^{-T} eps`` with ``L = chol(inv_mass)``).  Dense is the lever
for funnel-correlated posteriors (warped-GP hypers) where a diagonal metric
leaves divergences behind.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax, random

from ..config import settings

__all__ = ["nuts_sampler", "nuts_warmup"]

_DIVERGENCE = 1000.0


def _mv(inv_mass, r):
    """M^{-1} r for a diagonal (vector) or dense (matrix) inverse mass."""
    if inv_mass.ndim == 2:
        return jnp.matmul(inv_mass, r)
    return inv_mass * r


def _draw_momentum(key, inv_mass, dtype):
    """r ~ N(0, M) with M = inv(inv_mass): diagonal -> eps/sqrt(inv_mass);
    dense -> L^{-T} eps with L = chol(inv_mass) (so cov(r) = inv_mass^{-1})."""
    ndim = inv_mass.shape[-1]
    eps = random.normal(key, (ndim,), dtype=dtype)
    if inv_mass.ndim == 2:
        l = jnp.linalg.cholesky(inv_mass)
        return jax.scipy.linalg.solve_triangular(l.T, eps, lower=False)
    return eps * lax.rsqrt(inv_mass)


def _leapfrog(grad_fn, z, r, eps_signed, inv_mass):
    r = r + 0.5 * eps_signed * grad_fn(z)
    z = z + eps_signed * _mv(inv_mass, r)
    r = r + 0.5 * eps_signed * grad_fn(z)
    return z, r


def _uturn(r_sum, r_first, r_last, inv_mass):
    """Generalized U-turn criterion on velocities v = M^{-1} r."""
    v = _mv(inv_mass, r_sum)
    return (jnp.dot(v, r_first) <= 0.0) | (jnp.dot(v, r_last) <= 0.0)


def _build_subtree(logp_fn, grad_fn, key, z0, r0, eps_signed, depth,
                   max_depth, energy0, inv_mass):
    """Simulate 2^depth leapfrog steps from edge state (z0, r0) with
    iterative U-turn checks and progressive multinomial proposal selection.
    Bounded fori_loop masked beyond 2^depth so one trace serves all depths.

    Returns (z_end, r_end, r_sum, z_prop, logw, accept_sum, turning,
    diverging)."""
    ndim = z0.shape[0]
    n_leaves = jnp.asarray(2, jnp.int32) ** depth
    ks = jnp.arange(max_depth + 1)

    ckpt_r = jnp.zeros((max_depth + 1, ndim), z0.dtype)
    ckpt_sum = jnp.zeros((max_depth + 1, ndim), z0.dtype)

    def body(n, state):
        (key_, z, r, r_sum, z_prop, logw, acc_sum, turning, diverging,
         cr, cs) = state
        key_, k_sel = random.split(key_)

        z_new, r_new = _leapfrog(grad_fn, z, r, eps_signed, inv_mass)
        energy = -logp_fn(z_new) + 0.5 * jnp.dot(_mv(inv_mass, r_new), r_new)
        delta = energy - energy0
        div = ~jnp.isfinite(delta) | (delta > _DIVERGENCE)
        logw_leaf = jnp.where(div, -jnp.inf, -delta)
        accept_leaf = jnp.where(div, 0.0, jnp.minimum(1.0, jnp.exp(-delta)))

        # open ranges starting at this leaf: slot k when n % 2^k == 0
        store = (jnp.mod(n, 2**ks) == 0)
        cr_new = jnp.where(store[:, None], r_new[None, :], cr)
        cs_new = jnp.where(store[:, None], r_sum[None, :], cs)

        r_sum_new = r_sum + r_new

        # close ranges ending at this leaf: slot k when (n+1) % 2^k == 0
        close = (jnp.mod(n + 1, 2**ks) == 0) & (ks >= 1)
        range_sum = r_sum_new[None, :] - cs_new
        turn_k = jax.vmap(
            lambda rs, rf: _uturn(rs, rf, r_new, inv_mass))(range_sum, cr_new)
        turning_new = turning | jnp.any(close & turn_k)

        # progressive multinomial proposal within the subtree
        logw_new = jnp.logaddexp(logw, logw_leaf)
        take = jnp.log(random.uniform(k_sel, dtype=z0.dtype)) < (
            logw_leaf - logw_new)
        z_prop_new = jnp.where(take, z_new, z_prop)

        live = (n < n_leaves) & ~turning & ~diverging
        sel = lambda a, b: jnp.where(live, a, b)
        return (key_, sel(z_new, z), sel(r_new, r), sel(r_sum_new, r_sum),
                sel(z_prop_new, z_prop), jnp.where(live, logw_new, logw),
                jnp.where(live, acc_sum + accept_leaf, acc_sum),
                jnp.where(live, turning_new, turning),
                jnp.where(live, diverging | div, diverging),
                jnp.where(live, cr_new, cr), jnp.where(live, cs_new, cs))

    init = (key, z0, r0, jnp.zeros_like(r0), z0,
            jnp.asarray(-jnp.inf, z0.dtype), jnp.zeros((), z0.dtype),
            jnp.asarray(False), jnp.asarray(False), ckpt_r, ckpt_sum)
    (_, z_end, r_end, r_sum, z_prop, logw, acc_sum, turning, diverging,
     _, _) = lax.fori_loop(0, 2**max_depth, body, init)
    return z_end, r_end, r_sum, z_prop, logw, acc_sum, turning, diverging


def _nuts_step(logp_fn, grad_fn, key, z, eps, max_depth, inv_mass=None):
    ndim = z.shape[0]
    if inv_mass is None:
        inv_mass = jnp.ones((ndim,), z.dtype)
    k_mom, k_tree = random.split(key)
    r0 = _draw_momentum(k_mom, inv_mass, z.dtype)
    energy0 = -logp_fn(z) + 0.5 * jnp.dot(_mv(inv_mass, r0), r0)

    def cond(state):
        depth, turning, diverging = state[1], state[10], state[11]
        return (depth < max_depth) & ~turning & ~diverging

    def body(state):
        (key_, depth, z_left, r_left, z_right, r_right, r_sum, z_prop,
         logw, acc, turning, diverging) = state
        key_, k_dir, k_sub, k_swap = random.split(key_, 4)
        go_right = random.bernoulli(k_dir)
        direction = jnp.where(go_right, 1.0, -1.0).astype(z.dtype)
        z_edge = jnp.where(go_right, z_right, z_left)
        r_edge = jnp.where(go_right, r_right, r_left)

        (z_end, r_end, sub_sum, sub_prop, sub_logw, sub_acc, sub_turn,
         sub_div) = _build_subtree(logp_fn, grad_fn, k_sub, z_edge, r_edge,
                                   eps * direction, depth, max_depth, energy0,
                                   inv_mass)

        z_left = jnp.where(go_right, z_left, z_end)
        r_left = jnp.where(go_right, r_left, r_end)
        z_right = jnp.where(go_right, z_end, z_right)
        r_right = jnp.where(go_right, r_end, r_right)

        # biased progressive sampling between the old tree and the subtree
        ok = ~sub_turn & ~sub_div
        swap = jnp.log(random.uniform(k_swap, dtype=z.dtype)) < (
            sub_logw - logw)
        z_prop = jnp.where(ok & swap, sub_prop, z_prop)
        logw = jnp.where(ok, jnp.logaddexp(logw, sub_logw), logw)
        r_sum_new = r_sum + jnp.where(ok, sub_sum, jnp.zeros_like(sub_sum))
        turning_total = _uturn(r_sum_new, r_left, r_right, inv_mass)
        acc = (acc[0] + sub_acc, acc[1] + 2.0**depth)
        return (key_, depth + 1, z_left, r_left, z_right, r_right, r_sum_new,
                z_prop, logw, acc, sub_turn | turning_total,
                diverging | sub_div)

    state0 = (k_tree, jnp.asarray(0, jnp.int32), z, r0, z, r0, r0, z,
              jnp.zeros((), z.dtype),
              (jnp.zeros((), z.dtype), jnp.zeros((), z.dtype)),
              jnp.asarray(False), jnp.asarray(False))
    final = lax.while_loop(cond, body, state0)
    z_new = final[7]
    depth_used = final[1]
    acc_sum, acc_count = final[9]
    diverged = final[11]
    accept = jnp.where(acc_count > 0, acc_sum / jnp.maximum(acc_count, 1.0),
                       0.0)
    return z_new, accept, depth_used, diverged


@partial(jax.jit, static_argnames=("logp_fn", "samples", "max_depth"))
def _nuts_chain(logp_fn, z0, eps, samples, key, max_depth, inv_mass=None):
    grad_fn = jax.grad(logp_fn)
    if inv_mass is None:
        inv_mass = jnp.ones_like(z0)

    def step(carry, k):
        z = carry
        z_new, accept, depth, div = _nuts_step(logp_fn, grad_fn, k, z, eps,
                                               max_depth, inv_mass)
        return z_new, (z_new, logp_fn(z_new), accept, depth, div)

    keys = random.split(key, samples)
    _, (chain, lnprob, accepts, depths, divs) = lax.scan(step, z0, keys)
    return chain, lnprob, accepts, depths, divs


def _dual_avg_phase(logp_fn, grad_fn, z0, key, iters, max_depth, inv_mass,
                    target=0.8, eps0=0.1, dense=False):
    """One dual-averaging phase (Hoffman & Gelman Algorithm 5), accumulating
    a Welford posterior-(co)variance estimate for mass adaptation (vector
    second moments, or the full outer-product matrix when ``dense``)."""
    mu = jnp.log(10.0 * eps0)
    gamma, t0, kappa = 0.05, 10.0, 0.75
    ndim = z0.shape[0]
    m2_0 = (jnp.zeros((ndim, ndim), z0.dtype) if dense
            else jnp.zeros_like(z0))

    def step(carry, inp):
        z, log_eps, log_eps_bar, h_bar, w_mean, w_m2 = carry
        k, m = inp
        eps = jnp.exp(log_eps)
        z_new, accept, _, _ = _nuts_step(logp_fn, grad_fn, k, z, eps,
                                         max_depth, inv_mass)
        mm = m.astype(z0.dtype) + 1.0
        eta = 1.0 / (mm + t0)
        h_bar = (1.0 - eta) * h_bar + eta * (target - accept)
        log_eps = mu - jnp.sqrt(mm) / gamma * h_bar
        w = mm ** (-kappa)
        log_eps_bar = w * log_eps + (1.0 - w) * log_eps_bar
        # Welford accumulation of the posterior (co)variance
        delta = z_new - w_mean
        w_mean = w_mean + delta / mm
        delta2 = z_new - w_mean
        w_m2 = w_m2 + (jnp.outer(delta, delta2) if dense
                       else delta * delta2)
        return (z_new, log_eps, log_eps_bar, h_bar, w_mean, w_m2), None

    keys = random.split(key, iters)
    (z, _, log_eps_bar, _, w_mean, w_m2), _ = lax.scan(
        step, (z0, jnp.log(jnp.asarray(eps0, z0.dtype)),
               jnp.zeros((), z0.dtype), jnp.zeros((), z0.dtype),
               jnp.zeros_like(z0), m2_0),
        (keys, jnp.arange(iters)))
    var = w_m2 / jnp.maximum(iters - 1, 1)
    return z, jnp.exp(log_eps_bar), var


def _nuts_warmup_impl(logp_fn, z0, key, warmup, max_depth, target=0.8,
                      eps0=0.1, adapt_mass=True):
    """Two-phase warmup: dual-averaging with unit mass while estimating the
    posterior (co)variance (Welford), then re-adaptation of the step size
    under the fitted mass.  ``adapt_mass=True`` fits a diagonal metric
    (inv_mass = posterior variance — Stan's diag_e); ``adapt_mass='dense'``
    fits the full covariance (dense_e) — the cure for funnel-correlated
    posteriors where a diagonal metric leaves divergences behind."""
    grad_fn = jax.grad(logp_fn)
    ones = jnp.ones_like(z0)
    k1, k2 = random.split(key)
    dense = adapt_mass == "dense"
    n1 = warmup // 2 if adapt_mass else warmup
    z, eps, var = _dual_avg_phase(logp_fn, grad_fn, z0, k1, n1, max_depth,
                                  ones, target, eps0, dense=dense)
    if not adapt_mass:
        return z, eps, ones
    reg = (n1 / (n1 + 5.0))
    if dense:
        # regularized covariance (Stan shrinks toward a scaled identity)
        ndim = z0.shape[0]
        inv_mass = (reg * var
                    + (1.0 - reg) * 1e-3 * jnp.eye(ndim, dtype=z0.dtype))
        # guard: a non-PSD estimate (short phase-1) falls back to its diag
        l = jnp.linalg.cholesky(inv_mass)
        bad = ~jnp.all(jnp.isfinite(l))
        inv_mass = jnp.where(
            bad,
            jnp.diag(jnp.maximum(jnp.diagonal(var), 1e-10) * reg
                     + (1.0 - reg) * 1e-3),
            inv_mass)
    else:
        # regularized variance (Stan shrinks toward unity)
        inv_mass = reg * jnp.maximum(var, 1e-10) + (1.0 - reg) * 1e-3
    z, eps, _ = _dual_avg_phase(logp_fn, grad_fn, z, k2, warmup - n1,
                                max_depth, inv_mass, target, eps)
    return z, eps, inv_mass


_nuts_warmup_jit = partial(jax.jit, static_argnames=("logp_fn", "warmup",
                                                     "max_depth",
                                                     "adapt_mass"))(
    _nuts_warmup_impl)


def nuts_warmup(logp, z0, warmup=200, key=None, max_depth=8, adapt_mass=True,
                target_accept=0.8):
    """Adapt step size + diagonal mass; returns (z_adapted, eps, inv_mass)."""
    if key is None or isinstance(key, int):
        key = random.PRNGKey(0 if key is None else key)
    z0 = jnp.asarray(z0, settings.dtype)
    z, eps, inv_mass = _nuts_warmup_jit(logp, z0, key, warmup, max_depth,
                                        target=target_accept,
                                        adapt_mass=adapt_mass)
    return np.asarray(z), float(eps), np.asarray(inv_mass)


def nuts_sampler(logp, z0, samples, eps=None, warmup=200, key=None,
                 max_depth=8, chains=1, adapt_mass=True, target_accept=0.8):
    """Run NUTS; returns (chain (chains, samples, ndim),
    lnprob (chains, samples), info dict).

    ``logp`` must be a traceable scalar log-density of the flat
    unconstrained parameter vector (every process exposes one through its
    pure-logp machinery; see ``StochasticProcess._sampling_logps``).

    ``target_accept``: dual-averaging acceptance target.  Raise toward
    0.95-0.99 on posteriors that report divergences (GP hyper posteriors
    have funnel-like curvature; a smaller adapted step trades tree depth
    for validity — Stan's ``adapt_delta`` guidance applies).

    ``adapt_mass``: True (default) fits a diagonal metric during warmup,
    ``'dense'`` the full posterior covariance (dense_e) — use it when a
    high ``target_accept`` still reports divergences (correlated funnels,
    e.g. warped-GP power/scale vs noise hypers), False keeps unit mass.
    """
    if key is None or isinstance(key, int):
        key = random.PRNGKey(0 if key is None else key)
    z0 = jnp.asarray(z0, settings.dtype)
    if z0.ndim == 1:
        z0 = jnp.tile(z0[None, :], (chains, 1))
    n_chains = z0.shape[0]
    k_warm, k_run = random.split(key)

    if eps is None:
        warm_keys = random.split(k_warm, n_chains)
        zs, epss, inv_masses = jax.vmap(
            lambda k, z: _nuts_warmup_impl(logp, z, k, warmup, max_depth,
                                           target=target_accept,
                                           adapt_mass=adapt_mass)
        )(warm_keys, z0)
        z0 = zs
        eps_vec = epss
    else:
        eps_vec = jnp.full((n_chains,), eps, dtype=settings.dtype)
        inv_masses = jnp.ones_like(z0)

    run_keys = random.split(k_run, n_chains)
    chain, lnprob, accepts, depths, divs = jax.vmap(
        lambda k, z, e, im: _nuts_chain(logp, z, e, samples, k, max_depth, im)
    )(run_keys, z0, eps_vec, inv_masses)
    info = {
        "accept_rate": np.asarray(jnp.mean(accepts, axis=1)),
        "mean_tree_depth": np.asarray(jnp.mean(depths.astype(jnp.float32),
                                               axis=1)),
        "divergences": np.asarray(jnp.sum(divs, axis=1)),
        "step_size": np.asarray(eps_vec),
    }
    return np.asarray(chain), np.asarray(lnprob), info
