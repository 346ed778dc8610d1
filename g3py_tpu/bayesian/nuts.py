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

    # Early-exit while_loop instead of a masked fori_loop over the FULL
    # 2^max_depth: a depth-k subtree now costs ~2^k leapfrogs, not
    # 2^max_depth (the fori form made every NUTS step pay
    # O(max_depth * 2^max_depth) leapfrogs regardless of the tree
    # actually built — see docs/samplers.md for the measured effect).
    # The `live` masking in `body` is kept — under vmap the batching
    # rule freezes finished lanes via the predicate, and
    # turning/divergence can fire mid-iteration.
    def wcond(ns):
        n, state = ns
        turning, diverging = state[7], state[8]
        return (n < n_leaves) & ~turning & ~diverging

    def wbody(ns):
        n, state = ns
        return n + 1, body(n, state)

    _, (_, z_end, r_end, r_sum, z_prop, logw, acc_sum, turning, diverging,
        _, _) = lax.while_loop(wcond, wbody, (jnp.asarray(0, jnp.int32),
                                              init))
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


def _nuts_chain_keys(logp_fn, z0, eps, keys, max_depth, inv_mass):
    """Scan NUTS steps over an explicit per-sample key array — the unit
    the chunked-dispatch path re-dispatches with the carry threaded."""
    grad_fn = jax.grad(logp_fn)

    def step(carry, k):
        z = carry
        z_new, accept, depth, div = _nuts_step(logp_fn, grad_fn, k, z, eps,
                                               max_depth, inv_mass)
        return z_new, (z_new, logp_fn(z_new), accept, depth, div)

    z_end, (chain, lnprob, accepts, depths, divs) = lax.scan(step, z0, keys)
    return z_end, chain, lnprob, accepts, depths, divs


@partial(jax.jit, static_argnames=("logp_fn", "samples", "max_depth"))
def _nuts_chain(logp_fn, z0, eps, samples, key, max_depth, inv_mass=None):
    if inv_mass is None:
        inv_mass = jnp.ones_like(z0)
    keys = random.split(key, samples)
    _, chain, lnprob, accepts, depths, divs = _nuts_chain_keys(
        logp_fn, z0, eps, keys, max_depth, inv_mass)
    return chain, lnprob, accepts, depths, divs


def _dual_avg_carry0(z0, eps0, dense):
    ndim = z0.shape[0]
    m2_0 = (jnp.zeros((ndim, ndim), z0.dtype) if dense
            else jnp.zeros_like(z0))
    return (z0, jnp.log(jnp.asarray(eps0, z0.dtype)),
            jnp.zeros((), z0.dtype), jnp.zeros((), z0.dtype),
            jnp.zeros_like(z0), m2_0)


def _dual_avg_scan(logp_fn, grad_fn, carry, keys, ms, max_depth, inv_mass,
                   target, mu, dense):
    """Scan a segment of dual-averaging iterations (Hoffman & Gelman
    Algorithm 5) from an explicit carry — the unit the chunked-dispatch
    warmup path re-dispatches; the monolithic path runs one segment."""
    gamma, t0, kappa = 0.05, 10.0, 0.75
    dtype = carry[0].dtype

    def step(carry, inp):
        z, log_eps, log_eps_bar, h_bar, w_mean, w_m2 = carry
        k, m = inp
        eps = jnp.exp(log_eps)
        z_new, accept, _, _ = _nuts_step(logp_fn, grad_fn, k, z, eps,
                                         max_depth, inv_mass)
        mm = m.astype(dtype) + 1.0
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

    carry, _ = lax.scan(step, carry, (keys, ms))
    return carry


def _dual_avg_phase(logp_fn, grad_fn, z0, key, iters, max_depth, inv_mass,
                    target=0.8, eps0=0.1, dense=False):
    """One dual-averaging phase (Hoffman & Gelman Algorithm 5), accumulating
    a Welford posterior-(co)variance estimate for mass adaptation (vector
    second moments, or the full outer-product matrix when ``dense``)."""
    mu = jnp.log(10.0 * eps0)
    keys = random.split(key, iters)
    carry = _dual_avg_scan(logp_fn, grad_fn, _dual_avg_carry0(z0, eps0, dense),
                           keys, jnp.arange(iters), max_depth, inv_mass,
                           target, mu, dense)
    z, _, log_eps_bar, _, w_mean, w_m2 = carry
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
    inv_mass = _mass_from_var(var, n1, dense, z0.dtype)
    z, eps, _ = _dual_avg_phase(logp_fn, grad_fn, z, k2, warmup - n1,
                                max_depth, inv_mass, target, eps)
    return z, eps, inv_mass


def _mass_from_var(var, n1, dense, dtype):
    """Regularized (co)variance -> inverse mass (Stan's diag_e/dense_e)."""
    reg = (n1 / (n1 + 5.0))
    if dense:
        # regularized covariance (Stan shrinks toward a scaled identity)
        ndim = var.shape[0]
        inv_mass = (reg * var
                    + (1.0 - reg) * 1e-3 * jnp.eye(ndim, dtype=dtype))
        # guard: a non-PSD estimate (short phase-1) falls back to its diag
        l = jnp.linalg.cholesky(inv_mass)
        bad = ~jnp.all(jnp.isfinite(l))
        return jnp.where(
            bad,
            jnp.diag(jnp.maximum(jnp.diagonal(var), 1e-10) * reg
                     + (1.0 - reg) * 1e-3),
            inv_mass)
    # regularized variance (Stan shrinks toward unity)
    return reg * jnp.maximum(var, 1e-10) + (1.0 - reg) * 1e-3


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


def _chunked_segments(total, chunk):
    """[(start, length), ...] covering ``total`` in <= ``chunk`` pieces."""
    return [(s, min(chunk, total - s)) for s in range(0, total, chunk)]


def _nuts_run_chunked(logp, z0, samples, eps, warmup, key, max_depth,
                      adapt_mass, target, chunk):
    """Host-chunked NUTS: warmup and sampling run as bounded ``chunk``-
    iteration dispatches instead of one monolithic fused program — the
    escape from the tunnel-runtime's big-fused-program worker-crash
    envelope (docs/performance.md; d=7 monolithic trees measured-crash
    the hosted worker).  Per-step algorithm identical to the fused path;
    only the dispatch granularity (and hence the PRNG key layout)
    differs.  At most two compiled programs per phase (full chunk +
    remainder)."""
    n_chains, ndim = z0.shape
    dtype = z0.dtype
    dense = adapt_mass == "dense"
    grad_fn = jax.grad(logp)
    k_warm, k_run = random.split(key)

    if eps is None:
        n1 = warmup // 2 if adapt_mass else warmup
        n2 = warmup - n1
        wkeys = random.split(k_warm, n_chains)
        ph1 = jax.vmap(
            lambda k: random.split(random.fold_in(k, 1), max(n1, 1)))(wkeys)
        ph2 = jax.vmap(
            lambda k: random.split(random.fold_in(k, 2), max(n2, 1)))(wkeys)

        def _seg(carry, keys, inv_mass, mu, ms):
            return _dual_avg_scan(logp, grad_fn, carry, keys, ms,
                                  max_depth, inv_mass, target, mu, dense)

        seg_v = jax.jit(jax.vmap(_seg, in_axes=(0, 0, 0, 0, None)))

        ones_c = jnp.ones((n_chains, ndim), dtype)
        mu1 = jnp.full((n_chains,), jnp.log(jnp.asarray(1.0, dtype)), dtype)
        carry = jax.vmap(lambda z: _dual_avg_carry0(z, 0.1, dense))(z0)
        for s, length in _chunked_segments(n1, chunk):
            carry = seg_v(carry, ph1[:, s:s + length], ones_c, mu1,
                          jnp.arange(s, s + length))
        z1, eps1 = carry[0], jnp.exp(carry[2])
        if not adapt_mass:
            z0, eps_vec, inv_masses = z1, eps1, ones_c
        else:
            var = carry[5] / max(n1 - 1, 1)
            inv_masses = jax.vmap(
                lambda v: _mass_from_var(v, n1, dense, dtype))(var)
            mu2 = jnp.log(10.0 * eps1)
            carry = jax.vmap(
                lambda z, e: _dual_avg_carry0(z, e, dense))(z1, eps1)
            for s, length in _chunked_segments(n2, chunk):
                carry = seg_v(carry, ph2[:, s:s + length], inv_masses, mu2,
                              jnp.arange(s, s + length))
            z0, eps_vec = carry[0], jnp.exp(carry[2])
    else:
        eps_vec = jnp.full((n_chains,), eps, dtype=dtype)
        inv_masses = jnp.ones_like(z0)

    rkeys = random.split(k_run, n_chains)
    skeys = jax.vmap(lambda k: random.split(k, samples))(rkeys)
    chain_seg = jax.jit(jax.vmap(
        lambda z, e, keys, im: _nuts_chain_keys(logp, z, e, keys,
                                                max_depth, im)))
    outs, zc = [], z0
    for s, length in _chunked_segments(samples, chunk):
        res = chain_seg(zc, eps_vec, skeys[:, s:s + length], inv_masses)
        zc = res[0]
        outs.append(res[1:])
    cat = [jnp.concatenate([o[i] for o in outs], axis=1) for i in range(5)]
    return cat[0], cat[1], cat[2], cat[3], cat[4], eps_vec


def nuts_sampler(logp, z0, samples, eps=None, warmup=200, key=None,
                 max_depth=8, chains=1, adapt_mass=True, target_accept=0.8,
                 chunk=None):
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

    ``chunk``: when set, warmup and sampling run as bounded ``chunk``-
    iteration dispatches (host loop carrying the chain state) instead of
    one monolithic fused program.  On the hosted TPU tunnel a monolithic
    d>=7 run measured-crashes the worker (docs/performance.md); chunked
    dispatch is how depths beyond 6 become runnable there.
    """
    if key is None or isinstance(key, int):
        key = random.PRNGKey(0 if key is None else key)
    z0 = jnp.asarray(z0, settings.dtype)
    if z0.ndim == 1:
        z0 = jnp.tile(z0[None, :], (chains, 1))
    n_chains = z0.shape[0]

    if chunk is not None:
        chain, lnprob, accepts, depths, divs, eps_vec = _nuts_run_chunked(
            logp, z0, samples, eps, warmup, key, max_depth,
            adapt_mass, target_accept, int(chunk))
        info = {
            "accept_rate": np.asarray(jnp.mean(accepts, axis=1)),
            "mean_tree_depth": np.asarray(
                jnp.mean(depths.astype(jnp.float32), axis=1)),
            "divergences": np.asarray(jnp.sum(divs, axis=1)),
            "step_size": np.asarray(eps_vec),
        }
        return np.asarray(chain), np.asarray(lnprob), info

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
