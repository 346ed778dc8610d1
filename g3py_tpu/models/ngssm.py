"""Non-Gaussian likelihoods on the EXACT state-space GP prior: Laplace
inference by iterated Kalman smoothing, O(n) per Newton step.

``y_k | f(t_k) ~ likelihood`` (Poisson counts, Bernoulli probit
classification, Student-t robust regression, ordinal, ...) with the
latent f carrying any supported state-space kernel
(OU/MAT32/MAT52/SE/COS/SIN, sums/products — ops/ssm.py).  The posterior
mode solves

    max_f  sum_k log p(y_k | loc_k + f_k) - 1/2 f' K^{-1} f,

and each Newton step is EXACTLY one linear-Gaussian smoothing pass with
pseudo-observations ``ytil = f + grad/W`` and noise ``1/W``
(W = -d^2 loglik/df^2): the classic Laplace-via-Kalman construction
(Nickisch, Solin & Grigorievskiy, "State Space Gaussian Processes with
Non-Gaussian Likelihood", ICML 2018) — here run as the PARALLEL-in-time
scans, so a full Newton solve is ``iters`` log-depth smoother passes.
The marginal-likelihood approximation (the model's ``loglike``) is the
standard Laplace evidence (Rasmussen & Williams eq. 3.32) assembled
from per-row quantities of the final pass:

    log Z = loglik(f^) - 1/2 f^' K^{-1} f^ - 1/2 log|I + K W|,
    f^' K^{-1} f^ = sum_k f^_k W_k (ytil_k - f^_k),
    log|I + K W| = sum_k log s_k + sum_k log W_k,

with ``s_k`` the pseudo-model's innovation variances (the filter's own
factorization of det(K + W^{-1})).  For :class:`GaussianLik` the mode is
reached in ONE step and log Z is the EXACT Gaussian evidence — tested
identical to :class:`~g3py_tpu.models.statespace.StateSpaceGP`.

The reference has no non-Gaussian observation models at all (its copula
family was `pass` stubs, reference copula.py:5-20); the sparse
counterpart here is :class:`~g3py_tpu.models.svgp.SVP` (variational,
O(m^2) per row) — this family keeps the PRIOR exact and linear in n.
Gradients of log Z w.r.t. the hypers flow by autodiff through the fixed
Newton iterations (at convergence the inner dependence vanishes by
stationarity, so converged iterations give the exact gradient).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.special import logsumexp

from ..config import settings
from ..ops.ssm import (ssm_blocks, parallel_kalman_nll, parallel_smoother,
                       parallel_kalman_filter, parallel_kalman_quad_logdet,
                       ssm_prior_state_sample, chunked_kalman_nll,
                       chunked_smoother_diag, sharded_ssm_laplace)
from .gaussian import GUARD
from .likelihoods import (GaussianLik, BernoulliLik, PoissonLik,
                          OrdinalLik, sample_conditional)
from .statespace import StateSpaceGP
from .stochastic import zero32

__all__ = ["NonGaussianSSGP", "NGSSGP"]


class NonGaussianSSGP(StateSpaceGP):
    """State-space GP with a non-Gaussian observation model — see the
    module docstring.

    >>> m = g3.NonGaussianSSGP(space=t, kernel=g3.MAT32(t) + g3.SIN(t),
    ...                        likelihood=g3.PoissonLik())
    >>> m.observed(t, counts)
    >>> p = m.find_MAP()                    # Laplace evidence objective
    >>> m.mean(p, space=tq)                 # E[y*] (rate, via the link)
    >>> m.location(p, space=tq)             # latent mean
    >>> m.quantiler(p, space=tq, q=0.975)   # latent/link quantiles

    Statistic semantics mirror :class:`~g3py_tpu.models.svgp.SVP`
    (``location``/``kernel_diag`` = latent moments; ``mean``/``variance
    (noise=True)`` = predictive moments through the likelihood;
    ``logpredictive`` = Gauss-Hermite log E[p(y|f)]), so `scores`,
    `Experiment`, serving and `sample_hypers` all work unchanged.
    Newton iteration count: ``settings.ssm_laplace_iters`` (default 15;
    log-concave likelihoods converge in ~5).  Scaling paths: past
    ``settings.ssm_chunk_threshold`` rows every Newton pass and the
    evidence run as the O(ssm_chunk)-memory chunked block scans
    (beyond-HBM single-chip training/serving), and ``nll_distributed``
    / ``find_MAP(engine='distributed')`` run the whole Laplace loop as
    one time-axis-sharded SPMD program over a device mesh."""

    def __init__(self, space=None, location=None, kernel=None,
                 likelihood=None, harmonics=None, *args, **kwargs):
        from ..hypers.means import Zero
        from ..ops.ssm import ssm_leaves
        from .likelihoods import Likelihood

        if likelihood is None:
            likelihood = PoissonLik()
        if not isinstance(likelihood, Likelihood):
            raise ValueError(
                "likelihood= must be a Likelihood (GaussianLik, "
                "StudentTLik, PoissonLik, NegBinomialLik, BernoulliLik, "
                f"OrdinalLik, ...), got {type(likelihood).__name__}")
        self.f_location = location if location is not None else Zero()
        self.f_kernel = kernel
        self._leaves = ssm_leaves(kernel, harmonics=harmonics)
        self.f_likelihood = likelihood
        kwargs["space"] = space
        if "name" not in kwargs:
            kwargs["name"] = "NGSSGP"
        # skip StateSpaceGP.__init__ (it installs the Gaussian noise
        # component); StochasticProcess wires the rest
        from .stochastic import StochasticProcess

        StochasticProcess.__init__(self, *args, **kwargs)

    # -- registration -----------------------------------------------------------
    def _components(self):
        return [self.f_location, self.f_kernel, self.f_likelihood]

    def observed(self, inputs=None, outputs=None, order=None, index=None,
                 hidden=None):
        out = StateSpaceGP.observed(self, inputs=inputs, outputs=outputs,
                                    order=order, index=index,
                                    hidden=hidden)
        self.f_likelihood.check_targets(self._outputs)
        return out

    def _noise_var(self, params):
        nv = self.f_likelihood.noise_var(params)
        if nv is None:
            raise ValueError(
                f"{type(self.f_likelihood).__name__} has no additive-"
                "noise decomposition; use variance(noise=True) "
                "(predictive moments) instead")
        return nv

    # -- Laplace mode (iterated Kalman smoothing) ---------------------------------
    def _d12(self, params, y, g):
        """(d loglik/df, d^2 loglik/df^2) elementwise at g = loc + f."""
        lik = self.f_likelihood

        def ll(yy, gg):
            return jnp.sum(lik.logp_elem(params, yy, gg))

        d1 = jax.vmap(jax.grad(ll, argnums=1))(y, g)
        d2 = jax.vmap(jax.grad(jax.grad(ll, argnums=1), argnums=1))(y, g)
        return d1, d2

    def _chunked_pieces(self, params):
        """(pinf, h, blocks_fn, rows_of) for the beyond-HBM scans:
        per-block (A, Q) from the layout-safe dt vector and PAYLOAD-form
        per-row pseudo-noise (the Laplace pseudo-observations carry a
        different noise 1/W_k on every row, which the shared-``r`` form
        cannot express) — ``rows_of(r_vec)`` wraps an (n,) noise vector
        as ``(payload_T, rows_fn)`` for the chunked scans."""
        _a0, _q0, pinf, h = ssm_blocks(self._leaves, params,
                                       jnp.zeros(1, settings.dtype))

        def blocks_fn(d):
            return ssm_blocks(self._leaves, params, d,
                              stationary_first=False)[:2]

        def rows_of(r_vec):
            def rows_fn(pb):
                return (jnp.broadcast_to(h, (pb.shape[1],) + h.shape),
                        pb[0])

            return (r_vec[None], rows_fn)

        return pinf, h, blocks_fn, rows_of

    def _mode(self, params, inputs, outputs):
        """Newton mode of the latent (sorted time order): returns
        ``(order, ts, dt, h, loc_s, ys, f_hat, w, ytil)``.  Each Newton
        step is one linear-Gaussian smoothing pass; past
        ``settings.ssm_chunk_threshold`` rows the pass runs as the
        O(ssm_chunk)-memory two-pass block smoother with per-block
        (A, Q) construction (beyond-HBM training — only (n,) vectors
        ever materialize full-length)."""
        x = jnp.asarray(inputs, settings.dtype)
        t = x[:, 0]
        order = jnp.argsort(t)
        ts = t[order]
        ys = jnp.asarray(outputs, settings.dtype)[order]
        loc_s = self.f_location(params, x)[order]
        dt = jnp.concatenate([jnp.zeros(1, settings.dtype),
                              jnp.diff(ts)])
        if ts.shape[0] > settings.ssm_chunk_threshold:
            pinf, h, blocks_fn, rows_of = self._chunked_pieces(params)

            def pass_mean(w, ytil):
                mean, _var = chunked_smoother_diag(
                    None, None, None, None, ytil,
                    chunk=settings.ssm_chunk, rows=rows_of(1.0 / w),
                    blocks_fn=blocks_fn, dt=dt, pinf=pinf)
                return mean
        else:
            a, q, _pinf, h = ssm_blocks(self._leaves, params, dt)

            def pass_mean(w, ytil):
                _nll, m_f, p_f = parallel_kalman_nll(a, q, h, 1.0 / w,
                                                     ytil)
                m_s, _p_s = parallel_smoother(a, q, m_f, p_f)
                return jnp.sum(m_s * h, axis=-1)

        def newton(f, _):
            d1, d2 = self._d12(params, ys, loc_s + f)
            # W > 0 keeps every pseudo-noise finite; non-log-concave
            # likelihoods (Student-t) get their negative curvature
            # clamped — the standard Laplace safeguard
            w = jnp.clip(-d2, 1e-6, 1e8)
            ytil = f + d1 / w
            return pass_mean(w, ytil), None

        iters = int(getattr(settings, "ssm_laplace_iters", 15))
        f_hat, _ = lax.scan(jax.checkpoint(newton),
                            jnp.zeros_like(ys), None, length=iters)
        d1, d2 = self._d12(params, ys, loc_s + f_hat)
        w = jnp.clip(-d2, 1e-6, 1e8)
        ytil = f_hat + d1 / w
        return order, ts, dt, h, loc_s, ys, f_hat, w, ytil

    # -- the Laplace evidence (the model's loglike) --------------------------------
    def th_loglike_fn(self):
        def fn(params, space, inputs, outputs):
            (order, ts, dt, h, loc_s, ys, f_hat, w,
             ytil) = self._mode(params, inputs, outputs)
            # log|I + K W| = sum_k log s_k + sum_k log w_k with s_k the
            # pseudo-model's innovation variances — the Kalman filter's
            # own LDL factorization of det(K + W^{-1})
            if ts.shape[0] > settings.ssm_chunk_threshold:
                pinf, _h, blocks_fn, rows_of = self._chunked_pieces(
                    params)
                _quad_pm, logdet = chunked_kalman_nll(
                    None, None, None, None, ytil,
                    chunk=settings.ssm_chunk, rows=rows_of(1.0 / w),
                    blocks_fn=blocks_fn, dt=dt, pinf=pinf, split=True)
            else:
                a, q, _pinf, h = ssm_blocks(self._leaves, params, dt)
                _quad_pm, logdet = parallel_kalman_quad_logdet(
                    a, q, h, 1.0 / w, ytil)
            quad = jnp.sum(f_hat * w * (ytil - f_hat))
            ll_data = jnp.sum(self.f_likelihood.logp_elem(
                params, ys, loc_s + f_hat))
            ll = (ll_data - 0.5 * quad
                  - 0.5 * (logdet + jnp.sum(jnp.log(w))))
            bad = ~jnp.isfinite(ll)
            return jnp.where(bad, GUARD, jnp.nan_to_num(
                ll, nan=GUARD, neginf=GUARD, posinf=GUARD))

        return fn

    def nll_distributed(self, params=None, mesh=None, axis="dp"):
        """Device-sharded Laplace objective over the TIME axis
        (``ops/ssm.sharded_ssm_laplace``): the whole iterated-smoothing
        Newton loop runs as ONE SPMD program — each device holds its own
        row shard, every Newton step is a sharded filter+smoother pass
        (all_gather of D tiny monoid totals forward AND backward), and
        the evidence reduces by psum.  The multi-chip counterpart of the
        Gaussian family's ``nll_distributed`` for non-Gaussian
        observations; rides ``find_MAP(engine='distributed')``
        unchanged."""
        if params is None:
            params = self.params
        params = {k: jnp.asarray(v) for k, v in params.items()}
        x = jnp.asarray(self.inputs, settings.dtype)
        t = x[:, 0]
        order = jnp.argsort(t)
        ts = t[order]
        ys = jnp.asarray(self.outputs, settings.dtype)[order]
        loc_s = self.f_location(params, x)[order]
        dt = jnp.concatenate([jnp.zeros(1, settings.dtype),
                              jnp.diff(ts)])

        # bound methods compare/hash by (instance, function), so they
        # are stable jit-cache keys across calls on the same model
        ll = sharded_ssm_laplace(
            self._leaves, params, dt, ys, loc_s,
            self._d12, self.f_likelihood.logp_elem,
            iters=int(getattr(settings, "ssm_laplace_iters", 15)),
            mesh=mesh, axis=axis)
        return -ll

    # -- Laplace posterior at queries ------------------------------------------------
    def _run_smoother(self, params, tq, inputs, outputs):
        """Smoothed Laplace-posterior latent (mean, var) at query times:
        one extra smoothing pass over pseudo-observations at the mode,
        with the query rows merged in unobserved.  Past
        ``settings.ssm_chunk_threshold`` merged rows this pass (like the
        mode search itself) runs as the chunked two-pass block smoother
        — beyond-HBM serving."""
        (_order, ts, _dt, _h, _loc, _ys, _f, w,
         ytil) = self._mode(params, inputs, outputs)
        tq = jnp.asarray(tq, settings.dtype)
        n_obs = ts.shape[0]
        t_all = jnp.concatenate([ts, tq])
        y_all = jnp.concatenate([ytil, jnp.zeros_like(tq)])
        r_all = jnp.concatenate([1.0 / w,
                                 jnp.ones(tq.shape[0], settings.dtype)])
        obs = jnp.concatenate([jnp.ones(n_obs, bool),
                               jnp.zeros(tq.shape[0], bool)])
        order2 = jnp.argsort(t_all)
        ts2, ys2, rs2, os2 = (t_all[order2], y_all[order2],
                              r_all[order2], obs[order2])
        dt = jnp.concatenate([jnp.zeros(1, settings.dtype),
                              jnp.diff(ts2)])
        if ts2.shape[0] > settings.ssm_chunk_threshold:
            pinf, _h2, blocks_fn, rows_of = self._chunked_pieces(params)
            mean, var = chunked_smoother_diag(
                None, None, None, None, ys2, os2,
                chunk=settings.ssm_chunk, rows=rows_of(rs2),
                blocks_fn=blocks_fn, dt=dt, pinf=pinf)
        else:
            a, q, _pinf, h = ssm_blocks(self._leaves, params, dt)
            m_f, p_f = parallel_kalman_filter(a, q, h, rs2, ys2, os2)
            m_s, p_s = parallel_smoother(a, q, m_f, p_f)
            mean = jnp.sum(m_s * h, axis=-1)
            var = jnp.sum(jnp.sum(p_s * h, axis=-1) * h, axis=-1)
        inv = jnp.argsort(order2)
        qpos = inv[n_obs:]
        return mean[qpos], jnp.maximum(var[qpos], zero32)

    # -- statistics through the likelihood (SVP semantics) ---------------------------
    def th_mean(self, prior=False, noise=False, simulations=None):
        lik = self.f_likelihood

        def fn(params, space, inputs, outputs, vector):
            if prior:
                mf = self.f_location(params, space)
                vf = self._prior_diag(params, jnp.shape(space)[0])
            else:
                m, vf = self._run_smoother(params, space[:, 0], inputs,
                                           outputs)
                mf = self.f_location(params, space) + m
            return lik.predictive_moments(params, mf, vf)[0]

        return fn

    def th_median(self, prior=False, noise=False, simulations=None):
        if isinstance(self.f_likelihood,
                      (BernoulliLik, PoissonLik, OrdinalLik)):
            return None
        return self.th_mean(prior=prior, noise=noise)

    def th_variance(self, prior=False, noise=False, simulations=None):
        lik = self.f_likelihood

        def fn(params, space, inputs, outputs, vector):
            if prior:
                mf = self.f_location(params, space)
                vf = self._prior_diag(params, jnp.shape(space)[0])
            else:
                m, vf = self._run_smoother(params, space[:, 0], inputs,
                                           outputs)
                mf = self.f_location(params, space) + m
            if noise:
                return lik.predictive_moments(params, mf, vf)[1]
            return vf

        return fn

    def th_logpredictive(self, prior=False, noise=False):
        """log E[p(y* | f*)] per query (Gauss-Hermite log-sum-exp),
        summed — matching the SVP family's NLPD numerator."""
        lik = self.f_likelihood

        def fn(params, space, inputs, outputs, vector):
            if prior:
                mf = self.f_location(params, space)
                vf = self._prior_diag(params, jnp.shape(space)[0])
            else:
                m, vf = self._run_smoother(params, space[:, 0], inputs,
                                           outputs)
                mf = self.f_location(params, space) + m
            f, wq = lik._grid(mf, vf)
            lp = lik.logp_elem(params, jnp.asarray(vector)[None, :], f)
            per = logsumexp(lp, axis=0, b=jnp.maximum(wq, 1e-30)[:, None])
            return jnp.sum(per)

        return fn

    # -- sampling / quantiles -----------------------------------------------------
    def _joint_draws(self, params, tq, inputs, outputs, samples, seed,
                     prior=False):
        """JOINT latent draws (nq, samples) under the Laplace posterior:
        the simulation smoother on the pseudo-observation model at the
        mode (prior=True: exact prior paths, no approximation).  Plain
        scans only — joint path draws are a serving-size statistic (the
        training/marginal paths are the chunked ones)."""
        key = jax.random.PRNGKey(seed)
        tq = jnp.asarray(tq, settings.dtype)
        if prior:
            order = jnp.argsort(tq)
            dt = jnp.concatenate([jnp.zeros(1, settings.dtype),
                                  jnp.diff(tq[order])])
            a, q, _pinf, h = ssm_blocks(self._leaves, params, dt)
            keys = jax.random.split(key, samples)
            xs = jax.vmap(lambda k: ssm_prior_state_sample(a, q, k))(keys)
            f = jnp.sum(xs * h[None], axis=-1).T
            return f[jnp.argsort(order)]
        (_order, ts, _dt, _h, _loc, _ys, _f, w,
         ytil) = self._mode(params, inputs, outputs)
        n_obs = ts.shape[0]
        t_all = jnp.concatenate([ts, tq])
        y_all = jnp.concatenate([ytil, jnp.zeros_like(tq)])
        r_all = jnp.concatenate([1.0 / w,
                                 jnp.ones(tq.shape[0], settings.dtype)])
        obs = jnp.concatenate([jnp.ones(n_obs, bool),
                               jnp.zeros(tq.shape[0], bool)])
        order2 = jnp.argsort(t_all)
        ts2, ys2, rs2, os2 = (t_all[order2], y_all[order2],
                              r_all[order2], obs[order2])
        dt = jnp.concatenate([jnp.zeros(1, settings.dtype),
                              jnp.diff(ts2)])
        a, q, _pinf, h = ssm_blocks(self._leaves, params, dt)
        m_f, p_f = parallel_kalman_filter(a, q, h, rs2, ys2, os2)
        m_s, _ = parallel_smoother(a, q, m_f, p_f)

        def one(k):
            k1, k2 = jax.random.split(k)
            x = ssm_prior_state_sample(a, q, k1)
            yprime = (jnp.sum(x * h, axis=-1)
                      + jnp.sqrt(rs2) * jax.random.normal(
                          k2, ys2.shape, dtype=ys2.dtype))
            mfp, pfp = parallel_kalman_filter(a, q, h, rs2, yprime, os2)
            msp, _ = parallel_smoother(a, q, mfp, pfp)
            return jnp.sum((m_s + x - msp) * h, axis=-1)

        draws = jax.vmap(one)(jax.random.split(key, samples))
        inv = jnp.argsort(order2)
        return draws[:, inv[n_obs:]].T

    def sampler(self, params=None, space=None, inputs=None, outputs=None,
                samples=1, prior=False, noise=False, rng=None, seed=0):
        """JOINT latent paths g = loc + f (``noise=True``: then y | f
        drawn through the likelihood per element)."""
        if params is None:
            params = self.params
        if space is None:
            space = self.space
        if inputs is None:
            inputs = self._inputs
        if outputs is None:
            outputs = self._outputs
        pj = {k: jnp.asarray(v) for k, v in params.items()}
        tq = np.asarray(space, settings.floatx)[:, 0]
        f = np.asarray(self._joint_draws(pj, tq, inputs, outputs,
                                         int(samples), int(seed),
                                         prior=prior))
        f = f + np.asarray(self.f_location(pj, jnp.asarray(
            space, settings.dtype)))[:, None]
        if not noise:
            return f
        if rng is None:
            rng = np.random.default_rng(seed + 1)
        return sample_conditional(self.f_likelihood, params, f, rng)

    def quantiler(self, params=None, space=None, inputs=None,
                  outputs=None, q=0.975, prior=False, noise=False,
                  simulations=None):
        """Latent-normal quantiles pushed through monotone links
        (probit probability / Poisson rate), Monte-Carlo through the
        likelihood for ``noise=True`` on non-Gaussian models — the SVP
        conventions."""
        from scipy import stats
        from ..hypers import hval

        if params is None:
            params = self.params
        if space is None:
            space = self.space
        if isinstance(self.f_likelihood, GaussianLik) or not noise:
            mu = np.asarray(self.location(params, space, inputs, outputs,
                                          prior=prior))
            var = np.asarray(self.kernel_diag(params, space, inputs,
                                              outputs, prior=prior))
            if noise:
                pj = {k: np.asarray(v) for k, v in params.items()}
                var = var + float(np.maximum(
                    hval(self.f_likelihood.var, pj), 1e-10))
            out = stats.norm.ppf(q, loc=mu, scale=np.sqrt(
                np.maximum(var, 1e-12)))
            if isinstance(self.f_likelihood, BernoulliLik):
                out = stats.norm.cdf(out)
            elif isinstance(self.f_likelihood, PoissonLik):
                out = np.exp(np.clip(out, -30, 30))
            return out
        draws = self.sampler(params, space, inputs, outputs, samples=500,
                             prior=prior, noise=True,
                             rng=np.random.default_rng(7))
        return np.quantile(draws, q, axis=1)


NGSSGP = NonGaussianSSGP
