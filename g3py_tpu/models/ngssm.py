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
from .statespace import StateSpaceGP, MultiStateSpaceGP
from .stochastic import zero32

__all__ = ["NonGaussianSSGP", "NGSSGP", "NonGaussianMultiSSGP",
           "NGMSSGP", "NonGaussianSTSSGP", "NGSTSSGP"]


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

    def default_hypers(self):
        """Data-driven defaults see the targets in LATENT space
        (``Likelihood.latent_guess``): counts at rate exp(f) would
        otherwise seed observation-scale kernel variances."""
        z = (self.f_likelihood.latent_guess(np.asarray(self._outputs))
             if self._outputs is not None else self.outputs)
        out = {}
        for comp in self._components():
            if comp is self.f_likelihood:
                out.update(comp.default_hypers(self.inputs,
                                               self._outputs))
            else:
                out.update(comp.default_hypers_dims(self.inputs, z))
        return out

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


class NonGaussianMultiSSGP(MultiStateSpaceGP):
    """MULTI-OUTPUT time series with non-Gaussian observations on the
    exact LMC-mixed state-space prior: P channels observe counts /
    binary events / heavy-tailed values through their own likelihoods,

        g_p(t) = loc(t) + b_p + sum_q W[p, q] f_q(t),
        y_k ~ lik_{p_k}(g_{p_k}(t_k))          (one channel per row),

    with the Q latent Markovian GPs, mixing ``W`` and per-channel biases
    exactly as in :class:`~g3py_tpu.models.statespace.MultiStateSpaceGP`
    and Laplace inference by iterated parallel Kalman smoothing exactly
    as in :class:`NonGaussianSSGP` — each Newton step is ONE
    linear-Gaussian smoothing pass with per-row emission vectors
    ``h_k = sum_q W[p_k, q] Hq``, so the whole construction stays O(n)
    in the total event count.  With ``likelihood=PoissonLik()`` this is
    a MULTIVARIATE log-Gaussian Cox process (correlated count channels
    sharing latent intensities); a LIST of per-channel likelihoods gives
    mixed-modality fusion (e.g. counts in channel 0 driving a Bernoulli
    event channel 1 through shared latents).

    ``likelihood``: one Likelihood shared by every channel, or a list of
    P likelihoods (one per channel; repeated CLASSES get their hyper
    names suffixed by position so each trains its own hypers).  Rows are
    ``(t, output_index)`` (build with
    :func:`~g3py_tpu.models.lmc.stack_outputs` /
    :func:`~g3py_tpu.models.lmc.with_output`).

    >>> x, y = g3.stack_outputs([t0, t1], [counts0, counts1])
    >>> m = g3.NonGaussianMultiSSGP(space=x, kernel=g3.MAT32(t0[:, None]),
    ...                             likelihood=g3.PoissonLik(),
    ...                             outputs_dim=2)
    >>> m.observed(x, y); p = m.find_MAP()
    >>> m.mean(p, g3.with_output(tq, 1))        # channel-1 rate at tq
    >>> m.task_correlations(p)                  # latent channel coupling

    Scaling mirrors the Gaussian family: past
    ``settings.ssm_chunk_threshold`` rows every Newton pass and the
    evidence run as the payload-form chunked block scans (per-row
    pseudo-noise 1/W_k next to the channel index in the payload), and
    ``nll_distributed`` / ``find_MAP(engine='distributed')`` run the
    whole Laplace loop as one time-axis-sharded SPMD program
    (``ops/ssm.sharded_ssm_laplace`` build_fn/aux form).

    No reference counterpart at any cost: the reference's only
    multi-output story is the dense ICM algebra (reference
    kernels.py:262-290, O(n^3), Gaussian-only)."""

    def __init__(self, space=None, location=None, kernel=None,
                 likelihood=None, outputs_dim=2, latents=None,
                 harmonics=None, *args, **kwargs):
        from ..hypers.means import Zero
        from ..ops.ssm import ssm_leaves
        from .likelihoods import Likelihood
        from .lmc import Mixing
        from .stochastic import StochasticProcess

        ks = (tuple(kernel) if isinstance(kernel, (list, tuple))
              else (kernel,))
        self.n_outputs = int(outputs_dim)
        if latents is None:
            latents = len(ks) if len(ks) > 1 else min(self.n_outputs, 2)
        self.n_latents = int(latents)
        if len(ks) not in (1, self.n_latents):
            raise ValueError(
                f"kernel list has {len(ks)} entries for {self.n_latents} "
                "latents (pass one shared kernel or one per latent)")
        self._shared_kernel = len(ks) == 1
        self.f_kernels = ks
        if self._shared_kernel:
            shared = ssm_leaves(ks[0], harmonics=harmonics)
            self._leaf_sets = [shared] * self.n_latents
        else:
            self._leaf_sets = [ssm_leaves(k, harmonics=harmonics)
                               for k in ks]
        self.f_location = location if location is not None else Zero()
        self.f_mixing = Mixing(self.n_outputs, self.n_latents)
        if likelihood is None:
            likelihood = PoissonLik()
        liks = (list(likelihood) if isinstance(likelihood, (list, tuple))
                else [likelihood])
        for lik in liks:
            if not isinstance(lik, Likelihood):
                raise ValueError(
                    "likelihood= must be a Likelihood or a list of "
                    f"{self.n_outputs} (one per channel), got "
                    f"{type(lik).__name__}")
        if len(liks) not in (1, self.n_outputs):
            raise ValueError(
                f"likelihood list has {len(liks)} entries for "
                f"{self.n_outputs} channels (pass one shared likelihood "
                "or one per channel)")
        # repeated likelihood CLASSES would otherwise collide on hyper
        # names and silently share hypers across channels
        seen = {}
        for lik in liks:
            c = seen.get(lik.name, 0)
            seen[lik.name] = c + 1
            if c:
                lik.name = f"{lik.name}{c}"
        self.f_likelihoods = tuple(liks)
        kwargs["space"] = space
        if "name" not in kwargs:
            kwargs["name"] = "NGMSSGP"
        StochasticProcess.__init__(self, *args, **kwargs)

    # -- registration -----------------------------------------------------------
    def _components(self):
        return ([self.f_location] + list(self.f_kernels)
                + [self.f_mixing] + list(self.f_likelihoods))

    def _latent_targets(self):
        """Per-row targets mapped into LATENT space through each row's
        likelihood (``Likelihood.latent_guess``) — what the data-driven
        mixing/kernel defaults should see (biases ~ latent offsets,
        scales ~ latent swings; counts observed at rate exp(f) would
        otherwise seed observation-scale biases)."""
        if self._outputs is None:
            return None
        idx = np.rint(np.asarray(self._inputs)[:, 1]).astype(np.int64)
        li = (idx if len(self.f_likelihoods) > 1
              else np.zeros_like(idx))
        z = np.zeros(len(idx), settings.floatx)
        for j, lik in enumerate(self.f_likelihoods):
            mask = li == j
            if np.any(mask):
                z[mask] = lik.latent_guess(
                    np.asarray(self._outputs)[mask])
        return z

    def default_hypers(self):
        feats = self._features(self.inputs)
        z = self._latent_targets()
        out = {}
        out.update(self.f_location.default_hypers_dims(feats, z))
        for k in self.f_kernels:
            out.update(k.default_hypers_dims(feats, z))
        out.update(self.f_mixing.default_hypers(self.inputs, z))
        for j, lik in enumerate(self.f_likelihoods):
            yj = self._channel_targets(j)
            out.update(lik.default_hypers(y=yj))
        return out

    def _channel_targets(self, j):
        """Targets observed through likelihood j (host-side)."""
        if self._outputs is None:
            return None
        idx = np.rint(np.asarray(self._inputs)[:, 1]).astype(np.int64)
        li = (idx if len(self.f_likelihoods) > 1
              else np.zeros_like(idx))
        yj = np.asarray(self._outputs)[li == j]
        return yj if len(yj) else None

    def observed(self, inputs=None, outputs=None, order=None, index=None,
                 hidden=None):
        from .stochastic import StochasticProcess

        out = StochasticProcess.observed(self, inputs=inputs,
                                         outputs=outputs, order=order,
                                         index=index, hidden=hidden)
        x = np.asarray(self._inputs)
        if x.ndim != 2 or x.shape[1] != 2:
            raise ValueError(
                "NonGaussianMultiSSGP rows are (t, output_index) pairs — "
                f"expected (n, 2) inputs, got {x.shape} (build them with "
                "with_output/stack_outputs)")
        idx = np.rint(x[:, 1]).astype(np.int64)
        if idx.min() < 0 or idx.max() >= self.n_outputs:
            raise ValueError(
                f"output indices must lie in [0, {self.n_outputs}); got "
                f"[{idx.min()}, {idx.max()}]")
        for j, lik in enumerate(self.f_likelihoods):
            yj = self._channel_targets(j)
            if yj is not None:
                lik.check_targets(yj)
        return out

    # -- per-row likelihood selection ---------------------------------------------
    def _lik_idx(self, idx):
        """Likelihood index per row (zeros for a shared likelihood)."""
        if len(self.f_likelihoods) == 1:
            return jnp.zeros_like(idx)
        return idx

    @staticmethod
    def _select_rows(per_lik, li):
        """Per-row gather from a list of per-likelihood (n,) arrays.
        A GATHER, not a where-mask: non-selected entries (likelihood j
        evaluated on channel-i rows, possibly out of domain) never touch
        the selected rows' values OR gradients."""
        if len(per_lik) == 1:
            return per_lik[0]
        return jnp.take_along_axis(jnp.stack(per_lik), li[None],
                                   axis=0)[0]

    def _d12(self, params, y, g, idx):
        """(d loglik/dg, d^2 loglik/dg^2) elementwise with the row's own
        channel likelihood."""
        d1s, d2s = [], []
        for lik in self.f_likelihoods:
            def ll(yy, gg, lik=lik):
                return jnp.sum(lik.logp_elem(params, yy, gg))

            d1s.append(jax.vmap(jax.grad(ll, argnums=1))(y, g))
            d2s.append(jax.vmap(jax.grad(jax.grad(ll, argnums=1),
                                         argnums=1))(y, g))
        li = self._lik_idx(idx)
        return (self._select_rows(d1s, li), self._select_rows(d2s, li))

    def _ll_rows(self, params, y, g, idx):
        li = self._lik_idx(idx)
        return self._select_rows(
            [lik.logp_elem(params, y, g) for lik in self.f_likelihoods],
            li)

    # aux-form wrappers for the sharded Laplace program (aux carries the
    # channel index as the layout-safe float vector)
    def _d12_aux(self, params, y, g, aux):
        idx = jnp.clip(jnp.asarray(jnp.rint(aux), jnp.int32), 0, None)
        return self._d12(params, y, g, idx)

    def _ll_aux(self, params, y, g, aux):
        idx = jnp.clip(jnp.asarray(jnp.rint(aux), jnp.int32), 0, None)
        return self._ll_rows(params, y, g, idx)

    # -- Laplace mode -------------------------------------------------------------
    def _chunked_pieces(self, params, idxs):
        """(pinf, blocks_fn, rows_of) for the beyond-HBM scans: payload
        carries (channel index, per-row pseudo-noise) — per-row emission
        vectors AND per-row noise are both built inside the scan bodies
        (the scalar family's payload form extended with the index)."""
        _a0, _q0, pinf, hq = self._blocks(params,
                                          jnp.zeros(1, settings.dtype))
        w_mix, _b = self.f_mixing.values(params)
        idxf = jnp.asarray(idxs, settings.dtype)

        def blocks_fn(d):
            return self._blocks(params, d, stationary_first=False)[:2]

        def rows_of(r_vec):
            payload = jnp.stack([idxf, r_vec])

            def rows_fn(pb):
                ii = jnp.clip(jnp.asarray(jnp.rint(pb[0]), jnp.int32),
                              0, None)
                hb = jnp.sum(w_mix[ii][:, :, None] * hq[None], axis=1)
                return hb, pb[1]

            return payload, rows_fn

        return pinf, blocks_fn, rows_of

    def _mode(self, params, inputs, outputs):
        """Newton mode of the mixed latent (sorted time order): returns
        ``(order, ts, idxs, dt, loc_s, ys, f_hat, w, ytil)`` — the
        multi-output counterpart of :meth:`NonGaussianSSGP._mode` with
        per-row emission vectors."""
        t, idx = self._split(inputs)
        order = jnp.argsort(t)
        ts, idxs = t[order], idx[order]
        ys = jnp.asarray(outputs, settings.dtype)[order]
        loc_s = self._loc_bias(params, inputs)[order]
        dt = jnp.concatenate([jnp.zeros(1, settings.dtype),
                              jnp.diff(ts)])
        if ts.shape[0] > settings.ssm_chunk_threshold:
            pinf, blocks_fn, rows_of = self._chunked_pieces(params, idxs)

            def pass_mean(w, ytil):
                mean, _var = chunked_smoother_diag(
                    None, None, None, None, ytil,
                    chunk=settings.ssm_chunk, rows=rows_of(1.0 / w),
                    blocks_fn=blocks_fn, dt=dt, pinf=pinf)
                return mean
        else:
            a, q, _pinf, hq = self._blocks(params, dt)
            h = self._h_rows(params, hq, idxs)

            def pass_mean(w, ytil):
                _nll, m_f, p_f = parallel_kalman_nll(a, q, h, 1.0 / w,
                                                     ytil)
                m_s, _p_s = parallel_smoother(a, q, m_f, p_f)
                return jnp.sum(m_s * h, axis=-1)

        def newton(f, _):
            d1, d2 = self._d12(params, ys, loc_s + f, idxs)
            w = jnp.clip(-d2, 1e-6, 1e8)
            ytil = f + d1 / w
            return pass_mean(w, ytil), None

        iters = int(getattr(settings, "ssm_laplace_iters", 15))
        f_hat, _ = lax.scan(jax.checkpoint(newton),
                            jnp.zeros_like(ys), None, length=iters)
        d1, d2 = self._d12(params, ys, loc_s + f_hat, idxs)
        w = jnp.clip(-d2, 1e-6, 1e8)
        ytil = f_hat + d1 / w
        return order, ts, idxs, dt, loc_s, ys, f_hat, w, ytil

    # -- the Laplace evidence -------------------------------------------------------
    def th_loglike_fn(self):
        def fn(params, space, inputs, outputs):
            (order, ts, idxs, dt, loc_s, ys, f_hat, w,
             ytil) = self._mode(params, inputs, outputs)
            if ts.shape[0] > settings.ssm_chunk_threshold:
                pinf, blocks_fn, rows_of = self._chunked_pieces(params,
                                                                idxs)
                _quad_pm, logdet = chunked_kalman_nll(
                    None, None, None, None, ytil,
                    chunk=settings.ssm_chunk, rows=rows_of(1.0 / w),
                    blocks_fn=blocks_fn, dt=dt, pinf=pinf, split=True)
            else:
                a, q, _pinf, hq = self._blocks(params, dt)
                h = self._h_rows(params, hq, idxs)
                _quad_pm, logdet = parallel_kalman_quad_logdet(
                    a, q, h, 1.0 / w, ytil)
            quad = jnp.sum(f_hat * w * (ytil - f_hat))
            ll_data = jnp.sum(self._ll_rows(params, ys, loc_s + f_hat,
                                            idxs))
            ll = (ll_data - 0.5 * quad
                  - 0.5 * (logdet + jnp.sum(jnp.log(w))))
            bad = ~jnp.isfinite(ll)
            return jnp.where(bad, GUARD, jnp.nan_to_num(
                ll, nan=GUARD, neginf=GUARD, posinf=GUARD))

        return fn

    def _build_fn_cached(self):
        """Stable ``(params, dt_l, aux_l) -> (a, q, pinf, h)`` callable
        for the sharded Laplace program (keys ops/ssm's jit cache)."""
        fn = getattr(self, "_sharded_build_fn", None)
        if fn is None:
            def fn(p, dt_l, aux_l):
                from ..ops.ssm import ssm_blocks_multi

                a_l, q_l, pinf, hq = ssm_blocks_multi(
                    self._leaf_sets, p, dt_l, stationary_first=False)
                ii = jnp.clip(jnp.asarray(jnp.rint(aux_l), jnp.int32),
                              0, None)
                w_mix, _b = self.f_mixing.values(p)
                h = jnp.sum(w_mix[ii][:, :, None] * hq[None], axis=1)
                return a_l, q_l, pinf, h

            self._sharded_build_fn = fn
        return fn

    def nll_distributed(self, params=None, mesh=None, axis="dp"):
        """Device-sharded Laplace objective over the TIME axis: the
        whole multi-output Newton loop as ONE SPMD program — the
        build_fn/aux form of ``ops/ssm.sharded_ssm_laplace`` (each
        device builds its block-diagonal latent stack and its rows'
        mixed emissions; the channel index rides the aux shard into the
        per-row likelihood selection).  Rides
        ``find_MAP(engine='distributed')`` unchanged."""
        if params is None:
            params = self.params
        params = {k: jnp.asarray(v) for k, v in params.items()}
        x = jnp.asarray(self.inputs, settings.dtype)
        t, idx = self._split(x)
        order = jnp.argsort(t)
        ts = t[order]
        ys = jnp.asarray(self.outputs, settings.dtype)[order]
        loc_s = self._loc_bias(params, x)[order]
        dt = jnp.concatenate([jnp.zeros(1, settings.dtype),
                              jnp.diff(ts)])
        ll = sharded_ssm_laplace(
            None, params, dt, ys, loc_s, self._d12_aux, self._ll_aux,
            iters=int(getattr(settings, "ssm_laplace_iters", 15)),
            mesh=mesh, axis=axis, build_fn=self._build_fn_cached(),
            aux=jnp.asarray(idx[order], settings.dtype))
        return -ll

    # -- Laplace posterior at query rows ----------------------------------------------
    def _run_smoother(self, params, xq, inputs, outputs):
        """Smoothed Laplace-posterior MIXED moments (without
        location/bias) at query rows ``xq`` (nq, 2): one extra smoothing
        pass over the pseudo-observations at the mode with the query
        rows merged in unobserved.  Same signature as the Gaussian
        family's — every inherited statistic (th_location,
        th_kernel_diag, ...) rides it unchanged."""
        (_order, ts, idxs_obs, _dt, _loc, _ys, _f, w,
         ytil) = self._mode(params, inputs, outputs)
        tq, idxq = self._split(xq)
        n_obs = ts.shape[0]
        t_all = jnp.concatenate([ts, tq])
        idx_all = jnp.concatenate([idxs_obs, idxq])
        y_all = jnp.concatenate([ytil, jnp.zeros_like(tq)])
        r_all = jnp.concatenate([1.0 / w,
                                 jnp.ones(tq.shape[0], settings.dtype)])
        obs = jnp.concatenate([jnp.ones(n_obs, bool),
                               jnp.zeros(tq.shape[0], bool)])
        order2 = jnp.argsort(t_all)
        ts2, ys2, rs2, os2 = (t_all[order2], y_all[order2],
                              r_all[order2], obs[order2])
        idxs2 = idx_all[order2]
        dt = jnp.concatenate([jnp.zeros(1, settings.dtype),
                              jnp.diff(ts2)])
        if ts2.shape[0] > settings.ssm_chunk_threshold:
            pinf, blocks_fn, rows_of = self._chunked_pieces(params,
                                                            idxs2)
            mean, var = chunked_smoother_diag(
                None, None, None, None, ys2, os2,
                chunk=settings.ssm_chunk, rows=rows_of(rs2),
                blocks_fn=blocks_fn, dt=dt, pinf=pinf)
        else:
            a, q, _pinf, hq = self._blocks(params, dt)
            h = self._h_rows(params, hq, idxs2)
            m_f, p_f = parallel_kalman_filter(a, q, h, rs2, ys2, os2)
            m_s, p_s = parallel_smoother(a, q, m_f, p_f)
            mean = jnp.sum(m_s * h, axis=-1)
            var = jnp.sum(jnp.sum(p_s * h[:, None, :], axis=-1) * h,
                          axis=-1)
        inv = jnp.argsort(order2)
        qpos = inv[n_obs:]
        return mean[qpos], jnp.maximum(var[qpos], zero32)

    # -- statistics through the likelihoods (SVP semantics) ---------------------------
    def _pred_moments_rows(self, params, idx, mf, vf):
        outs = [lik.predictive_moments(params, mf, vf)
                for lik in self.f_likelihoods]
        li = self._lik_idx(idx)
        return (self._select_rows([o[0] for o in outs], li),
                self._select_rows([o[1] for o in outs], li))

    def th_mean(self, prior=False, noise=False, simulations=None):
        def fn(params, space, inputs, outputs, vector):
            _t, idx = self._split(space)
            if prior:
                mf = self._loc_bias(params, space)
                vf = self._prior_diag(params, space)
            else:
                m, vf = self._run_smoother(params, space, inputs,
                                           outputs)
                mf = self._loc_bias(params, space) + m
            return self._pred_moments_rows(params, idx, mf, vf)[0]

        return fn

    def th_median(self, prior=False, noise=False, simulations=None):
        if any(isinstance(lik, (BernoulliLik, PoissonLik, OrdinalLik))
               for lik in self.f_likelihoods):
            return None
        return self.th_mean(prior=prior, noise=noise)

    def th_variance(self, prior=False, noise=False, simulations=None):
        def fn(params, space, inputs, outputs, vector):
            _t, idx = self._split(space)
            if prior:
                mf = self._loc_bias(params, space)
                vf = self._prior_diag(params, space)
            else:
                m, vf = self._run_smoother(params, space, inputs,
                                           outputs)
                mf = self._loc_bias(params, space) + m
            if noise:
                return self._pred_moments_rows(params, idx, mf, vf)[1]
            return vf

        return fn

    def th_logpredictive(self, prior=False, noise=False):
        """log E[p(y* | g*)] per query row through the row's own channel
        likelihood (Gauss-Hermite log-sum-exp), summed."""
        def fn(params, space, inputs, outputs, vector):
            _t, idx = self._split(space)
            if prior:
                mf = self._loc_bias(params, space)
                vf = self._prior_diag(params, space)
            else:
                m, vf = self._run_smoother(params, space, inputs,
                                           outputs)
                mf = self._loc_bias(params, space) + m
            y = jnp.asarray(vector)
            pers = []
            for lik in self.f_likelihoods:
                f, wq = lik._grid(mf, vf)
                lp = lik.logp_elem(params, y[None, :], f)
                pers.append(logsumexp(
                    lp, axis=0, b=jnp.maximum(wq, 1e-30)[:, None]))
            li = self._lik_idx(idx)
            return jnp.sum(self._select_rows(pers, li))

        return fn

    # -- sampling / quantiles ---------------------------------------------------------
    def _joint_draws(self, params, xq, inputs, outputs, samples, seed,
                     prior=False):
        """JOINT mixed-latent draws (nq, samples) under the Laplace
        posterior: the per-row-emission simulation smoother on the
        pseudo-observation model at the mode (prior=True: exact prior
        paths)."""
        key = jax.random.PRNGKey(seed)
        if prior:
            return MultiStateSpaceGP._joint_draws(
                self, params, xq, inputs, outputs, samples, seed,
                prior=True)
        tq, idxq = self._split(xq)
        (_order, ts, idxs_obs, _dt, _loc, _ys, _f, w,
         ytil) = self._mode(params, inputs, outputs)
        n_obs = ts.shape[0]
        t_all = jnp.concatenate([ts, tq])
        idx_all = jnp.concatenate([idxs_obs, idxq])
        y_all = jnp.concatenate([ytil, jnp.zeros_like(tq)])
        r_all = jnp.concatenate([1.0 / w,
                                 jnp.ones(tq.shape[0], settings.dtype)])
        obs = jnp.concatenate([jnp.ones(n_obs, bool),
                               jnp.zeros(tq.shape[0], bool)])
        order2 = jnp.argsort(t_all)
        ts2, ys2, rs2, os2 = (t_all[order2], y_all[order2],
                              r_all[order2], obs[order2])
        idxs2 = idx_all[order2]
        dt = jnp.concatenate([jnp.zeros(1, settings.dtype),
                              jnp.diff(ts2)])
        a, q, _pinf, hq = self._blocks(params, dt)
        h = self._h_rows(params, hq, idxs2)
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
        """JOINT latent paths g = loc + b_p + mixed f (``noise=True``:
        then y | g drawn through each row's channel likelihood)."""
        if params is None:
            params = self.params
        if space is None:
            space = self.space
        if inputs is None:
            inputs = self._inputs
        if outputs is None:
            outputs = self._outputs
        pj = {k: jnp.asarray(v) for k, v in params.items()}
        xq = jnp.asarray(np.asarray(space, settings.floatx),
                         settings.dtype)
        f = np.asarray(self._joint_draws(pj, xq, inputs, outputs,
                                         int(samples), int(seed),
                                         prior=prior))
        f = f + np.asarray(self._loc_bias(pj, xq))[:, None]
        if not noise:
            return f
        if rng is None:
            rng = np.random.default_rng(seed + 1)
        idx = np.rint(np.asarray(space)[:, 1]).astype(np.int64)
        li = (idx if len(self.f_likelihoods) > 1
              else np.zeros_like(idx))
        out = np.empty_like(f)
        for j, lik in enumerate(self.f_likelihoods):
            mask = li == j
            if np.any(mask):
                out[mask] = sample_conditional(lik, params, f[mask], rng)
        return out

    def quantiler(self, params=None, space=None, inputs=None,
                  outputs=None, q=0.975, prior=False, noise=False,
                  simulations=None):
        """Latent-normal quantiles pushed through each row's monotone
        link; Monte-Carlo through the likelihoods for ``noise=True``
        (the SVP conventions, per channel)."""
        from scipy import stats
        from ..hypers import hval

        if params is None:
            params = self.params
        if space is None:
            space = self.space
        all_gauss = all(isinstance(lik, GaussianLik)
                        for lik in self.f_likelihoods)
        if all_gauss or not noise:
            mu = np.asarray(self.location(params, space, inputs,
                                          outputs, prior=prior))
            var = np.asarray(self.kernel_diag(params, space, inputs,
                                              outputs, prior=prior))
            if noise:
                pj = {k: np.asarray(v) for k, v in params.items()}
                nv = np.array([float(np.maximum(
                    hval(lik.var, pj), 1e-10))
                    for lik in self.f_likelihoods])
                idx = np.rint(np.asarray(space)[:, 1]).astype(np.int64)
                li = (idx if len(self.f_likelihoods) > 1
                      else np.zeros_like(idx))
                var = var + nv[li]
            out = stats.norm.ppf(q, loc=mu, scale=np.sqrt(
                np.maximum(var, 1e-12)))
            if not all_gauss:
                idx = np.rint(np.asarray(space)[:, 1]).astype(np.int64)
                li = (idx if len(self.f_likelihoods) > 1
                      else np.zeros_like(idx))
                for j, lik in enumerate(self.f_likelihoods):
                    mask = li == j
                    if not np.any(mask):
                        continue
                    if isinstance(lik, BernoulliLik):
                        out[mask] = stats.norm.cdf(out[mask])
                    elif isinstance(lik, PoissonLik):
                        out[mask] = np.exp(np.clip(out[mask], -30, 30))
            return out
        draws = self.sampler(params, space, inputs, outputs,
                             samples=500, prior=prior, noise=True,
                             rng=np.random.default_rng(7))
        return np.quantile(draws, q, axis=1)


NGMSSGP = NonGaussianMultiSSGP


class NonGaussianSTSSGP(NonGaussianMultiSSGP):
    """SPATIO-TEMPORAL non-Gaussian observations on the exact separable
    space-time prior — with ``PoissonLik`` (the default) a discretized
    spatio-temporal LOG-GAUSSIAN COX PROCESS: counts y(t, site) observed
    at m spatial sites with intensity exp(loc(t) + b_site + f(t, x)),
    where f is the separable k_t * k_s GP, EXACT and linear in the
    total event count.

    The construction composes the two families this module and
    models/spatiotemporal.py already pin: the separable space-time GP
    IS a MultiStateSpaceGP with DERIVED mixing W = chol(K_s(sites))
    (Sarkka/Solin/Hartikainen 2013), and non-Gaussian observations ride
    the per-row-emission Laplace Newton loop of
    :class:`NonGaussianMultiSSGP` unchanged — the spatial kernel's
    hypers train through safe_cholesky's VJP inside every smoothing
    pass.  ``field(t, x)`` gives the latent surface at ARBITRARY
    spatial points and ``field_rate(t, x)`` pushes it through the
    likelihood (the posterior intensity surface); both run the smoother
    with explicit interpolation-weight emission rows.

    Rows are ``(t, site_index)``; ``sites`` (m, d_s) the coordinates
    the spatial kernel sees; one likelihood shared by all sites.  Keep
    m at tens of sites (state dim S = m * s_t).  Per-site biases are
    sensor-level (detector efficiency) and excluded from the field,
    matching :class:`~g3py_tpu.models.spatiotemporal.SpatioTemporalSSGP`
    semantics.  All NonGaussianMultiSSGP scaling paths (chunked
    beyond-HBM, ``nll_distributed`` time-axis sharding) are inherited.

    >>> st = g3.NonGaussianSTSSGP(space=x, kernel=g3.MAT32(t),
    ...                           space_kernel=g3.SE(sites), sites=sites,
    ...                           likelihood=g3.PoissonLik())
    >>> st.observed(x, counts); p = st.find_MAP()
    >>> lam, _ = st.field_rate(tq, xq, params=p)   # intensity anywhere

    The reference has no spatio-temporal, no multi-output AND no
    non-Gaussian observation models; its closest tool (dense WGP) is
    O(n^3) and Gaussian-copula only."""

    def __init__(self, space=None, location=None, kernel=None,
                 space_kernel=None, sites=None, likelihood=None,
                 harmonics=None, *args, **kwargs):
        from ..hypers.means import Zero
        from ..ops.ssm import ssm_leaves
        from .likelihoods import Likelihood
        from .spatiotemporal import SpatialMixing
        from .stochastic import StochasticProcess

        if space_kernel is None or sites is None:
            raise ValueError(
                "NonGaussianSTSSGP needs space_kernel= (a Kernel over "
                "the site coordinates) and sites= (m, d_s)")
        sites = np.asarray(sites, settings.floatx)
        if sites.ndim == 1:
            sites = sites[:, None]
        m_sites = int(sites.shape[0])
        self.n_outputs = m_sites
        self.n_latents = m_sites
        self._shared_kernel = True
        self.f_kernels = (kernel,)
        shared = ssm_leaves(kernel, harmonics=harmonics)
        self._leaf_sets = [shared] * m_sites
        self.f_location = location if location is not None else Zero()
        self.f_space_kernel = space_kernel
        self.f_mixing = SpatialMixing(space_kernel, sites)
        if likelihood is None:
            likelihood = PoissonLik()
        if isinstance(likelihood, (list, tuple)) or not isinstance(
                likelihood, Likelihood):
            raise ValueError(
                "the spatio-temporal family shares ONE likelihood "
                "across sites (per-site lists belong to "
                "NonGaussianMultiSSGP); got "
                f"{type(likelihood).__name__}")
        self.f_likelihoods = (likelihood,)
        kwargs["space"] = space
        if "name" not in kwargs:
            kwargs["name"] = "NGSTSSGP"
        StochasticProcess.__init__(self, *args, **kwargs)

    # -- registration (STSSGP's, with the likelihood tuple) ----------------------
    def _components(self):
        return ([self.f_location, self.f_kernels[0], self.f_space_kernel,
                 self.f_mixing] + list(self.f_likelihoods))

    def _check_hypers(self):
        feats = self._features(self.inputs)
        self.f_location.check_dims(feats)
        self.f_kernels[0].check_dims(feats)
        self.f_space_kernel.check_dims(self.f_mixing.sites)
        for comp in self._components():
            comp.check_hypers(self.name + "_")

    def default_hypers(self):
        feats = self._features(self.inputs)
        z = self._latent_targets()
        out = {}
        out.update(self.f_location.default_hypers_dims(feats, z))
        out.update(self.f_kernels[0].default_hypers_dims(feats, z))
        out.update(self.f_space_kernel.default_hypers_dims(
            self.f_mixing.sites, z))
        out.update(self.f_mixing.default_hypers(self.inputs, z))
        for j, lik in enumerate(self.f_likelihoods):
            out.update(lik.default_hypers(y=self._channel_targets(j)))
        return out

    # -- off-site field: STSSGP's algebra on the Laplace pseudo-model -------------
    from .spatiotemporal import SpatioTemporalSSGP as _ST

    _kt0 = _ST._kt0
    _interp = _ST._interp
    field = _ST.field
    task_correlations = _ST.task_correlations
    del _ST

    def _run_smoother_weights(self, params, tq, wrows, inputs, outputs):
        """Smoothed LAPLACE-posterior mixed moments at query times whose
        emission vectors come from EXPLICIT latent-weight rows (off-site
        interpolation): the pseudo-observations at the mode replace the
        Gaussian residuals of the conjugate family's version."""
        (_order, ts, idxs_obs, _dt, _loc, _ys, _f, w,
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
        a, q, _pinf, hq = self._blocks(params, dt)
        w_mix, _b = self.f_mixing.values(params)
        wall = jnp.concatenate([w_mix[idxs_obs], wrows])[order2]
        h = jnp.sum(wall[:, :, None] * hq[None], axis=1)
        m_f, p_f = parallel_kalman_filter(a, q, h, rs2, ys2, os2)
        m_s, p_s = parallel_smoother(a, q, m_f, p_f)
        mean = jnp.sum(m_s * h, axis=-1)
        var = jnp.sum(jnp.sum(p_s * h[:, None, :], axis=-1) * h,
                      axis=-1)
        inv = jnp.argsort(order2)
        qpos = inv[n_obs:]
        return mean[qpos], jnp.maximum(var[qpos], zero32)

    def field_rate(self, t, x, params=None, inputs=None, outputs=None,
                   prior=False):
        """Predictive observation mean AND variance through the shared
        likelihood at arbitrary space-time points — for ``PoissonLik``
        the posterior intensity surface of the Cox process (per-site
        biases excluded, as in ``field``)."""
        if params is None:
            params = self.params
        mean, var = self.field(t, x, params=params, inputs=inputs,
                               outputs=outputs, prior=prior)
        pj = {k: jnp.asarray(v) for k, v in params.items()}
        m, v = self.f_likelihoods[0].predictive_moments(
            pj, jnp.asarray(mean, settings.dtype),
            jnp.asarray(var, settings.dtype))
        return np.asarray(m), np.asarray(v)


NGSTSSGP = NonGaussianSTSSGP
