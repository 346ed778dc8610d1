"""State-space GP: exact O(n) inference for 1-D Matern-family kernels.

The TPU-native scaling answer for TIME SERIES — the workload the
reference's own tutorial datasets are (sunspots, CO2, EURUSD;
reference data.py:11-118): an OU / Matern-3/2 / Matern-5/2 GP (or any
sum of them) is rewritten as its exact linear-Gaussian state-space model
(ops/ssm.py) and the NLL / posterior are computed by PARALLEL-in-time
Kalman filtering and smoothing (``jax.lax.associative_scan``, O(log n)
depth).  Exact GP regression at N = 1e6 costs milliseconds where the
dense path's O(n^3) Cholesky is beyond any hardware, and unlike the
sparse families there is NO approximation: the NLL equals the dense
``mvn_quad_logdet`` NLL to float32 rounding (tested).

>>> ssgp = g3.StateSpaceGP(space=t, kernel=g3.MAT32(t) + g3.OU(t))
>>> ssgp.observed(t, y)                     # t (n, 1), any spacing, any n
>>> params = ssgp.find_MAP()                # exact marginal likelihood
>>> ssgp.predict(params, space=t_query)     # smoothed mean / bands

The full model API rides the standard machinery: ``find_MAP``,
``sample_hypers`` (the loglike is just another pure jitted function),
``scores``/``Experiment``, ``predictor()`` serving.  Observation noise is
a :class:`~g3py_tpu.hypers.kernels.KernelNoise` hyper so the param names
mirror the dense ``GP(noisy=True)`` construction.

Statistics semantics match the dense GP: ``location``/``mean`` are the
posterior (or prior) latent mean, ``variance`` the latent marginal
variance (``noise=True`` adds the observation noise), ``logpredictive``
the per-point predictive density (the dense family's statistic is
likewise diagonal — reference gaussian.py:42-54).  Full posterior
COVARIANCE between arbitrary query pairs is not a state-space-sized
object; the ``covariance`` statistic is unbound (``th_covariance`` raises
at probe time — the same convention the warped family uses for its
closed-form-less covariance, stochastic.py:827-831).
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..config import settings
from ..hypers import hval
from ..hypers.kernels import KernelNoise
from ..hypers.means import Zero
from ..ops.guards import to_num
from ..ops.ssm import (ssm_leaves, ssm_blocks, parallel_kalman_nll,
                       chunked_kalman_nll, chunked_smoother_diag,
                       sharded_ssm_nll, parallel_kalman_filter,
                       parallel_smoother, ssm_prior_state_sample, LOG2PI)
from .gaussian import GUARD
from .stochastic import StochasticProcess, zero32

__all__ = ["StateSpaceGP", "SSGP"]


class StateSpaceGP(StochasticProcess):
    """Exact 1-D Markovian GP via parallel Kalman filtering/smoothing."""

    def __init__(self, space=None, location=None, kernel=None,
                 harmonics=None, *args, **kwargs):
        self.f_location = location if location is not None else Zero()
        self.f_kernel = kernel
        # validates the kernel tree; ``harmonics`` truncates the SIN
        # (periodic) leaf's cosine expansion (default settings.ssm_harmonics)
        self._leaves = ssm_leaves(kernel, harmonics=harmonics)
        # name matches the dense GP(noisy=True) wrapper (elliptical.py:74)
        # so param dicts transfer between the two families verbatim
        self.f_noise = KernelNoise(name="Noise")
        kwargs["space"] = space
        if "name" not in kwargs:
            kwargs["name"] = "SSGP"
        super().__init__(*args, **kwargs)

    # -- registration ----------------------------------------------------------
    def _components(self):
        return [self.f_location, self.f_kernel, self.f_noise]

    def _check_hypers(self):
        for comp in self._components():
            comp.check_dims(self.inputs)
            comp.check_hypers(self.name + "_")

    def default_hypers(self):
        out = {}
        for comp in self._components():
            # dims-aware walk: KernelComposition only merges children via
            # default_hypers_dims (kernels.py:281-285), so a sum kernel's
            # data-driven defaults need this entry point (as the dense
            # family uses, elliptical.py:99-108)
            out.update(comp.default_hypers_dims(self.inputs, self.outputs))
        return out

    def observed(self, inputs=None, outputs=None, order=None, index=None,
                 hidden=None):
        out = super().observed(inputs=inputs, outputs=outputs, order=order,
                               index=index, hidden=hidden)
        x = np.asarray(self._inputs)
        if x.ndim == 2 and x.shape[1] != 1:
            raise ValueError(
                "StateSpaceGP is a 1-D (time) model; inputs must be "
                f"(n, 1), got {x.shape} — for multi-D use the dense/"
                "sparse families")
        return out

    # -- core SSM pieces ---------------------------------------------------------
    def _noise_var(self, params):
        return jnp.maximum(hval(self.f_noise.var, params),
                           jnp.asarray(1e-10, settings.dtype))

    def _run_smoother(self, params, tq, inputs, outputs):
        """Joint filter+smoother over observed times merged with query
        times ``tq`` (no-observation rows): returns the smoothed latent
        mean and variance AT THE QUERY POINTS, residualized location
        added back by the caller."""
        tobs = jnp.asarray(inputs, settings.dtype)[:, 0]
        yres = (jnp.asarray(outputs, settings.dtype)
                - self.f_location(params, inputs))
        tq = jnp.asarray(tq, settings.dtype)
        n_obs = tobs.shape[0]
        t_all = jnp.concatenate([tobs, tq])
        y_all = jnp.concatenate([yres, jnp.zeros_like(tq)])
        obs = jnp.concatenate([jnp.ones(n_obs, bool),
                               jnp.zeros(tq.shape[0], bool)])
        order = jnp.argsort(t_all)
        ts, ys, os_ = t_all[order], y_all[order], obs[order]
        dt = jnp.concatenate([jnp.zeros(1, settings.dtype), jnp.diff(ts)])
        a, q, _pinf, h = ssm_blocks(self._leaves, params, dt)
        r = self._noise_var(params)
        if ts.shape[0] > settings.ssm_chunk_threshold:
            # beyond-HBM serving: O(chunk)-memory two-pass smoother
            mean, var = chunked_smoother_diag(a, q, h, r, ys, os_,
                                              chunk=settings.ssm_chunk)
        else:
            _nll, m_f, p_f = parallel_kalman_nll(a, q, h, r, ys, os_)
            m_s, p_s = parallel_smoother(a, q, m_f, p_f)
            # tiny-axis reductions stay on the VPU in full f32 (ssm._bmm)
            mean = jnp.sum(m_s * h, axis=-1)
            var = jnp.sum(jnp.sum(p_s * h, axis=-1) * h, axis=-1)
        inv = jnp.argsort(order)
        qpos = inv[n_obs:]
        return mean[qpos], jnp.maximum(var[qpos], zero32)

    def _prior_diag(self, params, nq):
        """Stationary variance H Pinf H' (the prior marginal at any t)."""
        dt0 = jnp.zeros(1, settings.dtype)
        _a, _q, pinf, h = ssm_blocks(self._leaves, params, dt0)
        v = jnp.sum(jnp.sum(pinf * h, axis=-1) * h)
        return jnp.broadcast_to(v, (nq,))

    # -- the exact marginal likelihood --------------------------------------------
    def th_loglike_fn(self):
        def fn(params, space, inputs, outputs):
            t = jnp.asarray(inputs, settings.dtype)[:, 0]
            order = jnp.argsort(t)
            ts = t[order]
            ys = (jnp.asarray(outputs, settings.dtype)
                  - self.f_location(params, inputs))[order]
            dt = jnp.concatenate([jnp.zeros(1, settings.dtype),
                                  jnp.diff(ts)])
            a, q, _pinf, h = ssm_blocks(self._leaves, params, dt)
            if ts.shape[0] > settings.ssm_chunk_threshold:
                # beyond-HBM training path: chunked monoid scan keeps
                # backward memory at O(ssm_chunk) (ops/ssm.py docstring)
                nll = chunked_kalman_nll(a, q, h, self._noise_var(params),
                                         ys, chunk=settings.ssm_chunk)
            else:
                nll, _, _ = parallel_kalman_nll(a, q, h,
                                                self._noise_var(params), ys)
            ll = -nll
            bad = ~jnp.isfinite(ll)
            return jnp.where(bad, GUARD, to_num(ll, nan=GUARD,
                                                neginf=GUARD))

        return fn

    def nll_distributed(self, params=None, mesh=None, axis="dp"):
        """Device-sharded exact negative loglikelihood over the TIME axis
        (``ops/ssm.sharded_ssm_nll``): each device builds the state
        blocks for its own rows and scans them locally; the cross-device
        traffic is one all_gather of D tiny (s, s) monoid totals plus a
        scalar psum.  The multi-chip counterpart of the dense family's
        ``nll_distributed`` (gaussian.py:245) — but where the dense
        objective shards an O(n^2) gram, here the sharded object is the
        O(n s^2) element stream, so N scales linearly with the mesh.

        Matches ``-loglike(params)`` (no hyper priors) to f32 rounding;
        differentiable w.r.t. ``params``; rides
        ``find_MAP(engine='distributed')`` unchanged."""
        if params is None:
            params = self.params
        params = {k: jnp.asarray(v) for k, v in params.items()}
        x = jnp.asarray(self.inputs, settings.dtype)
        t = x[:, 0]
        order = jnp.argsort(t)
        ts = t[order]
        ys = (jnp.asarray(self.outputs, settings.dtype)
              - self.f_location(params, x))[order]
        dt = jnp.concatenate([jnp.zeros(1, settings.dtype), jnp.diff(ts)])
        return sharded_ssm_nll(self._leaves, params, dt,
                               self._noise_var(params), ys,
                               mesh=mesh, axis=axis)

    # -- moment statistics ----------------------------------------------------------
    def th_location(self, prior=False, noise=False):
        if prior:
            def fn(params, space, inputs, outputs, vector):
                return self.f_location(params, space)
        else:
            def fn(params, space, inputs, outputs, vector):
                m, _v = self._run_smoother(params, space[:, 0], inputs,
                                           outputs)
                return self.f_location(params, space) + m
        return fn

    def th_kernel_diag(self, prior=False, noise=False):
        if prior:
            def fn(params, space, inputs, outputs, vector):
                return self._prior_diag(params, jnp.shape(space)[0])
        else:
            def fn(params, space, inputs, outputs, vector):
                return self._run_smoother(params, space[:, 0], inputs,
                                          outputs)[1]
        return fn

    def th_mean(self, prior=False, noise=False, simulations=None):
        return self.th_location(prior=prior)

    def th_median(self, prior=False, noise=False, simulations=None):
        return self.th_location(prior=prior)

    def th_variance(self, prior=False, noise=False, simulations=None):
        def fn(params, space, inputs, outputs, vector):
            if prior:
                v = self._prior_diag(params, jnp.shape(space)[0])
            else:
                v = self._run_smoother(params, space[:, 0], inputs,
                                       outputs)[1]
            if noise:
                v = v + self._noise_var(params)
            return v

        return fn

    def th_covariance(self, prior=False, noise=False):
        raise ValueError(
            "StateSpaceGP has no O(n)-sized full posterior covariance "
            "(the smoother carries marginals and one-step cross terms); "
            "use variance/std for bands or sampler for joint structure — "
            "or the dense GP at small n")

    def th_logpredictive(self, prior=False, noise=False):
        """Pointwise predictive density sum_i log N(y_i; m_i, v_i + r)
        (diagonal, matching the dense family's statistic)."""

        def fn(params, space, inputs, outputs, vector):
            if prior:
                m = self.f_location(params, space)
                v = self._prior_diag(params, jnp.shape(space)[0])
            else:
                m, v = self._run_smoother(params, space[:, 0], inputs,
                                          outputs)
                m = m + self.f_location(params, space)
            tot = v + self._noise_var(params)
            y = jnp.asarray(vector, settings.dtype)
            return jnp.sum(-0.5 * (LOG2PI + jnp.log(tot))
                           - 0.5 * (y - m) ** 2 / tot)

        return fn

    _dispatch_methods = dict(
        StochasticProcess._dispatch_methods,
        location="th_location",
        kernel_diag="th_kernel_diag",
    )

    # -- serving ----------------------------------------------------------------------
    def posterior_state(self, params=None):
        """Like the variational family, the serving state is the params
        themselves (the filter re-runs per query batch at O(n) cost);
        ``predictor()`` bakes params+data into fused jitted statistics."""
        return {}

    def predictor(self, params=None):
        from .predictor import Predictor

        return Predictor(self, params)

    # -- joint sampling (simulation smoother) ------------------------------------
    def _joint_draws(self, params, tq, inputs, outputs, samples, seed,
                     prior=False):
        """(nq, samples) JOINT draws of the latent f at query times via
        the Matheron simulation smoother: simulate prior state
        trajectories x' (one associative scan each), filter+smooth their
        synthetic observations y' = Hx' + e alongside the data, and
        return m_s(y) + H(x' - m_s'(y')) — exact joint posterior draws
        in O(n) work, the state-space counterpart of the dense family's
        pathwise Matheron sampling (models/predictor.py)."""
        tq = jnp.asarray(tq, settings.dtype)
        key = jax.random.PRNGKey(seed)
        r = self._noise_var(params)
        if prior:
            dt = jnp.concatenate([jnp.zeros(1, settings.dtype),
                                  jnp.diff(tq)])
            a, q, _pinf, h = ssm_blocks(self._leaves, params, dt)
            keys = jax.random.split(key, samples)
            xs = jax.vmap(lambda k: ssm_prior_state_sample(a, q, k))(keys)
            return jnp.einsum("sni,i->ns", xs, h)
        tobs = jnp.asarray(inputs, settings.dtype)[:, 0]
        yres = (jnp.asarray(outputs, settings.dtype)
                - self.f_location(params, inputs))
        n_obs = tobs.shape[0]
        t_all = jnp.concatenate([tobs, tq])
        y_all = jnp.concatenate([yres, jnp.zeros_like(tq)])
        obs = jnp.concatenate([jnp.ones(n_obs, bool),
                               jnp.zeros(tq.shape[0], bool)])
        order = jnp.argsort(t_all)
        ts, ys, os_ = t_all[order], y_all[order], obs[order]
        dt = jnp.concatenate([jnp.zeros(1, settings.dtype), jnp.diff(ts)])
        a, q, _pinf, h = ssm_blocks(self._leaves, params, dt)
        m_f, p_f = parallel_kalman_filter(a, q, h, r, ys, os_)
        m_s, _ = parallel_smoother(a, q, m_f, p_f)

        def one(k):
            k1, k2 = jax.random.split(k)
            x = ssm_prior_state_sample(a, q, k1)
            yprime = (jnp.sum(x * h, axis=-1)
                      + jnp.sqrt(r) * jax.random.normal(
                          k2, ys.shape, dtype=ys.dtype))
            mfp, pfp = parallel_kalman_filter(a, q, h, r, yprime, os_)
            msp, _ = parallel_smoother(a, q, mfp, pfp)
            return jnp.sum((m_s + x - msp) * h, axis=-1)

        draws = jax.vmap(one)(jax.random.split(key, samples))   # (S, n)
        inv = jnp.argsort(order)
        return draws[:, inv[n_obs:]].T                          # (nq, S)

    # -- host-side sampling / quantiles ---------------------------------------------
    def sampler(self, params=None, space=None, inputs=None, outputs=None,
                samples=1, prior=False, noise=False, rng=None, seed=0):
        """(n, samples) JOINT draws of f (``noise=True`` adds the
        observation noise per row) at the query times — rows are coupled
        through the exact posterior (simulation smoother), matching the
        dense family's joint sampler semantics."""
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
        if noise:
            if rng is None:
                rng = np.random.default_rng(seed + 1)
            s2 = float(np.maximum(np.asarray(hval(self.f_noise.var, pj)),
                                  1e-10))
            f = f + np.sqrt(s2) * rng.standard_normal(f.shape).astype(
                settings.floatx)
        return f

    def quantiler(self, params=None, space=None, inputs=None, outputs=None,
                  q=0.975, prior=False, noise=False, simulations=None):
        from scipy import stats

        if params is None:
            params = self.params
        if space is None:
            space = self.space
        m = np.asarray(self.location(params, space, inputs, outputs,
                                     prior=prior))
        v = np.maximum(np.asarray(
            self.kernel_diag(params, space, inputs, outputs, prior=prior)),
            0.0)
        if noise:
            pj = {k: np.asarray(vv) for k, vv in params.items()}
            v = v + float(np.maximum(hval(self.f_noise.var, pj), 1e-10))
        return stats.norm.ppf(q, loc=m, scale=np.sqrt(np.maximum(v,
                                                                 1e-12)))


SSGP = StateSpaceGP
