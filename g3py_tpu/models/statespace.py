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
from ..ops.ssm import (ssm_leaves, ssm_blocks, ssm_blocks_multi,
                       parallel_kalman_nll,
                       chunked_kalman_nll, chunked_smoother_diag,
                       sharded_ssm_nll, sharded_ssm_nll_multi,
                       parallel_kalman_filter,
                       parallel_smoother, ssm_prior_state_sample, LOG2PI)
from .gaussian import GUARD
from .stochastic import StochasticProcess, zero32

__all__ = ["StateSpaceGP", "SSGP", "MultiStateSpaceGP", "LMCSSGP"]


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
        r = self._noise_var(params)
        if ts.shape[0] > settings.ssm_chunk_threshold:
            # beyond-HBM serving: O(chunk)-memory two-pass smoother with
            # per-block (A, Q) construction — the (n, s, s) transition
            # stacks never materialize
            _a0, _q0, pinf, h = ssm_blocks(self._leaves, params,
                                           jnp.zeros(1, settings.dtype))
            mean, var = chunked_smoother_diag(
                None, None, h, r, ys, os_, chunk=settings.ssm_chunk,
                blocks_fn=lambda d: ssm_blocks(
                    self._leaves, params, d, stationary_first=False)[:2],
                dt=dt, pinf=pinf)
        else:
            a, q, _pinf, h = ssm_blocks(self._leaves, params, dt)
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
            if ts.shape[0] > settings.ssm_chunk_threshold:
                # beyond-HBM training path: chunked monoid scan keeps
                # backward memory at O(ssm_chunk), and per-block (A, Q)
                # construction keeps the forward there too (the
                # (n, s, s) stacks never materialize)
                _a0, _q0, pinf, h = ssm_blocks(
                    self._leaves, params, jnp.zeros(1, settings.dtype))
                nll = chunked_kalman_nll(
                    None, None, h, self._noise_var(params), ys,
                    chunk=settings.ssm_chunk,
                    blocks_fn=lambda d: ssm_blocks(
                        self._leaves, params, d,
                        stationary_first=False)[:2],
                    dt=dt, pinf=pinf)
            else:
                a, q, _pinf, h = ssm_blocks(self._leaves, params, dt)
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
            # sort (like the posterior branch): negative dt makes
            # exp(-lam*dt) > 1 and Q indefinite -> NaN draws
            order = jnp.argsort(tq)
            dt = jnp.concatenate([jnp.zeros(1, settings.dtype),
                                  jnp.diff(tq[order])])
            a, q, _pinf, h = ssm_blocks(self._leaves, params, dt)
            keys = jax.random.split(key, samples)
            xs = jax.vmap(lambda k: ssm_prior_state_sample(a, q, k))(keys)
            # tiny state-axis reduction on the VPU in full f32 (ssm._bmm
            # rationale) — einsum would round through bf16
            f = jnp.sum(xs * h, axis=-1).T                      # (nq, S)
            return f[jnp.argsort(order)]
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


class MultiStateSpaceGP(StateSpaceGP):
    """Exact O(n) MULTI-OUTPUT time-series GP: P observed channels are
    linear mixtures of Q independent Markovian latent GPs,

        g_p(t) = loc(t) + b_p + sum_q W[p, q] f_q(t),
        y ~ N(g_p(t), s2_p),

    with the LMC mixing ``W`` (P, Q), per-output biases and per-output
    noise variances all trainable hypers (the same
    :class:`~g3py_tpu.models.lmc.Mixing` /
    :class:`~g3py_tpu.models.lmc.MultiGaussianLik` components the sparse
    LMC family uses).  The joint state stacks the Q latent SSMs
    block-diagonally (``ops/ssm.ssm_blocks_multi``); every event row
    observes ONE channel through its own emission vector
    ``h_k = sum_q W[p_k, q] H_q`` — so channels may be sampled at
    completely different (irregular) times, and inference stays the
    scalar-measurement parallel Kalman filter at O(n log n) depth with
    state dim ``S = sum_q s_q``.

    The reference's only multi-output story is the dense ICM index-kernel
    algebra (reference kernels.py:262-290) at O((sum n_p)^3); here the
    exact multi-output NLL is linear in the total event count.  Unlike
    :class:`LMCSVP` (sparse, approximate) this family is EXACT and keeps
    the Kalman scaling of :class:`StateSpaceGP`.

    Data convention matches the LMC row format restricted to 1-D time:
    rows are ``(t, output_index)`` (build with
    :func:`~g3py_tpu.models.lmc.with_output` /
    :func:`~g3py_tpu.models.lmc.stack_outputs`).

    >>> x, y = g3.stack_outputs([t0, t1], [y0, y1])    # 2 channels
    >>> m = g3.MultiStateSpaceGP(space=x, kernel=[g3.MAT32(t0[:, None]),
    ...                                           g3.OU(t0[:, None])],
    ...                          outputs_dim=2)
    >>> m.observed(x, y); params = m.find_MAP()
    >>> m.mean(params, g3.with_output(tq, 1))          # channel 1 at tq
    >>> m.task_correlations(params)                    # learned (P, P)

    ``kernel``: one Kernel shared by all Q latents, or a list of Q
    kernels (each latent its own dynamics — the full LMC).  The whole
    scaling story carries over: past ``settings.ssm_chunk_threshold``
    rows, training routes to the per-row-emission chunked monoid scan
    and serving to the chunked two-pass smoother (only the layout-safe
    (n,) output-index vector rides the blocks; per-row h/r are built
    inside each scan body), and ``nll_distributed`` /
    ``find_MAP(engine='distributed')`` shard the time axis over a device
    mesh (``ops/ssm.sharded_ssm_nll_multi``)."""

    def __init__(self, space=None, location=None, kernel=None,
                 outputs_dim=2, latents=None, harmonics=None,
                 *args, **kwargs):
        from .lmc import Mixing, MultiGaussianLik

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
        self.f_location = location if location is not None else Zero()
        if self._shared_kernel:
            shared = ssm_leaves(ks[0], harmonics=harmonics)
            self._leaf_sets = [shared] * self.n_latents
        else:
            self._leaf_sets = [ssm_leaves(k, harmonics=harmonics)
                               for k in ks]
        self.f_mixing = Mixing(self.n_outputs, self.n_latents)
        self.f_likelihood = MultiGaussianLik(self.n_outputs)
        kwargs["space"] = space
        if "name" not in kwargs:
            kwargs["name"] = "MSSGP"
        StochasticProcess.__init__(self, *args, **kwargs)

    # -- registration ----------------------------------------------------------
    def _components(self):
        return ([self.f_location] + list(self.f_kernels)
                + [self.f_mixing, self.f_likelihood])

    def _features(self, x):
        """Host-side time column (check_dims / defaults for the latent
        kernels see 1-D time, not the index column)."""
        x = np.asarray(x)
        if x.ndim == 1:
            x = x[:, None]
        return x[:, :1]

    def _check_hypers(self):
        feats = self._features(self.inputs)
        self.f_location.check_dims(feats)
        for k in self.f_kernels:
            k.check_dims(feats)
        for comp in self._components():
            comp.check_hypers(self.name + "_")

    def default_hypers(self):
        feats = self._features(self.inputs)
        out = {}
        out.update(self.f_location.default_hypers_dims(feats, self.outputs))
        for k in self.f_kernels:
            out.update(k.default_hypers_dims(feats, self.outputs))
        out.update(self.f_mixing.default_hypers(self.inputs, self.outputs))
        out.update(self.f_likelihood.default_hypers(self.inputs,
                                                    self.outputs))
        return out

    def observed(self, inputs=None, outputs=None, order=None, index=None,
                 hidden=None):
        out = StochasticProcess.observed(self, inputs=inputs,
                                         outputs=outputs, order=order,
                                         index=index, hidden=hidden)
        x = np.asarray(self._inputs)
        if x.ndim != 2 or x.shape[1] != 2:
            raise ValueError(
                "MultiStateSpaceGP rows are (t, output_index) pairs — "
                f"expected (n, 2) inputs, got {x.shape} (build them with "
                "with_output/stack_outputs)")
        idx = np.rint(x[:, 1]).astype(np.int64)
        if idx.min() < 0 or idx.max() >= self.n_outputs:
            raise ValueError(
                f"output indices must lie in [0, {self.n_outputs}); got "
                f"[{idx.min()}, {idx.max()}]")
        self.f_likelihood.check_targets(self._outputs)
        return out

    # -- core SSM pieces ---------------------------------------------------------
    @staticmethod
    def _split(x):
        """(t (n,), output index (n,) int32) from (t, index) rows."""
        x = jnp.asarray(x, settings.dtype)
        return x[:, 0], jnp.clip(jnp.asarray(jnp.rint(x[:, 1]), jnp.int32),
                                 0, None)

    def _blocks(self, params, dt, stationary_first=True):
        return ssm_blocks_multi(self._leaf_sets, params, dt,
                                stationary_first=stationary_first)

    def _h_rows(self, params, hq, idx):
        """Per-row emission vectors (n, S): h_k = sum_q W[p_k, q] Hq[q].
        Tiny-axis contraction stays on the VPU in full f32 (ssm._bmm
        rationale)."""
        w, _b = self.f_mixing.values(params)
        wr = w[idx]                                     # (n, Q)
        return jnp.sum(wr[:, :, None] * hq[None, :, :], axis=1)

    def _r_rows(self, params, idx):
        return self.f_likelihood._vars(params)[idx]

    def _residual(self, params, x, y):
        """y minus location(t) and per-output bias."""
        t_feats = jnp.asarray(x, settings.dtype)[:, :1]
        _t, idx = self._split(x)
        _w, b = self.f_mixing.values(params)
        return (jnp.asarray(y, settings.dtype)
                - self.f_location(params, t_feats) - b[idx])

    # -- the exact marginal likelihood --------------------------------------------
    def th_loglike_fn(self):
        def fn(params, space, inputs, outputs):
            t, idx = self._split(inputs)
            order = jnp.argsort(t)
            ts = t[order]
            idxs = idx[order]
            ys = self._residual(params, inputs, outputs)[order]
            dt = jnp.concatenate([jnp.zeros(1, settings.dtype),
                                  jnp.diff(ts)])
            if ts.shape[0] > settings.ssm_chunk_threshold:
                # beyond-HBM training: the per-row-emission chunked scan;
                # only the layout-safe (n,) index rides the blocks, h/r
                # are built inside each scan body (ops/ssm._rows_hr) and
                # the (n, S, S) transition stacks are built per block
                _a0, _q0, pinf, hq = self._blocks(
                    params, jnp.zeros(1, settings.dtype))
                w, _b = self.f_mixing.values(params)
                r_vec = self.f_likelihood._vars(params)
                nll = chunked_kalman_nll(
                    None, None, None, None, ys,
                    chunk=settings.ssm_chunk, rows=(idxs, w, hq, r_vec),
                    blocks_fn=lambda d: self._blocks(
                        params, d, stationary_first=False)[:2],
                    dt=dt, pinf=pinf)
            else:
                a, q, _pinf, hq = self._blocks(params, dt)
                h = self._h_rows(params, hq, idxs)
                r = self._r_rows(params, idxs)
                nll, _, _ = parallel_kalman_nll(a, q, h, r, ys)
            ll = -nll
            bad = ~jnp.isfinite(ll)
            return jnp.where(bad, GUARD, to_num(ll, nan=GUARD,
                                                neginf=GUARD))

        return fn

    def _mix_fn_cached(self):
        """Stable per-instance ``params -> (W, r_vec)`` callable — it
        keys ops/ssm's sharded-program jit cache, so rebuilding it per
        call would recompile the SPMD program every eager call."""
        fn = getattr(self, "_mix_fn", None)
        if fn is None:
            def fn(p):
                w, _b = self.f_mixing.values(p)
                return w, self.f_likelihood._vars(p)

            self._mix_fn = fn
        return fn

    def nll_distributed(self, params=None, mesh=None, axis="dp"):
        """Time-axis-sharded exact multi-output NLL
        (``ops/ssm.sharded_ssm_nll_multi``): the per-row-emission form of
        :meth:`StateSpaceGP.nll_distributed` — each device builds the
        block-diagonal latent stack and its own rows' mixed emission
        vectors; collective traffic stays one all_gather of D (S, S)
        monoid totals + a scalar psum.  Rides
        ``find_MAP(engine='distributed')`` unchanged."""
        if params is None:
            params = self.params
        params = {k: jnp.asarray(v) for k, v in params.items()}
        x = jnp.asarray(self.inputs, settings.dtype)
        t, idx = self._split(x)
        order = jnp.argsort(t)
        ts = t[order]
        ys = self._residual(params, x, jnp.asarray(
            self.outputs, settings.dtype))[order]
        dt = jnp.concatenate([jnp.zeros(1, settings.dtype), jnp.diff(ts)])
        return sharded_ssm_nll_multi(self._leaf_sets, params, dt,
                                     idx[order], ys, self._mix_fn_cached(),
                                     mesh=mesh, axis=axis)

    # -- smoothing --------------------------------------------------------------
    def _run_smoother(self, params, xq, inputs, outputs):
        """Smoothed MIXED moments (without location/bias) at query rows
        ``xq`` (nq, 2): mean_k = h_k' m_s, var_k = h_k' P_s h_k."""
        tq, idxq = self._split(xq)
        tobs, idxobs = self._split(inputs)
        yres = self._residual(params, inputs, outputs)
        n_obs = tobs.shape[0]
        t_all = jnp.concatenate([tobs, tq])
        idx_all = jnp.concatenate([idxobs, idxq])
        y_all = jnp.concatenate([yres, jnp.zeros_like(tq)])
        obs = jnp.concatenate([jnp.ones(n_obs, bool),
                               jnp.zeros(tq.shape[0], bool)])
        order = jnp.argsort(t_all)
        ts, ys, os_ = t_all[order], y_all[order], obs[order]
        idxs = idx_all[order]
        dt = jnp.concatenate([jnp.zeros(1, settings.dtype), jnp.diff(ts)])
        if ts.shape[0] > settings.ssm_chunk_threshold:
            # beyond-HBM serving: per-row-emission two-pass smoother,
            # per-block (A, Q) construction
            _a0, _q0, pinf, hq = self._blocks(
                params, jnp.zeros(1, settings.dtype))
            w, _b = self.f_mixing.values(params)
            r_vec = self.f_likelihood._vars(params)
            mean, var = chunked_smoother_diag(
                None, None, None, None, ys, os_,
                chunk=settings.ssm_chunk, rows=(idxs, w, hq, r_vec),
                blocks_fn=lambda d: self._blocks(
                    params, d, stationary_first=False)[:2],
                dt=dt, pinf=pinf)
        else:
            a, q, _pinf, hq = self._blocks(params, dt)
            h = self._h_rows(params, hq, idxs)
            # query rows are masked out of the filter, but their r still
            # enters s = hQh' + r divisions — keep it the row's own
            # (positive) channel variance so no 0/0 NaN can leak through
            # the mask
            r = self._r_rows(params, idxs)
            m_f, p_f = parallel_kalman_filter(a, q, h, r, ys, os_)
            m_s, p_s = parallel_smoother(a, q, m_f, p_f)
            mean = jnp.sum(m_s * h, axis=-1)
            var = jnp.sum(jnp.sum(p_s * h[:, None, :], axis=-1) * h,
                          axis=-1)
        inv = jnp.argsort(order)
        qpos = inv[n_obs:]
        return mean[qpos], jnp.maximum(var[qpos], zero32)

    def _prior_diag(self, params, space):
        """Prior marginal variance per row: sum_q W[p,q]^2 H_q Pinf H_q'."""
        _t, idx = self._split(space)
        dt0 = jnp.zeros(1, settings.dtype)
        _a, _q, pinf, hq = self._blocks(params, dt0)
        vq = jnp.sum(jnp.sum(pinf[None] * hq[:, None, :], axis=-1) * hq,
                     axis=-1)                           # (Q,)
        w, _b = self.f_mixing.values(params)
        return jnp.sum(w[idx] ** 2 * vq[None, :], axis=1)

    # -- moment statistics ----------------------------------------------------------
    def _loc_bias(self, params, space):
        t_feats = jnp.asarray(space, settings.dtype)[:, :1]
        _t, idx = self._split(space)
        _w, b = self.f_mixing.values(params)
        return self.f_location(params, t_feats) + b[idx]

    def th_location(self, prior=False, noise=False):
        if prior:
            def fn(params, space, inputs, outputs, vector):
                return self._loc_bias(params, space)
        else:
            def fn(params, space, inputs, outputs, vector):
                m, _v = self._run_smoother(params, space, inputs, outputs)
                return self._loc_bias(params, space) + m
        return fn

    def th_kernel_diag(self, prior=False, noise=False):
        if prior:
            def fn(params, space, inputs, outputs, vector):
                return self._prior_diag(params, space)
        else:
            def fn(params, space, inputs, outputs, vector):
                return self._run_smoother(params, space, inputs,
                                          outputs)[1]
        return fn

    def th_variance(self, prior=False, noise=False, simulations=None):
        def fn(params, space, inputs, outputs, vector):
            if prior:
                v = self._prior_diag(params, space)
            else:
                v = self._run_smoother(params, space, inputs, outputs)[1]
            if noise:
                _t, idx = self._split(space)
                v = v + self._r_rows(params, idx)
            return v

        return fn

    def th_logpredictive(self, prior=False, noise=False):
        def fn(params, space, inputs, outputs, vector):
            if prior:
                m = self._loc_bias(params, space)
                v = self._prior_diag(params, space)
            else:
                ms, v = self._run_smoother(params, space, inputs, outputs)
                m = self._loc_bias(params, space) + ms
            _t, idx = self._split(space)
            tot = v + self._r_rows(params, idx)
            y = jnp.asarray(vector, settings.dtype)
            return jnp.sum(-0.5 * (LOG2PI + jnp.log(tot))
                           - 0.5 * (y - m) ** 2 / tot)

        return fn

    # -- joint sampling (simulation smoother, per-row emissions) ------------------
    def _joint_draws(self, params, xq, inputs, outputs, samples, seed,
                     prior=False):
        """(nq, samples) joint draws of the MIXED latent g (without
        location/bias) at query rows ``xq`` — the per-row-h Matheron
        simulation smoother (see StateSpaceGP._joint_draws)."""
        key = jax.random.PRNGKey(seed)
        if prior:
            tq, idxq = self._split(xq)
            order = jnp.argsort(tq)
            dt = jnp.concatenate([jnp.zeros(1, settings.dtype),
                                  jnp.diff(tq[order])])
            a, q, _pinf, hq = self._blocks(params, dt)
            h = self._h_rows(params, hq, idxq[order])
            keys = jax.random.split(key, samples)
            xs = jax.vmap(lambda k: ssm_prior_state_sample(a, q, k))(keys)
            f = jnp.sum(xs * h[None], axis=-1).T        # (nq, S)
            return f[jnp.argsort(order)]
        tq, idxq = self._split(xq)
        tobs, idxobs = self._split(inputs)
        yres = self._residual(params, inputs, outputs)
        n_obs = tobs.shape[0]
        t_all = jnp.concatenate([tobs, tq])
        idx_all = jnp.concatenate([idxobs, idxq])
        y_all = jnp.concatenate([yres, jnp.zeros_like(tq)])
        obs = jnp.concatenate([jnp.ones(n_obs, bool),
                               jnp.zeros(tq.shape[0], bool)])
        order = jnp.argsort(t_all)
        ts, ys, os_ = t_all[order], y_all[order], obs[order]
        idxs = idx_all[order]
        dt = jnp.concatenate([jnp.zeros(1, settings.dtype), jnp.diff(ts)])
        a, q, _pinf, hq = self._blocks(params, dt)
        h = self._h_rows(params, hq, idxs)
        r = self._r_rows(params, idxs)
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
        if params is None:
            params = self.params
        if space is None:
            space = self.space
        if inputs is None:
            inputs = self._inputs
        if outputs is None:
            outputs = self._outputs
        pj = {k: jnp.asarray(v) for k, v in params.items()}
        xq = np.asarray(space, settings.floatx)
        f = np.asarray(self._joint_draws(pj, jnp.asarray(
            xq, settings.dtype), inputs, outputs, int(samples), int(seed),
            prior=prior))
        f = f + np.asarray(self._loc_bias(pj, jnp.asarray(
            xq, settings.dtype)))[:, None]
        if noise:
            if rng is None:
                rng = np.random.default_rng(seed + 1)
            idx = np.rint(xq[:, 1]).astype(np.int64)
            s2 = np.asarray(self.f_likelihood._vars(pj))[idx]
            f = f + np.sqrt(s2)[:, None] * rng.standard_normal(
                f.shape).astype(settings.floatx)
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
            pj = {k: jnp.asarray(vv) for k, vv in params.items()}
            idx = np.rint(np.asarray(space)[:, 1]).astype(np.int64)
            v = v + np.asarray(self.f_likelihood._vars(pj))[idx]
        return stats.norm.ppf(q, loc=m, scale=np.sqrt(np.maximum(v,
                                                                 1e-12)))

    # -- user-facing extras ---------------------------------------------------------
    def task_correlations(self, params=None):
        """The learned cross-output latent correlation matrix (P, P):
        W W' normalized to unit diagonal (same semantics as
        LMCSVP.task_correlations)."""
        from ..hypers import hval

        if params is None:
            params = self.params
        w = np.asarray(hval(self.f_mixing.w,
                            {k: np.asarray(v) for k, v in params.items()}))
        b = w @ w.T
        d = np.sqrt(np.maximum(np.diagonal(b), 1e-12))
        return b / np.outer(d, d)


LMCSSGP = MultiStateSpaceGP
