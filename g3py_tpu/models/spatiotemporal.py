"""Exact separable SPATIO-TEMPORAL GP, linear in the time axis.

For a separable kernel ``k((t, x), (t', x')) = k_t(t, t') k_s(x, x')``
observed on a fixed set of m spatial SITES, the space-time GP is an
m-output LMC whose mixing is DERIVED from the spatial kernel: with
``K_s = L L'`` (Cholesky over the sites),

    f(t, site_p) = sum_q L[p, q] g_q(t),     g_q iid ~ GP(0, k_t),

because Cov[f(t, p), f(t', p')] = k_t(t, t') (L L')[p, p'] = k_t k_s —
the Kronecker/state-space construction of Sarkka, Solin & Hartikainen
(2013, "Spatiotemporal learning via infinite-dimensional Bayesian
filtering and smoothing").  So the exact machinery is
:class:`~g3py_tpu.models.statespace.MultiStateSpaceGP` verbatim — the
per-row-emission parallel Kalman scans at O(n) total events — with the
free (P, Q) mixing replaced by ``chol(K_s(sites))``, differentiable
w.r.t. the spatial hypers through ``safe_cholesky``'s custom VJP.

The reference's only route to this data shape is a dense product kernel
over all (t, x) rows at O(n^3) (kernel algebra, reference
kernels.py:51-75); here the time axis costs O(n) with NO approximation,
and every scaling path (chunked beyond-HBM training/serving, time-axis
mesh sharding) is inherited.

Off-site prediction stays EXACT for marginals: conditioned on the site
field, f(t, x*) = a' f(t, sites) + r(t) with ``a = K_s^{-1} k_s(S, x*)``
and residual r independent of every observation (observations are site
field + independent noise), so the posterior marginal at any (t, x*) is
``a' [posterior of f(t, sites)] a + k_t(0) (k_s(x*, x*) - k' K_s^{-1} k)``
— implemented by running the smoother with the query row's emission
vector built from the interpolation weights (``field``).
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..config import settings
from ..hypers import Hypers, Flat, hval, is_param
from ..ops.guards import to_cov
from ..ops.linalg import safe_cholesky, solve_lower_triangular
from ..ops.ssm import ssm_leaves
from .lmc import MultiGaussianLik
from .statespace import MultiStateSpaceGP
from .stochastic import StochasticProcess, zero32
from .gaussian import GUARD  # noqa: F401  (re-export convenience)

__all__ = ["SpatioTemporalSSGP", "STSSGP", "SpatialMixing"]


class SpatialMixing(Hypers):
    """Mixing DERIVED from a spatial kernel over fixed sites:
    ``values(params) -> (chol(K_s(sites)), b)`` with per-site bias ``b``
    the only free hypers here (the spatial kernel's hypers are
    registered by the owning process as a component of their own).
    Drop-in for :class:`~g3py_tpu.models.lmc.Mixing` on the
    MultiStateSpaceGP machinery."""

    def __init__(self, kernel, sites, name=None):
        self.kernel = kernel
        self.sites = np.asarray(sites, settings.floatx)
        self.P = int(self.sites.shape[0])
        self.Q = self.P
        self.b = None
        super().__init__(name=name if name is not None else "SpaceMix")

    def check_hypers(self, parent=""):
        if self.b is None:
            self.b = self._param(None, parent + self.name + "_b",
                                 prior=Flat(), shape=(self.P,))

    def default_hypers(self, x=None, y=None):
        """Per-site bias defaults to the site's target mean (rows are
        (t, site_index) as in the LMC row format)."""
        b0 = np.zeros((self.P,), settings.floatx)
        if x is not None and y is not None and np.ndim(x) == 2:
            idx = np.asarray(np.rint(np.asarray(x)[:, -1]), np.int64)
            y = np.asarray(y)
            for p in range(self.P):
                yp = y[idx == p]
                if len(yp):
                    b0[p] = np.mean(yp)
        return {self.b: b0} if is_param(self.b) else {}

    def spatial_cov(self, params):
        """K_s over the sites, PSD-guarded."""
        z = jnp.asarray(self.sites, settings.dtype)
        return to_cov(self.kernel.cov(params, z))

    def values(self, params):
        """(W = chol(K_s) (m, m), b (m,))."""
        w = safe_cholesky(self.spatial_cov(params))
        return w, jnp.asarray(hval(self.b, params), settings.dtype)


class SpatioTemporalSSGP(MultiStateSpaceGP):
    """Exact separable spatio-temporal GP on m spatial sites — see the
    module docstring.  Rows are ``(t, site_index)`` (LMC row format,
    build with :func:`~g3py_tpu.models.lmc.stack_outputs` /
    :func:`~g3py_tpu.models.lmc.with_output`); ``sites`` (m, d_s) are
    the site coordinates the spatial kernel sees.

    >>> st = g3.SpatioTemporalSSGP(space=x, kernel=g3.MAT32(t),
    ...                            space_kernel=g3.SE(sites),
    ...                            sites=sites)
    >>> st.observed(x, y); p = st.find_MAP()
    >>> st.mean(p, g3.with_output(tq, 2))       # site 2 at times tq
    >>> m, v = st.field(tq, xq, params=p)       # ANY spatial points
    >>> st.task_correlations(p)                 # = normalized K_s

    The state dimension is ``S = m * s_t`` (s_t = temporal SSM order),
    so per-event cost is O(m^2 s_t^2) inside the scans — keep m at tens
    of sites (m=32, MAT32: S=64).  All MultiStateSpaceGP scaling paths
    (chunked beyond-HBM, ``nll_distributed`` time-axis mesh sharding,
    ``find_MAP(engine='distributed')``) are inherited unchanged.

    Deliberate modeling choices: per-site biases ``b`` and per-site
    noise variances (MultiGaussianLik) are sensor-level parameters, NOT
    part of the spatial field — ``field`` therefore reports
    ``location(t) + f(t, x)`` without them."""

    def __init__(self, space=None, location=None, kernel=None,
                 space_kernel=None, sites=None, harmonics=None,
                 *args, **kwargs):
        from ..hypers.means import Zero

        if space_kernel is None or sites is None:
            raise ValueError(
                "SpatioTemporalSSGP needs space_kernel= (a Kernel over "
                "the site coordinates) and sites= (m, d_s)")
        sites = np.asarray(sites, settings.floatx)
        if sites.ndim == 1:
            sites = sites[:, None]
        m = int(sites.shape[0])
        self.n_outputs = m
        self.n_latents = m
        self._shared_kernel = True
        self.f_kernels = (kernel,)
        shared = ssm_leaves(kernel, harmonics=harmonics)
        self._leaf_sets = [shared] * m
        self.f_location = location if location is not None else Zero()
        self.f_space_kernel = space_kernel
        self.f_mixing = SpatialMixing(space_kernel, sites)
        self.f_likelihood = MultiGaussianLik(m)
        kwargs["space"] = space
        if "name" not in kwargs:
            kwargs["name"] = "STSSGP"
        StochasticProcess.__init__(self, *args, **kwargs)

    # -- registration ----------------------------------------------------------
    def _components(self):
        return [self.f_location, self.f_kernels[0], self.f_space_kernel,
                self.f_mixing, self.f_likelihood]

    def _check_hypers(self):
        feats = self._features(self.inputs)
        self.f_location.check_dims(feats)
        self.f_kernels[0].check_dims(feats)
        self.f_space_kernel.check_dims(self.f_mixing.sites)
        for comp in self._components():
            comp.check_hypers(self.name + "_")

    def default_hypers(self):
        feats = self._features(self.inputs)
        out = {}
        out.update(self.f_location.default_hypers_dims(feats, self.outputs))
        out.update(self.f_kernels[0].default_hypers_dims(feats,
                                                         self.outputs))
        # the spatial kernel's data-driven defaults see the SITE
        # coordinates (lengthscales from site spacing); target scale
        # from the outputs
        out.update(self.f_space_kernel.default_hypers_dims(
            self.f_mixing.sites, self.outputs))
        out.update(self.f_mixing.default_hypers(self.inputs, self.outputs))
        out.update(self.f_likelihood.default_hypers(self.inputs,
                                                    self.outputs))
        return out

    # -- off-site (field) prediction ---------------------------------------------
    def _interp(self, params, xq):
        """Interpolation weights a (nq, m) with a_q = K_s^{-1} k_s(S, x*)
        and the per-query residual variance
        k_t(0) (k_s(x*, x*) - k(x*, S) K_s^{-1} k(S, x*))  (nq,)."""
        z = jnp.asarray(self.f_mixing.sites, settings.dtype)
        xq = jnp.asarray(xq, settings.dtype)
        if xq.ndim == 1:
            xq = xq[:, None]
        ks = self.f_mixing.spatial_cov(params)
        l = safe_cholesky(ks)
        kxs = self.f_space_kernel.cov(params, z, xq)        # (m, nq)
        v = solve_lower_triangular(l, kxs)                  # (m, nq)
        a = jax.scipy.linalg.solve_triangular(l.T, v, lower=False).T
        kqq = jnp.diagonal(self.f_space_kernel.cov(params, xq))
        resid_s = jnp.maximum(kqq - jnp.sum(v * v, axis=0), zero32)
        # k_t(0): stationary variance of ONE latent = H Pinf H'
        from ..ops.ssm import ssm_blocks
        dt0 = jnp.zeros(1, settings.dtype)
        _a0, _q0, pinf_t, h_t = ssm_blocks(self._leaf_sets[0], params, dt0)
        kt0 = jnp.sum(jnp.sum(pinf_t * h_t, axis=-1) * h_t)
        return a, kt0 * resid_s

    def field(self, t, x, params=None, inputs=None,
              outputs=None, prior=False, noise=None):
        """Posterior (mean, var) of ``location(t) + f(t, x)`` at
        arbitrary space-time points — ``t`` (nq,) times, ``x`` (nq, d_s)
        spatial coordinates (or (nq,) for 1-D space).  EXACT marginals
        (module docstring); per-site biases/noise are sensor-level and
        excluded (``noise`` accepted for API symmetry, must be falsy).
        Host-facing convenience (numpy in/out)."""
        if isinstance(t, dict):
            raise TypeError(
                "field(t, x, params=...) — times first, params by "
                "keyword (unlike the params-first statistics)")
        if noise:
            raise ValueError(
                "field() reports the latent field; per-site noise has no "
                "off-site definition — query on-site rows via "
                "variance(..., noise=True) instead")
        if params is None:
            params = self.params
        pj = {k: jnp.asarray(v) for k, v in params.items()}
        t = jnp.asarray(np.asarray(t).reshape(-1), settings.dtype)
        a, resid = self._interp(pj, x)
        if a.shape[0] != t.shape[0]:
            raise ValueError(
                f"t has {t.shape[0]} rows but x has {a.shape[0]}")
        w, _b = self.f_mixing.values(pj)
        wrows = jnp.matmul(a, w, precision=settings.matmul_precision)
        tfeat = t[:, None]
        loc = self.f_location(pj, tfeat)
        if prior:
            # prior marginal: a' (W W') a k_t(0)-scaled per latent + resid
            dt0 = jnp.zeros(1, settings.dtype)
            _aa, _qq, pinf, hq = self._blocks(pj, dt0)
            vq = jnp.sum(jnp.sum(pinf[None] * hq[:, None, :], axis=-1)
                         * hq, axis=-1)                     # (Q,)
            var = jnp.sum(wrows ** 2 * vq[None, :], axis=1) + resid
            return (np.asarray(loc),
                    np.asarray(jnp.maximum(var, zero32)))
        if inputs is None:
            inputs = self._inputs
        if outputs is None:
            outputs = self._outputs
        mq, vq = self._run_smoother_weights(pj, t, wrows, inputs, outputs)
        return (np.asarray(loc + mq),
                np.asarray(jnp.maximum(vq + resid, zero32)))

    def _run_smoother_weights(self, params, tq, wrows, inputs, outputs):
        """Smoothed mixed moments at query times ``tq`` whose emission
        vectors come from EXPLICIT latent-weight rows ``wrows`` (nq, Q)
        (off-site interpolation) instead of a site index."""
        from ..ops.ssm import (parallel_kalman_filter, parallel_smoother)

        tobs, idxobs = self._split(inputs)
        yres = self._residual(params, inputs, outputs)
        n_obs = tobs.shape[0]
        t_all = jnp.concatenate([tobs, tq])
        y_all = jnp.concatenate([yres, jnp.zeros_like(tq)])
        obs = jnp.concatenate([jnp.ones(n_obs, bool),
                               jnp.zeros(tq.shape[0], bool)])
        order = jnp.argsort(t_all)
        ts, ys, os_ = t_all[order], y_all[order], obs[order]
        dt = jnp.concatenate([jnp.zeros(1, settings.dtype), jnp.diff(ts)])
        a, q, _pinf, hq = self._blocks(params, dt)
        w, _b = self.f_mixing.values(params)
        wall = jnp.concatenate([w[idxobs], wrows])[order]   # (n_all, Q)
        h = jnp.sum(wall[:, :, None] * hq[None], axis=1)
        r_all = jnp.concatenate([
            self._r_rows(params, idxobs),
            jnp.full(tq.shape, 1.0, settings.dtype)])[order]
        m_f, p_f = parallel_kalman_filter(a, q, h, r_all, ys, os_)
        m_s, p_s = parallel_smoother(a, q, m_f, p_f)
        mean = jnp.sum(m_s * h, axis=-1)
        var = jnp.sum(jnp.sum(p_s * h[:, None, :], axis=-1) * h, axis=-1)
        inv = jnp.argsort(order)
        qpos = inv[n_obs:]
        return mean[qpos], jnp.maximum(var[qpos], zero32)

    def task_correlations(self, params=None):
        """Normalized spatial kernel over the sites (the learned
        cross-site correlation matrix)."""
        if params is None:
            params = self.params
        pj = {k: jnp.asarray(v) for k, v in params.items()}
        ks = np.asarray(self.f_mixing.spatial_cov(pj))
        d = np.sqrt(np.maximum(np.diagonal(ks), 1e-12))
        return ks / np.outer(d, d)


STSSGP = SpatioTemporalSSGP
