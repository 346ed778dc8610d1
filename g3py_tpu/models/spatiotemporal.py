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
from ..ops.ssm import (ssm_leaves, parallel_kalman_nll,
                       parallel_kalman_filter, parallel_smoother,
                       ssm_prior_state_sample, chunked_kalman_nll,
                       chunked_smoother_diag)
from .lmc import MultiGaussianLik
from .statespace import MultiStateSpaceGP
from .stochastic import StochasticProcess, zero32
from .gaussian import GUARD  # noqa: F401  (re-export convenience)

__all__ = ["SpatioTemporalSSGP", "STSSGP", "SpatialMixing",
           "SparseSpatioTemporalSSGP"]


def _kernel_diag(kernel, params, xs):
    """k(x, x) per row WITHOUT the (n, n) gram (vmapped 1x1 covs) —
    the residual-variance term of the interpolated emissions."""
    return jax.vmap(lambda row: kernel.cov(params, row[None, :])[0, 0])(xs)


class SpatialMixing(Hypers):
    """Mixing DERIVED from a spatial kernel over fixed sites:
    ``values(params) -> (chol(K_s(sites)), b)`` with per-site bias ``b``
    the only free hypers here (the spatial kernel's hypers are
    registered by the owning process as a component of their own).
    Drop-in for :class:`~g3py_tpu.models.lmc.Mixing` on the
    MultiStateSpaceGP machinery."""

    def __init__(self, kernel, sites, name=None, bias=True):
        self.kernel = kernel
        self.sites = np.asarray(sites, settings.floatx)
        self.P = int(self.sites.shape[0])
        self.Q = self.P
        self.b = None
        self.bias = bool(bias)
        super().__init__(name=name if name is not None else "SpaceMix")

    def check_hypers(self, parent=""):
        if not self.bias:
            # inducing-site mixing (SparseSpatioTemporalSSGP): rows are
            # arbitrary coordinates, a per-SITE bias has no meaning
            self.b = np.zeros((self.P,), settings.floatx)
            return
        if self.b is None:
            self.b = self._param(None, parent + self.name + "_b",
                                 prior=Flat(), shape=(self.P,))

    def default_hypers(self, x=None, y=None):
        """Per-site bias defaults to the site's target mean (rows are
        (t, site_index) as in the LMC row format)."""
        if not self.bias:
            return {}
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
    def _kt0(self, params):
        """k_t(0): stationary variance of ONE latent = H Pinf H'."""
        from ..ops.ssm import ssm_blocks

        dt0 = jnp.zeros(1, settings.dtype)
        _a0, _q0, pinf_t, h_t = ssm_blocks(self._leaf_sets[0], params, dt0)
        return jnp.sum(jnp.sum(pinf_t * h_t, axis=-1) * h_t)

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
        kqq = _kernel_diag(self.f_space_kernel, params, xq)
        resid_s = jnp.maximum(kqq - jnp.sum(v * v, axis=0), zero32)
        return a, self._kt0(params) * resid_s

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


class SparseSpatioTemporalSSGP(SpatioTemporalSSGP):
    """Spatio-temporal GP at ARBITRARY spatial locations: sparse in
    SPACE (m inducing sites), exact in TIME (O(n) parallel Kalman).

    :class:`SpatioTemporalSSGP` needs every observation to sit on one of
    m fixed sites; here rows are ``(t, x_1..x_ds)`` with free spatial
    coordinates.  The model keeps the m-site latent field
    ``u(t) = f(t, Z)`` over INDUCING sites Z as the Markovian state and
    projects every row onto it by kernel interpolation,

        f(t, x) = a(x)' u(t) + r(t, x),
        a(x) = K_s(Z, Z)^{-1} k_s(Z, x),

    with the interpolation residual ``r`` — variance
    ``k_t(0) (k_s(x, x) - k' K_s^{-1} k)`` — folded into the per-row
    observation noise (the FITC approximation in space; Nyström/DTC
    projection plus exact marginal variances).  Time stays EXACT: with
    ``Z`` ⊇ the distinct observed locations the residual vanishes and
    the model equals the exact :class:`SpatioTemporalSSGP` / dense
    product-kernel GP (tested).  The temporal structure is never
    approximated — only the spatial cross-section is, the opposite
    trade to LMCSVP (sparse in ALL axes).

    >>> st = g3.SparseSpatioTemporalSSGP(
    ...         space=x, kernel=g3.MAT32(x[:, :1]),
    ...         space_kernel=g3.SE(x[:, 1:]), inducing=16)
    >>> st.observed(x, y); p = st.find_MAP()
    >>> st.mean(p, xq)                     # statistics at any (t, x...)
    >>> m, v = st.field(tq, xq_space, params=p)

    ``inducing``: (m, d_s) site array, or an int m — k-means centers of
    the observed spatial coordinates.  State dim S = m * s_t; past
    ``settings.ssm_chunk_threshold`` rows, training and the posterior
    smoother switch to the chunked monoid scans with per-block (A, Q)
    construction AND per-block interpolated emissions (transposed-
    coordinate payload, one triangular solve per block) — neither the
    (n, S, S) transitions nor the (n, m) weight rows ever materialize.
    Per-site biases and the per-site noise of the exact family become a
    single global noise variance here (and ``location``, e.g.
    ``g3.Bias()``, for the mean).  ``nll_distributed`` /
    ``find_MAP(engine='distributed')`` shard the time axis over a
    device mesh with per-device interpolated-emission construction
    (``ops/ssm.sharded_ssm_nll_payload``).

    Reference baseline: the dense product kernel over all rows at
    O(n^3) (reference kernels.py:51-75) — this family is the only route
    in either library to n ~ 1e5 scattered space-time observations."""

    def __init__(self, space=None, location=None, kernel=None,
                 space_kernel=None, inducing=None, harmonics=None,
                 *args, **kwargs):
        from ..hypers.means import Zero
        from .sparse import select_inducing

        if space_kernel is None or inducing is None:
            raise ValueError(
                "SparseSpatioTemporalSSGP needs space_kernel= and "
                "inducing= (an (m, d_s) site array, or an int m for "
                "k-means of the observed spatial coordinates)")
        if np.ndim(inducing) == 0:
            if space is None:
                raise ValueError(
                    "inducing=<int> needs space= rows (t, x...) to "
                    "place the k-means sites")
            xs = np.asarray(space, settings.floatx)
            if xs.ndim != 2 or xs.shape[1] < 2:
                raise ValueError(
                    "rows must be (t, x_1..x_ds) — got shape "
                    f"{xs.shape}")
            sites = select_inducing(xs[:, 1:], int(inducing))
        else:
            sites = np.asarray(inducing, settings.floatx)
            if sites.ndim == 1:
                sites = sites[:, None]
        m = int(sites.shape[0])
        self.n_outputs = 1
        self.n_latents = m
        self._shared_kernel = True
        self.f_kernels = (kernel,)
        shared = ssm_leaves(kernel, harmonics=harmonics)
        self._leaf_sets = [shared] * m
        self.f_location = location if location is not None else Zero()
        self.f_space_kernel = space_kernel
        self.f_mixing = SpatialMixing(space_kernel, sites, bias=False)
        self.f_likelihood = MultiGaussianLik(1)
        kwargs["space"] = space
        if "name" not in kwargs:
            kwargs["name"] = "SparseST"
        StochasticProcess.__init__(self, *args, **kwargs)

    # -- row plumbing: (t, x...) instead of (t, site_index) --------------------
    @staticmethod
    def _split(x):
        """(t (n,), spatial coordinates (n, d_s))."""
        x = jnp.asarray(x, settings.dtype)
        return x[:, 0], x[:, 1:]

    def observed(self, inputs=None, outputs=None, order=None, index=None,
                 hidden=None):
        out = StochasticProcess.observed(self, inputs=inputs,
                                         outputs=outputs, order=order,
                                         index=index, hidden=hidden)
        x = np.asarray(self._inputs)
        d_s = self.f_mixing.sites.shape[1]
        if x.ndim != 2 or x.shape[1] != 1 + d_s:
            raise ValueError(
                "SparseSpatioTemporalSSGP rows are (t, x_1..x_ds) with "
                f"d_s={d_s} — expected (n, {1 + d_s}) inputs, got "
                f"{x.shape}")
        self.f_likelihood.check_targets(self._outputs)
        return out

    def default_hypers(self):
        feats = self._features(self.inputs)
        out = {}
        out.update(self.f_location.default_hypers_dims(feats, self.outputs))
        out.update(self.f_kernels[0].default_hypers_dims(feats,
                                                         self.outputs))
        out.update(self.f_space_kernel.default_hypers_dims(
            self.f_mixing.sites, self.outputs))
        # one global noise: MultiGaussianLik(1)'s own default would read
        # the last input column as an output index — rows here end in
        # spatial coordinates, so set it from the pooled target variance
        y = np.asarray(self.outputs) if self.outputs is not None else None
        if is_param(self.f_likelihood.var) and y is not None and y.size > 1:
            out[self.f_likelihood.var] = np.array(
                [np.var(y) / 10.0 + 1e-6], settings.floatx)
        return out

    # -- interpolated emissions ----------------------------------------------------
    def _vrows(self, params, l, kt0, xs):
        """Latent-weight rows and FITC residuals from one triangular
        solve: the weights are a' W with a = K_s^{-1} k and W = L =
        chol(K_s), and a' L = k' (L L')^{-1} L = k' L^{-T} = v' with
        v = L^{-1} k — so the mixing-pushed interpolation rows ARE the
        solve output transposed (no second solve, no matmul)."""
        z = jnp.asarray(self.f_mixing.sites, settings.dtype)
        xs = jnp.asarray(xs, settings.dtype)
        if xs.ndim == 1:
            xs = xs[:, None]
        kxs = self.f_space_kernel.cov(params, z, xs)        # (m, c)
        v = solve_lower_triangular(l, kxs)
        kqq = _kernel_diag(self.f_space_kernel, params, xs)
        resid = kt0 * jnp.maximum(kqq - jnp.sum(v * v, axis=0), zero32)
        return v.T, resid

    def _wrows(self, params, xs):
        """Per-row latent weights (n, m) — interpolation onto the
        inducing sites pushed through the mixing W = chol(K_s) — and the
        FITC residual variances (n,)."""
        l = safe_cholesky(self.f_mixing.spatial_cov(params))
        return self._vrows(params, l, self._kt0(params), xs)

    def _residual(self, params, x, y):
        t_feats = jnp.asarray(x, settings.dtype)[:, :1]
        return (jnp.asarray(y, settings.dtype)
                - self.f_location(params, t_feats))

    def _loc_bias(self, params, space):
        t_feats = jnp.asarray(space, settings.dtype)[:, :1]
        return self.f_location(params, t_feats)

    def _r_rows(self, params, xs):
        """Observation-noise variance per row: one global s2."""
        s2 = self.f_likelihood._vars(params)[0]
        return jnp.full((xs.shape[0],), 1.0, settings.dtype) * s2

    def _rows_fn(self, params, hq):
        """(payload rows_fn, s2) for the chunked scans: the payload is
        the TRANSPOSED spatial coordinates (d_s, n) — layout-safe — and
        each block's emissions are built from one triangular solve
        inside the scan body (ops/ssm.chunked_* payload form)."""
        l = safe_cholesky(self.f_mixing.spatial_cov(params))
        kt0 = self._kt0(params)
        s2 = self.f_likelihood._vars(params)[0]

        def rows_fn(pb):                         # pb (d_s, c)
            vb, residb = self._vrows(params, l, kt0, pb.T)
            hb = jnp.sum(vb[:, :, None] * hq[None], axis=1)
            return hb, s2 + residb

        return rows_fn, s2

    # -- exact-in-time marginal likelihood under the FITC spatial noise ------------
    def th_loglike_fn(self):
        def fn(params, space, inputs, outputs):
            x = jnp.asarray(inputs, settings.dtype)
            t, xs = self._split(x)
            order = jnp.argsort(t)
            ys = self._residual(params, x, outputs)[order]
            dt = jnp.concatenate([jnp.zeros(1, settings.dtype),
                                  jnp.diff(t[order])])
            if t.shape[0] > settings.ssm_chunk_threshold:
                # beyond-HBM training: per-block (A, Q) construction
                # AND per-block interpolated emissions (payload form)
                _a0, _q0, pinf, hq = self._blocks(
                    params, jnp.zeros(1, settings.dtype))
                rows_fn, _s2 = self._rows_fn(params, hq)
                nll = chunked_kalman_nll(
                    None, None, None, None, ys,
                    chunk=settings.ssm_chunk,
                    rows=(xs[order].T, rows_fn),
                    blocks_fn=lambda d: self._blocks(
                        params, d, stationary_first=False)[:2],
                    dt=dt, pinf=pinf)
            else:
                a, q, _pinf, hq = self._blocks(params, dt)
                wrows, resid = self._wrows(params, xs)
                wr = wrows[order]
                h = jnp.sum(wr[:, :, None] * hq[None], axis=1)
                r = (self.f_likelihood._vars(params)[0] + resid[order])
                nll, _, _ = parallel_kalman_nll(a, q, h, r, ys)
            ll = -nll
            bad = ~jnp.isfinite(ll)
            return jnp.where(bad, GUARD, jnp.nan_to_num(
                ll, nan=GUARD, neginf=GUARD, posinf=GUARD))

        return fn

    def _build_fn_cached(self):
        """Stable per-instance ``(params, dt_l, payload_l) -> (a, q,
        pinf, h, r)`` callable for the payload-form sharded NLL — it
        keys ops/ssm's sharded-program jit cache (rebuilding it per call
        would recompile the SPMD program every eager call)."""
        fn = getattr(self, "_sharded_build_fn", None)
        if fn is None:
            def fn(p, dt_l, pay_l):
                a_l, q_l, pinf, hq = self._blocks(p, dt_l,
                                                  stationary_first=False)
                rows_fn, _s2 = self._rows_fn(p, hq)
                h_l, r_l = rows_fn(pay_l)
                return a_l, q_l, pinf, h_l, r_l

            self._sharded_build_fn = fn
        return fn

    def nll_distributed(self, params=None, mesh=None, axis="dp"):
        """Time-axis-sharded exact NLL with INTERPOLATED emissions
        (``ops/ssm.sharded_ssm_nll_payload``): each device builds its
        own rows' (A, Q) blocks from the local dt slice and its
        emission rows from the local spatial-coordinate shard (one
        replicated m x m triangular solve per device) — neither the
        (n, S, S) transitions nor the (n, m) weight rows ever exist
        unsharded; collective traffic stays one all_gather of D (S, S)
        monoid totals + a scalar psum.  Matches ``-loglike(params)``
        to f32 rounding; rides ``find_MAP(engine='distributed')``
        unchanged."""
        from ..ops.ssm import sharded_ssm_nll_payload

        if params is None:
            params = self.params
        params = {k: jnp.asarray(v) for k, v in params.items()}
        x = jnp.asarray(self.inputs, settings.dtype)
        t, xs = self._split(x)
        order = jnp.argsort(t)
        ys = self._residual(params, x, jnp.asarray(
            self.outputs, settings.dtype))[order]
        dt = jnp.concatenate([jnp.zeros(1, settings.dtype),
                              jnp.diff(t[order])])
        return sharded_ssm_nll_payload(self._build_fn_cached(), params,
                                       dt, xs[order].T, ys,
                                       mesh=mesh, axis=axis)

    # -- smoothing with interpolated emissions --------------------------------------
    def _run_smoother_weights(self, params, tq, wrows, inputs, outputs):
        """Smoothed moments of the SITE-FIELD projection a'u at query
        times ``tq`` with explicit weight rows ``wrows`` (nq, m); the
        query rows' residual variance is NOT added here (callers own
        it).  Observed rows emit through their own interpolated weights
        with FITC-inflated noise."""
        x = jnp.asarray(inputs, settings.dtype)
        tobs, xsobs = self._split(x)
        wobs, resid_obs = self._wrows(params, xsobs)
        yres = self._residual(params, x, outputs)
        n_obs = tobs.shape[0]
        t_all = jnp.concatenate([tobs, tq])
        y_all = jnp.concatenate([yres, jnp.zeros_like(tq)])
        obs = jnp.concatenate([jnp.ones(n_obs, bool),
                               jnp.zeros(tq.shape[0], bool)])
        order = jnp.argsort(t_all)
        ts, ys, os_ = t_all[order], y_all[order], obs[order]
        dt = jnp.concatenate([jnp.zeros(1, settings.dtype), jnp.diff(ts)])
        a, q, _pinf, hq = self._blocks(params, dt)
        wall = jnp.concatenate([wobs, wrows])[order]
        h = jnp.sum(wall[:, :, None] * hq[None], axis=1)
        s2 = self.f_likelihood._vars(params)[0]
        r_all = jnp.concatenate([
            s2 + resid_obs,
            jnp.full(tq.shape, 1.0, settings.dtype)])[order]
        m_f, p_f = parallel_kalman_filter(a, q, h, r_all, ys, os_)
        m_s, p_s = parallel_smoother(a, q, m_f, p_f)
        mean = jnp.sum(m_s * h, axis=-1)
        var = jnp.sum(jnp.sum(p_s * h[:, None, :], axis=-1) * h, axis=-1)
        inv = jnp.argsort(order)
        qpos = inv[n_obs:]
        return mean[qpos], jnp.maximum(var[qpos], zero32)

    def _run_smoother(self, params, xq, inputs, outputs):
        """Posterior (mean, var) of the latent field f(t, x) at query
        rows — projection moments plus the rows' own residual
        variances.  Beyond ``settings.ssm_chunk_threshold`` total rows
        the two-pass chunked smoother runs with per-block (A, Q) AND
        per-block interpolated emissions (payload form) — no (n, S, S)
        or (n, m) tensor ever materializes."""
        tq, xsq = self._split(xq)
        x = jnp.asarray(inputs, settings.dtype)
        tobs, xsobs = self._split(x)
        n_obs = tobs.shape[0]
        if n_obs + tq.shape[0] > settings.ssm_chunk_threshold:
            yres = self._residual(params, x, outputs)
            t_all = jnp.concatenate([tobs, tq])
            xs_all = jnp.concatenate([xsobs, xsq])
            y_all = jnp.concatenate([yres, jnp.zeros_like(tq)])
            obs = jnp.concatenate([jnp.ones(n_obs, bool),
                                   jnp.zeros(tq.shape[0], bool)])
            order2 = jnp.argsort(t_all)
            ys, os_ = y_all[order2], obs[order2]
            dt = jnp.concatenate([jnp.zeros(1, settings.dtype),
                                  jnp.diff(t_all[order2])])
            _a0, _q0, pinf, hq = self._blocks(
                params, jnp.zeros(1, settings.dtype))
            rows_fn, _s2 = self._rows_fn(params, hq)
            # query rows' r rides the same (positive) formula; the obs
            # mask keeps them out of the filter
            mean, var = chunked_smoother_diag(
                None, None, None, None, ys, os_,
                chunk=settings.ssm_chunk,
                rows=(xs_all[order2].T, rows_fn),
                blocks_fn=lambda d: self._blocks(
                    params, d, stationary_first=False)[:2],
                dt=dt, pinf=pinf)
            inv = jnp.argsort(order2)
            qpos = inv[n_obs:]
            _wq, residq = self._wrows(params, xsq)
            return mean[qpos], jnp.maximum(var[qpos] + residq, zero32)
        wq, residq = self._wrows(params, xsq)
        m, v = self._run_smoother_weights(params, tq, wq, inputs, outputs)
        return m, jnp.maximum(v + residq, zero32)

    def _prior_diag(self, params, space):
        _tq, xsq = self._split(space)
        wq, residq = self._wrows(params, xsq)
        dt0 = jnp.zeros(1, settings.dtype)
        _a, _q, pinf, hq = self._blocks(params, dt0)
        vq = jnp.sum(jnp.sum(pinf[None] * hq[:, None, :], axis=-1) * hq,
                     axis=-1)                           # (m,)
        return (jnp.sum(wq ** 2 * vq[None, :], axis=1) + residq)

    # -- joint draws (simulation smoother over interpolated emissions) --------------
    def _joint_draws(self, params, xq, inputs, outputs, samples, seed,
                     prior=False):
        key = jax.random.PRNGKey(seed)
        tq, xsq = self._split(xq)
        wq, residq = self._wrows(params, xsq)
        key, kres = jax.random.split(key)
        res_draws = (jnp.sqrt(jnp.maximum(residq, zero32))[:, None]
                     * jax.random.normal(kres,
                                         (tq.shape[0], int(samples)),
                                         dtype=settings.dtype))
        if prior:
            order = jnp.argsort(tq)
            dt = jnp.concatenate([jnp.zeros(1, settings.dtype),
                                  jnp.diff(tq[order])])
            a, q, _pinf, hq = self._blocks(params, dt)
            h = jnp.sum(wq[order][:, :, None] * hq[None], axis=1)
            keys = jax.random.split(key, samples)
            xs = jax.vmap(lambda k: ssm_prior_state_sample(a, q, k))(keys)
            f = jnp.sum(xs * h[None], axis=-1).T
            return f[jnp.argsort(order)] + res_draws
        x = jnp.asarray(inputs, settings.dtype)
        tobs, xsobs = self._split(x)
        wobs, resid_obs = self._wrows(params, xsobs)
        yres = self._residual(params, x, outputs)
        n_obs = tobs.shape[0]
        t_all = jnp.concatenate([tobs, tq])
        y_all = jnp.concatenate([yres, jnp.zeros_like(tq)])
        obs = jnp.concatenate([jnp.ones(n_obs, bool),
                               jnp.zeros(tq.shape[0], bool)])
        order = jnp.argsort(t_all)
        ts, ys, os_ = t_all[order], y_all[order], obs[order]
        dt = jnp.concatenate([jnp.zeros(1, settings.dtype), jnp.diff(ts)])
        a, q, _pinf, hq = self._blocks(params, dt)
        wall = jnp.concatenate([wobs, wq])[order]
        h = jnp.sum(wall[:, :, None] * hq[None], axis=1)
        s2 = self.f_likelihood._vars(params)[0]
        r = jnp.concatenate([s2 + resid_obs,
                             jnp.full(tq.shape, 1.0,
                                      settings.dtype)])[order]
        m_f, p_f = parallel_kalman_filter(a, q, h, r, ys, os_)
        m_s, _ = parallel_smoother(a, q, m_f, p_f)

        def one(k):
            k1, k2 = jax.random.split(k)
            xdraw = ssm_prior_state_sample(a, q, k1)
            yprime = (jnp.sum(xdraw * h, axis=-1)
                      + jnp.sqrt(r) * jax.random.normal(
                          k2, ys.shape, dtype=ys.dtype))
            mfp, pfp = parallel_kalman_filter(a, q, h, r, yprime, os_)
            msp, _ = parallel_smoother(a, q, mfp, pfp)
            return jnp.sum((m_s + xdraw - msp) * h, axis=-1)

        draws = jax.vmap(one)(jax.random.split(key, samples))
        inv = jnp.argsort(order)
        return draws[:, inv[n_obs:]].T + res_draws

    # -- host-side sampling / quantiles ----------------------------------------------
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
            s2 = float(np.asarray(self.f_likelihood._vars(pj))[0])
            f = f + np.sqrt(s2) * rng.standard_normal(f.shape).astype(
                settings.floatx)
        return f

    def quantiler(self, params=None, space=None, inputs=None,
                  outputs=None, q=0.975, prior=False, noise=False,
                  simulations=None):
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
            v = v + float(np.asarray(self.f_likelihood._vars(pj))[0])
        return stats.norm.ppf(q, loc=m, scale=np.sqrt(np.maximum(v,
                                                                 1e-12)))
