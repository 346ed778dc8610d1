"""Linear Model of Coregionalization over the sparse variational family.

Multi-output regression with a LEARNED output-correlation structure:
P observed outputs are linear mixtures of Q latent sparse GPs,

    g_p(x) = loc(x) + b_p + sum_q W[p, q] f_q(x),      f_q ~ GP(0, k_q),
    y ~ N(g_p(x), s2_p),

with the mixing matrix W (P, Q), per-output biases b and per-output noise
variances s2 all ordinary trainable hypers (Journel & Huijbregts'
coregionalization; the sparse-variational treatment follows Alvarez &
Lawrence, "Computationally Efficient Convolved Multiple Output Gaussian
Processes", JMLR 2011, specialized to the instantaneous-mixing LMC).

The reference's only multi-output story is the ICM index-kernel algebra
(reference kernels.py:262-290 ``KernelEquals`` products), which scales as
one dense O((nP)^3) Cholesky over the stacked rows and supports a single
shared latent correlation.  Here every output row costs the same O(m^2)
as a scalar SVP row, outputs may be observed at DIFFERENT inputs (rows
are (x, output-index) pairs), Q < P gives a low-rank cross-output
covariance W W', and the whole family rides the existing machinery:
``fit_svgp`` (incl. the data-parallel ``mesh=`` trainer), ``find_MAP``
polish, ``sample_hypers``, ``scores``/``Experiment``, ``predictor`` and
AOT export.

Data convention (matches the dense ICM usage): the LAST column of every
input/space matrix is the integer output index in [0, P); the feature
columns are everything before it.  :func:`with_output` builds such rows.

TPU notes: with one shared kernel (``kernel=`` a single Kernel) the
per-batch latent cost is ONE Kuu Cholesky + ONE whitened cross-solve with
all per-latent work batched over the heads axis (MXU matmuls, no Python
loop) — the same shape as :class:`~g3py_tpu.models.svgp.MulticlassSVP`.
With ``kernel=[k1, ..., kQ]`` each latent gets its own kernel (the full
LMC); the Q factorizations are stacked host-side (Q is small) and still
batch onto the MXU.
"""

import numpy as np
import jax.numpy as jnp

from ..config import settings
from ..hypers import Hypers, Flat, FlatExp, hval, is_param
from ..hypers.kernels import KernelNoise
from ..ops.guards import to_num, to_cov, to_bounded
from ..ops.linalg import safe_cholesky, solve_lower_triangular
from .elliptical import _contains_kernel_noise
from .likelihoods import LOG2PI, Likelihood
from .sparse import signal_kernel_diag
from .stochastic import zero32
from .svgp import (SparseVariationalProcess, VariationalQHeads,
                   _whitened_head_moments)

__all__ = ["Mixing", "MultiGaussianLik", "LMCSVP", "with_output",
           "stack_outputs"]


def with_output(x, p):
    """Append an output-index column ``p`` to the feature matrix ``x``:
    the row format every LMC input/space matrix uses."""
    x = np.asarray(x, settings.floatx)
    if x.ndim == 1:
        x = x[:, None]
    col = np.full((len(x), 1), float(p), settings.floatx)
    return np.concatenate([x, col], axis=1)


def stack_outputs(xs, ys=None):
    """Stack per-output datasets into LMC row format: ``xs`` is a list of
    P feature matrices (one per output, possibly different lengths),
    ``ys`` the matching list of target vectors.  Returns ``x_stacked``
    (sum n_p, d+1) or ``(x_stacked, y_stacked)``."""
    x = np.concatenate([with_output(xp, p) for p, xp in enumerate(xs)],
                       axis=0)
    if ys is None:
        return x
    y = np.concatenate([np.asarray(yp, settings.floatx).reshape(-1)
                        for yp in ys])
    return x, y


class Mixing(Hypers):
    """The LMC mixing: ``w`` (P, Q) latent-to-output weights and ``b``
    (P,) per-output biases, both flat-prior trainable hypers.  Default
    ``w``: output p loads on latent p % Q with weight std(y_p) (so latent
    scales start near the whitened-q unit scale), zeros elsewhere;
    default ``b``: the per-output target means."""

    def __init__(self, outputs_dim, latents, name=None):
        self.P = int(outputs_dim)
        self.Q = int(latents)
        self.w = None
        self.b = None
        super().__init__(name=name if name is not None else "Mix")

    def check_hypers(self, parent=""):
        if self.w is None:
            self.w = self._param(None, parent + self.name + "_w",
                                 prior=Flat(), shape=(self.P, self.Q))
        if self.b is None:
            self.b = self._param(None, parent + self.name + "_b",
                                 prior=Flat(), shape=(self.P,))

    def default_hypers(self, x=None, y=None):
        w0 = np.zeros((self.P, self.Q), settings.floatx)
        b0 = np.zeros((self.P,), settings.floatx)
        scale = np.ones((self.P,), settings.floatx)
        if x is not None and y is not None and np.ndim(x) == 2:
            idx = np.asarray(np.rint(np.asarray(x)[:, -1]), np.int64)
            y = np.asarray(y)
            for p in range(self.P):
                yp = y[idx == p]
                if len(yp):
                    b0[p] = np.mean(yp)
                    scale[p] = max(float(np.std(yp)), 1e-3)
        for p in range(self.P):
            w0[p, p % self.Q] = scale[p]
        out = {}
        if is_param(self.w):
            out[self.w] = w0
        if is_param(self.b):
            out[self.b] = b0
        return out

    def values(self, params):
        """(W (P, Q), b (P,)) as jax arrays."""
        return (jnp.asarray(hval(self.w, params), settings.dtype),
                jnp.asarray(hval(self.b, params), settings.dtype))


class MultiGaussianLik(Likelihood):
    """Per-output Gaussian observation noise: y ~ N(g_p, s2_p) with one
    trainable FlatExp variance per output.  The expected log-likelihood
    is analytic (the conjugate Gaussian integral per row, with the row's
    own noise variance selected by its output index)."""

    def __init__(self, outputs_dim, x=None, var=None, name=None):
        self.P = int(outputs_dim)
        self.var = var
        super().__init__(x=x, name=name if name is not None
                         else "MultiGaussLik")

    def check_hypers(self, parent=""):
        self.var = self._param(self.var, parent + self.name + "_var",
                               FlatExp(), shape=(self.P,))

    def default_hypers(self, x=None, y=None):
        if not is_param(self.var):
            return {}
        v0 = np.full((self.P,), 0.1, settings.floatx)
        if x is not None and y is not None and np.ndim(x) == 2:
            idx = np.asarray(np.rint(np.asarray(x)[:, -1]), np.int64)
            y = np.asarray(y)
            for p in range(self.P):
                yp = y[idx == p]
                if len(yp) > 1:
                    v0[p] = np.var(yp) / 10.0 + 1e-6
        return {self.var: v0}

    def _vars(self, params):
        """(P,) noise variances, floored."""
        return jnp.maximum(jnp.asarray(hval(self.var, params),
                                       settings.dtype),
                           jnp.asarray(1e-10, settings.dtype))

    def expected_logp_rows(self, params, y, idx, mg, vg):
        """Analytic per-row E_{g~N(mg, vg)}[log N(y; g, s2_idx)]."""
        s2 = self._vars(params)[idx]
        return (-0.5 * (LOG2PI + jnp.log(s2))
                - ((jnp.asarray(y, settings.dtype) - mg) ** 2 + vg)
                / (2.0 * s2))

    def check_targets(self, y):
        y = np.asarray(y)
        if not np.all(np.isfinite(y)):
            raise ValueError("LMC targets must be finite")


class LMCSVP(SparseVariationalProcess):
    """Sparse variational Linear Model of Coregionalization.

    >>> x, y = stack_outputs([x0, x1], [y0, y1])     # 2 outputs
    >>> lmc = g3.LMCSVP(space=x, kernel=g3.SE(x[:, :-1]), outputs_dim=2,
    ...                 latents=2, inducing=32)
    >>> lmc.observed(x, y)
    >>> params, losses = lmc.fit_svgp(batch_size=1024, steps=2000)
    >>> lmc.mean(params, with_output(xq, 1))          # output 1 at xq
    >>> lmc.task_correlations(params)                 # learned (P, P)

    ``kernel`` is built over the FEATURE columns only (the last column of
    every row is the output index): a single Kernel shares one gram
    across the Q latents (cheapest; heads differ through q(u) and W), a
    list of Q kernels gives each latent its own stationarity (the full
    LMC).  Scalar statistics keep (n,) shapes — rows select their output
    — so regression ``scores``, ``predict``, ``Experiment`` and the
    serving stack all work unchanged."""

    def __init__(self, space=None, location=None, kernel=None,
                 outputs_dim=2, latents=None, inducing=32,
                 learn_inducing=True, *args, **kwargs):
        ks = (tuple(kernel) if isinstance(kernel, (list, tuple))
              else (kernel,))
        for k in ks:
            if k is not None and (_contains_kernel_noise(k)
                                  or isinstance(k, KernelNoise)):
                raise ValueError(
                    "LMCSVP takes noise-free latent kernels — per-output "
                    "observation noise lives in MultiGaussianLik")
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
        if "name" not in kwargs:
            kwargs["name"] = "LMC"
        self.f_mixing = Mixing(self.n_outputs, self.n_latents)
        super().__init__(space=space, location=location, kernel=ks[0],
                         likelihood=MultiGaussianLik(self.n_outputs),
                         inducing=inducing, learn_inducing=learn_inducing,
                         *args, **kwargs)

    def _make_q(self, m):
        return VariationalQHeads(m, self.n_latents)

    # -- the row format ---------------------------------------------------------
    @staticmethod
    def _split(x):
        """(features (n, d-1), output index (n,) int32) from row format."""
        x = jnp.asarray(x, settings.dtype)
        xf = x[:, :-1]
        idx = jnp.clip(jnp.asarray(jnp.rint(x[:, -1]), jnp.int32), 0, None)
        return xf, idx

    def _features(self, x):
        """Host-side feature slice (check_dims / defaults / inducing)."""
        x = np.asarray(x)
        if x.ndim == 1:
            x = x[:, None]
        return x[:, :-1] if x.shape[1] > 1 else x

    # -- registration (feature-space dims for the latent components) -------------
    def _components(self):
        return ([self.f_location] + list(self.f_kernels)
                + [self.f_inducing, self.f_q, self.f_mixing,
                   self.f_likelihood])

    def _check_hypers(self):
        feats = self._features(self.inputs)
        for comp in (self.f_location, *self.f_kernels, self.f_inducing):
            comp.check_dims(feats)
        for comp in self._components():
            comp.check_hypers(self.name + "_")

    def default_hypers(self):
        feats = self._features(self.inputs)
        out = {}
        for comp in (self.f_location, *self.f_kernels, self.f_inducing):
            # default_hypers_dims: composite kernels define only the
            # dims-aware merge (see SVP.default_hypers)
            out.update(comp.default_hypers_dims(feats, self.outputs))
        out.update(self.f_q.default_hypers())
        out.update(self.f_mixing.default_hypers(self.inputs, self.outputs))
        out.update(self.f_likelihood.default_hypers(self.inputs,
                                                    self.outputs))
        return out

    def observed(self, inputs=None, outputs=None, order=None, index=None,
                 hidden=None):
        out = super(SparseVariationalProcess, self).observed(
            inputs=inputs, outputs=outputs, order=order, index=index,
            hidden=hidden)
        x = np.asarray(self._inputs)
        if x.ndim != 2 or x.shape[1] < 2:
            raise ValueError(
                "LMC inputs are (n, d+1) rows whose LAST column is the "
                "output index (build them with with_output/stack_outputs)")
        idx = np.rint(x[:, -1]).astype(np.int64)
        if idx.min() < 0 or idx.max() >= self.n_outputs:
            raise ValueError(
                f"output indices must lie in [0, {self.n_outputs}); got "
                f"[{idx.min()}, {idx.max()}]")
        self.f_inducing.resolve(self._features(x))
        self.f_likelihood.check_targets(self._outputs)
        return out

    # -- latent heads (no location: it is added post-mixing) ----------------------
    def _latent_heads(self, params, xf, want_cov=False):
        """Zero-mean per-latent q(f) moments at feature rows xf:
        mf (n, Q), varf (n, Q) [, covf (Q, n, n)]."""
        z = self.f_inducing.value(params)
        qm, lq = self.f_q.factors(params)           # (Q, m), (Q, m, m)
        if self._shared_kernel:
            # the whitened-head algebra lives once, in svgp.py (zero-mean
            # there; LMC adds location post-mixing)
            k = self.f_kernels[0]
            return _whitened_head_moments(
                k, lambda p, xx: signal_kernel_diag(k, p, xx),
                params, z, xf, qm, lq, want_cov=want_cov)
        # per-latent kernels: Q separate small factorizations (Q ~ 2-4),
        # stacked so the downstream mixing algebra is identical
        mfs, varfs, covfs = [], [], []
        for q, k in enumerate(self.f_kernels):
            kuu = to_cov(k.cov(params, z))
            luu = safe_cholesky(kuu)
            v = solve_lower_triangular(luu, to_num(k.cov(params, z, xf)))
            mfs.append(jnp.matmul(v.T, qm[q],
                                  precision=settings.matmul_precision))
            lv = jnp.matmul(lq[q].T, v,
                            precision=settings.matmul_precision)
            if want_cov:
                kss = to_cov(k.cov(params, xf))
                covfs.append(kss
                             - jnp.matmul(v.T, v,
                                          precision=settings
                                          .matmul_precision)
                             + jnp.matmul(lv.T, lv,
                                          precision=settings
                                          .matmul_precision))
                varfs.append(jnp.diagonal(covfs[-1]))
            else:
                kdiag = signal_kernel_diag(k, params, xf)
                varfs.append(
                    to_bounded(kdiag - jnp.sum(v * v, axis=0), zero32)
                    + jnp.sum(lv * lv, axis=0))
        mf = jnp.stack(mfs, axis=1)
        varf = jnp.stack(varfs, axis=1)
        if want_cov:
            return mf, varf, jnp.stack(covfs, axis=0)
        return mf, varf

    def _prior_heads(self, params, xf):
        """Prior per-latent moments: zero mean, per-kernel diag."""
        if self._shared_kernel:
            kd = to_bounded(signal_kernel_diag(self.f_kernels[0], params,
                                               xf), zero32)
            varf = jnp.broadcast_to(kd[:, None],
                                    (jnp.shape(kd)[0], self.n_latents))
        else:
            varf = jnp.stack(
                [to_bounded(signal_kernel_diag(k, params, xf), zero32)
                 for k in self.f_kernels], axis=1)
        return jnp.zeros_like(varf), varf

    def _mixed(self, params, xq, prior=False):
        """Per-row mixed moments at row-format xq: (mg, vg, idx), each
        (n,), with mg = loc + b_p + W[p]·mf and vg = sum_q W[p,q]^2
        varf_q."""
        xf, idx = self._split(xq)
        if prior:
            mf, varf = self._prior_heads(params, xf)
        else:
            mf, varf = self._latent_heads(params, xf)
        w, b = self.f_mixing.values(params)
        wr = w[idx]                                   # (n, Q)
        mg = (self.f_location(params, xf) + b[idx]
              + jnp.sum(wr * mf, axis=1))
        vg = jnp.sum(wr * wr * varf, axis=1)
        return mg, vg, idx

    # -- the bound ---------------------------------------------------------------
    def _ell(self, params, xb, yb, w=None):
        mg, vg, idx = self._mixed(params, xb)
        e = self.f_likelihood.expected_logp_rows(params, yb, idx, mg, vg)
        if w is not None:
            e = e * w
        return jnp.sum(e)

    # -- moment statistics (scalar rows) -------------------------------------------
    def th_location(self, prior=False, noise=False):
        def fn(params, space, inputs, outputs, vector):
            return self._mixed(params, space, prior=prior)[0]
        return fn

    def th_kernel_diag(self, prior=False, noise=False):
        def fn(params, space, inputs, outputs, vector):
            return self._mixed(params, space, prior=prior)[1]
        return fn

    def th_mean(self, prior=False, noise=False, simulations=None):
        return self.th_location(prior=prior)

    def th_median(self, prior=False, noise=False, simulations=None):
        return self.th_location(prior=prior)

    def th_variance(self, prior=False, noise=False, simulations=None):
        lik = self.f_likelihood

        def fn(params, space, inputs, outputs, vector):
            mg, vg, idx = self._mixed(params, space, prior=prior)
            if noise:
                return vg + lik._vars(params)[idx]
            return vg

        return fn

    def th_covariance(self, prior=False, noise=False):
        lik = self.f_likelihood

        def fn(params, space, inputs, outputs, vector):
            xf, idx = self._split(space)
            w, _b = self.f_mixing.values(params)
            wr = w[idx]                               # (n, Q)
            if prior:
                if self._shared_kernel:
                    kss = to_cov(self.f_kernels[0].cov(params, xf))
                    covf = jnp.broadcast_to(
                        kss[None, :, :],
                        (self.n_latents,) + tuple(jnp.shape(kss)))
                else:
                    covf = jnp.stack(
                        [to_cov(k.cov(params, xf))
                         for k in self.f_kernels], axis=0)
            else:
                covf = self._latent_heads(params, xf, want_cov=True)[2]
            # Cov[g_i, g_j] = sum_q W[p_i,q] W[p_j,q] covf_q[i, j]
            cov = jnp.einsum("iq,qij,jq->ij", wr, covf, wr,
                             precision=settings.matmul_precision)
            if noise:
                cov = cov + jnp.diag(lik._vars(params)[idx])
            return cov

        return fn

    def th_logpredictive(self, prior=False, noise=False):
        """Analytic Gaussian NLPD numerator: sum_i log N(y_i; mg_i,
        vg_i + s2_{p_i})."""
        lik = self.f_likelihood

        def fn(params, space, inputs, outputs, vector):
            mg, vg, idx = self._mixed(params, space, prior=prior)
            tot = vg + lik._vars(params)[idx]
            y = jnp.asarray(vector, settings.dtype)
            return jnp.sum(-0.5 * (LOG2PI + jnp.log(tot))
                           - 0.5 * (y - mg) ** 2 / tot)

        return fn

    # -- user-facing extras ---------------------------------------------------------
    def task_correlations(self, params=None):
        """The learned cross-output LATENT correlation matrix (P, P):
        normalize B = W W' to unit diagonal.  The off-diagonal entries are
        the model's answer to "how much does output i borrow from output
        j's data"."""
        if params is None:
            params = self.params
        w = np.asarray(hval(self.f_mixing.w,
                            {k: np.asarray(v) for k, v in params.items()}))
        b = w @ w.T
        d = np.sqrt(np.maximum(np.diagonal(b), 1e-12))
        return b / np.outer(d, d)

    def predict_proba(self, params=None, space=None, prior=False):
        raise ValueError("LMCSVP is a regression family (no classes)")

    # -- host-side sampling / quantiles ----------------------------------------------
    def sampler(self, params=None, space=None, inputs=None, outputs=None,
                samples=1, prior=False, noise=False, rng=None):
        """(n, samples) draws of the mixed process g (``noise=False``) or
        y (``noise=True``), mean-field across rows like the scalar SVP
        sampler (joint draws via covariance + a host Cholesky if needed)."""
        if params is None:
            params = self.params
        if space is None:
            space = self.space
        if rng is None:
            rng = np.random.default_rng(0)
        mg = np.asarray(self.location(params, space, inputs, outputs,
                                      prior=prior))
        vg = np.maximum(np.asarray(
            self.kernel_diag(params, space, inputs, outputs, prior=prior)),
            0.0)
        if noise:
            pj = {k: np.asarray(v) for k, v in params.items()}
            s2 = np.maximum(np.asarray(hval(self.f_likelihood.var, pj)),
                            1e-10)
            idx = np.rint(np.asarray(space)[:, -1]).astype(np.int64)
            vg = vg + s2[idx]
        return (mg[:, None] + np.sqrt(vg)[:, None]
                * rng.standard_normal((len(mg), samples)).astype(
                    settings.floatx))

    def quantiler(self, params=None, space=None, inputs=None, outputs=None,
                  q=0.975, prior=False, noise=False, simulations=None):
        """Analytic normal predictive quantiles per row."""
        from scipy import stats

        if params is None:
            params = self.params
        if space is None:
            space = self.space
        mg = np.asarray(self.location(params, space, inputs, outputs,
                                      prior=prior))
        vg = np.maximum(np.asarray(
            self.kernel_diag(params, space, inputs, outputs, prior=prior)),
            0.0)
        if noise:
            pj = {k: np.asarray(v) for k, v in params.items()}
            s2 = np.maximum(np.asarray(hval(self.f_likelihood.var, pj)),
                            1e-10)
            idx = np.rint(np.asarray(space)[:, -1]).astype(np.int64)
            vg = vg + s2[idx]
        return stats.norm.ppf(q, loc=mg, scale=np.sqrt(
            np.maximum(vg, 1e-12)))
