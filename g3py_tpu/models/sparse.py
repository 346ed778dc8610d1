"""Sparse (inducing-point) Gaussian processes: SGPR collapsed bound.

No reference counterpart — the reference's only strategy for training sets
too large for the exact O(n^3) objective is subsampling the data
(reference data.py:129-190, ``random_obs`` p-fractions).  This module adds
the standard modern answer, built TPU-first: Titsias' variational
collapsed bound (SGPR; "Variational Learning of Inducing Variables in
Sparse Gaussian Processes", AISTATS 2009) whose entire cost is O(n m^2)
dense matmuls over an (m, n) cross-gram — exactly the shape the MXU wants —
with the n x n gram never materialized in either the objective or its
gradient.

Everything plugs into the existing process API: ``loglike`` IS the ELBO
(a lower bound on the exact marginal likelihood, so ``find_MAP``,
``sample_hypers``, ``Experiment`` and the scores work unchanged),
``predict``/``plot``/``quantiler`` use the sparse posterior
q(f*) = N(K*u Kuu^{-1} m_u, K** - Q** + K*u S K*u'), and
``predictor()`` serves through the baked (Luu, LB, c) state with O(m^2)
streaming updates (``Predictor.updated`` absorbs new points with no
refactorization at all — the sparse analogue of the dense block-Cholesky
extension).

Inducing inputs are a first-class hyper (an (m, d) ``Param`` with a flat
prior): data-driven default via k-means on the observed inputs, trained by
gradient alongside the kernel hypers (``learn_inducing=True``, default),
or pinned (``learn_inducing=False``).

Warped variant: the bound applies to the latent T^{-1}y with the usual
+ log|det dT^{-1}| Jacobian term, mirroring ``GaussianProcess``
(models/gaussian.py th_loglike_fn).
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..config import settings
from ..hypers import Hypers, Flat, hval
from ..hypers.kernels import KernelSum, KernelNoise
from ..ops.guards import to_num, to_cov, to_bounded
from ..ops.linalg import (safe_cholesky, solve_lower_triangular,
                          solve_upper_triangular)
from .elliptical import _contains_kernel_noise
from .gaussian import (GaussianProcess, WarpedGaussianProcess, GUARD,
                       LOG2PI)
from .stochastic import zero32

__all__ = ["InducingPoints", "SparseGaussianProcess",
           "SparseWarpedGaussianProcess", "select_inducing", "SGP", "SWGP"]

# reserved serving-state keys (merged into params by Predictor, like the
# dense STATE_OBS_* family in elliptical.py).  All quantities use the
# UNSCALED V = Luu^{-1} Kuf parametrization (B~ = sigma^2 I + V V') — the
# sigma-scaled textbook form (A = V/sigma, B = I + A A') puts 1/sigma^2
# inside the f32 cancellations and explodes as the optimizer shrinks the
# noise (measured: a +7e7 fake ELBO at sigma^2 -> 0); in the V form every
# cancellation happens at O(|r|^2) magnitude and sigma^2 divides a clamped
# non-negative scalar, so ELBO -> -inf properly.
STATE_SGP_LUU = "_state_sgp_luu"   # chol(Kuu + jitter)              (m, m)
STATE_SGP_LBT = "_state_sgp_lbt"   # chol(B~), B~ = s2 I + V V'      (m, m)
STATE_SGP_CW = "_state_sgp_cw"     # LBt^{-1} V r                    (m,)
STATE_SGP_BT = "_state_sgp_bt"     # B~ itself (streaming updates)   (m, m)
STATE_SGP_W = "_state_sgp_w"       # V r (streaming updates)         (m,)
STATE_SGP_S2 = "_state_sgp_s2"     # noise variance snapshot         ()
STATE_SGP_Z = "_state_sgp_z"       # inducing inputs snapshot        (m, d)


def signal_kernel_diag(kernel, params, x):
    """O(n) signal-kernel diagonal without the n x n gram (the lazy
    pattern of ops/iterative.py:298-300) — shared by the conjugate and
    non-conjugate sparse families."""
    d = x.shape[1] if x.ndim > 1 else 1
    x2 = x if x.ndim > 1 else x[:, None]

    def one(i):
        xi = jax.lax.dynamic_slice(x2, (i, 0), (1, d))
        return kernel.cov(params, xi)[0, 0]

    return jax.vmap(one)(jnp.arange(x2.shape[0]))


def make_inducing(inducing, learn_inducing=True):
    """Normalize the ``inducing=`` constructor argument (int -> k-means
    default of that size, array -> explicit set, InducingPoints -> pass
    through) — shared by both sparse families."""
    if isinstance(inducing, InducingPoints):
        return inducing
    if np.ndim(inducing) >= 1:
        return InducingPoints(z=inducing, trainable=learn_inducing)
    return InducingPoints(m=int(inducing), trainable=learn_inducing)


def _sharded_data_layout(mesh, x_np, y_np):
    """Normalize the ``mesh=`` trainer argument and pad the data rows to
    a device multiple (row 0 clones fill the pad slots; padded rows are
    masked out by the draw weights).  Returns
    ``(mesh, axis, ndev, nloc, xp, yp)`` — shared by the conjugate and
    non-conjugate sharded trainers."""
    from ..parallel.mesh import make_mesh

    if isinstance(mesh, int):
        mesh = make_mesh(mesh, axis_names=("dp",))
    axis = mesh.axis_names[0]
    ndev = int(np.prod(mesh.devices.shape))
    n = x_np.shape[0]
    nloc = -(-n // ndev)
    n_pad = nloc * ndev
    if x_np.ndim == 1:
        x_np = x_np[:, None]
    xp = np.concatenate([x_np, np.tile(x_np[:1], (n_pad - n, 1))], axis=0)
    yp = np.concatenate([y_np, np.tile(y_np[:1], n_pad - n)], axis=0)
    return mesh, axis, ndev, nloc, xp, yp


def _sharded_draw_factory(nloc, bs_local, full_batch):
    """Per-device minibatch draw (runs INSIDE shard_map):
    ``draw(kk, i, n_valid) -> (idx, w, scale_l)`` — uniform local indices
    with an unbiased ``n_valid/bs_local`` scale, or the row-masked
    deterministic full batch.  Devices whose shard is all padding
    (``n_valid == 0``) get weight 0."""

    def draw(kk, i, n_valid):
        if full_batch:
            idx = jnp.arange(nloc)
            w = (idx < n_valid).astype(settings.dtype)
            scale_l = jnp.asarray(1.0, settings.dtype)
        else:
            idx = jax.random.randint(
                jax.random.fold_in(kk, i), (bs_local,), 0,
                jnp.maximum(n_valid, 1))
            w = jnp.full((bs_local,),
                         jnp.where(n_valid > 0, 1.0, 0.0),
                         settings.dtype)
            scale_l = n_valid / bs_local
        return idx, w, scale_l

    return draw


def select_inducing(x, m, seed=0):
    """Data-driven inducing-input initialization: k-means centers of the
    observed inputs (the standard default), falling back to a random
    subset when sklearn is unavailable or the data is degenerate."""
    x = np.asarray(x, np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n = len(x)
    if n <= m:
        # fewer points than inducing slots: tile + tiny jitter so Kuu
        # stays nonsingular under the safe_cholesky jitter search
        reps = -(-m // n)
        rng = np.random.default_rng(seed)
        z = np.tile(x, (reps, 1))[:m]
        z = z + 1e-3 * (x.std(axis=0, keepdims=True) + 1e-6) \
            * rng.standard_normal(z.shape)
        return z.astype(settings.floatx)
    try:
        from sklearn.cluster import KMeans

        km = KMeans(n_clusters=m, n_init=4, random_state=seed).fit(x)
        return km.cluster_centers_.astype(settings.floatx)
    except Exception:
        rng = np.random.default_rng(seed)
        idx = np.sort(rng.choice(n, m, replace=False))
        return x[idx].astype(settings.floatx)


class InducingPoints(Hypers):
    """The (m, d) inducing-input slot as a hyper-bearing component.

    ``trainable=True`` registers one flat-prior Param of shape (m, d) whose
    data-driven default is :func:`select_inducing` (k-means); with
    ``trainable=False`` the value is fixed (given ``z``, or selected once
    from the observed inputs)."""

    def __init__(self, x=None, m=32, z=None, trainable=True, name=None):
        self.m = int(m if z is None else len(z))
        self.z_fixed = (None if z is None
                        else np.asarray(z, settings.floatx))
        self.trainable = bool(trainable)
        self.z = None  # the Param when trainable
        super().__init__(x=x, name=name if name is not None else "Inducing")

    def check_hypers(self, parent=""):
        if self.trainable and self.z is None:
            d = self.shape if isinstance(self.shape, int) else 1
            self.z = self._param(None, parent + self.name + "_z",
                                 prior=Flat(), shape=(self.m, d))

    def default_hypers(self, x=None, y=None):
        if not self.trainable:
            return {}
        if self.z_fixed is not None:
            z0 = self.z_fixed
        elif x is not None:
            z0 = select_inducing(x, self.m)
        else:
            d = self.shape if isinstance(self.shape, int) else 1
            z0 = np.zeros((self.m, d), settings.floatx)
        return {self.z.name: np.asarray(z0, settings.floatx)}

    def value(self, params, inputs=None):
        """Current inducing inputs: the Param value (trainable) or the
        fixed array (selected lazily from the observed inputs)."""
        if self.trainable:
            return jnp.asarray(hval(self.z, params))
        if self.z_fixed is None:
            # resolved host-side by _SparseMixin.observed(); reaching here
            # means a posterior quantity ran before any data was observed
            raise ValueError("fixed inducing points need observed inputs "
                             "to select from (call observed(x, y) first)")
        return jnp.asarray(self.z_fixed)

    def resolve(self, inputs):
        """Select the fixed inducing set from concrete observed inputs
        (host-side; no-op when trainable or already set)."""
        if not self.trainable and self.z_fixed is None and inputs is not None:
            self.z_fixed = select_inducing(np.asarray(inputs), self.m)


class _SparseMixin:
    """Shared sparse machinery layered over GaussianProcess /
    WarpedGaussianProcess: the collapsed-bound loglike (+ masked variant),
    the sparse posterior moments, and the (Luu, LB, c) serving state."""

    def __init__(self, *args, inducing=32, learn_inducing=True, **kwargs):
        self.f_inducing = make_inducing(inducing, learn_inducing)
        super().__init__(*args, **kwargs)
        kn = self.f_kernel_noise
        if not (isinstance(kn, KernelSum) and isinstance(kn.k2, KernelNoise)):
            raise ValueError(
                "sparse processes need the noisy=True "
                "KernelSum(kernel, KernelNoise) construction (the collapsed "
                "bound is defined for a gaussian noise likelihood)")
        if _contains_kernel_noise(self.f_kernel):
            raise ValueError(
                "sparse processes do not support KernelNoise terms inside "
                "the signal kernel (cross-covariances to inducing points "
                "would silently drop them)")

    # -- registration --------------------------------------------------------
    def _components(self):
        return super()._components() + [self.f_inducing]

    def observed(self, inputs=None, outputs=None, order=None, index=None,
                 hidden=None):
        out = super().observed(inputs=inputs, outputs=outputs, order=order,
                               index=index, hidden=hidden)
        # fixed (non-trainable) inducing sets are selected host-side from
        # the concrete observed inputs, never inside a trace
        self.f_inducing.resolve(self._inputs)
        return out

    def _check_hypers(self):
        self.f_inducing.check_dims(self.inputs)
        super()._check_hypers()
        self.f_inducing.check_hypers(self.name + "_")

    def default_hypers(self):
        out = super().default_hypers()
        out.update(self.f_inducing.default_hypers(self.inputs, self.outputs))
        return out

    # -- shared pure pieces --------------------------------------------------
    def _noise_var(self, params):
        return jnp.maximum(hval(self.f_kernel_noise.k2.var, params),
                           jnp.asarray(1e-12, settings.dtype))

    def _zval(self, params, inputs=None):
        if STATE_SGP_Z in params:
            return params[STATE_SGP_Z]
        return self.f_inducing.value(params, inputs)

    def _kernel_diag(self, params, x):
        return signal_kernel_diag(self.f_kernel, params, x)

    def _sparse_factors(self, params, inputs, w=None):
        """(z, sigma2, luu, v, bt, lbt) with V = Luu^{-1} Kuf (unscaled)
        and B~ = sigma^2 I + V V' (columns of V masked by ``w`` when
        given).  See the STATE key comment for why V stays unscaled."""
        z = self._zval(params, inputs)
        sigma2 = self._noise_var(params)
        kuu = to_cov(self.f_kernel.cov(params, z))
        kuf = to_num(self.f_kernel.cov(params, z, inputs))
        luu = safe_cholesky(kuu)
        v = solve_lower_triangular(luu, kuf)
        if w is not None:
            v = v * w[None, :]
        bt = sigma2 * jnp.eye(v.shape[0], dtype=v.dtype) + jnp.matmul(
            v, v.T, precision=settings.matmul_precision)
        lbt = safe_cholesky(bt)
        return z, sigma2, luu, v, bt, lbt

    @staticmethod
    def _elbo_from_factors(sigma2, v, lbt, r, n_eff, kdiag):
        """Shared collapsed-bound arithmetic in the numerically safe
        V-parametrization:

          log N(r | 0, Qff + s2 I) - tr(Kff - Qff)/(2 s2)

        with Qff = V'V, B~ = s2 I + V V', w = V r, cw = LBt^{-1} w:

          logdet(Qff + s2 I) = (n - m) log s2 + 2 sum log diag LBt
          r'(Qff + s2 I)^{-1} r = (|r|^2 - |cw|^2) / s2      [Woodbury]
          tr(Kff - Qff) = sum_i max(kdiag_i - |V_:,i|^2, 0)

        Both 1/s2 numerators are clamped at their mathematical floor of 0,
        so f32 cancellation noise cannot fake a +inf bound as s2 -> 0."""
        m = jnp.asarray(v.shape[0], settings.dtype)
        w_vec = jnp.matmul(v, r, precision=settings.matmul_precision)
        cw = solve_lower_triangular(lbt, w_vec)
        quad_num = jnp.maximum(jnp.dot(r, r) - jnp.dot(cw, cw), 0.0)
        qdiag = jnp.sum(v * v, axis=0)
        trace_num = jnp.sum(jnp.maximum(kdiag - qdiag, 0.0))
        return (-0.5 * n_eff * LOG2PI
                - 0.5 * (n_eff - m) * jnp.log(sigma2)
                - jnp.sum(jnp.log(jnp.diagonal(lbt)))
                - 0.5 * (quad_num + trace_num) / sigma2)

    # -- collapsed bound -----------------------------------------------------
    def th_loglike_fn(self):
        """Titsias collapsed ELBO (the ``loglike`` of this process):

          log N(r | 0, Qff + sigma^2 I) - tr(Kff - Qff) / (2 sigma^2)
            + log|det dT^{-1}(y)|

        computed through the m x m route in the safe V-parametrization
        (see ``_elbo_from_factors``).  A lower bound on the exact GP
        ``loglike`` that is tight as the inducing set approaches the data
        (tests pin both properties)."""
        mapping = self.f_mapping
        location = self.f_location

        def fn(params, space, inputs, outputs):
            mu = location(params, inputs)
            tinv = to_num(mapping.inv(params, outputs))
            r = tinv - mu
            logdet_map = mapping.logdet_dinv(params, outputs)
            z, sigma2, luu, v, _bt, lbt = self._sparse_factors(params,
                                                               inputs)
            n = jnp.asarray(jnp.shape(inputs)[0], settings.dtype)
            kdiag = self._kernel_diag(params, inputs)
            elbo = self._elbo_from_factors(sigma2, v, lbt, r, n, kdiag) \
                + logdet_map
            bad = ((~jnp.all(jnp.isfinite(lbt)))
                   | (~jnp.all(jnp.isfinite(r)))
                   | (~jnp.isfinite(logdet_map)))
            return jnp.where(bad, GUARD, to_num(elbo, nan=GUARD,
                                                neginf=GUARD))

        return fn

    def th_loglike_masked_fn(self):
        """Masked-observation collapsed bound ``fn(params, inputs, outputs,
        w)`` — the ELBO of the included subset at one static shape (the
        sparse counterpart of the identity-row gram surgery in
        models/gaussian.py th_loglike_masked_fn): excluded columns of V and
        entries of r/diag(Kff) are zeroed, so they contribute nothing to
        B~, the quadratic, or the trace."""
        mapping = self.f_mapping
        location = self.f_location

        def fn(params, inputs, outputs, w):
            w = jnp.asarray(w, settings.dtype)
            mu = location(params, inputs)
            tinv = to_num(mapping.inv(params, outputs))
            r = (tinv - mu) * w
            logdet_map = jnp.sum(
                mapping.logdet_dinv_elem(params, outputs) * w)
            z, sigma2, luu, v, _bt, lbt = self._sparse_factors(params,
                                                               inputs, w=w)
            n_eff = jnp.sum(w)
            kdiag = self._kernel_diag(params, inputs) * w
            elbo = self._elbo_from_factors(sigma2, v, lbt, r, n_eff,
                                           kdiag) + logdet_map
            bad = ((~jnp.all(jnp.isfinite(lbt)))
                   | (~jnp.all(jnp.isfinite(r)))
                   | (~jnp.isfinite(logdet_map)))
            return jnp.where(bad, GUARD, to_num(elbo, nan=GUARD,
                                                neginf=GUARD))

        return fn

    # -- sparse posterior moments -------------------------------------------
    def _predict_pieces(self, params, space, inputs, outputs):
        """(tmp1, u2, cw, sigma2): tmp1 = Luu^{-1} Kus, u2 = LBt^{-1} tmp1,
        cw = LBt^{-1} V r — from the baked serving state when present,
        recomputed otherwise.  In this parametrization the predictive
        moments are sigma-stable:

          mean* = loc + u2' cw
          cov*  = Kss - tmp1' tmp1 + sigma^2 u2' u2
        """
        if STATE_SGP_LBT in params:
            z = params[STATE_SGP_Z]
            luu = params[STATE_SGP_LUU]
            lbt = params[STATE_SGP_LBT]
            cw = params[STATE_SGP_CW]
            sigma2 = params[STATE_SGP_S2]
        else:
            mapping = self.f_mapping
            location = self.f_location
            z, sigma2, luu, v, _bt, lbt = self._sparse_factors(params,
                                                               inputs)
            r = to_num(mapping.inv(params, outputs)) - location(params,
                                                                inputs)
            w_vec = jnp.matmul(v, r, precision=settings.matmul_precision)
            cw = solve_lower_triangular(lbt, w_vec)
        kus = to_num(self.f_kernel.cov(params, z, space))   # (m, s)
        tmp1 = solve_lower_triangular(luu, kus)
        u2 = solve_lower_triangular(lbt, tmp1)
        return tmp1, u2, cw, sigma2

    def _posterior_location(self, params, space, inputs, outputs, noise):
        _tmp1, u2, cw, _s2 = self._predict_pieces(params, space, inputs,
                                                  outputs)
        return self.f_location(params, space) + jnp.matmul(
            u2.T, cw, precision=settings.matmul_precision)

    def _posterior_kernel(self, params, space, inputs, outputs, noise):
        tmp1, u2, _cw, sigma2 = self._predict_pieces(params, space, inputs,
                                                     outputs)
        k_ss = self.f_kernel.cov(params, space)
        out = (k_ss
               - jnp.matmul(tmp1.T, tmp1,
                            precision=settings.matmul_precision)
               + sigma2 * jnp.matmul(u2.T, u2,
                                     precision=settings.matmul_precision))
        if noise:
            out = out + jnp.diag(self._noise_diag(params, space))
        return out

    def _posterior_kernel_diag(self, params, space, inputs, outputs, noise):
        tmp1, u2, _cw, sigma2 = self._predict_pieces(params, space, inputs,
                                                     outputs)
        k_diag = self._kernel_diag(params, space)
        latent = to_bounded(
            k_diag - jnp.sum(tmp1 * tmp1, axis=0)
            + sigma2 * jnp.sum(u2 * u2, axis=0), zero32)
        if noise:
            return latent + self._noise_diag(params, space)
        return latent

    # -- serving state -------------------------------------------------------
    def _posterior_state_pure(self):
        """Sparse serving state: O(n m^2) once, then every statistic is
        O(s m^2 + s m) per query batch (vs the dense predictor's O(n^2 s)).
        """
        mapping = self.f_mapping
        location = self.f_location

        def pure(p, inputs, outputs):
            z, sigma2, luu, v, bt, lbt = self._sparse_factors(p, inputs)
            r = to_num(mapping.inv(p, outputs)) - location(p, inputs)
            w_vec = jnp.matmul(v, r, precision=settings.matmul_precision)
            cw = solve_lower_triangular(lbt, w_vec)
            return {STATE_SGP_Z: z, STATE_SGP_LUU: luu, STATE_SGP_LBT: lbt,
                    STATE_SGP_CW: cw, STATE_SGP_BT: bt, STATE_SGP_W: w_vec,
                    STATE_SGP_S2: sigma2}

        return pure

    def _posterior_state_update_pure(self):
        """O(m^2 (m + batch)) streaming update — cheaper than the dense
        block-Cholesky extension by a factor of (n/m)^2: new columns of A
        rank-update B and the projected residual, then one m x m Cholesky.
        """
        mapping = self.f_mapping
        location = self.f_location

        def pure(p, state, x_old, x_new, y_new):
            z = state[STATE_SGP_Z]
            luu = state[STATE_SGP_LUU]
            kuf_new = to_num(self.f_kernel.cov(p, z, x_new))
            v_new = solve_lower_triangular(luu, kuf_new)
            r_new = to_num(mapping.inv(p, y_new)) - location(p, x_new)
            bt = state[STATE_SGP_BT] + jnp.matmul(
                v_new, v_new.T, precision=settings.matmul_precision)
            w_vec = state[STATE_SGP_W] + jnp.matmul(
                v_new, r_new, precision=settings.matmul_precision)
            lbt = safe_cholesky(bt)
            cw = solve_lower_triangular(lbt, w_vec)
            return {STATE_SGP_Z: z, STATE_SGP_LUU: luu, STATE_SGP_LBT: lbt,
                    STATE_SGP_CW: cw, STATE_SGP_BT: bt, STATE_SGP_W: w_vec,
                    STATE_SGP_S2: state[STATE_SGP_S2]}

        return pure


    # -- stochastic (minibatch) training: SVGP --------------------------------
    def _svgp_batch_pieces(self):
        """Closure computing the per-minibatch quantities every SVGP step
        needs: ``fn(p, xb, yb) -> (vb, tb, locb, logdet_elem, kdiag_b,
        sigma2)`` with ``vb = Luu^{-1} K(z, xb)`` (m, |B|) and the warping
        log-Jacobian PER ELEMENT (so sharded/masked callers can weight
        rows).  O(|B| m^2)."""
        mapping = self.f_mapping
        location = self.f_location
        kernel = self.f_kernel

        def fn(p, xb, yb):
            z = self._zval(p)
            sigma2 = self._noise_var(p)
            kuu = to_cov(kernel.cov(p, z))
            luu = safe_cholesky(kuu)
            vb = solve_lower_triangular(luu, to_num(kernel.cov(p, z, xb)))
            tb = to_num(mapping.inv(p, yb))
            locb = location(p, xb)
            logdet_elem = mapping.logdet_dinv_elem(p, yb)
            kdiag_b = self._kernel_diag(p, xb)
            return vb, tb, locb, logdet_elem, kdiag_b, sigma2

        return fn

    def fit_svgp(self, batch_size=1024, steps=2000, lr=1e-2, start=None,
                 key=0, display=True, natgrad=None, mesh=None):
        """Stochastic variational training (Hensman et al. 2013, "Gaussian
        Processes for Big Data"): minibatch Adam on the UNCOLLAPSED bound

          n/|B| sum_{i in B} E_q[log N(t_i | f_i, s2)] - KL(q(u) || p(u))
          + n/|B| sum_{i in B} logdet dT^{-1}(y_i) + log p(hypers)

        with a whitened q(u) = N(Luu (m_q + eps), Luu Lq Lq' Luu') so the
        KL is against N(0, I).  The whole loop — minibatch sampling
        included — is ONE ``lax.scan`` under jit: step cost is O(|B| m^2),
        independent of n, so training runs at Adam speed for n far beyond
        what even the collapsed bound's O(n m^2) evaluation allows.

        ``natgrad=rho`` (e.g. 0.2) switches the variational parameters to
        NATURAL-gradient coordinate ascent (Hensman 2013 eq. 12 / Salimbeni
        et al. 2018 "Natural Gradients in Practice"): q is carried in its
        natural parameters (nu, Lambda) = (S^{-1} m, S^{-1}) of the
        whitened q(w) = N(m, S), and each step moves them a fraction
        ``rho`` toward the minibatch stationary point — which is CLOSED
        FORM for the (warped-)Gaussian likelihood:

          Lambda_hat = I + (n/|B|) V_B V_B' / s2,
          nu_hat     = (n/|B|) V_B r_B / s2 .

        At rho=1 and |B|=n this recovers the exact collapsed optimum in
        ONE step; with minibatches rho~0.1-0.5 converges in far fewer
        steps than Adam on (m_q, L_q) because the likelihood term is
        conjugate — only the hypers still need Adam.  Lambda stays PD by
        construction (a convex combination of PD matrices).

        Serving stays exactly-collapsed: for the Gaussian likelihood the
        optimal q(u) at fixed hypers IS the SGPR solution, so pass the
        returned hypers to :meth:`predictor`/:meth:`predict` (one O(n m^2)
        factorization) rather than serving from the trained q.

        Returns ``(params, losses)``: trained natural-space hypers
        (including the inducing inputs) and the per-step negative-ELBO
        trace.  Minibatches are sampled with replacement (standard SGD
        practice; keeps the in-scan sampler O(|B|)).

        ``mesh=`` (an int device count or a ``jax.sharding.Mesh``) runs the
        same loop DATA-PARALLEL over the mesh: the training rows are
        sharded across devices, each device draws its own minibatch shard,
        and per-step losses/gradients (and, under ``natgrad``, the
        closed-form natural-parameter statistics) are combined with one
        ``psum`` — the total batch is ``batch_size`` split evenly, so step
        cost is O(|B| m^2 / D) plus one m-sized all-reduce."""
        import optax

        if mesh is not None:
            return self._fit_svgp_sharded(
                mesh, batch_size=batch_size, steps=steps, lr=lr,
                start=start, key=key, display=display, natgrad=natgrad)

        reg = self.active
        if start is None:
            start = self.params_default
        u0 = jnp.asarray(reg.dict_to_array(start))
        x_all = jnp.asarray(self._inputs)
        y_all = jnp.asarray(self._outputs)
        n = x_all.shape[0]
        bs = int(min(batch_size, n))
        m = self.f_inducing.m
        prior_pure = self._logp_pure(prior=True)
        pieces = self._svgp_batch_pieces()
        vec0 = jnp.zeros(0, dtype=settings.dtype)
        eye_m = jnp.eye(m, dtype=settings.dtype)
        scale = n / bs

        if bs >= n:
            # full-batch mode is deterministic (with-replacement sampling
            # at bs=n would duplicate ~37% of rows and bias the bound)
            def _draw_idx(kk):
                return jnp.arange(n)
        else:
            def _draw_idx(kk):
                return jax.random.randint(kk, (bs,), 0, n)

        def neg_elbo(theta, idx):
            p = reg.array_to_dict_jax(theta["u"])
            lq = jnp.tril(theta["lq"], -1) + jnp.diag(jnp.exp(theta["ld"]))
            mq = theta["mq"]
            xb = x_all[idx]
            yb = y_all[idx]
            vb, tb, locb, logdet_e, kdiag_b, sigma2 = pieces(p, xb, yb)
            logdet_b = jnp.sum(logdet_e)
            mf = locb + jnp.matmul(vb.T, mq,
                                   precision=settings.matmul_precision)
            lv = jnp.matmul(lq.T, vb, precision=settings.matmul_precision)
            varf = jnp.maximum(
                kdiag_b - jnp.sum(vb * vb, axis=0), 0.0) \
                + jnp.sum(lv * lv, axis=0)
            exp_ll = (-0.5 * LOG2PI - 0.5 * jnp.log(sigma2)
                      - ((tb - mf) ** 2 + varf) / (2.0 * sigma2))
            kl = 0.5 * (jnp.dot(mq, mq) + jnp.sum(lq * lq)
                        - 2.0 * jnp.sum(theta["ld"]) - m)
            elbo = (scale * (jnp.sum(exp_ll) + logdet_b) - kl
                    + prior_pure(p, xb, xb, yb, vec0))
            # any non-finite ELBO reads as 'very bad' (loss +1e30), never
            # as a win — same hardening as the optimizer objectives
            return -to_num(elbo, nan=GUARD, posinf=GUARD, neginf=GUARD)

        def neg_elbo_nat(u_arr, nat1, nat2, idx):
            """ELBO at hypers u with q fixed in natural coordinates:
            S = Lambda^{-1}, m = Lambda^{-1} nu, via Cl = chol(Lambda)."""
            p = reg.array_to_dict_jax(u_arr)
            xb = x_all[idx]
            yb = y_all[idx]
            vb, tb, locb, logdet_e, kdiag_b, sigma2 = pieces(p, xb, yb)
            logdet_b = jnp.sum(logdet_e)
            cl = safe_cholesky(nat2)
            mq = solve_upper_triangular(
                cl.T, solve_lower_triangular(cl, nat1))
            civ = solve_lower_triangular(cl, vb)          # v' S v = |.|^2
            mf = locb + jnp.matmul(vb.T, mq,
                                   precision=settings.matmul_precision)
            varf = jnp.maximum(
                kdiag_b - jnp.sum(vb * vb, axis=0), 0.0) \
                + jnp.sum(civ * civ, axis=0)
            exp_ll = (-0.5 * LOG2PI - 0.5 * jnp.log(sigma2)
                      - ((tb - mf) ** 2 + varf) / (2.0 * sigma2))
            ci = solve_lower_triangular(cl, eye_m)        # tr S, logdet S
            kl = 0.5 * (jnp.dot(mq, mq) + jnp.sum(ci * ci)
                        + 2.0 * jnp.sum(jnp.log(jnp.diagonal(cl))) - m)
            elbo = (scale * (jnp.sum(exp_ll) + logdet_b) - kl
                    + prior_pure(p, xb, xb, yb, vec0))
            return -to_num(elbo, nan=GUARD, posinf=GUARD, neginf=GUARD)

        opt = optax.adam(lr)
        if isinstance(key, int):
            key = jax.random.PRNGKey(key)

        if natgrad is None:
            theta0 = {"u": u0,
                      "mq": jnp.zeros((m,), settings.dtype),
                      "lq": jnp.zeros((m, m), settings.dtype),
                      "ld": jnp.zeros((m,), settings.dtype)}

            @jax.jit
            def run(theta, opt_state, k):
                def step(carry, kk):
                    th, st = carry
                    idx = _draw_idx(kk)
                    loss, g = jax.value_and_grad(neg_elbo)(th, idx)
                    updates, st = opt.update(g, st, th)
                    th = optax.apply_updates(th, updates)
                    return (th, st), loss

                keys = jax.random.split(k, steps)
                (theta, opt_state), losses = jax.lax.scan(
                    step, (theta, opt_state), keys)
                return theta, losses

            theta, losses = run(theta0, opt.init(theta0), key)
        else:
            rho = float(natgrad)
            if not 0.0 < rho <= 1.0:
                raise ValueError("natgrad must be a step size in (0, 1]")
            theta0 = {"u": u0}

            @jax.jit
            def run(theta, opt_state, k):
                def step(carry, kk):
                    th, nat1, nat2, st = carry
                    idx = _draw_idx(kk)
                    # 1. NGD on q: closed-form minibatch stationary point
                    p = reg.array_to_dict_jax(th["u"])
                    vb, tb, locb, _ld, _kd, sigma2 = pieces(
                        p, x_all[idx], y_all[idx])
                    rb = tb - locb
                    lam_hat = eye_m + (scale / sigma2) * jnp.matmul(
                        vb, vb.T, precision=settings.matmul_precision)
                    nu_hat = (scale / sigma2) * jnp.matmul(
                        vb, rb, precision=settings.matmul_precision)
                    nat2 = (1.0 - rho) * nat2 + rho * lam_hat
                    nat1 = (1.0 - rho) * nat1 + rho * nu_hat
                    # 2. Adam on the hypers at the updated q
                    loss, g = jax.value_and_grad(neg_elbo_nat)(
                        th["u"], nat1, nat2, idx)
                    updates, st = opt.update({"u": g}, st, th)
                    th = optax.apply_updates(th, updates)
                    return (th, nat1, nat2, st), loss

                keys = jax.random.split(k, steps)
                nat1_0 = jnp.zeros((m,), settings.dtype)
                (theta, _n1, _n2, opt_state), losses = jax.lax.scan(
                    step, (theta, nat1_0, eye_m, opt_state), keys)
                return theta, losses

            theta, losses = run(theta0, opt.init(theta0), key)

        losses = np.asarray(losses)
        if display:
            mode = "adam" if natgrad is None else f"natgrad rho={natgrad}"
            print(f"fit_svgp[{mode}]: {steps} steps, -elbo {losses[0]:.1f} "
                  f"-> {losses[-1]:.1f} (batch {bs}, n {n})")
        params = reg.array_to_dict(np.asarray(theta["u"], settings.floatx))
        return params, losses

    def _fit_svgp_sharded(self, mesh, batch_size=1024, steps=2000, lr=1e-2,
                          start=None, key=0, display=True, natgrad=None):
        """Data-parallel SVGP: rows sharded over the mesh's first axis,
        one ``shard_map``-wrapped ``lax.scan`` for the whole loop.

        Every per-step reduction over the batch (expected log-likelihood,
        warping log-Jacobian, NGD sufficient statistics V_B V_B' / V_B r_B)
        is computed on local rows then ``psum``-ed, so the result is
        mathematically the single-device estimator on the concatenated
        batch; KL and the hyper prior are computed replicated and counted
        once via a 1/D share per device.  With ``batch_size >= n`` the
        full (padded, row-masked) data is used each step and the loop is
        deterministic — the sharded ELBO then matches the single-device
        full-batch value exactly (tested on the virtual 8-device mesh)."""
        import optax
        from jax import lax
        from jax.sharding import PartitionSpec as P

        reg = self.active
        if start is None:
            start = self.params_default
        u0 = jnp.asarray(reg.dict_to_array(start))
        mesh, axis, ndev, nloc, xp, yp = _sharded_data_layout(
            mesh, np.asarray(self._inputs), np.asarray(self._outputs))
        n = self._inputs.shape[0]

        bs = int(min(batch_size, n))
        bs_local = max(bs // ndev, 1)
        full_batch = bs >= n
        m = self.f_inducing.m
        pieces = self._svgp_batch_pieces()
        prior_pure = self._logp_pure(prior=True)
        vec0 = jnp.zeros(0, dtype=settings.dtype)
        eye_m = jnp.eye(m, dtype=settings.dtype)
        rho = None
        if natgrad is not None:
            rho = float(natgrad)
            if not 0.0 < rho <= 1.0:
                raise ValueError("natgrad must be a step size in (0, 1]")

        def local_neg_elbo(th, nat, x_loc, y_loc, idx, w, scale_l):
            """This device's share of the global negative ELBO: its scaled
            batch data terms plus 1/D of the (replicated) KL and prior."""
            p = reg.array_to_dict_jax(th["u"])
            xb = x_loc[idx]
            yb = y_loc[idx]
            vb, tb, locb, logdet_e, kdiag_b, sigma2 = pieces(p, xb, yb)
            vb = vb * w[None, :]
            if rho is None:
                lq = jnp.tril(th["lq"], -1) + jnp.diag(jnp.exp(th["ld"]))
                mq = th["mq"]
                lv = jnp.matmul(lq.T, vb,
                                precision=settings.matmul_precision)
                vsv = jnp.sum(lv * lv, axis=0)
                kl = 0.5 * (jnp.dot(mq, mq) + jnp.sum(lq * lq)
                            - 2.0 * jnp.sum(th["ld"]) - m)
            else:
                nat1, nat2 = nat
                cl = safe_cholesky(nat2)
                mq = solve_upper_triangular(
                    cl.T, solve_lower_triangular(cl, nat1))
                civ = solve_lower_triangular(cl, vb)
                vsv = jnp.sum(civ * civ, axis=0)
                ci = solve_lower_triangular(cl, eye_m)
                kl = 0.5 * (jnp.dot(mq, mq) + jnp.sum(ci * ci)
                            + 2.0 * jnp.sum(jnp.log(jnp.diagonal(cl))) - m)
            mf = locb + jnp.matmul(vb.T, mq,
                                   precision=settings.matmul_precision)
            varf = jnp.maximum(
                kdiag_b - jnp.sum(vb * vb, axis=0), 0.0) * w + vsv
            exp_ll = (-0.5 * LOG2PI - 0.5 * jnp.log(sigma2)
                      - ((tb - mf) ** 2 * w + varf) / (2.0 * sigma2)) * w
            data = scale_l * (jnp.sum(exp_ll) + jnp.sum(logdet_e * w))
            share = data + (prior_pure(p, xb, xb, yb, vec0) - kl) / ndev
            return -to_num(share, nan=GUARD, posinf=GUARD, neginf=GUARD)

        opt = optax.adam(lr)
        if isinstance(key, int):
            key = jax.random.PRNGKey(key)
        if rho is None:
            theta0 = {"u": u0,
                      "mq": jnp.zeros((m,), settings.dtype),
                      "lq": jnp.zeros((m, m), settings.dtype),
                      "ld": jnp.zeros((m,), settings.dtype)}
        else:
            theta0 = {"u": u0}

        draw = _sharded_draw_factory(nloc, bs_local, full_batch)

        def body(x_loc, y_loc, theta, k):
            i = lax.axis_index(axis)
            n_valid = jnp.clip(n - i * nloc, 0, nloc)

            def step(carry, kk):
                th, nat1, nat2, st = carry
                idx, w, scale_l = draw(kk, i, n_valid)
                if rho is not None:
                    p = reg.array_to_dict_jax(th["u"])
                    vb, tb, locb, _le, _kd, sigma2 = pieces(
                        p, x_loc[idx], y_loc[idx])
                    vb = vb * w[None, :]
                    rb = (tb - locb) * w
                    lam_c = lax.psum(
                        scale_l * jnp.matmul(
                            vb, vb.T, precision=settings.matmul_precision),
                        axis) / sigma2
                    nu_c = lax.psum(
                        scale_l * jnp.matmul(
                            vb, rb, precision=settings.matmul_precision),
                        axis) / sigma2
                    nat2 = (1.0 - rho) * nat2 + rho * (eye_m + lam_c)
                    nat1 = (1.0 - rho) * nat1 + rho * nu_c
                loss_l, g_l = jax.value_and_grad(local_neg_elbo)(
                    th, (nat1, nat2), x_loc, y_loc, idx, w, scale_l)
                loss = lax.psum(loss_l, axis)
                g = jax.tree.map(lambda a: lax.psum(a, axis), g_l)
                updates, st = opt.update(g, st, th)
                th = optax.apply_updates(th, updates)
                return (th, nat1, nat2, st), loss

            keys = jax.random.split(k, steps)
            nat1_0 = jnp.zeros((m,), settings.dtype)
            (th, _n1, _n2, _st), losses = lax.scan(
                step, (theta, nat1_0, eye_m, opt.init(theta)), keys)
            return th, losses

        run = jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(axis), P(axis), P(), P()),
            out_specs=(P(), P()), check_vma=False))
        theta, losses = run(jnp.asarray(xp, settings.dtype),
                            jnp.asarray(yp, settings.dtype), theta0, key)
        losses = np.asarray(losses)
        if display:
            mode = "adam" if rho is None else f"natgrad rho={rho}"
            print(f"fit_svgp[{mode}, {ndev}-dev {axis}]: {steps} steps, "
                  f"-elbo {losses[0]:.1f} -> {losses[-1]:.1f} "
                  f"(global batch {bs}, n {n})")
        params = reg.array_to_dict(np.asarray(theta["u"], settings.floatx))
        return params, losses


class SparseGaussianProcess(_SparseMixin, GaussianProcess):
    """SGPR: sparse variational GP regression with the collapsed bound.

    >>> sgp = g3.SGP(space=x, location=g3.Bias(), kernel=g3.SE(x),
    ...              inducing=64)
    >>> sgp.observed(x, y)
    >>> params = sgp.find_MAP()      # hypers AND inducing inputs by grad
    >>> pred = sgp.predict(params)   # sparse posterior, O(n m^2)
    """

    def __init__(self, *args, **kwargs):
        if "name" not in kwargs:
            kwargs["name"] = "SGP"
        super().__init__(*args, **kwargs)


class SparseWarpedGaussianProcess(_SparseMixin, WarpedGaussianProcess):
    """Warped-observation SGPR: collapsed bound on the latent T^{-1}y plus
    the warping Jacobian; moments via Gauss-Hermite over the sparse latent
    posterior."""

    def __init__(self, *args, **kwargs):
        if "name" not in kwargs:
            kwargs["name"] = "SWGP"
        super().__init__(*args, **kwargs)


SGP = SparseGaussianProcess
SWGP = SparseWarpedGaussianProcess
