"""Observation likelihoods for the non-conjugate sparse variational family.

No reference counterpart — the reference's only non-Gaussian observation
story is deterministic warping (reference gaussian.py:115-174 WGP), which
cannot express heavy-tailed NOISE (outliers) or discrete observations.
This module supplies the elementwise likelihoods p(y_i | f_i) that
:class:`~g3py_tpu.models.svgp.SparseVariationalProcess` integrates over
its Gaussian q(f) with Gauss-Hermite quadrature (ops/quadrature.py):

* :class:`GaussianLik` — conjugate baseline (analytic expected log-lik);
  an SVP with this likelihood is exactly SVGP regression and converges to
  the SGPR collapsed optimum (tested).
* :class:`StudentTLik` — robust regression: Student-t noise with
  trainable scale and dof.
* :class:`BernoulliLik` — probit classification; the predictive class
  probability E[Phi(f)] is ANALYTIC under a Gaussian q(f):
  Phi(mu / sqrt(1 + var)).
* :class:`PoissonLik` — count regression with a log link; expected
  log-likelihood AND predictive moments are analytic (lognormal
  moments), no quadrature at all.
* :class:`NegBinomialLik` — OVERDISPERSED counts (trainable
  concentration; Poisson is the r -> inf limit).

Each likelihood is a :class:`~g3py_tpu.hypers.Hypers` component: its
parameters (noise scale, dof) are ordinary model hypers — trained by
``find_MAP``/``fit_svgp`` and sampled by ``sample_hypers`` like any
kernel hyper.
"""

import numpy as np
import jax.numpy as jnp
from jax.nn import softmax
from jax.scipy.special import gammaln, log_ndtr, logsumexp, ndtr

from ..config import settings
from ..hypers import Hypers, FlatExp, hval, is_param
from ..ops.quadrature import hermgauss

__all__ = ["Likelihood", "GaussianLik", "StudentTLik", "BernoulliLik",
           "PoissonLik", "NegBinomialLik", "OrdinalLik", "CategoricalLik",
           "HeteroscedasticLik"]

LOG2PI = np.log(2.0 * np.pi).astype(np.float32)
_SQRT2 = np.sqrt(2.0).astype(np.float32)
_SQRTPI = np.sqrt(np.pi).astype(np.float32)


class Likelihood(Hypers):
    """Elementwise observation model p(y | f) over the latent GP value f.

    Subclasses implement :meth:`logp_elem` (vectorized over broadcastable
    ``y``/``f``), :meth:`cond_mean` and :meth:`cond_var` (conditional
    moments of y given f).  The base class provides the two Gaussian
    integrals every variational objective and prediction needs, both as
    ``degree``-point Gauss-Hermite sums (subclasses override when the
    integral is analytic):

    * :meth:`expected_logp` — E_{f~N(mu, var)}[log p(y | f)] (the ELBO's
      data term),
    * :meth:`predictive_moments` — mean/variance of y under f~N(mu, var)
      (law of total variance through the quadrature grid).
    """

    degree = 20

    def logp_elem(self, params, y, f):
        raise NotImplementedError

    def cond_mean(self, params, f):
        raise NotImplementedError

    def cond_var(self, params, f):
        raise NotImplementedError

    def _grid(self, mu, var):
        a, w = hermgauss(self.degree, settings.dtype)
        sd = jnp.sqrt(jnp.maximum(jnp.asarray(var, settings.dtype), 1e-12))
        f = jnp.asarray(mu, settings.dtype)[None, :] \
            + _SQRT2 * sd[None, :] * a[:, None]
        return f, w / _SQRTPI

    def expected_logp(self, params, y, mu, var):
        f, w = self._grid(mu, var)
        lp = self.logp_elem(params, jnp.asarray(y)[None, :], f)
        return jnp.dot(w, lp)

    def predictive_moments(self, params, mu, var):
        f, w = self._grid(mu, var)
        cm = self.cond_mean(params, f)
        m = jnp.dot(w, cm)
        e2 = jnp.dot(w, self.cond_var(params, f) + cm * cm)
        return m, jnp.maximum(e2 - m * m, 0.0)

    def noise_var(self, params):
        """Marginal observation-noise variance (f-independent), or None
        when no additive-noise decomposition exists (e.g. Bernoulli).
        Used by covariance statistics: Cov[y_i, y_j] = Cov[f_i, f_j] +
        delta_ij * noise_var for conditionally independent noise."""
        return None

    def check_targets(self, y):
        """Host-side validation of observed targets (subclass hook)."""
        return None

    def latent_guess(self, y):
        """Host-side map of targets into LATENT (f) space for
        data-driven hyper defaults (mixing biases/scales start near the
        latent offsets, not the observation scale).  Identity for
        additive-noise likelihoods; log-link and probit subclasses
        override."""
        return np.asarray(y, settings.floatx)


class GaussianLik(Likelihood):
    """y = f + eps, eps ~ N(0, var): the conjugate baseline.  Expected
    log-lik is analytic: -(log 2 pi var)/2 - ((y-mu)^2 + var_f)/(2 var)."""

    def __init__(self, x=None, var=None, name=None):
        self.var = var
        super().__init__(x=x, name=name if name is not None else "GaussLik")

    def check_hypers(self, parent=""):
        self.var = self._param(self.var, parent + self.name + "_var",
                               FlatExp())

    def default_hypers(self, x=None, y=None):
        if is_param(self.var) and y is not None:
            return {self.var: np.asarray(np.var(y) / 10.0 + 1e-6,
                                         settings.floatx)}
        return {}

    def _var(self, params):
        return jnp.maximum(hval(self.var, params),
                           jnp.asarray(1e-10, settings.dtype))

    def logp_elem(self, params, y, f):
        s2 = self._var(params)
        return -0.5 * (LOG2PI + jnp.log(s2)) - (y - f) ** 2 / (2.0 * s2)

    def cond_mean(self, params, f):
        return f

    def cond_var(self, params, f):
        return jnp.broadcast_to(self._var(params), jnp.shape(f))

    def expected_logp(self, params, y, mu, var):
        s2 = self._var(params)
        return (-0.5 * (LOG2PI + jnp.log(s2))
                - ((jnp.asarray(y) - mu) ** 2 + var) / (2.0 * s2))

    def predictive_moments(self, params, mu, var):
        return mu, var + self._var(params)

    def noise_var(self, params):
        return self._var(params)


class StudentTLik(Likelihood):
    """y = f + eps, eps ~ t_nu(0, scale): robust regression.  Outliers get
    polynomial (not exponential) penalty, so a few bad rows cannot drag
    the posterior mean — the standard fix the reference had no answer for
    beyond manual data cleaning.  ``var`` is the squared scale; ``nu`` is
    trainable (FlatExp, default 4)."""

    def __init__(self, x=None, var=None, nu=None, name=None):
        self.var = var
        self.nu = nu
        super().__init__(x=x, name=name if name is not None else "StudentTLik")

    def check_hypers(self, parent=""):
        self.var = self._param(self.var, parent + self.name + "_var",
                               FlatExp())
        self.nu = self._param(self.nu, parent + self.name + "_nu", FlatExp())

    def default_hypers(self, x=None, y=None):
        out = {}
        if is_param(self.var) and y is not None:
            out[self.var] = np.asarray(np.var(y) / 10.0 + 1e-6,
                                       settings.floatx)
        if is_param(self.nu):
            out[self.nu] = np.asarray(4.0, settings.floatx)
        return out

    def _var_nu(self, params):
        s2 = jnp.maximum(hval(self.var, params),
                         jnp.asarray(1e-10, settings.dtype))
        nu = jnp.maximum(hval(self.nu, params),
                         jnp.asarray(1.0, settings.dtype))
        return s2, nu

    def logp_elem(self, params, y, f):
        s2, nu = self._var_nu(params)
        r2 = (y - f) ** 2 / s2
        return (gammaln((nu + 1.0) / 2.0) - gammaln(nu / 2.0)
                - 0.5 * jnp.log(nu * np.pi * s2)
                - (nu + 1.0) / 2.0 * jnp.log1p(r2 / nu))

    def cond_mean(self, params, f):
        return f

    def cond_var(self, params, f):
        # The Student-t variance is infinite for nu <= 2; clamping the
        # REPORTED variance at nu_eff = max(nu, 2.05) keeps predictive
        # bands finite when training drives nu into the very-heavy-tail
        # regime (the logp itself stays exact — only moment REPORTING is
        # clamped; quantiles via ``sampler`` remain faithful).
        s2, nu = self._var_nu(params)
        nu_eff = jnp.maximum(nu, 2.05)
        v = s2 * nu_eff / (nu_eff - 2.0)
        return jnp.broadcast_to(v, jnp.shape(f))

    def noise_var(self, params):
        return self.cond_var(params, jnp.zeros(()))


class PoissonLik(Likelihood):
    """Count data with a log link: y ~ Poisson(exp(f)).  Everything the
    variational objective and prediction need is ANALYTIC under Gaussian
    q(f) (lognormal moments):

      E[log p(y|f)] = y mu - exp(mu + var/2) - log y!     (exact)
      E[y*] = exp(mu + var/2)
      Var[y*] = E[y*] + E[y*]^2 (exp(var) - 1)            (total variance)

    No hypers."""

    def __init__(self, x=None, name=None):
        super().__init__(x=x, name=name if name is not None else "PoisLik")

    def check_hypers(self, parent=""):
        pass

    def default_hypers(self, x=None, y=None):
        return {}

    def logp_elem(self, params, y, f):
        y = jnp.asarray(y, settings.dtype)
        return y * f - jnp.exp(f) - gammaln(y + 1.0)

    def cond_mean(self, params, f):
        return jnp.exp(f)

    def cond_var(self, params, f):
        return jnp.exp(f)

    def expected_logp(self, params, y, mu, var):
        y = jnp.asarray(y, settings.dtype)
        rate = jnp.exp(jnp.asarray(mu, settings.dtype)
                       + 0.5 * jnp.asarray(var, settings.dtype))
        return y * mu - rate - gammaln(y + 1.0)

    def predictive_moments(self, params, mu, var):
        mu = jnp.asarray(mu, settings.dtype)
        var = jnp.asarray(var, settings.dtype)
        m = jnp.exp(mu + 0.5 * var)
        v = m + m * m * jnp.expm1(var)
        return m, jnp.maximum(v, 0.0)

    # noise_var deliberately NOT overridden: Poisson noise is
    # rate-dependent, not additive — the base-class None routes
    # covariance(noise=True) to the clear unavailable error.

    def check_targets(self, y):
        ya = np.asarray(y)
        if np.any(ya < 0) or not np.allclose(ya, np.round(ya), atol=1e-6):
            raise ValueError(
                "PoissonLik targets must be non-negative integer counts")

    def latent_guess(self, y):
        """Counts -> log rate: log(y + 0.5) (the +0.5 keeps zeros
        finite without biasing small counts much)."""
        return np.log(np.asarray(y, settings.floatx) + 0.5)


class NegBinomialLik(PoissonLik):
    """OVERDISPERSED counts with a log link: y ~ NegBinomial with mean
    ``m = exp(f)`` and trainable concentration ``r`` (``dispersion``), so
    ``Var[y|f] = m + m^2/r`` — Poisson is the ``r -> inf`` limit.  The
    standard fix when count data show more variance than a Poisson rate
    can carry (bursty event streams, biological counts); training the
    single extra hyper decides the Poisson-vs-overdispersed question
    from the data.

    log p(y|f) = lgamma(y+r) - lgamma(r) - lgamma(y+1)
                 + r log r + y f - (y+r) log(r + e^f),

    which is log-concave in f (d2 = -(y+r) s(1-s), s = e^f/(r+e^f)), so
    the Laplace Newton loop of
    :class:`~g3py_tpu.models.ngssm.NonGaussianSSGP` converges cleanly.
    Predictive MOMENTS under Gaussian q(f) stay analytic (lognormal
    moments + law of total variance); the expected log-lik uses the
    base-class Gauss-Hermite grid (the ``(y+r) log(r+e^f)`` term has no
    closed Gaussian integral).  Subclasses :class:`PoissonLik` so every
    discrete-link special case (exp-link quantiles, no-median, count
    target validation) applies unchanged."""

    def __init__(self, x=None, dispersion=None, name=None):
        self.dispersion = dispersion
        Likelihood.__init__(self, x=x,
                            name=name if name is not None else "NegBinLik")

    def check_hypers(self, parent=""):
        self.dispersion = self._param(
            self.dispersion, parent + self.name + "_dispersion", FlatExp())

    def default_hypers(self, x=None, y=None):
        """Method-of-moments concentration: r = m^2 / (s^2 - m), clipped
        to [0.1, 100] (s^2 <= m means no visible overdispersion — start
        near-Poisson at r=100)."""
        if is_param(self.dispersion) and y is not None:
            ya = np.asarray(y, np.float64)
            m, v = float(ya.mean()), float(ya.var())
            r0 = m * m / (v - m) if v > m + 1e-6 and m > 0 else 100.0
            return {self.dispersion: np.asarray(
                np.clip(r0, 0.1, 100.0), settings.floatx)}
        return {}

    def _r(self, params):
        return jnp.maximum(hval(self.dispersion, params),
                           jnp.asarray(1e-3, settings.dtype))

    def logp_elem(self, params, y, f):
        r = self._r(params)
        y = jnp.asarray(y, settings.dtype)
        # log(r + e^f) = logaddexp(log r, f): overflow-stable both tails
        lse = jnp.logaddexp(jnp.log(r), f)
        return (gammaln(y + r) - gammaln(r) - gammaln(y + 1.0)
                + r * jnp.log(r) + y * f - (y + r) * lse)

    def cond_var(self, params, f):
        m = jnp.exp(f)
        return m + m * m / self._r(params)

    # quadrature, NOT Poisson's analytic form (see class docstring)
    expected_logp = Likelihood.expected_logp

    def predictive_moments(self, params, mu, var):
        mu = jnp.asarray(mu, settings.dtype)
        var = jnp.asarray(var, settings.dtype)
        m = jnp.exp(mu + 0.5 * var)                 # E[e^f]
        e2 = jnp.exp(2.0 * mu + 2.0 * var)          # E[e^2f]
        v = m + e2 / self._r(params) + (e2 - m * m)
        return m, jnp.maximum(v, 0.0)

    def check_targets(self, y):
        ya = np.asarray(y)
        if np.any(ya < 0) or not np.allclose(ya, np.round(ya), atol=1e-6):
            raise ValueError(
                "NegBinomialLik targets must be non-negative integer "
                "counts")


class BernoulliLik(Likelihood):
    """Probit classification: p(y=1 | f) = Phi(f), y in {0, 1}.  No
    hypers.  Predictive probability is analytic under Gaussian q(f):
    E[Phi(f)] = Phi(mu / sqrt(1 + var))."""

    def __init__(self, x=None, name=None):
        super().__init__(x=x, name=name if name is not None else "BernLik")

    def check_hypers(self, parent=""):
        pass

    def default_hypers(self, x=None, y=None):
        return {}

    def logp_elem(self, params, y, f):
        sign = 2.0 * jnp.asarray(y, settings.dtype) - 1.0
        return log_ndtr(sign * f)

    def check_targets(self, y):
        vals = np.unique(np.asarray(y))
        if not np.all(np.isin(vals, [0.0, 1.0])):
            raise ValueError(
                "BernoulliLik targets must be in {0, 1} (got values "
                f"{vals[:6]}...); map {{-1,+1}} labels with (y+1)/2")

    def cond_mean(self, params, f):
        return ndtr(f)

    def cond_var(self, params, f):
        p = ndtr(f)
        return p * (1.0 - p)

    def predictive_moments(self, params, mu, var):
        p = ndtr(jnp.asarray(mu, settings.dtype)
                 / jnp.sqrt(1.0 + jnp.asarray(var, settings.dtype)))
        return p, jnp.maximum(p * (1.0 - p), 0.0)

    def latent_guess(self, y):
        """{0, 1} -> +/- 1 (roughly Phi^{-1}(0.84): a confident but
        unsaturated probit latent)."""
        return (2.0 * np.asarray(y, settings.floatx) - 1.0)


class OrdinalLik(Likelihood):
    """Cumulative-probit ordinal regression: y in {0, ..., C-1} ORDERED
    (ratings, grades, severity levels), p(y=k | f) = Phi(b_{k+1} - f) -
    Phi(b_k - f) with b_0 = -inf < b_1 < ... < b_{C-1} < b_C = +inf.

    The cutpoints are trainable hypers: ``cut`` is b_1 and ``logdelta``
    the C-2 log-spacings (positivity by construction keeps the ordering).
    The latent noise scale is fixed to 1 (absorbed by the kernel
    variance).  Expected log-lik under Gaussian q uses the base-class
    Gauss-Hermite grid (f is SCALAR per row — no head machinery needed);
    the predictive CLASS PROBABILITIES are analytic:

        P(y=k) = Phi((b_{k+1} - mu)/sqrt(1+var))
               - Phi((b_k - mu)/sqrt(1+var)).

    Treating ordered categories as real numbers (regression) ignores the
    unknown spacing; treating them as unordered (softmax) discards the
    ordering — this is the standard middle way.  No reference
    counterpart."""

    def __init__(self, classes, x=None, cut=None, logdelta=None, name=None):
        self.classes = int(classes)
        if self.classes < 2:
            raise ValueError("OrdinalLik needs classes >= 2")
        self.cut = cut
        self.logdelta = logdelta
        super().__init__(x=x, name=name if name is not None else "OrdLik")

    def check_hypers(self, parent=""):
        from ..hypers import Flat

        self.cut = self._param(self.cut, parent + self.name + "_cut",
                               Flat())
        if self.classes > 2:
            self.logdelta = self._param(
                self.logdelta, parent + self.name + "_logdelta", Flat(),
                shape=(self.classes - 2,))

    def default_hypers(self, x=None, y=None):
        out = {}
        if is_param(self.cut):
            out[self.cut] = np.asarray(-(self.classes - 2) / 2.0,
                                       settings.floatx)
        if self.classes > 2 and is_param(self.logdelta):
            out[self.logdelta] = np.zeros((self.classes - 2,),
                                          settings.floatx)
        return out

    def _cuts(self, params):
        """Finite interior cutpoints (C-1,): b_1, b_1+e^d_1, ..."""
        b1 = jnp.asarray(hval(self.cut, params), settings.dtype)
        if self.classes == 2:
            return b1[None]
        d = jnp.exp(jnp.asarray(hval(self.logdelta, params),
                                settings.dtype))
        return jnp.concatenate([b1[None], b1 + jnp.cumsum(d)])

    def _bin_probs(self, params, f):
        """p(y=k | f) for all k: (..., C), stable via ndtr diffs."""
        b = self._cuts(params)                      # (C-1,)
        cdf = ndtr(b - f[..., None])                # (..., C-1)
        lo = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)
        hi = jnp.concatenate([cdf, jnp.ones_like(cdf[..., :1])], axis=-1)
        return jnp.maximum(hi - lo, 1e-30)

    def logp_elem(self, params, y, f):
        yi = jnp.asarray(y, jnp.int32)
        p = self._bin_probs(params, jnp.asarray(f, settings.dtype))
        yb = jnp.broadcast_to(yi, jnp.shape(f))
        return jnp.log(jnp.take_along_axis(p, yb[..., None],
                                           axis=-1)[..., 0])

    def probs(self, params, mu, var):
        """Analytic P(y*=k) under Gaussian q: (n, C)."""
        mu = jnp.asarray(mu, settings.dtype)
        sd = jnp.sqrt(1.0 + jnp.asarray(var, settings.dtype))
        b = self._cuts(params)
        cdf = ndtr((b[None, :] - mu[:, None]) / sd[:, None])
        lo = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)
        hi = jnp.concatenate([cdf, jnp.ones_like(cdf[:, :1])], axis=-1)
        return jnp.maximum(hi - lo, 0.0)

    def cond_mean(self, params, f):
        p = self._bin_probs(params, jnp.asarray(f, settings.dtype))
        k = jnp.arange(self.classes, dtype=settings.dtype)
        return jnp.sum(p * k, axis=-1)

    def cond_var(self, params, f):
        p = self._bin_probs(params, jnp.asarray(f, settings.dtype))
        k = jnp.arange(self.classes, dtype=settings.dtype)
        m = jnp.sum(p * k, axis=-1)
        return jnp.maximum(jnp.sum(p * k * k, axis=-1) - m * m, 0.0)

    def predictive_moments(self, params, mu, var):
        """Analytic E[y*], Var[y*] from the exact class probabilities."""
        p = self.probs(params, mu, var)
        k = jnp.arange(self.classes, dtype=settings.dtype)
        m = jnp.sum(p * k, axis=-1)
        v = jnp.maximum(jnp.sum(p * k * k, axis=-1) - m * m, 0.0)
        return m, v

    def check_targets(self, y):
        ya = np.asarray(y)
        if not np.allclose(ya, np.round(ya), atol=1e-6):
            raise ValueError(
                "OrdinalLik targets must be integer ordinal levels")
        if np.any(ya < 0) or np.any(ya > self.classes - 1):
            raise ValueError(
                f"OrdinalLik targets must lie in [0, {self.classes - 1}]")


class HeteroscedasticLik(Likelihood):
    """Input-dependent Gaussian noise driven by a second latent GP:

        y = f1 + eps,   eps ~ N(0, exp(f2 + b))

    with (f1, f2) the two heads of a
    :class:`~g3py_tpu.models.svgp.HeteroscedasticSVP` and ``b`` a
    trainable log-noise offset (so the f2 head models the log-noise
    SHAPE around a learned level; at f2 = const it reduces to ordinary
    homoscedastic SVGP).  The variational ELBO data term is fully
    ANALYTIC under mean-field Gaussian q (Lazaro-Gredilla & Titsias,
    "Variational Heteroscedastic Gaussian Process Regression", ICML
    2011 — lognormal moments):

      E[log p(y|f)] = -(log 2 pi)/2 - (m2+b)/2
                      - ((y-m1)^2 + v1) exp(-(m2+b) + v2/2) / 2
      E[y*] = m1,   Var[y*] = v1 + exp(m2 + b + v2/2)

    Moment arguments carry the heads axis: mu/var are (n, 2).  No
    reference counterpart (the reference's noise is a single scalar
    kernel hyper)."""

    def __init__(self, x=None, bias=None, name=None):
        self.bias = bias
        super().__init__(x=x, name=name if name is not None else "HetLik")

    def check_hypers(self, parent=""):
        from ..hypers import Flat

        self.bias = self._param(self.bias, parent + self.name + "_bias",
                                Flat())

    def default_hypers(self, x=None, y=None):
        if is_param(self.bias) and y is not None:
            return {self.bias: np.asarray(
                np.log(np.var(y) / 10.0 + 1e-6), settings.floatx)}
        return {}

    def _b(self, params):
        return jnp.asarray(hval(self.bias, params), settings.dtype)

    def _split(self, mu, var, params):
        mu = jnp.asarray(mu, settings.dtype)
        var = jnp.asarray(var, settings.dtype)
        return (mu[..., 0], mu[..., 1] + self._b(params),
                var[..., 0], var[..., 1])

    def logp_elem(self, params, y, f):
        """f carries the heads axis (..., 2)."""
        lv = f[..., 1] + self._b(params)
        return (-0.5 * (LOG2PI + lv)
                - 0.5 * (y - f[..., 0]) ** 2 * jnp.exp(-lv))

    def expected_logp(self, params, y, mu, var):
        m1, m2, v1, v2 = self._split(mu, var, params)
        prec = jnp.exp(jnp.clip(-m2 + 0.5 * v2, -30.0, 30.0))
        return (-0.5 * (LOG2PI + m2)
                - 0.5 * ((jnp.asarray(y) - m1) ** 2 + v1) * prec)

    def cond_mean(self, params, f):
        return f[..., 0]

    def cond_var(self, params, f):
        return jnp.exp(f[..., 1] + self._b(params))

    def predictive_moments(self, params, mu, var):
        m1, m2, v1, v2 = self._split(mu, var, params)
        ev = jnp.exp(jnp.clip(m2 + 0.5 * v2, -30.0, 30.0))
        return m1, jnp.maximum(v1 + ev, 0.0)

    def noise_mean(self, params, mu, var):
        """E[exp(f2 + b)] per row — the predictive noise-variance field."""
        _, m2, _, v2 = self._split(mu, var, params)
        return jnp.exp(jnp.clip(m2 + 0.5 * v2, -30.0, 30.0))


class CategoricalLik(Likelihood):
    """Softmax multi-class classification: p(y=c | f) = softmax(f)_c with
    f in R^C (one latent GP value per class), y in {0, ..., C-1}.

    No reference counterpart (the reference has no classification at all).
    Unlike the scalar likelihoods, the latent here is a VECTOR per input —
    so the moment arguments ``mu``/``var`` carry a trailing class axis
    (n, C) (mean-field across classes, as produced by
    :class:`~g3py_tpu.models.svgp.MulticlassSVP`'s per-class whitened q).

    The ELBO data term uses the ANALYTIC Jensen softmax bound

        E[log softmax(f)_y] = mu_y - E[logsumexp(f)]
                           >= mu_y - logsumexp(mu + var / 2),

    (log E[exp] of independent Gaussians), a true deterministic lower
    bound — so ``loglike`` stays a genuine evidence lower bound, exactly
    like the rest of the SVP family, with no Monte-Carlo noise inside the
    optimizer.  Predictive class probabilities E[softmax(f)] have no
    closed form; they use a fixed common-random-number Gaussian sample
    (``mc`` draws, deterministic across calls).  No hypers."""

    mc = 128

    def __init__(self, classes, x=None, name=None):
        self.classes = int(classes)
        if self.classes < 2:
            raise ValueError("CategoricalLik needs classes >= 2")
        super().__init__(x=x, name=name if name is not None else "CatLik")

    def check_hypers(self, parent=""):
        pass

    def default_hypers(self, x=None, y=None):
        return {}

    def _eps(self):
        """Fixed (mc, 1, C) standard-normal draws (deterministic seed) for
        the predictive-probability estimator."""
        rng = np.random.default_rng(20260817)
        return jnp.asarray(rng.standard_normal((self.mc, 1, self.classes)),
                           settings.dtype)

    def _take_y(self, arr, y):
        yi = jnp.asarray(y, jnp.int32)
        return jnp.take_along_axis(arr, yi[..., None], axis=-1)[..., 0]

    def logp_elem(self, params, y, f):
        """log softmax(f)_y; ``f`` has a trailing class axis."""
        return self._take_y(f, y) - logsumexp(f, axis=-1)

    def expected_logp(self, params, y, mu, var):
        """Per-row Jensen lower bound on E_{q}[log p(y | f)]."""
        mu = jnp.asarray(mu, settings.dtype)
        var = jnp.asarray(var, settings.dtype)
        return self._take_y(mu, y) - logsumexp(mu + 0.5 * var, axis=-1)

    def probs(self, params, mu, var):
        """E[softmax(f)] under the mean-field q — fixed-CRN MC, (n, C)."""
        mu = jnp.asarray(mu, settings.dtype)
        var = jnp.asarray(var, settings.dtype)
        sd = jnp.sqrt(jnp.maximum(var, 0.0))
        f = mu[None, :, :] + sd[None, :, :] * self._eps()
        return jnp.mean(softmax(f, axis=-1), axis=0)

    def log_predictive(self, params, y, mu, var):
        """Per-row log E_q[softmax(f)_y] (NLPD numerator), fixed-CRN MC."""
        mu = jnp.asarray(mu, settings.dtype)
        sd = jnp.sqrt(jnp.maximum(jnp.asarray(var, settings.dtype), 0.0))
        f = mu[None, :, :] + sd[None, :, :] * self._eps()
        lp = self.logp_elem(params, jnp.asarray(y, jnp.int32)[None, :], f)
        return logsumexp(lp, axis=0) - jnp.log(
            jnp.asarray(self.mc, settings.dtype))

    def cond_mean(self, params, f):
        return softmax(f, axis=-1)

    def cond_var(self, params, f):
        p = softmax(f, axis=-1)
        return p * (1.0 - p)

    def predictive_moments(self, params, mu, var):
        p = self.probs(params, mu, var)
        return p, jnp.maximum(p * (1.0 - p), 0.0)

    def check_targets(self, y):
        ya = np.asarray(y)
        if not np.allclose(ya, np.round(ya), atol=1e-6):
            raise ValueError("CategoricalLik targets must be integer class "
                             "labels")
        if np.any(ya < 0) or np.any(ya > self.classes - 1):
            raise ValueError(
                f"CategoricalLik targets must lie in [0, {self.classes - 1}]"
                f" (got range [{ya.min()}, {ya.max()}]); pass classes="
                f"{int(ya.max()) + 1} if you have more classes")


def sample_conditional(lik, params, f, rng):
    """Draw y | f through a likelihood, elementwise over a latent-draw
    array ``f`` (numpy host-side, shared by the variational family's
    sampler and the state-space Laplace family's joint sampler).  Raises
    for likelihoods with no conditional sampler."""
    from scipy import stats

    from ..config import settings
    from ..hypers import hval

    pj = {k: np.asarray(v) for k, v in params.items()}
    if isinstance(lik, BernoulliLik):
        p = stats.norm.cdf(f)
        return (rng.uniform(size=f.shape) < p).astype(settings.floatx)
    if isinstance(lik, NegBinomialLik):
        r = float(np.maximum(hval(lik.dispersion, pj), 1e-3))
        m = np.exp(np.clip(f, -30.0, 30.0))
        # numpy's (n, p) convention: mean = n (1-p)/p with p = r/(r+m)
        return rng.negative_binomial(r, r / (r + m)).astype(
            settings.floatx)
    if isinstance(lik, PoissonLik):
        return rng.poisson(np.exp(np.clip(f, -30, 30))).astype(
            settings.floatx)
    if isinstance(lik, OrdinalLik):
        b = np.asarray(lik._cuts(pj))                     # (C-1,)
        g = f + rng.standard_normal(f.shape).astype(settings.floatx)
        return np.sum(g[..., None] > b, axis=-1).astype(settings.floatx)
    if isinstance(lik, StudentTLik):
        s2 = float(np.maximum(hval(lik.var, pj), 1e-10))
        nu = float(np.maximum(hval(lik.nu, pj), 1.0))
        return f + np.sqrt(s2) * stats.t.rvs(
            nu, size=f.shape, random_state=rng).astype(settings.floatx)
    if not isinstance(lik, GaussianLik):
        raise ValueError(
            f"no conditional sampler for {type(lik).__name__}; draw "
            "latent paths with noise=False and push through the "
            "likelihood")
    s2 = float(np.maximum(hval(lik.var, pj), 1e-10))
    return f + np.sqrt(s2) * rng.standard_normal(f.shape).astype(
        settings.floatx)
