"""Copula processes — latent-correlation + marginal-density factorization.

The reference only *declared* this family (``CopulaProcess`` and friends
are empty ``pass`` classes, ``/root/reference/g3py/processes/copula.py:5-20``;
tutorial 06 emulated copulas through transport composition).  This build
implements them properly:

  y_i = F_i^{-1}( Phi(z_i) ),   z ~ N(0, R(x))

with R the correlation-normalized kernel gram and F_i the per-point
marginal CDF from a :class:`~g3py_tpu.models.marginal.Density`.  The
observed density factorizes into the gaussian-copula term plus the sum of
marginal log-densities:

  logp = -1/2 z^T R^{-1} z + 1/2 z^T z - sum log diag chol(R)
         + sum log f_i(y_i)                       where z = Phi^{-1}(F(y))

``CopulaStudentTProcess`` swaps the latent gaussian for a multivariate-t
copula with a Freedom hyper.
"""

import numpy as np
import jax.numpy as jnp
from jax.scipy.special import ndtri, gammaln
from jax.scipy.stats import norm as jnorm
from scipy import stats

from ..config import settings
from ..hypers import Freedom
from ..hypers.kernels import KernelSum, KernelNoise
from ..ops.guards import to_cov, to_num
from ..ops.linalg import safe_cholesky, solve_lower_triangular, cho_solve
from .stochastic import StochasticProcess, zero32
from .marginal import Density, MarginalProcess

__all__ = ["CopulaProcess", "CopulaGaussianProcess", "CopulaStudentTProcess",
           "TransformedStudentTProcess"]

GUARD = np.float32(-1e30)
_EPS = np.float32(1e-6)


class CopulaProcess(StochasticProcess):
    """Latent-correlation process with arbitrary marginals.

    Args mirror the reference's declared API (copula.py:5-9): a latent
    ``copula`` structure (here: a Kernel for the latent correlation) and a
    ``marginal`` (a Density or a MarginalProcess whose density is reused).
    """

    def __init__(self, space=None, kernel=None, marginal=None, noisy=True,
                 var_noise=None, *args, **kwargs):
        if isinstance(marginal, MarginalProcess):
            marginal = marginal.f_density
        self.f_density: Density = marginal
        self.f_kernel = kernel
        if noisy:
            self.f_kernel_noise = KernelSum(
                self.f_kernel, KernelNoise(name="Noise", var=var_noise))
        else:
            self.f_kernel_noise = self.f_kernel
        kwargs["space"] = space
        if "name" not in kwargs:
            kwargs["name"] = "CP"
        super().__init__(*args, **kwargs)

    def _components(self):
        return [self.f_kernel_noise, self.f_density]

    def _check_hypers(self):
        self.f_kernel_noise.check_dims(self.inputs)
        self.f_density.check_dims(self.inputs)
        self.f_kernel_noise.check_hypers(self.name + "_")
        self.f_density.check_hypers(self.name + "_")

    def default_hypers(self):
        x, y = self.inputs, self.outputs
        out = {}
        out.update(self.f_kernel_noise.default_hypers_dims(x, y))
        out.update(self.f_density.default_hypers_dims(x, y))
        return out

    # -- latent plumbing ---------------------------------------------------------
    def _correlation(self, params, x1, x2=None):
        """Correlation-normalized kernel gram."""
        k12 = self.f_kernel_noise.cov(params, x1, x2)
        d1 = jnp.sqrt(jnp.diagonal(self.f_kernel_noise.cov(params, x1)))
        if x2 is None:
            return to_cov(k12 / (d1[:, None] * d1[None, :]))
        d2 = jnp.sqrt(jnp.diagonal(self.f_kernel_noise.cov(params, x2)))
        return k12 / (d1[:, None] * d2[None, :])

    def _latent_z(self, params, inputs, outputs):
        u = jnp.clip(self.f_density.cdf(params, inputs, outputs), _EPS, 1 - _EPS)
        return ndtri(u)

    def th_loglike_fn(self):
        density = self.f_density

        def fn(params, space, inputs, outputs):
            z = self._latent_z(params, inputs, outputs)
            R = self._correlation(params, inputs)
            chol = safe_cholesky(R)
            w = solve_lower_triangular(chol, z)
            copula = (-0.5 * jnp.dot(w, w) + 0.5 * jnp.dot(z, z)
                      - jnp.sum(jnp.log(jnp.diagonal(chol))))
            marg = density.logp(params, inputs, outputs)
            r = copula + marg
            bad = ~jnp.all(jnp.isfinite(z))
            return jnp.where(bad, GUARD, to_num(r, nan=GUARD, neginf=GUARD))

        return fn

    # -- latent posterior --------------------------------------------------------
    def _latent_posterior(self, params, space, inputs, outputs):
        """Gaussian posterior of z(space) given z(inputs)."""
        z = self._latent_z(params, inputs, outputs)
        R = self._correlation(params, inputs)
        chol = safe_cholesky(R)
        cross = to_num(self._correlation(params, space, inputs))
        mu = jnp.dot(cross, cho_solve(chol, z))
        v = solve_lower_triangular(chol, cross.T)
        var = jnp.clip(1.0 - jnp.sum(v * v, axis=0), zero32, None)
        return mu, jnp.sqrt(var)

    def th_location(self, prior=False, noise=False):
        if prior:
            def fn(params, space, inputs, outputs, vector):
                return jnp.zeros((jnp.shape(space)[0],), settings.dtype)
        else:
            def fn(params, space, inputs, outputs, vector):
                return self._latent_posterior(params, space, inputs, outputs)[0]
        return fn

    def th_kernel_sd(self, prior=False, noise=False):
        if prior:
            def fn(params, space, inputs, outputs, vector):
                return jnp.ones((jnp.shape(space)[0],), settings.dtype)
        else:
            def fn(params, space, inputs, outputs, vector):
                return self._latent_posterior(params, space, inputs, outputs)[1]
        return fn

    def th_median(self, prior=False, noise=False, simulations=None):
        return None  # computed host-side through the marginal ppf

    _dispatch_methods = dict(
        StochasticProcess._dispatch_methods,
        location="th_location",
        kernel_sd="th_kernel_sd",
    )

    # -- host-side prediction -----------------------------------------------------
    def _push_quantile(self, params, space, inputs, outputs, latent, prior, noise):
        u = stats.norm.cdf(np.asarray(latent))
        u = np.clip(u, float(_EPS), 1 - float(_EPS))
        jparams = {k: np.asarray(v) for k, v in params.items()}
        return np.asarray(self.f_density.ppf(jparams, space, u)).astype(
            settings.floatx)

    def quantiler(self, params=None, space=None, inputs=None, outputs=None, q=0.975,
                  prior=False, noise=False, simulations=None):
        if params is None:
            params = self.params
        if space is None:
            space = self.space
        loc = self.location(params, space, inputs, outputs, prior=prior, noise=noise)
        sd = self.kernel_sd(params, space, inputs, outputs, prior=prior, noise=noise)
        latent = loc + np.float32(stats.norm.ppf(q)) * sd
        return self._push_quantile(params, space, inputs, outputs, latent, prior,
                                   noise)

    def sampler(self, params=None, space=None, inputs=None, outputs=None, samples=1,
                prior=False, noise=False, rng=None):
        if params is None:
            params = self.params
        if space is None:
            space = self.space
        if rng is None:
            rng = np.random.default_rng()
        loc = self.location(params, space, inputs, outputs, prior=prior, noise=noise)
        sd = self.kernel_sd(params, space, inputs, outputs, prior=prior, noise=noise)
        out = []
        for _ in range(samples):
            latent = loc + sd * rng.standard_normal(len(space)).astype(settings.floatx)
            out.append(self._push_quantile(params, space, inputs, outputs, latent,
                                           prior, noise))
        return np.stack(out, axis=1)

    def mean(self, params=None, space=None, inputs=None, outputs=None, prior=False,
             noise=False, simulations=None, **kwargs):
        """MC mean through the copula push-forward."""
        if simulations is None or not isinstance(simulations, int):
            sims = self.sampler(params, space, inputs, outputs,
                                samples=settings.mc_simulations, prior=prior,
                                noise=noise)
        else:
            sims = self.sampler(params, space, inputs, outputs, samples=simulations,
                                prior=prior, noise=noise)
        return sims.mean(axis=1)

    def median(self, params=None, space=None, inputs=None, outputs=None, prior=False,
               noise=False, simulations=None, **kwargs):
        return self.quantiler(params, space, inputs, outputs, q=0.5, prior=prior,
                              noise=noise)

    def std(self, params=None, space=None, inputs=None, outputs=None, prior=False,
            noise=False, simulations=None, **kwargs):
        if not isinstance(simulations, int):
            simulations = settings.mc_simulations
        sims = self.sampler(params, space, inputs, outputs, samples=simulations,
                            prior=prior, noise=noise)
        return sims.std(axis=1)

    def variance(self, params=None, space=None, inputs=None, outputs=None,
                 prior=False, noise=False, simulations=None, **kwargs):
        return self.std(params, space, inputs, outputs, prior=prior, noise=noise,
                        simulations=simulations) ** 2


class CopulaGaussianProcess(CopulaProcess):
    """Gaussian copula + arbitrary marginals (the reference's CGP stub,
    copula.py:12-13)."""

    def __init__(self, *args, **kwargs):
        if "name" not in kwargs:
            kwargs["name"] = "CGP"
        super().__init__(*args, **kwargs)


class CopulaStudentTProcess(CopulaProcess):
    """Student-t copula: latent multivariate t with Freedom hyper (the
    reference's CSTP stub, copula.py:16-17)."""

    def __init__(self, *args, degree: Freedom = None, **kwargs):
        self.f_degree = degree if degree is not None else Freedom()
        if "name" not in kwargs:
            kwargs["name"] = "CSTP"
        super().__init__(*args, **kwargs)

    def _components(self):
        return super()._components() + [self.f_degree]

    def _check_hypers(self):
        super()._check_hypers()
        self.f_degree.check_dims(None)
        self.f_degree.check_hypers(self.name + "_")

    def th_loglike_fn(self):
        density = self.f_density
        degree = self.f_degree

        def fn(params, space, inputs, outputs):
            z = self._latent_z(params, inputs, outputs)
            R = self._correlation(params, inputs)
            chol = safe_cholesky(R)
            w = solve_lower_triangular(chol, z)
            n = jnp.asarray(jnp.shape(inputs)[0], settings.dtype)
            nu = degree(params)
            # t-copula density with gaussian marginals transformed via ndtri
            # (standard gaussian-margin approximation of the t-copula score)
            joint = (gammaln((nu + n) / 2.0) - gammaln(nu / 2.0)
                     - jnp.sum(jnp.log(jnp.diagonal(chol)))
                     - 0.5 * (nu + n) * jnp.log1p(jnp.dot(w, w) / nu))
            indep = (n * (gammaln((nu + 1.0) / 2.0) - gammaln(nu / 2.0))
                     - 0.5 * (nu + 1.0) * jnp.sum(jnp.log1p(z**2 / nu)))
            copula = joint - indep
            marg = density.logp(params, inputs, outputs)
            r = copula + marg
            bad = ~jnp.all(jnp.isfinite(z))
            return jnp.where(bad, GUARD, to_num(r, nan=GUARD, neginf=GUARD))

        return fn


class TransformedStudentTProcess(CopulaStudentTProcess):
    """Alias kept for reference-API parity (copula.py:20)."""
