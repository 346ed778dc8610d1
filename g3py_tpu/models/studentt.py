"""Student-t processes (TP / WTP) and the warped multivariate-t density.

Rebuild of ``/root/reference/g3py/processes/studentT.py``: a Freedom degree
hyper (default = n_obs), posterior df = nu + n, posterior covariance scaled
by ``(nu + beta - 2)/(nu + n - 2)`` where beta is the Mahalanobis norm of
the observations (studentT.py:36-43), Student-t analytic quantiles,
inverse-gamma-scaled samples, and the multivariate-t log-density with its
large-nu gaussian limit (studentT.py:114-146).
"""

import numpy as np
import jax.numpy as jnp
from jax.scipy.special import gammaln
from scipy import stats

from ..config import settings
from ..hypers import Freedom
from ..ops.guards import to_num, to_cov
from ..ops.linalg import solve_lower_triangular, mvn_quad_logdet
from ..ops.quadrature import gauss_hermite
from .elliptical import EllipticalProcess
from .gaussian import GaussianProcess

__all__ = ["StudentTProcess", "WarpedStudentTProcess",
           "warped_studentt_logp_cho", "WarpedStudentTDistribution"]

GUARD = np.float32(-1e30)


def warped_studentt_logp_cho(value, mu, cho, freedom, mapping_inv_value,
                             logdet_dinv):
    """Multivariate-t logp given the scale-matrix Cholesky (covariance
    parameterization with the (nu-2) normalization, reference
    studentT.py:114-146); falls to the gaussian limit for nu >= 1e6."""
    delta = mapping_inv_value - mu
    lcho = solve_lower_triangular(cho, delta)
    beta = jnp.dot(lcho, lcho)
    n = jnp.asarray(jnp.shape(cho)[0], settings.dtype)
    r1 = -0.5 * (freedom + n) * jnp.log1p(beta / (freedom - 2.0))
    gaussian_limit = -n * 0.5 * jnp.log(2.0 * jnp.asarray(np.pi, settings.dtype))
    student = (gammaln((freedom + n) * 0.5) - gammaln(freedom * 0.5)
               - 0.5 * n * jnp.log((freedom - 2.0) * jnp.asarray(np.pi, settings.dtype)))
    r2 = jnp.where(freedom >= 1e6, gaussian_limit, student)
    r3 = -jnp.sum(jnp.log(jnp.diagonal(cho)))
    r = r1 + r2 + r3 + logdet_dinv
    bad = (~jnp.all(jnp.isfinite(delta))) \
        | (~jnp.isfinite(logdet_dinv)) \
        | (~jnp.all(jnp.isfinite(cho))) \
        | (~jnp.all(jnp.isfinite(lcho)))
    return jnp.where(bad, GUARD, to_num(r, nan=GUARD, neginf=GUARD))


class WarpedStudentTDistribution:
    """Namespace kept for reference-API parity (studentT.py:105-156)."""

    logp_cho = staticmethod(warped_studentt_logp_cho)


class StudentTProcess(EllipticalProcess):
    def __init__(self, *args, **kwargs):
        if "name" not in kwargs:
            kwargs["name"] = "TP"
        if "degree" not in kwargs or kwargs["degree"] is None:
            kwargs["degree"] = Freedom()
        super().__init__(*args, **kwargs)

    def th_define_process(self):
        self.distribution = WarpedStudentTDistribution

    def th_loglike_fn(self):
        mapping = self.f_mapping
        location = self.f_location
        degree = self.f_degree
        kernel_noise = self.f_kernel_noise

        def fn(params, space, inputs, outputs):
            mu = location(params, inputs)
            cov = to_cov(kernel_noise.cov(params, inputs))
            tinv = to_num(mapping.inv(params, outputs))
            logdet_map = mapping.logdet_dinv(params, outputs)
            nu = degree(params)
            beta, logdet_half, ok = mvn_quad_logdet(cov, tinv - mu)
            n = jnp.asarray(jnp.shape(inputs)[0], settings.dtype)
            pi_x = jnp.asarray(np.pi, settings.dtype)
            r1 = -0.5 * (nu + n) * jnp.log1p(beta / (nu - 2.0))
            gaussian_limit = -n * 0.5 * jnp.log(2.0 * pi_x)
            student = (gammaln((nu + n) * 0.5) - gammaln(nu * 0.5)
                       - 0.5 * n * jnp.log((nu - 2.0) * pi_x))
            r2 = jnp.where(nu >= 1e6, gaussian_limit, student)
            r = r1 + r2 - logdet_half + logdet_map
            bad = (ok == 0) | (~jnp.isfinite(beta)) | (~jnp.isfinite(logdet_map))
            return jnp.where(bad, GUARD, to_num(r, nan=GUARD, neginf=GUARD))

        return fn

    def th_loglike_masked_fn(self):
        """Masked-observation multivariate-t loglike (same identity-row
        gram surgery as the gaussian version, gaussian.py
        ``th_loglike_masked_fn``): n becomes n_eff = sum(w) in every
        density term, so one static shape serves every split — exactly the
        submatrix model's loglike at the same ``degree`` value."""
        mapping = self.f_mapping
        location = self.f_location
        degree = self.f_degree
        kernel_noise = self.f_kernel_noise

        def fn(params, inputs, outputs, w):
            w = jnp.asarray(w, settings.dtype)
            mu = location(params, inputs)
            cov = to_cov(kernel_noise.cov(params, inputs))
            covw = cov * jnp.outer(w, w) + jnp.diag(1.0 - w)
            tinv = to_num(mapping.inv(params, outputs))
            resid = (tinv - mu) * w
            logdet_map = jnp.sum(
                mapping.logdet_dinv_elem(params, outputs) * w)
            nu = degree(params)
            beta, logdet_half, ok = mvn_quad_logdet(covw, resid)
            n = jnp.sum(w)
            pi_x = jnp.asarray(np.pi, settings.dtype)
            r1 = -0.5 * (nu + n) * jnp.log1p(beta / (nu - 2.0))
            gaussian_limit = -n * 0.5 * jnp.log(2.0 * pi_x)
            student = (gammaln((nu + n) * 0.5) - gammaln(nu * 0.5)
                       - 0.5 * n * jnp.log((nu - 2.0) * pi_x))
            r2 = jnp.where(nu >= 1e6, gaussian_limit, student)
            r = r1 + r2 - logdet_half + logdet_map
            bad = (ok == 0) | (~jnp.isfinite(beta)) | (~jnp.isfinite(logdet_map))
            return jnp.where(bad, GUARD, to_num(r, nan=GUARD, neginf=GUARD))

        return fn

    def nll_distributed(self, params=None, mesh=None, block=None, axis="dp"):
        """Device-sharded exact Student-t negative loglikelihood: the
        multivariate-t scalarization (same density terms as
        ``th_loglike_fn``) of the shared band primitive
        ``EllipticalProcess._distributed_qld`` — quad and logdet come from
        the row-band-sharded gram; nu/gammaln terms are replicated scalar
        math.  Same contract as the GP version (noisy=True construction,
        n divisible by the mesh; warping Jacobian included; no priors)."""
        qld = self._distributed_qld(mesh=mesh, block=block, axis=axis)
        if params is None:
            params = self.params
        params = {k: jnp.asarray(v)
                  for k, v in self.filter_params(params).items()}
        x = jnp.asarray(self.inputs)
        outputs = jnp.asarray(self.outputs)
        resid = (self._latent_obs(params, outputs)
                 - self.f_location(params, x))
        beta, logdet_half = qld(params, x, resid)
        nu = self.f_degree(params)
        n = jnp.asarray(len(self.inputs), settings.dtype)
        pi_x = jnp.asarray(np.pi, settings.dtype)
        r1 = -0.5 * (nu + n) * jnp.log1p(beta / (nu - 2.0))
        gaussian_limit = -n * 0.5 * jnp.log(2.0 * pi_x)
        student = (gammaln((nu + n) * 0.5) - gammaln(nu * 0.5)
                   - 0.5 * n * jnp.log((nu - 2.0) * pi_x))
        r2 = jnp.where(nu >= 1e6, gaussian_limit, student)
        ll = (r1 + r2 - logdet_half
              + self.f_mapping.logdet_dinv(params, outputs))
        return -ll

    def fit_splits(self, masks, start=None, points=4, max_iters=200,
                   tol=1e-5, noise_mult=0.2, seed=0, shard=False, mesh=None,
                   pair_chunk=None):
        """On-device (split x start) MAP fan-out (see bayesian/fanout.py)."""
        from ..bayesian.fanout import fit_splits as _fit_splits
        return _fit_splits(self, masks, start=start, points=points,
                           max_iters=max_iters, tol=tol,
                           noise_mult=noise_mult, seed=seed, shard=shard,
                           mesh=mesh, pair_chunk=pair_chunk)

    # -- posterior scaling (reference studentT.py:36-49) -----------------------
    def _scaling_fn(self, prior):
        if prior:
            return lambda params, space, inputs, outputs, vector: jnp.asarray(
                1.0, settings.dtype)
        location = self.f_location
        mapping = self.f_mapping
        degree = self.f_degree

        def fn(params, space, inputs, outputs, vector):
            from .elliptical import STATE_OBS_Z
            if STATE_OBS_Z in params:  # precomputed whitened residual
                alpha = params[STATE_OBS_Z]
            else:
                chol = self._obs_chol(params, inputs)
                resid = to_num(mapping.inv(params, outputs)) - location(
                    params, inputs)
                alpha = solve_lower_triangular(chol, resid)
            beta = jnp.dot(alpha, alpha)
            n = jnp.asarray(jnp.shape(inputs)[0], settings.dtype)
            nu = degree(params)
            return (nu + beta - 2.0) / (nu + n - 2.0)

        return fn

    def th_variance(self, prior=False, noise=False, simulations=None):
        base = super().th_variance(prior=prior, noise=noise)
        scale = self._scaling_fn(prior)

        def fn(params, space, inputs, outputs, vector):
            return base(params, space, inputs, outputs, vector) * scale(
                params, space, inputs, outputs, vector)

        return fn

    def th_covariance(self, prior=False, noise=False):
        base = super().th_covariance(prior=prior, noise=noise)
        scale = self._scaling_fn(prior)

        def fn(params, space, inputs, outputs, vector):
            return base(params, space, inputs, outputs, vector) * scale(
                params, space, inputs, outputs, vector)

        return fn

    def th_logpredictive(self, prior=False, noise=False):
        """Independent-marginal Student-t log-predictive (diagonal scale)."""
        loc_fn = self.th_location(prior=prior, noise=noise)
        sd_fn = self.th_kernel_sd(prior=prior, noise=True)
        free_fn = self.th_freedom(prior=prior, noise=noise)
        scale = self._scaling_fn(prior)
        mapping = self.f_mapping

        def fn(params, space, inputs, outputs, vector):
            mu = loc_fn(params, space, inputs, outputs, vector)
            sd = sd_fn(params, space, inputs, outputs, vector) * jnp.sqrt(
                scale(params, space, inputs, outputs, vector))
            nu = free_fn(params, space, inputs, outputs, vector)
            tinv = to_num(mapping.inv(params, vector))
            logdet = mapping.logdet_dinv(params, vector)
            return warped_studentt_logp_cho(vector, mu, jnp.diag(sd), nu, tinv,
                                            logdet)

        return fn

    # -- host-side prediction (reference studentT.py:51-67) --------------------
    def quantiler(self, params=None, space=None, inputs=None, outputs=None, q=0.975,
                  prior=False, noise=False, simulations=None):
        df = float(self.freedom(params, space, inputs, outputs, prior=prior,
                                noise=noise))
        p = np.float32(stats.t.ppf(q, df=df))
        loc = self.location(params, space, inputs, outputs, prior=prior, noise=noise)
        sd = self.kernel_sd(params, space, inputs, outputs, prior=prior, noise=noise)
        latent = loc + p * sd
        return self.mapping(params, space, inputs, outputs, vector=latent)

    def _quantile_p(self, params, q, prior=False, noise=False):
        """Student-t latent quantile coefficient at the posterior df
        (reference studentT.py:51-55)."""
        df = float(self.freedom(params, prior=prior, noise=noise))
        return np.float32(stats.t.ppf(q, df=df))

    def _batch_quantile_p(self, q, rows, space=None, inputs=None, outputs=None,
                          prior=False, noise=False):
        df = np.asarray(self._call_method_vrows(
            "th_freedom", rows, space=space, inputs=inputs, outputs=outputs,
            prior=prior, noise=noise), dtype=np.float64)
        return stats.t.ppf(q, df=df).astype(settings.floatx)

    def _batch_latent_rand(self, rows, n, rng, space=None, inputs=None,
                           outputs=None, prior=False, noise=False):
        df = np.asarray(self._call_method_vrows(
            "th_freedom", rows, space=space, inputs=inputs, outputs=outputs,
            prior=prior, noise=noise), dtype=np.float64)
        rand = rng.standard_normal((len(rows), n))
        # per-draw inverse-gamma mixing factor, mirroring the reference's
        # sampler (studentT.py:51-67) and this class's host sampler below
        scale = stats.invgamma.rvs(a=df / 2, scale=(df - 2) / 2,
                                   random_state=rng)
        return (rand * np.asarray(scale).reshape(-1, 1)).astype(settings.floatx)

    def sampler(self, params=None, space=None, inputs=None, outputs=None, samples=1,
                prior=False, noise=False, rng=None):
        if space is None:
            space = self.space
        if rng is None:
            rng = np.random.default_rng()
        free = float(self.freedom(params, space, inputs, outputs, prior=prior,
                                  noise=noise))
        rand = rng.standard_normal((len(space), samples)).astype(settings.floatx)
        rand = rand * stats.invgamma.rvs(a=free / 2, scale=(free - 2) / 2,
                                         size=samples).astype(settings.floatx)
        loc = self.location(params, space, inputs, outputs, prior=prior, noise=noise)
        cho = self.cholesky(params, space, inputs, outputs, prior=prior, noise=noise)
        latent = loc[:, None] + cho.dot(rand)
        return np.stack(
            [self.mapping(params, space, inputs, outputs, vector=latent[:, k])
             for k in range(samples)], axis=1)


class WarpedStudentTProcess(StudentTProcess):
    """TP with Gauss-Hermite warped moments (reference studentT.py:70-102)."""

    def __init__(self, *args, **kwargs):
        if "name" not in kwargs:
            kwargs["name"] = "WTP"
        if "degree" not in kwargs or kwargs["degree"] is None:
            kwargs["degree"] = Freedom()
        super().__init__(*args, **kwargs)

    def th_mean(self, prior=False, noise=False, simulations=None, n=None):
        if n is None:
            n = settings.quadrature_degree
        loc_fn = self.th_location(prior=prior, noise=noise)
        sd_fn = self.th_kernel_sd(prior=prior, noise=noise)
        mapping = self.f_mapping

        def fn(params, space, inputs, outputs, vector):
            mu = loc_fn(params, space, inputs, outputs, vector)
            sd = sd_fn(params, space, inputs, outputs, vector)
            return gauss_hermite(lambda v: mapping(params, v), mu, sd, n=n)

        return fn

    def th_variance(self, prior=False, noise=False, simulations=None, n=None):
        if n is None:
            n = settings.quadrature_degree
        loc_fn = self.th_location(prior=prior, noise=noise)
        sd_fn = self.th_kernel_sd(prior=prior, noise=noise)
        mapping = self.f_mapping

        def fn(params, space, inputs, outputs, vector):
            mu = loc_fn(params, space, inputs, outputs, vector)
            sd = sd_fn(params, space, inputs, outputs, vector)
            m1 = gauss_hermite(lambda v: mapping(params, v), mu, sd, n=n)
            m2 = gauss_hermite(lambda v: mapping(params, v) ** 2, mu, sd, n=n)
            return m2 - m1**2

        return fn

    def th_covariance(self, prior=False, noise=False):
        return None

    gauss_hermite = staticmethod(gauss_hermite)
