"""MarginalProcess — processes with independent marginal densities.

Rebuild of ``/root/reference/g3py/processes/marginal.py``: a Density family
holds Mean-valued parameters (Uniform(lower, upper), Normal(mu, sigma),
StudentT(mu, sigma, nu)); the process moments delegate to the density and
the quantiler/sampler dispatch on the density type through scipy.stats.
"""

import numpy as np
import jax.numpy as jnp
from jax.scipy.special import gammaln
from scipy import stats

from ..config import settings
from ..utils import DictObj
from .stochastic import StochasticProcess

__all__ = ["Density", "SymmetricDensity", "Uniform", "Normal", "StudentT",
           "MarginalProcess"]

GUARD = np.float32(-1e30)
# float64 constant: under x64 the pipeline then carries full precision
# (the f32 constant alone cost ~3e-9 relative NLL error in the f64
# north-star job); in float32 mode jax demotes it with no behavior change
LOG2PI = np.log(2.0 * np.pi)


class Density:
    """Family of independent marginals with Mean-valued parameters
    (reference marginal.py:15-52)."""

    def __init__(self, **kwargs):
        self.locations = DictObj(kwargs)

    def check_dims(self, *args, **kwargs):
        for l in self.locations.values():
            l.check_dims(*args, **kwargs)

    def check_hypers(self, *args, **kwargs):
        for l in self.locations.values():
            l.check_hypers(*args, **kwargs)

    @property
    def hypers(self):
        out = []
        for l in self.locations.values():
            out += l.hypers
        return out

    @property
    def potential(self):
        return None

    def potential_logp(self, params):
        parts = [p for p in (l.potential_logp(params)
                             for l in self.locations.values()) if p is not None]
        if not parts:
            return None
        total = parts[0]
        for p in parts[1:]:
            total = total + p
        return total

    def default_hypers_dims(self, *args, **kwargs):
        r = DictObj()
        for l in self.locations.values():
            r.update(l.default_hypers_dims(*args, **kwargs))
        return r

    # quantity hooks
    def th_median(self, params, space):
        raise NotImplementedError

    def th_mean(self, params, space):
        raise NotImplementedError

    def th_mode(self, params, space):
        raise NotImplementedError

    def th_variance(self, params, space):
        return self.th_std(params, space) ** 2

    def th_std(self, params, space):
        return jnp.sqrt(self.th_variance(params, space))

    def logp(self, params, inputs, outputs):
        """Observed iid loglikelihood (the reference delegated to a PyMC3
        observed distribution, marginal.py:169-205)."""
        raise NotImplementedError

    def cdf(self, params, inputs, outputs):
        """Marginal CDF F(y_i | x_i) — jax-traceable; used by the copula
        family (which the reference declared but never implemented)."""
        raise NotImplementedError

    def ppf(self, params, inputs, q):
        """Marginal quantile function (host side, scipy)."""
        raise NotImplementedError


class SymmetricDensity(Density):
    def th_median(self, params, space):
        return self.th_mean(params, space)

    def th_mode(self, params, space):
        return self.th_mean(params, space)


class Uniform(SymmetricDensity):
    """Uniform(lower(x), upper(x)) (reference marginal.py:150-168)."""

    def __init__(self, lower, upper):
        self.locations = DictObj()
        self.locations["lower"] = lower
        self.locations["upper"] = upper

    def th_mean(self, params, space):
        return 0.5 * (self.locations.lower(params, space)
                      + self.locations.upper(params, space))

    def th_variance(self, params, space):
        return (1.0 / 12.0) * (self.locations.upper(params, space)
                               - self.locations.lower(params, space)) ** 2

    def th_lower(self, params, space):
        return self.locations.lower(params, space)

    def th_upper(self, params, space):
        return self.locations.upper(params, space)

    def logp(self, params, inputs, outputs):
        lower = self.th_lower(params, inputs)
        upper = self.th_upper(params, inputs)
        width = upper - lower
        inside = jnp.all((outputs >= lower) & (outputs <= upper) & (width > 0))
        lp = -jnp.sum(jnp.log(jnp.maximum(width, 1e-38)))
        return jnp.where(inside, lp, GUARD)

    def cdf(self, params, inputs, outputs):
        lower = self.th_lower(params, inputs)
        upper = self.th_upper(params, inputs)
        return jnp.clip((outputs - lower) / (upper - lower), 0.0, 1.0)

    def ppf(self, params, inputs, q):
        import numpy as _np
        lower = _np.asarray(self.th_lower(params, inputs))
        upper = _np.asarray(self.th_upper(params, inputs))
        return lower + q * (upper - lower)


class Normal(SymmetricDensity):
    """Normal(mu(x), sigma(x)) (reference marginal.py:171-186)."""

    def __init__(self, mu, sigma):
        self.locations = DictObj()
        self.locations["mu"] = mu
        self.locations["sigma"] = sigma

    def th_mean(self, params, space):
        return self.locations.mu(params, space)

    def th_std(self, params, space):
        return jnp.abs(self.locations.sigma(params, space))

    def logp(self, params, inputs, outputs):
        mu = self.th_mean(params, inputs)
        sd = self.th_std(params, inputs)
        z = (outputs - mu) / sd
        lp = jnp.sum(-0.5 * z**2 - jnp.log(sd) - 0.5 * LOG2PI)
        return jnp.where(jnp.isfinite(lp), lp, GUARD)

    def cdf(self, params, inputs, outputs):
        from jax.scipy.stats import norm as _jnorm
        mu = self.th_mean(params, inputs)
        sd = self.th_std(params, inputs)
        return _jnorm.cdf(outputs, loc=mu, scale=sd)

    def ppf(self, params, inputs, q):
        import numpy as _np
        mu = _np.asarray(self.th_mean(params, inputs))
        sd = _np.asarray(self.th_std(params, inputs))
        return stats.norm.ppf(q, loc=mu, scale=sd)


class StudentT(Normal):
    """StudentT(mu(x), sigma(x), nu(x)) (reference marginal.py:189-205)."""

    def __init__(self, mu, sigma, nu):
        self.locations = DictObj()
        self.locations["mu"] = mu
        self.locations["sigma"] = sigma
        self.locations["nu"] = nu

    def th_freedom(self, params, space):
        return self.locations.nu(params, space)

    def logp(self, params, inputs, outputs):
        mu = self.th_mean(params, inputs)
        sd = self.th_std(params, inputs)
        nu = self.th_freedom(params, inputs)
        z = (outputs - mu) / sd
        lp = jnp.sum(
            gammaln((nu + 1.0) / 2.0) - gammaln(nu / 2.0)
            - 0.5 * jnp.log(nu * np.pi) - jnp.log(sd)
            - (nu + 1.0) / 2.0 * jnp.log1p(z**2 / nu))
        return jnp.where(jnp.isfinite(lp), lp, GUARD)

    def cdf(self, params, inputs, outputs):
        from jax.scipy.special import betainc
        mu = self.th_mean(params, inputs)
        sd = self.th_std(params, inputs)
        nu = self.th_freedom(params, inputs)
        z = (outputs - mu) / sd
        ib = betainc(nu / 2.0, 0.5, nu / (nu + z**2))
        return jnp.where(z >= 0, 1.0 - 0.5 * ib, 0.5 * ib)

    def ppf(self, params, inputs, q):
        import numpy as _np
        mu = _np.asarray(self.th_mean(params, inputs))
        sd = _np.asarray(self.th_std(params, inputs))
        nu = _np.asarray(self.th_freedom(params, inputs))
        return stats.t.ppf(q, nu, loc=mu, scale=sd)


class MarginalProcess(StochasticProcess):
    """Process of independent marginals (reference marginal.py:54-146)."""

    def __init__(self, space=None, density: Density = None, *args, **kwargs):
        self.f_density = density
        kwargs["space"] = space
        if "name" not in kwargs:
            kwargs["name"] = "MP"
        super().__init__(*args, **kwargs)

    def _components(self):
        return [self.f_density]

    def _check_hypers(self):
        self.f_density.check_dims(self.inputs)
        self.f_density.check_hypers(self.name + "_")

    def default_hypers(self):
        return self.f_density.default_hypers_dims(self.inputs, self.outputs)

    def th_loglike_fn(self):
        density = self.f_density

        def fn(params, space, inputs, outputs):
            return density.logp(params, inputs, outputs)

        return fn

    # -- delegated quantities (reference marginal.py:84-102) --------------------
    def th_lower(self, prior=False, noise=False):
        if not hasattr(self.f_density, "th_lower"):
            return None
        return lambda params, space, inputs, outputs, vector: \
            self.f_density.th_lower(params, space)

    def th_upper(self, prior=False, noise=False):
        if not hasattr(self.f_density, "th_upper"):
            return None
        return lambda params, space, inputs, outputs, vector: \
            self.f_density.th_upper(params, space)

    def th_freedom(self, prior=False, noise=False):
        if not hasattr(self.f_density, "th_freedom"):
            return None
        return lambda params, space, inputs, outputs, vector: \
            self.f_density.th_freedom(params, space)

    def th_median(self, prior=False, noise=False, simulations=None):
        return lambda params, space, inputs, outputs, vector: \
            self.f_density.th_median(params, space)

    def th_mean(self, prior=False, noise=False, simulations=None):
        return lambda params, space, inputs, outputs, vector: \
            self.f_density.th_mean(params, space)

    def th_variance(self, prior=False, noise=False, simulations=None):
        return lambda params, space, inputs, outputs, vector: \
            self.f_density.th_variance(params, space)

    def th_covariance(self, prior=False, noise=False):
        return lambda params, space, inputs, outputs, vector: \
            jnp.diag(self.f_density.th_variance(params, space))

    def th_logpredictive(self, prior=False, noise=False):
        density = self.f_density

        def fn(params, space, inputs, outputs, vector):
            return density.logp(params, space, vector)

        return fn

    _dispatch_methods = dict(
        StochasticProcess._dispatch_methods,
        lower="th_lower",
        upper="th_upper",
        freedom="th_freedom",
    )

    # -- scipy dispatch (reference marginal.py:104-146) --------------------------
    def quantiler(self, params=None, space=None, inputs=None, outputs=None, q=0.975,
                  prior=False, noise=False, simulations=None):
        if space is None:
            space = self.space
        if isinstance(self.f_density, StudentT):
            nu = self.freedom(params, space, inputs, outputs, prior=prior, noise=noise)
            return stats.t.ppf(
                q, nu,
                loc=self.mean(params, space, inputs, outputs, prior=prior, noise=noise),
                scale=self.std(params, space, inputs, outputs, prior=prior, noise=noise))
        if isinstance(self.f_density, Uniform):
            lower = self.lower(params, space, inputs, outputs, prior=prior, noise=noise)
            upper = self.upper(params, space, inputs, outputs, prior=prior, noise=noise)
            return stats.uniform.ppf(q, loc=lower, scale=upper - lower)
        return stats.norm.ppf(
            q,
            loc=self.mean(params, space, inputs, outputs, prior=prior, noise=noise),
            scale=self.std(params, space, inputs, outputs, prior=prior, noise=noise))

    def sampler(self, params=None, space=None, inputs=None, outputs=None, samples=1,
                prior=False, noise=False, rng=None):
        if space is None:
            space = self.space
        if isinstance(self.f_density, StudentT):
            nu = self.freedom(params, space, inputs, outputs, prior=prior, noise=noise)
            rand = stats.t.rvs(
                nu,
                loc=self.mean(params, space, inputs, outputs, prior=prior, noise=noise),
                scale=self.std(params, space, inputs, outputs, prior=prior, noise=noise),
                size=(samples, len(space)))
        elif isinstance(self.f_density, Uniform):
            lower = self.lower(params, space, inputs, outputs, prior=prior, noise=noise)
            upper = self.upper(params, space, inputs, outputs, prior=prior, noise=noise)
            rand = stats.uniform.rvs(loc=lower, scale=upper - lower,
                                     size=(samples, len(space)))
        else:
            rand = stats.norm.rvs(
                loc=self.mean(params, space, inputs, outputs, prior=prior, noise=noise),
                scale=self.std(params, space, inputs, outputs, prior=prior, noise=noise),
                size=(samples, len(space)))
        return rand.T.astype(settings.floatx)
