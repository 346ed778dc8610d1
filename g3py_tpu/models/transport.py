"""Transport processes — push-forwards of white noise through triangular maps.

Rebuild of ``/root/reference/g3py/processes/transport.py``: the process is
defined by a Transport map T(x, .); the observed density is

  logp = -n/2 log 2pi - 1/2 |T^{-1}(y)|^2 + log|det dT^{-1}(y)|

(reference transport.py:220-243) and the prediction moments are Monte-Carlo
over ``T(randn)`` samples (default 30, transport.py:173-211).
"""

import numpy as np
import jax.numpy as jnp

from ..config import settings
from ..hypers.transports import Transport, ID
from ..ops.guards import to_num
from .stochastic import StochasticProcess

__all__ = ["TransportProcess", "TransportGaussianProcess",
           "transport_gaussian_logp_t", "TransportGaussianDistribution"]

GUARD = np.float32(-1e30)
# float64 constant: under x64 the pipeline then carries full precision
# (the f32 constant alone cost ~3e-9 relative NLL error in the f64
# north-star job); in float32 mode jax demotes it with no behavior change
LOG2PI = np.log(2.0 * np.pi)


def transport_gaussian_logp_t(value, delta, logdet_dinv):
    """logp of the transport push-forward; ``delta = T^{-1}(y)``
    (reference ``TransportGaussianDistribution.logp_t``, transport.py:220-243)."""
    n = jnp.asarray(jnp.shape(value)[0], settings.dtype)
    npi = -0.5 * n * LOG2PI
    dot2 = -0.5 * jnp.dot(delta, delta)
    r = npi + dot2 + logdet_dinv
    bad = (~jnp.all(jnp.isfinite(delta))) | (~jnp.isfinite(logdet_dinv))
    return jnp.where(bad, GUARD, to_num(r, nan=GUARD, neginf=GUARD))


class TransportGaussianDistribution:
    """Namespace kept for reference-API parity (transport.py:214-246)."""

    logp_t = staticmethod(transport_gaussian_logp_t)


class TransportProcess(StochasticProcess):
    def __init__(self, space=None, transport: Transport = None, *args, **kwargs):
        self.f_transport = transport if transport is not None else ID()
        kwargs["space"] = space
        super().__init__(*args, **kwargs)

    def _components(self):
        return [self.f_transport]

    def _check_hypers(self):
        self.f_transport.check_dims(self.inputs)
        self.f_transport.check_hypers(self.name + "_")

    def default_hypers(self):
        return self.f_transport.default_hypers_dims(self.inputs, self.outputs)

    # -- transport selectors (reference transport.py:34-104) --------------------
    def th_transport(self, prior=False, noise=False):
        t = self.f_transport
        if prior:
            def fn(params, space, inputs, outputs, vector):
                return t(params, space, vector, noise=noise)
        else:
            def fn(params, space, inputs, outputs, vector):
                return t.posterior(params, space, vector, inputs, outputs,
                                   noise_pred=noise, noise_obs=True)
        return fn

    def th_transport_diag(self, prior=False, noise=False):
        t = self.f_transport
        if prior:
            def fn(params, space, inputs, outputs, vector):
                return t.diag(params, space, vector, noise=noise)
        else:
            def fn(params, space, inputs, outputs, vector):
                return t.posterior(params, space, vector, inputs, outputs,
                                   noise_pred=noise, noise_obs=True, diag=True)
        return fn

    def th_transport_inv(self, prior=False, noise=False):
        t = self.f_transport

        def fn(params, space, inputs, outputs, vector):
            return t.inv(params, space, vector, noise=noise)
        return fn

    _dispatch_methods = dict(
        StochasticProcess._dispatch_methods,
        transport="th_transport",
        transport_diag="th_transport_diag",
        transport_inv="th_transport_inv",
    )

    def plot_model(self, *args, **kwargs):
        pass

    def plot_distribution(self, *args, **kwargs):
        pass

    def plot_distribution2D(self, *args, **kwargs):
        pass


class TransportGaussianProcess(TransportProcess):
    """TGP: observed density through the transport pullback; Monte-Carlo
    moments (reference transport.py:136-211)."""

    def __init__(self, *args, **kwargs):
        if "name" not in kwargs:
            kwargs["name"] = "TGP"
        super().__init__(*args, **kwargs)

    def th_define_process(self):
        self.distribution = TransportGaussianDistribution

    def th_loglike_fn(self):
        t = self.f_transport

        def fn(params, space, inputs, outputs):
            delta = t.inv(params, inputs, outputs, noise=True)
            logdet = t.logdet_dinv(params, inputs, outputs)
            return transport_gaussian_logp_t(outputs, delta, logdet)

        return fn

    # -- Monte-Carlo moments (reference transport.py:173-211) --------------------
    def _mc_samples(self, params, space, inputs, outputs, prior, noise, simulations):
        if simulations is None:
            simulations = settings.mc_simulations
        if isinstance(simulations, int):
            return self.sampler(params=params, space=space, inputs=inputs,
                                outputs=outputs, samples=simulations,
                                prior=prior, noise=noise)
        return simulations

    def mean(self, params=None, space=None, inputs=None, outputs=None, prior=False,
             noise=False, simulations=None, **kwargs):
        s = self._mc_samples(params, space, inputs, outputs, prior, noise, simulations)
        return s.mean(axis=1)

    def std(self, params=None, space=None, inputs=None, outputs=None, prior=False,
            noise=False, simulations=None, **kwargs):
        s = self._mc_samples(params, space, inputs, outputs, prior, noise, simulations)
        return s.std(axis=1)

    def variance(self, params=None, space=None, inputs=None, outputs=None,
                 prior=False, noise=False, simulations=None, **kwargs):
        s = self._mc_samples(params, space, inputs, outputs, prior, noise, simulations)
        return s.var(axis=1)

    def median(self, params=None, space=None, inputs=None, outputs=None, prior=False,
               noise=False, simulations=None, **kwargs):
        s = self._mc_samples(params, space, inputs, outputs, prior, noise, simulations)
        return np.nanpercentile(s, 50, axis=1)

    def quantiler(self, params=None, space=None, inputs=None, outputs=None, q=0.975,
                  prior=False, noise=False, simulations=None):
        s = self._mc_samples(params, space, inputs, outputs, prior, noise, simulations)
        return np.nanpercentile(s, 100 * q, axis=1)

    def sampler(self, params=None, space=None, inputs=None, outputs=None, samples=1,
                prior=False, noise=False, rng=None):
        if space is None:
            space = self.space
        if rng is None:
            rng = np.random.default_rng()
        rand = rng.standard_normal((len(space), samples)).astype(settings.floatx)
        cols = [
            self.transport(params, space, inputs, outputs, vector=rand[:, i],
                           prior=prior, noise=noise)
            for i in range(samples)
        ]
        return np.stack(cols, axis=1)
