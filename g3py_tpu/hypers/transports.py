"""Vector-valued triangular transport maps.

TPU-native rebuild of ``/root/reference/g3py/processes/hypers/transports.py``:
a Transport pushes a white-noise vector through a (triangular) map
conditioned on the inputs; elementwise transports (location/scale/mapping),
the linear kernel-Cholesky transport, composition via ``@`` with the
composed posterior, and the joint-extension ``posterior`` that concatenates
observed + predictive blocks and pushes noise through the joint map
(reference transports.py:25-44).
"""

import jax.numpy as jnp

from . import Hypers
from ..config import settings
from .kernels import KernelSum, KernelNoise
from ..ops.linalg import safe_cholesky, solve_lower_triangular

__all__ = [
    "Transport",
    "TransportOperation",
    "TransportComposed",
    "ID",
    "TElemwise",
    "TLinear",
    "TNoLinear",
    "TLocation",
    "TScale",
    "TMapping",
    "TKernel",
    "TTriangular",
]


class Transport(Hypers):
    """Base transport: ``__call__(params, inputs, outputs, noise)`` pushes a
    latent vector forward; ``inv`` pulls observations back; ``diag`` is the
    marginal-scale approximation; ``logdet_dinv`` the log-Jacobian."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.parametrics = []

    def __call__(self, params, inputs, outputs, noise=False):
        raise NotImplementedError

    def diag(self, params, inputs, outputs, noise=False):
        return self(params, inputs, outputs, noise=noise)

    def inv(self, params, inputs, outputs, noise=False):
        raise NotImplementedError

    def logdet_dinv(self, params, inputs, outputs):
        raise NotImplementedError

    def posterior(self, params, space, pred, inputs, outputs,
                  noise_pred=False, noise_obs=True, diag=False):
        """Joint extension (reference transports.py:25-44): pull the
        observations back to white noise, stack them with the predictive
        latent vector, push the joint vector through the transport on the
        concatenated domain, and keep the predictive block."""
        outputs_inv = self.inv(params, inputs, outputs, noise=True)
        inputs_space = jnp.concatenate([jnp.atleast_2d(inputs), jnp.atleast_2d(space)])
        outputs_space = jnp.concatenate([outputs_inv, pred])
        pred_full = self(params, inputs_space, outputs_space, noise=True)
        return pred_full[jnp.shape(inputs)[0]:]

    def check_hypers(self, parent=""):
        for p in self.parametrics:
            p.check_hypers(parent)
            self.hypers += p.hypers

    def check_dims(self, x=None):
        super().check_dims(x)
        for p in self.parametrics:
            p.check_dims(x)

    def default_hypers_dims(self, x=None, y=None):
        r = {}
        for p in self.parametrics:
            r.update(p.default_hypers_dims(x, y))
        return r

    def potential_logp(self, params):
        parts = [q for q in (p.potential_logp(params) for p in self.parametrics) if q is not None]
        own = super().potential_logp(params)
        if own is not None:
            parts.append(own)
        if not parts:
            return None
        total = parts[0]
        for p in parts[1:]:
            total = total + p
        return total

    def __matmul__(self, other):
        return TransportComposed(self, other)


class TransportOperation(Transport):
    def __init__(self, t1, t2):
        self.t1 = t1
        self.t2 = t2
        self.hypers = []
        self.potential = None
        self.parametrics = []
        self.op = "op"

    def check_hypers(self, parent=""):
        self.t1.check_hypers(parent=parent)
        self.t2.check_hypers(parent=parent)
        self.hypers = list(self.t1.hypers) + list(self.t2.hypers)

    def check_dims(self, x=None):
        self.t1.check_dims(x)
        self.t2.check_dims(x)

    def default_hypers_dims(self, x=None, y=None):
        return {
            **self.t1.default_hypers_dims(x, y),
            **self.t2.default_hypers_dims(x, y),
        }

    def potential_logp(self, params):
        parts = [
            p
            for p in (self.t1.potential_logp(params), self.t2.potential_logp(params))
            if p is not None
        ]
        if not parts:
            return None
        total = parts[0]
        for p in parts[1:]:
            total = total + p
        return total

    def __str__(self):
        return f"{self.t1} {self.op} {self.t2}"

    __repr__ = __str__


class TransportComposed(TransportOperation):
    """t1 after t2; the posterior of the composition is the composition of
    posteriors: t |-GP-> X |-T2-> Z |-T1-> Y (reference transports.py:93-119)."""

    def __init__(self, t1, t2):
        super().__init__(t1, t2)
        self.op = "@"
        self.name = self.t1.name + " " + self.t2.name

    def __call__(self, params, inputs, outputs, noise=False):
        return self.t1(params, inputs, self.t2(params, inputs, outputs, noise=noise), noise=noise)

    def diag(self, params, inputs, outputs, noise=False):
        return self.t1.diag(
            params, inputs, self.t2(params, inputs, outputs, noise=noise), noise=noise
        )

    def inv(self, params, inputs, outputs, noise=False):
        return self.t2.inv(
            params, inputs, self.t1.inv(params, inputs, outputs, noise=noise), noise=noise
        )

    def logdet_dinv(self, params, inputs, outputs):
        return self.t2.logdet_dinv(
            params, inputs, self.t1.inv(params, inputs, outputs, noise=True)
        ) + self.t1.logdet_dinv(params, inputs, outputs)

    def posterior(self, params, space, pred, inputs, outputs,
                  noise_pred=False, noise_obs=True, diag=False):
        inner = self.t2.posterior(
            params, space, pred, inputs,
            self.t1.inv(params, inputs, outputs, noise=noise_obs),
            noise_pred=noise_pred, noise_obs=noise_obs, diag=diag,
        )
        return self.t1.posterior(
            params, space, inner, inputs, outputs,
            noise_pred=noise_pred, noise_obs=noise_obs, diag=diag,
        )


class ID(Transport):
    """Identity transport (reference transports.py:122-131)."""

    def __call__(self, params, inputs, outputs, noise=False):
        return jnp.asarray(outputs)

    def inv(self, params, inputs, outputs, noise=False):
        return jnp.asarray(outputs)

    def logdet_dinv(self, params, inputs, outputs):
        return jnp.zeros((), dtype=settings.floatx)


class TElemwise(Transport):
    """Elementwise transports act pointwise, so their posterior extension is
    just the transport on the predictive block (reference transports.py:134-136)."""

    def posterior(self, params, space, pred, inputs=None, outputs=None,
                  noise_pred=False, noise_obs=True, diag=False):
        return self(params, space, pred, noise=noise_pred)


class TLinear(Transport):
    pass


class TNoLinear(Transport):
    pass


class TLocation(TElemwise):
    """y = z + m(x) (reference transports.py:146-162)."""

    def __init__(self, location=None, x=None, name=None):
        super().__init__(x, name)
        self.location = location
        self.parametrics.append(self.location)

    def __call__(self, params, inputs, outputs, noise=False):
        return jnp.asarray(outputs) + self.location(params, inputs)

    def inv(self, params, inputs, outputs, noise=False):
        return jnp.asarray(outputs) - self.location(params, inputs)

    def logdet_dinv(self, params, inputs, outputs):
        return jnp.zeros((), dtype=settings.floatx)


class TScale(TElemwise):
    """y = z * s(x) (reference transports.py:165-181)."""

    def __init__(self, scale=None, x=None, name=None):
        super().__init__(x, name)
        self.scale = scale
        self.parametrics.append(self.scale)

    def __call__(self, params, inputs, outputs, noise=False):
        return jnp.asarray(outputs) * self.scale(params, inputs)

    def inv(self, params, inputs, outputs, noise=False):
        return jnp.asarray(outputs) / self.scale(params, inputs)

    def logdet_dinv(self, params, inputs, outputs):
        return -jnp.sum(jnp.log(self.scale(params, inputs)))


class TMapping(TElemwise):
    """y = T(z) for a scalar warping T (reference transports.py:184-197)."""

    def __init__(self, mapping=None, x=None, name=None):
        super().__init__(x, name)
        self.mapping = mapping
        self.parametrics.append(self.mapping)

    def __call__(self, params, inputs, outputs, noise=False):
        return self.mapping(params, outputs)

    def inv(self, params, inputs, outputs, noise=False):
        return self.mapping.inv(params, outputs)

    def logdet_dinv(self, params, inputs, outputs):
        return self.mapping.logdet_dinv(params, outputs)


class TKernel(TLinear):
    """y = chol(K(x)) z — the linear gaussian-process transport
    (reference transports.py:200-257)."""

    def __init__(self, kernel, noisy=False, x=None, name=None):
        super().__init__(x, name)
        self.kernel = kernel
        if noisy:
            self.noisy = KernelSum(self.kernel, KernelNoise(name="Noise" + kernel.name))
        else:
            self.noisy = kernel
        self.parametrics.append(self.noisy)

    def _chol(self, params, inputs, noise):
        k = self.noisy if noise else self.kernel
        return safe_cholesky(k.cov(params, inputs))

    def __call__(self, params, inputs, outputs, noise=False):
        return jnp.dot(self._chol(params, inputs, noise), jnp.asarray(outputs))

    def diag(self, params, inputs, outputs, noise=False):
        k = self.noisy if noise else self.kernel
        sd = jnp.sqrt(jnp.diagonal(k.cov(params, inputs)))
        return sd * jnp.asarray(outputs)

    def inv(self, params, inputs, outputs, noise=False):
        return solve_lower_triangular(self._chol(params, inputs, noise), jnp.asarray(outputs))

    def logdet_dinv(self, params, inputs, outputs):
        cho = self._chol(params, inputs, noise=True)
        return -jnp.sum(jnp.log(jnp.diagonal(cho)))

    def posterior(self, params, space, pred, inputs, outputs,
                  noise_pred=False, noise_obs=True, diag=False):
        """Joint-Cholesky push-forward (reference transports.py:236-253):
        whiten the observations with the observed block, then color the
        stacked [whitened-obs, pred] vector with the joint Cholesky and keep
        the predictive block."""
        outputs_inv = self.inv(params, inputs, outputs, noise=noise_obs)
        k_obs = (self.noisy if noise_obs else self.kernel).cov(params, inputs)
        k_space = (self.noisy if noise_pred else self.kernel).cov(params, space)
        k_cross = self.kernel.cov(params, inputs, space)
        top = jnp.concatenate([k_obs, k_cross], axis=1)
        bottom = jnp.concatenate([k_cross.T, k_space], axis=1)
        cov = jnp.concatenate([top, bottom], axis=0)
        cho = safe_cholesky(cov)
        joint = jnp.concatenate([outputs_inv, pred])
        pred_full = jnp.dot(cho, joint)
        return pred_full[jnp.shape(inputs)[0]:]


class TTriangular(TNoLinear):
    """Declared-only in the reference (transports.py:260-263); kept as an
    API stub for a learned triangular generator."""

    def __init__(self, generator):
        super().__init__()
        self.generator = generator
        self.parametrics.append(self.generator)
