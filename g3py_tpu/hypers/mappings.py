"""Scalar warpings (bijectors) for transformed processes.

TPU-native rebuild of ``/root/reference/g3py/processes/hypers/mappings.py``:
each Mapping provides ``inv`` (observed -> latent), ``forward``
(latent -> observed; defaults to Newton inversion of ``inv`` with implicit
differentiation, replacing the reference's scan-based
``inverse_function``), and ``logdet_dinv`` (analytic per subclass, or the
autodiff elementwise-Jacobian default).  Composition via ``@`` builds
``MappingComposed`` with the chain-rule logdet (reference mappings.py:57-70).
"""

import numpy as np
import jax
import jax.numpy as jnp

from . import Hypers, Flat, FlatExp, hval, is_param
from ..config import settings
from ..ops.guards import to_num
from ..ops.root import newton_inverse

__all__ = [
    "Mapping",
    "MappingOperation",
    "MappingComposed",
    "MappingInvSum",
    "Identity",
    "LinearMapping",
    "LogShifted",
    "BoxCoxShifted",
    "BoxCoxLinear",
    "BoxCoxLinear2",
    "WarpingTanh",
    "WarpingBoxCox",
    "ArcsinhLinear",
    "SinhArcsinh",
    "Logistic",
]


def _n_of(y):
    return jnp.asarray(jnp.shape(y)[0], settings.floatx)


class Mapping(Hypers):
    """Base warping.  ``inv`` maps observed y to the latent gaussian domain;
    ``forward``/``__call__`` maps back (reference mappings.py:10-23)."""

    def inv(self, params, y):
        raise NotImplementedError

    def __call__(self, params, x):
        """Default forward: numeric inversion of ``inv`` (reference
        mappings.py:11-12) with implicit-function-theorem gradients."""
        return newton_inverse(lambda v: self.inv(params, v), jnp.asarray(x))

    forward = __call__

    def logdet_dinv(self, params, y):
        return self.logdet_dinv_num(params, y)

    def logdet_dinv_num(self, params, y):
        """Autodiff logdet for elementwise warpings: the Jacobian of an
        elementwise map is diagonal, and d(sum inv)/dy_i = d inv_i/dy_i
        (reference computed the full tt.jacobian diagonal,
        mappings.py:20-23)."""
        return jnp.sum(self.logdet_dinv_elem(params, y))

    def logdet_dinv_elem(self, params, y):
        """Per-element ``log dT^{-1}/dy_i`` (elementwise warpings have
        diagonal Jacobians).  Masked-observation loglikes sum a subset of
        these terms (gaussian.th_loglike_masked_fn)."""
        y = jnp.asarray(y)
        diag = jax.grad(lambda v: jnp.sum(self.inv(params, v)))(y)
        return jnp.log(diag)

    def __matmul__(self, other):
        return MappingComposed(self, other)

    __imatmul__ = __matmul__
    __rmatmul__ = __matmul__


class MappingOperation(Mapping):
    def __init__(self, m1, m2):
        self.m1 = m1
        self.m2 = m2
        self.hypers = []
        self.potential = None
        self.op = "op"

    def check_hypers(self, parent=""):
        self.m1.check_hypers(parent=parent)
        self.m2.check_hypers(parent=parent)
        self.hypers = list(self.m1.hypers) + list(self.m2.hypers)

    def check_dims(self, x=None):
        self.m1.check_dims(x)
        self.m2.check_dims(x)

    def default_hypers_dims(self, x=None, y=None):
        return {
            **self.m1.default_hypers_dims(x, y),
            **self.m2.default_hypers_dims(x, y),
        }

    def potential_logp(self, params):
        parts = [
            p
            for p in (self.m1.potential_logp(params), self.m2.potential_logp(params))
            if p is not None
        ]
        if not parts:
            return None
        total = parts[0]
        for p in parts[1:]:
            total = total + p
        return total

    def __str__(self):
        return f"{self.m1} {self.op} {self.m2}"

    __repr__ = __str__


class MappingComposed(MappingOperation):
    """T = m1 after m2; inv = m2.inv after m1.inv; chain-rule logdet
    (reference mappings.py:57-70)."""

    def __init__(self, m1, m2):
        super().__init__(m1, m2)
        self.op = "@"
        self.name = self.m1.name + " " + self.m2.name

    def __call__(self, params, x):
        return self.m1(params, self.m2(params, x))

    forward = __call__

    def inv(self, params, y):
        return self.m2.inv(params, self.m1.inv(params, y))

    def logdet_dinv(self, params, y):
        return self.m2.logdet_dinv(params, self.m1.inv(params, y)) + self.m1.logdet_dinv(
            params, y
        )


class MappingInvSum(MappingOperation):
    """inv-only sum composition (reference mappings.py:73-85)."""

    def __init__(self, m1, m2):
        super().__init__(m1, m2)
        self.op = "+^"

    def inv(self, params, y):
        return self.m1.inv(params, y) + self.m2.inv(params, y)


class Identity(Mapping):
    """T(x) = x (reference mappings.py:88-99)."""

    def __init__(self, y=None, name=None):
        super().__init__(y, name)

    def __call__(self, params, x):
        return jnp.asarray(x)

    forward = __call__

    def inv(self, params, y):
        return jnp.asarray(y)

    def logdet_dinv(self, params, y):
        return jnp.zeros((), dtype=settings.floatx)


class LinearMapping(Mapping):
    """T(x) = scale (x - shift) (reference mappings.py:102-129)."""

    def __init__(self, y=None, name=None, shift=None, scale=None):
        super().__init__(y, name)
        self.shift = shift
        self.scale = scale

    def check_hypers(self, parent=""):
        self.shift = self._param(self.shift, parent + self.name + "_shift", Flat())
        self.scale = self._param(self.scale, parent + self.name + "_scale", FlatExp())

    def default_hypers(self, x=None, y=None):
        out = {}
        if is_param(self.shift):
            out[self.shift] = np.asarray(0.0, settings.floatx)
        if is_param(self.scale):
            out[self.scale] = np.asarray(1.0, settings.floatx)
        return out

    def __call__(self, params, x):
        return hval(self.scale, params) * (jnp.asarray(x) - hval(self.shift, params))

    forward = __call__

    def inv(self, params, y):
        return jnp.asarray(y) / hval(self.scale, params) + hval(self.shift, params)

    def logdet_dinv(self, params, y):
        return -_n_of(y) * jnp.log(hval(self.scale, params))


class LogShifted(Mapping):
    """T(x) = exp(x) + shift (reference mappings.py:132-155)."""

    def __init__(self, y=None, name=None, shift=None):
        super().__init__(y, name)
        self.shift = shift

    def check_hypers(self, parent=""):
        self.shift = self._param(self.shift, parent + self.name + "_shift", Flat())

    def default_hypers(self, x=None, y=None):
        if not is_param(self.shift):
            return {}
        return {self.shift: np.asarray(np.min(y) - 1.0, settings.floatx)}

    def __call__(self, params, x):
        return jnp.exp(jnp.asarray(x)) + hval(self.shift, params)

    forward = __call__

    def inv(self, params, y):
        return jnp.log(jnp.maximum(jnp.asarray(y) - hval(self.shift, params), 1e-32))

    def logdet_dinv(self, params, y):
        return -jnp.sum(jnp.log(jnp.asarray(y) - hval(self.shift, params)))


def _signed_power(v, p):
    return jnp.sign(v) * jnp.abs(v) ** p


class BoxCoxShifted(Mapping):
    """Signed Box-Cox with output shift (reference mappings.py:158-186)."""

    def __init__(self, y=None, name="BoxShift", shift=None, power=None):
        super().__init__(y, name)
        self.shift = shift
        self.power = power

    def check_hypers(self, parent=""):
        self.shift = self._param(self.shift, parent + self.name + "_shift", Flat())
        self.power = self._param(self.power, parent + self.name + "_power", FlatExp())

    def default_hypers(self, x=None, y=None):
        out = {}
        if is_param(self.shift):
            out[self.shift] = np.asarray(1.0, settings.floatx)
        if is_param(self.power):
            out[self.power] = np.asarray(1.0, settings.floatx)
        return out

    def __call__(self, params, x):
        p = hval(self.power, params)
        scaled = p * jnp.asarray(x) + 1.0
        return _signed_power(scaled, 1.0 / p) - hval(self.shift, params)

    forward = __call__

    def inv(self, params, y):
        p = hval(self.power, params)
        shifted = jnp.asarray(y) + hval(self.shift, params)
        # power -> 0 limit is the log map (reference ifelse, mappings.py:178)
        boxcox = (_signed_power(shifted, p) - 1.0) / jnp.where(p < 1e-5, 1.0, p)
        return jnp.where(p < 1e-5, jnp.log(jnp.abs(shifted) + 1e-32), boxcox)

    def logdet_dinv(self, params, y):
        p = hval(self.power, params)
        shifted = jnp.asarray(y) + hval(self.shift, params)
        return (p - 1.0) * jnp.sum(jnp.log(jnp.abs(shifted)))


class BoxCoxLinear(Mapping):
    """Box-Cox with input scale and output shift (reference
    mappings.py:189-221) — the warping of the WGP benchmark workload."""

    def __init__(self, y=None, name=None, shift=None, scale=None, power=None):
        super().__init__(y, name)
        self.shift = shift
        self.scale = scale
        self.power = power

    def check_hypers(self, parent=""):
        self.shift = self._param(self.shift, parent + self.name + "_shift", Flat())
        self.scale = self._param(self.scale, parent + self.name + "_scale", FlatExp())
        self.power = self._param(self.power, parent + self.name + "_power", FlatExp())

    def default_hypers(self, x=None, y=None):
        out = {}
        if is_param(self.shift):
            out[self.shift] = np.asarray(1.0, settings.floatx)
        if is_param(self.scale):
            out[self.scale] = np.asarray(1.0, settings.floatx)
        if is_param(self.power):
            out[self.power] = np.asarray(1.0, settings.floatx)
        return out

    def __call__(self, params, x):
        p = hval(self.power, params)
        scaled = p * jnp.asarray(x) + 1.0
        return _signed_power(scaled, 1.0 / p) / hval(self.scale, params) - hval(
            self.shift, params
        )

    forward = __call__

    def inv(self, params, y):
        p = hval(self.power, params)
        shifted = hval(self.scale, params) * (jnp.asarray(y) + hval(self.shift, params))
        boxcox = (_signed_power(shifted, p) - 1.0) / jnp.where(p < 1e-5, 1.0, p)
        return jnp.where(p < 1e-5, jnp.log(jnp.abs(shifted) + 1e-32), boxcox)

    def logdet_dinv(self, params, y):
        p = hval(self.power, params)
        s = hval(self.scale, params)
        shifted = s * (jnp.asarray(y) + hval(self.shift, params))
        return (p - 1.0) * jnp.sum(jnp.log(jnp.abs(shifted))) + _n_of(y) * jnp.log(s)


class BoxCoxLinear2(Mapping):
    """Variant with output scaling (reference mappings.py:224-256)."""

    def __init__(self, y=None, name=None, shift=None, scale=None, power=None):
        super().__init__(y, name)
        self.shift = shift
        self.scale = scale
        self.power = power

    def check_hypers(self, parent=""):
        self.shift = self._param(self.shift, parent + self.name + "_shift", Flat())
        self.scale = self._param(self.scale, parent + self.name + "_scale", FlatExp())
        self.power = self._param(self.power, parent + self.name + "_power", FlatExp())

    def default_hypers(self, x=None, y=None):
        out = {}
        if is_param(self.shift):
            out[self.shift] = np.asarray(1.0, settings.floatx)
        if is_param(self.scale):
            out[self.scale] = np.asarray(1.0, settings.floatx)
        if is_param(self.power):
            out[self.power] = np.asarray(1.0, settings.floatx)
        return out

    def __call__(self, params, x):
        p = hval(self.power, params)
        scaled = p * jnp.asarray(x) + 1.0
        return (_signed_power(scaled, 1.0 / p) - hval(self.shift, params)) / hval(
            self.scale, params
        )

    forward = __call__

    def inv(self, params, y):
        p = hval(self.power, params)
        shifted = hval(self.scale, params) * jnp.asarray(y) + hval(self.shift, params)
        boxcox = (_signed_power(shifted, p) - 1.0) / jnp.where(p < 1e-5, 1.0, p)
        return jnp.where(p < 1e-5, jnp.log(jnp.abs(shifted) + 1e-32), boxcox)

    def logdet_dinv(self, params, y):
        p = hval(self.power, params)
        s = hval(self.scale, params)
        shifted = s * jnp.asarray(y) + hval(self.shift, params)
        coeff = jnp.where(p < 1e-5, -1.0, p - 1.0)
        return coeff * jnp.sum(jnp.log(jnp.abs(shifted))) + _n_of(y) * jnp.log(s)


class WarpingTanh(Mapping):
    """Sum-of-tanh warping, inv-only: forward goes through Newton inversion
    (reference mappings.py:259-284)."""

    def __init__(self, y=None, n=1, name=None, a=None, b=None, c=None):
        super().__init__(y, name)
        self.n = n
        self.a = a
        self.b = b
        self.c = c

    def check_hypers(self, parent=""):
        self.a = self._param(self.a, parent + self.name + "_a", FlatExp(), shape=self.n)
        self.b = self._param(self.b, parent + self.name + "_b", FlatExp(), shape=self.n)
        self.c = self._param(self.c, parent + self.name + "_c", Flat(), shape=self.n)

    def default_hypers(self, x=None, y=None):
        out = {}
        ymax = np.abs(y).max()
        if is_param(self.a):
            out[self.a] = 0.1 * np.ones(self.n, settings.floatx) * ymax / self.n
        if is_param(self.b):
            out[self.b] = 0.1 * np.ones(self.n, settings.floatx) / ymax
        if is_param(self.c):
            out[self.c] = np.ones(self.n, settings.floatx) * np.mean(y)
        return out

    def inv(self, params, y):
        y = jnp.asarray(y)
        a = hval(self.a, params)
        b = hval(self.b, params)
        c = hval(self.c, params)
        z = y[:, None]
        return y + jnp.dot(jnp.tanh(b * (z + c)), a)


class WarpingBoxCox(Mapping):
    """Mixture-of-Box-Cox warping, inv-only (reference mappings.py:287-315)."""

    def __init__(self, y=None, n=1, name=None, shift=None, power=None, w=None):
        super().__init__(y, name)
        self.n = n
        self.shift = shift
        self.power = power
        self.w = w

    def check_hypers(self, parent=""):
        self.shift = self._param(
            self.shift, parent + self.name + "_shift", FlatExp(), shape=self.n
        )
        self.power = self._param(
            self.power, parent + self.name + "_power", FlatExp(), shape=self.n
        )
        self.w = self._param(self.w, parent + self.name + "_w", FlatExp(), shape=self.n)

    def default_hypers(self, x=None, y=None):
        out = {}
        if is_param(self.w):
            out[self.w] = np.ones(self.n, settings.floatx) / self.n
        if is_param(self.shift):
            out[self.shift] = np.ones(self.n, settings.floatx)
        if is_param(self.power):
            out[self.power] = np.ones(self.n, settings.floatx)
        return out

    def inv(self, params, y):
        y = jnp.asarray(y)
        shift = hval(self.shift, params)
        power = hval(self.power, params)
        w = hval(self.w, params)
        z = y[:, None] + shift
        return jnp.dot((_signed_power(z, power) - 1.0) / power, w)


class ArcsinhLinear(Mapping):
    """T(x) = sinh((x - shift)/scale) (reference mappings.py:318-345)."""

    def __init__(self, y=None, name=None, shift=None, scale=None):
        super().__init__(y, name)
        self.shift = shift
        self.scale = scale

    def check_hypers(self, parent=""):
        self.shift = self._param(self.shift, parent + self.name + "_shift", Flat())
        self.scale = self._param(self.scale, parent + self.name + "_scale", FlatExp())

    def default_hypers(self, x=None, y=None):
        out = {}
        if is_param(self.shift):
            out[self.shift] = np.asarray(np.mean(y), settings.floatx)
        if is_param(self.scale):
            out[self.scale] = np.asarray(np.std(y), settings.floatx)
        return out

    def __call__(self, params, x):
        return jnp.sinh(
            (jnp.asarray(x) - hval(self.shift, params)) / hval(self.scale, params)
        )

    forward = __call__

    def inv(self, params, y):
        return jnp.arcsinh(jnp.asarray(y)) * hval(self.scale, params) + hval(
            self.shift, params
        )

    def logdet_dinv(self, params, y):
        y = jnp.asarray(y)
        return _n_of(y) * jnp.log(hval(self.scale, params)) - 0.5 * jnp.sum(
            jnp.log1p(y**2)
        )


class SinhArcsinh(Mapping):
    """Sinh-arcsinh warping (Jones & Pewsey; reference mappings.py:348-376)."""

    def __init__(self, y=None, name=None, shift=None, scale=None):
        super().__init__(y, name)
        self.shift = shift
        self.scale = scale

    def check_hypers(self, parent=""):
        self.shift = self._param(self.shift, parent + self.name + "_shift", Flat())
        self.scale = self._param(self.scale, parent + self.name + "_scale", FlatExp())

    def default_hypers(self, x=None, y=None):
        out = {}
        if is_param(self.shift):
            out[self.shift] = np.asarray(0.0, settings.floatx)
        if is_param(self.scale):
            out[self.scale] = np.asarray(1.0, settings.floatx)
        return out

    def __call__(self, params, x):
        return jnp.sinh(
            (jnp.arcsinh(jnp.asarray(x)) - hval(self.shift, params))
            / hval(self.scale, params)
        )

    forward = __call__

    def inv(self, params, y):
        return jnp.sinh(
            hval(self.shift, params)
            + hval(self.scale, params) * jnp.arcsinh(jnp.asarray(y))
        )

    def logdet_dinv(self, params, y):
        y = jnp.asarray(y)
        shift = hval(self.shift, params)
        scale = hval(self.scale, params)
        return (
            jnp.sum(jnp.log(jnp.cosh(shift + scale * jnp.arcsinh(y))))
            + _n_of(y) * jnp.log(scale)
            - 0.5 * jnp.sum(jnp.log1p(y**2))
        )


class Logistic(Mapping):
    """Bounded logistic warping (reference mappings.py:379-414)."""

    def __init__(self, y=None, name=None, lower=None, high=None, location=None, scale=None):
        super().__init__(y, name)
        self.lower = lower
        self.high = high
        self.location = location
        self.scale = scale

    def check_hypers(self, parent=""):
        self.lower = self._param(self.lower, parent + self.name + "_lower", Flat())
        self.high = self._param(self.high, parent + self.name + "_high", FlatExp())
        self.location = self._param(
            self.location, parent + self.name + "_location", Flat()
        )
        self.scale = self._param(self.scale, parent + self.name + "_scale", FlatExp())

    def default_hypers(self, x=None, y=None):
        out = {}
        if is_param(self.lower):
            out[self.lower] = 1.5 * np.min(y) - 0.5 * np.max(y)
        if is_param(self.high):
            out[self.high] = 2.0 * (np.max(y) - np.min(y))
        if is_param(self.location):
            out[self.location] = np.mean(y)
        if is_param(self.scale):
            out[self.scale] = np.std(y)
        return out

    def __call__(self, params, x):
        lower = hval(self.lower, params)
        high = hval(self.high, params)
        loc = hval(self.location, params)
        scale = hval(self.scale, params)
        return lower + high * (0.5 + 0.5 * jnp.tanh((jnp.asarray(x) - loc) / (2 * scale)))

    forward = __call__

    def _p(self, params, y):
        lower = hval(self.lower, params)
        high = hval(self.high, params)
        y = jnp.asarray(y)
        return jnp.where(y < lower, 0.0, jnp.where(y > lower + high, 1.0, (y - lower) / high))

    def inv(self, params, y):
        p = self._p(params, y)
        loc = hval(self.location, params)
        scale = hval(self.scale, params)
        return loc + scale * to_num(jnp.log(p / (1.0 - p)))

    def logdet_dinv(self, params, y):
        p = self._p(params, y)
        high = hval(self.high, params)
        scale = hval(self.scale, params)
        return jnp.sum(to_num(jnp.log(scale / (high * p * (1.0 - p)))))
