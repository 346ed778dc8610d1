"""Covariance kernels with operator algebra.

TPU-native rebuild of the reference kernel zoo
(``/root/reference/g3py/processes/hypers/kernels.py``): the same class
hierarchy (dot kernels, stationary kernels, periodic kernels, index
kernels), the same ``+``/``*`` algebra producing composite kernels that
merge hyper lists and per-part active dims, and the same data-driven
defaults — but every ``cov`` is a pure jax function of a params dict,
lowered through the MXU-first gram builders instead of an N x M x d
broadcast.

Deliberate deviations from the reference (each masked there by the robust
Cholesky's jitter escalation):

* ``SIN`` uses the PSD exp-sin^2 form ``exp(-2 sum_d sin^2(pi d f) r)``;
  the reference's ``+2`` sign (kernels.py:472) yields a non-PSD matrix.
* ``NN`` uses Williams' arcsine kernel with *diagonal* normalizers
  ``arcsin(2 g12 / sqrt((1+2 g11_i)(1+2 g22_j)))``; the reference's cross
  branch multiplies two full gram matrices of incompatible shapes
  (kernels.py:351-357).
"""

import numpy as np
import jax.numpy as jnp

from . import Hypers, Param, FlatExp, hval, is_param, slice_dims
from ..config import settings
from ..ops.gram import pairwise_sum, pairwise_prod, weighted_sqdist
from .metrics import (
    Metric,
    One,
    Delta,
    DeltaEq,
    DeltaEq2,
    Minimum,
    Difference,
    ARD_Dot,
    ARD_DotBias,
    ARD_L1,
    ARD_L2,
)

__all__ = [
    "Kernel",
    "KernelDot",
    "KernelStationary",
    "KernelOperation",
    "KernelComposition",
    "KernelScale",
    "KernelShift",
    "KernelProd",
    "KernelSum",
    "KernelMax",
    "KernelEquals",
    "KernelEquals2",
    "BW",
    "VAR",
    "NIL",
    "LIN",
    "POL",
    "NN",
    "KernelNoise",
    "WN",
    "RQ",
    "MAT32",
    "MAT52",
    "OU",
    "SE",
    "KernelPeriodic",
    "COS",
    "SIN",
    "SINC",
    "SM",
]

pi = np.pi
pi2 = np.pi**2


class Kernel(Hypers):
    """Base kernel: amplitude ``var`` times a metric (reference
    kernels.py:13-80).  ``cov(params, x1, x2=None)`` is the gram entry
    point; ``x2=None`` means the square (possibly special-cased) form."""

    def __init__(self, x=None, name=None, metric=Delta, var=None):
        if isinstance(metric, type):
            self.metric = metric(x)
        else:
            self.metric = metric
        super().__init__(x, name)
        self.var = var

    def check_hypers(self, parent=""):
        self.var = self._param(self.var, parent + self.name + "_var", FlatExp())
        self.metric.check_hypers(parent + self.name + "_")
        self.hypers += self.metric.hypers

    def check_dims(self, x=None):
        super().check_dims(x)
        self.metric.check_dims(x)

    def default_hypers(self, x=None, y=None):
        out = {}
        if is_param(self.var):
            out[self.var] = np.asarray(np.var(y), dtype=settings.floatx)
        if self.metric is not None:
            out.update(self.metric.default_hypers(x, y))
        return out

    def default_hypers_dims(self, x=None, y=None):
        out = {}
        if is_param(self.var):
            out[self.var] = np.asarray(np.var(y), dtype=settings.floatx)
        if self.metric is not None:
            out.update(self.metric.default_hypers_dims(x, y))
        return out

    def input_sensitivity(self, params):
        return hval(self.var, params) * self.metric.input_sensitivity(params)

    def cov(self, params, x1, x2=None):
        raise NotImplementedError

    # -- algebra (reference kernels.py:51-75) --------------------------------
    def __mul__(self, other):
        if isinstance(other, Kernel):
            return KernelProd(self, other)
        return KernelScale(self, other)

    __imul__ = __mul__

    def __rmul__(self, other):
        if isinstance(other, Kernel):
            return KernelProd(other, self)
        return KernelScale(self, other)

    def __add__(self, other):
        if isinstance(other, Kernel):
            return KernelSum(self, other)
        return KernelShift(self, other)

    __iadd__ = __add__

    def __radd__(self, other):
        if isinstance(other, Kernel):
            return KernelSum(other, self)
        return KernelShift(self, other)

    def __str__(self):
        return f"{type(self).__name__}[m={self.metric},h={self.hypers}]"

    __repr__ = __str__


class KernelDot(Kernel):
    """var * metric-gram (dot-product family, reference kernels.py:83-95)."""

    def __init__(self, x=None, name=None, metric=ARD_Dot, var=None):
        super().__init__(x, name, metric, var)

    def cov(self, params, x1, x2=None):
        if x2 is None:
            x2 = x1
        return hval(self.var, params) * self.metric.gram(params, x1, x2)


class KernelStationary(Kernel):
    """var * k(metric-gram) (reference kernels.py:98-111)."""

    #: key into ops.pallas_gram._KFORMS when this family has a fused
    #: Pallas tile kernel (SE/MAT32/MAT52/RQ on ARD_L2)
    _pallas_kind = None

    def __init__(self, x=None, name=None, metric=ARD_L2, var=None):
        super().__init__(x, name, metric, var)

    def k(self, params, d):
        return d

    def _pallas_extra(self, params):
        return None

    def _pallas_dispatchable(self):
        """Fused-gram dispatch is valid only when this instance still uses
        the family's own k() — a subclass overriding k must get the generic
        path, not the builtin form baked into the Pallas kernel."""
        kind = self._pallas_kind
        if kind is None or type(self.metric) is not ARD_L2 \
                or not is_param(self.metric.rate):
            return None
        owner_k = _PALLAS_K_OWNERS.get(kind)
        if owner_k is None or type(self).k is not owner_k:
            return None
        return kind

    def cov(self, params, x1, x2=None):
        if x2 is None:
            x2 = x1
        kind = self._pallas_dispatchable()
        if kind is not None:
            from ..ops.pallas_gram import pallas_gram_enabled, stationary_gram

            if not pallas_gram_enabled(kind):
                return hval(self.var, params) * self.k(
                    params, self.metric.gram(params, x1, x2))
            s1, s2 = self.metric._sliced(x1, x2)
            out = stationary_gram(
                kind, s1, s2, hval(self.metric.rate, params),
                hval(self.var, params), extra=self._pallas_extra(params))
            if out is not None:
                return out
        return hval(self.var, params) * self.k(params, self.metric.gram(params, x1, x2))


# ---------------------------------------------------------------------------
# composites
# ---------------------------------------------------------------------------


class KernelOperation(Kernel):
    """kernel (op) scalar element (reference kernels.py:114-141)."""

    def __init__(self, _k, _element):
        self.k_inner = _k
        self.element = _element
        self.hypers = []
        self.potential = None
        self.op = "op"

    def check_hypers(self, parent=""):
        self.k_inner.check_hypers(parent=parent)
        self.hypers = list(self.k_inner.hypers)

    def check_dims(self, x=None):
        self.k_inner.check_dims(x)

    def default_hypers_dims(self, x=None, y=None):
        return self.k_inner.default_hypers_dims(x, y)

    def potential_logp(self, params):
        own = super().potential_logp(params)
        inner = self.k_inner.potential_logp(params)
        if own is None:
            return inner
        if inner is None:
            return own
        return own + inner

    def input_sensitivity(self, params):
        return self.k_inner.input_sensitivity(params)

    def has_potential(self):
        return (getattr(self, "potential", None) is not None
                or self.k_inner.has_potential())

    @property
    def name(self):
        return f"{self.element} {self.op} {self.k_inner.name}"

    def __str__(self):
        return f"{self.element} {self.op} {self.k_inner}"

    __repr__ = __str__


class KernelComposition(Kernel):
    """kernel (op) kernel (reference kernels.py:144-190)."""

    def __init__(self, _k1, _k2):
        self.k1 = _k1
        self.k2 = _k2
        self.hypers = []
        self.potential = None
        self.op = "op"

    def check_hypers(self, parent=""):
        self.k1.check_hypers(parent=parent)
        self.k2.check_hypers(parent=parent)
        self.hypers = list(self.k1.hypers) + list(self.k2.hypers)

    def check_dims(self, x=None):
        self.k1.check_dims(x)
        self.k2.check_dims(x)

    def default_hypers_dims(self, x=None, y=None):
        return {
            **self.k1.default_hypers_dims(x, y),
            **self.k2.default_hypers_dims(x, y),
        }

    def potential_logp(self, params):
        parts = [
            p
            for p in (
                super().potential_logp(params),
                self.k1.potential_logp(params),
                self.k2.potential_logp(params),
            )
            if p is not None
        ]
        if not parts:
            return None
        total = parts[0]
        for p in parts[1:]:
            total = total + p
        return total

    def input_sensitivity(self, params):
        return self.k1.input_sensitivity(params) + self.k2.input_sensitivity(params)

    def has_potential(self):
        return (getattr(self, "potential", None) is not None
                or self.k1.has_potential() or self.k2.has_potential())

    @property
    def name(self):
        return f"{self.k1.name} {self.op} {self.k2.name}"

    def __str__(self):
        return f"{self.k1} {self.op} {self.k2}"

    __repr__ = __str__


class KernelScale(KernelOperation):
    def __init__(self, _k, _element):
        super().__init__(_k, _element)
        self.op = "*"

    def cov(self, params, x1, x2=None):
        return hval(self.element, params) * self.k_inner.cov(params, x1, x2)


class KernelShift(KernelOperation):
    def __init__(self, _k, _element):
        super().__init__(_k, _element)
        self.op = "+"

    def cov(self, params, x1, x2=None):
        return hval(self.element, params) + self.k_inner.cov(params, x1, x2)


class KernelProd(KernelComposition):
    def __init__(self, _k1, _k2):
        super().__init__(_k1, _k2)
        # if neither side carries an amplitude the product would double-count
        # one: pin k2's to 1 (reference kernels.py:207-210)
        if hasattr(self.k1, "var") and hasattr(self.k2, "var"):
            if self.k1.var is None and self.k2.var is None:
                self.k2.var = 1.0
        self.op = "*"

    def cov(self, params, x1, x2=None):
        return self.k1.cov(params, x1, x2) * self.k2.cov(params, x1, x2)


class KernelSum(KernelComposition):
    def __init__(self, _k1, _k2):
        super().__init__(_k1, _k2)
        self.op = "+"

    def cov(self, params, x1, x2=None):
        return self.k1.cov(params, x1, x2) + self.k2.cov(params, x1, x2)


class KernelMax(KernelComposition):
    def __init__(self, _k1, _k2):
        super().__init__(_k1, _k2)
        self.op = "max"

    def cov(self, params, x1, x2=None):
        return jnp.maximum(self.k1.cov(params, x1, x2), self.k2.cov(params, x1, x2))


# ---------------------------------------------------------------------------
# index kernels (multi-output / coregionalization)
# ---------------------------------------------------------------------------


class KernelEquals(Kernel):
    """Indicator kernel on an index column (reference kernels.py:262-275)."""

    def __init__(self, x=None, name=None, metric=DeltaEq, eq=0):
        super().__init__(x, name, metric, 1.0)
        self.eq = eq

    def cov(self, params, x1, x2=None):
        if x2 is None:
            x2 = x1
        return self.metric.gram(params, x1, x2, self.eq)


class KernelEquals2(Kernel):
    """Symmetric two-index indicator (reference kernels.py:278-290)."""

    def __init__(self, x=None, name=None, metric=DeltaEq2, eq1=0, eq2=0):
        super().__init__(x, name, metric, 1.0)
        self.eq1 = eq1
        self.eq2 = eq2

    def cov(self, params, x1, x2=None):
        if x2 is None:
            x2 = x1
        return self.metric.gram(params, x1, x2, self.eq1, self.eq2)


# ---------------------------------------------------------------------------
# dot-kernel zoo
# ---------------------------------------------------------------------------


class BW(KernelDot):
    """Brownian motion: var * prod_d min(x1, x2) (reference kernels.py:293-295)."""

    def __init__(self, x=None, name=None, metric=Minimum, var=None):
        super().__init__(x, name, metric, var)


class VAR(KernelDot):
    """Constant covariance var (reference kernels.py:298-308)."""

    def __init__(self, x=None, name=None, metric=One, var=None):
        super().__init__(x, name, metric, var)

    def cov(self, params, x1, x2=None):
        if x2 is None:
            x2 = x1
        return hval(self.var, params) * jnp.ones(
            (jnp.shape(x1)[0], jnp.shape(x2)[0]), dtype=settings.floatx
        )


class NIL(KernelDot):
    """Zero kernel (reference kernels.py:311-321)."""

    def __init__(self, x=None, name=None, metric=One, var=1):
        super().__init__(x, name, metric, var)

    def cov(self, params, x1, x2=None):
        if x2 is None:
            x2 = x1
        return jnp.zeros((jnp.shape(x1)[0], jnp.shape(x2)[0]), dtype=settings.floatx)


class LIN(KernelDot):
    """Linear kernel: biased dot product (reference kernels.py:324-326)."""

    def __init__(self, x=None, name=None, metric=ARD_DotBias, var=1):
        super().__init__(x, name, metric, var)


class POL(KernelDot):
    """Polynomial kernel: (biased dot)^p (reference kernels.py:329-341)."""

    def __init__(self, x=None, p=2, name=None, metric=ARD_DotBias, var=1):
        super().__init__(x, name, metric, var)
        self.p = p

    def cov(self, params, x1, x2=None):
        if x2 is None:
            x2 = x1
        return hval(self.var, params) * self.metric.gram(params, x1, x2) ** self.p


class NN(KernelDot):
    """Arcsine neural-network kernel (Williams 1998).  Uses per-point
    diagonal normalizers (see module docstring re the reference's shape bug,
    kernels.py:344-357)."""

    def __init__(self, x=None, name=None, metric=ARD_DotBias, var=None):
        super().__init__(x, name, metric, var)

    def _diag_gram(self, params, x):
        # g(x_i, x_i) for each row: bias + sum_d x_d^2 rate_d^2
        s = slice_dims(x, self.metric.dims)
        r = hval(self.metric.rate, params)
        b = hval(self.metric.bias, params)
        return b + jnp.sum((s * r) ** 2, axis=-1)

    def cov(self, params, x1, x2=None):
        same = x2 is None
        if same:
            x2 = x1
        g12 = self.metric.gram(params, x1, x2)
        d1 = self._diag_gram(params, x1)
        d2 = d1 if same else self._diag_gram(params, x2)
        denom = jnp.sqrt((1.0 + 2.0 * d1)[:, None] * (1.0 + 2.0 * d2)[None, :])
        arg = jnp.clip(2.0 * g12 / denom, -1.0, 1.0)
        return hval(self.var, params) * jnp.arcsin(arg)


# ---------------------------------------------------------------------------
# stationary zoo
# ---------------------------------------------------------------------------


class KernelNoise(KernelStationary):
    """Observation noise: var * I on a square cov, exactly 0 on cross-covs
    (reference kernels.py:360-371) — the prior/posterior noise split hinges
    on this asymmetry."""

    def __init__(self, x=None, name=None, metric=Delta, var=None):
        super().__init__(x, name, metric, var)

    def cov(self, params, x1, x2=None):
        if x2 is None:
            return hval(self.var, params) * jnp.eye(
                jnp.shape(x1)[0], dtype=settings.floatx
            )
        return jnp.zeros((jnp.shape(x1)[0], jnp.shape(x2)[0]), dtype=settings.floatx)


class WN(KernelStationary):
    """White noise: var * I on square, var * delta-match on cross
    (reference kernels.py:374-385)."""

    def __init__(self, x=None, name=None, metric=Delta, var=None):
        super().__init__(x, name, metric, var)

    def cov(self, params, x1, x2=None):
        if x2 is None:
            return hval(self.var, params) * jnp.eye(
                jnp.shape(x1)[0], dtype=settings.floatx
            )
        return hval(self.var, params) * self.metric.gram(params, x1, x2)


class RQ(KernelStationary):
    """Rational quadratic: (1 + d/alpha)^-alpha (reference kernels.py:388-403)."""

    _pallas_kind = "rq"

    def _pallas_extra(self, params):
        return hval(self.alpha, params)

    def __init__(self, x=None, name=None, metric=ARD_L2, var=None, alpha=None):
        super().__init__(x, name, metric, var)
        self.alpha = alpha

    def check_hypers(self, parent=""):
        super().check_hypers(parent=parent)
        self.alpha = self._param(self.alpha, parent + self.name + "_alpha", FlatExp())

    def default_hypers(self, x=None, y=None):
        out = super().default_hypers(x, y)
        if is_param(self.alpha):
            out[self.alpha] = np.asarray(1.0, dtype=settings.floatx)
        return out

    def k(self, params, d):
        a = hval(self.alpha, params)
        return jnp.power(1.0 + d / a, -a)


class MAT32(KernelStationary):
    """Matern 3/2 on the ARD_L2 metric (reference kernels.py:406-412).

    The sqrt argument is clamped away from zero: ``sqrt`` has an infinite
    derivative at 0, so the raw form NaNs the lengthscale gradient through
    the gram DIAGONAL (d = 0 exactly) and the NaN sanitizer then zeroes the
    whole gradient — Matern lengthscales were untrainable (the reference has
    the identical masked flaw).  The clamp leaves values bit-identical at
    f32 and makes the diagonal's gradient contribution exactly 0, which is
    the true derivative (the diagonal is constant in the lengthscale)."""

    _pallas_kind = "mat32"

    def k(self, params, d):
        d3 = jnp.sqrt(jnp.maximum(3.0 * d, 1e-36))
        return (1.0 + d3) * jnp.exp(-d3)


class MAT52(KernelStationary):
    """Matern 5/2 (reference kernels.py:415-421).  sqrt clamped away from
    zero for a finite lengthscale gradient — see MAT32."""

    _pallas_kind = "mat52"

    def k(self, params, d):
        d5 = jnp.sqrt(jnp.maximum(5.0 * d, 1e-36))
        return (1.0 + d5 + 5.0 * d / 3.0) * jnp.exp(-d5)


class KernelStationaryExponential(KernelStationary):
    """k(d) = exp(-d) (reference kernels.py:424-426)."""

    def k(self, params, d):
        return jnp.exp(-d)


class OU(KernelStationaryExponential):
    """Ornstein-Uhlenbeck: exp(-ARD_L1) (reference kernels.py:429-431)."""

    def __init__(self, x=None, name=None, metric=ARD_L1, var=None):
        super().__init__(x, name, metric, var)


class SE(KernelStationaryExponential):
    """Squared exponential: exp(-ARD_L2) (reference kernels.py:434-436)."""

    _pallas_kind = "se"

    def __init__(self, x=None, name=None, metric=ARD_L2, var=None):
        super().__init__(x, name, metric, var)


# ---------------------------------------------------------------------------
# periodic zoo — per-dimension frequency/rate, computed one feature slab at
# a time instead of an N x M x d Difference tensor
# ---------------------------------------------------------------------------


class KernelPeriodic(KernelStationary):
    """Base periodic kernel with per-dim freq/rate hypers
    (reference kernels.py:439-456)."""

    def __init__(self, x=None, name=None, metric=Difference, var=None, freq=None, rate=None):
        super().__init__(x, name, metric, var)
        self.freq = freq
        self.rate = rate

    def check_hypers(self, parent=""):
        super().check_hypers(parent=parent)
        self.freq = self._param(
            self.freq, parent + self.name + "_freq", FlatExp(), shape=self.shape
        )
        self.rate = self._param(
            self.rate, parent + self.name + "_rate", FlatExp(), shape=self.shape
        )

    def default_hypers(self, x=None, y=None):
        out = super().default_hypers(x, y)
        if is_param(self.freq):
            out[self.freq] = 1.0 / (x.max(axis=0) - x.min(axis=0))
        if is_param(self.rate):
            out[self.rate] = 1.0 / np.abs(np.diff(x, axis=0)).mean(axis=0)
        return out

    def _cols(self, x1, x2):
        return (
            slice_dims(x1, self.metric.dims),
            slice_dims(x2, self.metric.dims),
        )


class COS(KernelPeriodic):
    """prod_d cos(2 pi diff_d freq_d) (reference kernels.py:459-464)."""

    def __init__(self, x=None, name=None, metric=Difference, var=None, freq=None):
        super().__init__(x, name, metric, var, freq, rate=1.0)

    def cov(self, params, x1, x2=None):
        if x2 is None:
            x2 = x1
        s1, s2 = self._cols(x1, x2)
        f = hval(self.freq, params)
        prod = pairwise_prod(
            s1, s2, lambda a, b, fd: jnp.cos(2.0 * pi * (a - b) * fd), f
        )
        return hval(self.var, params) * prod


class SIN(KernelPeriodic):
    """Exp-sin^2 periodic kernel: exp(-2 sum_d sin^2(pi diff_d freq_d) rate_d)
    (PSD form; the reference's ``+2`` sign at kernels.py:467-469 is non-PSD)."""

    def cov(self, params, x1, x2=None):
        if x2 is None:
            x2 = x1
        s1, s2 = self._cols(x1, x2)
        f = hval(self.freq, params)
        r = hval(self.rate, params)
        ssum = pairwise_sum(
            s1, s2, lambda a, b, fd, rd: jnp.sin(pi * (a - b) * fd) ** 2 * rd, f, r
        )
        return hval(self.var, params) * jnp.exp(-2.0 * ssum)


class SINC(KernelPeriodic):
    """prod_d sinc(2 pi^2 diff_d freq_d) with the 0/0 point patched to 1
    (reference kernels.py:472-482)."""

    def __init__(self, x=None, name=None, metric=Difference, var=None, freq=None):
        super().__init__(x, name, metric, var, freq, rate=1.0)

    def cov(self, params, x1, x2=None):
        if x2 is None:
            x2 = x1
        s1, s2 = self._cols(x1, x2)
        f = hval(self.freq, params)

        def elem(a, b, fd):
            d = a - b
            arg = 2.0 * pi2 * d * fd
            safe = jnp.where(d != 0.0, arg, 1.0)
            return jnp.where(d != 0.0, jnp.sin(safe) / safe, 1.0)

        return hval(self.var, params) * pairwise_prod(s1, s2, elem, f)


class SM(KernelPeriodic):
    """Spectral-mixture component: gaussian envelope times cosine
    (reference kernels.py:485-487)."""

    def cov(self, params, x1, x2=None):
        if x2 is None:
            x2 = x1
        s1, s2 = self._cols(x1, x2)
        f = hval(self.freq, params)
        r = hval(self.rate, params)
        env = pairwise_sum(s1, s2, lambda a, b, rd: (a - b) ** 2 * rd**2, r)
        cosp = pairwise_prod(
            s1, s2, lambda a, b, fd: jnp.cos(2.0 * pi * (a - b) * fd), f
        )
        return hval(self.var, params) * jnp.exp(-2.0 * pi2 * env) * cosp


#: kind -> the k() implementation the Pallas kernel bakes in; dispatch only
#: fires when an instance's k is exactly this (see _pallas_dispatchable)
_PALLAS_K_OWNERS = {
    "se": KernelStationaryExponential.k,
    "mat32": MAT32.k,
    "mat52": MAT52.k,
    "rq": RQ.k,
}
