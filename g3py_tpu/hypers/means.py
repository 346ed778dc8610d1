"""Mean (location) functions with operator algebra.

TPU-native rebuild of ``/root/reference/g3py/processes/hypers/means.py``:
``Zero``, ``Bias``, ``Linear``, ``Power``, ``BlackBox`` plus ``+``/``*``
algebra, each a pure function ``(params, x) -> (N,)`` with the reference's
data-driven defaults.
"""

import numpy as np
import jax.numpy as jnp

from . import Hypers, Flat, hval, is_param, slice_dims
from ..config import settings

__all__ = [
    "Mean",
    "Location",
    "BlackBox",
    "MeanOperation",
    "MeanComposition",
    "MeanScale",
    "MeanShift",
    "MeanProd",
    "MeanSum",
    "Zero",
    "Bias",
    "Linear",
    "Power",
]


class Mean(Hypers):
    """Base mean; ``__call__(params, x)`` slices active dims then evals
    (reference means.py:7-27)."""

    def eval(self, params, x):
        raise NotImplementedError

    def __call__(self, params, x):
        return self.eval(params, slice_dims(x, self.dims))

    def __mul__(self, other):
        if isinstance(other, Mean):
            return MeanProd(self, other)
        return MeanScale(self, other)

    __imul__ = __mul__
    __rmul__ = __mul__

    def __add__(self, other):
        if isinstance(other, Mean):
            return MeanSum(self, other)
        return MeanShift(self, other)

    __iadd__ = __add__
    __radd__ = __add__


Location = Mean


class BlackBox(Mean):
    """Wraps an arbitrary fixed array (reference means.py:31-41)."""

    def __init__(self, element, x=None, name=None):
        super().__init__(x, name)
        self.element = element

    def __call__(self, params, x):
        e = jnp.asarray(self.element)
        return e[: jnp.shape(x)[0]]

    eval = __call__


class MeanOperation(Mean):
    def __init__(self, _m, _element):
        self.m = _m
        self.element = _element
        self.hypers = []
        self.potential = None

    def check_hypers(self, parent=""):
        self.m.check_hypers(parent=parent)
        self.hypers = list(self.m.hypers)

    def check_dims(self, x=None):
        self.m.check_dims(x)

    def default_hypers_dims(self, x=None, y=None):
        return self.m.default_hypers_dims(x, y)

    def potential_logp(self, params):
        return self.m.potential_logp(params)


class MeanComposition(Mean):
    def __init__(self, _m1, _m2):
        self.m1 = _m1
        self.m2 = _m2
        self.hypers = []
        self.potential = None

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


class MeanScale(MeanOperation):
    def __call__(self, params, x):
        return hval(self.element, params) * self.m(params, x)


class MeanShift(MeanOperation):
    def __call__(self, params, x):
        return hval(self.element, params) + self.m(params, x)


class MeanProd(MeanComposition):
    def __call__(self, params, x):
        return self.m1(params, x) * self.m2(params, x)


class MeanSum(MeanComposition):
    def __call__(self, params, x):
        return self.m1(params, x) + self.m2(params, x)


class Zero(Mean):
    """m(x) = 0 (reference means.py:113-115)."""

    def eval(self, params, x):
        return jnp.zeros((jnp.shape(x)[0],), dtype=settings.floatx)


class Bias(Mean):
    """Constant mean, default = mean(y) (reference means.py:118-133)."""

    def __init__(self, x=None, name=None, bias=None):
        super().__init__(x, name)
        self.bias = bias

    def check_hypers(self, parent=""):
        self.bias = self._param(self.bias, parent + self.name + "_Bias", Flat())

    def default_hypers(self, x=None, y=None):
        if not is_param(self.bias):
            return {}
        return {self.bias: np.asarray(np.mean(y), dtype=settings.floatx)}

    def eval(self, params, x):
        return hval(self.bias, params) * jnp.ones(
            (jnp.shape(x)[0],), dtype=settings.floatx
        )


class Linear(Mean):
    """constant + x @ coeff (reference means.py:136-155)."""

    def __init__(self, x=None, name=None, constant=None, coeff=None):
        super().__init__(x, name)
        self.constant = constant
        self.coeff = coeff

    def check_hypers(self, parent=""):
        self.constant = self._param(
            self.constant, parent + self.name + "_Constant", Flat()
        )
        self.coeff = self._param(
            self.coeff, parent + self.name + "_Coeff", Flat(), shape=self.shape
        )

    def default_hypers(self, x=None, y=None):
        out = {}
        if is_param(self.constant):
            out[self.constant] = np.asarray(np.mean(y), dtype=settings.floatx)
        if is_param(self.coeff):
            out[self.coeff] = np.mean(y) / np.mean(x, axis=0)
        return out

    def eval(self, params, x):
        return hval(self.constant, params) + jnp.dot(x, hval(self.coeff, params))


class Power(Mean):
    """constant + (x^n) @ coeff (reference means.py:158-180)."""

    def __init__(self, x=None, name=None, constant=None, coeff=None, n=2):
        super().__init__(x, name)
        self.constant = constant
        self.coeff = coeff
        self.n = n

    def check_hypers(self, parent=""):
        self.constant = self._param(
            self.constant, parent + self.name + "_Constant", Flat()
        )
        self.coeff = self._param(
            self.coeff, parent + self.name + "_Coeff", Flat(), shape=self.shape
        )

    def default_hypers(self, x=None, y=None):
        out = {}
        if is_param(self.constant):
            out[self.constant] = np.asarray(np.mean(y), dtype=settings.floatx)
        if is_param(self.coeff):
            out[self.coeff] = np.mean(y) / np.mean(np.asarray(x) ** self.n, axis=0)
        return out

    def eval(self, params, x):
        return hval(self.constant, params) + jnp.dot(
            x**self.n, hval(self.coeff, params)
        )
