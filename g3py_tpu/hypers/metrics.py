"""Pairwise metrics — the O(N^2 d) hot tensors.

TPU-native rebuild of the reference metric zoo
(``/root/reference/g3py/processes/hypers/metrics.py``).  The reference
materialized an N x M x d broadcast for every gram
(``Metric.gram``, metrics.py:11-15); here each metric computes its (N, M)
matrix directly — MXU matmul decompositions where the algebra allows
(ARD_L2 / ARD_Dot / PSD), per-feature VPU slabs otherwise
(:func:`g3py_tpu.ops.gram.pairwise_sum`).

Every class keeps the reference's name, hyper set, data-driven
``default_hypers`` heuristic, and ``input_sensitivity``.
"""

import numpy as np
import jax.numpy as jnp

from . import Hypers, Param, FlatExp, hval, is_param, slice_dims, ones
from ..config import settings
from ..ops.gram import (
    weighted_sqdist,
    weighted_dot,
    pairwise_sum,
    pairwise_prod,
)

__all__ = [
    "Metric",
    "One",
    "Delta",
    "DeltaEq",
    "DeltaEq2",
    "Minimum",
    "Difference",
    "L1",
    "L2",
    "ARD",
    "ARD_L1",
    "ARD_L2",
    "ARD_Dot",
    "ARD_DotBias",
    "PSD",
    "PSD_Dot",
    "PSD_L2",
]


def _abs_grad_safe(a, b):
    """|a - b| with a pinned zero gradient at ties.

    d|x|/dx at x = 0 is implementation-defined: eager jax gives 0 but
    XLA:CPU's fused lowering gives +/-1, which flips e.g. the OU rate
    gradient through the gram DIAGONAL (a == b exactly) under jit.  The
    where keeps values identical while its VJP masks the tie positions to
    the constant branch's zero gradient — the true derivative, since tied
    entries don't move with the lengthscale.  (A single where suffices:
    abs has a finite subgradient everywhere, so the masked branch can't
    produce NaN; a kink with an INFINITE subgradient would need the full
    double-where pattern.)"""
    tie = a == b
    return jnp.where(tie, 0.0, jnp.abs(a - b))


class Metric(Hypers):
    """Base pairwise metric.  ``gram(params, x1, x2)`` returns the (N, M)
    matrix over the metric's active dims."""

    def gram(self, params, x1, x2):
        raise NotImplementedError

    def _sliced(self, x1, x2):
        return slice_dims(x1, self.dims), slice_dims(x2, self.dims)

    def input_sensitivity(self, params):
        return jnp.ones(self.shape if self.shape else 1, dtype=settings.floatx)

    def __str__(self):
        return f"{type(self).__name__}[h={self.hypers}]"

    __repr__ = __str__


class One(Metric):
    """Constant 1 (reference metrics.py:26-28)."""

    def gram(self, params, x1, x2):
        return jnp.ones((jnp.shape(x1)[0], jnp.shape(x2)[0]), dtype=settings.floatx)


class Delta(Metric):
    """Count of equal coordinates (reference metrics.py:31-36) — the
    index-match metric powering white-noise kernels."""

    def gram(self, params, x1, x2):
        s1, s2 = self._sliced(x1, x2)
        return pairwise_sum(s1, s2, lambda a, b: (a == b).astype(settings.floatx))


class DeltaEq(Metric):
    """Both-equal-to-``eq`` count (reference metrics.py:39-44), used by
    KernelEquals for multi-output coregionalization."""

    def gram(self, params, x1, x2, eq=0):
        s1, s2 = self._sliced(x1, x2)
        e = jnp.asarray(eq, settings.floatx)
        return pairwise_sum(
            s1, s2,
            lambda a, b: (a == e).astype(settings.floatx) * (b == e).astype(settings.floatx),
        )


class DeltaEq2(Metric):
    """Symmetric two-index match (reference metrics.py:47-52)."""

    def gram(self, params, x1, x2, eq1=0, eq2=0):
        s1, s2 = self._sliced(x1, x2)
        e1 = jnp.asarray(eq1, settings.floatx)
        e2 = jnp.asarray(eq2, settings.floatx)

        def elem(a, b):
            m1 = (a == e1).astype(settings.floatx) * (b == e2).astype(settings.floatx)
            m2 = (a == e2).astype(settings.floatx) * (b == e1).astype(settings.floatx)
            return m1 + m2

        return pairwise_sum(s1, s2, elem)


class Minimum(Metric):
    """prod_d min(x1_d, x2_d) — Brownian-motion covariance structure
    (reference metrics.py:55-57)."""

    def gram(self, params, x1, x2):
        s1, s2 = self._sliced(x1, x2)
        return pairwise_prod(s1, s2, jnp.minimum)


class Difference(Metric):
    """Signed per-dim difference.  Unlike the other metrics this is
    inherently (N, M, d); periodic kernels avoid materializing it by looping
    features (see kernels.KernelPeriodic), but the full tensor is kept
    available for API parity (reference metrics.py:60-62)."""

    def gram(self, params, x1, x2):
        s1, s2 = self._sliced(x1, x2)
        return s1[:, None, :] - s2[None, :, :]


class L1(Metric):
    """sum_d |x1_d - x2_d| (reference metrics.py:65-67; the reference's
    missing axis argument made it a full-tensor sum — rebuilt with the
    intended per-pair semantics)."""

    def gram(self, params, x1, x2):
        s1, s2 = self._sliced(x1, x2)
        return pairwise_sum(s1, s2, _abs_grad_safe)


class L2(Metric):
    """0.5 * sum_d (x1_d - x2_d)^2 (reference metrics.py:70-72)."""

    def gram(self, params, x1, x2):
        s1, s2 = self._sliced(x1, x2)
        return 0.5 * weighted_sqdist(s1, s2)


class ARD(Metric):
    """Base ARD metric: one positive ``rate`` per active dim
    (reference metrics.py:75-86)."""

    def __init__(self, x=None, name=None, rate=None):
        super().__init__(x, name)
        self.rate = rate

    def check_hypers(self, parent=""):
        self.rate = self._param(self.rate, parent + "rate", FlatExp(), shape=self.shape)

    def input_sensitivity(self, params):
        return ones(self.shape) * hval(self.rate, params) ** 2


class ARD_L1(ARD):
    """sum_d |x1_d - x2_d| * rate_d (reference metrics.py:89-97).
    rate > 0 (FlatExp), so the weight folds into the inputs:
    |a - b| r = |a r - b r|."""

    def gram(self, params, x1, x2):
        s1, s2 = self._sliced(x1, x2)
        r = hval(self.rate, params)
        return pairwise_sum(s1 * r, s2 * r, _abs_grad_safe)

    def default_hypers(self, x=None, y=None):
        if not is_param(self.rate):
            return {}
        spacing = np.maximum(np.abs(np.diff(x, axis=0)).mean(axis=0), 1e-6)
        return {self.rate: 1.0 / spacing}

    def input_sensitivity(self, params):
        return ones(self.shape) * hval(self.rate, params)


class ARD_L2(ARD):
    """sum_d (x1_d - x2_d)^2 * 0.5 rate_d^2 — THE hot metric (SE/Matern/RQ
    all sit on it).  One MXU matmul via the norm decomposition
    (reference metrics.py:100-108)."""

    def gram(self, params, x1, x2):
        s1, s2 = self._sliced(x1, x2)
        r = hval(self.rate, params)
        return 0.5 * weighted_sqdist(s1, s2, r)

    def default_hypers(self, x=None, y=None):
        if not is_param(self.rate):
            return {}
        try:
            # clip zero spacing (constant input columns) so the default stays
            # finite instead of tripping the logp guards
            spacing = np.maximum(np.abs(np.diff(x, axis=0)).mean(axis=0), 1e-6)
            return {self.rate: 0.5 / spacing}
        except Exception:
            return {}


class ARD_Dot(ARD):
    """sum_d x1_d x2_d rate_d^2 (reference metrics.py:111-116)."""

    def gram(self, params, x1, x2):
        s1, s2 = self._sliced(x1, x2)
        r = hval(self.rate, params)
        return weighted_dot(s1 * r, s2 * r)

    def default_hypers(self, x=None, y=None):
        if not is_param(self.rate):
            return {}
        return {
            self.rate: 1.0 / (np.sqrt(np.abs(x)).mean(axis=0) / np.abs(y).mean(axis=0))
        }


class ARD_DotBias(ARD_Dot):
    """bias + ARD_Dot (reference metrics.py:119-139)."""

    def __init__(self, x=None, name=None, rate=None, bias=None):
        super().__init__(x, name, rate)
        self.bias = bias

    def check_hypers(self, parent=""):
        super().check_hypers(parent)
        self.bias = self._param(self.bias, parent + "bias", FlatExp())

    def gram(self, params, x1, x2):
        return hval(self.bias, params) + super().gram(params, x1, x2)

    def default_hypers(self, x=None, y=None):
        out = {}
        if is_param(self.bias):
            out[self.bias] = np.abs(y).mean() / np.abs(x).mean()
        if is_param(self.rate):
            out[self.rate] = np.sqrt(np.abs(y)).mean(axis=0) / np.abs(x).mean(axis=0)
        return out


class PSD(Metric):
    """Full low-rank-plus-diagonal Mahalanobis structure
    M = directions^T directions + diag(rate^2)
    (reference metrics.py:142-156)."""

    def __init__(self, x=None, p=1, name=None, rate=None, directions=None):
        super().__init__(x, name)
        self.rate = rate
        self.directions = directions
        self.p = p

    def check_hypers(self, parent=""):
        self.rate = self._param(self.rate, parent + "rate", FlatExp(), shape=self.shape)
        self.directions = self._param(
            self.directions, parent + "directions", FlatExp(), shape=(self.p, self.shape)
        )

    def _m(self, params):
        d = hval(self.directions, params)
        r = hval(self.rate, params)
        return jnp.matmul(
            d.T, d, precision=settings.matmul_precision
        ) + jnp.diag(r**2)

    def default_hypers(self, x=None, y=None):
        out = {}
        if is_param(self.rate):
            out[self.rate] = 1.0 / (
                np.sqrt(np.abs(x)).mean(axis=0) / np.abs(y).mean(axis=0)
            )
        if is_param(self.directions):
            out[self.directions] = np.zeros(self.directions.shape, dtype=settings.floatx)
        return out


class PSD_Dot(PSD):
    """x1 M x2^T (reference metrics.py:159-165)."""

    def gram(self, params, x1, x2):
        s1, s2 = self._sliced(x1, x2)
        m = self._m(params)
        s1m = jnp.matmul(s1, m, precision=settings.matmul_precision)
        return jnp.matmul(s1m, s2.T, precision=settings.matmul_precision)


class PSD_L2(PSD):
    """0.5 (x1-x2)^T M (x1-x2) via the bilinear decomposition
    q11_i + q22_j - 2 x1 M x2^T (the reference's PSD_L2, metrics.py:167-176,
    returned a shape-inconsistent ``dot(M, d)``; this is the intended
    Mahalanobis quadratic form)."""

    def gram(self, params, x1, x2):
        s1, s2 = self._sliced(x1, x2)
        m = self._m(params)
        s1m = jnp.matmul(s1, m, precision=settings.matmul_precision)
        s2m = jnp.matmul(s2, m, precision=settings.matmul_precision)
        q11 = jnp.sum(s1m * s1, axis=-1)
        q22 = jnp.sum(s2m * s2, axis=-1)
        cross = jnp.matmul(s1m, s2.T, precision=settings.matmul_precision)
        return 0.5 * jnp.maximum(q11[:, None] + q22[None, :] - 2.0 * cross, 0.0)
