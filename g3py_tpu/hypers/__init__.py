"""Hyperparameter-bearing function layer.

TPU-native rebuild of the reference hypers layer
(``/root/reference/g3py/processes/hypers/__init__.py``).  The reference
registered PyMC3 random variables inside an ambient model context; here a
hyperparameter is a :class:`Param` *descriptor* — name, shape, and a
:class:`Prior` (an unconstrained<->natural transform plus a log-prior term).
Components collect Params into plain lists; the graphical-model registry
(:mod:`g3py_tpu.bayesian.registry`) owns the dict<->flat-array bijection and
the prior logp, all as pure jax functions.

Prior factories map one-to-one onto the reference's
(``hypers/__init__.py:111-142``):

=============  ======================  =========================================
reference      here                    semantics
=============  ======================  =========================================
``Flat``       :class:`Flat`           unbounded, flat density
``ExpFlat``    :class:`ExpFlat`        flat on value, sampled in log-space
                                       (log-Jacobian ``u`` enters the logp)
``FlatExp``    :class:`FlatExp`        flat *in log space* (the reference's
                                       ``NonTransformLog`` with ~zero Jacobian,
                                       hard wall below 1e-6)
``FlatPos``    :class:`FlatPos`        flat on (0, inf), natural-space sampling
``FlatExpId``  :class:`FlatExpId`      log below 1, identity-1 above
                                       (``LogIdTransform``)
``Exponential``:class:`Exponential`    rate-lam exponential, log-space sampling
``Uniform``    :class:`Uniform`        bounded uniform, logit-space sampling
=============  ======================  =========================================
"""

import numpy as np
import jax.numpy as jnp

from ..config import settings, asarray_x
from ..utils import DictObj

__all__ = [
    "Transform",
    "IdentityTransform",
    "LogTransform",
    "LogIdTransform",
    "IntervalTransform",
    "Prior",
    "Flat",
    "ExpFlat",
    "FlatExp",
    "FlatPos",
    "PositiveFlat",
    "NonTransformLog",
    "FlatExpId",
    "Exponential",
    "Uniform",
    "Null",
    "Param",
    "Hypers",
    "Freedom",
    "hval",
    "is_param",
    "zeros",
    "ones",
    "cvalues",
    "get_hypers_floatX",
]

GUARD = -1e30  # matches the reference's -1e30 NaN/Inf fallback


def zeros(shape):
    return np.zeros(shape, dtype=settings.floatx)


def ones(shape):
    return np.ones(shape, dtype=settings.floatx)


def cvalues(shape, val):
    return (np.ones(shape, dtype=settings.floatx) * val).astype(settings.floatx)


def get_hypers_floatX(params):
    out = DictObj()
    for k, v in params.items():
        out[k] = asarray_x(v)
    return out


# ---------------------------------------------------------------------------
# transforms: unconstrained u  <->  natural v
# ---------------------------------------------------------------------------


class Transform:
    name = "id"

    def backward(self, u):  # unconstrained -> natural (jnp, differentiable)
        return u

    def forward(self, v):  # natural -> unconstrained (host side ok)
        return v


class IdentityTransform(Transform):
    pass


class LogTransform(Transform):
    name = "log"

    def backward(self, u):
        return jnp.exp(u)

    def forward(self, v):
        return np.log(np.maximum(np.asarray(v, dtype=np.float64), 1e-38)).astype(
            settings.floatx
        )


class LogIdTransform(Transform):
    """log below 1, identity-1 above (reference hypers/__init__.py:185-192)."""

    name = "logid"

    def backward(self, u):
        return jnp.where(u < 0, jnp.exp(jnp.minimum(u, 0.0)), u + 1.0)

    def forward(self, v):
        v = np.asarray(v, dtype=np.float64)
        out = np.where(v < 1, np.log(np.maximum(v, 1e-38)), v - 1.0)
        return out.astype(settings.floatx)


class IntervalTransform(Transform):
    """(lower, upper) via logit, PyMC3-style interval transform."""

    name = "interval"

    def __init__(self, lower, upper):
        self.lower = float(lower)
        self.upper = float(upper)

    def backward(self, u):
        w = jnp.where(u > 0, 1.0 / (1.0 + jnp.exp(-u)), jnp.exp(u) / (1.0 + jnp.exp(u)))
        return self.lower + (self.upper - self.lower) * w

    def forward(self, v):
        v = np.asarray(v, dtype=np.float64)
        p = np.clip((v - self.lower) / (self.upper - self.lower), 1e-12, 1 - 1e-12)
        return np.log(p / (1 - p)).astype(settings.floatx)


# ---------------------------------------------------------------------------
# priors
# ---------------------------------------------------------------------------


class Prior:
    """Transform + log-prior contribution.

    ``logp(u)`` is the contribution in *unconstrained* space (density plus
    transform Jacobian — what a PyMC3 free RV's logp factor contributed in
    the reference); ``logp_natural(v)`` is the identical quantity expressed
    as a function of the natural-space value, so dict- and array-space logps
    agree: ``logp(u) == logp_natural(backward(u))``."""

    transform = IdentityTransform()

    def logp(self, u):
        """Total log-prior term (including transform Jacobian) as a scalar."""
        return jnp.zeros((), dtype=u.dtype)

    def logp_natural(self, v):
        return jnp.zeros((), dtype=v.dtype)

    def testval(self, shape):
        return zeros(shape)


class Flat(Prior):
    """Unbounded flat prior (reference ``Hypers.Flat``)."""


class Null(Flat):
    """No-density placeholder (reference ``Hypers.Null``)."""


class ExpFlat(Prior):
    """Flat on the value, sampled in log space with the standard PyMC3
    log-transform Jacobian ``+u`` (reference ``Hypers.ExpFlat``)."""

    transform = LogTransform()

    def logp(self, u):
        return jnp.sum(u)

    def logp_natural(self, v):
        return jnp.sum(jnp.log(v))

    def testval(self, shape):
        return ones(shape)


class FlatExp(Prior):
    """Flat *in log space*: the reference's ``NonTransformLog`` transform has
    (approximately) zero Jacobian determinant, i.e. the density is uniform on
    the unconstrained axis, with a hard wall when exp(u) <= 1e-6
    (reference hypers/__init__.py:195-202)."""

    transform = LogTransform()
    _wall = float(np.log(1e-6))

    def logp(self, u):
        bad = jnp.any(u <= self._wall)
        return jnp.where(bad, GUARD, 0.0)

    def logp_natural(self, v):
        return jnp.where(jnp.any(v <= 1e-6), GUARD, 0.0)

    def testval(self, shape):
        return ones(shape)


class FlatPos(Prior):
    """Flat on (0, inf) sampled in natural space (reference ``PositiveFlat``,
    hypers/__init__.py:163-182)."""

    def logp(self, u):
        return jnp.where(jnp.all(u > 0), 0.0, GUARD)

    logp_natural = logp

    def testval(self, shape):
        return ones(shape)


class FlatExpId(Prior):
    """Flat prior under the LogId transform; the Jacobian term is
    ``sum(min(u, 0))`` (d backward/du = e^u below 0, 1 above)."""

    transform = LogIdTransform()

    def logp(self, u):
        return jnp.sum(jnp.minimum(u, 0.0))

    def logp_natural(self, v):
        return jnp.sum(jnp.where(v < 1.0, jnp.log(jnp.maximum(v, 1e-38)), 0.0))

    def testval(self, shape):
        return ones(shape)


class Exponential(Prior):
    """Exponential(lam) prior, log-space sampling (reference
    ``Hypers.Exponential``): logp = sum(log lam - lam v + u)."""

    transform = LogTransform()

    def __init__(self, lam=1.0):
        self.lam = float(lam)

    def logp(self, u):
        v = jnp.exp(u)
        return jnp.sum(np.log(self.lam) - self.lam * v + u)

    def logp_natural(self, v):
        return jnp.sum(np.log(self.lam) - self.lam * v + jnp.log(v))

    def testval(self, shape):
        return ones(shape)


class Uniform(Prior):
    """Uniform(lower, upper), logit-space sampling (reference
    ``Hypers.Uniform``): logp = sum(-log(U-L) + log-Jacobian)."""

    def __init__(self, lower=0.0, upper=1.0):
        self.lower = float(lower)
        self.upper = float(upper)
        self.transform = IntervalTransform(lower, upper)

    def logp(self, u):
        # log|d backward/du| = log(U-L) + log sigmoid(u) + log sigmoid(-u)
        jac = (
            np.log(self.upper - self.lower)
            - jnp.logaddexp(0.0, -u)
            - jnp.logaddexp(0.0, u)
        )
        return jnp.sum(-np.log(self.upper - self.lower) + jac)

    def logp_natural(self, v):
        p = (v - self.lower) / (self.upper - self.lower)
        inside = jnp.all((p > 0) & (p < 1))
        jac = jnp.sum(jnp.log(jnp.clip(p, 1e-38, 1.0))
                      + jnp.log(jnp.clip(1 - p, 1e-38, 1.0))
                      + np.log(self.upper - self.lower))
        return jnp.where(inside, -v.size * np.log(self.upper - self.lower) + jac, GUARD)

    def testval(self, shape):
        mid = 0.5 * (self.lower + self.upper)
        return cvalues(shape, mid)


# ---------------------------------------------------------------------------
# Param
# ---------------------------------------------------------------------------


class Param:
    """A named hyperparameter slot: shape + prior.

    The runtime value lives in a params dict (natural space) keyed by
    ``self.name``; the unconstrained flat-array view is owned by the
    graphical-model registry."""

    __slots__ = ("name", "shape", "prior")

    def __init__(self, name, shape=(), prior=None):
        self.name = name
        if isinstance(shape, int):
            shape = (shape,)
        self.shape = tuple(shape)
        self.prior = prior if prior is not None else Flat()

    @property
    def size(self):
        return int(np.prod(self.shape)) if self.shape else 1

    def value(self, params):
        return params[self.name]

    def testval(self):
        return self.prior.testval(self.shape)

    def __repr__(self):
        return f"Param({self.name}, shape={self.shape}, prior={type(self.prior).__name__})"


def is_param(h):
    return isinstance(h, Param)


def hval(h, params):
    """Resolve a hyper attribute: Param -> its current value; anything else
    is a fixed constant."""
    if isinstance(h, Param):
        return jnp.asarray(params[h.name])
    return jnp.asarray(asarray_x(h))


# ---------------------------------------------------------------------------
# Hypers base
# ---------------------------------------------------------------------------


def slice_dims(x, dims):
    """Select a component's active input columns (reference sliced
    ``x[:, self.dims]`` in Metric.gram, metrics.py:13)."""
    x = jnp.asarray(x)
    if x.ndim == 1:
        x = x[:, None]
    if dims is None:
        return x
    if isinstance(dims, slice):
        return x[:, dims]
    return x[:, np.asarray(dims)]


class Hypers:
    """Base for every hyperparameter-bearing component (reference
    ``Hypers``, hypers/__init__.py:35-109): dims/shape inference from the
    inputs, hyper registration, data-driven defaults, L1/L2 regularization
    potentials."""

    def __init__(self, x=None, name=None):
        self.name = name if name is not None else type(self).__name__
        self.hypers = []
        self.shape = None
        self.dims = None
        self.potential = None
        if x is not None:
            self.check_dims(x)

    # -- dims ---------------------------------------------------------------
    def check_dims(self, x=None):
        """Infer input width / active dims (reference :53-84)."""
        if self.shape is not None:
            return
        if x is not None:
            if isinstance(x, list):
                self.dims = np.array(x)
                self.shape = self.dims.shape
            elif isinstance(x, tuple):
                domain, self.dims = x
                self.shape = domain.shape[1] if len(domain.shape) > 1 else 1
            elif hasattr(x, "shape"):
                self.shape = x.shape[1] if len(x.shape) > 1 else 1
                self.dims = slice(0, self.shape)
            else:  # an integer width
                self.shape = int(x)
                self.dims = slice(0, self.shape)
        else:
            self.shape = None
            self.dims = slice(None)

    # -- hyper registration ---------------------------------------------------
    def _param(self, current, name, prior, shape=()):
        """Create-or-pass-through one hyper slot.

        ``current`` may be: None (create with the component's default
        prior), a ``Param`` (pass through), a ``Prior`` instance (create
        the slot under the conventional name but with that prior — the
        ergonomic way to override a prior, e.g.
        ``GP(..., var_noise=Exponential(1.0))``, paralleling the
        reference's custom-RV hypers), or a fixed numeric constant."""
        if isinstance(current, Prior):
            current = Param(name, shape=shape, prior=current)
        elif current is None:
            current = Param(name, shape=shape, prior=prior)
        if isinstance(current, Param):
            self.hypers.append(current)
        return current

    def check_hypers(self, parent=""):
        pass

    # -- defaults -------------------------------------------------------------
    def default_hypers(self, x=None, y=None):
        return {}

    def default_hypers_dims(self, x=None, y=None):
        x = np.asarray(x)
        if x.ndim == 1:
            x = x[:, None]
        if self.dims is not None and not (
            isinstance(self.dims, slice) and self.dims == slice(None)
        ):
            x = x[:, self.dims]
        return {
            k: asarray_x(v) for k, v in self.default_hypers(x, y).items()
        }

    # -- potentials -----------------------------------------------------------
    def set_potential(self, hypers="", reg="L1", c=1):
        self.potential = (hypers, reg, c)

    def has_potential(self):
        """True when this component (or, for composites that override
        this, any nested part) declares a regularization potential — the
        registration predicate (`StochasticProcess._register_params`),
        which must see potentials buried inside kernel algebra like
        ``DeepKernel(...) + WN(x)``."""
        return getattr(self, "potential", None) is not None

    def potential_logp(self, params):
        """L1/L2 regularization potential over matching hypers (reference
        check_potential, hypers/__init__.py:94-109)."""
        if getattr(self, "potential", None) is None:
            return None
        substr, reg, c = self.potential
        terms = []
        for p in self.hypers:
            if p.name.find(substr) > 0:
                v = p.value(params)
                if reg == "L1":
                    terms.append(-jnp.sum(jnp.abs(v)))
                elif reg == "L2":
                    terms.append(-jnp.sum(v**2))
        if not terms:
            return None
        total = terms[0]
        for t in terms[1:]:
            total = total + t
        return c * total

    def __str__(self):
        if len(self.hypers) == 0:
            return type(self).__name__
        return f"{type(self).__name__}[h={self.hypers}]"

    __repr__ = __str__


class Freedom(Hypers):
    """Degrees-of-freedom hyper for Student-t processes: value =
    bound + degree, default degree = n_obs (reference
    hypers/__init__.py:144-160)."""

    def __init__(self, x=None, name=None, degree=None, bound=2.0):
        super().__init__(x, name)
        self.degree = degree
        self.bound = float(bound)

    def check_hypers(self, parent=""):
        self.degree = self._param(self.degree, parent + self.name + "_degree", FlatExp())

    def default_hypers(self, x=None, y=None):
        if is_param(self.degree):
            return {self.degree: np.asarray(len(y), dtype=settings.floatx)}
        return {}

    def __call__(self, params, x=None):
        return self.bound + hval(self.degree, params)


# reference-name aliases (reference hypers/__init__.py exports these names;
# the rebuild's canonical classes carry the semantics documented above)
PositiveFlat = FlatPos
NonTransformLog = LogTransform
