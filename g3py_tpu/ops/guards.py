"""Numeric sanitizer guards.

TPU-native equivalents of the reference Theano guards
(``/root/reference/g3py/libs/tensors.py:86-108``): NaN/Inf replacement,
positive-semidefinite diagonal repair, and clipping.  All are pure jnp
functions safe under jit/grad.
"""

import jax.numpy as jnp

__all__ = ["to_num", "inf_to_num", "to_cov", "to_bounded"]

_BIG = 1e10


def to_num(x, nan=0.0, posinf=_BIG, neginf=-_BIG):
    """NaN -> 0, Inf -> +-1e10 (reference ``tt_to_num`` tensors.py:86-92)."""
    return jnp.nan_to_num(x, nan=nan, posinf=posinf, neginf=neginf)


def inf_to_num(x, posinf=_BIG, neginf=-_BIG):
    """Inf -> +-1e10 leaving NaN alone (reference ``inf_to_num`` :95-98)."""
    x = jnp.where(jnp.isposinf(x), posinf, x)
    return jnp.where(jnp.isneginf(x), neginf, x)


def to_cov(x, jitter=1e-6):
    """Repair a covariance candidate: sanitize NaN/Inf and, when any
    diagonal entry is <= 0, add ``(jitter - min(diag)) * I``
    (reference ``tt_to_cov`` tensors.py:100-104)."""
    x = to_num(x)
    d = jnp.diagonal(x)
    dmin = jnp.min(d)
    bump = jnp.where(dmin <= 0.0, jitter - dmin, 0.0)
    return x + bump * jnp.eye(x.shape[-1], dtype=x.dtype)


def to_bounded(x, lower=None, upper=None):
    """Clip (reference ``tt_to_bounded`` tensors.py:106-108)."""
    return jnp.clip(x, lower, upper)
