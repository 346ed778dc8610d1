"""Pairwise (gram) tensor builders.

The reference builds every N x M pairwise tensor by broadcasting an
N x M x d intermediate (``Metric.gram``,
``/root/reference/g3py/processes/hypers/metrics.py:11-15``) — the worst
memory offender in the library.  This module provides TPU-first
replacements:

* :func:`weighted_sqdist` — ARD-L2 distances via the norm decomposition
  ``|s1|^2 + |s2|^2 - 2 s1.s2`` with ``s = x * rate``: one MXU matmul, no
  d-axis blowup, clamped at zero against fp32 cancellation.
* :func:`weighted_dot` — ARD dot-product grams as a single matmul.
* :func:`pairwise_sum` / :func:`pairwise_prod` — d-axis reductions of an
  elementwise pair function computed one feature at a time (VPU work on
  N x M slabs), for metrics with no matmul decomposition (L1, delta,
  min, periodic differences).

A Pallas tiled path for the largest cases lives in
:mod:`g3py_tpu.ops.pallas_gram`; these XLA forms are the reference
implementations and the CPU/test path.
"""

import jax.numpy as jnp
from jax import lax

from ..config import settings

__all__ = [
    "weighted_sqdist",
    "weighted_dot",
    "pairwise_sum",
    "pairwise_prod",
    "sqdist",
]


def _as2d(x):
    x = jnp.asarray(x)
    if x.ndim == 1:
        x = x[:, None]
    return x


def _acc_dtype(dt):
    """Matmul accumulator type: f32 inputs accumulate in f32 (blocks bf16
    MXU passes); f64 inputs must accumulate in f64 — a hard-coded f32
    preferred type silently rounded the gram to f32 under
    ``settings.floatx='float64'`` (found by the f64 north-star job)."""
    return jnp.float64 if dt == jnp.dtype(jnp.float64) else jnp.float32


def weighted_sqdist(x1, x2, rate=None, exact=False):
    """sum_d (x1_d - x2_d)^2 * rate_d^2 as an (N, M) matrix.

    Fast path: ``|s1|^2 + |s2|^2 - 2 s1 s2^T`` with ``s = x * rate`` so the
    inner product rides the MXU.  Inputs are mean-centered first (distances
    are shift-invariant) which removes most fp32 cancellation; the result is
    clamped at 0.  ``exact=True`` instead reduces per-feature slabs — no
    cancellation at all (the reference's numerics, metrics.py:104-108,
    without its N x M x d intermediate) at the cost of d VPU passes.
    """
    x1, x2 = _as2d(x1), _as2d(x2)
    if rate is not None:
        rate = jnp.asarray(rate)
        s1 = x1 * rate
        s2 = x2 * rate
    else:
        s1, s2 = x1, x2
    if exact:
        return pairwise_sum(s1, s2, lambda a, b: (a - b) ** 2)
    center = lax.stop_gradient(0.5 * (jnp.mean(s1, axis=0) + jnp.mean(s2, axis=0)))
    s1 = s1 - center
    s2 = s2 - center
    n1 = jnp.sum(s1 * s1, axis=-1)
    n2 = jnp.sum(s2 * s2, axis=-1)
    cross = jnp.matmul(
        s1, s2.T, precision=settings.matmul_precision,
        preferred_element_type=_acc_dtype(s1.dtype),
    )
    d = n1[:, None] + n2[None, :] - 2.0 * cross.astype(s1.dtype)
    return jnp.maximum(d, 0.0)


def sqdist(x1, x2):
    """Unweighted squared euclidean distances."""
    return weighted_sqdist(x1, x2, None)


def weighted_dot(x1, x2, weight=None):
    """sum_d x1_d x2_d w_d as an (N, M) matmul (ARD_Dot, metrics.py:111-116)."""
    x1, x2 = _as2d(x1), _as2d(x2)
    if weight is not None:
        w = jnp.asarray(weight)
        x1 = x1 * w  # fold the weight into one operand; single matmul
    return jnp.matmul(
        x1, x2.T, precision=settings.matmul_precision,
        preferred_element_type=_acc_dtype(x1.dtype),
    ).astype(x1.dtype)


def _pairwise_reduce(x1, x2, elem_fn, combine, init, per_dim=()):
    """Reduce ``elem_fn(x1_d, x2_d, *w_d)`` over the feature axis keeping only
    an (N, M) slab alive per step — never materializes N x M x d.

    ``per_dim`` entries are length-d vectors (e.g. per-dimension frequencies)
    whose d-th element is handed to ``elem_fn`` alongside the d-th feature
    columns.
    """
    x1, x2 = _as2d(x1), _as2d(x2)
    n, m = x1.shape[0], x2.shape[0]
    d = x1.shape[1]
    if d == 0:
        return jnp.full((n, m), init, dtype=x1.dtype)
    per_dim = tuple(jnp.broadcast_to(jnp.asarray(w), (d,)) for w in per_dim)

    def body(carry, cols):
        c1, c2, *ws = cols
        return combine(carry, elem_fn(c1[:, None], c2[None, :], *ws)), None

    # scan over the (static) feature axis: one fused VPU slab per feature.
    # The carry init is derived FROM the inputs (zeros * columns) so it
    # inherits their varying-manual-axes tags — a plain jnp.full carry
    # fails lax.scan's carry-type check inside shard_map (the sharded
    # band-gram path for Delta/L1/periodic kernels hit exactly that).
    acc0 = (jnp.full((n, m), init, dtype=x1.dtype)
            + 0.0 * x1[:, :1] + 0.0 * x2[:, :1].T)
    acc, _ = lax.scan(body, acc0, (x1.T, x2.T) + per_dim)
    return acc


def pairwise_sum(x1, x2, elem_fn, *per_dim):
    """sum_d elem_fn(x1[:, d] broadcast against x2[:, d], *w_d) as (N, M)."""
    return _pairwise_reduce(x1, x2, elem_fn, lambda a, b: a + b, 0.0, per_dim)


def pairwise_prod(x1, x2, elem_fn, *per_dim):
    """prod_d elem_fn over features as (N, M)."""
    return _pairwise_reduce(x1, x2, elem_fn, lambda a, b: a * b, 1.0, per_dim)
