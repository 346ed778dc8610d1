"""Robust dense linear algebra on top of XLA.

TPU-native rebuild of the reference's custom Theano ops
(``/root/reference/g3py/libs/tensors.py:174-270``):

* :func:`safe_cholesky` — the ``CholeskyRobust`` contract: never raise; try a
  clean factorization, repair a non-positive diagonal, escalate jitter
  ``mean(diag) * 1e-6 * 10**k`` for a bounded number of tries, and fall back
  to ``1e-10 * I`` on total failure.  The data-dependent Python retry loop of
  the reference becomes a fixed-bound ``lax.while_loop`` jitter *search*
  under ``stop_gradient`` followed by a single differentiable factorization,
  so XLA sees one static graph and gradients flow through
  ``cholesky(A + jitter*I)`` exactly (the Murray reverse-mode rule,
  arXiv:1602.07527, is what ``jnp.linalg.cholesky`` already implements).
* triangular solves (reference tensors.py:265-270) via
  ``jax.scipy.linalg.solve_triangular``.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import solve_triangular as _solve_triangular

__all__ = [
    "safe_cholesky",
    "solve_lower_triangular",
    "solve_upper_triangular",
    "cho_solve",
    "log_det_from_chol",
]


def _chol_ok(chol):
    # XLA cholesky signals failure with NaNs instead of raising.
    return jnp.all(jnp.isfinite(chol))


@partial(jax.jit, static_argnames=("max_tries",))
def safe_cholesky(a, max_tries=21):
    """Lower-triangular Cholesky that never fails.

    Mirrors ``CholeskyRobust._cholesky``/``perform``
    (reference tensors.py:197-222):

    try 0:   ``cholesky(a)``
    try k>0: ``cholesky(a + diag_fix + mean(diag)*1e-6*10**(k-1) * I)`` where
             ``diag_fix`` lifts a non-positive diagonal to ``mean(diag)*1e-6``
    failure: returns ``1e-10 * I`` (and a zero gradient), instead of raising.

    Returns the factor L with ``L @ L.T == a (+ jitter * I)``.
    """
    a = jnp.asarray(a)
    n = a.shape[-1]
    eye = jnp.eye(n, dtype=a.dtype)
    diag = jnp.diagonal(a)
    dmean = jnp.mean(diag)
    base = dmean * jnp.asarray(1e-6, a.dtype)
    # Reference fixes a non-positive diagonal once, before jitter escalation.
    diag_fix = jnp.where(jnp.min(diag) <= 0.0, base - jnp.min(diag), 0.0)

    def jitter_of(k):
        # k == 0 -> clean attempt; k >= 1 -> diag fix + escalating jitter.
        esc = base * jnp.power(jnp.asarray(10.0, a.dtype), (k - 1).astype(a.dtype))
        return jnp.where(k == 0, jnp.zeros((), a.dtype), diag_fix + esc)

    a_sg = lax.stop_gradient(a)

    def cond(state):
        k, ok = state
        return jnp.logical_and(~ok, k < max_tries)

    def body(state):
        k, _ = state
        chol = jnp.linalg.cholesky(a_sg + jitter_of(k) * eye)
        return k + 1, _chol_ok(chol)

    # After the loop: k_end is one past the successful try (or max_tries+? on
    # failure-with-last-success). ok tells us whether the last attempt worked.
    k_end, ok = lax.while_loop(cond, body, (jnp.zeros((), jnp.int32), jnp.asarray(False)))
    k_good = k_end - 1
    failed = ~ok

    jitter = lax.stop_gradient(jitter_of(jnp.maximum(k_good, 0)))
    # On failure, factor the identity (clean gradients) and mask the output.
    a_use = jnp.where(failed, eye, a + jitter * eye)
    chol = jnp.linalg.cholesky(a_use)
    chol = jnp.where(jnp.isfinite(chol), chol, 0.0)
    return jnp.where(failed, jnp.asarray(1e-10, a.dtype) * eye, chol)


def solve_lower_triangular(chol, b):
    """L x = b (reference tensors.py:265-266)."""
    return _solve_triangular(chol, b, lower=True)


def solve_upper_triangular(u, b):
    """U x = b (reference tensors.py:267-268)."""
    return _solve_triangular(u, b, lower=False)


def cho_solve(chol, b):
    """(L L^T)^{-1} b from the lower factor."""
    y = _solve_triangular(chol, b, lower=True)
    return _solve_triangular(chol.T, y, lower=False)


def log_det_from_chol(chol):
    """log det(A) = 2 * sum(log diag L)."""
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
