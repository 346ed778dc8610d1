"""Numeric function inversion with implicit differentiation.

The reference inverts a warping's ``inv`` by symbolic Newton iteration under
``theano.scan`` with an early-stop (``inverse_function``,
``/root/reference/g3py/libs/tensors.py:136-145``), differentiating *through*
the scan.  Under XLA a reverse-differentiable unbounded loop is not
available, so this build uses ``lax.custom_root``: a bounded Newton solve in
the forward pass and exact gradients via the implicit function theorem
(dx/dz = 1/f'(x)), which is both cheaper and more accurate than
differentiating through iterations.
"""

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["newton_inverse"]


def newton_inverse(func, z, tol=1e-6, max_steps=256, alpha=1.0, x0=None):
    """Solve ``func(x) = z`` elementwise for x.

    ``func`` must act elementwise (every warping in the mapping zoo does), so
    its Jacobian is diagonal and the implicit tangent solve reduces to a
    division.  Mirrors the reference's damped-Newton recipe
    (tensors.py:137-145): derivative magnitudes below 1 are snapped to their
    sign, iteration starts at 0, and stops at ``tol`` or ``max_steps``.
    """
    z = jnp.asarray(z)

    def g(x):
        return func(x) - z

    def solve(g_, x_init):
        def step(x):
            diff = g_(x)
            dfun = jax.grad(lambda v: jnp.sum(g_(v)))(x)
            sgn = jnp.where(dfun == 0, 1.0, jnp.sign(dfun))
            dfun = jnp.where(jnp.abs(dfun) < 1.0, sgn, dfun)
            return x - alpha * diff / dfun, jnp.max(jnp.abs(diff))

        def body(state):
            x, _, i = state
            x_new, err = step(x)
            return x_new, err, i + 1

        def cond(state):
            _, err, i = state
            return jnp.logical_and(err > tol, i < max_steps)

        x_final, _, _ = lax.while_loop(cond, body, (x_init, jnp.asarray(jnp.inf, z.dtype), 0))
        return x_final

    def tangent_solve(g_lin, y):
        # Elementwise map => diagonal Jacobian; g_lin(ones) extracts it.
        return y / g_lin(jnp.ones_like(y))

    start = jnp.zeros_like(z) if x0 is None else jnp.broadcast_to(x0, z.shape).astype(z.dtype)
    return lax.custom_root(g, start, solve, tangent_solve)
