"""On-device L-BFGS MAP training.

The reference trained through scipy BFGS/Powell with one host->compiled-fn
round trip per line-search step (selection.py:14-42).  This module keeps
that path for parity but adds the TPU-native engine: optax L-BFGS with zoom
line search, the whole optimization a single jitted ``lax.while_loop``, and
**every start point optimized simultaneously** via vmap — multi-start MAP
becomes one device program instead of a sequential scipy loop.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..config import settings

__all__ = ["lbfgs_maximize"]


@partial(jax.jit, static_argnames=("logp_fn", "max_iters"))
def _lbfgs_run(logp_fn, starts, max_iters, tol):
    import optax

    def objective(x):
        v = -logp_fn(x)
        return jnp.where(jnp.isfinite(v), v, 1e30)

    opt = optax.lbfgs()
    vg = jax.value_and_grad(objective)

    def run_one(x0):
        state0 = opt.init(x0)
        v0, g0 = vg(x0)

        def cond(carry):
            _, _, _, g, it = carry
            return (it < max_iters) & (jnp.max(jnp.abs(g)) > tol)

        def body(carry):
            x, state, v, g, it = carry
            updates, state = opt.update(g, state, x, value=v, grad=g,
                                        value_fn=objective)
            x_new = optax.apply_updates(x, updates)
            v_new, g_new = vg(x_new)
            # reject non-finite steps (the scipy path's nan_to_high analogue)
            ok = jnp.isfinite(v_new) & jnp.all(jnp.isfinite(x_new))
            x_new = jnp.where(ok, x_new, x)
            v_new = jnp.where(ok, v_new, v)
            g_new = jnp.where(ok, g_new, jnp.zeros_like(g))
            return x_new, state, v_new, g_new, it + 1

        x, _, v, _, _ = lax.while_loop(cond, body, (x0, state0, v0, g0, 0))
        return x, -v

    return jax.vmap(run_one)(starts)


def lbfgs_maximize(logp_fn, starts, max_iters=200, tol=1e-5):
    """Maximize a traceable ``logp_fn`` from every row of ``starts`` at once.

    Returns (points (k, ndim), values (k,)) — all k starts optimized in one
    vmapped jitted program."""
    starts = jnp.asarray(np.atleast_2d(np.asarray(starts, settings.floatx)))
    points, values = _lbfgs_run(logp_fn, starts, max_iters, tol)
    return np.asarray(points), np.asarray(values)
