"""Reference-name compatibility aliases.

The reference flattens everything into its top-level namespace via star
imports (reference __init__.py:5-15), so migrating users reach for names
like ``g3.tt_to_num`` or ``g3.makefn``.  This module maps each public
reference name onto its rebuild equivalent; semantics documented per alias.
Legacy classes with no jax meaning (``EvalOp``, ``InverseFunction``,
``OldGraphicalModel``) are intentionally absent — see PARITY.md.
"""

import jax
import jax.numpy as jnp
import numpy as np

from .ops.guards import to_num, inf_to_num, to_cov, to_bounded
from .ops.linalg import safe_cholesky
from .ops.root import newton_inverse
from .utils.reference_io import natural_to_transformed

__all__ = [
    "tt_to_num",
    "inf_to_num",
    "tt_to_cov",
    "tt_to_bounded",
    "cholesky_robust",
    "CholeskyRobust",
    "inverse_function",
    "gradient",
    "gradient1",
    "makefn",
    "transformed_hypers",
    "modelcontext",
    "debug_p",
]

# reference libs/tensors.py guards — identical call shapes
tt_to_num = to_num
tt_to_cov = to_cov
tt_to_bounded = to_bounded

# reference CholeskyRobust op (tensors.py:169-241): jitter-escalating
# factorization with Murray's gradient — here a custom-VJP function rather
# than a theano Op, call it directly on a (n, n) PSD array
cholesky_robust = safe_cholesky
CholeskyRobust = safe_cholesky

# reference inverse_function (tensors.py:136-145): damped Newton by scan;
# here a bracketed bisection-Newton under lax.custom_root
inverse_function = newton_inverse


def gradient(fn, argnums=0):
    """Reference ``gradient(cost, wrt)`` built flat concatenated symbolic
    grads (tensors.py:118-126); functionally that is ``jax.grad``."""
    return jax.grad(fn, argnums=argnums)


def gradient1(fn, argnums=0):
    """Reference ``gradient1(f, v)``: flat gradient of a scalar w.r.t. one
    input (tensors.py:11-14).  Returns the raveled ``jax.grad``."""
    g = jax.grad(fn, argnums=argnums)

    def flat(*args, **kwargs):
        return jnp.ravel(g(*args, **kwargs))

    return flat


def makefn(fn, name="makefn"):
    """Reference ``makefn`` compiled a theano graph into a counted callable
    (tensors.py:35-74); the rebuild's equivalent is the jitting CompiledFn
    wrapper."""
    from .models.stochastic import CompiledFn

    return CompiledFn(fn, name)


def transformed_hypers(hypers):
    """Natural-space param dict -> transformed (sampling) names, e.g.
    ``{'GP_SE_var': v} -> {'GP_SE_var_log_': log v}`` (reference
    bayesian/models.py:46-53)."""
    return natural_to_transformed(hypers)


def modelcontext(model=None):
    """Reference ``modelcontext`` resolved the enclosing pymc3 model
    (hypers/__init__.py); here the class-level active GraphicalModel."""
    if model is not None:
        return model
    from .bayesian.registry import GraphicalModel

    return GraphicalModel.active


def debug_p(msg):
    """Reference's compile-time tracing print (elliptical.py debug_p):
    active when g3py_tpu.utils.debug.set_debug(True) is on."""
    from .utils import debug as _dbg

    if _dbg._DEBUG:
        print(msg)
