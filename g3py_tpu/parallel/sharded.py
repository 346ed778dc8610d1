"""Sharded computation wrappers.

Data-parallel NLL: shard the N training rows across the mesh; the
O(N^2 d) gram and the O(N^2) solves partition across devices (XLA inserts
the ICI collectives); the O(N^3) Cholesky is gathered on current XLA (a
block-cyclic Pallas factorization is the planned upgrade for the N=50k
stretch configuration — see SURVEY.md section 5 "long-context").
"""

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import make_mesh, data_sharding

__all__ = ["sharded_logp_fn", "sharded_ensemble_step"]


def sharded_logp_fn(process, mesh=None, axis="dp"):
    """jit a process's posterior array-logp with data arrays sharded over
    the mesh's data axis.  Returns ``(fn, place)`` where ``place(x)`` puts a
    data matrix in the sharded layout and ``fn(u, space, inputs, outputs)``
    is the compiled sharded logp of the unconstrained parameter vector."""
    if mesh is None:
        mesh = make_mesh(axis_names=(axis,))
    reg = process.active
    pure = process._logp_pure(prior=False)
    dshard = data_sharding(mesh, axis=axis, rank=2)
    vshard = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    @jax.jit
    def fn(u, space, inputs, outputs):
        params = reg.array_to_dict_jax(u)
        return pure(params, space, inputs, outputs,
                    jnp.zeros(0, dtype=u.dtype))

    def place(space, inputs, outputs):
        return (jax.device_put(jnp.asarray(space), dshard),
                jax.device_put(jnp.asarray(inputs), dshard),
                jax.device_put(jnp.asarray(outputs), vshard))

    return fn, place


def sharded_ensemble_step(logp, mesh=None, axis="chains"):
    """One jitted stretch-move round with the walker axis sharded over the
    mesh (chain parallelism over ICI instead of a process pool)."""
    from ..bayesian.samplers import _ensemble_step, _safe_logp
    from jax import random

    if mesh is None:
        mesh = make_mesh(axis_names=(axis,))
    wshard = NamedSharding(mesh, P(axis, None))
    logp_vm = jax.vmap(_safe_logp(logp))

    @jax.jit
    def step(key, x, lp):
        return _ensemble_step(key, x, lp, logp_vm, 2.0)

    def place(x):
        return jax.device_put(jnp.asarray(x), wshard)

    return step, place, logp_vm
