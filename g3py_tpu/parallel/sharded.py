"""Sharded computation wrappers.

Data-parallel NLL: shard the N training rows across the mesh; the
O(N^2 d) gram and the O(N^2) solves partition across devices (XLA inserts
the ICI collectives); the O(N^3) Cholesky is gathered on current XLA (a
block-cyclic Pallas factorization is the planned upgrade for the N=50k
stretch configuration — see SURVEY.md section 5 "long-context").
"""

import numpy as np
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


def pt_sampler_sharded(loglike, logprior, p0, samples, betas=None, mesh=None,
                       axis="temps", key=0, a=2.0):
    """Parallel tempering with the TEMPERATURE axis sharded over the device
    mesh — the SURVEY's ICI mapping for the reference's PTSampler
    (SURVEY.md section 2.7: "temperature axis as an extra vmapped/sharded
    dim; swap step = ppermute on ICI").

    One temperature per device; each round runs a stretch move at the local
    beta, then a deterministic even-odd (DEO) replica exchange with the
    neighboring temperature via ``lax.ppermute`` — the non-reversible swap
    scheme of Syed et al. (2019), which mixes faster than random pair
    swaps.  Both partners derive the accept decision from a shared
    ``fold_in(key, pair)`` stream, so no extra round trip is needed.

    Returns (chain (chains, samples, ndim), lnprob) at temperature 0.
    """
    from jax import random, shard_map
    from jax.sharding import PartitionSpec as P

    from ..bayesian.samplers import _ensemble_step, _safe_logp, default_beta_ladder

    if mesh is None:
        mesh = make_mesh(axis_names=(axis,))
    ntemps = mesh.shape[axis]
    if p0.shape[0] != ntemps:
        raise ValueError(f"p0 leading dim {p0.shape[0]} != mesh axis {ntemps}")
    if betas is None:
        betas = default_beta_ladder(ntemps)
    betas = jnp.asarray(np.asarray(betas), jnp.float32)
    if isinstance(key, int):
        key = random.PRNGKey(key)

    like_vm = jax.vmap(_safe_logp(loglike))
    prior_vm = jax.vmap(_safe_logp(logprior))

    def body(p_local, betas_all):
        # p_local: (1, chains, ndim) — this device's temperature
        x = p_local[0]
        me = jax.lax.axis_index(axis)
        beta = betas_all[me]
        like = like_vm(x)
        prior = prior_vm(x)

        def logp_at(beta_):
            return lambda y: beta_ * like_vm(y) + prior_vm(y)

        def step(carry, inp):
            x_, like_, prior_ = carry
            k, r = inp
            k_move, k_swap = random.split(random.fold_in(k, me))
            # local tempered stretch move
            lp = beta * like_ + prior_
            x_, _ = _ensemble_step(k_move, x_, lp, logp_at(beta), a)
            like_ = like_vm(x_)
            prior_ = prior_vm(x_)

            # DEO exchange: even rounds pair (0,1)(2,3)..., odd (1,2)(3,4)...
            parity = jnp.mod(r, 2)
            up = jnp.mod(me, 2) == parity  # I talk to me+1, else me-1
            partner = jnp.where(up, me + 1, me - 1)
            valid = (partner >= 0) & (partner < ntemps)

            # both directions permuted so each device sees its partner state
            fwd = [(i, (i + 1) % ntemps) for i in range(ntemps)]
            bwd = [(i, (i - 1) % ntemps) for i in range(ntemps)]
            x_up = jax.lax.ppermute(x_, axis, bwd)      # holds state of me+1
            x_dn = jax.lax.ppermute(x_, axis, fwd)      # holds state of me-1
            like_up = jax.lax.ppermute(like_, axis, bwd)
            like_dn = jax.lax.ppermute(like_, axis, fwd)
            prior_up = jax.lax.ppermute(prior_, axis, bwd)
            prior_dn = jax.lax.ppermute(prior_, axis, fwd)

            x_partner = jnp.where(up, x_up, x_dn)
            like_partner = jnp.where(up, like_up, like_dn)
            prior_partner = jnp.where(up, prior_up, prior_dn)
            beta_partner = betas_all[jnp.clip(partner, 0, ntemps - 1)]

            # both pair members derive the SAME accept stream: fold the
            # shared per-iteration key with the pair id
            pair = jnp.minimum(me, jnp.clip(partner, 0, ntemps - 1))
            k_pair = random.fold_in(k, pair)
            log_alpha = (beta - beta_partner) * (like_partner - like_)
            u = random.uniform(k_pair, like_.shape, dtype=x_.dtype)
            accept = (jnp.log(u) < log_alpha) & valid

            x_ = jnp.where(accept[:, None], x_partner, x_)
            like_ = jnp.where(accept, like_partner, like_)
            prior_ = jnp.where(accept, prior_partner, prior_)
            return (x_, like_, prior_), (x_, beta * like_ + prior_)

        keys = random.split(key, samples)
        rounds = jnp.arange(samples)
        (_, _, _), (chain, lnprob) = jax.lax.scan(step, (x, like, prior),
                                                  (keys, rounds))
        return chain[:, None]  # (samples, 1, chains, ndim) sharded on axis 1

    run = shard_map(body, mesh=mesh, in_specs=(P(axis, None, None), P()),
                    out_specs=P(None, axis, None, None))
    p0 = jnp.asarray(p0, jnp.float32)
    out = jax.jit(run)(p0, betas)
    # keep temperature 0 (reference kept lnprob[0], chain[0])
    chain0 = np.asarray(out[:, 0])  # (samples, chains, ndim)
    chain0 = np.transpose(chain0, (1, 0, 2))
    return chain0
