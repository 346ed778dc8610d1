"""On-device fan-out: train every (data split, start point) pair at once.

The reference's ``Experiment`` harness trained one model per simulation
split per start, sequentially, through a host scipy loop
(reference selection.py:183-235, 237-292), with each ``random_obs`` split
re-shaping the shared variables.  On TPU the whole grid becomes ONE
compiled program:

* splits are {0,1} inclusion masks over a fixed observation set —
  ``th_loglike_masked_fn`` makes the exact-GP loglike a pure function of
  the mask at one static shape (identity-row gram surgery, see
  models/gaussian.py);
* every (mask, start) pair runs optax L-BFGS simultaneously under one
  ``vmap`` (the same device-program trick as ``find_MAP(engine='jax')``).

For S splits x K starts this replaces S*K sequential scipy optimizations
(each a stream of O(n^3) host round-trips) with one jit whose batched
Cholesky factors S*K grams per L-BFGS iteration on the MXU.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..config import settings
from ..utils import DictObj

__all__ = ["lbfgs_fanout", "lbfgs_fanout_sharded", "fit_splits"]


@partial(jax.jit, static_argnames=("obj_fn", "max_iters"))
def lbfgs_fanout(obj_fn, starts, masks, max_iters, tol):
    """Maximize ``obj_fn(u, w)`` from every row of ``starts`` with the
    paired mask row of ``masks`` — all pairs vmapped into one program.

    Returns (points (P, ndim), values (P,))."""
    import optax

    opt = optax.lbfgs()

    def run_one(x0, w):
        def objective(x):
            v = -obj_fn(x, w)
            return jnp.where(jnp.isfinite(v), v, 1e30)

        vg = jax.value_and_grad(objective)
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
            ok = jnp.isfinite(v_new) & jnp.all(jnp.isfinite(x_new))
            x_new = jnp.where(ok, x_new, x)
            v_new = jnp.where(ok, v_new, v)
            g_new = jnp.where(ok, g_new, jnp.zeros_like(g))
            return x_new, state, v_new, g_new, it + 1

        x, _, v, _, _ = lax.while_loop(cond, body, (x0, state0, v0, g0, 0))
        return x, -v

    return jax.vmap(run_one)(starts, masks)


def lbfgs_fanout_sharded(obj_fn, starts, masks, max_iters=200, tol=1e-5,
                         mesh=None):
    """``lbfgs_fanout`` with the pair axis sharded over a device mesh —
    the TPU-native Experiment fan-out (SURVEY 2.7: independent
    simulations are embarrassingly parallel; here they partition over the
    mesh instead of over processes).  Pads the pair count to a multiple of
    the mesh size; each device optimizes its shard of (start, mask) pairs
    simultaneously under the same jitted program."""
    from ..parallel.mesh import make_mesh, data_sharding

    if mesh is None:
        mesh = make_mesh()
    ndev = int(np.prod(mesh.devices.shape))
    starts = np.asarray(starts, settings.floatx)
    masks = np.asarray(masks, settings.floatx)
    p = len(starts)
    pad = (-p) % ndev
    if pad:
        starts = np.concatenate([starts, np.repeat(starts[-1:], pad, 0)])
        masks = np.concatenate([masks, np.repeat(masks[-1:], pad, 0)])
    sh = data_sharding(mesh, rank=2)
    starts_d = jax.device_put(jnp.asarray(starts), sh)
    masks_d = jax.device_put(jnp.asarray(masks), sh)
    pts, vals = lbfgs_fanout(obj_fn, starts_d, masks_d, max_iters, tol)
    return np.asarray(pts)[:p], np.asarray(vals)[:p]


def fit_splits(process, masks, start=None, points=4, max_iters=200,
               tol=1e-5, noise_mult=0.2, seed=0, shard=False, mesh=None,
               return_points=False, pair_chunk=None):
    """MAP-train a GP-family process on every observation split at once.

    ``masks``: (S, n_obs) {0,1} inclusion rows over the process's current
    observed data (build them with ``utils.data.random_obs``-style index
    splitters).  ``points`` start vectors (the given/default start plus
    multiplicative perturbations, the reference's multi-start recipe,
    selection.py:195-212) are paired with every split; all S*points
    optimizations run as one device program.

    Returns ``(params_list, values)``: per-split best-start natural-space
    param dicts, and the (S, points) final posterior-logp matrix.

    ``shard=True`` partitions the (split, start) pair axis over a device
    mesh (``mesh`` or all devices) — each device trains its shard of the
    grid in parallel.  ``pair_chunk`` runs the grid in equal-shape
    sequential chunks (last chunk padded; one compile serves all) — use it
    to bound per-dispatch memory/wall-time on runtimes that struggle with
    very large fused programs (the hosted tunnel's worker crashed on a
    32-pair n=512 grid; 24 pairs ran fine — docs/performance.md).  Not
    supported with ``fix_vars`` (the masked objective spans the full
    unconstrained vector)."""
    reg = process.active
    if reg.fixed_datatrace is not None:
        raise ValueError("fit_splits does not support fix_vars")
    like = process.th_loglike_masked_fn()
    inputs = jnp.asarray(process._inputs)
    outputs = jnp.asarray(process._outputs)

    def obj(u, w):
        p = reg.array_to_dict_jax(u)
        return (reg.logp_prior_dict(p) + reg.logp_potentials(p)
                + like(p, inputs, outputs, w))

    if start is None:
        start = process.params_default
    base = (reg.dict_to_array(process.filter_params(start))
            if isinstance(start, dict) else np.asarray(start))
    base = np.asarray(base, settings.floatx)
    rng = np.random.default_rng(seed)
    starts = [base] + [
        base * (1 + noise_mult * rng.standard_normal(base.shape)
                ).astype(settings.floatx)
        for _ in range(points - 1)
    ]
    starts = np.stack(starts)                                   # (K, ndim)
    masks = np.asarray(masks, settings.floatx)
    if masks.ndim == 1:
        masks = masks[None, :]
    S, K = len(masks), len(starts)
    u0 = np.broadcast_to(starts[None], (S, K, base.size)).reshape(S * K, -1)
    wv = np.broadcast_to(masks[:, None, :], (S, K, masks.shape[1])
                         ).reshape(S * K, -1)
    u0 = np.ascontiguousarray(u0)
    wv = np.ascontiguousarray(wv)
    if pair_chunk is not None and len(u0) > pair_chunk:
        pts_parts, vals_parts = [], []
        for lo in range(0, len(u0), pair_chunk):
            uc = u0[lo:lo + pair_chunk]
            wc = wv[lo:lo + pair_chunk]
            pad = pair_chunk - len(uc)
            if pad:  # equal shapes -> the first chunk's compile is reused
                uc = np.concatenate([uc, np.repeat(uc[-1:], pad, 0)])
                wc = np.concatenate([wc, np.repeat(wc[-1:], pad, 0)])
            if shard:
                pc, vc = lbfgs_fanout_sharded(obj, uc, wc,
                                              max_iters=max_iters, tol=tol,
                                              mesh=mesh)
            else:
                pc, vc = lbfgs_fanout(obj, jnp.asarray(uc), jnp.asarray(wc),
                                      max_iters, tol)
            pts_parts.append(np.asarray(pc)[:pair_chunk - pad or None])
            vals_parts.append(np.asarray(vc)[:pair_chunk - pad or None])
        pts = np.concatenate(pts_parts)
        vals = np.concatenate(vals_parts)
    elif shard:
        pts, vals = lbfgs_fanout_sharded(obj, u0, wv, max_iters=max_iters,
                                         tol=tol, mesh=mesh)
    else:
        pts, vals = lbfgs_fanout(obj, jnp.asarray(u0), jnp.asarray(wv),
                                 max_iters, tol)
    vals = np.asarray(vals).reshape(S, K)
    pts = np.asarray(pts).reshape(S, K, -1)
    best = vals.argmax(axis=1)
    params_list = [DictObj(reg.array_to_dict(pts[i, best[i]]))
                   for i in range(S)]
    if return_points:
        return params_list, vals, pts  # pts: (S, K, ndim) unconstrained
    return params_list, vals
