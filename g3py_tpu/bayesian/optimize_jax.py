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

__all__ = ["lbfgs_maximize", "lbfgs_minimize_guarded"]


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


def lbfgs_minimize_guarded(obj_fn, starts, max_iters=200, chunk=8, tol=1e-5,
                           resid_tol=5e-2, display=False,
                           linesearch_steps=None, dispatch_budget=None):
    """On-device L-BFGS for guarded stochastic-estimator objectives — the
    device loop behind ``find_MAP(engine='iterative', loop='device')``.

    ``obj_fn(u) -> (value, trust_residual)`` must be jax-traceable (e.g.
    the matrix-free ``preconditioned_gp_nll`` objective, whose CG relative
    residual is the trust signal).  The host engine's hardening transfers
    verbatim: a point with a non-finite value or ``trust_residual >
    resid_tol`` reads as 1e10 with ZERO gradient (``jnp.where`` branch
    select), so the line search backs off instead of chasing estimator
    breakdown to fake optima; a step producing non-finite iterates/grads
    is rejected outright.

    Iterations run in jitted ``chunk``-length ``lax.scan`` segments —
    ~``chunk`` L-BFGS iterations (zoom line search included) ride ONE
    dispatch, versus the scipy host loop's 2+ tunnel round trips per
    iteration, which dominates wall time at large N over the hosted
    tunnel (the 50k iterative MAP was ~23-30 s/iteration host-driven).
    Starts run sequentially through the same compiled chunk program.

    ``dispatch_budget`` (seconds; default ``settings.dispatch_budget_s``)
    caps the estimated device runtime of ONE chunk dispatch: the chunk
    length is auto-sized from a timed objective eval (and halved when a
    measured chunk overruns 1.5x) so long-running fused programs stay
    under the hosted tunnel's worker-crash envelope
    (docs/performance.md round-5 measurement).  ``None`` disables and
    uses ``chunk`` as given.

    Returns ``(points (k, ndim), values (k,), iters (k,))`` — values are
    the guarded objective (1e10 marks a start that never found a trusted
    region).
    """
    import optax

    # custom VJP so the untrusted branch is truly constant: a plain
    # jnp.where still backprops 0*NaN=NaN through the untaken branch when
    # the objective's value/grad is NaN at an untrusted point, and the
    # zoom linesearch's internal value_fn evaluations would see NaN
    # gradients (ADVICE r4).  Here the backward literally SELECTS zero
    # where the guard fired; a NaN grad at a TRUSTED point still passes
    # through so the step-rejection check below can catch it.
    @jax.custom_vjp
    def guarded(u):
        v, resid = obj_fn(u)
        ok = jnp.isfinite(v) & (resid <= resid_tol)
        return jnp.where(ok, v, jnp.asarray(1e10, v.dtype))

    def _guarded_fwd(u):
        (v, resid), vjp = jax.vjp(obj_fn, u)
        ok = jnp.isfinite(v) & (resid <= resid_tol)
        out = jnp.where(ok, v, jnp.asarray(1e10, v.dtype))
        return out, (vjp, ok, resid)

    def _guarded_bwd(res, ct):
        vjp, ok, resid = res
        (g,) = vjp((ct, jnp.zeros_like(resid)))
        return (jnp.where(ok, g, jnp.zeros_like(g)),)

    guarded.defvjp(_guarded_fwd, _guarded_bwd)

    if linesearch_steps is None:
        opt = optax.lbfgs()
    else:
        # each zoom step costs a full objective+grad eval — at expensive
        # objectives (the 50k matrix-free NLL is ~1 s/eval) the DEFAULT
        # budget dominates the iteration cost when the search brackets a
        # guard cliff (measured 59 s/iter at the saturated default vs the
        # ~3-eval typical case)
        opt = optax.lbfgs(linesearch=optax.scale_by_zoom_linesearch(
            max_linesearch_steps=int(linesearch_steps)))
    vg = jax.value_and_grad(guarded)
    vg_j = jax.jit(vg)

    @partial(jax.jit, static_argnames=("length",))
    def run_chunk(x0, state0, v0, g0, length):
        def body(carry, _):
            x, state, v, g = carry
            updates, state_new = opt.update(g, state, x, value=v, grad=g,
                                            value_fn=guarded)
            x_new = optax.apply_updates(x, updates)
            v_new, g_new = vg(x_new)
            # Reject a step that lands non-finite OR in the untrusted
            # region (guard value 1e10 IS finite — without the explicit
            # check the zero-gradient guard point absorbs the optimizer).
            # On rejection the L-BFGS memory is RESET at the unchanged
            # iterate (not restored): the loop is deterministic, so a
            # restored state would retry the identical step and stall
            # forever (measured at the 50k 3x runs — 2-3 iterations then
            # a rejected-step plateau); a fresh memory makes the next
            # direction steepest descent, which a zoom search can
            # usually land.  A second consecutive rejection then means
            # even steepest descent fails and the chunk-plateau stop
            # below is the correct exit.
            ok = (jnp.isfinite(v_new) & (v_new < 1e9)
                  & jnp.all(jnp.isfinite(x_new))
                  & jnp.all(jnp.isfinite(g_new)))
            x_new = jnp.where(ok, x_new, x)
            v_new = jnp.where(ok, v_new, v)
            g_new = jnp.where(ok, g_new, g)
            state_new = jax.tree.map(
                lambda a, b: jnp.where(ok, a, b), state_new, opt.init(x))
            return (x_new, state_new, v_new, g_new), v_new

        (x, state, v, g), _vals = lax.scan(body, (x0, state0, v0, g0),
                                           None, length=length)
        return x, state, v, g

    import time as _time

    if dispatch_budget is None:
        dispatch_budget = settings.dispatch_budget_s

    starts = np.atleast_2d(np.asarray(starts, settings.floatx))
    points, values, iters = [], [], []
    chunk_eff = int(chunk)
    for x0 in starts:
        x = jnp.asarray(x0, settings.dtype)
        state = opt.init(x)
        v, g = vg_j(x)
        float(v)  # first call pays the compile — never time it
        t0 = _time.perf_counter()
        v, g = vg_j(x)
        float(v)  # host sync: time one steady-state objective+grad eval
        t_eval = _time.perf_counter() - t0
        if dispatch_budget is not None:
            # ~4 objective+grad evals per L-BFGS iteration (1 + typical
            # zoom steps; the saturated default is bounded separately by
            # linesearch_steps)
            evals_per_iter = 1 + (int(linesearch_steps)
                                  if linesearch_steps is not None else 3)
            est_iter = max(t_eval, 1e-3) * evals_per_iter
            chunk_eff = int(max(1, min(chunk, dispatch_budget / est_iter)))
            if display and chunk_eff != chunk:
                print(f"  dispatch budget {dispatch_budget:.0f}s: eval "
                      f"{t_eval:.2f}s -> chunk {chunk_eff}", flush=True)
        it, v_prev, flat = 0, float("inf"), 0
        t_prev = _time.perf_counter()
        while it < max_iters:
            t_chunk0 = _time.perf_counter()
            x, state, v, g = run_chunk(x, state, v, g, length=chunk_eff)
            it += chunk_eff
            # one host sync per CHUNK, not per iteration
            v_host = float(v)
            gmax = float(jnp.max(jnp.abs(g)))
            t_wall = _time.perf_counter() - t_chunk0
            if (dispatch_budget is not None and chunk_eff > 1
                    and t_wall > 1.5 * dispatch_budget):
                # measured overrun: halve the chunk (one recompile) so the
                # next dispatch lands back inside the envelope
                chunk_eff = max(1, chunk_eff // 2)
                if display:
                    print(f"  chunk overran budget ({t_wall:.1f}s > "
                          f"1.5x{dispatch_budget:.0f}s) -> chunk "
                          f"{chunk_eff}", flush=True)
            if display:
                t_now = _time.perf_counter()
                print(f"  iter {it}: value {v_host:.6g} |g|max {gmax:.3g} "
                      f"({t_now - t_prev:.1f}s/chunk)", flush=True)
                t_prev = t_now
            if not np.isfinite(gmax) or gmax < tol:
                break
            if abs(v_prev - v_host) < 1e-7 * max(1.0, abs(v_host)):
                # chunk-to-chunk plateau — but require TWO consecutive
                # flat chunks before stopping: a flat chunk can be a
                # REJECTED step whose memory reset (see run_chunk body)
                # makes the NEXT chunk steepest descent, and at
                # chunk_eff=1 that retry hasn't happened yet (measured:
                # the 50k stall exits after one flat chunk otherwise,
                # never giving the reset its chance)
                flat += 1
                if flat >= 2:
                    break
            else:
                flat = 0
            v_prev = v_host
        points.append(np.asarray(x, settings.floatx))
        values.append(float(v))
        iters.append(it)
    return np.stack(points), np.asarray(values), np.asarray(iters)
