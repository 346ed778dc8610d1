"""Bayesian optimization over any process with posterior statistics.

Beyond the reference (which has no optimization-under-uncertainty story;
its `selection.py` optimizes hyperparameters, not black-box objectives).
TPU-first design: acquisition functions are built from the model's pure
``th_mean``/``th_std`` statistic functions, so a whole candidate batch is
ONE jitted program and the multi-start ascent differentiates the
acquisition *through the posterior algebra* with ``jax.grad`` — no
finite differences, no per-point dispatch.  Every start ascends
simultaneously (one (k, d) tensor program), the natural shape for the
MXU gram builders underneath.

Acquisitions:

* ``logEI`` (default) — numerically stable log expected improvement
  (Ament et al., NeurIPS 2023): ascent signal survives where classic EI
  underflows to an exact f32 zero (z below about -6).
* ``EI`` — classic expected improvement (Jones/Mockus).
* ``PI`` — probability of improvement.
* ``UCB`` — mu + beta * sigma (maximization form).
* ``thompson`` — pathwise Matheron draws (Wilson et al. 2020) argmaxed
  over a candidate set; one CONSISTENT function draw per suggestion, so
  ``q > 1`` batch proposals are independent posterior optimizers.

Batch (``q > 1``) proposals with the analytic acquisitions use
sequential FANTASIES (Ginsbourger et al. 2010): after each suggestion
the surrogate's data is extended with an imagined observation (the
"liar") and the next point is ascended against the fantasized
posterior — hyperparameters stay fixed, only the conditioning set
grows, so each fantasy round is just the same pure acquisition program
on q-1 extra rows.  ``liar='mean'`` is the kriging believer (lie with
the posterior mean at the suggested point); ``'best'``/``'worst'`` are
the classic optimistic/pessimistic constant liars (in the objective
direction).

The predictive (mean, std) is the process's own statistic pair, so
warped processes moment-match through their mapping; acquisitions treat
it as Gaussian (standard practice; exact for GP/SSGP posteriors).
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..config import settings

__all__ = ["BayesOpt"]

_SQRT2PI = float(np.sqrt(2.0 * np.pi))


def _norm_logpdf(z):
    return -0.5 * z * z - jnp.log(_SQRT2PI)


def _log_h(z):
    """log( phi(z) + z * Phi(z) ), the log-EI kernel, stable over all z
    (Ament et al. 2023): direct form where it is well-conditioned, the
    asymptotic phi(z)/z^2 * (1 - 3/z^2) expansion in the far-left tail."""
    direct = jnp.log(
        jnp.clip(
            jnp.exp(_norm_logpdf(z)) + z * jax.scipy.stats.norm.cdf(z),
            1e-30,
        )
    )
    zs = jnp.minimum(z, -1.0)  # keep the tail branch finite everywhere
    tail = (_norm_logpdf(zs) - 2.0 * jnp.log(-zs)
            + jnp.log1p(jnp.clip(-3.0 / (zs * zs), -0.999)))
    return jnp.where(z > -4.0, direct, tail)


class BayesOpt:
    """Sequential model-based optimization of a black-box objective over
    a box domain, driven by any process exposing ``th_mean``/``th_std``
    (GP/WGP/TP/SSGP/sparse families...).

    Parameters
    ----------
    process : StochasticProcess
        The surrogate.  Its data grow as observations arrive (each new
        shape compiles once; keep BO loops to tens-hundreds of points,
        the regime where model-based optimization makes sense).
    bounds : (d, 2) array
        Box constraints, one (low, high) row per input dimension.
    maximize : bool
        Direction of the OBJECTIVE.  The surrogate always models raw y;
        the acquisition flips signs internally when minimizing.
    xi : float
        Exploration offset for EI/logEI/PI.
    beta : float
        Confidence multiplier for UCB.
    """

    def __init__(self, process, bounds, maximize=True, xi=0.0, beta=2.0,
                 noise_floor=1e-5, seed=0):
        self.process = process
        self.bounds = np.asarray(bounds, dtype=settings.floatx)
        if self.bounds.ndim != 2 or self.bounds.shape[1] != 2:
            raise ValueError("bounds must be (d, 2) [low, high] rows")
        if np.any(self.bounds[:, 1] <= self.bounds[:, 0]):
            raise ValueError("every bounds row needs high > low")
        self.d = self.bounds.shape[0]
        self.maximize = bool(maximize)
        self.xi = float(xi)
        self.beta = float(beta)
        self.noise_floor = float(noise_floor)
        self.rng = np.random.default_rng(seed)
        self.history = {"x": [], "y": [], "best_y": []}
        self._acq_cache = {}

    # -- data ------------------------------------------------------------
    @property
    def _sign(self):
        return 1.0 if self.maximize else -1.0

    def tell(self, x, y):
        """Record evaluations (x (q, d) or (d,), y (q,) or scalar) and
        push them into the surrogate's observed data."""
        x = np.atleast_2d(np.asarray(x, dtype=settings.floatx))
        y = np.atleast_1d(np.asarray(y, dtype=settings.floatx))
        xs = (np.concatenate([np.asarray(self.process.inputs), x])
              if self.process.inputs is not None and
              len(np.shape(self.process.inputs)) else x)
        ys = (np.concatenate([np.asarray(self.process.outputs), y])
              if self.process.outputs is not None else y)
        self.process.observed(xs, ys)
        for xi_, yi_ in zip(x, y):
            self.history["x"].append(np.asarray(xi_))
            self.history["y"].append(float(yi_))
            best = (max if self.maximize else min)(self.history["y"])
            self.history["best_y"].append(best)

    def best(self):
        """(x_best, y_best) among evaluated points."""
        ys = np.asarray(self.history["y"])
        i = int(np.argmax(ys) if self.maximize else np.argmin(ys))
        return self.history["x"][i], float(ys[i])

    # -- acquisition -----------------------------------------------------
    def _acq_pure(self, kind):
        """Pure fn (params, X (m, d), inputs, outputs, best_g) -> (m,)
        acquisition values (maximization direction)."""
        mean_fn = self.process.th_mean(noise=False)
        std_fn = self.process.th_std(noise=False)
        sign, xi, beta = self._sign, self.xi, self.beta

        def fn(params, X, inputs, outputs, best_g):
            vec = jnp.zeros(0, dtype=settings.dtype)
            # NaN-sanitized: a degenerate surrogate (singular gram after
            # near-duplicate evaluations) must yield a *bad* acquisition
            # value, not poison the whole ascent batch
            mu = jnp.nan_to_num(
                sign * mean_fn(params, X, inputs, outputs, vec),
                nan=-1e30, posinf=1e30, neginf=-1e30)
            sd = jnp.clip(
                jnp.nan_to_num(std_fn(params, X, inputs, outputs, vec),
                               nan=1e-10, posinf=1e30),
                1e-10)
            z = (mu - best_g - xi) / sd
            if kind == "EI":
                return sd * (jnp.exp(_norm_logpdf(z))
                             + z * jax.scipy.stats.norm.cdf(z))
            if kind == "logEI":
                return jnp.log(sd) + _log_h(z)
            if kind == "PI":
                return jax.scipy.stats.norm.logcdf(z)
            if kind == "UCB":
                return mu + beta * sd
            raise ValueError(f"unknown acquisition {kind!r}")

        return fn

    def acquisition(self, X, params=None, kind="logEI"):
        """Evaluate the acquisition on a candidate batch (host entry)."""
        params = self._params(params)
        X = jnp.asarray(np.atleast_2d(X), settings.dtype)
        inputs, outputs, best_g = self._data_jnp()
        if kind not in self._acq_cache:
            self._acq_cache[kind] = jax.jit(self._acq_pure(kind))
        pj = {k: jnp.asarray(v, settings.dtype) for k, v in params.items()}
        return np.asarray(self._acq_cache[kind](pj, X, inputs, outputs,
                                                best_g))

    def _params(self, params):
        if params is not None:
            return params
        return self.process.params

    def _data_jnp(self):
        inputs = jnp.asarray(self.process.inputs, settings.dtype)
        outputs = jnp.asarray(self.process.outputs, settings.dtype)
        ys = np.asarray(self.history["y"], dtype=settings.floatx)
        if ys.size == 0:
            ys = self._sign * np.asarray(self.process.outputs,
                                         dtype=settings.floatx)
        else:
            ys = self._sign * ys
        best_g = jnp.asarray(np.max(ys), settings.dtype)
        return inputs, outputs, best_g

    def _uniform(self, m):
        lo, hi = self.bounds[:, 0], self.bounds[:, 1]
        return (lo + (hi - lo)
                * self.rng.random((m, self.d))).astype(settings.floatx)

    # -- suggestion --------------------------------------------------------
    def suggest(self, params=None, kind="logEI", q=1, candidates=2048,
                starts=16, steps=60, key=None, liar="mean"):
        """Propose the next evaluation point(s).

        ``kind='thompson'`` draws ``q`` consistent posterior paths on the
        candidate set and argmaxes each (natural batch proposals).  The
        analytic acquisitions screen ``candidates`` uniform points, then
        ascend the best ``starts`` with Adam on ``jax.grad(acq)`` — all
        starts in ONE program — and return the argmax.  ``q > 1`` with
        an analytic acquisition proposes sequentially through fantasies:
        ``liar='mean'`` (kriging believer) conditions each next ascent on
        the posterior mean at the previous pick; ``'best'``/``'worst'``
        lie with the incumbent best/worst objective value.  Returns a
        (d,) point when ``q == 1``, else a (q, d) batch.
        """
        params = self._params(params)
        if kind == "thompson":
            return self._suggest_thompson(params, q, candidates, key)
        inputs, outputs, best_g = self._data_jnp()
        pj = {k: jnp.asarray(v, settings.dtype) for k, v in params.items()}
        if q == 1:
            return self._suggest_one(pj, kind, inputs, outputs, best_g,
                                     candidates, starts, steps)
        if liar not in ("mean", "best", "worst"):
            raise ValueError("liar must be 'mean', 'best' or 'worst'")
        picks = []
        for _ in range(int(q)):
            x = self._suggest_one(pj, kind, inputs, outputs, best_g,
                                  candidates, starts, steps)
            picks.append(x)
            y_f = self._fantasy(pj, x, inputs, outputs, liar)
            inputs = jnp.concatenate(
                [inputs, jnp.asarray(x, settings.dtype)[None]], axis=0)
            outputs = jnp.concatenate(
                [outputs, jnp.asarray(y_f, settings.dtype)[None]])
            best_g = jnp.maximum(best_g, self._sign * y_f)
        return np.stack(picks)

    def _fantasy(self, pj, x, inputs, outputs, liar):
        """The imagined observation (raw-y space) at a suggested point,
        given the CURRENT fantasized conditioning set."""
        if liar == "mean":
            if getattr(self, "_mean_fn", None) is None:
                self._mean_fn = jax.jit(self.process.th_mean(noise=False))
            vec = jnp.zeros(0, dtype=settings.dtype)
            mu = self._mean_fn(pj, jnp.asarray(x, settings.dtype)[None],
                               inputs, outputs, vec)[0]
            # a divergent/non-finite believer mean must not become the
            # incumbent (a 1e30 lie flattens EI for every later pick):
            # clamp the lie to the observed objective range
            lo, hi = jnp.min(outputs), jnp.max(outputs)
            mu = jnp.where(jnp.isnan(mu), 0.5 * (lo + hi), mu)
            return jnp.clip(mu, lo, hi)
        g = self._sign * outputs  # objective direction
        return self._sign * (jnp.max(g) if liar == "best" else jnp.min(g))

    def _suggest_one(self, pj, kind, inputs, outputs, best_g,
                     candidates, starts, steps):
        """Screen + multi-start Adam ascent of one analytic acquisition
        against an explicit conditioning set (real or fantasized)."""
        import optax

        acq = self._acq_pure(kind)

        cand = jnp.asarray(self._uniform(candidates), settings.dtype)
        vals = jax.jit(acq)(pj, cand, inputs, outputs, best_g)
        top = jnp.argsort(vals)[-starts:]
        x0 = cand[top]

        lo = jnp.asarray(self.bounds[:, 0], settings.dtype)
        hi = jnp.asarray(self.bounds[:, 1], settings.dtype)
        opt = optax.adam(0.05)  # in normalized [0, 1]^d coordinates

        def to_unit(x):
            return (x - lo) / (hi - lo)

        def from_unit(u):
            return lo + u * (hi - lo)

        @jax.jit
        def ascend(u0):
            def total(u):
                a = acq(pj, from_unit(jnp.clip(u, 0.0, 1.0)),
                        inputs, outputs, best_g)
                return -jnp.sum(a)

            def step(carry, _):
                u, st = carry
                g = jax.grad(total)(u)
                upd, st = opt.update(g, st)
                u = jnp.clip(optax.apply_updates(u, upd), 0.0, 1.0)
                return (u, st), None

            (u, _), _ = jax.lax.scan(step, (u0, opt.init(u0)), None,
                                     length=steps)
            return u

        uf = ascend(to_unit(x0))
        xf = from_unit(jnp.clip(uf, 0.0, 1.0))
        vf = jax.jit(acq)(pj, xf, inputs, outputs, best_g)
        # a start whose ascent diverged must not win (or poison argmax)
        ok = jnp.all(jnp.isfinite(xf), axis=1) & jnp.isfinite(vf)
        vf = jnp.where(ok, vf, -jnp.inf)
        pick = np.asarray(xf[jnp.argmax(vf)])
        if not np.all(np.isfinite(pick)):
            pick = np.asarray(cand[int(jnp.argmax(
                jnp.where(jnp.isfinite(vals), vals, -jnp.inf)))])
        return pick

    def _suggest_thompson(self, params, q, candidates, key):
        pr = self.process.predictor(params)
        cand = self._uniform(candidates)
        draws = np.asarray(pr.pathwise_sampler(
            space=cand, samples=int(q),
            key=int(self.rng.integers(2**31)) if key is None else key))
        g = self._sign * draws  # (candidates, q)
        picks = np.argmax(g, axis=0)
        out = cand[picks]
        return out[0] if q == 1 else out

    def _refit(self, params, find_map_kwargs):
        """find_MAP warm-started, then floor the observation-noise hypers:
        BFGS on interpolatable designs drives noise to an EXACT zero
        (unconstrained coordinate to -inf), after which near-duplicate
        evaluations make the gram singular and the surrogate NaNs out —
        the standard BO hygiene is a small noise lower bound."""
        params = self.process.find_MAP(start=params, **find_map_kwargs)
        if self.noise_floor > 0 and self.history["y"]:
            yv = float(np.var(np.asarray(self.history["y"]))) or 1.0
            floor = np.asarray(self.noise_floor * yv, settings.floatx)
            for k, v in list(params.items()):
                if "Noise_var" in k or "Lik_var" in k:
                    params[k] = np.maximum(
                        np.asarray(v, settings.floatx), floor)
        return params

    # -- the loop ----------------------------------------------------------
    def run(self, f, iters=20, init=None, params=None, kind="logEI", q=1,
            refit_every=1, find_map_kwargs=None, display=False, **kw):
        """Initialize (uniform design), then iterate suggest -> evaluate
        -> tell -> refit.  Returns (params, history).  ``f`` maps an
        (q, d) array to (q,) objective values (or (d,) -> scalar when
        q == 1)."""
        find_map_kwargs = dict(points=1, powell=False, display=False,
                               **(find_map_kwargs or {}))
        if init is None:
            init = max(4, 2 * self.d)
        if not self.history["y"]:
            x0 = self._uniform(init)
            y0 = np.asarray([np.asarray(f(x)).item() for x in x0],
                            dtype=settings.floatx)
            self.tell(x0, y0)
        params = self._refit(params, find_map_kwargs)
        for it in range(iters):
            xq = self.suggest(params=params, kind=kind, q=q, **kw)
            xq2 = np.atleast_2d(xq)
            yq = np.asarray([np.asarray(f(x)).item() for x in xq2],
                            dtype=settings.floatx)
            self.tell(xq2, yq)
            if (it + 1) % refit_every == 0:
                params = self._refit(params, find_map_kwargs)
            if display:
                print(f"BO iter {it + 1}: tried {np.round(xq2, 3)} -> "
                      f"{yq}; best {self.history['best_y'][-1]:.4f}")
        return params, self.history
