"""GaussianProcess / WarpedGaussianProcess and the warped-gaussian density.

Rebuild of ``/root/reference/g3py/processes/gaussian.py``: the GP observed
density is the warped multivariate normal

  logp = -n/2 log 2pi - 1/2 |L^{-1}(T^{-1}y - mu)|^2 - sum log diag L
         + log|det dT^{-1}(y)|

with four NaN/Inf guards falling to -1e30 (reference gaussian.py:192-241);
posterior moments come from the elliptical core; quantiles are analytic
(``T(mu + z_q sigma)``, :56-73); samples push Cholesky-colored normals
through the warping (:75-97); WGP moments use 10-point Gauss-Hermite
quadrature of T and T^2 over the latent gaussian (:127-174).
"""

import numpy as np
import jax
import jax.numpy as jnp
from scipy import stats

from ..config import settings, asarray_x
from ..ops.guards import to_num, to_cov
from ..ops.linalg import (blocked_trtri, mvn_quad_logdet, safe_cholesky,
                          solve_lower_triangular)
from ..ops.quadrature import gauss_hermite
from ..utils import DictObj
from .elliptical import EllipticalProcess, _contains_kernel_noise
from .stochastic import zero32

__all__ = ["GaussianProcess", "WarpedGaussianProcess",
           "warped_gaussian_logp_cho", "WarpedGaussianDistribution"]

GUARD = np.float32(-1e30)
# float64 constant: under x64 the pipeline then carries full precision
# (the f32 constant alone cost ~3e-9 relative NLL error in the f64
# north-star job); in float32 mode jax demotes it with no behavior change
LOG2PI = np.log(2.0 * np.pi)


def warped_gaussian_logp_cho(value, mu, cho, mapping_inv_value, logdet_dinv):
    """logp of a warped gaussian given a Cholesky factor (full or diagonal)
    of the dispersion (reference ``WarpedGaussianDistribution.logp_cho``,
    gaussian.py:192-241).  ``mapping_inv_value`` and ``logdet_dinv`` are the
    already-applied warping pullbacks of ``value``."""
    delta = mapping_inv_value - mu
    lcho = solve_lower_triangular(cho, delta)
    quad = jnp.dot(lcho, lcho)
    n = jnp.asarray(jnp.shape(cho)[0], settings.dtype)
    npi = -0.5 * n * LOG2PI
    det_k = -jnp.sum(jnp.log(jnp.diagonal(cho)))
    r = npi - 0.5 * quad + det_k + logdet_dinv
    bad = (~jnp.all(jnp.isfinite(delta))) \
        | (~jnp.isfinite(logdet_dinv)) \
        | (~jnp.all(jnp.isfinite(cho))) \
        | (~jnp.all(jnp.isfinite(lcho)))
    return jnp.where(bad, GUARD, to_num(r, nan=GUARD, neginf=GUARD))


class WarpedGaussianDistribution:
    """Namespace kept for reference-API parity (gaussian.py:177-260)."""

    logp_cho = staticmethod(warped_gaussian_logp_cho)




class GaussianProcess(EllipticalProcess):
    """Exact (optionally warped-observation) Gaussian process regression."""

    def __init__(self, *args, **kwargs):
        if "name" not in kwargs:
            kwargs["name"] = "GP"
        super().__init__(*args, **kwargs)

    def th_define_process(self):
        # the observed RV of the reference (gaussian.py:30-40) is the
        # loglikelihood closure here
        self.distribution = WarpedGaussianDistribution

    def th_loglike_fn(self):
        """Observed-data loglikelihood: warped MVN over the prior inputs
        moments (reference gaussian.py:30-40), computed through the fused
        ``mvn_quad_logdet`` primitive (analytic-gradient robust-Cholesky
        pipeline — see ops/linalg.py)."""
        mapping = self.f_mapping
        location = self.f_location
        kernel_noise = self.f_kernel_noise

        def fn(params, space, inputs, outputs):
            mu = location(params, inputs)
            cov = to_cov(kernel_noise.cov(params, inputs))
            tinv = to_num(mapping.inv(params, outputs))
            logdet_map = mapping.logdet_dinv(params, outputs)
            quad, logdet_half, ok = mvn_quad_logdet(cov, tinv - mu)
            n = jnp.asarray(jnp.shape(inputs)[0], settings.dtype)
            r = -0.5 * n * LOG2PI - 0.5 * quad - logdet_half + logdet_map
            bad = (ok == 0) | (~jnp.isfinite(quad)) | (~jnp.isfinite(logdet_map))
            return jnp.where(bad, GUARD, to_num(r, nan=GUARD, neginf=GUARD))

        return fn

    def th_loo_fn(self):
        """Leave-one-out log pseudo-likelihood (GPML eq. 5.10-5.12) —
        beyond the reference, which has no cross-validation objective.
        One factorization serves every fold: with ``Kinv = linv' linv``,

          mu_i   = z_i - [Kinv r]_i / Kinv_ii      (latent LOO mean)
          var_i  = 1 / Kinv_ii                     (latent LOO variance)
          LOO    = sum_i log N(z_i | mu_i, var_i) + log|det dT^{-1}(y)|

        where ``z = T^{-1}(y)`` and ``r = z - m``; the warping Jacobian
        term makes the value an honest log-density of the OBSERVED y
        under each leave-one-out predictive (so WGP LOO values compare
        against GP LOO values on the same data).  Differentiable — a
        model-selection objective robust to prior misspecification
        (Rasmussen & Williams §5.4.2)."""
        mapping = self.f_mapping
        location = self.f_location
        kernel_noise = self.f_kernel_noise

        def fn(params, space, inputs, outputs):
            mu = location(params, inputs)
            cov = to_cov(kernel_noise.cov(params, inputs))
            tinv = to_num(mapping.inv(params, outputs))
            r = tinv - mu
            chol = safe_cholesky(cov)
            nobs = inputs.shape[0]
            linv = blocked_trtri(
                chol, block=nobs if nobs <= 512 else
                (512 if nobs <= 4096 else 2048))
            z = jnp.matmul(linv, r, precision=settings.matmul_precision)
            alpha = jnp.matmul(linv.T, z,
                               precision=settings.matmul_precision)
            kinv_diag = jnp.clip(jnp.sum(linv * linv, axis=0), 1e-30)
            lpd = (-0.5 * LOG2PI + 0.5 * jnp.log(kinv_diag)
                   - 0.5 * alpha * alpha / kinv_diag)
            logdet_map = mapping.logdet_dinv(params, outputs)
            out = jnp.sum(lpd) + logdet_map
            bad = (~jnp.all(jnp.isfinite(alpha))) | (~jnp.isfinite(logdet_map))
            return jnp.where(bad, GUARD, to_num(out, nan=GUARD,
                                                neginf=GUARD))

        return fn

    def loo(self, params=None, space=None, inputs=None, outputs=None,
            **kwargs):
        """Leave-one-out log pseudo-likelihood of the observed data (sum
        over folds of the held-out log predictive density; see
        :meth:`th_loo_fn`).  Higher is better; compare models on the
        same data like loglike, but penalizing overfit covariance
        structure the marginal likelihood can reward."""
        from .stochastic import CompiledFn

        if params is None:
            params = self.params
        space, inputs, outputs = self._resolve_data(space, inputs, outputs)
        vers = self._other_versions()
        tag = "posterior_loo" + (str(vers) if vers else "")
        if tag not in self.compiles:
            pure0 = self.th_loo_fn()

            def pure(p, s, i, o, v):
                return pure0(p, s, i, o)

            self.compiles[tag] = CompiledFn(pure, tag)
        params = {k: asarray_x(v) for k, v in params.items()}
        vector = np.zeros(0, dtype=settings.floatx)
        return float(self.compiles[tag](params, space, inputs, outputs,
                                        vector))

    def th_loglike_masked_fn(self):
        """Masked-observation loglikelihood ``fn(params, inputs, outputs,
        w)`` with ``w`` a {0,1} inclusion vector — EXACTLY the loglike of
        the included submatrix, at one static shape for every split.

        Excluded coordinates are decoupled from the gram by replacing
        their rows/columns with identity rows (``K_w = w w' o K +
        diag(1-w)``) and zeroing their residuals: the Cholesky then
        factors block-diagonally, the excluded block contributing zero to
        both the quadratic form and the log-determinant.  This turns the
        reference's per-split recompiles (``random_obs`` subsampling,
        reference data.py:129-164 feeding new shared-variable shapes) into
        a vmappable axis — the enabler for training a whole Experiment
        grid of splits on-device at once (bayesian/fanout.py)."""
        mapping = self.f_mapping
        location = self.f_location
        kernel_noise = self.f_kernel_noise

        def fn(params, inputs, outputs, w):
            w = jnp.asarray(w, settings.dtype)
            mu = location(params, inputs)
            cov = to_cov(kernel_noise.cov(params, inputs))
            covw = cov * jnp.outer(w, w) + jnp.diag(1.0 - w)
            tinv = to_num(mapping.inv(params, outputs))
            resid = (tinv - mu) * w
            logdet_map = jnp.sum(
                mapping.logdet_dinv_elem(params, outputs) * w)
            quad, logdet_half, ok = mvn_quad_logdet(covw, resid)
            n_eff = jnp.sum(w)
            r = (-0.5 * n_eff * LOG2PI - 0.5 * quad - logdet_half
                 + logdet_map)
            bad = (ok == 0) | (~jnp.isfinite(quad)) | (~jnp.isfinite(logdet_map))
            return jnp.where(bad, GUARD, to_num(r, nan=GUARD, neginf=GUARD))

        return fn

    def fit_splits(self, masks, start=None, points=4, max_iters=200,
                   tol=1e-5, noise_mult=0.2, seed=0, shard=False, mesh=None,
                   pair_chunk=None):
        """Train this model on every observation split at once — one
        vmapped device program over (split, start) pairs built on the
        masked loglike (see ``th_loglike_masked_fn`` and
        bayesian/fanout.py).  Returns (per-split best params list,
        (S, points) logp matrix)."""
        from ..bayesian.fanout import fit_splits as _fit_splits
        return _fit_splits(self, masks, start=start, points=points,
                           max_iters=max_iters, tol=tol,
                           noise_mult=noise_mult, seed=seed, shard=shard,
                           mesh=mesh, pair_chunk=pair_chunk)

    def th_logpredictive(self, prior=False, noise=False):
        """Independent-marginal log-predictive of an arbitrary vector using
        the *diagonal* posterior cholesky (reference gaussian.py:42-54)."""
        loc_fn = self.th_location(prior=prior, noise=noise)
        sd_fn = self.th_kernel_sd(prior=prior, noise=True)
        mapping = self.f_mapping

        def fn(params, space, inputs, outputs, vector):
            mu = loc_fn(params, space, inputs, outputs, vector)
            sd = sd_fn(params, space, inputs, outputs, vector)
            tinv = to_num(mapping.inv(params, vector))
            logdet = mapping.logdet_dinv(params, vector)
            cho = jnp.diag(sd)
            return warped_gaussian_logp_cho(vector, mu, cho, tinv, logdet)

        return fn

    # -- host-side prediction helpers ------------------------------------------
    def quantiler(self, params=None, space=None, inputs=None, outputs=None, q=0.975,
                  prior=False, noise=False, simulations=None):
        """Analytic quantile T(mu + z_q sigma) (reference gaussian.py:56-73)."""
        p = np.float32(stats.norm.ppf(q))
        loc = self.location(params, space, inputs, outputs, prior=prior, noise=noise)
        sd = self.kernel_sd(params, space, inputs, outputs, prior=prior, noise=noise)
        latent = loc + p * sd
        return self.mapping(params, space, inputs, outputs, vector=latent)

    def predictor_distributed(self, params=None, mesh=None, block=None,
                              axis="dp"):
        """Multi-chip streaming serving (the counterpart of
        ``find_MAP(engine='distributed')``): the observed gram is factored
        once by the cooperative band Cholesky and stays row-band-sharded;
        query batches cost a per-device cross-gram band, a sharded TRSM
        and two psums (models/predictor.py ``DistributedPredictor``)."""
        from .predictor import DistributedPredictor

        return DistributedPredictor(self, params, mesh=mesh, block=block,
                                    axis=axis)

    def predictor_iterative(self, params=None, rank=64, block=2048,
                            cg_iters=200, tol=1e-6, dtype=None):
        """Matrix-free streaming serving for training sets too large to
        factor (the counterpart of ``find_MAP(engine='iterative')``): one
        preconditioned-CG solve + rank-R pivoted Cholesky, then every
        statistic streams as blocked cross-gram matmuls — no O(n^3)
        factorization and no n x n matrix (models/predictor.py
        ``IterativePredictor``).

        ``dtype='float64'`` runs the whole solve pipeline in f64 — the
        measured fix for near-interpolation grams beyond f32 CG's reach
        (lambda_1/sigma^2 >~ 1e9, e.g. tut19's trained optimum): the f32
        stack stalls at residual ~0.2-5 and a MIXED pipeline is worse
        (docs/performance.md round-4 2x2 — an f64-accurate preconditioner
        amplifies f32 matvec noise by 1/sigma^2).  f64 is native on CPU
        and emulated on TPU; statistics are returned in float32."""
        from .predictor import IterativePredictor

        return IterativePredictor(self, params, rank=rank, block=block,
                                  cg_iters=cg_iters, tol=tol, dtype=dtype)

    def nll_iterative(self, params=None, rank=64, block=2048, cg_iters=100,
                      probes=8, lanczos_iters=25, seed=0):
        """Matrix-free negative loglikelihood for training sets too large to
        factor (the N=50k stretch path, ops/iterative.py): the gram is
        accessed lazily, the quadratic form runs through preconditioned CG
        and the logdet through batched SLQ, with a stochastic-trace custom
        VJP — so ``jax.grad`` of this trains the model without an N x N
        matrix in either pass.

        Requires the standard noisy construction (``noisy=True``, so the
        noise variance is the KernelNoise term's hyper).  Includes the
        warping Jacobian, matching ``loglike`` (no hyper priors)."""
        from ..hypers import hval
        from ..hypers.kernels import KernelSum, KernelNoise
        from ..ops.iterative import preconditioned_gp_nll

        if params is None:
            params = self.params
        params = {k: jnp.asarray(v) for k, v in self.filter_params(params).items()}
        kn = self.f_kernel_noise
        if not (isinstance(kn, KernelSum) and isinstance(kn.k2, KernelNoise)):
            raise ValueError("nll_iterative needs the noisy=True "
                             "KernelSum(kernel, KernelNoise) construction")
        if _contains_kernel_noise(self.f_kernel):
            # KernelNoise contributes 0 to every CROSS covariance, so the
            # lazy slab matvec would silently drop it from the quadratic
            # form and logdet — reject rather than return a wrong NLL
            raise ValueError("nll_iterative does not support KernelNoise "
                             "terms inside the signal kernel (the lazy "
                             "matvec sees only cross-covariances)")
        noise_var = hval(kn.k2.var, params)
        inputs = jnp.asarray(self.inputs)
        latent = self._latent_obs(params, self.outputs)
        mean = self.f_location(params, inputs)
        nll, info = preconditioned_gp_nll(
            self.f_kernel, params, inputs, latent, noise_var, rank=rank,
            block=block, cg_iters=cg_iters, probes=probes,
            lanczos_iters=lanczos_iters, seed=seed, mean=mean)
        # warping Jacobian: loglike = log N(T^{-1}y) + logdet dT^{-1}/dy
        nll = nll - self.f_mapping.logdet_dinv(params, jnp.asarray(self.outputs))
        return nll, info

    def nll_distributed(self, params=None, mesh=None, block=None, axis="dp"):
        """Device-sharded exact negative loglikelihood (tensor parallelism
        over the gram): the gaussian scalarization of the shared band
        primitive (``EllipticalProcess._distributed_qld``) — each device
        evaluates and factors its own row band of the N x N gram inside
        ``shard_map``; the unsharded matrix never exists on any chip, in
        forward or backward pass.  This is the multi-chip training
        objective the reference has no counterpart for (its ``find_MAP``
        workflow, reference stochastic.py:566-674, is single-host Theano).

        Requires the standard noisy construction (``noisy=True``) and
        ``len(inputs)`` divisible by the mesh device count.  Includes the
        warping Jacobian and mean, matching ``loglike`` (no hyper priors).
        Differentiable w.r.t. ``params`` (gram via the sharded custom VJP;
        mean/warping by ordinary autodiff through the residual)."""
        qld = self._distributed_qld(mesh=mesh, block=block, axis=axis)
        if params is None:
            params = self.params
        params = {k: jnp.asarray(v)
                  for k, v in self.filter_params(params).items()}
        x = jnp.asarray(self.inputs)
        outputs = jnp.asarray(self.outputs)
        resid = (self._latent_obs(params, outputs)
                 - self.f_location(params, x))
        quad, logdet_half = qld(params, x, resid)
        n = np.asarray(len(self.inputs), settings.dtype)
        val = 0.5 * quad + logdet_half + 0.5 * n * LOG2PI
        # warping Jacobian: loglike = log N(T^{-1}y) + logdet dT^{-1}/dy
        return val - self.f_mapping.logdet_dinv(params, outputs)

    def _find_map_iterative(self, start=None, points=1, return_points=False,
                            display=True, max_iters=200, rank=64, block=2048,
                            cg_iters=100, probes=8, lanczos_iters=25, seed=0,
                            loop="host", chunk=1, linesearch_steps=None,
                            dispatch_budget=None, **_):
        """MAP search whose objective is the matrix-free NLL (plus the hyper
        priors) — L-BFGS over ``nll_iterative``'s stochastic-trace
        gradient, for training sets where the exact O(n^3)/O(n^2-memory)
        objective cannot be formed (``find_MAP(engine='iterative')``).

        ``probes`` controls the gradient's trace-estimator bias and directly
        bounds the achievable optimum: on a 120-point test problem probes=32
        stalls ~36 logp short of the exact optimizer, probes=128 within ~6,
        probes=256 matches it.  Budget probes like CG iterations.

        ``loop='host'`` (default) is scipy L-BFGS-B with one tunnel round
        trip per objective call — robust, but at N=50k the dispatch RTT
        dominates (~23-30 s per L-BFGS iteration measured on the hosted
        tunnel).  ``loop='device'`` runs optax L-BFGS (zoom line search)
        fully on device in ``chunk``-iteration jitted scan segments
        (bayesian/optimize_jax.lbfgs_minimize_guarded) with the SAME
        trust hardening (CG residual > 5e-2 or non-finite => value 1e10,
        zero gradient) — many iterations per dispatch instead of many
        dispatches per iteration.

        Hosted-tunnel runtime caveat: ``chunk`` DEFAULTS TO 1, which is
        the only device-loop shape never observed to fault the tunnel
        worker — the round-5 tally at the 50k tut19 workload is
        chunk=1: 3/3 runs (17+ dispatches) clean vs chunk=4 with a
        capped zoom: every first dispatch dead (~6/6 across rounds 4-5,
        on busy AND idle hosts; the length-4 scan wrapping the
        zoom-while_loop body kills the worker at compile/first-run —
        a program-SHAPE fault, docs/performance.md).  chunk>1 only
        amortizes the ~1 ms dispatch RTT against ~6 s of per-iteration
        objective evals, so it buys nothing here; raise it on healthy
        runtimes where compile is trusted.  Chunks are additionally
        auto-sized under ``settings.dispatch_budget_s`` (the
        bisection-measured compute-per-dispatch crash envelope)."""
        import jax as _jax
        import scipy.optimize as spo

        reg = self.active
        if start is None:
            start = self.params_default
        starts = list(start) if isinstance(start, list) else [start]
        rng = np.random.default_rng(0)  # match _find_map_jax's determinism
        while len(starts) < points:
            starts.append(self.params_random(mean=starts[0], sigma=0.15,
                                             prop=True, rng=rng))
        prior_pure = self._logp_pure(prior=True)
        xj = jnp.asarray(self.inputs)
        yj = jnp.asarray(self.outputs)
        vec0 = jnp.zeros(0, dtype=settings.dtype)

        def objective(u):
            p = reg.array_to_dict_jax(u)
            nll, info = self.nll_iterative(p, rank=rank, block=block,
                                           cg_iters=cg_iters, probes=probes,
                                           lanczos_iters=lanczos_iters,
                                           seed=seed)
            return nll - prior_pure(p, xj, xj, yj, vec0), \
                info["cg_rel_residual"]

        if loop == "device":
            from ..bayesian.optimize_jax import lbfgs_minimize_guarded

            u0s = np.stack([np.asarray(reg.dict_to_array(s),
                                       settings.floatx) for s in starts])
            pts, vals, iters = lbfgs_minimize_guarded(
                objective, u0s, max_iters=max_iters, chunk=chunk,
                display=display, linesearch_steps=linesearch_steps,
                dispatch_budget=dispatch_budget)
            results = []
            for i in range(len(vals)):
                if vals[i] >= 1e10:
                    print(f"start{i+1}: never reached a trusted region "
                          "(non-finite NLL or CG residual > 5e-2) — "
                          "dropped; raise cg_iters/rank or move the start")
                    continue
                if display:
                    print(f"start{i+1} done (-logp): {vals[i]:.6g} "
                          f"({int(iters[i])} device iters)")
                results.append((f"iterative{i+1}", float(vals[i]),
                                reg.array_to_dict(pts[i])))
            if not results:
                raise ValueError(
                    "find_MAP(engine='iterative', loop='device'): every "
                    "start point was untrusted; raise cg_iters/rank/probes "
                    "or provide a better start")
            results.sort(key=lambda t: t[1])
            best = results[0][2]
            if return_points:
                return best, [(n_, -v, p) for n_, v, p in results]
            return best
        if loop != "host":
            raise ValueError(f"unknown loop {loop!r} ('host' | 'device')")

        vg = _jax.jit(_jax.value_and_grad(objective, has_aux=True))
        _memo = {}

        def f_and_g(u):
            key = u.tobytes()
            if key in _memo:  # scipy re-evaluates the start point
                return _memo[key]
            (v, resid), g = vg(jnp.asarray(u, settings.dtype))
            v = float(v)
            g = np.asarray(g, np.float64)
            if not np.isfinite(v) or not np.all(np.isfinite(g)) \
                    or float(resid) > 5e-2:
                # hardened objective (reference selection.py nan_to_high):
                # a line-search overshoot into a numerically dead region, or
                # a parameter point where the CG solve itself is untrusted,
                # must read as 'very bad' — unguarded, L-BFGS happily chases
                # the estimator's breakdown artifacts to fake -1e19 NLLs
                out = (1e10, np.zeros_like(g))
            else:
                out = (v, g)
            _memo.clear()  # keep only the most recent point
            _memo[key] = out
            return out

        results = []
        for i, s in enumerate(starts, start=1):
            u0 = np.asarray(reg.dict_to_array(s), np.float64)
            v0 = f_and_g(u0)[0]
            if v0 >= 1e10:
                # zero gradient at an untrusted start would make L-BFGS-B a
                # silent no-op; surface the cause instead
                print(f"start{i}: untrusted at the start point (non-finite "
                      "NLL or CG residual > 5e-2) — skipped; raise cg_iters/"
                      "rank or move the start")
                continue
            if display:
                print(f"start{i} (-logp): {v0:.6g}")
            res = spo.minimize(f_and_g, u0, jac=True, method="L-BFGS-B",
                               options={"maxiter": max_iters})
            results.append((f"iterative{i}", float(res.fun),
                            reg.array_to_dict(
                                np.asarray(res.x, settings.floatx))))
            if display:
                print(f"start{i} done (-logp): {res.fun:.6g}")
        if not results:
            raise ValueError(
                "find_MAP(engine='iterative'): every start point was "
                "untrusted (non-finite NLL or CG residual > 5e-2); raise "
                "cg_iters/rank/probes or provide a better start")
        results.sort(key=lambda t: t[1])
        best = results[0][2]
        if return_points:
            return best, [(n, -v, p) for n, v, p in results]
        return best

    def _quantile_p(self, params, q, prior=False, noise=False):
        """Latent-space quantile coefficient: quantile = T(mu + p * sd)
        (reference gaussian.py:56-73).  Host scalar; StudentT overrides
        with the posterior-df t ppf."""
        return np.float32(stats.norm.ppf(q))

    def _batch_quantile_p(self, q, rows, space=None, inputs=None, outputs=None,
                          prior=False, noise=False):
        return np.full(len(rows), stats.norm.ppf(q), dtype=settings.floatx)

    def _batch_latent_rand(self, rows, n, rng, space=None, inputs=None,
                           outputs=None, prior=False, noise=False):
        return rng.standard_normal((len(rows), n)).astype(settings.floatx)

    def sampler(self, params=None, space=None, inputs=None, outputs=None, samples=1,
                prior=False, noise=False, rng=None):
        """Cholesky-colored normal draws pushed through the warping
        (reference gaussian.py:75-97)."""
        if space is None:
            space = self.space
        if rng is None:
            rng = np.random.default_rng()
        rand = rng.standard_normal((len(space), samples)).astype(settings.floatx)
        loc = self.location(params, space, inputs, outputs, prior=prior, noise=noise)
        cho = self.cholesky(params, space, inputs, outputs, prior=prior, noise=noise)
        latent = loc[:, None] + cho.dot(rand)
        return np.stack(
            [self.mapping(params, space, inputs, outputs, vector=latent[:, k])
             for k in range(samples)], axis=1)

    def th_cross_mean(self, prior=False, noise=False, cross_kernel=None):
        """Cross-process posterior mean through an explicit cross-kernel
        (reference gaussian.py:99-112)."""
        if cross_kernel is None:
            cross_kernel = self.f_kernel
        location = self.f_location
        mapping = self.f_mapping

        def fn(params, space, inputs, outputs, vector):
            if prior:
                return location(params, space)
            from ..ops.linalg import cho_solve

            cross = to_num(cross_kernel.cov(params, space, inputs))
            chol = self._obs_chol(params, inputs)
            resid = to_num(mapping.inv(params, outputs)) - location(params, inputs)
            return location(params, space) + jnp.dot(cross, cho_solve(chol, resid))

        return fn


class WarpedGaussianProcess(GaussianProcess):
    """GP with non-analytic warped moments via Gauss-Hermite quadrature
    (reference gaussian.py:115-174)."""

    def __init__(self, *args, **kwargs):
        if "name" not in kwargs:
            kwargs["name"] = "WGP"
        super().__init__(*args, **kwargs)

    def th_mean(self, prior=False, noise=False, simulations=None, n=None):
        if n is None:
            n = settings.quadrature_degree
        loc_fn = self.th_location(prior=prior, noise=noise)
        sd_fn = self.th_kernel_sd(prior=prior, noise=noise)
        mapping = self.f_mapping

        def fn(params, space, inputs, outputs, vector):
            mu = loc_fn(params, space, inputs, outputs, vector)
            sd = sd_fn(params, space, inputs, outputs, vector)
            return gauss_hermite(lambda v: mapping(params, v), mu, sd, n=n)

        return fn

    def th_variance(self, prior=False, noise=False, simulations=None, n=None):
        if n is None:
            n = settings.quadrature_degree
        loc_fn = self.th_location(prior=prior, noise=noise)
        sd_fn = self.th_kernel_sd(prior=prior, noise=noise)
        mapping = self.f_mapping

        def fn(params, space, inputs, outputs, vector):
            mu = loc_fn(params, space, inputs, outputs, vector)
            sd = sd_fn(params, space, inputs, outputs, vector)
            m1 = gauss_hermite(lambda v: mapping(params, v), mu, sd, n=n)
            m2 = gauss_hermite(lambda v: mapping(params, v) ** 2, mu, sd, n=n)
            return m2 - m1**2

        return fn

    def th_covariance(self, prior=False, noise=False):
        return None

    gauss_hermite = staticmethod(gauss_hermite)
