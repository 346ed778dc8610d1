"""Streaming serving fast path: factor once, answer queries as matmuls.

The reference recomputed the O(n^3) observed-gram Cholesky inside every
compiled statistic on every ``predict`` call (reference stochastic.py:444-513
assembles ~6 statistics, each an independent ``makefn`` whose graph contains
its own ``cholesky_robust``).  On TPU the right serving shape is: factor the
observed gram ONCE into ``(L^{-1}, alpha, z)`` device state
(``EllipticalProcess.posterior_state``), then serve every query batch with
MXU matmuls only —

  mean(s)  = m(s) + K_si alpha                       O(n m d + n m)
  var(s)   = k_ss - colsum((L^{-1} K_is)^2)          O(n^2 m)  (one matmul)
  cov/chol = K_ss - V^T V, safe_cholesky(m^3)        per joint-sample request

All per-class statistic semantics (WGP Gauss-Hermite moments, TP
posterior-df scaling, analytic quantiles, samplers, logpredictive) are
reused verbatim: the state rides in reserved ``_state_*`` params keys and
the posterior selectors pick it up (elliptical ``_whitened_cross`` /
``_scaling_fn``).

Why the state is BAKED into the query jits as closure constants instead of
passed as arguments: on the hosted TPU tunnel every jit dispatch pays per
argument *byte* even for arrays already on the device (measured: a trivial
jit taking the 4096^2 L^{-1} as an argument costs 32 ms/call — the runtime
re-ships/fingerprints args).  Closure constants are shipped once at compile
time; a query dispatch then carries only the query points.
"""

import copy
from types import MethodType

import numpy as np

from ..config import settings
from .stochastic import CompiledFn, _prep_matrix, _prep_vector

__all__ = ["Predictor", "AveragedPredictor", "IterativePredictor",
           "DistributedPredictor", "ExportedPredictor", "load_predictor"]


def _rff_prior(kernel, pj, x_like, n_features, samples, key):
    """Random-Fourier prior path builder shared by every pathwise sampler:
    ``prior(z) -> (len(z), samples)`` draws from the kernel's spectral
    density.  Supports SE/MAT32/MAT52 (ARD_L2) and sums of them (spectra
    ADD under kernel sums: one feature block per part); features are drawn
    over each part's ACTIVE dims only (dims-restricted kernels would
    otherwise get frequencies on columns the kernel ignores and silently
    wrong draws)."""
    import jax.numpy as jnp
    from jax import random as jrandom
    from ..hypers import hval, slice_dims
    from ..hypers.features import DeepKernel
    from ..hypers.kernels import SE, MAT32, MAT52, RQ, KernelSum
    from ..hypers.metrics import ARD_L2
    from ..ops.rff import rff_prior_fn

    _nu_of = {SE: None, MAT32: 1.5, MAT52: 2.5, RQ: None}

    def check_family(k):
        if type(k) not in _nu_of or type(k.metric) is not ARD_L2:
            raise ValueError(
                "pathwise sampling needs SE/MAT32/MAT52/RQ (ARD_L2) "
                "signal kernels, sums of them, or a DeepKernel over one "
                "(their spectral densities are what the Fourier features "
                f"draw from); got {type(k).__name__}")

    def flatten_sum(k):
        if isinstance(k, KernelSum):
            return flatten_sum(k.k1) + flatten_sum(k.k2)
        if isinstance(k, DeepKernel):
            # deep kernel: the prior is stationary in FEATURE space —
            # draw Fourier features of the base family and push queries
            # through the extractor
            check_family(k.base)
            return [k]
        check_family(k)
        return [k]

    parts = flatten_sum(kernel)
    x = jnp.asarray(x_like)
    f_each = max(n_features // len(parts), 64)
    priors = []
    for i, k in enumerate(parts):
        if isinstance(k, DeepKernel):
            inner, ndim = k.base, k.widths[-1]
            transform = (lambda z, kk=k: kk.features(pj, z))
        else:
            inner = k
            dims = k.metric.dims
            ndim = slice_dims(x, dims).shape[1]
            transform = (lambda z, d=dims: slice_dims(z, d))
        var = jnp.asarray(hval(inner.var, pj), settings.dtype)
        rates = jnp.asarray(hval(inner.metric.rate, pj), settings.dtype)
        rq_alpha = (jnp.asarray(hval(inner.alpha, pj), settings.dtype)
                    if type(inner) is RQ else None)
        p_act = rff_prior_fn(jrandom.fold_in(key, i), ndim, f_each,
                             rates, var, samples, nu=_nu_of[type(inner)],
                             rq_alpha=rq_alpha)
        priors.append((p_act, transform))

    def prior(z):
        out = priors[0][0](priors[0][1](z))
        for p_act, transform in priors[1:]:
            out = out + p_act(transform(z))
        return out

    return prior


class Predictor:
    """Bound (process, params, factorized posterior state) for streaming
    prediction.

    >>> pr = gp.predictor(params)          # one O(n^3) factorization
    >>> out = pr(x_query)                  # matmul-only statistics
    >>> mu = pr.mean(space=x_other)        # any statistic (keyword args)

    Internals: a shallow clone of the process whose ``_call_method`` bakes
    (hypers + posterior state + observed data) into per-statistic jitted
    functions of (space, vector) only.  Each statistic compiles once per
    query shape, then streams.

    The state snapshots the process's observed ``inputs``/``outputs`` at
    construction; changing them later (``observed``) invalidates the
    predictor — use raises, rebuild with ``process.predictor(params)``.
    Changing only the plotting ``space``/``hidden`` does not invalidate.
    """

    def __init__(self, process, params=None, _state=None):
        if params is None:
            params = process.params
        self.process = process
        self.params = dict(process.filter_params(params))
        self._inputs_ref = process._inputs
        self._outputs_ref = process._outputs
        # _state: a precomputed state dict (the incremental `updated` path)
        # — skips the O(n^3) factorization entirely
        state = (_state if _state is not None
                 else process.posterior_state(self.params))
        self.state = state

        import jax.numpy as jnp

        merged = {k: jnp.asarray(np.asarray(v, settings.floatx))
                  for k, v in self.params.items()}
        merged.update(state)

        clone = copy.copy(process)
        clone.compiles = {}
        inputs_c = jnp.asarray(process._inputs)
        outputs_c = jnp.asarray(process._outputs)

        def _call_method(cself, th_name, params=None, space=None, inputs=None,
                         outputs=None, vector=None, prior=False, noise=False,
                         array=False, *args, **kwargs):
            self._check()
            # footgun guard: pr.mean(xq) lands xq in the ignored params slot.
            # Internal statistic composition (the TP posterior-df and fused
            # bundle paths) legitimately threads the params dict and the
            # observed inputs/outputs through — only a non-mapping
            # positional params (an array = a query space) is the misuse.
            from collections.abc import Mapping as _Mapping

            if params is not None and not isinstance(params, _Mapping):
                raise TypeError(
                    "Predictor statistics take keyword arguments (space=, "
                    "vector=); params/inputs/outputs were baked at "
                    "construction.  A positional call like pr.mean(xq) lands "
                    "xq in the ignored params slot — use pr.mean(space=xq), "
                    "or rebuild with process.predictor(params) to change "
                    "hypers.")
            # read the process-side space at call time so set_space(new)
            # after construction is honored (only observed data invalidates)
            space = (self.process._space if space is None
                     else _prep_matrix(space))
            if vector is None:
                vector = np.zeros(len(space), dtype=settings.floatx)
            else:
                vector = _prep_vector(vector)
            name = cself._cache_name(th_name, prior, noise, args, kwargs)
            if name not in cself.compiles:
                pure = getattr(cself, th_name)(prior=prior, noise=noise,
                                               *args, **kwargs)

                def baked(s, v, _pure=pure):
                    return _pure(merged, s, inputs_c, outputs_c, v)

                cself.compiles[name] = CompiledFn(baked, name)
            return cself.compiles[name](space, vector)

        clone._call_method = MethodType(_call_method, clone)
        # the runtime statistic methods (mean/std/...) were bound on the
        # ORIGINAL instance at construction and close over it — rebind them
        # so they dispatch through the baked _call_method above
        for public, th_name in type(process)._dispatch_methods.items():
            if hasattr(process, public):
                setattr(clone, public,
                        clone._make_runtime_method(public, th_name))
        self._clone = clone

    # ------------------------------------------------------------------ guard
    def _check(self):
        if (self.process._inputs is not self._inputs_ref
                or self.process._outputs is not self._outputs_ref):
            raise ValueError(
                "the process's observed data changed after this Predictor's "
                "factorization — rebuild it with process.predictor(params)")

    # ------------------------------------------------------------ streaming
    def updated(self, x_new, y_new):
        """Absorb ``m`` NEW observations in O((n+m)^2 m) — no O(n^3)
        refactorization: the state's Cholesky factor is extended by the
        block identity (``EllipticalProcess._posterior_state_update_pure``)
        and a fresh Predictor is returned around it.

        Side effect (documented): the underlying process's observed data
        advances to the concatenation — this predictor instance becomes
        stale (its ``_check`` raises) and the returned one takes over; the
        reference had no streaming path at all (every ``observed`` change
        re-ran every compiled graph from scratch)."""
        import jax
        import jax.numpy as jnp
        from ..hypers.kernels import WN, KernelNoise

        self._check()
        proc = self.process
        # the block update builds CROSS grams; delta-matching kernels (WN,
        # KernelNoise) return var at coincident points on a two-argument
        # call but var*I on the square call a full refactor would use — a
        # streamed duplicate of an old input would silently diverge
        stack = [proc.f_kernel]
        while stack:
            k = stack.pop()
            if isinstance(k, (WN, KernelNoise)):
                raise ValueError(
                    "Predictor.updated does not support white-noise terms "
                    "(WN/KernelNoise) inside the signal kernel: their "
                    "cross-covariance semantics differ from the square "
                    "gram a full refactorization uses — rebuild with "
                    "process.predictor(params) instead")
            for attr in ("k1", "k2", "k_inner"):
                sub = getattr(k, attr, None)
                if sub is not None:
                    stack.append(sub)
        x_new = _prep_matrix(x_new)
        y_new = _prep_vector(y_new)
        pj = {k: jnp.asarray(np.asarray(v, settings.floatx))
              for k, v in self.params.items()}
        upd = proc._posterior_state_update_pure()
        new_state = jax.jit(upd)(pj, self.state,
                                 jnp.asarray(proc._inputs),
                                 jnp.asarray(x_new), jnp.asarray(y_new))
        x_cat = np.concatenate([np.asarray(proc._inputs), x_new])
        y_cat = np.concatenate([np.asarray(proc._outputs), y_new])
        proc.observed(x_cat, y_cat)
        return Predictor(proc, self.params, _state=new_state)

    # ---------------------------------------------------------- bundle pieces
    def _bundle_spec(self, mean=True, var=False, std=True, cov=False,
                     median=False, quantiles=False, quantiles_noise=False,
                     noise=False, prior=False):
        """(output key, th builder name or ("q", latent multiplier), noise)
        rows for the requested statistics — shared by the fused ``predict``
        path and ``export``."""
        clone = self._clone
        spec = []
        if mean:
            spec.append(("mean", "th_mean", noise))
        if var:
            spec.append(("variance", "th_variance", noise))
        if std:
            spec.append(("std", "th_std", noise))
        if cov:
            if clone.th_covariance(prior=prior, noise=noise) is None:
                raise ValueError(
                    f"{type(clone).__name__} has no analytic posterior "
                    "covariance (warped covariances have no closed form); "
                    "use samples= for an empirical covariance")
            spec.append(("covariance", "th_covariance", noise))
        if median:
            spec.append(("median", "th_median", noise))
        if (quantiles or quantiles_noise) \
                and not hasattr(clone, "_quantile_p"):
            raise ValueError(
                f"{type(clone).__name__} has no analytic latent-quantile "
                "hook (_quantile_p): fused/exported quantiles are "
                "unavailable — use the process-level quantiler (Monte "
                "Carlo) or export mean/std/var only")
        if quantiles:
            spec.append(("quantile_up",
                         ("q", clone._quantile_p(self.params, 0.975,
                                                 prior=prior, noise=noise)),
                         noise))
            spec.append(("quantile_down",
                         ("q", clone._quantile_p(self.params, 0.025,
                                                 prior=prior, noise=noise)),
                         noise))
        if quantiles_noise:
            spec.append(("noise_std", "th_std", True))
            spec.append(("noise_up",
                         ("q", clone._quantile_p(self.params, 0.975,
                                                 prior=prior, noise=True)),
                         True))
            spec.append(("noise_down",
                         ("q", clone._quantile_p(self.params, 0.025,
                                                 prior=prior, noise=True)),
                         True))
        return spec

    def _bundle_parts(self, spec, prior=False):
        """Materialize a spec into ``[(key, pure fn(params, space, inputs,
        outputs, vector))]`` parts."""
        clone = self._clone
        parts = []
        for out_key, s, nz in spec:
            if isinstance(s, tuple):  # latent quantile T(mu + p sd)
                loc_fn = clone.th_location(prior=prior, noise=nz)
                sd_fn = clone.th_kernel_sd(prior=prior, noise=nz)
                mapping = clone.f_mapping

                def f(params, sp, i, o, v, _l=loc_fn, _s=sd_fn,
                      _p=s[1], _m=mapping):
                    return _m(params, _l(params, sp, i, o, v)
                              + _p * _s(params, sp, i, o, v))
            else:
                f = getattr(clone, s)(prior=prior, noise=nz)
            parts.append((out_key, f))
        return parts

    # ----------------------------------------------------------- AOT export
    def export(self, path, mean=True, std=True, var=False, cov=False,
               median=False, quantiles=False, quantiles_noise=False,
               noise=False, prior=False, batch=None,
               platforms=("cpu", "tpu")):
        """Serialize this predictor as a SELF-CONTAINED serving artifact:
        one shape-polymorphic compiled statistic bundle (StableHLO via
        ``jax.export``) plus the factorized state — loadable with
        :func:`g3py_tpu.load_predictor` (or raw ``jax.export.deserialize``)
        on any machine with jax, NO model code, NO hypers, NO
        refactorization.  No reference counterpart: the reference pickles
        the whole model object and recompiles its Theano graphs from
        scratch at load (reference models.py:55-83).

        Writes ``path/bundle.bin`` (the exported function, lowered for
        every platform in ``platforms`` — export on CPU, serve on TPU),
        ``path/state.npz`` (hypers + posterior state + observed data; the
        dominant term is the n x n latent factor for dense states) and
        ``path/manifest.json``.

        ``batch=None`` exports with a SYMBOLIC query-batch dimension (any
        number of query points, one artifact); pass an int to pin the
        batch shape if a statistic's graph rejects shape polymorphism.
        Statistic flags mirror ``predict``; the artifact returns a dict
        with the same keys."""
        import json
        import os

        import jax
        import jax.numpy as jnp
        from jax import export as jexport

        self._check()
        spec = self._bundle_spec(mean=mean, var=var, std=std, cov=cov,
                                 median=median, quantiles=quantiles,
                                 quantiles_noise=quantiles_noise,
                                 noise=noise, prior=prior)
        if not spec:
            raise ValueError("export needs at least one statistic flag")
        parts = self._bundle_parts(spec, prior=prior)

        merged = {k: jnp.asarray(np.asarray(v, settings.floatx))
                  for k, v in self.params.items()}
        merged.update(self.state)
        state_tree = {"merged": merged,
                      "inputs": jnp.asarray(self.process._inputs),
                      "outputs": jnp.asarray(self.process._outputs)}

        def bundle(state, space, vector):
            return {k: fn(state["merged"], space, state["inputs"],
                          state["outputs"], vector)
                    for k, fn in parts}

        ndim = int(np.asarray(self.process._inputs).shape[1])
        dt = settings.dtype
        if batch is None:
            (b,) = jexport.symbolic_shape("b")
        else:
            b = int(batch)
        space_spec = jax.ShapeDtypeStruct((b, ndim), dt)
        vector_spec = jax.ShapeDtypeStruct((b,), dt)
        state_specs = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), state_tree)
        exp = jexport.export(jax.jit(bundle), platforms=list(platforms))(
            state_specs, space_spec, vector_spec)

        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "bundle.bin"), "wb") as fh:
            fh.write(exp.serialize())
        flat = {"inputs": np.asarray(state_tree["inputs"]),
                "outputs": np.asarray(state_tree["outputs"])}
        for k, v in merged.items():
            flat["merged/" + k] = np.asarray(v)
        np.savez(os.path.join(path, "state.npz"), **flat)
        with open(os.path.join(path, "manifest.json"), "w") as fh:
            json.dump({"format": 1,
                       "process": type(self.process).__name__,
                       "statistics": [k for k, _, _ in spec],
                       "platforms": list(platforms),
                       "symbolic_batch": batch is None,
                       "batch": batch,
                       "n_obs": int(np.asarray(
                           self.process._inputs).shape[0]),
                       "ndim": ndim,
                       "dtype": str(np.dtype(settings.floatx))}, fh,
                      indent=1)
        return path

    # ------------------------------------------------------------- statistics
    def predict(self, space=None, mean=True, std=True, var=False, cov=False,
                median=False, quantiles=False, quantiles_noise=False,
                samples=0, distribution=False, prior=False, noise=False,
                simulations=None, fused=True):
        """Full statistics dict (same keys as ``process.predict``).

        With ``fused=True`` (default) every requested analytic statistic is
        computed by ONE compiled call — one dispatch, one host sync per
        query batch instead of one per statistic (XLA CSE shares the
        location/sd subgraphs; quantiles use the class's latent-coefficient
        hook ``_quantile_p``).  Monte-Carlo ``simulations`` and ``fused=
        False`` fall back to the per-statistic path."""
        self._check()
        clone = self._clone
        if simulations is not None or not fused:
            return clone.predict(
                space=space, mean=mean, std=std, var=var, cov=cov,
                median=median, quantiles=quantiles,
                quantiles_noise=quantiles_noise, samples=samples,
                distribution=distribution, prior=prior, noise=noise,
                simulations=simulations)
        if not clone.is_observed:
            prior = True

        from ..utils import DictObj

        spec = self._bundle_spec(mean=mean, var=var, std=std, cov=cov,
                                 median=median, quantiles=quantiles,
                                 quantiles_noise=quantiles_noise,
                                 noise=noise, prior=prior)

        values = DictObj()
        if spec:
            bname = "th_bundle_" + ("prior__" if prior else "") + "__".join(
                k + (f"@{s[1]:.6g}" if isinstance(s, tuple) else "")
                + ("n" if nz else "")
                for k, s, nz in spec)
            if not hasattr(clone, bname):
                parts = self._bundle_parts(spec, prior=prior)

                def make_bundle(_parts):
                    def bundle_builder(prior=False, noise=False):
                        def bundle(params, sp, i, o, v):
                            return {k: fn(params, sp, i, o, v)
                                    for k, fn in _parts}
                        return bundle
                    return bundle_builder

                setattr(clone, bname, make_bundle(parts))
            out = clone._call_method(bname, space=space, prior=prior,
                                     noise=noise)
            values.update(out)
        if samples > 0:
            values["samples"] = clone.sampler(None, space, samples=samples,
                                              prior=prior, noise=noise)
        if distribution:
            values["logpredictive"] = lambda x: clone.logpredictive(
                None, space, vector=x, prior=prior, noise=True)
        return values

    def __call__(self, space=None, **kwargs):
        return self.predict(space=space, **kwargs)

    def pathwise_sampler(self, space=None, samples=1, key=0,
                         n_features=2048, noise=False):
        """Joint posterior draws by Matheron pathwise sampling (Wilson et
        al. 2020) against this predictor's baked state — batches drawn
        with the same key/feature set are CONSISTENT across calls (one
        continuous sample path evaluated anywhere), unlike the per-batch
        posterior-Cholesky ``sampler`` statistic.

        Dense state: f* = m + g_prior + K_sX (K+s2 I)^{-1}(r - g_X - eps),
        the update solve an O(n^2 S) matmul pair against the baked L^{-1}.
        Sparse (SGPR) state: u_s ~ q(u) in whitened coordinates
        (eps_s = LBt^{-T}(cw + sigma xi), cov sigma^2 Bt^{-1}) and
        f* = g_prior + V_s'(eps_s - Luu^{-1} g_prior(Z)) — O(m^2 S), no
        n-sized work at all.  SE/MAT32/MAT52 (ARD_L2) signal kernels.
        Returns (len(space), samples) pushed through the warping."""
        import jax.numpy as jnp
        from jax import random as jrandom
        from ..hypers import hval
        from ..hypers.kernels import KernelSum, KernelNoise
        from ..ops.linalg import (solve_lower_triangular,
                                  solve_upper_triangular)
        from ..ops.guards import to_num
        from .studentt import StudentTProcess

        self._check()
        proc, pj = self.process, self.params
        if isinstance(proc, StudentTProcess):
            raise ValueError(
                "pathwise sampling draws gaussian paths; the Student-t "
                "posterior needs the scale-mixture sampler statistic "
                "(pr.sampler / process.sampler) instead")
        space = _prep_matrix(space if space is not None
                             else self.process._space)
        kn = proc.f_kernel_noise
        nv = (hval(kn.k2.var, pj)
              if isinstance(kn, KernelSum) and isinstance(kn.k2, KernelNoise)
              else jnp.zeros((), settings.dtype))
        nv = jnp.asarray(nv, settings.dtype)
        if isinstance(key, int):
            key = jrandom.PRNGKey(key)
        k_prior, k_eps = jrandom.split(key)
        xq = jnp.asarray(space)

        from .sparse import (STATE_SGP_LBT, STATE_SGP_LUU, STATE_SGP_CW,
                             STATE_SGP_Z, STATE_SGP_S2)

        if STATE_SGP_LBT in self.state:
            z = self.state[STATE_SGP_Z]
            luu = self.state[STATE_SGP_LUU]
            lbt = self.state[STATE_SGP_LBT]
            cw = self.state[STATE_SGP_CW]
            s2 = self.state[STATE_SGP_S2]
            prior = _rff_prior(proc.f_kernel, pj, z, n_features, samples,
                               k_prior)
            xi = jrandom.normal(k_eps, (cw.shape[0], samples),
                                dtype=settings.dtype)
            # q(eps) = N(LBt^{-T} cw, s2 Bt^{-1}) in whitened coordinates
            eps_s = solve_upper_triangular(
                lbt.T, cw[:, None] + jnp.sqrt(s2) * xi)
            g_z = prior(z)
            h = eps_s - solve_lower_triangular(luu, g_z)
            v_s = solve_lower_triangular(
                luu, to_num(proc.f_kernel.cov(pj, z, xq)))
            latent = (proc.f_location(pj, xq)[:, None] + prior(xq)
                      + jnp.matmul(v_s.T, h,
                                   precision=settings.matmul_precision))
        else:
            from .elliptical import STATE_OBS_LINV

            x = jnp.asarray(proc._inputs)
            linv = self.state[STATE_OBS_LINV]
            prior = _rff_prior(proc.f_kernel, pj, x, n_features, samples,
                               k_prior)
            resid = (proc._latent_obs(pj, jnp.asarray(proc._outputs))
                     - proc.f_location(pj, x))
            g_x = prior(x)
            eps = jnp.sqrt(nv) * jrandom.normal(k_eps, g_x.shape,
                                                dtype=settings.dtype)
            a = jnp.matmul(
                linv.T,
                jnp.matmul(linv, resid[:, None] - g_x - eps,
                           precision=settings.matmul_precision),
                precision=settings.matmul_precision)
            cross = to_num(proc.f_kernel.cov(pj, xq, x))
            latent = (proc.f_location(pj, xq)[:, None] + prior(xq)
                      + jnp.matmul(cross, a,
                                   precision=settings.matmul_precision))
        if noise:
            latent = latent + jnp.sqrt(nv) * jrandom.normal(
                jrandom.fold_in(key, 104729), latent.shape,
                dtype=settings.dtype)
        flat = proc.f_mapping(pj, latent.reshape(-1))
        return np.asarray(flat).reshape(latent.shape)

    @property
    def executed(self):
        return self._clone.executed

    def __getattr__(self, name):
        # Delegate any statistic (mean/std/quantiler/sampler/
        # logpredictive/...) to the baked clone.  Arguments must be passed
        # by keyword (the positional slot of the runtime methods is params,
        # which the baked path ignores).
        if name.startswith("_"):
            raise AttributeError(name)
        target = getattr(self._clone, name)
        if not callable(target):
            raise AttributeError(name)

        def bound(*args, **kwargs):
            self._check()
            return target(*args, **kwargs)

        bound.__name__ = name
        return bound


class ExportedPredictor:
    """A serving artifact written by :meth:`Predictor.export`, reloaded:
    statistics stream from the deserialized StableHLO bundle and the saved
    state — no model object, no hypers, no factorization, no g3py_tpu
    compute code on the serving path (the loader itself is model-free).

    >>> pr.export("/models/gp_v3", quantiles=True)
    >>> ep = g3.load_predictor("/models/gp_v3")     # any machine with jax
    >>> out = ep(x_query)                            # dict of statistics
    >>> mu = ep.mean(x_query)

    Exported with a symbolic batch dimension the artifact accepts any
    number of query points; fixed-batch artifacts raise on other sizes.
    Single-statistic access (``ep.mean`` / ``ep.std`` / ...) runs the same
    one-dispatch bundle and selects the key."""

    def __init__(self, path):
        import json
        import os

        import jax.numpy as jnp
        from jax import export as jexport

        with open(os.path.join(path, "manifest.json")) as fh:
            self.manifest = json.load(fh)
        with open(os.path.join(path, "bundle.bin"), "rb") as fh:
            self._exported = jexport.deserialize(fh.read())
        data = np.load(os.path.join(path, "state.npz"))
        merged = {k[len("merged/"):]: jnp.asarray(data[k])
                  for k in data.files if k.startswith("merged/")}
        self._state = {"merged": merged,
                       "inputs": jnp.asarray(data["inputs"]),
                       "outputs": jnp.asarray(data["outputs"])}
        self.statistics = list(self.manifest["statistics"])
        self.path = path
        # Re-jit around the exported call with the state as CLOSURE
        # constants: hosted runtimes pay dispatch cost per argument byte
        # (see module docstring), so the n^2-sized state must ride in the
        # executable, not the argument list.  Cost: one (cheap) wrapper
        # compile per query-batch shape.
        import jax

        self._call = jax.jit(
            lambda space, vector: self._exported.call(self._state, space,
                                                      vector))

    def predict(self, space, vector=None):
        """All exported statistics for a query batch, one dispatch."""
        from ..utils import DictObj

        space = _prep_matrix(space)
        if vector is None:
            vector = np.zeros(len(space), dtype=self.manifest["dtype"])
        else:
            vector = _prep_vector(vector)
        out = self._call(space, vector)
        return DictObj({k: np.asarray(v) for k, v in out.items()})

    def __call__(self, space, vector=None):
        return self.predict(space, vector=vector)

    def __getattr__(self, name):
        if name.startswith("_") or name not in self.__dict__.get(
                "statistics", ()):
            raise AttributeError(name)

        def stat(space, vector=None, _k=name):
            return self.predict(space, vector=vector)[_k]

        stat.__name__ = name
        return stat


def load_predictor(path):
    """Load a serving artifact written by :meth:`Predictor.export`."""
    return ExportedPredictor(path)


class _LatentStatisticsMixin:
    """Statistics of a gaussian latent posterior (mu, sd) mapped through
    the process's warping — shared by every factorization-free serving
    backend (iterative single-chip, distributed multi-chip).  The backend
    provides ``_moments(space, noise=..., **kw) -> (mu, sd)`` (numpy) and
    ``self.process`` / ``self.params``; the mixin supplies the class
    semantics: GH-quadrature moments for non-identity mappings, analytic
    quantiles ``T(mu + p sd)`` (reference gaussian.py:56-174)."""

    def _space_or_default(self, space):
        return space if space is not None else self.process._space

    def _moments_memo(self, space, noise=False, **kw):
        """Memoized ``_moments``: ``predict(quantiles=True, var=True, ...)``
        derives every statistic from the same (mu, sd), so the posterior
        solve (multi-RHS PCG / sharded TRSM — seconds at N=50k) must run
        once per (space, noise) rather than once per statistic."""
        self._check()  # memo hits must not bypass the stale-data guard
        space = _prep_matrix(space)
        key = (space.tobytes(), space.shape, bool(noise),
               tuple(sorted(kw.items())))
        cache = self.__dict__.setdefault("_mom_cache", {})
        if key not in cache:
            if len(cache) >= 8:
                cache.pop(next(iter(cache)))
            cache[key] = self._moments(space, noise=noise, **kw)
        return cache[key]

    def _is_identity(self):
        from ..hypers.mappings import Identity

        return isinstance(self.process.f_mapping, Identity)

    def mean(self, space=None, noise=False, **kw):
        mu, sd = self._moments_memo(self._space_or_default(space),
                                    noise=noise, **kw)
        if self._is_identity():
            return mu
        from ..ops.quadrature import gauss_hermite
        import jax.numpy as jnp

        mapping, pj = self.process.f_mapping, self.params
        return np.asarray(gauss_hermite(lambda v: mapping(pj, v),
                                        jnp.asarray(mu), jnp.asarray(sd),
                                        n=settings.quadrature_degree))

    def std(self, space=None, noise=False, **kw):
        mu, sd = self._moments_memo(self._space_or_default(space),
                                    noise=noise, **kw)
        if self._is_identity():
            return sd
        from ..ops.quadrature import gauss_hermite
        import jax.numpy as jnp

        mapping, pj = self.process.f_mapping, self.params
        m1 = gauss_hermite(lambda v: mapping(pj, v), jnp.asarray(mu),
                           jnp.asarray(sd), n=settings.quadrature_degree)
        m2 = gauss_hermite(lambda v: mapping(pj, v) ** 2, jnp.asarray(mu),
                           jnp.asarray(sd), n=settings.quadrature_degree)
        return np.sqrt(np.maximum(np.asarray(m2 - m1 ** 2), 1e-30))

    def variance(self, space=None, noise=False, **kw):
        return self.std(space, noise=noise, **kw) ** 2

    def quantiler(self, space=None, q=0.975, noise=False, **kw):
        mu, sd = self._moments_memo(self._space_or_default(space),
                                    noise=noise, **kw)
        p = self.process._quantile_p(self.params, q, noise=noise)
        mapping, pj = self.process.f_mapping, self.params
        return np.asarray(mapping(pj, mu + p * sd))

    def median(self, space=None, **kw):
        mu, _ = self._moments_memo(self._space_or_default(space), **kw)
        mapping, pj = self.process.f_mapping, self.params
        return np.asarray(mapping(pj, mu))

    def logpredictive(self, vector, space=None, **kw):
        """Independent-marginal log-predictive of ``vector`` at the query
        points — the same diagonal-posterior-cholesky semantics as
        ``th_logpredictive`` (reference gaussian.py:42-54): latent normal
        density of the warping pullback at (mu, sd_noise) plus the
        pullback's log-Jacobian.  Powers ``_nlpd`` scoring for the
        factorization-free serving paths."""
        import jax.numpy as jnp

        mu, sd = self._moments_memo(self._space_or_default(space),
                                    noise=True, **kw)
        mapping, pj = self.process.f_mapping, self.params
        v = jnp.asarray(np.asarray(vector, settings.floatx))
        tinv = np.asarray(mapping.inv(pj, v))
        logdet = float(np.asarray(mapping.logdet_dinv(pj, v)))
        z = (tinv - mu) / sd
        return float(np.sum(-0.5 * np.log(2.0 * np.pi) - np.log(sd)
                            - 0.5 * z * z) + logdet)

    def predict(self, space=None, mean=True, std=True, var=False,
                median=False, quantiles=False, quantiles_noise=False,
                noise=False, distribution=False, samples=0, **kw):
        from ..utils import DictObj

        values = DictObj()
        if samples > 0:
            values["samples"] = self.sampler(space=space, samples=samples,
                                             noise=noise)
        if distribution:
            values["logpredictive"] = (
                lambda v, _s=space, _kw=dict(kw): self.logpredictive(
                    v, space=_s, **_kw))
        if mean:
            values["mean"] = self.mean(space, noise=noise, **kw)
        if std:
            values["std"] = self.std(space, noise=noise, **kw)
        if var:
            values["variance"] = self.variance(space, noise=noise, **kw)
        if median:
            values["median"] = self.median(space, **kw)
        if quantiles:
            values["quantile_up"] = self.quantiler(space, q=0.975,
                                                   noise=noise, **kw)
            values["quantile_down"] = self.quantiler(space, q=0.025,
                                                     noise=noise, **kw)
        if quantiles_noise:
            values["noise_std"] = self.std(space, noise=True, **kw)
            values["noise_up"] = self.quantiler(space, q=0.975, noise=True,
                                                **kw)
            values["noise_down"] = self.quantiler(space, q=0.025, noise=True,
                                                  **kw)
        return values

    def _pathwise_draws(self, space, samples, key, n_features, noise,
                        solve, cross_apply):
        """Shared Matheron pathwise core (ops/rff.py; Wilson et al. 2020):

            f*(s) = m(s) + g_prior(s) + K_sX (K+sigma^2 I)^{-1}
                                        (resid - g_prior(X) - eps)

        The backend supplies ``solve(rhs (n, S)) -> a (n, S)`` (multi-RHS
        PCG or exact sharded TRSMs) and ``cross_apply(xq, a) -> (m, S)``
        = K_qX a.  Prior features are drawn over the kernel metric's
        ACTIVE dims only (dims-restricted kernels — e.g. SE([0]) on
        multi-output inputs — would otherwise get frequencies on columns
        the kernel ignores and silently wrong draws)."""
        import jax
        import jax.numpy as jnp
        from jax import random as jrandom

        self._check()
        proc, pj = self.process, self.params
        space = _prep_matrix(self._space_or_default(space))
        x = jnp.asarray(proc._inputs)
        nv = jnp.asarray(self._noise_var, settings.dtype)
        if isinstance(key, int):
            key = jrandom.PRNGKey(key)
        k_prior, k_eps = jrandom.split(key)
        prior = _rff_prior(proc.f_kernel, pj, x, n_features, samples,
                           k_prior)

        yout = jnp.asarray(proc._outputs)
        resid = proc._latent_obs(pj, yout) - proc.f_location(pj, x)
        g_x = prior(x)  # (n, S)
        eps = jnp.sqrt(nv) * jrandom.normal(k_eps, g_x.shape,
                                            dtype=settings.dtype)
        a = solve(resid[:, None] - g_x - eps)  # (n, S)

        xq = jnp.asarray(space)
        latent = (proc.f_location(pj, xq)[:, None] + prior(xq)
                  + cross_apply(xq, a))
        if noise:
            latent = latent + jnp.sqrt(nv) * jrandom.normal(
                jrandom.fold_in(key, 104729), latent.shape,
                dtype=settings.dtype)
        # one mapping call over the flattened draws (mappings are
        # elementwise): one device round trip instead of one per sample
        mapping = proc.f_mapping
        flat = mapping(pj, latent.reshape(-1))
        return np.asarray(flat).reshape(latent.shape)

    def __call__(self, space=None, **kwargs):
        return self.predict(space=space, **kwargs)


class IterativePredictor(_LatentStatisticsMixin):
    """Streaming serving for training sets too large to factor (the N=50k
    stretch scale): NO O(n^3) factorization and NO n x n matrix, ever.

    Completes the large-N user story next to ``find_MAP(engine=
    'iterative')``: train matrix-free, then serve matrix-free.

    State (one preconditioned-CG solve + one rank-R pivoted Cholesky,
    ops/iterative.py):

      alpha = (K + sigma^2 I)^{-1} (T^{-1}y - m)     (PCG, exact to tol)
      L_R   = rank-R pivoted Cholesky of K           (the preconditioner)

    Queries (per batch, blocked cross-grams only):

      mean(s)  = T-moment of  mu* = m(s) + K_sX alpha          (exact)
      var(s)   ~ k_ss - diag(K_sX P^{-1} K_Xs),  P = L_R L_R^T + sigma^2 I

    The default variance is EXACT (``exact_var=True``): batched PCG solves
    against the cross-gram — one n-dim CG per query point, matching the
    dense path to ~1e-4 relative (measured at n=1024).  ``exact_var=False``
    substitutes the rank-R Woodbury sketch (one O(nR) apply per point) —
    use only for quick-look bands: although exact-arithmetic theory makes
    it an underestimate, in float32 the pivoted-Cholesky factors degrade
    and the interior variance can read ~5% of the PRIOR variance instead
    of the noise floor, non-monotonically in ``rank`` (measured; see
    tests).  Warped moments/quantiles follow the class semantics: analytic
    quantiles ``T(mu + p sd)`` and Gauss-Hermite moments for non-identity
    mappings (reference gaussian.py:56-174).
    """

    def __init__(self, process, params=None, rank=64, block=2048,
                 cg_iters=200, tol=1e-6, dtype=None):
        import jax
        import jax.numpy as jnp
        from ..hypers import hval
        from ..hypers.kernels import KernelSum, KernelNoise
        from ..ops.iterative import (lazy_kernel_matvec, pivoted_cholesky,
                                     woodbury_preconditioner, pcg_solve)
        from .elliptical import _contains_kernel_noise

        from .gaussian import GaussianProcess

        if not isinstance(process, GaussianProcess):
            raise ValueError("IterativePredictor implements the gaussian "
                             "posterior algebra (GP/WGP family); the "
                             "Student-t posterior needs the dense path")
        if params is None:
            params = process.params
        kn = process.f_kernel_noise
        if not (isinstance(kn, KernelSum) and isinstance(kn.k2, KernelNoise)):
            raise ValueError("IterativePredictor needs the noisy=True "
                             "KernelSum(kernel, KernelNoise) construction")
        if _contains_kernel_noise(process.f_kernel):
            raise ValueError("IterativePredictor does not support "
                             "KernelNoise terms inside the signal kernel "
                             "(cross-covariances would silently drop it)")
        # serve-time precision: dtype='float64' runs the ENTIRE solve
        # pipeline (preconditioner build, Woodbury apply, CG matvec,
        # cross-gram statistics) in f64 — the measured reopening of the
        # near-interpolation envelope (docs/performance.md round-4 2x2:
        # f64 in the preconditioner ALONE is catastrophically worse, f64
        # CG over an f32 factor still stalls; only the full-f64 solve
        # converges).  f64 is native on CPU, emulated (~an order slower)
        # on TPU; the state solve happens once.
        import contextlib

        if dtype is None:
            self._dt = settings.dtype
            self._x64 = lambda: contextlib.nullcontext()
        else:
            self._dt = jnp.dtype(dtype)
            if self._dt == jnp.dtype("float64"):
                self._x64 = lambda: jax.enable_x64(True)
            else:
                self._x64 = lambda: contextlib.nullcontext()
        self.process = process
        self._inputs_ref = process._inputs
        self._outputs_ref = process._outputs
        self.rank, self.block, self.cg_iters = rank, block, cg_iters

        kernel = process.f_kernel
        with self._x64():
            # params conversion must sit INSIDE the x64 context or JAX
            # silently truncates genuinely-f64 trained params back to f32
            # (ADVICE r4)
            self.params = {k: jnp.asarray(np.asarray(v, self._dt))
                           for k, v in process.filter_params(params).items()}
            pj = self.params
            x = jnp.asarray(np.asarray(process._inputs), self._dt)
            yout = jnp.asarray(np.asarray(process._outputs), self._dt)
            noise_var = jnp.asarray(hval(kn.k2.var, pj), self._dt)
            n = x.shape[0]

            @jax.jit
            def build_state():
                latent = process._latent_obs(pj, yout)
                resid = latent - process.f_location(pj, x)

                def mv(v):
                    return lazy_kernel_matvec(kernel, pj, x, v,
                                              block=block) + noise_var * v

                def column_fn(j):
                    xj = jax.lax.dynamic_slice(x, (j, 0), (1, x.shape[1]))
                    return kernel.cov(pj, x, xj)[:, 0]

                diag_f = jax.vmap(lambda i: kernel.cov(
                    pj, jax.lax.dynamic_slice(
                        x, (i, 0), (1, x.shape[1])))[0, 0]
                )(jnp.arange(n))
                l_factor = pivoted_cholesky(column_fn, diag_f, rank)
                p_inv, _, _ = woodbury_preconditioner(l_factor, noise_var)
                alpha = pcg_solve(mv, resid, p_inv, tol=tol,
                                  maxiter=cg_iters)
                rel = jnp.linalg.norm(mv(alpha) - resid) / jnp.maximum(
                    jnp.linalg.norm(resid), 1e-30)
                return alpha, l_factor, rel

            alpha, l_factor, rel = build_state()
        self.alpha = alpha
        self.l_factor = l_factor
        self.cg_rel_residual = float(rel)
        if not np.isfinite(self.cg_rel_residual) \
                or self.cg_rel_residual > 5e-2:
            # hardening (same philosophy as find_MAP(engine='iterative')):
            # an unconverged solve would silently serve garbage statistics
            raise ValueError(
                "IterativePredictor: the preconditioned CG solve did not "
                f"converge (relative residual {self.cg_rel_residual:.2e}); "
                "raise cg_iters/rank, or check the hyperparameters — an "
                "ill-conditioned gram (e.g. near-zero noise or extreme "
                "lengthscales) can exceed float32 CG's reach")
        self._x = x
        self._noise_var = noise_var
        self._kernel = kernel
        self.compiles = {}

    def _check(self):
        if (self.process._inputs is not self._inputs_ref
                or self.process._outputs is not self._outputs_ref):
            raise ValueError(
                "the process's observed data changed after this "
                "IterativePredictor's solve — rebuild it")

    def _latent_fn(self, exact_var=True):
        """Jitted (space) -> (mu_latent, var_latent) with state baked."""
        import jax
        import jax.numpy as jnp
        from ..ops.iterative import (lazy_kernel_matvec, pcg_solve,
                                     woodbury_preconditioner)

        key = ("latent", exact_var)
        if key in self.compiles:
            return self.compiles[key]
        proc, pj = self.process, self.params
        kernel, x = self._kernel, self._x
        alpha, l_factor, nv = self.alpha, self.l_factor, self._noise_var
        block, cg_iters = self.block, self.cg_iters

        dt = self._dt

        @jax.jit
        def fn(space):
            space = jnp.asarray(space, dt)
            cross = kernel.cov(pj, space, x)  # (m, n) blocked by caller
            mu = proc.f_location(pj, space) + jnp.matmul(
                cross, alpha, precision=jax.lax.Precision.HIGHEST)
            kss = jax.vmap(lambda i: kernel.cov(
                pj, jax.lax.dynamic_slice(space, (i, 0),
                                          (1, space.shape[1])))[0, 0]
            )(jnp.arange(space.shape[0]))
            if exact_var:
                def mv(v):
                    return lazy_kernel_matvec(kernel, pj, x, v,
                                              block=block) + nv * v

                p_inv, _, _ = woodbury_preconditioner(l_factor, nv)
                z = pcg_solve(mv, cross, p_inv, maxiter=cg_iters)  # (m, n)
                var = kss - jnp.sum(cross * z, axis=1)
            else:
                p_inv, _, _ = woodbury_preconditioner(l_factor, nv)
                var = kss - jnp.sum(cross.T * p_inv(cross.T), axis=0)
            return mu, jnp.maximum(var, 0.0)

        self.compiles[key] = fn
        return fn

    def _moments(self, space, noise=False, exact_var=True, chunk=4096):
        self._check()
        space = _prep_matrix(space)
        import jax.numpy as jnp

        if len(space) == 0:
            e = np.zeros(0, settings.floatx)
            return e, e
        fn = self._latent_fn(exact_var=exact_var)
        mus, vs = [], []
        with self._x64():
            for lo in range(0, len(space), chunk):
                mu, v = fn(jnp.asarray(space[lo:lo + chunk]))
                mus.append(np.asarray(mu))
                vs.append(np.asarray(v))
        mu = np.concatenate(mus).astype(settings.floatx)
        var = np.concatenate(vs)
        if noise:
            var = var + float(self._noise_var)
        return mu, np.sqrt(np.maximum(var, 1e-30)).astype(settings.floatx)

    # statistics come from the shared latent-moments mixin (below)

    def sampler(self, space=None, samples=1, key=0, n_features=2048,
                noise=False):
        """Joint posterior draws WITHOUT a factorization: the shared
        Matheron pathwise core (``_pathwise_draws``) with a multi-RHS PCG
        update solve for all ``samples`` paths at once.  Returns
        ``(len(space), samples)`` pushed through the warping, matching
        ``process.sampler``'s contract (reference gaussian.py:75-97 —
        which needs an O(m^3) posterior Cholesky per batch and cannot run
        at this predictor's training sizes).  SE/MAT32/MAT52 (ARD_L2)
        signal kernels; feature error is O(1/sqrt(n_features))."""
        import jax
        import jax.numpy as jnp
        from ..ops.iterative import (lazy_kernel_matvec, pcg_solve,
                                     woodbury_preconditioner)

        kernel, pj, x = self._kernel, self.params, self._x
        nv = jnp.asarray(self._noise_var, self._dt)

        def mv(v):
            return lazy_kernel_matvec(kernel, pj, x, v,
                                      block=self.block) + nv * v

        def solve(rhs):
            rhs = jnp.asarray(rhs, self._dt)
            p_inv, _, _ = woodbury_preconditioner(self.l_factor, nv)
            a = pcg_solve(mv, rhs.T, p_inv, maxiter=self.cg_iters).T
            # hardening (same as the state build): unconverged path solves
            # would silently return garbage draws
            res = mv(a) - rhs
            rel = float(jnp.max(jnp.linalg.norm(res, axis=0)
                                / jnp.maximum(jnp.linalg.norm(rhs, axis=0),
                                              1e-30)))
            if not np.isfinite(rel) or rel > 5e-2:
                raise ValueError(
                    "pathwise sampler: the multi-RHS PCG solve did not "
                    f"converge (worst relative residual {rel:.2e}); raise "
                    "cg_iters (path right-hand sides contain white-noise "
                    "components that need more iterations than the data "
                    "solve) or rank")
            return a

        def cross_apply(xq, a):
            # chunk query rows so the (m_chunk, n) cross gram stays bounded
            xq = jnp.asarray(xq, self._dt)
            outs = [jnp.matmul(kernel.cov(pj, xq[lo:lo + 4096], x), a,
                               precision=jax.lax.Precision.HIGHEST)
                    for lo in range(0, xq.shape[0], 4096)]
            out = outs[0] if len(outs) == 1 else jnp.concatenate(outs)
            return jnp.asarray(out, settings.dtype)

        with self._x64():
            return self._pathwise_draws(space, samples, key, n_features,
                                        noise, solve, cross_apply)


class DistributedPredictor(_LatentStatisticsMixin):
    """Multi-chip serving for models trained with
    ``find_MAP(engine='distributed')``: the observed gram is factored ONCE
    by the cooperative band Cholesky and stays row-band-sharded across the
    mesh; every query batch costs one per-device band cross-gram, a
    sharded TRSM, and two psums (parallel/cholesky.py
    ``distributed_posterior``).  Neither the n x n gram nor the n x m
    cross matrix ever exists unsharded — the serving counterpart of
    ``nll_distributed``, completing the train-distributed /
    serve-distributed story.

    Statistics follow the gaussian class semantics via the shared latent
    mixin (GH moments for warped mappings, analytic quantiles)."""

    def __init__(self, process, params=None, mesh=None, block=None,
                 axis="dp"):
        import jax.numpy as jnp
        from ..parallel.cholesky import distributed_posterior
        from .gaussian import GaussianProcess

        if not isinstance(process, GaussianProcess):
            raise ValueError("DistributedPredictor implements the gaussian "
                             "posterior algebra (GP/WGP family)")
        if params is None:
            params = process.params
        mesh, cov_fn, noise_fn = process._distributed_parts(
            mesh, axis, what="DistributedPredictor")
        self.process = process
        self.params = {k: jnp.asarray(np.asarray(v, settings.floatx))
                       for k, v in process.filter_params(params).items()}
        self._inputs_ref = process._inputs
        self._outputs_ref = process._outputs
        self._cov_fn = cov_fn
        self._mesh = mesh

        state_fn, query_fn, solve_fn, apply_fn = distributed_posterior(
            cov_fn, mesh=mesh, block=block, axis=axis, noise_fn=noise_fn)
        self._solve_fn = solve_fn
        self._apply_fn = apply_fn
        pj = self.params
        x = jnp.asarray(process._inputs)
        yout = jnp.asarray(process._outputs)
        resid = (process._latent_obs(pj, yout)
                 - process.f_location(pj, x))
        self._x = x
        self._noise_var = float(np.asarray(noise_fn(pj)))
        self._l, self._alpha = state_fn(pj, x, resid)
        self._query_fn = query_fn

    def _check(self):
        if (self.process._inputs is not self._inputs_ref
                or self.process._outputs is not self._outputs_ref):
            raise ValueError(
                "the process's observed data changed after this "
                "DistributedPredictor's factorization — rebuild it")

    def sampler(self, space=None, samples=1, key=0, n_features=2048,
                noise=False):
        """Joint posterior draws with the gram still band-sharded: the
        shared Matheron pathwise core with an EXACT update solve (two
        sharded TRSMs against the band factor, no CG) and a band-sharded
        cross-apply — neither the n x n gram nor the n x m cross matrix
        exists unsharded.  SE/MAT32/MAT52 (ARD_L2) signal kernels."""
        return self._pathwise_draws(
            space, samples, key, n_features, noise,
            solve=lambda rhs: self._solve_fn(self._l, rhs),
            cross_apply=lambda xq, a: self._apply_fn(
                self.params, self._x, xq, a))

    def _moments(self, space, noise=False, chunk=4096):
        self._check()
        import jax
        import jax.numpy as jnp

        space = _prep_matrix(space)
        if len(space) == 0:
            e = np.zeros(0, settings.floatx)
            return e, e
        proc, pj = self.process, self.params
        mus, vs = [], []
        for lo in range(0, len(space), chunk):
            xq = jnp.asarray(space[lo:lo + chunk])
            md, vr = self._query_fn(pj, self._x, self._l, self._alpha, xq)
            kss = jax.vmap(lambda i: self._cov_fn(
                pj, jax.lax.dynamic_slice(xq, (i, 0), (1, xq.shape[1])),
                jax.lax.dynamic_slice(xq, (i, 0),
                                      (1, xq.shape[1])))[0, 0]
            )(jnp.arange(xq.shape[0]))
            mu = proc.f_location(pj, xq) + md
            mus.append(np.asarray(mu))
            vs.append(np.maximum(np.asarray(kss) - np.asarray(vr), 0.0))
        mu = np.concatenate(mus)
        var = np.concatenate(vs)
        if noise:
            var = var + self._noise_var
        return mu, np.sqrt(np.maximum(var, 1e-30))


class AveragedPredictor:
    """Streaming Bayesian model average: one factorization PER DATATRACE
    ROW, then every query batch is row-parallel matmuls + an average.

    ``process.average(datatrace, ...)`` (the reference's flagship Bayesian
    output, reference models.py:489-519) re-factorizes every row's gram
    inside every statistic of every call.  Here the per-row states
    (L^{-1}, alpha, z) are computed once by a vmapped
    ``_posterior_state_pure`` and baked into vmapped statistic programs:
    a query batch costs O(R n m d + R n^2 m) MXU work with no Cholesky.

    >>> ap = gp.averaged_predictor(dt)       # R factorizations, one vmap
    >>> out = ap(x_query, quantiles=True)    # averaged statistics
    >>> out["_l1"], out["_l2"]               # scores vs hidden, like average()

    Memory: the stacked state is R x n_obs^2 floats (capped by
    ``max_rows``; rows are subsampled evenly beyond it, matching the
    average's Monte-Carlo nature).
    """

    def __init__(self, process, datatrace, max_rows=64):
        import jax
        import jax.numpy as jnp

        rows = (process._datatrace_rows(datatrace)
                if hasattr(datatrace, "iterrows") else
                np.asarray(datatrace, settings.floatx))
        if rows.ndim == 1:
            rows = rows[None, :]
        if len(rows) > max_rows:
            sel = np.linspace(0, len(rows) - 1, max_rows).astype(int)
            rows = rows[sel]
        self.process = process
        self.rows = np.asarray(rows, settings.floatx)
        self._inputs_ref = process._inputs
        self._outputs_ref = process._outputs

        reg = process.active
        inputs_c = jnp.asarray(process._inputs)
        outputs_c = jnp.asarray(process._outputs)
        rows_d = jnp.asarray(self.rows)
        params_rows = jax.vmap(reg.array_to_dict_jax)(rows_d)
        state_pure = process._posterior_state_pure()
        state_rows = jax.jit(jax.vmap(
            lambda p: state_pure(p, inputs_c, outputs_c)))(params_rows)
        merged_rows = dict(params_rows)
        merged_rows.update(state_rows)
        self.state_rows = state_rows

        clone = copy.copy(process)
        clone.compiles = {}

        def _call_method_vrows(cself, th_name, rows_, space=None, inputs=None,
                               outputs=None, vector=None, vector_rows=None,
                               prior=False, noise=False, *args, **kwargs):
            self._check()
            if inputs is not None or outputs is not None:
                raise TypeError(
                    "AveragedPredictor statistics take keyword arguments "
                    "(space=, vector=); inputs/outputs were baked at "
                    "construction — rebuild to change the observed data.")
            space = (self.process._space if space is None
                     else _prep_matrix(space))
            per_row_vec = vector_rows is not None
            if per_row_vec:
                vector = np.asarray(vector_rows, dtype=settings.floatx)
            elif vector is None:
                vector = np.zeros(len(space), dtype=settings.floatx)
            else:
                vector = _prep_vector(vector)
            name = ("avrows_" + ("pv_" if per_row_vec else "")
                    + cself._cache_name(th_name, prior, noise, args, kwargs))
            if name not in cself.compiles:
                pure = getattr(cself, th_name)(prior=prior, noise=noise,
                                               *args, **kwargs)

                def apure(prow, s, v, _pure=pure):
                    return _pure(prow, s, inputs_c, outputs_c, v)

                vm = jax.vmap(apure,
                              in_axes=(0, None, 0 if per_row_vec else None))

                def baked(s, v, _vm=vm):
                    return _vm(merged_rows, s, v)

                cself.compiles[name] = CompiledFn(baked, name)
            return cself.compiles[name](space, vector)

        clone._call_method_vrows = MethodType(_call_method_vrows, clone)
        self._clone = clone

    def _check(self):
        if (self.process._inputs is not self._inputs_ref
                or self.process._outputs is not self._outputs_ref):
            raise ValueError(
                "the process's observed data changed after this "
                "AveragedPredictor's factorizations — rebuild it")
        return self

    def batch(self, space=None, **kwargs):
        """Per-row statistics (leading row axis), like
        ``process.batch_predict``, with the factorizations reused."""
        self._check()
        return self._clone.batch_predict(self.rows, space=space, **kwargs)

    def predict(self, space=None, scores=False, **kwargs):
        """Row-averaged statistics (the ``average()`` output keys);
        ``scores=True`` adds ``_l1``/``_l2`` against the process's current
        ``hidden`` when the query space matches it."""
        from ..utils import DictObj

        batch = self.batch(space=space, **kwargs)
        out = DictObj({k: np.asarray(v, np.float64).mean(axis=0)
                       for k, v in batch.items()})
        hidden = self.process.hidden
        if scores and hidden is not None and "mean" in batch \
                and np.shape(batch["mean"])[-1] == len(hidden):
            resid = np.asarray(batch["mean"], np.float64) - hidden
            out["_l1"] = float(np.mean(np.abs(resid)))
            out["_l2"] = float(np.mean(resid ** 2))
        return out

    def __call__(self, space=None, **kwargs):
        return self.predict(space=space, **kwargs)
