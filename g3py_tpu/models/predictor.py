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

__all__ = ["Predictor", "AveragedPredictor"]


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

    def __init__(self, process, params=None):
        if params is None:
            params = process.params
        self.process = process
        self.params = dict(process.filter_params(params))
        self._inputs_ref = process._inputs
        self._outputs_ref = process._outputs
        state = process.posterior_state(self.params)
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

        spec = []  # (output key, th builder name or ("q", p), noise flag)
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

        values = DictObj()
        if spec:
            bname = "th_bundle_" + ("prior__" if prior else "") + "__".join(
                k + (f"@{s[1]:.6g}" if isinstance(s, tuple) else "")
                + ("n" if nz else "")
                for k, s, nz in spec)
            if not hasattr(clone, bname):
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
