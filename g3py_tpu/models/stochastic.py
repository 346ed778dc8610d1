"""StochasticProcess — the abstract model driving every process family.

TPU-native rebuild of the reference ``StochasticProcess``
(``/root/reference/g3py/processes/stochastic.py``).  Architectural mapping:

* Theano shared variables + ``makefn`` compile cache + ``types.MethodType``
  rebinding (reference :46-71, :328-430)  ->  host numpy data attributes +
  pure jax functions of ``(params, space, inputs, outputs, vector)`` jitted
  and cached in ``self.compiles`` under the reference's cache-key naming
  (``posterior_mean``, ``array_posterior_logp``, ...), with per-function
  ``executed`` counters.
* PyMC3 RV registration -> :class:`~g3py_tpu.bayesian.registry.GraphicalModel`
  param registry (shared across processes for graphical models).
* ``th_logp`` = prior terms + observed loglikes + potentials
  (reference :300-313); the ``array_*`` variants take the unconstrained flat
  vector and differentiate through the bijection with ``jax.grad``.
* ``fixed_*`` Rao-Blackwellized logps (reference :523-564) are vmapped over
  the pinned chain instead of Python loops.
* ``find_MAP`` multi-start alternating BFGS/Powell (reference :566-674) and
  ``sample_hypers`` ensemble-MCMC driver (reference :676-800) keep their
  recipes; chain parallelism is jax-native (vmap over walkers) rather than
  ``multiprocessing``.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import matplotlib.pyplot as plt

from ..config import settings, asarray_x
from ..ops.guards import to_num
from ..utils import DictObj, save_pkl, load_pkl, load_datatrace, save_datatrace
from ..bayesian.registry import GraphicalModel
from ..bayesian.models import PlotModel
from ..bayesian.selection import optimize
from ..bayesian.average import mcmc_ensemble, chains_to_datatrace, plot_datatrace

__all__ = ["StochasticProcess", "CompiledFn", "zero32"]

zero32 = np.float32(0.0)


class CompiledFn:
    """jit wrapper with an executed counter (the reference's ``makefn``
    compiled-function object, tensors.py:35-74)."""

    def __init__(self, fn, name=""):
        self.fn = jax.jit(fn)
        self.name = name
        self.executed = 0

    def __call__(self, *args):
        self.executed += 1
        out = self.fn(*args)
        if isinstance(out, dict):  # fused statistic bundles
            return {k: np.asarray(v) for k, v in out.items()}
        return np.asarray(out)


def _prep_matrix(x):
    x = asarray_x(np.asarray(x))
    if x.ndim < 2:
        x = x.reshape(len(x), 1)
    return x


def _prep_vector(y):
    y = asarray_x(np.asarray(y))
    if y.ndim > 1:
        y = y.reshape(len(y))
    return y


class StochasticProcess(PlotModel):
    """Abstract stochastic-process model (see module docstring)."""

    def __init__(self, space=None, order=None, inputs=None, outputs=None, hidden=None,
                 index=None, name="SP", distribution=None, active=False,
                 precompile=False, file=None, load=True, compile_logp=True,
                 *args, **kwargs):
        # ---- load-from-file path (reference :25-34) -------------------------
        if file is not None and load:
            try:
                loaded = load_pkl(file)
                self.__dict__.update(loaded.__dict__)
                self._compile_methods(compile_logp)
                print("Loaded model " + file)
                self.set_space(space=space, hidden=hidden, order=order, inputs=inputs,
                               outputs=outputs, index=index)
                return
            except Exception:
                print("Model Not Found in " + str(file))

        ndim = 1
        if space is not None:
            if hasattr(space, "shape"):
                if len(space.shape) > 1:
                    ndim = space.shape[1]
            else:
                ndim = int(space)
        self.nspace = ndim
        self.name = name

        # host-side data state (the reference's shared variables, :46-71)
        default_mat = np.array([[0.0, 1.0]] * self.nspace, dtype=settings.floatx).T
        default_vec = np.array([0.0, 1.0], dtype=settings.floatx)
        self._space = default_mat.copy()
        self._inputs = default_mat.copy()
        self._outputs = default_vec.copy()
        self._order = default_vec.copy()
        self._index = default_vec.copy()
        self.np_hidden = None
        self.is_observed = False
        self._data_version = 0

        self.distribution = distribution
        # graphical-model attach (reference :74-82)
        if active is True:
            if GraphicalModel.active is None:
                GraphicalModel.active = GraphicalModel("GM_" + self.name)
            self.active = GraphicalModel.active
        elif active is False:
            self.active = GraphicalModel("GM_" + self.name)
        else:
            self.active = active
        self.active.add_component(self)
        self.compiles = DictObj()
        self.precompile = precompile

        super().__init__(*args, **kwargs)

        # register hyperparameters & potentials, then define the process
        self._check_hypers()
        self._register_params()
        self.th_define_process()
        self.set_space(space=space, hidden=hidden, order=order, inputs=inputs,
                       outputs=outputs, index=index)
        self._compile_methods(compile_logp)
        if hidden is None:
            self.hidden = hidden

        if file is not None:
            self.file = file
            try:
                self.save()
            except Exception:
                print("Error in file " + str(file))

    # ------------------------------------------------------------------ hooks
    def _components(self):
        """Hypers-bearing components of this process (subclass hook)."""
        return []

    def _check_hypers(self):
        pass

    def th_define_process(self):
        pass

    def default_hypers(self):
        return {}

    def _register_params(self):
        for comp in self._components():
            if comp is None:
                continue
            for p in comp.hypers:
                self.active.register_param(p)
            if (comp.has_potential() if hasattr(comp, "has_potential")
                    else getattr(comp, "potential", None) is not None):
                cname = f"{self.name}_{comp.name}_potential"
                self.active.register_potential(cname, comp.potential_logp)

    # ------------------------------------------------------------- persistence
    def save(self, path=None, params=None):
        if path is None:
            path = self.file
        if params is not None:
            self.set_params(params)
        try:
            if os.path.isfile(path):
                os.remove(path)
            compiles, self.compiles = self.compiles, DictObj()
            try:
                save_pkl(self, path)
            finally:
                self.compiles = compiles
            print("Model saved on " + path)
        except Exception as details:
            print("Error saving model " + str(path), details)

    def __getstate__(self):
        state = self.__dict__.copy()
        state["compiles"] = DictObj()  # jitted callables don't pickle
        # bound runtime closures are rebuilt by _compile_methods on load
        for public in type(self)._dispatch_methods:
            state.pop(public, None)
        state.pop("_cluster", None)
        state.pop("_sampling_logps_cache", None)
        state.pop("_ncp_logps_cache", None)
        return state

    # ----------------------------------------------------------------- params
    def set_params(self, *args, **kwargs):
        return self.active.set_params(*args, **kwargs)

    def params_random(self, *args, **kwargs):
        return self.active.params_random(*args, **kwargs)

    def params_datatrace(self, *args, **kwargs):
        return self.active.params_datatrace(*args, **kwargs)

    def transform_params(self, *args, **kwargs):
        return self.active.transform_params(*args, **kwargs)

    def params_process(self, process=None, params=None, current=None, fixed=False):
        """Map another process's params onto this one by name prefix
        (reference :140-152)."""
        if process is None:
            process = self
        if params is None:
            params = process.params
        if current is None:
            current = self.params
        params_transform = {k.replace(process.name, self.name, 1): v
                            for k, v in params.items()}
        out = DictObj({k: v for k, v in params_transform.items() if k in current})
        out.update({k: v for k, v in current.items() if k not in params_transform})
        return out

    @property
    def model(self):
        return self.active

    @property
    def params(self):
        return self.active.params

    @property
    def params_default(self):
        return self.active.params_default

    @property
    def params_test(self):
        return self.active.params_test

    @property
    def ndim(self):
        return self.active.ndim

    # ------------------------------------------------------------------- data
    def set_space(self, space=None, hidden=None, order=None, inputs=None,
                  outputs=None, index=None):
        """Assign domain/data arrays with the reference's reshaping semantics
        (stochastic.py:150-184)."""
        changed = False
        if space is not None:
            self._space = _prep_matrix(space)
            changed = True
        if hidden is not None:
            self.np_hidden = _prep_vector(hidden)
        if order is not None:
            self._order = _prep_vector(order)
        elif self.nspace == 1 and space is not None:
            self._order = self._space.reshape(len(self._space))
        if inputs is not None:
            self._inputs = _prep_matrix(inputs)
            changed = True
        if outputs is not None:
            self._outputs = _prep_vector(outputs)
            changed = True
        if index is not None:
            self._index = _prep_vector(index)
        elif self.nspace == 1 and inputs is not None:
            self._index = self._inputs.reshape(len(self._inputs))
        if len(self._order) != len(self._space):
            self._order = np.arange(len(self._space), dtype=settings.floatx)
        if len(self._index) != len(self._inputs):
            self._index = np.arange(len(self._inputs), dtype=settings.floatx)
        if changed:
            self._data_version += 1

    def observed(self, inputs=None, outputs=None, order=None, index=None, hidden=None):
        """Assign observations; computes nothing until asked
        (reference :186-201)."""
        self.set_space(inputs=inputs, outputs=outputs, order=order, index=index,
                       hidden=hidden)
        self.is_observed = not (inputs is None and outputs is None)

    # data properties (reference exposed shared-variable get/set, :216-266)
    @property
    def space(self):
        return self._space

    @space.setter
    def space(self, value):
        self.set_space(space=value)

    @property
    def hidden(self):
        return self.np_hidden

    @hidden.setter
    def hidden(self, value):
        self.np_hidden = value

    @property
    def inputs(self):
        return self._inputs

    @inputs.setter
    def inputs(self, value):
        self.set_space(inputs=value)

    @property
    def outputs(self):
        return self._outputs

    @outputs.setter
    def outputs(self, value):
        self.set_space(outputs=value)

    @property
    def order(self):
        return self._order

    @order.setter
    def order(self, value):
        self._order = _prep_vector(value)

    @property
    def index(self):
        return self._index

    @index.setter
    def index(self, value):
        self._index = _prep_vector(value)

    # ---------------------------------------------------------------- th_* API
    # Each th_* returns a pure function fn(params, space, inputs, outputs,
    # vector) -> array, or None when the quantity is undefined for the class.

    def th_median(self, prior=False, noise=False, simulations=None):
        return None

    def th_mean(self, prior=False, noise=False, simulations=None):
        return None

    def th_variance(self, prior=False, noise=False, simulations=None):
        return None

    def th_covariance(self, prior=False, noise=False):
        return None

    def th_logpredictive(self, prior=False, noise=False):
        return None

    def th_cross_mean(self, prior=False, noise=False, cross_kernel=None):
        return None

    def th_std(self, *args, **kwargs):
        var_fn = self.th_variance(*args, **kwargs)
        if var_fn is None:
            return None

        def fn(params, space, inputs, outputs, vector):
            return jnp.sqrt(var_fn(params, space, inputs, outputs, vector))

        return fn

    def th_loglike_fn(self):
        """Pure observed-data loglikelihood of THIS process (subclass hook;
        what the observed RV's logp factor contributed in the reference)."""
        return None

    def th_error_l1(self, prior=False, noise=False):
        mean_fn = self.th_mean(prior=prior, noise=noise)
        if mean_fn is None:
            return None

        def fn(params, space, inputs, outputs, vector):
            return jnp.mean(jnp.abs(vector - mean_fn(params, space, inputs, outputs, vector)))

        return fn

    def th_error_l2(self, prior=False, noise=False):
        mean_fn = self.th_mean(prior=prior, noise=noise)
        if mean_fn is None:
            return None

        def fn(params, space, inputs, outputs, vector):
            return jnp.mean((vector - mean_fn(params, space, inputs, outputs, vector)) ** 2)

        return fn

    def th_error_mse(self, prior=False, noise=False):
        def fn(params, space, inputs, outputs, vector):
            a = jnp.abs(vector - outputs)
            return jnp.mean(a) ** 2 + jnp.var(a)

        return fn

    # ------------------------------------------------------- method machinery
    _dispatch_methods = {
        "mean": "th_mean",
        "median": "th_median",
        "variance": "th_variance",
        "std": "th_std",
        "covariance": "th_covariance",
        "logpredictive": "th_logpredictive",
        "error_l1": "th_error_l1",
        "error_l2": "th_error_l2",
        "error_mse": "th_error_mse",
        "cross_mean": "th_cross_mean",
    }

    def _compile_methods(self, compile_logp=True):
        """Probe th_* quantities and bind runtime methods (reference
        :328-380); jit tracing itself stays lazy."""
        if not hasattr(self, "compiles") or self.compiles is None:
            self.compiles = DictObj()
        for public, th_name in type(self)._dispatch_methods.items():
            try:
                available = getattr(self, th_name)() is not None
            except Exception:
                available = False
            if available:
                setattr(self, public,
                        self._make_runtime_method(public, th_name))
        if compile_logp and self.precompile:
            _ = self.logp(array=True)
            _ = self.logp(array=True, prior=True)
            _ = self.dlogp(array=True)

    def _make_runtime_method(self, public, th_name):
        def runtime(params=None, space=None, inputs=None, outputs=None, vector=None,
                    prior=False, noise=False, array=False, *args, **kwargs):
            return self._call_method(th_name, params=params, space=space,
                                     inputs=inputs, outputs=outputs, vector=vector,
                                     prior=prior, noise=noise, array=array,
                                     *args, **kwargs)

        runtime.__name__ = public
        return runtime

    def _resolve_data(self, space, inputs, outputs):
        space = self._space if space is None else _prep_matrix(space)
        inputs = self._inputs if inputs is None else _prep_matrix(inputs)
        outputs = self._outputs if outputs is None else _prep_vector(outputs)
        return space, inputs, outputs

    def _cache_name(self, method, prior, noise, args, kwargs):
        name = "prior" if prior else "posterior"
        # strip only the th prefix (a bare .replace would corrupt any method
        # name containing "th" elsewhere)
        name += method[2:] if method.startswith("th") else method
        if noise:
            name += "_noise"
        if len(args) > 0:
            name += str(args)
        if len(kwargs) > 0:
            name += str(kwargs)
        return name

    def _call_method(self, th_name, params=None, space=None, inputs=None,
                     outputs=None, vector=None, prior=False, noise=False,
                     array=False, *args, **kwargs):
        if params is None:
            params = self.active.dict_to_array(self.params) if array else self.params
        elif not array and isinstance(params, dict):
            # ``_state_`` keys carry precomputed posterior factorizations
            # (elliptical.posterior_state) — not hypers; keep them across
            # the filter
            state = {k: v for k, v in params.items()
                     if isinstance(k, str) and k.startswith("_state_")}
            params = self.filter_params(params)
            if state:
                params = dict(params, **state)
        if inputs is None and not self.is_observed:
            prior = True
        space, inputs, outputs = self._resolve_data(space, inputs, outputs)
        if vector is None:
            vector = np.zeros(len(space), dtype=settings.floatx)
        else:
            vector = _prep_vector(vector)

        name = self._cache_name(th_name, prior, noise, args, kwargs)
        if name not in self.compiles:
            pure = getattr(self, th_name)(prior=prior, noise=noise, *args, **kwargs)
            self.compiles[name] = CompiledFn(pure, name)
        if array:
            aname = "array_" + name
            if aname not in self.compiles:
                pure = getattr(self, th_name)(prior=prior, noise=noise, *args, **kwargs)
                reg = self.active

                def apure(u, s, i, o, v):
                    return pure(reg.array_to_dict_jax(u), s, i, o, v)

                self.compiles[aname] = CompiledFn(apure, aname)
            name = aname
            params = np.asarray(params, dtype=settings.floatx)
        else:
            # keep already-on-device arrays (posterior-state matrices can be
            # O(n^2) — round-tripping them through numpy every call would
            # dominate the serving fast path)
            params = {k: (v if isinstance(v, jax.Array) else asarray_x(v))
                      for k, v in params.items()}
        return self.compiles[name](params, space, inputs, outputs, vector)

    def _call_method_vrows(self, th_name, rows, space=None, inputs=None,
                           outputs=None, vector=None, vector_rows=None,
                           prior=False, noise=False, *args, **kwargs):
        """Evaluate a th_* statistic for a whole (R, ndim) matrix of
        unconstrained parameter rows in ONE vmapped dispatch.

        This is the TPU-native replacement for the reference's per-row
        datatrace loops (reference models.py:489-543): instead of R separate
        compiled calls, the pure function is vmapped over the row axis and
        batched onto the device once.  ``vector_rows`` optionally supplies a
        per-row (R, n) vector argument (e.g. batched latent quantiles).
        """
        if inputs is None and not self.is_observed:
            prior = True
        space, inputs, outputs = self._resolve_data(space, inputs, outputs)
        per_row_vec = vector_rows is not None
        if per_row_vec:
            vector = np.asarray(vector_rows, dtype=settings.floatx)
        elif vector is None:
            vector = np.zeros(len(space), dtype=settings.floatx)
        else:
            vector = _prep_vector(vector)

        name = ("vrows_" + ("pv_" if per_row_vec else "")
                + self._cache_name(th_name, prior, noise, args, kwargs))
        if name not in self.compiles:
            pure = getattr(self, th_name)(prior=prior, noise=noise,
                                          *args, **kwargs)
            reg = self.active

            def apure(u, s, i, o, v):
                return pure(reg.array_to_dict_jax(u), s, i, o, v)

            in_axes = (0, None, None, None, 0 if per_row_vec else None)
            self.compiles[name] = CompiledFn(
                jax.vmap(apure, in_axes=in_axes), name)
        rows = np.asarray(rows, dtype=settings.floatx)
        return self.compiles[name](rows, space, inputs, outputs, vector)

    @property
    def executed(self):
        return {k: v.executed for k, v in self.compiles.items()}

    @property
    def transformations(self):
        return self.active.original_to_transformed_names

    @property
    def potentials(self):
        return self.active.potentials

    # ----------------------------------------------------------------- logp
    def _logp_pure(self, prior=False, like=True):
        """Pure logp over natural-space params dicts: prior terms +
        potentials (+ every component's observed loglike unless
        ``prior``) — reference th_logp semantics (stochastic.py:300-313)."""
        reg = self.active
        like_fns = []
        if like and not prior:
            for comp in reg.components.values():
                fn = comp.th_loglike_fn()
                if fn is None:
                    continue
                if comp is self:
                    like_fns.append((fn, None))
                else:
                    # other processes' data are baked at trace time; cache key
                    # includes their data versions (see _logp_compiled)
                    like_fns.append((fn, (comp.space, comp.inputs, comp.outputs)))

        def fn(params, space, inputs, outputs, vector):
            total = reg.logp_prior_dict(params) + reg.logp_potentials(params)
            for like_fn, baked in like_fns:
                if baked is None:
                    total = total + like_fn(params, space, inputs, outputs)
                else:
                    s, i, o = baked
                    total = total + like_fn(params, jnp.asarray(s), jnp.asarray(i),
                                            jnp.asarray(o))
            return total

        return fn

    def _loglike_pure(self):
        reg = self.active
        like_fns = []
        for comp in reg.components.values():
            fn = comp.th_loglike_fn()
            if fn is None:
                continue
            like_fns.append((fn, None if comp is self else
                             (comp.space, comp.inputs, comp.outputs)))

        def fn(params, space, inputs, outputs, vector):
            total = jnp.zeros((), dtype=settings.dtype)
            for like_fn, baked in like_fns:
                if baked is None:
                    total = total + like_fn(params, space, inputs, outputs)
                else:
                    s, i, o = baked
                    total = total + like_fn(params, jnp.asarray(s), jnp.asarray(i),
                                            jnp.asarray(o))
            return total

        return fn

    def _other_versions(self):
        return tuple(
            getattr(c, "_data_version", 0)
            for c in self.active.components.values()
            if c is not self
        )

    def _get_logp_compiled(self, kind, prior=False, array=False):
        """kind in {'logp', 'loglike', 'dlogp'}; returns CompiledFn."""
        base = "prior" if prior else "posterior"
        name = f"{base}_{kind}" + ("", "")[0]
        if array:
            name = "array_" + name
        vers = self._other_versions()
        tag = name + (str(vers) if vers else "")
        if tag in self.compiles:
            return self.compiles[tag]
        reg = self.active
        if kind == "loglike":
            pure = self._loglike_pure()
        else:
            pure = self._logp_pure(prior=prior)
        if kind == "dlogp":
            def apure(u, s, i, o, v):
                g = jax.grad(
                    lambda uu: pure(reg.array_to_dict_jax(uu), s, i, o, v)
                )(u)
                return to_num(g)  # NaN-robust gradients (reference models.py:26-37)
            self.compiles[tag] = CompiledFn(apure, tag)
        elif array:
            def apure(u, s, i, o, v):
                return pure(reg.array_to_dict_jax(u), s, i, o, v)
            self.compiles[tag] = CompiledFn(apure, tag)
        else:
            self.compiles[tag] = CompiledFn(pure, tag)
        return self.compiles[tag]

    def logp(self, params=None, space=None, inputs=None, outputs=None, prior=False,
             array=False, **kwargs):
        if params is None:
            params = self.active.dict_to_array(self.params) if array else self.params
        space, inputs, outputs = self._resolve_data(space, inputs, outputs)
        vector = np.zeros(0, dtype=settings.floatx)
        fn = self._get_logp_compiled("logp", prior=prior, array=array)
        if array:
            params = np.asarray(params, dtype=settings.floatx)
        else:
            params = {k: asarray_x(v) for k, v in params.items()}
        return float(fn(params, space, inputs, outputs, vector))

    def loglike(self, params=None, space=None, inputs=None, outputs=None,
                array=False, **kwargs):
        if params is None:
            params = self.active.dict_to_array(self.params) if array else self.params
        space, inputs, outputs = self._resolve_data(space, inputs, outputs)
        vector = np.zeros(0, dtype=settings.floatx)
        # loglike is prior-independent; keep reference naming
        name = ("array_" if array else "") + "posterior_loglike"
        vers = self._other_versions()
        tag = name + (str(vers) if vers else "")
        if tag not in self.compiles:
            pure = self._loglike_pure()
            reg = self.active
            if array:
                def apure(u, s, i, o, v):
                    return pure(reg.array_to_dict_jax(u), s, i, o, v)
                self.compiles[tag] = CompiledFn(apure, tag)
            else:
                self.compiles[tag] = CompiledFn(pure, tag)
        if array:
            params = np.asarray(params, dtype=settings.floatx)
        else:
            params = {k: asarray_x(v) for k, v in params.items()}
        return float(self.compiles[tag](params, space, inputs, outputs, vector))

    def dlogp(self, params=None, space=None, inputs=None, outputs=None, prior=False,
              array=True, **kwargs):
        """Gradient of logp w.r.t. the unconstrained flat array (the
        reference's flat concatenated gradient, tensors.py:11-22)."""
        if params is None:
            params = self.active.dict_to_array(self.params)
        elif isinstance(params, dict):
            params = self.active.dict_to_array(params)
        space, inputs, outputs = self._resolve_data(space, inputs, outputs)
        vector = np.zeros(0, dtype=settings.floatx)
        base = "prior" if prior else "posterior"
        vers = self._other_versions()
        tag = f"array_{base}_dlogp" + (str(vers) if vers else "")
        if tag not in self.compiles:
            pure = self._logp_pure(prior=prior)
            reg = self.active

            def apure(u, s, i, o, v):
                g = jax.grad(
                    lambda uu: pure(reg.array_to_dict_jax(uu), s, i, o, v)
                )(u)
                return to_num(g)  # NaN-robust gradients (reference models.py:26-37)

            self.compiles[tag] = CompiledFn(apure, tag)
        return self.compiles[tag](np.asarray(params, dtype=settings.floatx),
                                  space, inputs, outputs, vector)

    def logp_chain(self, chain, prior=False):
        """Vectorized logp over chain rows (reference looped, :518-523)."""
        tag = ("prior" if prior else "posterior") + "_logp_chain"
        if tag not in self.compiles:
            pure = self._logp_pure(prior=prior)
            reg = self.active

            def vfun(chain_, s, i, o, v):
                return jax.vmap(
                    lambda u: pure(reg.array_to_dict_jax(u), s, i, o, v)
                )(chain_)

            self.compiles[tag] = CompiledFn(vfun, tag)
        space, inputs, outputs = self._resolve_data(None, None, None)
        vector = np.zeros(0, dtype=settings.floatx)
        return self.compiles[tag](np.asarray(chain, dtype=settings.floatx),
                                  space, inputs, outputs, vector)

    # -------------------------------------------------- fixed (marginalized)
    def _fixed_eval(self, kind, sampling_params, return_array):
        reg = self.active
        chain = reg.fixed_chain.copy()
        chain[:, reg.sampling_dims] = sampling_params
        tag = f"fixed_{kind}"
        if tag not in self.compiles:
            prior = kind == "logprior"
            if kind == "loglike":
                pure = self._loglike_pure()
            else:
                pure = self._logp_pure(prior=prior)

            def one(u, s, i, o, v):
                return pure(reg.array_to_dict_jax(u), s, i, o, v)

            if kind == "dlogp":
                def vfun(chain_, s, i, o, v):
                    return to_num(jax.vmap(lambda u: jax.grad(
                        lambda uu: one(uu, s, i, o, v))(u))(chain_))
            else:
                def vfun(chain_, s, i, o, v):
                    return jax.vmap(lambda u: one(u, s, i, o, v))(chain_)

            self.compiles[tag] = CompiledFn(vfun, tag)
        space, inputs, outputs = self._resolve_data(None, None, None)
        vector = np.zeros(0, dtype=settings.floatx)
        r = self.compiles[tag](chain, space, inputs, outputs, vector)
        if kind == "dlogp":
            r = r[:, reg.sampling_dims]
        if return_array:
            return r
        return np.mean(r, axis=0)

    def fixed_logp(self, sampling_params, return_array=False):
        """Chain-averaged posterior logp over pinned hypers (reference
        :528-537)."""
        return self._fixed_eval("logp", sampling_params, return_array)

    def fixed_dlogp(self, sampling_params, return_array=False):
        return self._fixed_eval("dlogp", sampling_params, return_array)

    def fixed_loglike(self, sampling_params, return_array=False):
        return self._fixed_eval("loglike", sampling_params, return_array)

    def fixed_logprior(self, sampling_params, return_array=False):
        return self._fixed_eval("logprior", sampling_params, return_array)

    # ----------------------------------------------------------------- predict
    def sampler(self, params=None, space=None, inputs=None, outputs=None, samples=1,
                prior=False, noise=False):
        return None

    def quantiler(self, params=None, space=None, inputs=None, outputs=None, q=0.975,
                  prior=False, noise=False, simulations=None):
        return None

    def predict(self, params=None, space=None, inputs=None, outputs=None, mean=True,
                std=True, var=False, cov=False, median=False, quantiles=False,
                quantiles_noise=False, samples=0, distribution=False, prior=False,
                noise=False, simulations=None):
        """Dict of requested statistics (reference :444-513)."""
        if params is None:
            params = self.params
        if not self.is_observed:
            prior = True
        if space is None:
            space = self.space
        if inputs is None:
            inputs = self.inputs
        if outputs is None:
            outputs = self.outputs

        n_simulations = 1
        if isinstance(simulations, int):
            n_simulations = simulations
            simulations = self.sampler(params, space, inputs, outputs, prior=prior,
                                       noise=noise, samples=simulations)
        values = DictObj()
        if mean:
            values["mean"] = self.mean(params, space, inputs, outputs, prior=prior,
                                       noise=noise, simulations=simulations)
        if var:
            values["variance"] = self.variance(params, space, inputs, outputs,
                                               prior=prior, noise=noise,
                                               simulations=simulations)
        if std:
            values["std"] = self.std(params, space, inputs, outputs, prior=prior,
                                     noise=noise, simulations=simulations)
        if cov:
            if not hasattr(self, "covariance"):
                raise ValueError(
                    f"{type(self).__name__} has no analytic posterior "
                    "covariance (warped covariances have no closed form); "
                    "use samples= for an empirical covariance")
            values["covariance"] = self.covariance(params, space, inputs, outputs,
                                                   prior=prior, noise=noise)
        if median:
            values["median"] = self.median(params, space, inputs, outputs, prior=prior,
                                           noise=noise, simulations=simulations)
        if quantiles:
            values["quantile_up"] = self.quantiler(params, space, inputs, outputs,
                                                   q=0.975, prior=prior, noise=noise,
                                                   simulations=simulations)
            values["quantile_down"] = self.quantiler(params, space, inputs, outputs,
                                                     q=0.025, prior=prior, noise=noise,
                                                     simulations=simulations)
        if quantiles_noise:
            sims_noise = self.sampler(params, space, inputs, outputs, prior=prior,
                                      noise=True, samples=n_simulations)
            values["noise_std"] = self.std(params, space, inputs, outputs, prior=prior,
                                           noise=True, simulations=sims_noise)
            values["noise_up"] = self.quantiler(params, space, inputs, outputs, q=0.975,
                                                prior=prior, noise=True,
                                                simulations=n_simulations)
            values["noise_down"] = self.quantiler(params, space, inputs, outputs,
                                                  q=0.025, prior=prior, noise=True,
                                                  simulations=n_simulations)
        if samples > 0:
            values["samples"] = self.sampler(params, space, inputs, outputs,
                                             samples=samples, prior=prior, noise=noise)
        if distribution:
            values["logpredictive"] = lambda x: self.logpredictive(
                params, space, inputs, outputs, vector=x, prior=prior, noise=True)
        return values

    # ----------------------------------------------------------------- find_MAP
    def find_MAP(self, start=None, points=1, return_points=False, plot=False,
                 display=True, powell=True, bfgs=True, init="bfgs", max_time=None,
                 engine="scipy", max_iters=200, objective="logp", **kwargs):
        """Multi-start MAP search.

        ``engine='scipy'`` (default) is the reference recipe: alternating
        BFGS/Powell through scipy with hardened objectives (reference
        :566-674).  ``engine='jax'`` runs optax L-BFGS fully on device with
        all starts vmapped simultaneously — one compiled program instead of
        a host optimization loop.  ``engine='iterative'`` trains through the
        matrix-free preconditioned CG/SLQ objective (GP family, large N on
        one chip); ``engine='distributed'`` trains through the
        device-sharded exact NLL (GP family, N beyond one chip's HBM — the
        gram lives as row bands across the mesh).

        ``objective='loo'`` (scipy and jax engines, GP family) swaps this
        process's marginal loglike for its leave-one-out
        pseudo-likelihood (GPML §5.4.2) — hypers trained on held-out
        prediction quality, robust to covariance misspecification the
        marginal likelihood rewards; priors/potentials/other components
        contribute unchanged.  On the jax engine the vmapped multi-start
        runs all starts of the multimodal CV surface at once."""
        if objective not in ("logp", "loo"):
            raise ValueError(f"unknown objective {objective!r}")
        if objective == "loo" and engine not in ("scipy", "jax"):
            raise ValueError("objective='loo' is wired into the scipy and "
                             "jax engines only")
        if engine == "jax":
            return self._find_map_jax(start=start, points=points,
                                      return_points=return_points,
                                      display=display, max_iters=max_iters,
                                      objective=objective, **kwargs)
        if engine == "iterative":
            # matrix-free objective for large N (GaussianProcess family)
            return self._find_map_iterative(start=start, points=points,
                                            return_points=return_points,
                                            display=display,
                                            max_iters=max_iters, **kwargs)
        if engine == "distributed":
            # device-sharded exact objective (GaussianProcess family)
            return self._find_map_distributed(start=start, points=points,
                                              return_points=return_points,
                                              display=display,
                                              max_iters=max_iters, **kwargs)
        if kwargs:
            # only the iterative engine takes extra solver knobs — swallowing
            # them here would silently ignore typos / missing engine=
            raise TypeError(f"find_MAP(engine={engine!r}) got unexpected "
                            f"keyword arguments {sorted(kwargs)}")
        if objective not in ("logp", "loo"):
            raise ValueError(f"unknown objective {objective!r}")
        points_list = []
        if start is None:
            start = self.params
        reg = self.active
        if objective == "loo":
            if reg.fixed_datatrace is not None:
                raise ValueError("objective='loo' does not compose with "
                                 "fix_vars marginalization")
            logp = lambda p: self._array_loo_sampling(p)
            dlogp = lambda p: self._array_dloo_sampling(p)
        elif reg.fixed_datatrace is None:
            logp = lambda p: self._array_logp_sampling(p)
            dlogp = lambda p: self._array_dlogp_sampling(p)
        else:
            logp = self.fixed_logp
            dlogp = self.fixed_dlogp
        try:
            dlogp(reg.sampling_params(start if not isinstance(start, list) else start[0]))
        except Exception as m:
            print(m)
            dlogp = None

        if isinstance(start, list):
            for i, s in enumerate(start, start=1):
                points_list.append(("start" + str(i), logp(reg.sampling_params(s)), s))
        else:
            points_list.append(("start", logp(reg.sampling_params(start)), start))
        n_starts = len(points_list)
        if self.outputs is None:
            print("For find_MAP it is necessary to have observations")
            return start
        if display:
            print("Starting function value (-logp): "
                  + str(-logp(reg.sampling_params(points_list[0][2]))))
        if plot:
            plt.figure(0)
            self.plot(params=points_list[0][2], title="start")
            plt.show()
        check = 0 if init == "bfgs" else 1
        i = -1
        points -= 1
        while i < points:
            i += 1
            idx = i // 2 if powell else i
            if idx >= len(points_list):
                break  # no fresh start/refinement left to visit
            name, _, start_i = points_list[idx]
            if (i % 2 == check or not powell) and bfgs:
                if name.endswith("_bfgs"):
                    if i > n_starts:
                        points += 1
                    continue
                name += "_bfgs"
                if display:
                    print(name)
                new = optimize(logp=logp, start=reg.sampling_params(start_i),
                               dlogp=dlogp, fmin="bfgs", max_time=max_time,
                               disp=display)
            else:
                if name.endswith("_powell"):
                    if i > n_starts:
                        points += 1
                    continue
                name += "_powell"
                if display:
                    print(name)
                new = optimize(logp=logp, start=reg.sampling_params(start_i),
                               fmin="powell", max_time=max_time, disp=display)
            points_list.append((name, logp(new), reg.dict_from_sampling_array(new)))
            if plot:
                plt.figure(i + 1)
                self.plot(params=reg.dict_from_sampling_array(new), title=name)
                plt.show()

        optimal = points_list[0]
        for test in points_list:
            if test[1] > optimal[1]:
                optimal = test
        _name, _ll, params = optimal
        params = DictObj(params)
        if display:
            print("find_MAP", params)
        if return_points is False:
            return params
        return params, points_list

    def _find_map_distributed(self, start=None, points=1, return_points=False,
                              display=True, max_iters=200, mesh=None,
                              block=None, axis="dp", **_):
        """MAP search over the device-sharded exact NLL (plus hyper
        priors): L-BFGS-B where every objective/gradient evaluation is one
        SPMD program over the mesh (``find_MAP(engine='distributed')``).
        Symmetric with the GP family's ``engine='iterative'`` but exact —
        no trace estimator, so the optimum matches the single-device
        engine to solver tolerance while the data stays sharded.  Works
        for every subclass defining ``nll_distributed``: the elliptical
        families (row-band-sharded gram, GP/WGP, TP/WTP) and the
        state-space GP (time-axis-sharded Kalman elements)."""
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
        dist_kw = dict(mesh=mesh, axis=axis)
        if block is not None:           # only the gram-band objectives tile
            dist_kw["block"] = block

        def objective(u):
            p = reg.array_to_dict_jax(u)
            nll = self.nll_distributed(p, **dist_kw)
            return nll - prior_pure(p, xj, xj, yj, vec0)

        vg = _jax.jit(_jax.value_and_grad(objective))

        def f_and_g(u):
            v, g = vg(jnp.asarray(u, settings.dtype))
            v = float(v)
            g = np.asarray(g, np.float64)
            if not np.isfinite(v) or not np.all(np.isfinite(g)):
                # hardened objective (reference selection.py nan_to_high):
                # overshoots into dead regions must read as 'very bad'
                return 1e10, np.zeros_like(g)
            return v, g

        results = []
        for i, s in enumerate(starts, start=1):
            u0 = np.asarray(reg.dict_to_array(s), np.float64)
            if display:
                print(f"start{i} (-logp): {f_and_g(u0)[0]:.6g}")
            res = spo.minimize(f_and_g, u0, jac=True, method="L-BFGS-B",
                               options={"maxiter": max_iters})
            results.append((f"distributed{i}", float(res.fun),
                            reg.array_to_dict(
                                np.asarray(res.x, settings.floatx))))
            if display:
                print(f"start{i} done (-logp): {res.fun:.6g}")
        results.sort(key=lambda t: t[1])
        best = results[0][2]
        if return_points:
            return best, [(n, -v, p) for n, v, p in results]
        return best

    def _find_map_jax(self, start=None, points=1, return_points=False,
                      display=True, max_iters=200, objective="logp"):
        """Device-side multi-start MAP: every start optimized at once.

        ``objective='loo'`` swaps the marginal logp for the LOO
        pseudo-likelihood objective (GPML §5.4.2) — the multimodal CV
        surface is exactly where the vmapped multi-start pays.

        (A cheaper-compile Armijo-backtracking line search was evaluated in
        round 3 and rejected: it stalls ~140 nats short of the zoom
        optimum on the standard 1-D GP workload even at 600 iterations.)"""
        from ..bayesian.optimize_jax import lbfgs_maximize

        reg = self.active
        if start is None:
            start = self.params
        starts = start if isinstance(start, list) else [start]
        starts = [reg.sampling_params(s) if isinstance(s, dict) else
                  np.asarray(s)[reg.sampling_dims] if np.ndim(s) == 1 and
                  len(s) == reg.ndim else np.asarray(s) for s in starts]
        rng = np.random.default_rng(0)
        while len(starts) < points:
            starts.append(starts[0] * (1 + 0.2 * rng.standard_normal(
                len(starts[0]))).astype(settings.floatx))
        if objective == "loo":
            logp_tr = self._sampling_loo_objective()
        else:
            logp_tr, _, _ = self._sampling_logps(prior=False)
        pts, vals = lbfgs_maximize(logp_tr, np.stack(starts),
                                   max_iters=max_iters)
        best = int(np.argmax(vals))
        params = DictObj(reg.dict_from_sampling_array(pts[best]))
        if display:
            print("find_MAP(jax)", {"logp": float(vals[best])})
        if return_points:
            plist = [(f"start{i}_lbfgs", float(vals[i]),
                      reg.dict_from_sampling_array(pts[i]))
                     for i in range(len(vals))]
            return params, plist
        return params

    def _array_logp_sampling(self, p):
        """array logp over sampling dims (full dims when nothing is fixed)."""
        reg = self.active
        if reg.fixed_datatrace is not None:
            return self.fixed_logp(p)
        fn = self._get_logp_compiled("logp", prior=False, array=True)
        space, inputs, outputs = self._resolve_data(None, None, None)
        return float(fn(np.asarray(p, dtype=settings.floatx), space, inputs, outputs,
                        np.zeros(0, dtype=settings.floatx)))

    def _array_dlogp_sampling(self, p):
        reg = self.active
        if reg.fixed_datatrace is not None:
            return self.fixed_dlogp(p)
        return np.asarray(self.dlogp(np.asarray(p, dtype=settings.floatx)))

    # ------------------------------------------------- LOO training objective
    def _loo_objective_pure(self):
        """Pure LOO-objective: this process's leave-one-out pseudo-
        likelihood (GPML §5.4.2; requires the subclass to define
        ``th_loo_fn`` — the GP family does) in place of its marginal
        loglike, plus prior terms, potentials, and every OTHER
        component's loglike (graphical-model semantics unchanged)."""
        if not hasattr(self, "th_loo_fn"):
            raise NotImplementedError(
                f"{type(self).__name__} has no th_loo_fn; "
                "objective='loo' needs the GP family")
        reg = self.active
        loo_fn = self.th_loo_fn()
        other_fns = []
        for comp in reg.components.values():
            if comp is self:
                continue
            fn = comp.th_loglike_fn()
            if fn is not None:
                other_fns.append((fn, (comp.space, comp.inputs,
                                       comp.outputs)))

        def fn(params, space, inputs, outputs, vector):
            total = (reg.logp_prior_dict(params)
                     + reg.logp_potentials(params)
                     + loo_fn(params, space, inputs, outputs))
            for like_fn, (s, i, o) in other_fns:
                total = total + like_fn(params, jnp.asarray(s),
                                        jnp.asarray(i), jnp.asarray(o))
            return total

        return fn

    def _get_loo_obj_compiled(self, grad=False):
        vers = self._other_versions()
        tag = ("array_posterior_" + ("dloo_obj" if grad else "loo_obj")
               + (str(vers) if vers else ""))
        if tag not in self.compiles:
            pure = self._loo_objective_pure()
            reg = self.active
            if grad:
                def apure(u, s, i, o, v):
                    g = jax.grad(
                        lambda uu: pure(reg.array_to_dict_jax(uu),
                                        s, i, o, v))(u)
                    return to_num(g)
            else:
                def apure(u, s, i, o, v):
                    return pure(reg.array_to_dict_jax(u), s, i, o, v)
            self.compiles[tag] = CompiledFn(apure, tag)
        return self.compiles[tag]

    def _noncentered_sampling_shear(self):
        """Non-centered reparameterization hook: subclasses with an
        amplitude/data-scale hierarchy (the elliptical families) return a
        ``(shear, unshear)`` closure pair over the sampling-dims vector;
        the base returns None so ``sample_hypers(reparam='noncentered')``
        raises the friendly does-not-apply error."""
        return None

    def _sampling_loo_objective(self):
        """jax-traceable LOO objective over the sampling dims — the
        engine='jax' counterpart of :meth:`_sampling_logps` for
        ``objective='loo'`` (fixed-chain marginalization unsupported:
        the CV objective over a pinned chain has no user story yet)."""
        reg = self.active
        if reg.fixed_datatrace is not None:
            raise ValueError("objective='loo' does not compose with "
                             "fix_vars/fixed chains")
        pure = self._loo_objective_pure()
        space, inputs, outputs = self._resolve_data(None, None, None)
        space, inputs, outputs = (jnp.asarray(space), jnp.asarray(inputs),
                                  jnp.asarray(outputs))
        vec = jnp.zeros(0, dtype=settings.dtype)
        sampling_dims = np.asarray(reg.sampling_dims, dtype=np.int32)
        full = jnp.asarray(reg.dict_to_array(reg.params))

        def fn(p):
            u = (p if len(sampling_dims) == reg.ndim
                 else full.at[sampling_dims].set(p))
            return pure(reg.array_to_dict_jax(u), space, inputs,
                        outputs, vec)

        return fn

    def _array_loo_sampling(self, p):
        fn = self._get_loo_obj_compiled(grad=False)
        space, inputs, outputs = self._resolve_data(None, None, None)
        return float(fn(np.asarray(p, dtype=settings.floatx), space, inputs,
                        outputs, np.zeros(0, dtype=settings.floatx)))

    def _array_dloo_sampling(self, p):
        fn = self._get_loo_obj_compiled(grad=True)
        space, inputs, outputs = self._resolve_data(None, None, None)
        return np.asarray(fn(np.asarray(p, dtype=settings.floatx), space,
                             inputs, outputs,
                             np.zeros(0, dtype=settings.floatx)))

    # --------------------------------------------------------------- sampling
    def sample_hypers(self, start=None, samples=1000, chains=None, ntemps=None,
                      raw=False, noise_mult=0.1, noise_sum=0.01, burnin_tol=0.001,
                      burnin_method="multi-sum", outlayer_percentile=0.0005,
                      clusters=None, prior=False, parallel=False, threads=1,
                      plot=False, file=None, load=True, seed=0, method="ensemble",
                      nuts_warmup=200, max_depth=8, target_accept=0.8,
                      nuts_mass="diag", nuts_chunk=25, neutra_warmup=500,
                      advi_steps=2000, advi_mc=8, advi_lr=0.02,
                      advi_full_rank=True, reparam=None):
        """MCMC over the hyperparameter posterior (reference :676-800).

        ``method='ensemble'`` (default) is the reference's affine-invariant
        sampler (parallel-tempered when ``ntemps``); ``method='nuts'`` runs
        the jax-native No-U-Turn sampler (gradient-based, far higher
        effective-sample rate per iteration for smooth posteriors;
        ``nuts_chunk=25`` dispatches warmup+sampling in bounded
        segments — measured ~zero overhead, and the escape from the
        hosted tunnel's fused-program crash shape at depth>=7 —
        ``None`` fuses the whole chain into one program);
        ``method='neutra'`` runs NUTS through a neural transport fitted to
        ``neutra_warmup`` iterations of ensemble warmup — the cure for
        funnel-shaped hyper posteriors where plain/dense-mass NUTS leaves
        divergences or silently under-explores the neck (bayesian/neutra.py).
        ``method='advi'`` fits a Gaussian variational approximation by
        reparameterized-gradient ELBO ascent (one jitted scan) and fills
        the datatrace with iid draws from it — fast approximate model
        averaging; draws are from q, not the exact posterior
        (bayesian/advi.py; the reference's sandbox-only
        ``pm.advi`` at reference sandbox/tgp.py:590-609 made
        first-class).  Chains run vmapped (and device-sharded when
        ``parallel``) inside one jitted sampler instead of
        multiprocessing pools.

        ``reparam='noncentered'`` (elliptical families) samples every
        amplitude (``*_var``) hyper relative to the mapping-dependent
        data scale ``log Var[g^{-1}(y)]`` — a unit-Jacobian shear that
        removes the warped-hierarchy funnel ridge (measured: divergences
        170 -> 80 on the bench WGP workload at par ESS/s; see
        docs/samplers.md).  Composes with every method."""
        reg = self.active
        ndim = len(reg.sampling_dims)
        if chains is None:
            chains = 2 * ndim
        if file is not None and load:
            try:
                datatrace = load_datatrace(file)
                if datatrace is not None:
                    if (datatrace._niter.max() == samples - 1
                            and datatrace._nchain.max() == chains - 1):
                        if plot:
                            plot_datatrace(datatrace)
                        return datatrace
            except Exception:
                pass
        if start is None:
            start = self.find_MAP(display=False)
        if isinstance(start, dict):
            start = reg.dict_to_array(start)
        start = np.asarray(start, dtype=settings.floatx)
        if start.ndim == 1:
            start = start[reg.sampling_dims]
        elif start.ndim == 2:
            start = start[:, reg.sampling_dims]
        elif start.ndim == 3:
            start = start[:, :, reg.sampling_dims]

        # pick traceable log-density callables (reference :737-766)
        logp_tr, loglike_tr, logprior_tr = self._sampling_logps(prior=prior,
                                                                tempered=ntemps is not None)

        # non-centered reparameterization: sample amplitude hypers
        # relative to the (mapping-dependent) data scale — a unit-Jacobian
        # shear that removes the warped-hierarchy funnel ridge (the
        # _noncentered_sampling_shear docstring has the geometry)
        if reparam not in (None, "noncentered"):
            raise ValueError(f"unknown reparam {reparam!r} "
                             "(None | 'noncentered')")
        shear = None
        if reparam == "noncentered":
            pair = self._noncentered_sampling_shear()
            if pair is None:
                raise ValueError(
                    f"{type(self).__name__} has no amplitude hyper in the "
                    "sampling dims — reparam='noncentered' does not apply")
            shear, unshear = pair
            # memoized alongside _sampling_logps (same key) so repeated
            # reparam'd sample_hypers calls reuse closure identity and
            # skip the full sampler recompile
            memo_key = ("ncp", prior, ntemps is not None,
                        self._data_version,
                        tuple(reg.fixed_dims), id(reg.fixed_datatrace),
                        self._other_versions())
            cache = getattr(self, "_ncp_logps_cache", None)
            if cache is not None and cache[0] == memo_key:
                logp_tr, loglike_tr, logprior_tr, shear, unshear = cache[1]
            else:
                _wrap = lambda f: (None if f is None
                                   else (lambda v, _f=f: _f(shear(v))))
                logp_tr, loglike_tr, logprior_tr = (
                    _wrap(logp_tr), _wrap(loglike_tr), _wrap(logprior_tr))
                self._ncp_logps_cache = (
                    memo_key,
                    (logp_tr, loglike_tr, logprior_tr, shear, unshear))
            start = np.asarray(
                jax.vmap(unshear)(jnp.asarray(
                    start.reshape(-1, start.shape[-1])))
            ).reshape(start.shape).astype(settings.floatx)

        if method == "advi":
            from ..bayesian.advi import fit_advi, advi_draws

            if logp_tr is None:
                logp_tr = lambda p: loglike_tr(p) + logprior_tr(p)
            center = start if start.ndim == 1 else np.mean(
                start.reshape(-1, ndim), axis=0)
            fit = fit_advi(logp_tr, center, steps=advi_steps, mc=advi_mc,
                           lr=advi_lr, full_rank=advi_full_rank, seed=seed)
            if not fit.converged:
                print("sample_hypers(method='advi'): ELBO still improving "
                      "at the last decile — consider more advi_steps")
            echain = advi_draws(fit, chains, samples, seed=seed + 1)
            lnprob = np.asarray(jax.vmap(jax.vmap(logp_tr))(
                jnp.asarray(echain)), settings.floatx)
        elif method in ("nuts", "neutra"):
            from ..bayesian.nuts import nuts_sampler

            if logp_tr is None:
                logp_tr = lambda p: loglike_tr(p) + logprior_tr(p)
            rng_jitter = np.random.default_rng(seed)
            z0 = start if start.ndim == 2 else (
                start[None, :] * (1 + noise_mult
                                  * rng_jitter.standard_normal((chains, ndim))
                                  ).astype(settings.floatx))
            if method == "neutra":
                # ensemble warmup draws -> transport fit -> NUTS in latent
                # space (the funnel-geometry cure; see bayesian/neutra.py)
                from ..bayesian.neutra import neutra_nuts

                n_walk = max(2 * ndim, 16)
                n_walk += n_walk % 2
                wstart = start if start.ndim == 2 else np.tile(
                    start[None, :], (n_walk, 1))
                _, wchain = mcmc_ensemble(
                    ndim, samples=neutra_warmup, chains=n_walk,
                    start=wstart, logp=logp_tr, noise_mult=noise_mult,
                    noise_sum=noise_sum, seed=seed)
                draws = wchain[:, neutra_warmup // 2:, :].reshape(-1, ndim)
                echain, lnprob, _info = neutra_nuts(
                    logp_tr, draws, samples, chains=chains,
                    warmup=nuts_warmup, key=seed, max_depth=max_depth,
                    target_accept=target_accept,
                    adapt_mass="dense" if nuts_mass == "dense" else True)
            else:
                # nuts_chunk=25 (default): warmup+sampling as bounded
                # dispatches — the default max_depth=8 as ONE monolithic
                # fused program is the measured worker-crash shape on
                # the hosted tunnel, and chunked dispatch costs ~zero
                # (benchmarks/nuts_depth_ab.py; docs/samplers.md).
                # nuts_chunk=None restores the single fused program.
                echain, lnprob, _info = nuts_sampler(
                    logp_tr, z0, samples, warmup=nuts_warmup, key=seed,
                    max_depth=max_depth, chains=chains,
                    target_accept=target_accept,
                    adapt_mass="dense" if nuts_mass == "dense" else True,
                    chunk=nuts_chunk)
        else:
            lnprob, echain = mcmc_ensemble(
                ndim, samples=samples, chains=chains, ntemps=ntemps, start=start,
                logp=logp_tr, loglike=loglike_tr, logprior=logprior_tr,
                noise_mult=noise_mult, noise_sum=noise_sum, threads=threads,
                parallel=bool(parallel), seed=seed)

        if shear is not None:
            # back to the model's parameterization (logp values are
            # invariant — unit-Jacobian map)
            sh = echain.shape
            echain = np.asarray(jax.vmap(shear)(
                jnp.asarray(echain.reshape(-1, sh[-1])))
            ).reshape(sh).astype(settings.floatx)
        complete_chain = np.empty((echain.shape[0], echain.shape[1], self.ndim),
                                  dtype=settings.floatx)
        complete_chain[:, :, reg.sampling_dims] = echain
        if reg.fixed_datatrace is not None:
            complete_chain[:, :, reg.fixed_dims] = \
                reg.fixed_chain[:, reg.fixed_dims].mean(axis=0)
        if raw:
            return complete_chain, lnprob
        datatrace = chains_to_datatrace(
            self, complete_chain, ll=lnprob, burnin_tol=burnin_tol,
            burnin_method=burnin_method, burnin_dims=reg.sampling_dims,
            outlayer_percentile=outlayer_percentile, clusters=clusters)
        if file is not None:
            save_datatrace(datatrace, file)
        if plot:
            plot_datatrace(datatrace)
        return datatrace

    def _sampling_logps(self, prior=False, tempered=False):
        """jax-traceable (logp | loglike+logprior) over the sampling dims,
        marginalizing over any fixed chain.

        Memoized per (prior, tempered, data version, fix_vars state): the
        samplers trace against closure identity, so reusing the closures
        across repeated sample_hypers calls avoids a full recompile."""
        reg = self.active
        memo_key = (prior, tempered, self._data_version,
                    tuple(reg.fixed_dims), id(reg.fixed_datatrace),
                    self._other_versions())
        cache = getattr(self, "_sampling_logps_cache", None)
        if cache is not None and cache[0] == memo_key:
            return cache[1]
        out = self._build_sampling_logps(prior=prior, tempered=tempered)
        self._sampling_logps_cache = (memo_key, out)
        return out

    def _build_sampling_logps(self, prior=False, tempered=False):
        reg = self.active
        space, inputs, outputs = self._resolve_data(None, None, None)
        space, inputs, outputs = (jnp.asarray(space), jnp.asarray(inputs),
                                  jnp.asarray(outputs))
        vec = jnp.zeros(0, dtype=settings.dtype)
        sampling_dims = np.asarray(reg.sampling_dims, dtype=np.int32)

        post_pure = self._logp_pure(prior=False)
        prior_pure = self._logp_pure(prior=True)
        like_pure = self._loglike_pure()

        if reg.fixed_datatrace is None:
            full = jnp.asarray(reg.dict_to_array(reg.params))

            def embed(p):
                if len(sampling_dims) == reg.ndim:
                    return p
                return full.at[sampling_dims].set(p)

            def mk(pure):
                return lambda p: pure(reg.array_to_dict_jax(embed(p)), space,
                                      inputs, outputs, vec)
        else:
            chain = jnp.asarray(reg.fixed_chain)

            def mk(pure):
                def f(p):
                    rows = chain.at[:, sampling_dims].set(
                        jnp.broadcast_to(p, (chain.shape[0], len(sampling_dims))))
                    vals = jax.vmap(lambda u: pure(reg.array_to_dict_jax(u), space,
                                                   inputs, outputs, vec))(rows)
                    return jnp.mean(vals)
                return f

        if not tempered:
            return (mk(prior_pure) if prior else mk(post_pure)), None, None
        logprior = mk(prior_pure)
        loglike = (lambda p: jnp.zeros((), settings.dtype)) if prior else mk(like_pure)
        return None, loglike, logprior
