"""Graphical-model parameter registry.

TPU-native rebuild of the reference ``GraphicalModel``
(``/root/reference/g3py/bayesian/models.py:56-303``).  The reference wrapped
a PyMC3 ``pm.Model`` whose RV graph *was* the registry; here the registry is
an explicit ordered table of :class:`~g3py_tpu.hypers.Param` descriptors
shared by one or more processes (the *graphical* part: several processes
joining one model share hyperparameters and sum their logps).

It owns:

* the dict <-> flat-array **bijection** (natural-space name-keyed dicts on
  the user side; an unconstrained float32 vector on the sampler side),
* the **prior logp** (sum of per-param prior terms, a pure jax function in
  either space),
* ``params_default`` assembled from every component's data-driven
  ``default_hypers`` (reference models.py:174-182),
* the **fix_vars** marginalization bookkeeping: pin a subset of dims to a
  posterior chain so the remaining dims are optimized/sampled against the
  averaged conditional (reference models.py:270-297).
"""

import numpy as np
import jax.numpy as jnp

from ..config import settings, asarray_x
from ..utils import DictObj, clone, save_pkl, load_pkl
from ..hypers import Param

__all__ = ["GraphicalModel", "Model", "get_model"]


class GraphicalModel:
    """Shared parameter registry + model container."""

    active = None  # class-level active-context registry (reference models.py:62)

    def __init__(self, name="GM", description=None, file=None, reset=False):
        if file is not None and not reset:
            try:
                self.reset(file)
                self.activate()
                return
            except Exception:
                print("Not found model in " + str(file))
        self.name = name
        self.description = description if description is not None else ""
        self.components = DictObj()
        self.params_spec = {}  # name -> Param, insertion-ordered
        self.potentials = DictObj()  # name -> callable(params_dict) -> scalar
        self.current_params = None
        # fix_vars state (reference models.py:270-283)
        self.fixed_datatrace = None
        self.fixed_chain = None
        self.fixed_keys = []
        self.fixed_dims = []
        if file is not None:
            self.file = file
            try:
                self.save()
            except Exception:
                print("Error in file " + str(file))
        self.activate()

    # -- context ------------------------------------------------------------
    def activate(self):
        type(self).active = self

    def add_component(self, component):
        self.components[component.name] = component

    # -- registration ---------------------------------------------------------
    def register_param(self, p: Param):
        existing = self.params_spec.get(p.name)
        if existing is not None and existing is not p:
            if existing.shape != p.shape:
                raise ValueError(
                    f"conflicting shapes for shared hyper {p.name}: "
                    f"{existing.shape} vs {p.shape}"
                )
            return existing
        self.params_spec[p.name] = p
        return p

    def register_potential(self, name, fn):
        self.potentials[name] = fn

    # -- layout ---------------------------------------------------------------
    @property
    def ordered_params(self):
        return list(self.params_spec.values())

    @property
    def ndim(self):
        return sum(p.size for p in self.ordered_params)

    def slices(self):
        out = {}
        start = 0
        for p in self.ordered_params:
            out[p.name] = (start, start + p.size, p.shape)
            start += p.size
        return out

    def param_names(self):
        """Flat-array column names, one per scalar dim (vector params get
        __0, __1, ... suffixes) — the datatrace column layout."""
        names = []
        for p in self.ordered_params:
            if p.size == 1:
                names.append(p.name)
            else:
                names.extend(f"{p.name}__{i}" for i in range(p.size))
        return names

    # -- bijection --------------------------------------------------------------
    def dict_to_array(self, params):
        """Natural-space dict -> unconstrained flat float32 array (the
        reference's ``bijection.map``, models.py:152-155)."""
        if not isinstance(params, dict):
            return np.asarray(params, dtype=settings.floatx)
        u = np.empty(self.ndim, dtype=settings.floatx)
        start = 0
        for p in self.ordered_params:
            v = params.get(p.name)
            if v is None:
                v = p.testval()
            uv = p.prior.transform.forward(np.asarray(v))
            u[start : start + p.size] = np.ravel(uv)
            start += p.size
        return u

    def array_to_dict(self, u):
        """Unconstrained flat array -> natural-space dict (``bijection.rmap``)."""
        u = np.asarray(u, dtype=settings.floatx)
        out = DictObj()
        start = 0
        for p in self.ordered_params:
            seg = u[start : start + p.size].reshape(p.shape)
            out[p.name] = np.asarray(p.prior.transform.backward(jnp.asarray(seg)))
            start += p.size
        return out

    def array_to_dict_jax(self, u):
        """Traced version of :meth:`array_to_dict` — differentiable, used
        inside jitted array_* methods."""
        out = {}
        start = 0
        for p in self.ordered_params:
            seg = jnp.reshape(u[start : start + p.size], p.shape)
            out[p.name] = p.prior.transform.backward(seg)
            start += p.size
        return out

    # -- prior logp ---------------------------------------------------------------
    def logp_prior_array(self, u):
        """Sum of per-param prior terms in unconstrained space (what PyMC3's
        free-RV logp factors contributed in the reference's th_logp,
        stochastic.py:300-307)."""
        total = jnp.zeros((), dtype=u.dtype)
        start = 0
        for p in self.ordered_params:
            seg = u[start : start + p.size]
            total = total + p.prior.logp(seg)
            start += p.size
        return total

    def logp_prior_dict(self, params):
        """Same quantity evaluated from a natural-space dict."""
        total = jnp.zeros((), dtype=settings.dtype)
        for p in self.ordered_params:
            v = jnp.ravel(jnp.asarray(params[p.name]))
            total = total + p.prior.logp_natural(v)
        return total

    def logp_potentials(self, params):
        total = jnp.zeros((), dtype=settings.dtype)
        for fn in self.potentials.values():
            term = fn(params)
            if term is not None:  # e.g. a substr matching no hyper
                total = total + term
        return total

    # -- params ---------------------------------------------------------------
    def set_params(self, params=None):
        self.current_params = None if params is None else DictObj(params)

    @property
    def params(self):
        if self.current_params is not None:
            return clone(self.current_params)
        return self.params_default

    @property
    def params_test(self):
        """Prior test values (the reference's model.test_point)."""
        return DictObj({p.name: p.testval() for p in self.ordered_params})

    @property
    def params_default(self):
        """Test values overridden by each component's data-driven defaults
        (reference models.py:174-182)."""
        default = self.params_test
        for name, component in self.components.items():
            try:
                d = component.default_hypers()
            except Exception as e:
                # degrade loudly: losing data-driven defaults (k-means
                # inducing points, var(y) scales) silently leaves models
                # starting from degenerate test values
                import warnings

                warnings.warn(
                    f"default_hypers failed for component {name!r} "
                    f"({type(e).__name__}: {e}); falling back to test "
                    "values for its params")
                d = {}
            for param, v in d.items():
                key = param.name if isinstance(param, Param) else param
                if key in self.params_spec:
                    default[key] = asarray_x(
                        np.reshape(np.asarray(v), self.params_spec[key].shape)
                    )
        return default

    def params_random(self, mean=None, sigma=0.1, prop=True, rng=None):
        """Random perturbation around a params dict (reference
        models.py:184-203)."""
        if mean is None:
            mean = self.params_default
        if rng is None:
            rng = np.random.default_rng()
        out = DictObj(mean)
        for k, v in out.items():
            v = np.asarray(v)
            noise = rng.standard_normal(v.size).reshape(v.shape)
            if prop:
                out[k] = asarray_x(v * (1 + sigma * noise))
            else:
                out[k] = asarray_x(v + sigma * noise)
        return out

    def params_datatrace(self, dt, loc=None, iloc=None):
        """Row (or mean) of a datatrace -> params dict (reference
        models.py:205-211)."""
        cols = self.param_names()
        if loc is not None:
            row = dt.loc[loc, cols].values
        elif iloc is not None:
            row = dt.iloc[iloc][cols].values
        else:
            row = dt[cols].mean(axis=0).values
        return self.array_to_dict(np.asarray(row, dtype=settings.floatx))

    def params_serie(self, serie):
        return self.array_to_dict(np.asarray(serie[self.param_names()], dtype=settings.floatx))

    # -- transformed views (reference models.py:232-268) -------------------------
    @property
    def original_to_transformed_names(self):
        return {
            p.name: f"{p.name}_{p.prior.transform.name}_"
            for p in self.ordered_params
            if p.prior.transform.name != "id"
        }

    @property
    def transformed_to_original_names(self):
        return {v: k for k, v in self.original_to_transformed_names.items()}

    def transform_params(self, params, to_dict=True, to_transformed=True, complete=False):
        if not isinstance(params, dict):
            params = self.array_to_dict(params)
        r = DictObj(self.params) if (complete or not to_dict) else DictObj()
        fwd = self.original_to_transformed_names
        bwd = self.transformed_to_original_names
        for k, v in params.items():
            if to_transformed and k in fwd:
                r[fwd[k]] = np.asarray(
                    self.params_spec[k].prior.transform.forward(np.asarray(v))
                )
            elif (not to_transformed) and k in bwd:
                orig = bwd[k]
                r[orig] = np.asarray(
                    self.params_spec[orig].prior.transform.backward(jnp.asarray(v))
                )
            else:
                r[k] = v
        if not to_dict:
            r = self.dict_to_array(r)
        return r

    # -- fix_vars marginalization ---------------------------------------------
    def fix_vars(self, datatrace=None, keys=None):
        """Pin ``keys`` columns to a datatrace (posterior chain); remaining
        dims are optimized/sampled against the chain-averaged conditional
        (reference models.py:270-283)."""
        if datatrace is None or keys is None:
            self.fixed_keys = []
            self.fixed_datatrace = None
            self.fixed_chain = None
            self.fixed_dims = []
        else:
            self.fixed_keys = keys
            self.fixed_datatrace = datatrace.copy()
            cols = self.param_names()
            self.fixed_chain = np.asarray(
                self.fixed_datatrace[cols].values, dtype=settings.floatx
            ).copy()
            self.fixed_dims = sorted(cols.index(k) for k in keys)

    @property
    def sampling_dims(self):
        return sorted(set(range(self.ndim)) - set(self.fixed_dims))

    def sampling_params(self, params):
        if isinstance(params, dict):
            return self.dict_to_array(params)[self.sampling_dims]
        return np.asarray(params)[self.sampling_dims]

    def dict_from_sampling_array(self, params):
        if self.fixed_datatrace is None:
            return self.array_to_dict(params)
        r = self.dict_to_array(self.params)
        r[self.sampling_dims] = params
        return self.array_to_dict(r)

    # -- persistence ------------------------------------------------------------
    @classmethod
    def load(cls, path):
        r = load_pkl(path)
        print("Loaded model " + path)
        r.activate()
        return r

    def reset(self, path=None):
        if path is None:
            path = self.file
        load = self.load(path)
        self.__dict__.update(load.__dict__)
        self.activate()
        return self

    def save(self, path=None):
        if path is None:
            path = self.file
        try:
            save_pkl(self, path)
            print("Saved model " + path)
        except Exception as details:
            print("Error saving model " + str(path), details)


Model = GraphicalModel


def get_model():
    """Active-or-new registry (reference get_model, models.py:20-43)."""
    if GraphicalModel.active is not None:
        return GraphicalModel.active
    return GraphicalModel()
