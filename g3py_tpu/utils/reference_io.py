"""Readers for the reference g3py's on-disk artifacts.

The reference persists three kinds of pickles (reference libs/__init__.py:60-73
``save_pkl``/``load_pkl``):

* ``*.g3`` param dicts — plain ``{name: np.float32}`` dicts in the
  *transformed* (sampling) space, e.g. ``GP_SE_var_log_``;
* ``*.g3`` full models — pickled ``StochasticProcess`` objects containing
  theano/pymc3 graphs (reference stochastic.py:107-119 ``save``);
* ``*.g3x``/``*.g3x.r``/``*.g3x.s`` experiment files — an ``Experiment``
  plus its results/simulations DataFrames (reference selection.py:90-128).

None of theano/pymc3 is importable here, so full models are loaded through a
*stub unpickler* that replaces every g3py/theano/pymc3 class with an inert
attribute bag while keeping numpy/pandas payloads intact.  That is enough to
recover the data arrays, hyperparameter values and model structure — which is
exactly what the reference-parity tests need.
"""

import pickle

import numpy as np
import pandas as pd

__all__ = [
    "load_reference_pickle",
    "load_experiment_frames",
    "transformed_to_natural",
    "natural_to_transformed",
    "Stub",
]


class Stub:
    """Inert stand-in for an un-importable pickled class.

    Instance state lands in ``.state`` (a dict); construction args in
    ``._args``.  Attribute access returns a fresh ``Stub`` so that bound
    methods re-created via ``getattr`` during unpickling don't explode.
    """

    def __init__(self, *args, **kwargs):
        object.__setattr__(self, "_args", args)
        object.__setattr__(self, "state", {})

    def __setstate__(self, state):
        if isinstance(state, tuple):  # (dictstate, slotstate)
            merged = {}
            for part in state:
                if isinstance(part, dict):
                    merged.update(part)
            state = merged
        object.__setattr__(self, "state", state if isinstance(state, dict)
                           else {"__state__": state})

    def __getattr__(self, name):
        if name.startswith("__") and name.endswith("__"):
            raise AttributeError(name)
        try:  # unpickling creates instances without __init__
            state = object.__getattribute__(self, "state")
        except AttributeError:
            return Stub()
        if name in state:
            return state[name]
        return Stub()

    def __call__(self, *args, **kwargs):
        return Stub()

    def __repr__(self):
        cls = type(self).__name__
        keys = list(object.__getattribute__(self, "state"))[:6]
        return f"<Stub:{cls} {keys}>"


class _DictStub(dict):
    """Reference ``DictObj`` (libs/__init__.py:17-31): a dict with attribute
    access."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)


class _StubUnpickler(pickle.Unpickler):
    _STUBBED = ("g3py", "theano", "pymc3")

    def find_class(self, module, name):
        # pandas<2 index classes that pandas 3.x no longer ships
        if module.startswith("pandas") and name in (
                "Int64Index", "Float64Index", "UInt64Index"):
            return pd.Index
        if not module.split(".")[0] in self._STUBBED:
            return super().find_class(module, name)
        if name == "DictObj":
            return type("DictObj", (_DictStub,), {"__module__": module})
        return type(name, (Stub,), {"__module__": module})

    def persistent_load(self, pid):
        return None


def load_reference_pickle(path):
    """Load any reference ``.g3``/``.g3x``/``.pkl`` artifact.

    Plain param dicts come back as real dicts; full models come back as
    ``Stub`` trees (class name preserved, state under ``.state``)."""
    with open(path, "rb") as f:
        return _StubUnpickler(f).load()


def load_experiment_frames(base_path):
    """Load an experiment's results (``.r``) and simulations (``.s``)
    DataFrames. ``base_path`` is the ``file.g3x`` path without suffix."""
    results = load_reference_pickle(base_path + ".r")
    simulations = load_reference_pickle(base_path + ".s")
    return results, simulations


def transformed_to_natural(params):
    """Map a reference transformed-space param dict onto this package's
    natural-space convention.

    The reference samples log-transformed positives under ``<name>_log_``
    keys (pymc3 naming, reference models.py:232-268 ``transform_params``);
    our dicts are keyed by the natural name with the value exponentiated.
    Values pass through ``np.float32`` first so the round trip matches the
    reference's float32 pipeline bit-for-bit.
    """
    out = {}
    for key, val in params.items():
        if key.startswith("_"):
            continue  # score annotations like _ll
        val = np.asarray(val, dtype=np.float32)
        if key.endswith("_log_"):
            out[key[: -len("_log_")]] = np.exp(val)
        elif key.endswith("_log__"):  # pymc3 >=3.2 spelling
            out[key[: -len("_log__")]] = np.exp(val)
        else:
            out[key] = val
    return out


#: hyper-name suffixes the reference declares with a log transform
#: (FlatExp/Exponential priors on amplitudes/rates/scales — see
#: reference hypers check_hypers call sites); everything else samples
#: untransformed (Flat: biases, shifts, tanh centers, ...)
_LOG_TRANSFORMED_SUFFIXES = (
    "_var", "_Var", "_rate", "_Scales", "_scale", "_power", "_alpha",
    "_freq", "_a", "_b", "_w", "_degree", "_nu",
)


def natural_to_transformed(params):
    """Inverse of :func:`transformed_to_natural`.

    The reference's transform set is declared per-parameter (pymc3 priors),
    not recoverable from values, so this maps by the reference's naming
    convention: the suffixes in ``_LOG_TRANSFORMED_SUFFIXES`` carry FlatExp
    (log) transforms; anything else passes through unchanged."""
    out = {}
    for key, val in params.items():
        val = np.asarray(val, dtype=np.float32)
        if key.endswith(_LOG_TRANSFORMED_SUFFIXES):
            out[key + "_log_"] = np.log(val)
        else:
            out[key] = val
    return out
