"""Containers and persistence helpers.

TPU-native rebuild of the reference support layer
(``/root/reference/g3py/libs/__init__.py:17-91``): attribute-dict container,
wall-clock abort callback, pickle/JSON persistence, and datatrace (pandas
frame) persistence.  The reference stored datatraces as HDF5 via pytables;
this build uses parquet (pyarrow) with an HDF5-compatible fallback since the
storage engine is orthogonal to the math.
"""

import json
import os
import time
from copy import copy

import numpy as np

try:
    import cPickle as pickle  # pragma: no cover
except ImportError:
    import pickle

__all__ = [
    "DictObj",
    "MaxTime",
    "clone",
    "nan_to_high",
    "save_pkl",
    "load_pkl",
    "save_datatrace",
    "load_datatrace",
    "save_json",
    "random_state",
]


class DictObj(dict):
    """dict with attribute access (reference libs/__init__.py:17-44)."""

    def __init__(self, data=None, *args, **kwargs):
        super().__init__(*args, **kwargs)
        if data is not None:
            for k, v in data.items():
                self[k] = v

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError("No such attribute: " + name)

    def __setattr__(self, name, value):
        self[name] = value

    def __delattr__(self, name):
        if name in self:
            del self[name]
        else:
            raise AttributeError("No such attribute: " + name)

    def clone(self):
        return DictObj(data=self)

    def copy(self):
        return DictObj(data=self)


class MaxTime:
    """Optimizer callback raising when a wall-clock budget is exceeded
    (reference libs/__init__.py:47-54)."""

    def __init__(self, max_sec=60):
        self.max_sec = max_sec + time.time()

    def __call__(self, xk=None):
        if time.time() > self.max_sec:
            raise TimeoutError("Terminating: time limit reached")


def clone(c):
    return copy(c)


def nan_to_high(x):
    """Replace non-finite entries with 1e100 so scipy optimizers never see
    NaN/Inf (reference libs/__init__.py:61-62)."""
    return np.where(np.isfinite(x), x, 1.0e100)


def _ensure_dir(path):
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)


def save_pkl(to_pkl, path="file.pkl"):
    _ensure_dir(path)
    with open(path, "wb") as f:
        pickle.dump(to_pkl, f, protocol=-1)


def load_pkl(path="file.pkl"):
    with open(path, "rb") as f:
        return pickle.load(f)


def save_datatrace(dt, path="datatrace.parquet", key="datatrace", mode="w"):
    """Persist a datatrace frame.  Parquet by default; ``.h5`` paths write
    the reference's HDF5 format through h5py (no pytables in the env,
    reference libs/__init__.py:76-82)."""
    _ensure_dir(path)
    if path.endswith((".h5", ".hdf5")):
        import h5py

        with h5py.File(path, mode) as f:
            if key in f:
                del f[key]
            grp = f.create_group(key)
            grp.attrs["columns"] = list(dt.columns)
            for c in dt.columns:
                col = dt[c].to_numpy()
                if col.dtype == object:
                    col = col.astype("S")
                grp.create_dataset(c, data=col)
        return
    dt.to_parquet(path)


def load_datatrace(path="datatrace.parquet"):
    import pandas as pd

    try:
        if path.endswith((".h5", ".hdf5")):
            import h5py

            with h5py.File(path, "r") as f:
                key = list(f.keys())[0]
                grp = f[key]
                cols = [c if isinstance(c, str) else c.decode()
                        for c in grp.attrs["columns"]]
                return pd.DataFrame({c: grp[c][:] for c in cols})[cols]
        return pd.read_parquet(path)
    except Exception as e:  # mirror reference's forgiving loader (:84-87)
        print(e)
        return None


def save_json(dict_to_json, path="file.json"):
    _ensure_dir(path)
    with open(path, "w") as f:
        json.dump(dict_to_json, fp=f)


def random_state(seed=None):
    """A numpy Generator; the host-side RNG used where the reference used
    global ``np.random``."""
    return np.random.default_rng(seed)
