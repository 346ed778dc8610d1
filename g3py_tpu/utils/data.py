"""Dataset loaders and observation splitters.

Rebuild of ``/root/reference/g3py/libs/data.py``.  The reference's CSV
datasets (public UCI/SIDC/materials data, reference data.py:11-118) are
vendored under ``datasets/`` so a standalone checkout is self-contained;
``$G3PY_DATASETS`` still overrides the search path.  A loader whose file
is missing raises — the deterministic synthetic surrogates (matching
shapes, for air-gapped smoke tests only) are opt-in via
``G3PY_SYNTHETIC_DATA=1``.
"""

import os

import numpy as np
import pandas as pd

__all__ = [
    "save_csv",
    "load_csv",
    "data_sunspots",
    "data_co2",
    "data_engel",
    "data_heart",
    "data_eurusd",
    "data_abalone",
    "data_creep",
    "data_ailerons",
    "data_rivers",
    "random_obs",
    "uniform_obs",
    "datasets_path",
]


#: candidate locations for the bundled CSV datasets (vendored in-package,
#: mirroring the reference's g3py/libs/datasets/ layout)
_DATASET_DIRS = (
    os.path.join(os.path.dirname(__file__), "datasets"),
)


def datasets_path(filename=None):
    """First existing candidate dir ($G3PY_DATASETS override, then the
    package-local vendored datasets/).  With ``filename``, the first dir
    actually CONTAINING that file."""
    cands = [os.environ.get("G3PY_DATASETS"), *_DATASET_DIRS]
    for c in cands:
        if not c or not os.path.isdir(c):
            continue
        if filename is None:
            return c
        if os.path.isfile(os.path.join(c, filename)):
            return c
    return None


def _warn_synthetic(name, soft=False):
    """Gate + warn on the synthetic fallback.  Real data is bundled, so a
    missing file means a broken checkout — raise unless the user opted
    into surrogates explicitly (G3PY_SYNTHETIC_DATA=1).  ``soft`` marks
    the statsmodels-fetched series (co2/engel, reference data.py:20-44):
    the reference itself needs statsmodels at runtime for those, so a
    missing import warns instead of raising."""
    if not soft and os.environ.get("G3PY_SYNTHETIC_DATA", "") not in (
            "1", "true", "yes"):
        raise FileNotFoundError(
            f"dataset {name!r} not found under $G3PY_DATASETS or "
            f"{_DATASET_DIRS}. The files ship with the package — a missing "
            "one means a broken checkout. Set G3PY_SYNTHETIC_DATA=1 to opt "
            "into a synthetic surrogate with matching shapes.")
    import warnings

    warnings.warn(
        f"dataset {name!r} not found; returning a SYNTHETIC surrogate "
        "with matching shapes (G3PY_SYNTHETIC_DATA=1). Results will not "
        "match the reference's.",
        stacklevel=3,
    )


def _synthetic_series(n, seed, trend=0.0, period=None, noise=0.1):
    rng = np.random.default_rng(seed)
    x = np.arange(n, dtype=np.float32)
    y = trend * x + noise * rng.standard_normal(n)
    if period:
        y = y + np.sin(2 * np.pi * x / period) ** 2 * 100
    return x, y.astype(np.float32)


def data_sunspots():
    """Yearly sunspot activity, annual SIDC means 1700-2008 (reference
    data.py:11-17 fetches the same 309-point series via statsmodels; a copy
    of that public-domain table is bundled as datasets/sunspots.csv).

    Returns (x, y) with x = 0..308 (the positional index, matching the
    reference's ``data.index.values``) and y = SUNACTIVITY.
    """
    try:
        import statsmodels.api as sm

        data = sm.datasets.sunspots.load_pandas().data["SUNACTIVITY"]
        return data.index.values[:], data.values[:]
    except Exception:
        pass
    bundled = os.path.join(os.path.dirname(__file__), "datasets",
                           "sunspots.csv")
    if os.path.isfile(bundled):
        df = pd.read_csv(bundled)
        return df.index.values[:], df["SUNACTIVITY"].values[:]
    _warn_synthetic("sunspots")
    return _synthetic_series(309, seed=11, period=11.0, noise=5.0)


def data_co2():
    """Mauna-Loa CO2 (reference data.py:20-33)."""
    try:
        import statsmodels.api as sm

        data = sm.datasets.co2.load_pandas().data
        return data.index.values[:], data.values[:, 0]
    except Exception:
        _warn_synthetic("co2", soft=True)
        x = np.arange(2225, dtype=np.float32)
        y = 315 + 0.004 * x + 3 * np.sin(2 * np.pi * x / 52.0)
        return x, y.astype(np.float32)


def data_engel():
    """Engel food-expenditure data (reference data.py:36-44)."""
    try:
        import statsmodels.api as sm

        data = sm.datasets.engel.load_pandas().data
        return data.index.values, data["income"].values
    except Exception:
        _warn_synthetic("engel", soft=True)
        rng = np.random.default_rng(7)
        inc = np.sort(rng.lognormal(6.5, 0.5, 235)).astype(np.float32)
        return np.arange(235), inc


def _load_csv(name, **kwargs):
    path = datasets_path(name)
    if path is None:
        return None
    f = os.path.join(path, name)
    if not os.path.isfile(f):
        return None
    return pd.read_csv(f, **kwargs)


def data_heart():
    """Heart-rate series (reference data.py:47-49)."""
    hr = _load_csv("hr2.txt", names=["hr"], dtype=np.float32)
    if hr is None:
        _warn_synthetic("hr2.txt")
        x, y = _synthetic_series(1800, seed=3, period=60.0, noise=2.0)
        y = 90 + 0.1 * y
        return x, y.reshape(-1, 1)
    return hr.index.values, hr.values


def data_eurusd():
    """EURUSD series (reference data.py:52-54)."""
    fx = _load_csv("EURUSD-1401-1510.txt", names=["EURUSD"], dtype=np.float32)
    if fx is None:
        _warn_synthetic("EURUSD-1401-1510.txt")
        rng = np.random.default_rng(5)
        y = 1.3 + np.cumsum(0.001 * rng.standard_normal(721)).astype(np.float32)
        return np.arange(721), y.reshape(-1, 1)
    return fx.index.values, fx.values


def data_abalone(dataframe=False, raw=False):
    """UCI abalone, 4177 x 9 (reference data.py:57-69) — the benchmark
    workload's dataset."""
    names = ["Sex", "Length", "Diam", "Height", "Whole", "Shucked", "Viscera",
             "Shell", "Rings"]
    abalone = _load_csv("abalone.data", names=names)
    if abalone is None:
        _warn_synthetic("abalone.data")
        rng = np.random.default_rng(42)
        n = 4177
        length = rng.uniform(0.1, 0.8, n)
        abalone = pd.DataFrame({
            "Sex": rng.choice(["M", "F", "I"], n),
            "Length": length,
            "Diam": length * 0.8 + 0.01 * rng.standard_normal(n),
            "Height": length * 0.35 + 0.01 * rng.standard_normal(n),
            "Whole": length**3 * 4 + 0.05 * rng.standard_normal(n),
            "Shucked": length**3 * 1.7 + 0.03 * rng.standard_normal(n),
            "Viscera": length**3 * 0.9 + 0.02 * rng.standard_normal(n),
            "Shell": length**3 * 1.2 + 0.02 * rng.standard_normal(n),
            "Rings": np.clip(np.round(3 + length * 15
                                      + rng.standard_normal(n)), 1, 29),
        })[names]
    if not raw:
        abalone = abalone.copy()
        abalone["Sex"] = (abalone["Sex"] == "M") * 1.0 + (abalone["Sex"] == "F") * 0.0
    if dataframe:
        return abalone
    x = abalone.drop("Rings", axis=1).values.astype(np.float32)
    y = abalone["Rings"].values.astype(np.float32)
    return x, y


_CREEP_NAMES = [
    "Lifetime", "Rupture_stress", "Temperature", "Carbon", "Silicon",
    "Manganese", "Phosphorus", "Sulphur", "Chromium", "Molybdenum",
    "Tungsten", "Nickel", "Copper", "Vanadium", "Niobium", "Nitrogen",
    "Aluminium", "Boron", "Cobalt", "Tantalum", "Oxygen",
    "Normalising_temperature", "Normalising_time", "Cooling_rate",
    "Tempering_temperature", "Tempering_time", "Cooling_rate_tempering",
    "Annealing_temperature", "Annealing_time", "Cooling_rate_annealing",
    "Rhenium",
]


def data_creep(dataframe=False, raw=False):
    """Materials creep-rupture data, 2066 x 31 (reference data.py:70-88:
    same column names, drops Tantalum/Cooling_rate_annealing/Rhenium and
    scales Rupture_stress by 0.1 unless raw)."""
    path = datasets_path("creep")
    creep = None
    if path is not None:
        creep = pd.read_table(os.path.join(path, "creep"),
                              names=_CREEP_NAMES).astype("float32")
    if creep is None:
        _warn_synthetic("creep")
        rng = np.random.default_rng(13)
        n = 2066
        creep = pd.DataFrame(
            rng.standard_normal((n, len(_CREEP_NAMES))).astype(np.float32),
            columns=_CREEP_NAMES)
        creep["Rupture_stress"] = (100 + 30 * creep["Temperature"]
                                   + 5 * rng.standard_normal(n))
    if not raw:
        creep = creep.drop(
            ["Tantalum", "Cooling_rate_annealing", "Rhenium"], axis=1)
        creep = creep.assign(Rupture_stress=creep["Rupture_stress"] * 1e-1)
    if dataframe:
        return creep
    x = creep.drop("Rupture_stress", axis=1).values.astype(np.float32)
    y = creep["Rupture_stress"].values.astype(np.float32)
    return x, y


_AILERONS_NAMES = (
    ["climbRate", "Sgz", "p", "q", "curPitch", "curRoll", "absRoll",
     "diffClb", "diffRollRate", "diffDiffClb"]
    + [f"SeTime{i}" for i in range(1, 15)]
    + [f"diffSeTime{i}" for i in range(1, 15)]
    + ["alpha", "Se", "goal"])


def data_ailerons(dataframe=False, raw=False):
    """F16 ailerons control data, 7154 x 41 (reference data.py:90-109:
    same column names; unless raw, goal scales by 1e4 and the even
    diffSeTime columns drop)."""
    ail = _load_csv("ailerons.data", names=_AILERONS_NAMES)
    if ail is None:
        _warn_synthetic("ailerons.data")
        rng = np.random.default_rng(17)
        n = 7154
        ail = pd.DataFrame(
            rng.standard_normal((n, len(_AILERONS_NAMES))).astype(np.float32),
            columns=_AILERONS_NAMES)
        ail["goal"] = (ail["climbRate"] * 0.5 - ail["Sgz"] * 0.2
                       + 0.05 * rng.standard_normal(n))
    ail = ail.astype("float32")
    if not raw:
        ail = ail.assign(goal=ail["goal"] * 1e4)
        ail = ail.drop([f"diffSeTime{i}" for i in range(2, 15, 2)], axis=1)
    if dataframe:
        return ail
    x = ail.drop("goal", axis=1).values.astype(np.float32)
    y = ail["goal"].values.astype(np.float32)
    return x, y


def data_rivers():
    """River flow logs (reference data.py:113-118)."""
    cols = ["bmau", "bmis", "cip", "col", "mau"]
    path = datasets_path("logbmau.csv")
    if path is not None:
        try:
            frames = [np.exp(pd.read_csv(os.path.join(path, f"log{c}.csv"),
                                         names=[c], dtype=np.float32, skiprows=1))
                      for c in cols]
            return pd.concat(frames, axis=1)
        except Exception:
            pass
    _warn_synthetic("log{bmau,bmis,cip,col,mau}.csv")
    rng = np.random.default_rng(23)
    n = 500
    return pd.DataFrame(
        {c: np.exp(2 + 0.5 * rng.standard_normal(n)).astype(np.float32)
         for c in cols})


def random_obs(x, p=0.2, s=1.0, rng=None, plot=False):
    """Random train/test index split: fraction p observed out of the first
    s-fraction of the data (reference data.py:129-164)."""
    if rng is None:
        rng = np.random.default_rng()
    n = len(x)
    limit = int(n * s) if s <= 1 else int(s)
    nobs = int(limit * p) if p <= 1 else int(p)
    perm = rng.permutation(limit)
    obs = np.sort(perm[:nobs])
    test = np.sort(perm[nobs:])
    return obs, test


def uniform_obs(x, p=0.2, s=1.0, plot=False):
    """Evenly-spaced train/test split (reference data.py:167-190)."""
    n = len(x)
    limit = int(n * s) if s <= 1 else int(s)
    nobs = int(limit * p) if p <= 1 else int(p)
    nobs = max(nobs, 1)
    obs = np.unique(np.linspace(0, limit - 1, nobs).astype(int))
    test = np.setdiff1d(np.arange(limit), obs)
    return obs, test


def save_csv(df, file, index_col=0):
    """reference data.py:122-123"""
    return df.to_csv(file)


def load_csv(file, index_col=0):
    """reference data.py:126-127"""
    return pd.read_csv(file, index_col=index_col)
