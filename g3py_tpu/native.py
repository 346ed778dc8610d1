"""ctypes bridge to the native C++ diagnostics core (native/g3native.cpp).

The library is compiled on demand with the system g++ (a couple of
seconds, cached next to the source); every entry point has a numpy
fallback, so the package works without a toolchain.
"""

import ctypes
import os
import subprocess

import numpy as np

__all__ = ["load", "available", "autocov_matrix", "autocov_matrix_2",
           "sigma_batch", "gelman_rubin_uni"]

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_SRC = os.path.join(_NATIVE_DIR, "g3native.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libg3native.so")

_lib = None
_tried = False


def _build():
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", _LIB, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)


def load():
    """Load (building if needed) the native library; None on failure."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if (not os.path.isfile(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_LIB)
        dp = ctypes.POINTER(ctypes.c_double)
        i64 = ctypes.c_int64
        lib.autocov_matrix.argtypes = [dp, i64, i64, i64, dp]
        lib.autocov_matrix_2.argtypes = [dp, i64, i64, i64, dp]
        lib.sigma_batch.argtypes = [dp, i64, i64, i64, dp]
        lib.gelman_rubin_uni.argtypes = [dp, i64, i64, i64, dp]
        lib.gelman_rubin_uni.restype = ctypes.c_double
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available():
    return load() is not None


def _c64(a):
    return np.ascontiguousarray(a, dtype=np.float64)


def _ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def autocov_matrix(chain, lag):
    """Lagged autocovariance matrix (native when available; reference
    semantics average.py:786-792)."""
    chain = _c64(chain)
    n, d = chain.shape
    lib = load()
    if lib is None:
        x = chain - chain.mean(axis=0)
        return (1.0 / n) * (x[: n - lag].T @ x[lag:])
    out = np.empty((d, d), dtype=np.float64)
    lib.autocov_matrix(_ptr(chain), n, d, int(lag), _ptr(out))
    return out


def autocov_matrix_2(chain, i):
    chain = _c64(chain)
    n, d = chain.shape
    lib = load()
    if lib is None:
        return autocov_matrix(chain, 2 * i) + autocov_matrix(chain, 2 * i + 1)
    out = np.empty((d, d), dtype=np.float64)
    lib.autocov_matrix_2(_ptr(chain), n, d, int(i), _ptr(out))
    return out


def sigma_batch(chain, batch_size):
    chain = _c64(chain)
    n, d = chain.shape
    lib = load()
    if lib is None:
        a = n // batch_size
        mu = chain.mean()
        block = chain[: a * batch_size].reshape(a, batch_size, d).mean(axis=1) - mu
        return (batch_size / (a - 1)) * (block.T @ block)
    out = np.empty((d, d), dtype=np.float64)
    lib.sigma_batch(_ptr(chain), n, d, int(batch_size), _ptr(out))
    return out


def gelman_rubin_uni(chains):
    """max |R-hat - 1| plus per-dim R-hat vector."""
    chains = _c64(chains)
    w, n, d = chains.shape
    lib = load()
    rhat = np.empty(d, dtype=np.float64)
    if lib is None:
        for j in range(d):
            x = chains[:, :, j]
            B = n * np.var(np.mean(x, axis=1), axis=0, ddof=1)
            W = np.mean(np.var(x, axis=1, ddof=1), axis=0)
            vhat = W * (n - 1) / n + B / n
            rhat[j] = np.sqrt(vhat / W) if W > 0 else 1.0
        return float(np.max(np.abs(rhat - 1))), rhat
    worst = lib.gelman_rubin_uni(_ptr(chains), w, n, d, _ptr(rhat))
    return float(worst), rhat
