"""Pallas tiled gram kernels (TPU).

The SURVEY's rebuild mandate (SURVEY.md section 2.6): compute per-tile
pairwise distances without the reference's N x M x d broadcast
(``Metric.gram``, metrics.py:11-15).  The XLA forms in :mod:`.gram` already
avoid the blowup via matmul decompositions; these Pallas kernels go one
step further for the stationary hot path by **fusing the whole
"scale -> distance -> k(d) -> amplitude" pipeline into one VMEM-resident
tile program**, so the N x M distance matrix never round-trips HBM between
the matmul and the elementwise kernel function.

The stationary ARD_L2 families sharing the norm-decomposition tile
structure (SE, MAT32, MAT52, RQ) are specialized here; everything else uses
the XLA builders.  The kernels fall back to XLA automatically off-TPU or
for shapes below the tile size, and only the families measured at >= XLA
parity on real hardware dispatch by default (see _DEFAULT_ON).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp


def pltpu_smem():
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.SMEM

from ..config import settings
from .gram import weighted_sqdist

__all__ = ["se_gram", "stationary_gram", "pallas_gram_enabled",
           "pallas_available"]

_TILE = 256


def pallas_available():
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


# elementwise k(d_metric) forms on the ARD_L2 metric distance
# d_metric = 0.5 * ||s1 - s2||^2 with rate-scaled coords (metrics.py ARD_L2)
_KFORMS = {
    "se": lambda dm, extra: jnp.exp(-dm),
    # sqrt clamped away from 0 for finite lengthscale gradients at the gram
    # diagonal (see hypers.kernels.MAT32)
    "mat32": lambda dm, extra: (
        (1.0 + jnp.sqrt(jnp.maximum(3.0 * dm, 1e-36)))
        * jnp.exp(-jnp.sqrt(jnp.maximum(3.0 * dm, 1e-36)))),
    "mat52": lambda dm, extra: (
        (1.0 + jnp.sqrt(jnp.maximum(5.0 * dm, 1e-36)) + 5.0 * dm / 3.0)
        * jnp.exp(-jnp.sqrt(jnp.maximum(5.0 * dm, 1e-36)))),
    "rq": lambda dm, extra: jnp.power(1.0 + dm / extra, -extra),
}


def _stationary_kernel(kform, x1_ref, x2_ref, var_ref, extra_ref, out_ref):
    """One (TM, TN) tile: d = |s1|^2 + |s2|^2 - 2 s1 s2^T (s pre-scaled by
    the ARD rate on the host side), out = var * k(0.5 d)."""
    s1 = x1_ref[:]  # (TM, d)
    s2 = x2_ref[:]  # (TN, d)
    n1 = jnp.sum(s1 * s1, axis=-1)
    n2 = jnp.sum(s2 * s2, axis=-1)
    cross = jax.lax.dot_general(
        s1, s2,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    d = jnp.maximum(n1[:, None] + n2[None, :] - 2.0 * cross, 0.0)
    out_ref[:] = var_ref[0, 0] * kform(0.5 * d, extra_ref[0, 0])


@functools.partial(jax.jit, static_argnames=("kind", "tile"))
def _stationary_gram_pallas(kind, s1, s2, var, extra, tile=_TILE):
    from jax.experimental import pallas as pl

    m, d = s1.shape
    n = s2.shape[0]
    grid = (m // tile, n // tile)
    var2d = jnp.reshape(var.astype(jnp.float32), (1, 1))
    extra2d = jnp.reshape(extra.astype(jnp.float32), (1, 1))
    return pl.pallas_call(
        functools.partial(_stationary_kernel, _KFORMS[kind]),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, d), lambda i, j: (i, 0)),
            pl.BlockSpec((tile, d), lambda i, j: (j, 0)),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu_smem()),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu_smem()),
        ],
        out_specs=pl.BlockSpec((tile, tile), lambda i, j: (i, j)),
    )(s1, s2, var2d, extra2d)


def _xla_form(kind, x1, x2, rate, var, extra):
    dm = 0.5 * weighted_sqdist(x1, x2, rate)
    return var * _KFORMS[kind](dm, extra)


def _pallas_form(kind, x1, x2, rate, var, extra, tile):
    s1 = x1 * rate
    s2 = x2 * rate
    center = jax.lax.stop_gradient(
        0.5 * (jnp.mean(s1, axis=0) + jnp.mean(s2, axis=0)))
    return _stationary_gram_pallas(
        kind, (s1 - center).astype(jnp.float32),
        (s2 - center).astype(jnp.float32), var, extra, tile)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 6))
def _gram_hybrid(kind, x1, x2, rate, var, extra, tile):
    # the primal must be the Pallas path too — custom_vjp only calls f_fwd
    # under differentiation, so an XLA primal would leave the fused kernel
    # dead on every inference call and make logp(u) differ from
    # value_and_grad(logp)(u)[0] by reduction-order rounding
    return _pallas_form(kind, x1, x2, rate, var, extra, tile)


def _gram_hybrid_fwd(kind, x1, x2, rate, var, extra, tile):
    """Pallas forward — the fused VMEM pipeline — with primals saved."""
    out = _pallas_form(kind, x1, x2, rate, var, extra, tile)
    return out, (x1, x2, rate, var, extra)


def _gram_hybrid_bwd(kind, tile, res, g):
    """Backward through the mathematically identical XLA form —
    ``pallas_call`` has no reverse rule, and the XLA vjp is a handful of
    matmuls either way."""
    x1, x2, rate, var, extra = res
    _, vjp = jax.vjp(lambda a, b, r, v, e: _xla_form(kind, a, b, r, v, e),
                     x1, x2, rate, var, extra)
    return vjp(g)


_gram_hybrid.defvjp(_gram_hybrid_fwd, _gram_hybrid_bwd)


# families measured at >= XLA parity on a real v5e (n=8192, d=8, f32, with
# the Pallas primal actually dispatching; docs/performance.md): mat32 1.07x,
# mat52 1.07x.  se (0.75x) and rq (0.78x) lose to XLA's own fusion there, so
# they only dispatch when the user opts into settings.pallas_gram = "all".
_DEFAULT_ON = frozenset({"mat32", "mat52"})


def pallas_gram_enabled(kind):
    flag = settings.pallas_gram
    if flag in (False, "off", None):
        return False
    if flag == "all":
        return kind in _KFORMS
    return kind in _DEFAULT_ON


def stationary_gram(kind, x1, x2, rate, var, extra=None, tile=_TILE):
    """Fused Pallas gram ``var * k(ARD_L2(x1, x2))`` for the stationary
    families sharing the norm-decomposition tile structure (SE/MAT32/MAT52/
    RQ).  Returns None when the Pallas path doesn't apply (off-TPU, ragged
    tiles, weird dims) — caller falls back to its XLA form.

    Inputs are mean-centered and rate-scaled on the host graph (cheap O(Nd)
    work); the O(N^2) "distance -> k(d) -> amplitude" pipeline runs in one
    VMEM-resident kernel, so the N x M distance matrix never round-trips
    HBM.  Differentiable: forward is Pallas, backward replays the XLA form's
    vjp (same math; outputs agree to f32 reduction-order rounding,
    measured <= 5e-6 relative)."""
    if kind not in _KFORMS:
        return None
    x1 = jnp.asarray(x1)
    x2 = jnp.asarray(x2)
    m, n = x1.shape[0], x2.shape[0]
    usable = (
        pallas_available()
        and x1.ndim == 2
        and m % tile == 0
        and n % tile == 0
    )
    if not usable:
        return None
    rate = jnp.asarray(rate)
    var = jnp.asarray(var)
    extra = jnp.asarray(1.0 if extra is None else extra, dtype=jnp.float32)
    return _gram_hybrid(kind, x1, x2, rate, var, extra, tile)


def se_gram(x1, x2, rate, var, tile=_TILE):
    """var * exp(-0.5 sum_d (x1-x2)^2 rate^2) — fused Pallas path on TPU
    for tile-aligned shapes, XLA fallback otherwise."""
    out = stationary_gram("se", x1, x2, rate, var, tile=tile)
    if out is None:
        d = weighted_sqdist(jnp.asarray(x1), jnp.asarray(x2),
                            jnp.asarray(rate))
        return jnp.asarray(var) * jnp.exp(-0.5 * d)
    return out
