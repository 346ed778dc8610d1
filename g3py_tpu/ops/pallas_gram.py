"""Pallas tiled gram kernels (TPU).

The SURVEY's rebuild mandate (SURVEY.md section 2.6): compute per-tile
pairwise distances without the reference's N x M x d broadcast
(``Metric.gram``, metrics.py:11-15).  The XLA forms in :mod:`.gram` already
avoid the blowup via matmul decompositions; these Pallas kernels go one
step further for the stationary hot path by **fusing the whole
"scale -> distance -> k(d) -> amplitude" pipeline into one VMEM-resident
tile program**, so the N x M distance matrix never round-trips HBM between
the matmul and the elementwise kernel function.

Only the square/cross SE form is specialized here (the benchmark and
tutorial hot path); everything else uses the XLA builders.  The kernels
fall back to XLA automatically off-TPU or for shapes below the tile size.
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

__all__ = ["se_gram", "pallas_available"]

_TILE = 256


def pallas_available():
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _se_kernel(x1_ref, x2_ref, var_ref, out_ref):
    """One (TM, TN) tile: d = |s1|^2 + |s2|^2 - 2 s1 s2^T (s pre-scaled by
    the ARD rate on the host side), out = var * exp(-0.5 d)."""
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
    out_ref[:] = var_ref[0, 0] * jnp.exp(-0.5 * d)


@functools.partial(jax.jit, static_argnames=("tile",))
def _se_gram_pallas(s1, s2, var, tile=_TILE):
    from jax.experimental import pallas as pl

    m, d = s1.shape
    n = s2.shape[0]
    grid = (m // tile, n // tile)
    var2d = jnp.reshape(var.astype(jnp.float32), (1, 1))
    return pl.pallas_call(
        _se_kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, d), lambda i, j: (i, 0)),
            pl.BlockSpec((tile, d), lambda i, j: (j, 0)),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu_smem()),
        ],
        out_specs=pl.BlockSpec((tile, tile), lambda i, j: (i, j)),
    )(s1, s2, var2d)


def se_gram(x1, x2, rate, var, tile=_TILE):
    """var * exp(-0.5 sum_d (x1-x2)^2 rate^2) — fused Pallas path on TPU
    for tile-aligned shapes, XLA fallback otherwise.

    Inputs are mean-centered and rate-scaled on the host graph (cheap O(Nd)
    work); the O(N^2) pipeline runs in one kernel."""
    x1 = jnp.asarray(x1)
    x2 = jnp.asarray(x2)
    rate = jnp.asarray(rate)
    var = jnp.asarray(var)
    m, n = x1.shape[0], x2.shape[0]
    usable = (
        pallas_available()
        and m % tile == 0
        and n % tile == 0
        and x1.ndim == 2
    )
    if not usable:
        d = weighted_sqdist(x1, x2, rate)
        return var * jnp.exp(-0.5 * d)
    s1 = x1 * rate
    s2 = x2 * rate
    center = jax.lax.stop_gradient(
        0.5 * (jnp.mean(s1, axis=0) + jnp.mean(s2, axis=0)))
    return _se_gram_pallas((s1 - center).astype(jnp.float32),
                           (s2 - center).astype(jnp.float32), var, tile)
