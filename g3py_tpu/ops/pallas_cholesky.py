"""Pallas blocked Cholesky for TPU.

Why: XLA's Cholesky at n=4096 runs ~4 TFLOP/s on v5e, with the cost
concentrated in panel factorizations — sub-512 Cholesky/TRSM lower to
hundreds of tiny XLA ops at ~0.01 TFLOP/s.  This kernel keeps each panel
entirely in VMEM (one unblocked factorization loop on the VPU, tens of
microseconds), converts the panel TRSM into an MXU matmul against the
panel *inverse*, and streams trailing rank-B updates through the MXU with
row-strip HBM<->VMEM DMA:

  per panel k:   DMA the (B, B) diagonal tile, factor + invert in VMEM
  per row i > k: DMA the full (B, n) row strip once, compute
                 L[i,k] = A[i,k] Dinv_k^T and all trailing updates
                 A[i,j] -= L[i,k] L[j,k]^T (j <= i) as in-VMEM MXU dots,
                 DMA the strip back.

Traffic: ~n^2 * nb / 2 floats of strip DMA (~1 GB at n=4096, B=256);
compute: n^3/3 MACs on the MXU + nb unblocked VMEM panels.

Outputs both the factor L (in-place, strict upper triangle stale) and the
per-panel inverses D_k^{-1} — the latter feed the blocked triangular
inversion in the ``mvn_quad_logdet`` backward for free.

STATUS (round 1): numerically verified in interpret mode (tests), but NOT
wired into the hot path.  On the hosted axon tunnel the manual-DMA path is
emulated (~100 ms per ``make_async_copy``) and sequential Mosaic VPU loops
run ~1000x below VPU peak, so XLA's native Cholesky (4.1 TFLOP/s at
n=4096) wins on this specific runtime.  On a standard TPU runtime the
design's cost model gives ~2-3 ms vs XLA's 5.5 ms; re-benchmark before
enabling (see CLAUDE.md "Performance ledger").
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["pallas_cholesky", "pallas_available"]

_BLOCK = 256


def pallas_available():
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _panel_factorize(akk, block):
    """Unblocked right-looking Cholesky of a (B, B) array in registers/VMEM.

    One fori over columns; each iteration a masked rank-1 VPU update.  All
    row/column selection is mask-based (Mosaic has no value-level
    dynamic_slice)."""
    rows = lax.broadcasted_iota(jnp.int32, (block, block), 0)
    cols = lax.broadcasted_iota(jnp.int32, (block, block), 1)

    def col_step(j, a):
        pivot = jnp.sum(jnp.where((rows == j) & (cols == j), a, 0.0))
        inv_sqrt = lax.rsqrt(jnp.maximum(pivot, 1e-30))
        col = jnp.sum(jnp.where(cols == j, a, 0.0), axis=1) * inv_sqrt
        ridx = lax.broadcasted_iota(jnp.int32, (block, 1), 0)[:, 0]
        col = jnp.where(ridx >= j, col, 0.0)
        a = jnp.where(cols == j, col[:, None], a)
        upd = col[:, None] * col[None, :]
        return a - jnp.where(cols > j, upd, 0.0)

    a = lax.fori_loop(0, block, col_step, akk)
    return jnp.where(rows >= cols, a, 0.0)


def _panel_invert(lkk, block):
    """Inverse of a (B, B) lower-triangular array by forward substitution
    (row i of X from rows < i): X = L^{-1}.  Mask-based row selection."""
    rows = lax.broadcasted_iota(jnp.int32, (block, block), 0)
    cols = lax.broadcasted_iota(jnp.int32, (block, block), 1)
    ridx = lax.broadcasted_iota(jnp.int32, (block, 1), 0)[:, 0]

    def row_step(i, x):
        li = jnp.sum(jnp.where(rows == i, lkk, 0.0), axis=0)
        pivot = jnp.sum(jnp.where((rows == i) & (cols == i), lkk, 0.0))
        li_masked = jnp.where(ridx < i, li, 0.0)
        acc = jnp.sum(li_masked[:, None] * x, axis=0)
        e_i = (ridx == i).astype(x.dtype)
        new_row = (e_i - acc) / jnp.maximum(pivot, 1e-30)
        return jnp.where(rows == i, new_row[None, :], x)

    x = lax.fori_loop(0, block, row_step, jnp.zeros((block, block), lkk.dtype))
    return jnp.where(rows >= cols, x, 0.0)


def _make_kernel(nb, block, n):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P = jax.lax.Precision.HIGHEST

    def kernel(a_any, out_any, dinv_any, akk, dinvb, strip, colbuf, sem):
        def dma_wait(src, dst):
            cp = pltpu.make_async_copy(src, dst, sem)
            cp.start()
            cp.wait()

        # working copy: a -> out, streamed one row-strip at a time
        def copy_row(i, _):
            dma_wait(a_any.at[pl.ds(i * block, block), :], strip)
            dma_wait(strip, out_any.at[pl.ds(i * block, block), :])
            return _

        lax.fori_loop(0, nb, copy_row, None)

        def panel(k, _):
            kb = k * block
            dma_wait(out_any.at[pl.ds(kb, block), pl.ds(kb, block)], akk)
            lkk = _panel_factorize(akk[:], block)
            akk[:] = lkk
            dma_wait(akk, out_any.at[pl.ds(kb, block), pl.ds(kb, block)])
            dinvb[:] = _panel_invert(lkk, block)
            dma_wait(dinvb, dinv_any.at[k])

            def strip_step(i, __):
                ib = i * block
                dma_wait(out_any.at[pl.ds(ib, block), :], strip)
                lik = jax.lax.dot_general(
                    strip[:, pl.ds(kb, block)], dinvb[:],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=P)
                strip[:, pl.ds(kb, block)] = lik
                colbuf[pl.ds(ib, block), :] = lik

                def trail(j, ___):
                    jb = j * block
                    ljk = colbuf[pl.ds(jb, block), :]
                    upd = jax.lax.dot_general(
                        lik, ljk,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=P)
                    strip[:, pl.ds(jb, block)] = (
                        strip[:, pl.ds(jb, block)] - upd)
                    return ___

                lax.fori_loop(k + 1, i + 1, trail, None)
                dma_wait(strip, out_any.at[pl.ds(ib, block), :])
                return __

            lax.fori_loop(k + 1, nb, strip_step, None)
            return _

        lax.fori_loop(0, nb, panel, None)

    scratch = [
        pltpu.VMEM((block, block), jnp.float32),   # akk
        pltpu.VMEM((block, block), jnp.float32),   # dinvb
        pltpu.VMEM((block, n), jnp.float32),       # row strip
        pltpu.VMEM((n, block), jnp.float32),       # panel column buffer
        pltpu.SemaphoreType.DMA,                   # dma semaphore
    ]
    return kernel, scratch


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def _pallas_cholesky(a, block=_BLOCK, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = a.shape[-1]
    nb = n // block
    kernel, scratch = _make_kernel(nb, block, n)
    out, dinv = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, n), jnp.float32),
            jax.ShapeDtypeStruct((nb, block, block), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.ANY),
                   pl.BlockSpec(memory_space=pltpu.ANY)),
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(a.astype(jnp.float32))
    return out, dinv


def pallas_cholesky(a, block=_BLOCK, interpret=False):
    """Blocked Cholesky; returns (L, panel_inverses (nb, B, B)).

    Requires n % block == 0; callers fall back to XLA otherwise.  The
    strict upper triangle of L is stale (callers tril when materializing)."""
    a = jnp.asarray(a)
    return _pallas_cholesky(a, block=block, interpret=interpret)
