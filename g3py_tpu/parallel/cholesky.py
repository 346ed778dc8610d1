"""Device-sharded blocked Cholesky (tensor parallelism over the gram).

The SURVEY's TP mandate (SURVEY.md section 2.7): for N beyond a single
chip's HBM/FLOP budget (the N=50k stretch configuration), shard the N x N
gram row-wise over the device mesh and factor it cooperatively.

Algorithm — right-looking blocked Cholesky over row bands, one band per
device, expressed in ``shard_map``:

  for panel k:                             (static python loop over blocks)
    owner       = device holding block-row k
    L_kk        = chol(A[k,k])             (owner's rows, psum-broadcast)
    Dinv        = L_kk^{-1}                (replicated small solve)
    L[i,k]      = A[i,k] Dinv^T            (each device, its own rows)
    col_k       = all_gather(L[:,k])       (ICI collective, n x B)
    A[i,j]     -= L[i,k] col_k[j]^T        (each device, local MXU matmul)

Communication per panel: one (B, B) psum + one (n, B) all_gather riding
ICI; compute is n^3/3 MACs split across devices.  Owner-computes steps are
written mask-then-psum so every device runs the same SPMD program.

Correctness is validated on the virtual 8-device CPU mesh (tests); the
driver's ``dryrun_multichip`` compiles and executes it on N virtual
devices.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import solve_triangular
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import settings

__all__ = ["distributed_cholesky", "distributed_gp_nll"]


def _band_cholesky_body(a_local, n, block, n_dev, axis):
    """shard_map body; ``a_local`` is this device's (n/D, n) row band."""
    rows_per_dev = n // n_dev
    nb = n // block
    me = lax.axis_index(axis)
    row0 = me * rows_per_dev  # first global row of my band
    grow = row0 + lax.broadcasted_iota(jnp.int32, (rows_per_dev, 1), 0)[:, 0]
    gcol = lax.broadcasted_iota(jnp.int32, (1, n), 1)[0, :]

    def panel(k, a_loc):
        kb = k * block
        # --- owner's panel rows, broadcast by psum -------------------------
        owns = (kb >= row0) & (kb + block <= row0 + rows_per_dev)
        safe_off = jnp.clip(kb - row0, 0, rows_per_dev - block)
        panel_rows = lax.dynamic_slice(a_loc, (safe_off, kb), (block, block))
        akk = lax.psum(
            jnp.where(owns, panel_rows, jnp.zeros_like(panel_rows)), axis)
        lkk = jnp.linalg.cholesky(akk)
        dinv = solve_triangular(lkk, jnp.eye(block, dtype=a_loc.dtype),
                                lower=True)

        # --- my block-column: panel rows get L_kk, lower rows get the TRSM -
        my_col = lax.dynamic_slice(a_loc, (0, kb), (rows_per_dev, block))
        lik = jnp.matmul(my_col, dinv.T, precision=lax.Precision.HIGHEST)
        below = grow >= kb + block
        in_panel = (grow >= kb) & (grow < kb + block)
        lkk_mine = lkk[jnp.clip(grow - kb, 0, block - 1), :]
        new_col = jnp.where(below[:, None], lik,
                            jnp.where(in_panel[:, None], lkk_mine, my_col))
        a_loc = lax.dynamic_update_slice(a_loc, new_col, (0, kb))

        # --- gather the column strip, update my trailing rows --------------
        strip_mine = jnp.where(below[:, None], lik, 0.0)
        col_full = lax.all_gather(strip_mine, axis).reshape(n, block)
        upd = jnp.matmul(strip_mine, col_full.T,
                         precision=lax.Precision.HIGHEST)
        upd = jnp.where((gcol >= kb + block)[None, :], upd, 0.0)
        return a_loc - upd

    for k in range(nb):
        a_local = panel(k, a_local)
    # zero my band's strict upper triangle
    gc2 = lax.broadcasted_iota(jnp.int32, (rows_per_dev, n), 1)
    return jnp.where(gc2 <= grow[:, None], a_local, 0.0)


def distributed_cholesky(a, mesh=None, block=None, axis="dp"):
    """Cholesky of a row-band-sharded PSD matrix over the mesh.

    ``a`` is (n, n); rows shard over the mesh axis; the rows-per-device
    count must be a multiple of ``block``.  Returns L sharded the same way."""
    from jax import shard_map

    if mesh is None:
        from .mesh import make_mesh

        mesh = make_mesh(axis_names=(axis,))
    n = a.shape[-1]
    n_dev = mesh.shape[axis]
    if n % n_dev:
        raise ValueError(f"n={n} must divide over {n_dev} devices")
    if block is None:
        block = n // n_dev
    if (n // n_dev) % block:
        raise ValueError("rows-per-device must be a multiple of block")

    body = partial(_band_cholesky_body, n=n, block=block, n_dev=n_dev,
                   axis=axis)
    fn = shard_map(body, mesh=mesh, in_specs=P(axis, None),
                   out_specs=P(axis, None))
    sharding = NamedSharding(mesh, P(axis, None))
    a = jax.device_put(jnp.asarray(a, settings.dtype), sharding)
    return jax.jit(fn)(a)


def distributed_gp_nll(mesh=None, axis="dp"):
    """Builder for a device-sharded exact-GP NLL: the gram partitions over
    the mesh (row bands) and the factorization runs through
    :func:`distributed_cholesky`."""
    from .mesh import make_mesh

    if mesh is None:
        mesh = make_mesh(axis_names=(axis,))

    def nll(kernel_fn, params, x, y, block=None):
        n = x.shape[0]
        sharding = NamedSharding(mesh, P(axis, None))
        cov = kernel_fn(params, x)
        cov = lax.with_sharding_constraint(cov, sharding)
        L = distributed_cholesky(cov, mesh=mesh, block=block, axis=axis)
        z = solve_triangular(L, y, lower=True)
        return (0.5 * jnp.dot(z, z)
                + jnp.sum(jnp.log(jnp.diagonal(L)))
                + 0.5 * n * np.log(2 * np.pi))

    return nll
