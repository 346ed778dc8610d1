"""Device-sharded exact-GP linear algebra (tensor parallelism over the gram).

The SURVEY's TP mandate (SURVEY.md section 2.7): for N beyond a single
chip's HBM/FLOP budget (the N=50k stretch configuration), shard the N x N
gram row-wise over the device mesh and factor it cooperatively.  The
reference has no distributed factorization at all (its only parallelism is
a multiprocessing chain pool, stochastic.py:773-783); this module is the
TPU-native replacement built on ``shard_map`` + XLA collectives.

Pieces
------
* ``distributed_cholesky`` — right-looking blocked Cholesky over row bands,
  one band per device:

    for panel k:                             (lax.fori_loop over blocks)
      owner       = device holding block-row k
      L_kk        = chol(A[k,k])             (owner's rows, psum-broadcast)
      Dinv        = L_kk^{-1}                (replicated small solve)
      L[i,k]      = A[i,k] Dinv^T            (each device, its own rows)
      col_k       = all_gather(L[:,k])       (ICI collective, n x B)
      A[i,j]     -= L[i,k] col_k[j]^T        (each device, local MXU matmul)

  Communication per panel: one (B, B) psum + one (n, B) all_gather riding
  ICI; compute is n^3/3 MACs split across devices.  Owner-computes steps
  are written mask-then-psum so every device runs the same SPMD program.
  The panel loop is a ``lax.fori_loop`` so compile time is O(1) in the
  number of panels (a Python loop would unroll ~100 panels at N=50k).

* ``distributed_trsm`` — forward substitution L Z = B with the same band
  layout and a (B, m) psum per panel.

* ``distributed_gp_nll`` — a *trainable* sharded exact-GP NLL.  The gram is
  built band-wise inside ``shard_map`` (each device evaluates its own
  (n/D, n) rows of the kernel — the unsharded N x N matrix never exists),
  factored and solved in place, and differentiated by a custom VJP:

      NLL      = 1/2 y' K^{-1} y + 1/2 log|K| + n/2 log 2pi
      dNLL/dK  = 1/2 (K^{-1} - a a'),  a = K^{-1} y
      dNLL/dth = vjp of the band-wise kernel evaluation at that cotangent

  K^{-1} is produced band-wise as X' X with X = L^{-1} (sharded TRSM with an
  identity band) and a chunked all-reduce syrk, so the backward pass also
  never materializes an unsharded N x N array.  Gradients flow to ``params``
  and ``y``; the training inputs ``x`` are treated as constants (standard
  for hyperparameter optimization).

Correctness is validated on the virtual 8-device CPU mesh (value and
gradient vs a single-device reference, tests/test_experiment.py); the
driver's ``dryrun_multichip`` compiles and executes it on N virtual devices.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import solve_triangular
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import settings

__all__ = ["distributed_cholesky", "distributed_trsm",
           "distributed_quad_logdet", "distributed_gp_nll",
           "distributed_posterior"]


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

    a_local = lax.fori_loop(0, nb, panel, a_local)
    # zero my band's strict upper triangle
    gc2 = lax.broadcasted_iota(jnp.int32, (rows_per_dev, n), 1)
    return jnp.where(gc2 <= grow[:, None], a_local, 0.0)


def _band_trsm_body(l_local, b_local, n, block, n_dev, axis):
    """Forward substitution ``L Z = B`` on row bands; ``b_local`` (n/D, m)."""
    rows_per_dev = n // n_dev
    nb = n // block
    me = lax.axis_index(axis)
    row0 = me * rows_per_dev
    grow = row0 + lax.broadcasted_iota(jnp.int32, (rows_per_dev, 1), 0)[:, 0]
    m = b_local.shape[1]

    def panel(k, b_loc):
        kb = k * block
        owns = (kb >= row0) & (kb + block <= row0 + rows_per_dev)
        safe_off = jnp.clip(kb - row0, 0, rows_per_dev - block)
        lkk_rows = lax.dynamic_slice(l_local, (safe_off, kb), (block, block))
        bk_rows = lax.dynamic_slice(b_loc, (safe_off, 0), (block, m))
        lkk = lax.psum(jnp.where(owns, lkk_rows, 0.0), axis)
        bk = lax.psum(jnp.where(owns, bk_rows, 0.0), axis)
        zk = solve_triangular(lkk, bk, lower=True)  # (block, m)

        lk_mine = lax.dynamic_slice(l_local, (0, kb), (rows_per_dev, block))
        upd = jnp.matmul(lk_mine, zk, precision=lax.Precision.HIGHEST)
        below = grow >= kb + block
        in_panel = (grow >= kb) & (grow < kb + block)
        zk_mine = zk[jnp.clip(grow - kb, 0, block - 1), :]
        return jnp.where(below[:, None], b_loc - upd,
                         jnp.where(in_panel[:, None], zk_mine, b_loc))

    return lax.fori_loop(0, nb, panel, b_local)


def _band_trsm_t_body(l_local, b_local, n, block, n_dev, axis):
    """Backward substitution ``L^T A = B`` on row bands (the transpose
    counterpart of :func:`_band_trsm_body`): panels run bottom-up; panel k
    subtracts the psum of ``L[i,k]^T a_i`` over already-solved rows i
    (every row below the panel), then solves against ``L_kk^T``."""
    rows_per_dev = n // n_dev
    nb = n // block
    me = lax.axis_index(axis)
    row0 = me * rows_per_dev
    grow = row0 + lax.broadcasted_iota(jnp.int32, (rows_per_dev, 1), 0)[:, 0]
    m = b_local.shape[1]

    def panel(kk, b_loc):
        k = nb - 1 - kk
        kb = k * block
        owns = (kb >= row0) & (kb + block <= row0 + rows_per_dev)
        safe_off = jnp.clip(kb - row0, 0, rows_per_dev - block)
        lkk_rows = lax.dynamic_slice(l_local, (safe_off, kb), (block, block))
        bk_rows = lax.dynamic_slice(b_loc, (safe_off, 0), (block, m))
        lkk = lax.psum(jnp.where(owns, lkk_rows, 0.0), axis)
        zk = lax.psum(jnp.where(owns, bk_rows, 0.0), axis)
        # contribution of my already-solved rows (strictly below the panel)
        lk_mine = lax.dynamic_slice(l_local, (0, kb), (rows_per_dev, block))
        solved = grow >= kb + block
        contrib = jnp.matmul(lk_mine.T,
                             jnp.where(solved[:, None], b_loc, 0.0),
                             precision=lax.Precision.HIGHEST)
        total = lax.psum(contrib, axis)
        ak = solve_triangular(lkk.T, zk - total, lower=False)  # (block, m)
        in_panel = (grow >= kb) & (grow < kb + block)
        ak_mine = ak[jnp.clip(grow - kb, 0, block - 1), :]
        return jnp.where(in_panel[:, None], ak_mine, b_loc)

    return lax.fori_loop(0, nb, panel, b_local)


def _resolve_mesh(mesh, axis):
    if mesh is None:
        from .mesh import make_mesh

        mesh = make_mesh(axis_names=(axis,))
    return mesh


def _check_dims(n, n_dev, block):
    if n % n_dev:
        raise ValueError(f"n={n} must divide over {n_dev} devices")
    rows = n // n_dev
    if block is None:
        # largest divisor of rows-per-device not exceeding 256, so the
        # default never violates the multiple-of-block requirement
        block = next(b for b in range(min(rows, 256), 0, -1) if rows % b == 0)
    if rows % block:
        raise ValueError("rows-per-device must be a multiple of block")
    return block


def distributed_cholesky(a, mesh=None, block=None, axis="dp"):
    """Cholesky of a row-band-sharded PSD matrix over the mesh.

    ``a`` is (n, n); rows shard over the mesh axis; the rows-per-device
    count must be a multiple of ``block``.  Returns L sharded the same way."""
    from jax import shard_map

    mesh = _resolve_mesh(mesh, axis)
    n = a.shape[-1]
    n_dev = mesh.shape[axis]
    block = _check_dims(n, n_dev, block)

    body = partial(_band_cholesky_body, n=n, block=block, n_dev=n_dev,
                   axis=axis)
    fn = shard_map(body, mesh=mesh, in_specs=P(axis, None),
                   out_specs=P(axis, None))
    sharding = NamedSharding(mesh, P(axis, None))
    a = jax.device_put(jnp.asarray(a, settings.dtype), sharding)
    return jax.jit(fn)(a)


def distributed_trsm(l, b, mesh=None, block=None, axis="dp"):
    """Solve ``L Z = B`` with L row-band-sharded (as from
    :func:`distributed_cholesky`); B row-shards the same way."""
    from jax import shard_map

    mesh = _resolve_mesh(mesh, axis)
    n = l.shape[-1]
    n_dev = mesh.shape[axis]
    block = _check_dims(n, n_dev, block)

    b = jnp.asarray(b, settings.dtype)
    squeeze = b.ndim == 1
    if squeeze:
        b = b[:, None]
    body = partial(_band_trsm_body, n=n, block=block, n_dev=n_dev, axis=axis)
    fn = shard_map(body, mesh=mesh, in_specs=(P(axis, None), P(axis, None)),
                   out_specs=P(axis, None))
    band = NamedSharding(mesh, P(axis, None))
    l = jax.device_put(jnp.asarray(l, settings.dtype), band)
    b = jax.device_put(b, band)
    z = jax.jit(fn)(l, b)
    return z[:, 0] if squeeze else z


def distributed_quad_logdet(cov_fn, mesh=None, block=None, axis="dp",
                            noise_fn=None):
    """Build the trainable device-sharded elliptical-gram primitive
    ``fn(params, x, y) -> (quad, logdet_half)`` with

      quad        = y' K^{-1} y
      logdet_half = sum log diag chol(K)   (= 1/2 log det K)

    — the sharded counterpart of ``ops.linalg.mvn_quad_logdet``, from which
    every elliptical-family NLL (gaussian :func:`distributed_gp_nll`, the
    Student-t scalarization in ``models/studentt.py``) is a few scalar ops.

    Args:
      cov_fn: ``cov_fn(params, x1, x2) -> (len(x1), len(x2))`` cross
        covariance WITHOUT observation noise (any pytree ``params``).
      noise_fn: optional ``noise_fn(params) -> scalar`` observation-noise
        variance added to the gram diagonal.
      mesh/block/axis: band layout (see :func:`distributed_cholesky`).

    Differentiable w.r.t. ``params`` and ``y`` (``x`` is constant); the
    (n, n) gram only ever exists as per-device row bands, in forward and
    backward passes alike (dquad/dK = -a a', dlogdet_half/dK = K^{-1}/2
    with K^{-1} assembled band-wise from the sharded TRSM inverse).
    """
    from jax import shard_map

    mesh = _resolve_mesh(mesh, axis)
    n_dev = mesh.shape[axis]
    band = NamedSharding(mesh, P(axis, None))
    vec = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    def _band_gram(params, x, n, rows_per_dev):
        me = lax.axis_index(axis)
        row0 = me * rows_per_dev
        x_band = lax.dynamic_slice_in_dim(x, row0, rows_per_dev, axis=0)
        g = cov_fn(params, x_band, x)
        if noise_fn is not None:
            grow = row0 + lax.broadcasted_iota(
                jnp.int32, (rows_per_dev,), 0)
            gcol = lax.broadcasted_iota(jnp.int32, (n,), 0)
            g = g + noise_fn(params) * (
                grow[:, None] == gcol[None, :]).astype(g.dtype)
        return g

    def _make(n):
        rows_per_dev = n // n_dev
        blk = _check_dims(n, n_dev, block)

        def fwd_body(params, x, y_local):
            a_local = _band_gram(params, x, n, rows_per_dev)
            l_local = _band_cholesky_body(a_local, n, blk, n_dev, axis)
            z_local = _band_trsm_body(l_local, y_local[:, None], n, blk,
                                      n_dev, axis)[:, 0]
            me = lax.axis_index(axis)
            row0 = me * rows_per_dev
            idx = lax.broadcasted_iota(jnp.int32, (rows_per_dev,), 0)
            diag_mine = l_local[idx, row0 + idx]
            quad = lax.psum(jnp.dot(z_local, z_local), axis)
            logdet = lax.psum(jnp.sum(jnp.log(diag_mine)), axis)
            return l_local, z_local, quad, logdet

        fwd_sharded = shard_map(
            fwd_body, mesh=mesh, in_specs=(P(), P(), P(axis)),
            out_specs=(P(axis, None), P(axis), P(), P()))

        def bwd_body(params, x, l_local, z_local, gq, gl):
            rows = rows_per_dev
            me = lax.axis_index(axis)
            row0 = me * rows
            grow = row0 + lax.broadcasted_iota(jnp.int32, (rows,), 0)
            gcol = lax.broadcasted_iota(jnp.int32, (n,), 0)
            eye_band = (grow[:, None] == gcol[None, :]).astype(l_local.dtype)
            # X = L^{-1} as a row band
            x_inv = _band_trsm_body(l_local, eye_band, n, blk, n_dev, axis)
            # a = K^{-1} y = X' z  (replicated)
            alpha = lax.psum(
                jnp.matmul(x_inv.T, z_local,
                           precision=lax.Precision.HIGHEST), axis)
            # S = K^{-1} = X' X, band-by-band chunked syrk
            def chunk(d, acc):
                cols = lax.dynamic_slice_in_dim(x_inv, d * rows, rows, axis=1)
                part = lax.psum(
                    jnp.matmul(cols.T, x_inv,
                               precision=lax.Precision.HIGHEST), axis)
                return jnp.where(me == d, part, acc)

            s_init = lax.pvary(
                jnp.zeros((rows, n), dtype=l_local.dtype), (axis,))
            s_local = lax.fori_loop(0, n_dev, chunk, s_init)
            alpha_band = lax.dynamic_slice_in_dim(alpha, row0, rows, axis=0)
            # dquad/dK = -a a'; dlogdet_half/dK = K^{-1}/2
            kbar_band = ((0.5 * gl) * s_local
                         - gq * alpha_band[:, None] * alpha[None, :])
            _, gram_vjp = jax.vjp(
                lambda p: _band_gram(p, x, n, rows_per_dev), params)
            # params enter the shard_map unvarying (P()), so the vma-aware
            # vjp already psums the per-device cotangents — no explicit
            # collective here or the gradient multiplies by the device count
            (pbar,) = gram_vjp(kbar_band)
            ybar_local = (2.0 * gq) * alpha_band  # dquad/dy = 2 K^{-1} y
            return pbar, ybar_local

        bwd_sharded = shard_map(
            bwd_body, mesh=mesh,
            in_specs=(P(), P(), P(axis, None), P(axis), P(), P()),
            out_specs=(P(), P(axis)))
        return fwd_sharded, bwd_sharded

    @jax.custom_vjp
    def qld(params, x, y):
        fwd_sharded, _ = _make(y.shape[0])
        _, _, quad, logdet_half = fwd_sharded(params, x, y)
        return quad, logdet_half

    def qld_fwd(params, x, y):
        fwd_sharded, _ = _make(y.shape[0])
        l_local, z_local, quad, logdet_half = fwd_sharded(params, x, y)
        return (quad, logdet_half), (params, x, y, l_local, z_local)

    def qld_bwd(res, cotangents):
        gq, gl = cotangents
        params, x, y, l_local, z_local = res
        _, bwd_sharded = _make(y.shape[0])
        pbar, ybar = bwd_sharded(params, x, l_local, z_local, gq, gl)
        return pbar, jnp.zeros_like(x), ybar

    qld.defvjp(qld_fwd, qld_bwd)

    def prepared(params, x, y):
        x = jax.device_put(jnp.asarray(x, settings.dtype), repl)
        y = jax.device_put(jnp.asarray(y, settings.dtype), vec)
        return qld(params, x, y)

    return prepared


def distributed_posterior(cov_fn, mesh=None, block=None, axis="dp",
                          noise_fn=None):
    """Multi-chip gaussian-posterior SERVING on the band layout: build
    ``(state_fn, query_fn, solve_fn, apply_fn)`` closures over a mesh.

      state_fn(params, x, resid) -> (l_sharded, alpha_sharded)
        one cooperative blocked Cholesky of the (noisy) band gram plus two
        sharded triangular solves: alpha = (K+sigma^2 I)^{-1} resid
        (forward :func:`_band_trsm_body`, then the transpose solve
        :func:`_band_trsm_t_body`).  Both outputs stay row-band-sharded.

      query_fn(params, x, l_sharded, alpha_sharded, xq)
        -> (mean_delta, var_reduction)
        per device: its band of the cross-gram K_Xq, contributing
        ``cross_band^T alpha_band`` (psum) to the mean and
        ``colsum((L^{-1} K_Xq)_band^2)`` (sharded TRSM + psum) to the
        posterior-variance reduction.  The n x n gram and the n x m cross
        matrix never exist unsharded.

    The caller assembles latent moments as ``mu = m(xq) + mean_delta`` and
    ``var = k_ss_diag - var_reduction`` (models/predictor.py
    ``DistributedPredictor``)."""
    from jax import shard_map

    mesh = _resolve_mesh(mesh, axis)
    n_dev = mesh.shape[axis]
    band = NamedSharding(mesh, P(axis, None))
    vec = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    def _band_gram(params, x, n, rows_per_dev):
        me = lax.axis_index(axis)
        row0 = me * rows_per_dev
        x_band = lax.dynamic_slice_in_dim(x, row0, rows_per_dev, axis=0)
        g = cov_fn(params, x_band, x)
        if noise_fn is not None:
            grow = row0 + lax.broadcasted_iota(
                jnp.int32, (rows_per_dev,), 0)
            gcol = lax.broadcasted_iota(jnp.int32, (n,), 0)
            g = g + noise_fn(params) * (
                grow[:, None] == gcol[None, :]).astype(g.dtype)
        return g

    _state_cache = {}  # n -> jitted sharded state build (re-use across calls)

    def state_fn(params, x, resid):
        x = jax.device_put(jnp.asarray(x, settings.dtype), repl)
        resid = jax.device_put(jnp.asarray(resid, settings.dtype), vec)
        n = resid.shape[0]
        rows_per_dev = n // n_dev
        blk = _check_dims(n, n_dev, block)

        if n not in _state_cache:
            def body(params_, x_, r_local):
                a_local = _band_gram(params_, x_, n, rows_per_dev)
                l_local = _band_cholesky_body(a_local, n, blk, n_dev, axis)
                z_local = _band_trsm_body(l_local, r_local[:, None], n, blk,
                                          n_dev, axis)
                al_local = _band_trsm_t_body(l_local, z_local, n, blk,
                                             n_dev, axis)[:, 0]
                return l_local, al_local

            _state_cache[n] = jax.jit(shard_map(
                body, mesh=mesh, in_specs=(P(), P(), P(axis)),
                out_specs=(P(axis, None), P(axis))))
        return _state_cache[n](params, x, resid)

    _solve_cache = {}  # n -> jitted sharded (K+s^2)^{-1} B solve

    def solve_fn(l_sharded, b):
        """Exact ``(K + sigma^2 I)^{-1} B`` from the band-sharded factor:
        forward + transpose sharded TRSMs on (n, m) right-hand sides
        (the pathwise-sampling update; no CG, no convergence concerns)."""
        n = l_sharded.shape[-1]
        blk = _check_dims(n, n_dev, block)
        b = jax.device_put(jnp.asarray(b, settings.dtype), band)

        if n not in _solve_cache:
            def body(l_local, b_local):
                z = _band_trsm_body(l_local, b_local, n, blk, n_dev, axis)
                return _band_trsm_t_body(l_local, z, n, blk, n_dev, axis)

            _solve_cache[n] = jax.jit(shard_map(
                body, mesh=mesh,
                in_specs=(P(axis, None), P(axis, None)),
                out_specs=P(axis, None)))
        return _solve_cache[n](l_sharded, b)

    _query_cache = {}  # n -> jitted sharded query (jit re-use across calls)

    def query_fn(params, x, l_sharded, alpha_sharded, xq):
        n = l_sharded.shape[-1]
        rows_per_dev = n // n_dev
        blk = _check_dims(n, n_dev, block)
        xq = jax.device_put(jnp.asarray(xq, settings.dtype), repl)

        if n not in _query_cache:
            def body(params_, x_, l_local, al_local, xq_):
                me = lax.axis_index(axis)
                row0 = me * rows_per_dev
                x_band = lax.dynamic_slice_in_dim(x_, row0, rows_per_dev,
                                                  axis=0)
                cross = cov_fn(params_, x_band, xq_)  # (rows, m)
                mean_delta = lax.psum(
                    jnp.matmul(cross.T, al_local,
                               precision=lax.Precision.HIGHEST), axis)
                w_local = _band_trsm_body(l_local, cross, n, blk, n_dev,
                                          axis)
                var_red = lax.psum(jnp.sum(w_local * w_local, axis=0), axis)
                return mean_delta, var_red

            _query_cache[n] = jax.jit(shard_map(
                body, mesh=mesh,
                in_specs=(P(), P(), P(axis, None), P(axis), P()),
                out_specs=(P(), P())))
        x = jax.device_put(jnp.asarray(x, settings.dtype), repl)
        return _query_cache[n](params, x, l_sharded, alpha_sharded, xq)

    _apply_cache = {}  # n -> jitted sharded K_qX @ A

    def apply_fn(params, x, xq, a):
        """Band-sharded ``K_qX A``: each device contracts its cross-gram
        band against its rows of A and psums — the (m, n) cross matrix
        never exists unsharded (pathwise-sampling query path)."""
        n = a.shape[0]
        rows_per_dev = n // n_dev
        xq = jax.device_put(jnp.asarray(xq, settings.dtype), repl)
        a = jax.device_put(jnp.asarray(a, settings.dtype), band)

        if n not in _apply_cache:
            def body(params_, x_, xq_, a_local):
                me = lax.axis_index(axis)
                row0 = me * rows_per_dev
                x_band = lax.dynamic_slice_in_dim(x_, row0, rows_per_dev,
                                                  axis=0)
                cross_b = cov_fn(params_, xq_, x_band)  # (m, rows)
                return lax.psum(
                    jnp.matmul(cross_b, a_local,
                               precision=lax.Precision.HIGHEST), axis)

            _apply_cache[n] = jax.jit(shard_map(
                body, mesh=mesh,
                in_specs=(P(), P(), P(), P(axis, None)),
                out_specs=P()))
        x = jax.device_put(jnp.asarray(x, settings.dtype), repl)
        return _apply_cache[n](params, x, xq, a)

    return state_fn, query_fn, solve_fn, apply_fn


def distributed_gp_nll(cov_fn, mesh=None, block=None, axis="dp",
                       noise_fn=None):
    """Trainable device-sharded exact-GP negative log likelihood
    ``nll(params, x, y) -> scalar`` — the gaussian scalarization of
    :func:`distributed_quad_logdet` (same args and sharding contract)."""
    qld = distributed_quad_logdet(cov_fn, mesh=mesh, block=block, axis=axis,
                                  noise_fn=noise_fn)

    def nll(params, x, y):
        quad, logdet_half = qld(params, x, y)
        n = np.asarray(jnp.shape(y)[0], settings.dtype)
        return (0.5 * quad + logdet_half
                + 0.5 * n * np.float32(np.log(2 * np.pi)))

    return nll
