"""Matrix-free (iterative) GP inference: CG solves + stochastic Lanczos
log-determinants.

The reference's exact-inference ceiling was O(N^3) Cholesky with an O(N^2)
materialized gram (SURVEY.md section 5 "long-context").  Following the BBMM
line of work (GPyTorch, arXiv:1809.11165; preconditioned scalable GP
hyperparameter optimization, arXiv:2107.00243 — see PAPERS.md), this module
provides the TPU-native iterative path:

* :func:`cg_solve` — batched conjugate gradients against any matvec; the
  RHS axis vmaps, so the linear solve, the probe solves and (through the
  probes) the gradient trace estimate all run as one batched matmul stream
  on the MXU.
* :func:`slq_logdet` — stochastic Lanczos quadrature: m-step Lanczos per
  Rademacher probe, logdet estimated through the tridiagonal eigenpairs.
* :func:`lazy_kernel_matvec` — K @ v without materializing K: the gram is
  built one row-block at a time (O(block * N) memory), which is what makes
  N=50k feasible on one chip.
* :func:`iterative_gp_nll` — the assembled marginal likelihood with a
  Hutchinson-estimator custom VJP (dlogdet/dK ~ mean of K^{-1}z z^T over
  probes), matching the exact NLL within Monte-Carlo error.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax, random

from ..config import settings

__all__ = ["cg_solve", "slq_logdet", "lazy_kernel_matvec", "iterative_gp_nll",
           "pivoted_cholesky", "woodbury_preconditioner", "pcg_solve",
           "preconditioned_gp_nll"]


def cg_solve(matvec, b, tol=1e-6, maxiter=100, x0=None):
    """Conjugate gradients for PSD systems; ``b`` may be (n,) or (k, n)
    (batched RHS, vmapped)."""
    b = jnp.asarray(b)
    if b.ndim == 2:
        return jax.vmap(lambda bb: cg_solve(matvec, bb, tol, maxiter, x0))(b)

    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - matvec(x)
    p = r
    rs = jnp.dot(r, r)

    def cond(state):
        _, _, _, rs_, it = state
        return jnp.isfinite(rs_) & (rs_ > tol**2) & (it < maxiter)

    def body(state):
        x_, r_, p_, rs_, it = state
        ap = matvec(p_)
        pap = jnp.dot(p_, ap)
        # non-positive curvature = f32 breakdown on a PSD operator; freeze
        # rather than take a 1/eps-scaled step (see pcg_solve)
        ok = pap > 1e-30
        alpha = jnp.where(ok, rs_ / jnp.where(ok, pap, 1.0), 0.0)
        x_ = x_ + alpha * p_
        r_ = r_ - alpha * ap
        rs_new = jnp.dot(r_, r_)
        # on breakdown drop the stale direction too (steepest-descent
        # restart), mirroring pcg_solve
        beta = jnp.where(ok, rs_new / jnp.where(ok, rs_, 1.0), 0.0)
        p_ = r_ + beta * p_
        return x_, r_, p_, rs_new, it + 1

    x, _, _, _, _ = lax.while_loop(cond, body, (x, r, p, rs, 0))
    return x


def _lanczos(matvec, z, m):
    """m-step Lanczos: returns (alphas (m,), betas (m-1,), |z|)."""
    znorm = jnp.linalg.norm(z)
    q = z / jnp.maximum(znorm, 1e-30)

    def body(carry, _):
        q_prev, q_cur, beta_prev, alive = carry
        w = matvec(q_cur) - beta_prev * q_prev
        alpha = jnp.dot(w, q_cur)
        w = w - alpha * q_cur
        # full reorthogonalization is O(m n) extra; one-step is standard SLQ
        beta = jnp.linalg.norm(w)
        # Krylov breakdown (operators with few distinct eigenvalues converge
        # in a handful of steps): once beta underflows, later steps would
        # fill the tridiagonal with spurious ~0 eigenvalues whose clamped
        # log(1e-30) wrecks the logdet estimate.  Pad dead steps with the
        # identity (alpha=1, beta=0 -> eigenvalue 1 -> log contribution 0).
        # scale-relative threshold (an absolute floor would truncate healthy
        # recursions on small-norm operators)
        new_alive = alive & (beta > 1e-5 * (jnp.abs(alpha) + beta_prev
                                            + 1e-30))
        q_next = jnp.where(new_alive, w / jnp.maximum(beta, 1e-30),
                           jnp.zeros_like(w))
        alpha_out = jnp.where(alive, alpha, 1.0)
        beta_out = jnp.where(new_alive, beta, 0.0)
        return (q_cur, q_next, beta_out, new_alive), (alpha_out, beta_out)

    (_, _, _, _), (alphas, betas) = lax.scan(
        body, (jnp.zeros_like(q), q, jnp.zeros((), q.dtype),
               jnp.asarray(True)), None, length=m)
    return alphas, betas[:-1], znorm


def slq_logdet(matvec, n, key, probes=16, lanczos_iters=30,
               probe_chunk=None):
    """Stochastic Lanczos quadrature estimate of log det (PSD matvec).

    logdet ~ mean_z |z|^2 * sum_j w_j log(theta_j) with (theta, w) the
    eigenpairs of the Lanczos tridiagonal (w_j = first-component^2).
    ``probe_chunk`` bounds how many probes run vmapped at once (the SKI
    MXU matvec makes an (probes, n, m) intermediate per Lanczos step —
    4 GB at n=1e6, m=128, 8 probes; chunking trades a little wall time
    for bounded peak HBM)."""
    zs = random.rademacher(key, (probes, n), dtype=settings.dtype)

    def one(z):
        alphas, betas, znorm = _lanczos(matvec, z, lanczos_iters)
        t = (jnp.diag(alphas) + jnp.diag(betas, 1) + jnp.diag(betas, -1))
        theta, vecs = jnp.linalg.eigh(t)
        w = vecs[0, :] ** 2
        theta = jnp.maximum(theta, 1e-30)
        return znorm**2 * jnp.sum(w * jnp.log(theta))

    if probe_chunk is not None and probe_chunk < probes:
        return jnp.mean(lax.map(one, zs, batch_size=int(probe_chunk)))
    return jnp.mean(jax.vmap(one)(zs))


def pivoted_cholesky(column_fn, diag0, rank):
    """Rank-``rank`` pivoted (partial) Cholesky of a PSD matrix accessed one
    column at a time (arXiv:2107.00243; the GPyTorch preconditioner).

    ``column_fn(j) -> K[:, j]`` may build the column lazily; ``diag0`` is
    diag(K).  Returns L (n, rank) with K ~ L L^T + residual, residual
    diagonal = diag0 - sum_m L[:, m]^2 >= 0."""
    n = diag0.shape[0]
    diag0 = jnp.asarray(diag0)

    dmax0 = jnp.maximum(jnp.max(jnp.asarray(diag0)), 1e-30)

    def step(carry, i):
        d, cols = carry
        j = jnp.argmax(d)
        kj = column_fn(j)
        # subtract the projection onto the previous factors
        lj = cols[:, :] @ cols[j, :]  # (n,) = sum_m L[:,m] L[j,m]
        pivot = jnp.sqrt(jnp.maximum(d[j], 1e-30))
        # breakdown guard: once the residual diagonal underflows relative to
        # the matrix scale there is no usable rank left — emit a zero column
        # instead of a ~1/sqrt(underflow) blow-up that NaNs the Woodbury
        # solve downstream
        valid = d[j] > 1e-10 * dmax0
        li = jnp.where(valid, (kj - lj) / pivot, 0.0)
        # numerical guard: residual diag stays >= 0
        d_new = jnp.maximum(d - li**2, 0.0)
        cols = cols.at[:, i].set(li)
        return (d_new, cols), None

    cols0 = jnp.zeros((n, rank), diag0.dtype)
    (d, cols), _ = lax.scan(step, (diag0, cols0), jnp.arange(rank))
    return cols


def woodbury_preconditioner(l_factor, sigma2):
    """Apply-and-logdet machinery for P = sigma2 I + L L^T (L tall-skinny).

    Returns (p_inv, p_inv_sqrt, logdet_p): the inverse and inverse square
    root as matvec closures (via the thin SVD of L), and log det P."""
    n, r = l_factor.shape
    # thin SVD via the r x r eigen-decomposition of L^T L
    gram = jnp.matmul(l_factor.T, l_factor, precision=lax.Precision.HIGHEST)
    s2, v = jnp.linalg.eigh(gram)            # L^T L = V s2 V^T
    s2 = jnp.maximum(s2, 0.0)
    inv_s = lax.rsqrt(jnp.maximum(s2, 1e-30))
    u = jnp.matmul(l_factor, v * inv_s[None, :],
                   precision=lax.Precision.HIGHEST)  # (n, r) orthonormal-ish
    lam = sigma2 + s2                         # eigenvalues of P along U

    def _bcast(coef, c):
        # scale the leading (rank) axis of c, whether c is (r,) or (r, m)
        return c * coef.reshape((-1,) + (1,) * (c.ndim - 1))

    def p_inv(w):
        c = jnp.matmul(u.T, w, precision=lax.Precision.HIGHEST)
        return w / sigma2 + jnp.matmul(
            u, _bcast(1.0 / lam - 1.0 / sigma2, c),
            precision=lax.Precision.HIGHEST)

    def p_inv_sqrt(w):
        c = jnp.matmul(u.T, w, precision=lax.Precision.HIGHEST)
        coef = lax.rsqrt(lam) - lax.rsqrt(jnp.asarray(sigma2, w.dtype))
        return w * lax.rsqrt(jnp.asarray(sigma2, w.dtype)) + jnp.matmul(
            u, _bcast(coef, c), precision=lax.Precision.HIGHEST)

    logdet_p = (jnp.sum(jnp.log(lam))
                + (n - r) * jnp.log(jnp.asarray(sigma2, l_factor.dtype)))
    return p_inv, p_inv_sqrt, logdet_p


def _pcg_solve_mrhs(matvec, b, p_inv, tol, maxiter):
    """Multi-RHS PCG on (m, n) right-hand sides: per-column alpha/beta,
    converged columns frozen, one shared matvec per iteration."""
    bt = b.T  # (n, m)
    x = jnp.zeros_like(bt)
    r = bt
    z = p_inv(r)
    p = z
    rz = jnp.sum(r * z, axis=0)  # (m,)
    bnorm2 = jnp.sum(bt * bt, axis=0)

    def active_of(r_):
        rr = jnp.sum(r_ * r_, axis=0)
        return jnp.isfinite(rr) & (rr > tol**2 * bnorm2)

    def cond(state):
        _, r_, _, _, it = state
        return jnp.any(active_of(r_)) & (it < maxiter)

    def body(state):
        x_, r_, p_, rz_, it = state
        ap = matvec(p_)
        pap = jnp.sum(p_ * ap, axis=0)
        # breakdown guard per column; already-converged columns keep
        # polishing while any column is active (matches the behavior of a
        # vmapped while_loop, whose lanes all keep stepping until the last
        # one converges — downstream stochastic-gradient consumers are
        # sensitive to that extra refinement)
        ok = (pap > 1e-30) & (rz_ > 1e-30)
        alpha = jnp.where(ok, rz_ / jnp.where(ok, pap, 1.0), 0.0)
        x_ = x_ + alpha[None, :] * p_
        r_ = r_ - alpha[None, :] * ap
        z_ = p_inv(r_)
        rz_new = jnp.sum(r_ * z_, axis=0)
        beta = jnp.where(ok, rz_new / jnp.where(ok, rz_, 1.0), 0.0)
        p_ = jnp.where(ok[None, :], z_ + beta[None, :] * p_, p_)
        return x_, r_, p_, jnp.where(ok, rz_new, rz_), it + 1

    x, _, _, _, _ = lax.while_loop(cond, body, (x, r, p, rz, 0))
    return x.T


def pcg_solve(matvec, b, p_inv, tol=1e-6, maxiter=100):
    """Preconditioned CG: solves K x = b with preconditioner application
    ``p_inv``.  A 2-D ``b`` (m, n) runs all right-hand sides through ONE
    shared ``matvec`` per iteration (per-column alpha/beta, converged
    columns frozen) — for lazy-gram operators this builds each gram slab
    once per iteration instead of once per RHS."""
    b = jnp.asarray(b)
    if b.ndim == 2:
        return _pcg_solve_mrhs(matvec, b, p_inv, tol, maxiter)
    x = jnp.zeros_like(b)
    r = b
    z = p_inv(r)
    p = z
    rz = jnp.dot(r, z)
    bnorm2 = jnp.dot(b, b)

    def cond(state):
        _, r_, _, _, it = state
        rr = jnp.dot(r_, r_)
        return jnp.isfinite(rr) & (rr > tol**2 * bnorm2) & (it < maxiter)

    def body(state):
        x_, r_, p_, rz_, it = state
        ap = matvec(p_)
        pap = jnp.dot(p_, ap)
        # f32 roundoff near convergence can drive p'Ap (or r'z) slightly
        # NEGATIVE on a PSD operator; a bare max(., eps) then produces a
        # ~1e30 step that overflows x.  Treat non-positive curvature as
        # breakdown: freeze the step so cond() exits on the residual test.
        ok = (pap > 1e-30) & (rz_ > 1e-30)
        alpha = jnp.where(ok, rz_ / jnp.where(ok, pap, 1.0), 0.0)
        x_ = x_ + alpha * p_
        r_ = r_ - alpha * ap
        z_ = p_inv(r_)
        rz_new = jnp.dot(r_, z_)
        beta = jnp.where(ok, rz_new / jnp.where(ok, rz_, 1.0), 0.0)
        p_ = z_ + beta * p_
        return x_, r_, p_, rz_new, it + 1

    x, _, _, _, _ = lax.while_loop(cond, body, (x, r, p, rz, 0))
    return x


def _pcg_pieces(kernel, params, x, y, noise_var, mean, rank, block,
                cg_iters, probes, lanczos_iters, seed):
    n = x.shape[0]
    y = jnp.asarray(y)
    resid = y if mean is None else y - mean

    def mv(v):
        return lazy_kernel_matvec(kernel, params, x, v, block=block) \
            + noise_var * v

    # lazy kernel column (without noise; the preconditioner models noise
    # through its sigma^2 term)
    def column_fn(j):
        xj = lax.dynamic_slice(x, (j, 0), (1, x.shape[1]))
        return kernel.cov(params, x, xj)[:, 0]

    diag_f = jax.vmap(lambda i: kernel.cov(
        params, lax.dynamic_slice(x, (i, 0), (1, x.shape[1])))[0, 0]
    )(jnp.arange(n))
    l_factor = pivoted_cholesky(column_fn, diag_f, rank)
    p_inv, p_inv_sqrt, logdet_p = woodbury_preconditioner(l_factor, noise_var)

    alpha = pcg_solve(mv, resid, p_inv, maxiter=cg_iters)
    quad = jnp.dot(resid, alpha)

    def precond_op(v):
        return p_inv_sqrt(mv(p_inv_sqrt(v)))

    key = random.PRNGKey(seed)
    logdet_ratio = slq_logdet(precond_op, n, key, probes=probes,
                              lanczos_iters=lanczos_iters)
    logdet = logdet_p + logdet_ratio
    nll = 0.5 * quad + 0.5 * logdet + 0.5 * n * np.float32(np.log(2 * np.pi))
    diag_resid = jnp.linalg.norm(mv(alpha) - resid) / jnp.maximum(
        jnp.linalg.norm(resid), 1e-30)
    info = {"quad": quad, "logdet": logdet, "cg_rel_residual": diag_resid}
    return nll, info, alpha, l_factor


@partial(jax.custom_vjp, nondiff_argnums=(0, 6, 7, 8, 9, 10, 11))
def _pcg_nll(kernel, params, x, y, noise_var, mean, rank, block, cg_iters,
             probes, lanczos_iters, seed):
    nll, info, _, _ = _pcg_pieces(kernel, params, x, y, noise_var, mean,
                                  rank, block, cg_iters, probes,
                                  lanczos_iters, seed)
    return nll, info


def _pcg_nll_fwd(kernel, params, x, y, noise_var, mean, rank, block,
                 cg_iters, probes, lanczos_iters, seed):
    nll, info, alpha, l_factor = _pcg_pieces(
        kernel, params, x, y, noise_var, mean, rank, block, cg_iters,
        probes, lanczos_iters, seed)
    return (nll, info), (params, x, y, noise_var, mean, alpha, l_factor)


def _pcg_nll_bwd(kernel, rank, block, cg_iters, probes, lanczos_iters, seed,
                 res, cts):
    """Stochastic-trace gradient (GPyTorch BBMM, PAPERS.md):

        dNLL/dth = 1/2 tr(K^{-1} dK/dth) - 1/2 a' (dK/dth) a,   a = K^{-1} r
        tr(K^{-1} dK) ~ mean_i  (K^{-1} z_i)' dK z_i,   z_i Rademacher

    with the probe solves K^{-1} z_i by the same preconditioned CG, and the
    directional kernel derivatives taken by autodiff through the *lazy*
    matvec — no N x N matrix in the backward pass either.  The ``info``
    diagnostics are non-differentiable (their cotangents are ignored)."""
    g = cts[0]
    params, x, y, noise_var, mean, alpha, l_factor = res
    n = x.shape[0]
    p_inv, _, _ = woodbury_preconditioner(l_factor, noise_var)

    def mv(v):
        return lazy_kernel_matvec(kernel, params, x, v, block=block) \
            + noise_var * v

    key = random.PRNGKey(seed + 104729)
    z = (2.0 * random.bernoulli(key, 0.5, (probes, n)) - 1.0
         ).astype(alpha.dtype)
    # NOTE: deliberately the vmapped per-probe solve, not the multi-RHS
    # form: at near-singular points along an optimization path the two
    # accumulate different f32 noise, and the trace-gradient consumer is
    # sensitive enough that the engine='iterative' MAP test regresses by
    # ~35 nats under the shared-matvec variant (round-4 finding; the
    # multi-RHS path stays for serving, where it is validated vs dense)
    u = jax.vmap(lambda zz: pcg_solve(mv, zz, p_inv, maxiter=cg_iters))(z)
    u = lax.stop_gradient(u)
    z = lax.stop_gradient(z)
    a = lax.stop_gradient(alpha)

    def h(p, nv, m):
        def kmv(v):
            return lazy_kernel_matvec(kernel, p, x, v, block=block) + nv * v

        tr_est = jnp.mean(jax.vmap(lambda ui, zi: jnp.dot(ui, kmv(zi)))(u, z))
        quad_term = jnp.dot(a, kmv(a))
        # the mean enters through resid = y - m: d(quad)/dm = -2 K^{-1} r,
        # i.e. dNLL/dm = -a, so h needs -0.5 * d/dm(2 a'm) = -a
        mean_term = 0.0 if m is None else 2.0 * jnp.dot(a, m)
        return 0.5 * tr_est - 0.5 * (quad_term + mean_term)

    grads = jax.grad(h, argnums=(0, 1, 2) if mean is not None else (0, 1))(
        params, noise_var, mean)
    pbar = jax.tree_util.tree_map(lambda t: g * t, grads[0])
    nvbar = g * grads[1]
    mbar = g * grads[2] if mean is not None else None
    ybar = g * alpha
    return pbar, jnp.zeros_like(x), ybar, nvbar, mbar


_pcg_nll.defvjp(_pcg_nll_fwd, _pcg_nll_bwd)


@partial(jax.jit, static_argnames=("kernel", "rank", "block", "cg_iters",
                                   "probes", "lanczos_iters", "seed"))
def preconditioned_gp_nll(kernel, params, x, y, noise_var, rank=64,
                          block=2048, cg_iters=100, probes=8,
                          lanczos_iters=25, seed=0, mean=None):
    """Matrix-free GP NLL with the pivoted-Cholesky preconditioner — the
    assembled large-N path (PAPERS.md: GPyTorch BBMM + arXiv:2107.00243):

    * K = K_f + noise_var I accessed lazily (one row-slab / one column at a
      time; the N x N gram is never materialized);
    * P = sigma^2 I + L_r L_r^T from rank-``rank`` pivoted Cholesky of K_f;
    * quadratic form by preconditioned CG;
    * logdet K = logdet P + SLQ logdet of P^{-1/2} K P^{-1/2} (a
      well-conditioned operator, so few Lanczos iterations suffice).

    Differentiable w.r.t. ``params``, ``y``, ``noise_var`` and ``mean``
    through a stochastic-trace custom VJP (see ``_pcg_nll_bwd``); ``x`` is
    treated as constant.  Returns ``(nll, info)`` with non-differentiable
    diagnostics in ``info``.
    """
    return _pcg_nll(kernel, params, x, y, noise_var, mean, rank, block,
                    cg_iters, probes, lanczos_iters, seed)


def lazy_kernel_matvec(kernel, params, x, v, block=2048):
    """K(params, x) @ v without materializing the N x N gram: the gram is
    built one (block, N) row-slab at a time.  O(block * N) peak memory."""
    n = x.shape[0]
    nb = -(-n // block)
    pad = nb * block - n
    xp = jnp.pad(x, ((0, pad), (0, 0))) if pad else x

    def row_block(i):
        rows = lax.dynamic_slice(xp, (i * block, 0), (block, x.shape[1]))
        slab = kernel.cov(params, rows, x)  # (block, n)
        return jnp.dot(slab, v, precision=lax.Precision.HIGHEST)

    out = jnp.concatenate([row_block(i) for i in range(nb)])
    return out[:n]


# ---------------------------------------------------------------------------
# assembled NLL with Hutchinson-VJP
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _quad_logdet_iter(k, resid, probes, cg_iters, lanczos_iters, seed):
    return _quad_logdet_iter_fwd(k, resid, probes, cg_iters, lanczos_iters,
                                 seed)[0]


def _quad_logdet_iter_fwd(k, resid, probes, cg_iters, lanczos_iters, seed):
    n = k.shape[-1]
    mv = lambda v: jnp.matmul(k, v, precision=lax.Precision.HIGHEST)
    key = random.PRNGKey(seed)
    alpha = cg_solve(mv, resid, maxiter=cg_iters)
    quad = jnp.dot(resid, alpha)
    logdet_half = 0.5 * slq_logdet(mv, n, key, probes=probes,
                                   lanczos_iters=lanczos_iters)
    # probe solves for the gradient's Hutchinson trace estimator
    zs = random.rademacher(random.fold_in(key, 1), (probes, n),
                           dtype=k.dtype)
    zhat = cg_solve(mv, zs, maxiter=cg_iters)
    return (quad, logdet_half), (alpha, zs, zhat)


def _quad_logdet_iter_bwd(probes, cg_iters, lanczos_iters, seed, res, cots):
    alpha, zs, zhat = res
    g_quad, g_logdet = cots
    # E[K^{-1} z z^T] = K^{-1}; symmetrized Hutchinson estimate
    kinv_est = jnp.einsum("pi,pj->ij", zhat, zs) / zs.shape[0]
    kinv_est = 0.5 * (kinv_est + kinv_est.T)
    dk = (-g_quad) * jnp.outer(alpha, alpha) + (0.5 * g_logdet) * kinv_est
    dresid = (2.0 * g_quad) * alpha
    return dk, dresid


_quad_logdet_iter.defvjp(_quad_logdet_iter_fwd, _quad_logdet_iter_bwd)


def iterative_gp_nll(cov, resid, probes=16, cg_iters=100, lanczos_iters=30,
                     seed=0):
    """Matrix-free exact-GP negative log marginal likelihood:

      nll = 1/2 resid^T K^{-1} resid + 1/2 logdet K + n/2 log 2pi

    quadratic form by CG, logdet by SLQ, gradients by the Hutchinson probe
    estimator — all matmul streams on the MXU, no factorization."""
    n = cov.shape[-1]
    quad, logdet_half = _quad_logdet_iter(cov, resid, probes, cg_iters,
                                          lanczos_iters, seed)
    return (0.5 * quad + logdet_half
            + 0.5 * n * np.float32(np.log(2 * np.pi)))
