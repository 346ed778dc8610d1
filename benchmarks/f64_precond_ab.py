"""f64-accumulated preconditioner for the near-interpolation f32 serving
envelope (VERDICT round-3 item 5).

Round-3 measured closure: at tut19's trained optimum (lambda_1/sigma^2 ~
4e9, pivot dynamic range ~7 decades) the f32 rank-80 pivoted-Cholesky /
PCG stack stalls at relative residual 0.22 independent of cg_iters, and
DEEPER f32 factors are WORSE.  The identified-but-untried fix: build the
preconditioner (kernel columns, pivoted-Cholesky recursion, Woodbury
eigendecomposition) with f64 accumulation.

This script measures, at a reproduction of the stall regime:

  A. all-f32 stack            (the round-3 stall, baseline)
  B. f64 preconditioner, f32 CG apply   (the named fix)
  C. all-f64 stack            (precision upper bound)

Residuals are always computed in f64 against the f64 operator, so a
"converged" f32 solve that merely *reports* a small f32 residual cannot
pass.  Run small (CPU, n=4096, default) or at the tut19 50k workload
(--tut19, requires the TPU or patience).
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def build_problem(n=4096, noise_var=1e-6):
    """Dense 1-D SE sampling with tiny noise: lambda_1/sigma^2 ~ n/nv —
    4e9 at the default sizes, the tut19 stall regime."""
    import jax.numpy as jnp
    import g3py_tpu as g3

    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(0, 100, n)).astype(np.float32).reshape(-1, 1)
    f = np.sin(0.3 * x[:, 0]) * np.exp(-0.5 * ((x[:, 0] - 50) / 30) ** 2)
    y = (f + np.sqrt(noise_var) * rng.standard_normal(n)).astype(np.float32)
    gp = g3.GP(space=x[:4], location=g3.Bias(), kernel=g3.SE(x),
               noisy=True, name="F64AB")
    gp.observed(x, y)
    params = dict(gp.params_default)
    params[f"{gp.name}_SE_rate"] = np.asarray([0.3], np.float32)
    params[f"{gp.name}_SE_var"] = np.asarray(1.0, np.float32)
    params[f"{gp.name}_Noise_var"] = np.asarray(noise_var, np.float32)
    pj = {k: jnp.asarray(v) for k, v in gp.filter_params(params).items()}
    resid = np.asarray(
        gp._latent_obs(pj, gp.outputs) - gp.f_location(pj, jnp.asarray(x)))
    return gp.f_kernel, pj, x, resid, noise_var


def solve_case(kernel, pj, x, resid, noise_var, rank, cg_iters,
               precond_dtype, cg_dtype, block=2048):
    """One (preconditioner dtype, CG dtype) combination; returns the
    TRUE relative residual, measured in f64."""
    import jax
    import jax.numpy as jnp
    from g3py_tpu.ops.iterative import (pivoted_cholesky,
                                        woodbury_preconditioner,
                                        pcg_solve, lazy_kernel_matvec)

    n = x.shape[0]

    def cast_tree(t, dt):
        return jax.tree_util.tree_map(lambda a: jnp.asarray(a, dt), t)

    # --- preconditioner in precond_dtype ---------------------------------
    xp = jnp.asarray(x, precond_dtype)
    pp = cast_tree(pj, precond_dtype)

    def column_fn(j):
        xj = jax.lax.dynamic_slice(xp, (j, 0), (1, xp.shape[1]))
        return kernel.cov(pp, xp, xj)[:, 0]

    diag_f = jax.vmap(lambda i: kernel.cov(
        pp, jax.lax.dynamic_slice(xp, (i, 0), (1, xp.shape[1])))[0, 0]
    )(jnp.arange(n))
    t0 = time.perf_counter()
    l_factor = jax.jit(lambda d: pivoted_cholesky(column_fn, d, rank))(
        diag_f)
    # the Woodbury eigendecomposition AND apply stay in precond_dtype —
    # downcasting the factor first would discard exactly the accumulated
    # precision the small pivots need; CG vectors cross the boundary
    p_inv_p, _, _ = woodbury_preconditioner(
        l_factor, jnp.asarray(noise_var, precond_dtype))

    def p_inv(w):
        return jnp.asarray(p_inv_p(jnp.asarray(w, precond_dtype)),
                           cg_dtype)

    t_pre = time.perf_counter() - t0

    # --- CG in cg_dtype ---------------------------------------------------
    xc = jnp.asarray(x, cg_dtype)
    pc = cast_tree(pj, cg_dtype)
    nvc = jnp.asarray(noise_var, cg_dtype)
    rc = jnp.asarray(resid, cg_dtype)

    def mv(v):
        return lazy_kernel_matvec(kernel, pc, xc, v, block=block) + nvc * v

    t0 = time.perf_counter()
    alpha = jax.jit(lambda b: pcg_solve(mv, b, p_inv,
                                        maxiter=cg_iters))(rc)
    alpha = np.asarray(alpha)
    t_cg = time.perf_counter() - t0

    # --- TRUE residual in f64 --------------------------------------------
    x64 = jnp.asarray(x, jnp.float64)
    p64 = cast_tree(pj, jnp.float64)
    ka = np.asarray(lazy_kernel_matvec(kernel, p64, x64,
                                       jnp.asarray(alpha, jnp.float64),
                                       block=block)) \
        + noise_var * alpha.astype(np.float64)
    r64 = np.asarray(resid, np.float64)
    rel = np.linalg.norm(ka - r64) / np.linalg.norm(r64)
    return rel, t_pre, t_cg


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    if "--cpu" in sys.argv or jax.default_backend() != "tpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), flush=True)
    n = 4096
    kernel, pj, x, resid, nv = build_problem(n=n)
    print(f"problem: n={n}, noise_var={nv:g} "
          f"(lambda1/sigma2 ~ {n / nv:.1e})", flush=True)

    for tag, rank, cg_iters, pdt, cdt in (
            ("A  f32 precond + f32 CG (round-3 stall)", 80, 400,
             jnp.float32, jnp.float32),
            ("A' f32 precond rank 240 (deeper is worse)", 240, 400,
             jnp.float32, jnp.float32),
            ("B  f64 precond + f32 CG (the named fix)", 80, 400,
             jnp.float64, jnp.float32),
            ("B' f64 precond rank 240 + f32 CG", 240, 400,
             jnp.float64, jnp.float32),
            ("C  f64 precond + f64 CG (upper bound)", 80, 400,
             jnp.float64, jnp.float64),
            ("C' f64 precond rank 240 + f64 CG", 240, 400,
             jnp.float64, jnp.float64),
            ("D  f32 precond + f64 CG (matvec the binder?)", 80, 400,
             jnp.float32, jnp.float64)):
        try:
            rel, t_pre, t_cg = solve_case(kernel, pj, x, resid, nv,
                                          rank, cg_iters, pdt, cdt)
            print(f"{tag}: TRUE rel resid {rel:.3e} "
                  f"(precond {t_pre:.1f}s, cg {t_cg:.1f}s)", flush=True)
        except Exception as e:  # noqa: BLE001 - report per-case
            print(f"{tag}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
