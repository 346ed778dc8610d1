"""Numeric-core tests: robust Cholesky, guards, gram builders, quadrature,
Newton inversion."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from g3py_tpu.ops import (
    safe_cholesky,
    to_cov,
    to_num,
    weighted_sqdist,
    weighted_dot,
    pairwise_sum,
    pairwise_prod,
    gauss_hermite,
    newton_inverse,
    cho_solve,
    log_det_from_chol,
)


def _psd(n, rng, jitter=1e-2):
    a = rng.standard_normal((n, n)).astype(np.float32)
    return a @ a.T + jitter * np.eye(n, dtype=np.float32)


class TestSafeCholesky:
    def test_matches_scipy_on_pd(self, rng):
        a = _psd(16, rng, jitter=1.0)
        L = np.asarray(safe_cholesky(a))
        Lref = scipy.linalg.cholesky(a, lower=True)
        np.testing.assert_allclose(L, Lref, rtol=2e-4, atol=2e-4)

    def test_jitter_rescues_semidefinite(self, rng):
        # rank-deficient matrix: clean cholesky fails, jitter must rescue
        v = rng.standard_normal((16, 3)).astype(np.float32)
        a = v @ v.T
        L = np.asarray(safe_cholesky(a))
        assert np.all(np.isfinite(L))
        np.testing.assert_allclose(L @ L.T, a, atol=1e-2)

    def test_total_failure_returns_scaled_identity(self):
        a = jnp.full((4, 4), jnp.nan, dtype=jnp.float32)
        L = np.asarray(safe_cholesky(a))
        np.testing.assert_allclose(L, 1e-10 * np.eye(4), atol=0)

    def test_negative_diagonal_repaired(self, rng):
        a = _psd(8, rng, jitter=1.0)
        a[0, 0] = -1.0
        L = np.asarray(safe_cholesky(a))
        assert np.all(np.isfinite(L))

    def test_gradient_matches_cholesky_grad(self, rng):
        a = _psd(6, rng, jitter=1.0)

        def f(m):
            return jnp.sum(safe_cholesky(m))

        def f_ref(m):
            return jnp.sum(jnp.linalg.cholesky(m))

        g = jax.grad(f)(jnp.asarray(a))
        g_ref = jax.grad(f_ref)(jnp.asarray(a))
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-3, atol=1e-3)

    def test_gradient_finite_on_failure(self):
        a = jnp.full((3, 3), jnp.nan, dtype=jnp.float32)
        g = jax.grad(lambda m: jnp.sum(safe_cholesky(m)))(a)
        assert np.all(np.isfinite(np.asarray(g)))


class TestGuards:
    def test_to_num(self):
        x = jnp.array([np.nan, np.inf, -np.inf, 1.0])
        np.testing.assert_allclose(np.asarray(to_num(x)), [0.0, 1e10, -1e10, 1.0])

    def test_to_cov_repairs_diagonal(self):
        a = jnp.diag(jnp.array([1.0, -0.5, 2.0]))
        fixed = np.asarray(to_cov(a))
        assert np.all(np.diag(fixed) > 0)


class TestGram:
    def test_weighted_sqdist_matches_naive(self, rng):
        x1 = rng.standard_normal((7, 3)).astype(np.float32)
        x2 = rng.standard_normal((5, 3)).astype(np.float32)
        rate = np.abs(rng.standard_normal(3)).astype(np.float32)
        want = ((x1[:, None, :] - x2[None, :, :]) ** 2 * rate**2).sum(-1)
        # fast (decomposed) path: fp32 matmul cancellation tolerance
        got = np.asarray(weighted_sqdist(x1, x2, rate))
        np.testing.assert_allclose(got, want, rtol=3e-3, atol=3e-3)
        # exact slab path: matches the naive form tightly
        got_exact = np.asarray(weighted_sqdist(x1, x2, rate, exact=True))
        np.testing.assert_allclose(got_exact, want, rtol=1e-5, atol=1e-5)

    def test_weighted_sqdist_offset_data(self, rng):
        # mean-centering must keep large-offset data accurate
        x1 = (rng.standard_normal((6, 2)) + 100.0).astype(np.float32)
        x2 = (rng.standard_normal((4, 2)) + 100.0).astype(np.float32)
        want = ((x1[:, None, :] - x2[None, :, :]) ** 2).sum(-1)
        got = np.asarray(weighted_sqdist(x1, x2))
        np.testing.assert_allclose(got, want, rtol=3e-3, atol=3e-3)

    def test_weighted_dot(self, rng):
        x1 = rng.standard_normal((4, 3)).astype(np.float32)
        x2 = rng.standard_normal((6, 3)).astype(np.float32)
        w = np.abs(rng.standard_normal(3)).astype(np.float32)
        got = np.asarray(weighted_dot(x1, x2, w))
        want = (x1[:, None, :] * x2[None, :, :] * w).sum(-1)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_pairwise_sum_l1(self, rng):
        x1 = rng.standard_normal((4, 3)).astype(np.float32)
        x2 = rng.standard_normal((6, 3)).astype(np.float32)
        got = np.asarray(pairwise_sum(x1, x2, lambda a, b: jnp.abs(a - b)))
        want = np.abs(x1[:, None, :] - x2[None, :, :]).sum(-1)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_pairwise_prod_min(self, rng):
        x1 = np.abs(rng.standard_normal((4, 2))).astype(np.float32)
        x2 = np.abs(rng.standard_normal((3, 2))).astype(np.float32)
        got = np.asarray(pairwise_prod(x1, x2, jnp.minimum))
        want = np.minimum(x1[:, None, :], x2[None, :, :]).prod(-1)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


class TestQuadrature:
    def test_moments_of_identity(self):
        mu = jnp.array([1.0, -2.0])
        sd = jnp.array([0.5, 2.0])
        m = gauss_hermite(lambda v: v, mu, sd, n=10)
        np.testing.assert_allclose(np.asarray(m), np.asarray(mu), atol=1e-5)
        m2 = gauss_hermite(lambda v: v**2, mu, sd, n=10)
        np.testing.assert_allclose(np.asarray(m2), np.asarray(mu**2 + sd**2), atol=1e-4)

    def test_lognormal_mean(self):
        # E[exp(X)] = exp(mu + s^2/2)
        mu = jnp.array([0.3])
        sd = jnp.array([0.7])
        m = gauss_hermite(jnp.exp, mu, sd, n=20)
        np.testing.assert_allclose(np.asarray(m), np.exp(0.3 + 0.49 / 2), rtol=1e-4)


class TestNewtonInverse:
    def test_inverts_monotone(self):
        f = lambda x: x**3 + x  # strictly increasing
        z = jnp.array([0.5, -2.0, 3.0])
        x = newton_inverse(f, z, tol=1e-8, max_steps=512)
        np.testing.assert_allclose(np.asarray(f(x)), np.asarray(z), atol=1e-4)

    def test_domain_restricted_inverse(self):
        # sqrt is NaN below its domain: the bracketing must not walk out and
        # return garbage (reviewed failure mode of the round-2 rewrite)
        f = jnp.sqrt
        z = jnp.array([2.0, 0.5])
        x = newton_inverse(f, z, tol=1e-7, max_steps=200)
        np.testing.assert_allclose(np.asarray(x), [4.0, 0.25], rtol=1e-4)

    def test_implicit_gradient(self):
        f = lambda x: jnp.exp(x) + x

        def inv_sum(z):
            return jnp.sum(newton_inverse(f, z, tol=1e-10, max_steps=512))

        z = jnp.array([1.3])
        g = jax.grad(inv_sum)(z)
        # dx/dz = 1 / f'(x) at x = f^{-1}(z)
        x = newton_inverse(f, z, tol=1e-10, max_steps=512)
        np.testing.assert_allclose(np.asarray(g), np.asarray(1.0 / (jnp.exp(x) + 1)), rtol=1e-4)


class TestCholSolvers:
    def test_cho_solve_and_logdet(self, rng):
        a = _psd(10, rng, jitter=1.0)
        b = rng.standard_normal(10).astype(np.float32)
        L = safe_cholesky(a)
        x = np.asarray(cho_solve(L, jnp.asarray(b)))
        np.testing.assert_allclose(a @ x, b, rtol=2e-3, atol=2e-3)
        ld = float(log_det_from_chol(L))
        np.testing.assert_allclose(ld, np.linalg.slogdet(a.astype(np.float64))[1], rtol=1e-4)


class TestPallasCholesky:
    def test_interpret_mode_matches(self, rng):
        from g3py_tpu.ops.pallas_cholesky import pallas_cholesky

        n, B = 256, 128
        a = rng.standard_normal((n, n)).astype(np.float32)
        A = a @ a.T + n * np.eye(n, dtype=np.float32)
        L, dinv = pallas_cholesky(A, block=B, interpret=True)
        L = np.tril(np.asarray(L))
        Lref = scipy.linalg.cholesky(A.astype(np.float64), lower=True)
        np.testing.assert_allclose(L, Lref, rtol=1e-4, atol=1e-3)
        for k in range(n // B):
            blk = L[k * B:(k + 1) * B, k * B:(k + 1) * B]
            np.testing.assert_allclose(np.asarray(dinv)[k] @ blk, np.eye(B),
                                       atol=1e-4)


class TestBlockedTrtri:
    def test_matches_solve(self, rng):
        from g3py_tpu.ops.linalg import blocked_trtri

        n = 96
        a = rng.standard_normal((n, n)).astype(np.float32)
        A = a @ a.T + n * np.eye(n, dtype=np.float32)
        L = np.linalg.cholesky(A)
        Linv = np.asarray(blocked_trtri(jnp.asarray(L), block=32))
        np.testing.assert_allclose(Linv @ L, np.eye(n), atol=1e-4)

    def test_non_divisible_padding(self, rng):
        from g3py_tpu.ops.linalg import blocked_trtri

        n = 50
        a = rng.standard_normal((n, n)).astype(np.float32)
        A = a @ a.T + n * np.eye(n, dtype=np.float32)
        L = np.linalg.cholesky(A)
        Linv = np.asarray(blocked_trtri(jnp.asarray(L), block=16))
        np.testing.assert_allclose(Linv @ L, np.eye(n), atol=1e-4)

    @pytest.mark.parametrize("n", [96, 50, 100, 256, 320])
    def test_recursive_matches_solve(self, rng, n):
        # covers: n <= base, power-of-2 grids, and non-power-of-2 grids
        # whose padding rounds up (320/64 = 5 -> 8 blocks)
        from g3py_tpu.ops.linalg import recursive_trtri

        a = rng.standard_normal((n, n)).astype(np.float32)
        A = a @ a.T + n * np.eye(n, dtype=np.float32)
        L = np.linalg.cholesky(A)
        Linv = np.asarray(recursive_trtri(jnp.asarray(L), base=64))
        np.testing.assert_allclose(Linv @ L, np.eye(n), atol=1e-4)
        assert np.all(np.triu(Linv, 1) == 0.0)


class TestBlockedCholesky:
    def _psd(self, rng, n):
        a = rng.standard_normal((n, n)).astype(np.float32)
        return a @ a.T + n * np.eye(n, dtype=np.float32)

    @pytest.mark.parametrize("variant", ["tile", "panel"])
    def test_matches_numpy(self, rng, variant):
        from g3py_tpu.ops.linalg import (blocked_cholesky,
                                         blocked_cholesky_panel)

        fn = blocked_cholesky if variant == "tile" else blocked_cholesky_panel
        A = self._psd(rng, 96)
        L = np.asarray(fn(jnp.asarray(A), block=32))
        Lr = np.linalg.cholesky(A.astype(np.float64))
        np.testing.assert_allclose(L, Lr, rtol=1e-4, atol=1e-3)
        assert np.allclose(np.triu(L, 1), 0.0)

    @pytest.mark.parametrize("variant", ["tile", "panel"])
    def test_non_divisible_padding(self, rng, variant):
        from g3py_tpu.ops.linalg import (blocked_cholesky,
                                         blocked_cholesky_panel)

        fn = blocked_cholesky if variant == "tile" else blocked_cholesky_panel
        A = self._psd(rng, 50)
        L = np.asarray(fn(jnp.asarray(A), block=16))
        Lr = np.linalg.cholesky(A.astype(np.float64))
        np.testing.assert_allclose(L, Lr, rtol=1e-4, atol=1e-3)

    @pytest.mark.parametrize("variant", ["tile", "panel"])
    def test_nan_propagates_for_indefinite(self, rng, variant):
        """safe_cholesky's jitter search relies on NaN signaling failure —
        a blocked substitute must preserve that."""
        from g3py_tpu.ops.linalg import (blocked_cholesky,
                                         blocked_cholesky_panel)

        fn = blocked_cholesky if variant == "tile" else blocked_cholesky_panel
        B = -np.eye(64, dtype=np.float32)
        L = np.asarray(fn(jnp.asarray(B), block=16))
        assert np.isnan(L).any()


class TestMvnQuadLogdet:
    def test_values_and_grads(self, rng):
        from g3py_tpu.ops.linalg import mvn_quad_logdet

        n = 24
        a = rng.standard_normal((n, n)).astype(np.float32)
        A = jnp.asarray(a @ a.T + n * np.eye(n, dtype=np.float32))
        r = jnp.asarray(rng.standard_normal(n).astype(np.float32))

        quad, ldh, ok = mvn_quad_logdet(A, r)
        Anp = np.asarray(A, np.float64)
        np.testing.assert_allclose(float(quad), r @ np.linalg.solve(Anp, r),
                                   rtol=1e-4)
        np.testing.assert_allclose(float(ldh),
                                   0.5 * np.linalg.slogdet(Anp)[1], rtol=1e-4)
        assert float(ok) == 1.0

        # analytic backward vs autodiff through jnp.linalg
        def f_ours(K, v):
            q, l, _ = mvn_quad_logdet(K, v)
            return 0.7 * q + 1.3 * l

        def f_ref(K, v):
            L = jnp.linalg.cholesky(K)
            z = jax.scipy.linalg.solve_triangular(L, v, lower=True)
            return 0.7 * jnp.dot(z, z) + 1.3 * jnp.sum(jnp.log(jnp.diagonal(L)))

        gK, gv = jax.grad(f_ours, argnums=(0, 1))(A, r)
        gK_ref, gv_ref = jax.grad(f_ref, argnums=(0, 1))(A, r)
        np.testing.assert_allclose(np.asarray(gK), np.asarray(gK_ref),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gv), np.asarray(gv_ref),
                                   rtol=1e-3, atol=1e-4)

    def test_blocked_lauum(self, rng):
        from g3py_tpu.ops.linalg import blocked_lauum, blocked_lauum_panel

        for fn in (blocked_lauum, blocked_lauum_panel):
            for n in (100, 128):
                a = rng.standard_normal((n, n)).astype(np.float32)
                w = jnp.asarray(np.tril(a))
                got = fn(w, block=32)
                want = np.asarray(w, np.float64).T @ np.asarray(w, np.float64)
                np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4,
                                           atol=1e-4, err_msg=fn.__name__)

    def test_failure_path_zero_grad(self):
        from g3py_tpu.ops.linalg import mvn_quad_logdet

        A = jnp.full((4, 4), jnp.nan, dtype=jnp.float32)
        r = jnp.ones(4, dtype=jnp.float32)
        quad, ldh, ok = mvn_quad_logdet(A, r)
        assert float(ok) == 0.0
        g = jax.grad(lambda K: mvn_quad_logdet(K, r)[0])(A)
        assert np.all(np.isfinite(np.asarray(g)))


class TestIterativeInference:
    def test_cg_solves(self, rng):
        from g3py_tpu.ops.iterative import cg_solve

        n = 64
        a = rng.standard_normal((n, n)).astype(np.float32)
        K = jnp.asarray(a @ a.T / n + np.eye(n, dtype=np.float32))
        b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        x = cg_solve(lambda v: K @ v, b, maxiter=200)
        np.testing.assert_allclose(np.asarray(K @ x), np.asarray(b), atol=1e-3)
        # batched RHS
        B = jnp.asarray(rng.standard_normal((3, n)).astype(np.float32))
        X = cg_solve(lambda v: K @ v, B, maxiter=200)
        np.testing.assert_allclose(np.asarray(X @ K.T), np.asarray(B), atol=1e-3)

    def test_slq_logdet_close(self, rng):
        import jax
        from jax import random
        from g3py_tpu.ops.iterative import slq_logdet

        n = 128
        a = rng.standard_normal((n, n)).astype(np.float32)
        K = jnp.asarray(a @ a.T / n + np.eye(n, dtype=np.float32))
        ld = float(slq_logdet(lambda v: K @ v, n, random.PRNGKey(0),
                              probes=32, lanczos_iters=40))
        want = np.linalg.slogdet(np.asarray(K, np.float64))[1]
        np.testing.assert_allclose(ld, want, rtol=0.05)

    def test_iterative_nll_matches_exact(self, rng):
        from g3py_tpu.ops.iterative import iterative_gp_nll

        n = 128
        a = rng.standard_normal((n, n)).astype(np.float32)
        K = jnp.asarray(a @ a.T / n + np.eye(n, dtype=np.float32))
        y = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        got = float(iterative_gp_nll(K, y, probes=32, cg_iters=200,
                                     lanczos_iters=40))
        L = np.linalg.cholesky(np.asarray(K, np.float64))
        z = np.linalg.solve(L, np.asarray(y))
        want = 0.5 * z @ z + np.log(np.diag(L)).sum() + 0.5 * n * np.log(2 * np.pi)
        np.testing.assert_allclose(got, want, rtol=0.02)

    def test_gradient_direction(self, rng):
        from g3py_tpu.ops.iterative import iterative_gp_nll

        n = 96
        a = rng.standard_normal((n, n)).astype(np.float32)
        K = jnp.asarray(a @ a.T / n + np.eye(n, dtype=np.float32))
        y = jnp.asarray(rng.standard_normal(n).astype(np.float32))

        def f_iter(Km):
            return iterative_gp_nll(Km, y, probes=32, cg_iters=200,
                                    lanczos_iters=40)

        def f_exact(Km):
            Lm = jnp.linalg.cholesky(Km)
            zz = jax.scipy.linalg.solve_triangular(Lm, y, lower=True)
            return (0.5 * jnp.dot(zz, zz)
                    + jnp.sum(jnp.log(jnp.diagonal(Lm))))

        g1 = np.asarray(jax.grad(f_iter)(K)).ravel()
        g2 = np.asarray(jax.grad(f_exact)(K)).ravel()
        cos = (g1 @ g2) / np.sqrt((g1 @ g1) * (g2 @ g2))
        assert cos > 0.9

    def test_lazy_matvec(self, rng):
        from g3py_tpu.ops.iterative import lazy_kernel_matvec
        from g3py_tpu.hypers.kernels import SE

        x = rng.standard_normal((100, 3)).astype(np.float32)
        k = SE(x)
        k.check_dims(x)
        k.check_hypers("LZ_")
        params = {p.name: p.testval() for p in k.hypers}
        v = jnp.asarray(rng.standard_normal(100).astype(np.float32))
        got = np.asarray(lazy_kernel_matvec(k, params, jnp.asarray(x), v,
                                            block=32))
        want = np.asarray(k.cov(params, jnp.asarray(x)) @ v)
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestPreconditionedInference:
    def test_pivoted_cholesky_low_rank_recovery(self, rng):
        from g3py_tpu.ops.iterative import pivoted_cholesky

        n, r_true = 80, 5
        w = rng.standard_normal((n, r_true)).astype(np.float32)
        K = jnp.asarray(w @ w.T)
        col = lambda j: K[:, j]
        L = pivoted_cholesky(col, jnp.diagonal(K), rank=10)
        np.testing.assert_allclose(np.asarray(L @ L.T), np.asarray(K),
                                   atol=1e-3)

    def test_woodbury_inverse(self, rng):
        from g3py_tpu.ops.iterative import woodbury_preconditioner

        n, r = 40, 6
        Lf = jnp.asarray(rng.standard_normal((n, r)).astype(np.float32))
        sigma2 = 0.3
        P = np.asarray(Lf @ Lf.T) + sigma2 * np.eye(n)
        p_inv, p_inv_sqrt, logdet = woodbury_preconditioner(Lf, sigma2)
        v = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        np.testing.assert_allclose(np.asarray(p_inv(jnp.asarray(P) @ v)),
                                   np.asarray(v), atol=1e-3)
        # inverse sqrt: P^{-1/2} P P^{-1/2} = I
        w = p_inv_sqrt(jnp.asarray(P) @ p_inv_sqrt(v))
        np.testing.assert_allclose(np.asarray(w), np.asarray(v), atol=1e-3)
        np.testing.assert_allclose(float(logdet),
                                   np.linalg.slogdet(P.astype(np.float64))[1],
                                   rtol=1e-4)

    def test_preconditioned_nll_matches_exact(self, rng):
        from g3py_tpu.ops.iterative import preconditioned_gp_nll
        from g3py_tpu.hypers.kernels import SE

        n = 200
        x = np.sort(rng.uniform(0, 20, n)).astype(np.float32).reshape(-1, 1)
        y = (np.sin(x[:, 0]) + 0.05 * rng.standard_normal(n)).astype(np.float32)
        k = SE(x)
        k.check_dims(x)
        k.check_hypers("PC_")
        params = {p.name: jnp.asarray(p.testval()) for p in k.hypers}
        noise = 0.01
        nll, info = preconditioned_gp_nll(k, params, jnp.asarray(x),
                                          jnp.asarray(y), noise_var=noise,
                                          rank=50, cg_iters=200, probes=16,
                                          lanczos_iters=30)
        K = np.asarray(k.cov(params, jnp.asarray(x)), np.float64) \
            + noise * np.eye(n)
        L = np.linalg.cholesky(K)
        z = np.linalg.solve(L, y)
        want = 0.5 * z @ z + np.log(np.diag(L)).sum() + 0.5 * n * np.log(2 * np.pi)
        assert float(info["cg_rel_residual"]) < 1e-2
        np.testing.assert_allclose(float(nll), want, rtol=5e-3)


class TestPreconditionedGradient:
    def test_stochastic_gradient_matches_exact(self, rng):
        """Hutchinson custom VJP of the matrix-free NLL vs exact autodiff
        through the dense Cholesky (statistical agreement; the trace
        estimator's error shrinks as 1/sqrt(probes))."""
        import jax

        from g3py_tpu.ops.iterative import preconditioned_gp_nll
        from g3py_tpu.hypers.kernels import SE

        n = 160
        x = np.sort(rng.uniform(0, 20, n)).astype(np.float32).reshape(-1, 1)
        y = (np.sin(x[:, 0]) + 0.05 * rng.standard_normal(n)).astype(np.float32)
        k = SE(x)
        k.check_dims(x)
        k.check_hypers("PG_")
        params = {p.name: jnp.asarray(p.testval()) for p in k.hypers}
        noise = jnp.float32(0.05)

        def nll_iter(p, nv, yy):
            out, _ = preconditioned_gp_nll(k, p, jnp.asarray(x), yy,
                                           noise_var=nv, rank=40,
                                           cg_iters=300, probes=256,
                                           lanczos_iters=30)
            return out

        def nll_exact(p, nv, yy):
            K = k.cov(p, jnp.asarray(x)) + nv * jnp.eye(n)
            L = jnp.linalg.cholesky(K)
            z = jax.scipy.linalg.solve_triangular(L, yy, lower=True)
            return (0.5 * jnp.dot(z, z) + jnp.sum(jnp.log(jnp.diag(L)))
                    + 0.5 * n * np.float32(np.log(2 * np.pi)))

        yj = jnp.asarray(y)
        g_it = jax.grad(nll_iter, argnums=(0, 1, 2))(params, noise, yj)
        g_ex = jax.grad(nll_exact, argnums=(0, 1, 2))(params, noise, yj)
        # y-gradient is K^{-1}r exactly (up to the CG tolerance)
        np.testing.assert_allclose(np.asarray(g_it[2]), np.asarray(g_ex[2]),
                                   rtol=5e-2, atol=5e-3)
        # params/noise gradients carry Hutchinson noise
        for key in params:
            a = np.asarray(g_it[0][key]).ravel()
            b = np.asarray(g_ex[0][key]).ravel()
            assert np.all(np.abs(a - b) <= 0.25 * np.abs(b) + 0.3), (key, a, b)
        assert abs(float(g_it[1]) - float(g_ex[1])) \
            <= 0.25 * abs(float(g_ex[1])) + 0.3


class TestSpectralRFF:
    def test_rff_gram_matches_kernels(self, rng):
        """The spectral derivations for this library's parametrization
        (SE: N(0, diag(rate^2)); Matern-nu: multivariate t_{2nu} at
        rate/sqrt(2) scale) are validated by feature-gram convergence to
        the exact covariance (Rahimi-Recht, O(1/sqrt(F)))."""
        import jax
        from g3py_tpu.ops.rff import spectral_rff
        from g3py_tpu.hypers.kernels import SE, MAT32, MAT52, RQ

        x = rng.standard_normal((50, 2)).astype(np.float32)
        rates = np.asarray([0.8, 1.4], np.float32)
        var = 1.7
        alpha = 1.3
        for cls, nu in ((SE, None), (MAT32, 1.5), (MAT52, 2.5), (RQ, None)):
            k = cls(x)
            k.check_dims(x)
            k.check_hypers("R_")
            params = {}
            for p in k.hypers:
                if p.name.endswith("_var"):
                    params[p.name] = np.float32(var)
                elif p.name.endswith("_alpha"):
                    params[p.name] = np.float32(alpha)
                else:
                    params[p.name] = rates
            K = np.asarray(k.cov(params, jnp.asarray(x)))
            errs = []
            for seed in range(3):
                phi = spectral_rff(
                    jax.random.PRNGKey(seed), 2, 16384, rates, var, nu=nu,
                    rq_alpha=(alpha if cls is RQ else None))
                F = np.asarray(phi(x))
                errs.append(np.max(np.abs(F @ F.T - K)))
            assert np.mean(errs) < 0.08 * var, (cls.__name__, errs)
