"""StateSpaceGP: exact O(n) Markovian GP inference via parallel Kalman.

The pinning claim is EXACTNESS: for OU / MAT32 / MAT52 kernels (and sums)
the state-space NLL, posterior moments and pointwise predictive density
equal the dense ``GP(noisy=True)`` family's to float32 rounding — no
approximation anywhere.  The reference has no counterpart (its only
scaling story is subsampling, reference data.py:129-190); the dense GP
here serves as the oracle.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import g3py_tpu as g3
from g3py_tpu.ops.ssm import (ssm_leaves, ssm_blocks, parallel_kalman_nll,
                              chunked_kalman_nll, parallel_kalman_filter,
                              parallel_smoother, periodic_coefficients,
                              small_inv)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _series(rng, n=64, span=10.0):
    t = np.sort(rng.uniform(0, span, n)).reshape(-1, 1).astype(np.float32)
    y = (np.sin(t[:, 0]) + 0.1 * rng.standard_normal(n)).astype(np.float32)
    return t, y


def _pair(t, kernel_fn):
    """(StateSpaceGP, dense GP) over the same kernel construction; the
    param dicts are identical by construction (same naming, same
    data-driven defaults)."""
    ss = g3.StateSpaceGP(space=t, kernel=kernel_fn(), name="S")
    dn = g3.GP(space=t, kernel=kernel_fn(), noisy=True, name="S")
    return ss, dn


KERNELS = {
    "ou": lambda t: (lambda: g3.OU(t)),
    "mat32": lambda t: (lambda: g3.MAT32(t)),
    "mat52": lambda t: (lambda: g3.MAT52(t)),
    "sum": lambda t: (lambda: g3.MAT32(t) + g3.OU(t)),
}


class TestDenseParity:
    @pytest.mark.parametrize("which", list(KERNELS))
    def test_nll_and_grad_match_dense(self, rng, which):
        t, y = _series(rng)
        ss, dn = _pair(t, KERNELS[which](t))
        ss.observed(t, y)
        dn.observed(t, y)
        assert set(ss.params) == set(dn.params)
        p = ss.params
        for k in p:
            np.testing.assert_allclose(np.asarray(p[k]),
                                       np.asarray(dn.params[k]), rtol=1e-6)
        l_ss = float(ss.loglike(p))
        l_d = float(dn.loglike(p))
        assert abs(l_ss - l_d) < 5e-4 * max(1.0, abs(l_d))
        # gradient parity in the shared unconstrained coordinates (dlogp
        # = loglike + identical priors on both sides)
        g_ss = np.asarray(ss.dlogp(p))
        g_d = np.asarray(dn.dlogp(p))
        np.testing.assert_allclose(g_ss, g_d, rtol=5e-3, atol=5e-3)

    @pytest.mark.parametrize("which", ["mat52", "sum"])
    def test_posterior_moments_match_dense(self, rng, which):
        t, y = _series(rng)
        ss, dn = _pair(t, KERNELS[which](t))
        ss.observed(t, y)
        dn.observed(t, y)
        p = ss.params
        tq = np.linspace(-1, 11, 40).reshape(-1, 1).astype(np.float32)
        for space in (t, tq):
            np.testing.assert_allclose(
                np.asarray(ss.mean(p, space=space)),
                np.asarray(dn.mean(p, space=space)), atol=2e-5)
            np.testing.assert_allclose(
                np.asarray(ss.variance(p, space=space, noise=True)),
                np.asarray(dn.variance(p, space=space, noise=True)),
                atol=5e-5)
        # prior moments too
        np.testing.assert_allclose(
            np.asarray(ss.variance(p, space=tq, prior=True)),
            np.asarray(dn.variance(p, space=tq, prior=True)), atol=2e-5)

    def test_logpredictive_matches_dense(self, rng):
        t, y = _series(rng)
        ss, dn = _pair(t, KERNELS["mat32"](t))
        ss.observed(t, y)
        dn.observed(t, y)
        p = ss.params
        tq = np.linspace(0.5, 9.5, 30).reshape(-1, 1).astype(np.float32)
        yq = np.sin(tq[:, 0]).astype(np.float32)
        lp_ss = float(ss.logpredictive(p, space=tq, vector=yq))
        lp_d = float(dn.logpredictive(p, space=tq, vector=yq))
        assert abs(lp_ss - lp_d) < 1e-3 * max(1.0, abs(lp_d))

    def test_unsorted_inputs_are_order_invariant(self, rng):
        t, y = _series(rng)
        perm = rng.permutation(len(y))
        ss_sorted, _ = _pair(t, KERNELS["mat32"](t))
        ss_sorted.observed(t, y)
        ss_perm = g3.StateSpaceGP(space=t[perm],
                                  kernel=g3.MAT32(t), name="S")
        ss_perm.observed(t[perm], y[perm])
        p = ss_sorted.params
        assert abs(float(ss_sorted.loglike(p))
                   - float(ss_perm.loglike(p))) < 1e-3


class TestModelAPI:
    def test_find_map_improves_and_transfers_to_dense(self, rng):
        t, y = _series(rng, n=48)
        ss, dn = _pair(t, KERNELS["mat32"](t))
        ss.observed(t, y)
        dn.observed(t, y)
        p0 = ss.params
        params = ss.find_MAP(start=p0, points=1, display=False)
        assert float(ss.loglike(params)) >= float(ss.loglike(p0)) - 1e-3
        # the trained dict drives the dense family directly (same names)
        assert np.isfinite(float(dn.loglike(params)))

    def test_sampler_and_quantiler(self, rng):
        t, y = _series(rng, n=32)
        ss, _ = _pair(t, KERNELS["ou"](t))
        ss.observed(t, y)
        p = ss.params
        s = ss.sampler(p, space=t, samples=5, noise=True, seed=2)
        assert s.shape == (32, 5) and np.all(np.isfinite(s))
        q_hi = ss.quantiler(p, space=t, q=0.975, noise=True)
        q_lo = ss.quantiler(p, space=t, q=0.025, noise=True)
        assert np.all(q_hi > q_lo)
        m = np.asarray(ss.mean(p, space=t))
        assert np.all((m > q_lo) & (m < q_hi))

    def test_joint_sampler_matches_dense_covariance(self, rng):
        """The simulation-smoother sampler draws from the JOINT
        posterior: empirical moments at 3000 draws match the dense
        family's closed-form posterior mean/covariance within MC error."""
        n = 24
        t = np.sort(rng.uniform(0, 10, n)).reshape(-1, 1).astype(
            np.float32)
        y = (np.sin(t[:, 0])
             + 0.2 * rng.standard_normal(n)).astype(np.float32)
        tq = np.linspace(0.5, 9.5, 12).reshape(-1, 1).astype(np.float32)
        ss, dn = _pair(t, KERNELS["mat32"](t))
        ss.observed(t, y)
        dn.observed(t, y)
        p = ss.params
        draws = ss.sampler(p, space=tq, samples=3000, seed=0)
        assert draws.shape == (12, 3000)
        m_d = np.asarray(dn.mean(p, space=tq))
        c_d = np.asarray(dn.covariance(p, space=tq))
        scale = float(np.abs(c_d).max())
        np.testing.assert_allclose(draws.mean(axis=1), m_d,
                                   atol=6 * np.sqrt(scale / 3000))
        np.testing.assert_allclose(np.cov(draws), c_d, atol=0.1 * scale)
        # prior draws reproduce the prior kernel
        dp = ss.sampler(p, space=tq, samples=3000, prior=True, seed=1)
        kq = np.asarray(dn.f_kernel.cov(
            {k: np.asarray(v) for k, v in p.items()}, tq))
        np.testing.assert_allclose(np.cov(dp), kq,
                                   atol=0.15 * float(np.abs(kq).max()))

    def test_predictor_serving(self, rng):
        t, y = _series(rng, n=32)
        ss, _ = _pair(t, KERNELS["mat52"](t))
        ss.observed(t, y)
        p = ss.params
        pr = ss.predictor(p)
        tq = np.linspace(1, 9, 16).reshape(-1, 1).astype(np.float32)
        np.testing.assert_allclose(np.asarray(pr.mean(space=tq)),
                                   np.asarray(ss.mean(p, space=tq)),
                                   atol=1e-5)

    def test_guards_and_errors(self, rng):
        t, y = _series(rng, n=16)
        # SE gained an (approximate, order-8 Taylor) state-space leaf in
        # round 11 — it must CONSTRUCT now, not raise.
        from g3py_tpu.ops.ssm import SELeaf
        ss_se = g3.StateSpaceGP(space=t, kernel=g3.SE(t), name="Sse")
        assert any(isinstance(l, SELeaf) for l in ss_se._leaves)
        # a kernel with no state-space form still raises loudly
        with pytest.raises(ValueError, match="state-space"):
            g3.StateSpaceGP(space=t, kernel=g3.LIN(t), name="Slin")
        x2 = np.concatenate([t, t], axis=1)
        ss2 = g3.StateSpaceGP(space=x2, kernel=g3.OU(x2[:, :1]), name="S2")
        with pytest.raises(ValueError, match="1-D"):
            ss2.observed(x2, y)
        ss, _ = _pair(t, KERNELS["ou"](t))
        ss.observed(t, y)
        # no full posterior covariance (same convention as the warped
        # family, stochastic.py:827-831: the statistic is unbound)
        assert not hasattr(ss, "covariance")


class TestScaling:
    def test_exact_nll_at_20k_rows(self, rng):
        """The point of the family: exact NLL+grad at a size where the
        dense O(n^3) path would need ~2.7 TFLOP — here O(n) work,
        log-depth on device."""
        n = 20_000
        t = np.sort(rng.uniform(0, 500, n)).reshape(-1, 1).astype(
            np.float32)
        y = (np.sin(t[:, 0] / 3.0)
             + 0.1 * rng.standard_normal(n)).astype(np.float32)
        ss = g3.StateSpaceGP(space=t, kernel=g3.MAT32(t), name="S")
        ss.observed(t, y)
        p = ss.params
        ll = float(ss.loglike(p))
        g = np.asarray(ss.dlogp(p))
        assert np.isfinite(ll) and np.all(np.isfinite(g))
        # subsample cross-check: dense NLL on a 512-row subset has the
        # same per-row scale (sanity that the magnitude is right)
        idx = np.linspace(0, n - 1, 512).astype(int)
        dn = g3.GP(space=t[idx], kernel=g3.MAT32(t[idx]), noisy=True,
                   name="S")
        dn.observed(t[idx], y[idx])
        per_row_ss = ll / n
        per_row_dn = float(dn.loglike(p)) / 512
        assert abs(per_row_ss - per_row_dn) < 0.5


class TestOpsLevel:
    def test_filter_matches_sequential(self, rng):
        """Parallel associative-scan filter == the classic sequential
        Kalman recursion, step for step."""
        n = 24
        t = np.sort(rng.uniform(0, 8, n)).astype(np.float32)
        y = rng.standard_normal(n).astype(np.float32)
        k = g3.MAT52(t[:, None])
        ss = g3.StateSpaceGP(space=t[:, None], kernel=k, name="S")
        ss.observed(t[:, None], y)
        p = {kk: jnp.asarray(v) for kk, v in ss.params.items()}
        dt = np.concatenate([[0.0], np.diff(t)]).astype(np.float32)
        a, q, pinf, h = ssm_blocks(ss._leaves, p, jnp.asarray(dt))
        r = float(ss._noise_var(p))
        a, q, h = np.asarray(a), np.asarray(q), np.asarray(h)
        # sequential reference
        m = np.zeros(a.shape[-1])
        P = np.zeros((a.shape[-1], a.shape[-1]))
        ms, Ps, nll = [], [], 0.0
        for kstep in range(n):
            mp = a[kstep] @ m
            Pp = a[kstep] @ P @ a[kstep].T + q[kstep]
            s = h @ Pp @ h + r
            kg = Pp @ h / s
            nll += 0.5 * (np.log(2 * np.pi * s)
                          + (y[kstep] - h @ mp) ** 2 / s)
            m = mp + kg * (y[kstep] - h @ mp)
            P = Pp - np.outer(kg, h @ Pp)
            ms.append(m.copy())
            Ps.append(P.copy())
        nll_p, m_f, p_f = parallel_kalman_nll(
            jnp.asarray(a), jnp.asarray(q), jnp.asarray(h), r,
            jnp.asarray(y))
        np.testing.assert_allclose(np.asarray(m_f), np.stack(ms),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(p_f), np.stack(Ps),
                                   atol=2e-4)
        assert abs(float(nll_p) - nll) < 1e-2
        # smoother: last smoothed == last filtered; sequential RTS check
        m_s, p_s = parallel_smoother(jnp.asarray(a), jnp.asarray(q),
                                     m_f, p_f)
        np.testing.assert_allclose(np.asarray(m_s[-1]), ms[-1], atol=2e-4)
        msm, psm = ms[-1].copy(), Ps[-1].copy()
        for kstep in range(n - 2, -1, -1):
            Pp = a[kstep + 1] @ Ps[kstep] @ a[kstep + 1].T + q[kstep + 1]
            Ek = Ps[kstep] @ a[kstep + 1].T @ np.linalg.inv(Pp)
            msm = ms[kstep] + Ek @ (msm - a[kstep + 1] @ ms[kstep])
            psm = Ps[kstep] + Ek @ (psm - Pp) @ Ek.T
            np.testing.assert_allclose(np.asarray(m_s[kstep]), msm,
                                       atol=5e-4)
            np.testing.assert_allclose(np.asarray(p_s[kstep]), psm,
                                       atol=5e-4)

    def test_chunked_nll_matches_plain(self, rng):
        """chunked_kalman_nll (O(chunk)-memory monoid scan) == the plain
        parallel filter's NLL, value AND gradient, across chunk sizes
        that divide, don't divide, and exceed n (identity-element pad)."""
        n, s = 600, 3
        a = jnp.asarray(rng.standard_normal((n, s, s)) * 0.3)
        L = rng.standard_normal((n, s, s)) * 0.5
        q = jnp.asarray(np.einsum("nij,nkj->nik", L, L)
                        + 0.1 * np.eye(s), jnp.float32)
        h = jnp.asarray(rng.standard_normal(s), jnp.float32)
        r = jnp.float32(0.3)
        y = jnp.asarray(rng.standard_normal(n), jnp.float32)
        obs = jnp.asarray(rng.random(n) > 0.1)
        nll_plain, _, _ = parallel_kalman_nll(a, q, h, r, y, obs)
        for chunk in (64, 150, 600, 4096):
            nll_c = chunked_kalman_nll(a, q, h, r, y, obs, chunk=chunk)
            np.testing.assert_allclose(float(nll_c), float(nll_plain),
                                       rtol=2e-6)

        def f_plain(sc):
            nll, _, _ = parallel_kalman_nll(a, q * sc, h, r * sc, y, obs)
            return nll

        def f_chunk(sc):
            return chunked_kalman_nll(a, q * sc, h, r * sc, y, obs,
                                      chunk=64)

        g1 = float(jax.grad(f_plain)(jnp.float32(1.0)))
        g2 = float(jax.grad(f_chunk)(jnp.float32(1.0)))
        np.testing.assert_allclose(g2, g1, rtol=2e-5)

    def test_chunked_blocks_on_the_fly_matches_plain(self, rng):
        """blocks_fn form (per-block A/Q construction from the step
        vector — the (n, s, s) stacks never materialize) == the
        materialized form, NLL value + params-gradient and smoother
        projections, across dividing/non-dividing chunk sizes."""
        from g3py_tpu.config import settings
        n = 500
        t = np.sort(rng.uniform(0, 30, n)).reshape(-1, 1).astype(
            np.float32)
        y = (np.sin(t[:, 0]) + 0.1 * rng.standard_normal(n)).astype(
            np.float32)
        ss = g3.StateSpaceGP(space=t, kernel=g3.MAT32(t) + g3.OU(t),
                             name="S")
        ss.observed(t, y)
        p = {k: jnp.asarray(v) for k, v in ss.params.items()}
        dt = jnp.concatenate([jnp.zeros(1, jnp.float32),
                              jnp.diff(jnp.asarray(t[:, 0]))])
        yj = jnp.asarray(y)
        r = jnp.float32(0.2)
        obs = jnp.asarray(rng.random(n) > 0.15)

        def mat(pp):
            return ssm_blocks(ss._leaves, pp, dt)

        a, q, pinf, h = mat(p)
        nll_plain, _, _ = parallel_kalman_nll(a, q, h, r, yj, obs)
        for chunk in (128, 200, 1024):
            nll_f = chunked_kalman_nll(
                None, None, h, r, yj, obs, chunk=chunk,
                blocks_fn=lambda d: ssm_blocks(
                    ss._leaves, p, d, stationary_first=False)[:2],
                dt=dt, pinf=pinf)
            np.testing.assert_allclose(float(nll_f), float(nll_plain),
                                       rtol=2e-6)

        # gradient w.r.t. the actual kernel hypers flows through the
        # per-block construction identically
        def f_plain(pp):
            aa, qq, _pi, hh = mat(pp)
            nll, _, _ = parallel_kalman_nll(aa, qq, hh, r, yj, obs)
            return nll

        def f_fly(pp):
            _a0, _q0, pi, hh = ssm_blocks(ss._leaves, pp,
                                          jnp.zeros(1, jnp.float32))
            return chunked_kalman_nll(
                None, None, hh, r, yj, obs, chunk=128,
                blocks_fn=lambda d: ssm_blocks(
                    ss._leaves, pp, d, stationary_first=False)[:2],
                dt=dt, pinf=pi)

        g1 = jax.grad(lambda pp: f_plain(pp))(p)
        g2 = jax.grad(lambda pp: f_fly(pp))(p)
        for k in g1:
            np.testing.assert_allclose(np.asarray(g2[k]),
                                       np.asarray(g1[k]),
                                       rtol=2e-4, atol=1e-5)

        # smoother projections
        from g3py_tpu.ops.ssm import chunked_smoother_diag
        m_f, p_f = parallel_kalman_filter(a, q, h, r, yj, obs)
        m_s, p_s = parallel_smoother(a, q, m_f, p_f)
        mean_p = np.asarray(jnp.sum(m_s * h, axis=-1))
        var_p = np.asarray(jnp.sum(jnp.sum(p_s * h, axis=-1) * h,
                                   axis=-1))
        for chunk in (128, 200):
            mean_c, var_c = chunked_smoother_diag(
                None, None, h, r, yj, obs, chunk=chunk,
                blocks_fn=lambda d: ssm_blocks(
                    ss._leaves, p, d, stationary_first=False)[:2],
                dt=dt, pinf=pinf)
            np.testing.assert_allclose(np.asarray(mean_c), mean_p,
                                       atol=2e-4)
            np.testing.assert_allclose(np.asarray(var_c), var_p,
                                       atol=2e-4)

    def test_model_routes_through_chunked_path(self, rng):
        """StateSpaceGP.loglike above settings.ssm_chunk_threshold ==
        the plain-path value (same params, threshold toggled)."""
        from g3py_tpu.config import settings
        n = 300
        t = np.sort(rng.uniform(0, 40, n)).reshape(-1, 1).astype(
            np.float32)
        y = (np.sin(t[:, 0]) + 0.1 * rng.standard_normal(n)).astype(
            np.float32)
        ss = g3.StateSpaceGP(space=t, kernel=g3.MAT52(t), name="S")
        ss.observed(t, y)
        p = ss.params
        ll_plain = float(ss.loglike(p))
        old_thr, old_chunk = settings.ssm_chunk_threshold, settings.ssm_chunk
        try:
            settings.ssm_chunk_threshold, settings.ssm_chunk = 100, 128
            ss2 = g3.StateSpaceGP(space=t, kernel=g3.MAT52(t), name="S2")
            ss2.observed(t, y)
            p2 = {k.replace("S2", "S", 1): v for k, v in ss2.params.items()}
            assert set(p2) == set(p)
            ll_chunk = float(ss2.loglike(ss2.params))
            g = np.asarray(ss2.dlogp(ss2.params))
        finally:
            settings.ssm_chunk_threshold = old_thr
            settings.ssm_chunk = old_chunk
        np.testing.assert_allclose(ll_chunk, ll_plain, rtol=2e-5)
        assert np.all(np.isfinite(g))

    def test_chunked_smoother_matches_plain(self, rng):
        """chunked_smoother_diag (O(chunk)-memory two-pass smoother) ==
        the plain filter+smoother's H-projections, including masked
        (prediction-only) rows, across dividing/non-dividing/oversized
        chunk sizes."""
        from g3py_tpu.ops.ssm import chunked_smoother_diag
        n, s = 600, 3
        a = jnp.asarray(rng.standard_normal((n, s, s)) * 0.3)
        L = rng.standard_normal((n, s, s)) * 0.5
        q = jnp.asarray(np.einsum("nij,nkj->nik", L, L)
                        + 0.1 * np.eye(s), jnp.float32)
        h = jnp.asarray(rng.standard_normal(s), jnp.float32)
        r = jnp.float32(0.3)
        y = jnp.asarray(rng.standard_normal(n), jnp.float32)
        obs = jnp.asarray(rng.random(n) > 0.15)
        _nll, m_f, p_f = parallel_kalman_nll(a, q, h, r, y, obs)
        m_s, p_s = parallel_smoother(a, q, m_f, p_f)
        mean_p = np.asarray(jnp.sum(m_s * h, axis=-1))
        var_p = np.asarray(jnp.sum(jnp.sum(p_s * h, axis=-1) * h,
                                   axis=-1))
        for chunk in (64, 150, 600, 4096):
            mean_c, var_c = chunked_smoother_diag(a, q, h, r, y, obs,
                                                  chunk=chunk)
            np.testing.assert_allclose(np.asarray(mean_c), mean_p,
                                       atol=5e-5)
            np.testing.assert_allclose(np.asarray(var_c), var_p,
                                       atol=5e-5)

    def test_sharded_nll_matches_plain(self, rng):
        """StateSpaceGP.nll_distributed (time-axis-sharded monoid scan,
        8-device mesh) == -loglike, value AND gradient, at an n that
        does NOT divide over the mesh (identity-element pad path)."""
        n = 601
        t = np.sort(rng.uniform(0, 60, n)).reshape(-1, 1).astype(
            np.float32)
        y = (np.sin(t[:, 0]) + 0.1 * rng.standard_normal(n)).astype(
            np.float32)
        ss = g3.StateSpaceGP(space=t, kernel=g3.MAT52(t) + g3.OU(t),
                             name="SHD")
        ss.observed(t, y)
        p = ss.params
        v_plain = -float(ss.loglike(p))
        v_shard = float(ss.nll_distributed(p))
        np.testing.assert_allclose(v_shard, v_plain, rtol=1e-5)

        reg = ss.active
        pure = ss._logp_pure(prior=False)
        xj, yj = jnp.asarray(t), jnp.asarray(y)
        vec0 = jnp.zeros(0, jnp.float32)
        u = jnp.asarray(reg.dict_to_array(p))
        g1 = np.asarray(jax.grad(
            lambda w: -pure(reg.array_to_dict_jax(w), xj, xj, yj,
                            vec0))(u))
        g2 = np.asarray(jax.grad(
            lambda w: ss.nll_distributed(reg.array_to_dict_jax(w)))(u))
        np.testing.assert_allclose(g2, g1, rtol=1e-4,
                                   atol=1e-5 * np.max(np.abs(g1)))

    def test_find_map_distributed_improves(self, rng):
        """find_MAP(engine='distributed') on the state-space GP: a few
        L-BFGS steps over the sharded objective improve the logp."""
        n = 256
        t = np.sort(rng.uniform(0, 40, n)).reshape(-1, 1).astype(
            np.float32)
        y = (np.sin(t[:, 0]) + 0.1 * rng.standard_normal(n)).astype(
            np.float32)
        ss = g3.StateSpaceGP(space=t, kernel=g3.MAT32(t), name="SHM")
        ss.observed(t, y)
        lp0 = float(ss.logp(ss.params))
        p = ss.find_MAP(engine="distributed", points=1, max_iters=15,
                        display=False)
        lp1 = float(ss.logp(p))
        assert np.isfinite(lp1) and lp1 > lp0

    def test_small_inv_matches_numpy(self, rng):
        for s in (1, 2, 3, 7):
            base = rng.standard_normal((32, s, s)).astype(np.float32)
            # the combine matrices are I + (PSD)(PSD): build that shape
            psd1 = np.einsum("nij,nkj->nik", base, base)
            m = np.eye(s, dtype=np.float32)[None] + 0.1 * psd1
            np.testing.assert_allclose(np.asarray(small_inv(jnp.asarray(m))),
                                       np.linalg.inv(m), atol=2e-4)

    def test_periodic_coefficients_are_bessel(self):
        from scipy import special

        for r in (0.3, 1.0, 5.0, 20.0):
            c = np.asarray(periodic_coefficients(r, 10))
            expect = special.ive(np.arange(11), r)   # e^{-r} I_j(r)
            expect[1:] *= 2.0
            np.testing.assert_allclose(c, expect, rtol=2e-4, atol=1e-7)
        # the expansion sums to k(0)/v = 1 once the tail is negligible
        assert abs(float(np.sum(np.asarray(
            periodic_coefficients(1.0, 12)))) - 1.0) < 1e-6

    def test_ssm_leaves_rejects_non_markovian(self):
        t = np.linspace(0, 1, 8).reshape(-1, 1).astype(np.float32)
        with pytest.raises(ValueError, match="state-space"):
            ssm_leaves(g3.RQ(t))
        leaves = ssm_leaves(g3.MAT32(t) + (g3.OU(t) + g3.MAT52(t)))
        assert [lf.family for lf in leaves] == ["mat32", "ou", "mat52"]
        assert sum(lf.dim for lf in leaves) == 6
        # products compose by Kronecker, periodic by harmonics
        leaves = ssm_leaves(g3.SIN(t) * g3.MAT32(t), harmonics=5)
        assert leaves[0].dim == (1 + 2 * 5) * 2


class TestPeriodic:
    """COS (exact rotation state), SIN (truncated Bessel-cosine
    expansion) and quasi-periodic products vs the dense oracle."""

    @pytest.fixture(autouse=True)
    def _fresh_compile_cache(self):
        """The harmonics=10 cases compile state-dim-21..42 Kalman scans;
        the XLA CPU compiler SEGFAULTS compiling them once the process
        has accumulated a long tail of resident programs (reproduced 3x
        in full-suite runs, at this exact test, never solo — the
        round-11 clear-per-module mitigation is not enough here).
        Clearing per test keeps the compiler healthy at a ~1 min
        recompile cost."""
        jax.clear_caches()
        yield

    CASES = {
        "cos": lambda t: (lambda: g3.COS(t)),
        "sin": lambda t: (lambda: g3.SIN(t)),
        "quasi": lambda t: (lambda: g3.SIN(t) * g3.MAT32(t)),
        "cos_ou_plus_mat52": lambda t: (
            lambda: g3.COS(t) * g3.OU(t) + g3.MAT52(t)),
    }

    @pytest.mark.parametrize("which", list(CASES))
    def test_matches_dense(self, rng, which):
        n = 96
        t = np.sort(rng.uniform(0, 10, n)).reshape(-1, 1).astype(
            np.float32)
        y = (np.sin(2 * np.pi * t[:, 0] / 3.0)
             + 0.1 * rng.standard_normal(n)).astype(np.float32)
        kf = self.CASES[which](t)
        ss = g3.StateSpaceGP(space=t, kernel=kf(), name="S", harmonics=10)
        dn = g3.GP(space=t, kernel=kf(), noisy=True, name="S")
        ss.observed(t, y)
        dn.observed(t, y)
        assert set(ss.params) == set(dn.params)
        p = ss.params
        l_ss, l_d = float(ss.loglike(p)), float(dn.loglike(p))
        assert abs(l_ss - l_d) < 2e-4 * max(1.0, abs(l_d))
        np.testing.assert_allclose(np.asarray(ss.mean(p, space=t)),
                                   np.asarray(dn.mean(p, space=t)),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(ss.variance(p, space=t)),
                                   np.asarray(dn.variance(p, space=t)),
                                   atol=2e-4)

    def test_harmonics_truncation_converges(self, rng):
        """More harmonics -> closer to the dense exp-sin^2 kernel;
        J >= r + 8 leaves the tail below f32 resolution."""
        n = 48
        t = np.sort(rng.uniform(0, 6, n)).reshape(-1, 1).astype(np.float32)
        y = (np.sin(2 * np.pi * t[:, 0])
             + 0.1 * rng.standard_normal(n)).astype(np.float32)
        dn = g3.GP(space=t, kernel=g3.SIN(t), noisy=True, name="S")
        dn.observed(t, y)
        p = dn.params
        l_d = float(dn.loglike(p))
        errs = []
        for J in (2, 4, 10):
            ss = g3.StateSpaceGP(space=t, kernel=g3.SIN(t), name="S",
                                 harmonics=J)
            ss.observed(t, y)
            errs.append(abs(float(ss.loglike(p)) - l_d))
        assert errs[2] <= errs[1] <= errs[0] + 1e-5
        assert errs[2] < 1e-3


class TestSE:
    """SE kernel's Taylor state-space approximation (ops/ssm.SELeaf):
    the one non-exact leaf — errors must sit at the documented order-
    dependent bounds (9.1e-4 var at order 8, shrinking ~5x per +2), and
    the model surface must carry it like any exact leaf."""

    def test_blocks_reproduce_kernel_curve(self, rng):
        from g3py_tpu.ops.ssm import SELeaf
        from g3py_tpu.hypers import hval

        t, y = _series(rng)
        ss = g3.StateSpaceGP(space=t, kernel=g3.SE(t), name="SEK")
        ss.observed(t, y)
        p = {k: jnp.asarray(v) for k, v in ss.params.items()}
        leaf = ss._leaves[0]
        assert isinstance(leaf, SELeaf) and leaf.dim == 8
        v = float(np.asarray(hval(leaf.kernel.var, p)).reshape(()))
        r = float(np.asarray(hval(leaf.kernel.metric.rate, p)).reshape(()))
        taus = np.linspace(0.0, 4.0 / r, 80).astype(np.float32)
        # doc bound + f32 slack; order 12 is EXCLUDED on purpose — its
        # eigen constants reach 2.5e5 and f32 cancellation (~1.6e-3)
        # swamps the 4.7e-5 method error (order 10 is the f32 ceiling)
        bounds = {6: 4.8e-3, 8: 1.2e-3, 10: 3.5e-4}
        errs = {}
        for order in bounds:
            lf = SELeaf(leaf.kernel, order)
            a, pinf, _h = lf.blocks(p, jnp.asarray(taus))
            k_ss = np.asarray(a)[:, 0, :] @ np.asarray(pinf)[:, 0]
            k_true = v * np.exp(-0.5 * (r * taus) ** 2)
            errs[order] = np.abs(k_ss - k_true).max() / v
            assert errs[order] < bounds[order], (order, errs[order])
        assert errs[10] < errs[8] < errs[6]
        # Q = Pinf - A Pinf A' stays PSD to f32 tolerance (the filter's
        # stability relies on it; the balanced realization keeps the
        # cancellation error ~1e-4 of var)
        a, q, pinf, h = ssm_blocks(ss._leaves, p,
                                   jnp.asarray(np.maximum(taus, 1e-4)),
                                   stationary_first=False)
        mineig = min(np.linalg.eigvalsh(
            0.5 * (qk + qk.T)).min() for qk in np.asarray(q))
        assert mineig > -2e-3 * v

    def test_matches_dense_and_orders_converge(self, rng):
        from g3py_tpu.config import settings

        t, y = _series(rng, n=96)
        ss, dn = _pair(t, lambda: g3.SE(t))
        ss.observed(t, y)
        dn.observed(t, y)
        assert set(ss.params) == set(dn.params)
        p = ss.params
        l_d = float(dn.loglike(p))
        err8 = abs(float(ss.loglike(p)) - l_d)
        assert err8 < 1e-3 * max(1.0, abs(l_d))
        np.testing.assert_allclose(np.asarray(ss.dlogp(p)),
                                   np.asarray(dn.dlogp(p)),
                                   rtol=2e-2, atol=2e-2)
        # posterior moments carry the same approximation quality
        tq = np.linspace(-1, 11, 25).reshape(-1, 1).astype(np.float32)
        np.testing.assert_allclose(np.asarray(ss.mean(p, space=tq)),
                                   np.asarray(dn.mean(p, space=tq)),
                                   atol=5e-3)
        np.testing.assert_allclose(np.asarray(ss.variance(p, space=tq)),
                                   np.asarray(dn.variance(p, space=tq)),
                                   atol=5e-3)
        # raising the order tightens the NLL toward the dense value
        # (10 is the f32 ceiling — see test_blocks_reproduce_kernel_curve)
        old = settings.ssm_se_order
        try:
            settings.ssm_se_order = 10
            ss10 = g3.StateSpaceGP(space=t, kernel=g3.SE(t), name="S")
            ss10.observed(t, y)
            err10 = abs(float(ss10.loglike(p)) - l_d)
        finally:
            settings.ssm_se_order = old
        assert err10 < 0.5 * err8 + 1e-6

    def test_spectral_mixture_matches_dense(self, rng):
        """SM (SE envelope x cosine) carries SELeaf's order-8 accuracy;
        a 2-component mixture (kernel sum) rides the block-diagonal
        stack."""
        t, y = _series(rng, n=90)
        ss, dn = _pair(t, lambda: g3.SM(t))
        ss.observed(t, y)
        dn.observed(t, y)
        assert set(ss.params) == set(dn.params)
        p = ss.params
        l_d = float(dn.loglike(p))
        assert abs(float(ss.loglike(p)) - l_d) < 2e-3 * max(1.0, abs(l_d))
        tq = np.linspace(0, 10, 20).reshape(-1, 1).astype(np.float32)
        np.testing.assert_allclose(np.asarray(ss.mean(p, space=tq)),
                                   np.asarray(dn.mean(p, space=tq)),
                                   atol=5e-3)
        ss2 = g3.StateSpaceGP(space=t, kernel=g3.SM(t, name="A")
                              + g3.SM(t, name="B"), name="S2")
        ss2.observed(t, y)
        assert ss2._leaves[0].dim == 16 and len(ss2._leaves) == 2
        assert np.isfinite(float(ss2.loglike(ss2.params)))
        assert np.all(np.isfinite(np.asarray(ss2.dlogp(ss2.params))))
