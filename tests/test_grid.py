"""GridGP: exact Kronecker grid GP vs the dense product-kernel oracle.

The oracle is built from the model's OWN per-axis grams (np.kron +
float64 dense algebra), so these tests pin the Kronecker solver and the
analytic eigh-free custom-VJP backward (ops/kron.py), not the kernel
zoo (covered in test_hypers/test_zoo)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import g3py_tpu as g3
from g3py_tpu.config import settings


@pytest.fixture(scope="module")
def grid_model():
    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(0, 6, 11)).astype(np.float32)
    x = np.sort(rng.uniform(-2, 2, 7)).astype(np.float32)
    rows = g3.grid_rows([t, x])
    n = rows.shape[0]
    f = np.sin(rows[:, 0]) * np.exp(-0.3 * rows[:, 1] ** 2)
    y = (f + 0.1 * rng.standard_normal(n)).astype(np.float32)
    gp = g3.GridGP(axes=[t, x],
                   kernel=[g3.MAT32(t[:, None]), g3.SE(x[:, None])],
                   name="TGrid")
    gp.observed(rows, y)
    return gp, t, x, rows, y


def _dense_pieces(gp, t, x, params):
    pj = {k: jnp.asarray(v) for k, v in params.items()}
    k1 = np.asarray(gp.f_kernels[0].cov(pj, jnp.asarray(t[:, None])),
                    np.float64)
    k2 = np.asarray(gp.f_kernels[1].cov(pj, jnp.asarray(x[:, None])),
                    np.float64)
    s2 = float(np.asarray(gp._noise_var(pj)))
    big = np.kron(k1, k2) + s2 * np.eye(k1.shape[0] * k2.shape[0])
    return pj, big


class TestGridNLL:
    def test_loglike_matches_dense_oracle(self, grid_model):
        gp, t, x, rows, y = grid_model
        _pj, big = _dense_pieces(gp, t, x, gp.params)
        sign, logdet = np.linalg.slogdet(big)
        assert sign > 0
        alpha = np.linalg.solve(big, y.astype(np.float64))
        ll_dense = -0.5 * (logdet + y @ alpha
                           + len(y) * np.log(2 * np.pi))
        ll = float(gp.loglike(gp.params))
        assert abs(ll - ll_dense) < 2e-5 * abs(ll_dense)

    def test_grad_matches_dense_autodiff(self, grid_model):
        gp, t, x, rows, y = grid_model
        pj = {k: jnp.asarray(v) for k, v in gp.params.items()}
        n = rows.shape[0]

        def dense_nll(params):
            k1 = gp.f_kernels[0].cov(params, jnp.asarray(t[:, None]))
            k2 = gp.f_kernels[1].cov(params, jnp.asarray(x[:, None]))
            s = jnp.kron(k1, k2) + gp._noise_var(params) * jnp.eye(n)
            lo = jnp.linalg.cholesky(s)
            a = jax.scipy.linalg.cho_solve((lo, True), jnp.asarray(y))
            return (0.5 * (jnp.asarray(y) @ a)
                    + jnp.sum(jnp.log(jnp.diagonal(lo)))
                    + 0.5 * n * np.log(2 * np.pi))

        fn = gp.th_loglike_fn()
        g_kron = jax.grad(lambda p: -fn(p, None, jnp.asarray(rows),
                                        jnp.asarray(y)))(pj)
        g_dense = jax.grad(dense_nll)(pj)
        for k in g_dense:
            gd = np.asarray(g_dense[k])
            gk = np.asarray(g_kron[k])
            assert np.allclose(gd, gk, rtol=5e-4, atol=5e-4), k

    def test_row_order_invariance(self, grid_model):
        gp, t, x, rows, y = grid_model
        rng = np.random.default_rng(3)
        perm = rng.permutation(rows.shape[0])
        gp2 = g3.GridGP(kernel=[g3.MAT32(t[:, None]), g3.SE(x[:, None])],
                        space=rows[perm], name="TGridP")
        gp2.observed(rows[perm], y[perm])
        p2 = {k.replace("TGrid_", "TGridP_"): v
              for k, v in gp.params.items()}
        assert float(gp2.loglike(p2)) == pytest.approx(
            float(gp.loglike(gp.params)), rel=1e-5)

    def test_1d_grid_equals_dense_family(self):
        rng = np.random.default_rng(4)
        tt = np.sort(rng.uniform(0, 5, 40)).astype(np.float32)[:, None]
        yy = (np.sin(tt[:, 0])
              + 0.1 * rng.standard_normal(40)).astype(np.float32)
        g1 = g3.GridGP(axes=[tt[:, 0]], kernel=[g3.SE(tt)], name="TG1")
        g1.observed(tt, yy)
        dn = g3.GP(space=tt, kernel=g3.SE(tt), noisy=True, name="TD1")
        dn.observed(tt, yy)
        pd = {k.replace("TG1_", "TD1_"): v for k, v in g1.params.items()}
        assert float(g1.loglike(g1.params)) == pytest.approx(
            float(dn.loglike(pd)), rel=1e-5)

    def test_duplicate_rows_raise(self, grid_model):
        gp, t, x, rows, y = grid_model
        dup = np.concatenate([rows, rows[:1]])
        yd = np.concatenate([y, y[:1]])
        bad = g3.GridGP(kernel=[g3.MAT32(t[:, None]), g3.SE(x[:, None])],
                        space=dup, name="TGridB")
        with pytest.raises(ValueError, match="complete grid"):
            bad.observed(dup, yd)


class TestGridPosterior:
    def test_moments_match_dense(self, grid_model):
        gp, t, x, rows, y = grid_model
        pj, big = _dense_pieces(gp, t, x, gp.params)
        xq = np.stack([np.linspace(0.5, 5.5, 9),
                       np.linspace(-1.5, 1.5, 9)], axis=1).astype(
            np.float32)
        c1 = np.asarray(gp.f_kernels[0].cov(
            pj, jnp.asarray(xq[:, :1]), jnp.asarray(t[:, None])),
            np.float64)
        c2 = np.asarray(gp.f_kernels[1].cov(
            pj, jnp.asarray(xq[:, 1:2]), jnp.asarray(x[:, None])),
            np.float64)
        ks = (c1[:, :, None] * c2[:, None, :]).reshape(9, -1)
        m_d = ks @ np.linalg.solve(big, y.astype(np.float64))
        kd = (np.diag(np.asarray(gp.f_kernels[0].cov(
            pj, jnp.asarray(xq[:, :1])), np.float64))
            * np.diag(np.asarray(gp.f_kernels[1].cov(
                pj, jnp.asarray(xq[:, 1:2])), np.float64)))
        v_d = kd - np.sum(ks * np.linalg.solve(big, ks.T).T, axis=1)
        m = np.asarray(gp.mean(gp.params, xq))
        v = np.asarray(gp.variance(gp.params, xq))
        assert np.allclose(m, m_d, rtol=1e-4, atol=1e-5)
        assert np.allclose(v, v_d, rtol=1e-4, atol=1e-5)
        # covariance statistic (chunked Khatri-Rao path)
        kqq = (np.asarray(gp.f_kernels[0].cov(pj, jnp.asarray(
            xq[:, :1])), np.float64)
            * np.asarray(gp.f_kernels[1].cov(pj, jnp.asarray(
                xq[:, 1:2])), np.float64))
        cv_d = kqq - ks @ np.linalg.solve(big, ks.T)
        cv = np.asarray(gp.covariance(gp.params, xq))
        assert np.allclose(cv, cv_d, rtol=1e-4, atol=1e-5)

    def test_logpredictive_and_quantiles(self, grid_model):
        gp, t, x, rows, y = grid_model
        lp = float(gp.logpredictive(gp.params, space=rows[:20],
                                    vector=y[:20]))
        assert np.isfinite(lp)
        qlo = gp.quantiler(gp.params, rows[:10], q=0.1)
        qhi = gp.quantiler(gp.params, rows[:10], q=0.9)
        assert np.all(qlo <= qhi)

    def test_sampler_matches_posterior_moments(self, grid_model):
        gp, t, x, rows, y = grid_model
        xq = np.stack([np.linspace(1.0, 5.0, 6),
                       np.linspace(-1.0, 1.0, 6)], axis=1).astype(
            np.float32)
        m = np.asarray(gp.mean(gp.params, xq))
        cv = np.asarray(gp.covariance(gp.params, xq))
        fs = gp.sampler(gp.params, xq, samples=4000, seed=1)
        assert fs.shape == (6, 4000)
        sd = np.sqrt(np.maximum(np.diag(cv), 1e-12))
        assert np.max(np.abs(fs.mean(1) - m) / np.maximum(sd, 1e-3)) < 0.2
        assert np.max(np.abs(np.cov(fs) - cv)) < 5e-3

    def test_prior_statistics(self, grid_model):
        gp, t, x, rows, y = grid_model
        vp = np.asarray(gp.variance(gp.params, rows[:5], prior=True))
        pj = {k: jnp.asarray(v) for k, v in gp.params.items()}
        k1v = float(np.asarray(gp.f_kernels[0].cov(
            pj, jnp.asarray(rows[:1, :1]))))
        k2v = float(np.asarray(gp.f_kernels[1].cov(
            pj, jnp.asarray(rows[:1, 1:2]))))
        assert vp[0] == pytest.approx(k1v * k2v, rel=1e-5)
        fs = gp.sampler(gp.params, rows[:6], samples=2000, seed=2,
                        prior=True)
        assert np.isfinite(fs).all()


class TestGridTraining:
    def test_find_map_improves_and_recovers(self):
        rng = np.random.default_rng(1)
        t = np.linspace(0, 8, 24).astype(np.float32)
        x = np.linspace(-2, 2, 16).astype(np.float32)
        rows = g3.grid_rows([t, x])
        tt, xx = np.meshgrid(t, x, indexing="ij")
        f = np.sin(tt) * np.exp(-0.5 * xx ** 2)
        y = (f.ravel() + 0.1 * rng.standard_normal(
            rows.shape[0])).astype(np.float32)
        gp = g3.GridGP(axes=[t, x],
                       kernel=[g3.MAT52(t[:, None]), g3.SE(x[:, None])],
                       name="TGridT")
        gp.observed(rows, y)
        ll0 = float(gp.loglike(gp.params))
        p = gp.find_MAP(points=2, display=False)
        ll1 = float(gp.loglike(p))
        assert ll1 > ll0 + 10
        m = np.asarray(gp.mean(p, rows))
        rmse = float(np.sqrt(np.mean((m - f.ravel()) ** 2)))
        assert rmse < 0.06
        sc = gp.scores(p, hidden=y, variance=True)
        assert np.isfinite(sc["_rmse"]) and np.isfinite(sc["_l2"])

    def test_sample_hypers_runs(self, grid_model):
        gp, t, x, rows, y = grid_model
        dt = gp.sample_hypers(start=gp.params, samples=40, chains=6,
                              seed=0)
        assert len(dt) == 40 * 6


class TestMaskedGrid:
    """Incomplete grids: the matrix-free masked-Kronecker path
    (ops/kron.masked_kron_nll / masked_cross_solve) vs the dense oracle
    restricted to the observed cells."""

    @pytest.fixture(scope="class")
    def masked_model(self):
        rng = np.random.default_rng(0)
        t = np.sort(rng.uniform(0, 6, 12)).astype(np.float32)
        x = np.sort(rng.uniform(-2, 2, 9)).astype(np.float32)
        rows = g3.grid_rows([t, x])
        n = rows.shape[0]
        f = np.sin(rows[:, 0]) * np.exp(-0.3 * rows[:, 1] ** 2)
        y = (f + 0.1 * rng.standard_normal(n)).astype(np.float32)
        keep = np.sort(rng.choice(n, int(0.7 * n), replace=False))
        gp = g3.GridGP(axes=[t, x],
                       kernel=[g3.MAT32(t[:, None]), g3.SE(x[:, None])],
                       masked_probes=16, masked_lanczos=30, name="TMG")
        gp.observed(rows[keep], y[keep])
        return gp, t, x, rows, y, keep

    def _dense_obs(self, gp, t, x, keep):
        pj = {k: jnp.asarray(v) for k, v in gp.params.items()}
        k1 = np.asarray(gp.f_kernels[0].cov(pj, jnp.asarray(t[:, None])),
                        np.float64)
        k2 = np.asarray(gp.f_kernels[1].cov(pj, jnp.asarray(x[:, None])),
                        np.float64)
        s2 = float(np.asarray(gp._noise_var(pj)))
        return (np.kron(k1, k2)[np.ix_(keep, keep)]
                + s2 * np.eye(len(keep))), pj

    def test_masked_loglike_matches_dense(self, masked_model):
        gp, t, x, rows, y, keep = masked_model
        big, _pj = self._dense_obs(gp, t, x, keep)
        yo = y[keep].astype(np.float64)
        sign, logdet = np.linalg.slogdet(big)
        ll_d = -0.5 * (logdet + yo @ np.linalg.solve(big, yo)
                       + len(keep) * np.log(2 * np.pi))
        ll = float(gp.loglike(gp.params))
        assert abs(ll - ll_d) < 1e-4 * abs(ll_d)

    def test_masked_grad_tracks_dense(self, masked_model):
        """Stochastic-trace gradients (BBMM): sign + magnitude agreement
        with the dense autodiff gradient (the estimator has O(1/sqrt(
        probes)) noise by construction — same bar as nll_iterative)."""
        gp, t, x, rows, y, keep = masked_model
        pj = {k: jnp.asarray(v) for k, v in gp.params.items()}
        yo = y[keep]
        nk = len(keep)
        kp = jnp.asarray(keep)

        def dense_nll(params):
            k1 = gp.f_kernels[0].cov(params, jnp.asarray(t[:, None]))
            k2 = gp.f_kernels[1].cov(params, jnp.asarray(x[:, None]))
            s = (jnp.kron(k1, k2)[jnp.ix_(kp, kp)]
                 + gp._noise_var(params) * jnp.eye(nk))
            lo = jnp.linalg.cholesky(s)
            a = jax.scipy.linalg.cho_solve((lo, True), jnp.asarray(yo))
            return (0.5 * (jnp.asarray(yo) @ a)
                    + jnp.sum(jnp.log(jnp.diagonal(lo)))
                    + 0.5 * nk * np.log(2 * np.pi))

        fn = gp.th_loglike_fn()
        gk = jax.grad(lambda p: -fn(p, None, jnp.asarray(rows[keep]),
                                    jnp.asarray(yo)))(pj)
        gd = jax.grad(dense_nll)(pj)
        for k in gd:
            a_ = np.asarray(gd[k]).ravel()
            b_ = np.asarray(gk[k]).ravel()
            denom = np.maximum(np.abs(a_), 1.0)
            assert np.all(np.abs(a_ - b_) / denom < 0.15), (k, a_, b_)

    def test_masked_moments_covariance_match_dense(self, masked_model):
        gp, t, x, rows, y, keep = masked_model
        big, pj = self._dense_obs(gp, t, x, keep)
        yo = y[keep].astype(np.float64)
        xq = np.stack([np.linspace(0.5, 5.5, 7),
                       np.linspace(-1.5, 1.5, 7)], axis=1).astype(
            np.float32)
        c1 = np.asarray(gp.f_kernels[0].cov(
            pj, jnp.asarray(xq[:, :1]), jnp.asarray(t[:, None])),
            np.float64)
        c2 = np.asarray(gp.f_kernels[1].cov(
            pj, jnp.asarray(xq[:, 1:2]), jnp.asarray(x[:, None])),
            np.float64)
        ks = (c1[:, :, None] * c2[:, None, :]).reshape(
            7, -1)[:, keep]
        alpha = np.linalg.solve(big, yo)
        m_d = ks @ alpha
        kd = (np.diag(np.asarray(gp.f_kernels[0].cov(
            pj, jnp.asarray(xq[:, :1])), np.float64))
            * np.diag(np.asarray(gp.f_kernels[1].cov(
                pj, jnp.asarray(xq[:, 1:2])), np.float64)))
        v_d = kd - np.sum(ks * np.linalg.solve(big, ks.T).T, axis=1)
        m = np.asarray(gp.mean(gp.params, xq))
        v = np.asarray(gp.variance(gp.params, xq))
        assert np.allclose(m, m_d, rtol=1e-3, atol=1e-4)
        assert np.allclose(v, v_d, rtol=1e-3, atol=1e-4)
        kqq = (np.asarray(gp.f_kernels[0].cov(pj, jnp.asarray(
            xq[:, :1])), np.float64)
            * np.asarray(gp.f_kernels[1].cov(pj, jnp.asarray(
                xq[:, 1:2])), np.float64))
        cv_d = kqq - ks @ np.linalg.solve(big, ks.T)
        cv = np.asarray(gp.covariance(gp.params, xq))
        assert np.allclose(cv, cv_d, rtol=1e-3, atol=1e-4)

    def test_masked_sampler_matches_moments(self, masked_model):
        gp, t, x, rows, y, keep = masked_model
        xq = np.stack([np.linspace(1.0, 5.0, 5),
                       np.linspace(-1.0, 1.0, 5)], axis=1).astype(
            np.float32)
        m = np.asarray(gp.mean(gp.params, xq))
        cv = np.asarray(gp.covariance(gp.params, xq))
        fs = gp.sampler(gp.params, xq, samples=3000, seed=1)
        sd = np.sqrt(np.maximum(np.diag(cv), 1e-12))
        assert np.max(np.abs(fs.mean(1) - m) / np.maximum(sd, 1e-3)) < 0.2
        assert np.max(np.abs(np.cov(fs) - cv)) < 6e-3

    def test_masked_find_map_trains(self):
        rng = np.random.default_rng(5)
        t = np.linspace(0, 8, 20).astype(np.float32)
        x = np.linspace(-2, 2, 14).astype(np.float32)
        rows = g3.grid_rows([t, x])
        n = rows.shape[0]
        f = np.sin(rows[:, 0]) * np.exp(-0.5 * rows[:, 1] ** 2)
        y = (f + 0.1 * rng.standard_normal(n)).astype(np.float32)
        keep = np.sort(rng.choice(n, int(0.6 * n), replace=False))
        gp = g3.GridGP(axes=[t, x],
                       kernel=[g3.MAT52(t[:, None]), g3.SE(x[:, None])],
                       masked_probes=16, name="TMGT")
        gp.observed(rows[keep], y[keep])
        ll0 = float(gp.loglike(gp.params))
        p = gp.find_MAP(points=1, display=False, powell=False)
        ll1 = float(gp.loglike(p))
        assert ll1 > ll0 + 5
        # predict the HELD-OUT cells
        drop = np.setdiff1d(np.arange(n), keep)
        m = np.asarray(gp.mean(p, rows[drop]))
        rmse = float(np.sqrt(np.mean((m - f[drop]) ** 2)))
        assert rmse < 0.08


class TestGridDistributed:
    """GSPMD-sharded Kronecker NLL on the virtual 8-device mesh: complete
    grids shard the longest grid axis of the N-cell tensors (11 rows over
    8 devices — non-dividing, GSPMD pads internally); masked grids shard
    the observed rows (SKI-style data parallelism)."""

    def test_nll_distributed_matches_loglike(self, grid_model):
        gp, t, x, rows, y = grid_model
        ll = float(gp.loglike(gp.params))
        pj = {k: jnp.asarray(v) for k, v in gp.params.items()}
        nd = float(jax.jit(lambda p: gp.nll_distributed(p))(pj))
        assert abs(nd + ll) <= 1e-5 * abs(ll) + 1e-4

    def test_nll_distributed_grad_matches_plain(self, grid_model):
        gp, t, x, rows, y = grid_model
        pj = {k: jnp.asarray(v) for k, v in gp.params.items()}
        pure = gp.th_loglike_fn()
        xj, yj = jnp.asarray(rows), jnp.asarray(y)
        g_plain = jax.grad(lambda p: -pure(p, xj, xj, yj))(pj)
        g_shard = jax.jit(jax.grad(lambda p: gp.nll_distributed(p)))(pj)
        for k in g_plain:
            a, b = np.asarray(g_plain[k]), np.asarray(g_shard[k])
            np.testing.assert_allclose(b, a, rtol=5e-4, atol=5e-4)

    def test_nll_distributed_1d_grid(self):
        # regression (ADVICE r4): a 1-D complete grid has no tensor axis
        # other than the contraction axis, and _shard_cons used to raise
        # a bare StopIteration through GridGP.nll_distributed
        t = np.linspace(0, 6, 25).astype(np.float32)
        y = (np.sin(t) + 0.1 * np.random.default_rng(0)
             .standard_normal(25)).astype(np.float32)
        gp = g3.GridGP(axes=[t], kernel=[g3.MAT52(t[:, None])], name="TG1D")
        gp.observed(t[:, None], y)
        ll = float(gp.loglike(gp.params))
        pj = {k: jnp.asarray(v) for k, v in gp.params.items()}
        nd = float(jax.jit(lambda p: gp.nll_distributed(p))(pj))
        assert abs(nd + ll) <= 1e-5 * abs(ll) + 1e-4
        g = jax.jit(jax.grad(lambda p: gp.nll_distributed(p)))(pj)
        assert all(np.all(np.isfinite(np.asarray(v))) for v in g.values())

    def test_masked_nll_distributed_matches_loglike(self):
        rng = np.random.default_rng(0)
        t = np.sort(rng.uniform(0, 6, 12)).astype(np.float32)
        x = np.sort(rng.uniform(-2, 2, 9)).astype(np.float32)
        rows = g3.grid_rows([t, x])
        n = rows.shape[0]
        f = np.sin(rows[:, 0]) * np.exp(-0.3 * rows[:, 1] ** 2)
        y = (f + 0.1 * rng.standard_normal(n)).astype(np.float32)
        keep = np.sort(rng.choice(n, int(0.7 * n), replace=False))
        gp = g3.GridGP(axes=[t, x],
                       kernel=[g3.MAT32(t[:, None]), g3.SE(x[:, None])],
                       masked_probes=16, masked_lanczos=30, name="TMGD")
        gp.observed(rows[keep], y[keep])
        ll = float(gp.loglike(gp.params))
        pj = {k: jnp.asarray(v) for k, v in gp.params.items()}
        nd = float(jax.jit(lambda p: gp.nll_distributed(p))(pj))
        # same seed -> same SLQ probes; only collective f32 reduction
        # ordering differs
        assert abs(nd + ll) <= 1e-4 * abs(ll) + 1e-3
        g = jax.jit(jax.grad(lambda p: gp.nll_distributed(p)))(pj)
        assert all(np.all(np.isfinite(np.asarray(v))) for v in g.values())

    def test_find_map_distributed_engine(self):
        rng = np.random.default_rng(3)
        t = np.linspace(0, 6, 16).astype(np.float32)
        x = np.linspace(-2, 2, 8).astype(np.float32)
        rows = g3.grid_rows([t, x])
        n = rows.shape[0]
        f = np.sin(rows[:, 0]) * np.exp(-0.5 * rows[:, 1] ** 2)
        y = (f + 0.1 * rng.standard_normal(n)).astype(np.float32)
        gp = g3.GridGP(axes=[t, x],
                       kernel=[g3.MAT52(t[:, None]), g3.SE(x[:, None])],
                       name="TGD")
        gp.observed(rows, y)
        ll0 = float(gp.loglike(gp.params))
        p = gp.find_MAP(engine="distributed", points=1, display=False,
                        max_iters=40)
        assert float(gp.loglike(p)) > ll0 + 5
