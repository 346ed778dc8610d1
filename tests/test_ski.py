"""SKIGP (KISS-GP): structured kernel interpolation vs dense oracles.

Two oracles pin different things: (1) a dense rendering of the model's
OWN W K_uu W' gram (built from the model's taps) pins the matrix-free
solver/estimator stack to the SKI model it claims to compute; (2) rows
placed ON grid nodes make the cubic taps one-hot, so the SKI gram
equals the exact product kernel there and the model must match the
plain dense-gram NLL."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import g3py_tpu as g3
from g3py_tpu.config import settings


def _dense_w(idx, w, shape):
    """Dense (n, prod shape) interpolation matrix from stacked taps."""
    idxn, wn = np.asarray(idx), np.asarray(w, np.float64)
    d, n, _ = idxn.shape
    out = np.zeros((n, int(np.prod(shape))), np.float64)
    for r in range(n):
        block = np.ones((4,) * d)
        for i in range(d):
            sh = [1] * d
            sh[i] = 4
            block = block * wn[i, r].reshape(sh)
        flat = np.stack(np.meshgrid(*[idxn[i, r] for i in range(d)],
                                    indexing="ij"), 0).reshape(d, -1)
        np.add.at(out[r], np.ravel_multi_index(flat, shape), block.ravel())
    return out


@pytest.fixture(scope="module")
def ski_model():
    rng = np.random.default_rng(0)
    n = 120
    x = np.stack([rng.uniform(0, 6, n),
                  rng.uniform(-2, 2, n)], 1).astype(np.float32)
    f = np.sin(x[:, 0]) * np.exp(-0.3 * x[:, 1] ** 2)
    y = (f + 0.1 * rng.standard_normal(n)).astype(np.float32)
    gp = g3.SKIGP(kernel=[g3.MAT32(x[:, :1]), g3.SE(x[:, 1:2])],
                  grid_shape=[24, 20], ski_probes=16, ski_lanczos=30,
                  name="TSKI")
    gp.observed(x, y)
    return gp, x, y, f


def _ski_oracle(gp, x, extra_rows=None):
    """Dense (K, W, Kuu, s2) of the model's own SKI gram (float64)."""
    pj = {k: jnp.asarray(v) for k, v in gp.params.items()}
    shape = gp._grid_shape()
    idx, w = gp._taps(jnp.asarray(x, settings.dtype))
    wd = _dense_w(idx, w, shape)
    ks = [np.asarray(g, np.float64) for g in gp._grams(pj)]
    kuu = ks[0]
    for k in ks[1:]:
        kuu = np.kron(kuu, k)
    s2 = float(np.asarray(gp._noise_var(pj)))
    big = wd @ kuu @ wd.T + s2 * np.eye(x.shape[0])
    return big, wd, kuu, s2, pj


class TestSKINLL:
    def test_loglike_matches_dense_ski_oracle(self, ski_model):
        gp, x, y, _f = ski_model
        big, _wd, _kuu, _s2, _pj = _ski_oracle(gp, x)
        sign, logdet = np.linalg.slogdet(big)
        assert sign > 0
        yo = y.astype(np.float64)
        ll_d = -0.5 * (logdet + yo @ np.linalg.solve(big, yo)
                       + len(y) * np.log(2 * np.pi))
        ll = float(gp.loglike(gp.params))
        assert abs(ll - ll_d) < 5e-4 * abs(ll_d)

    def test_on_node_rows_equal_exact_product_kernel(self):
        """Rows on grid nodes: taps are one-hot, SKI == the exact
        separable kernel — NLL matches the plain dense gram."""
        rng = np.random.default_rng(1)
        gp0 = g3.SKIGP(kernel=[g3.SE(np.zeros((2, 1), np.float32)),
                               g3.SE(np.zeros((2, 1), np.float32))],
                       grid_shape=[16, 14], ski_probes=16,
                       ski_lanczos=30, name="TSKIN")
        # seed geometry with scattered rows, then re-observe node rows
        seed_x = np.stack([rng.uniform(0, 5, 40),
                           rng.uniform(-2, 2, 40)], 1).astype(np.float32)
        gp0.observed(seed_x, rng.standard_normal(40).astype(np.float32))
        ax = [a[:, 0] for a in gp0._axes]
        i0 = rng.choice(len(ax[0]), 30)
        i1 = rng.choice(len(ax[1]), 30)
        xn = np.stack([ax[0][i0], ax[1][i1]], 1).astype(np.float32)
        xn = np.unique(xn, axis=0)
        yn = rng.standard_normal(len(xn)).astype(np.float32)
        geom, axes = gp0._geom, gp0._axes
        gp0.observed(xn, yn)                # refits the grid to xn...
        gp0._geom, gp0._axes = geom, axes   # ...restore the seeded grid
        pj = {k: jnp.asarray(v) for k, v in gp0.params.items()}
        k1 = np.asarray(gp0.f_kernels[0].cov(
            pj, jnp.asarray(xn[:, :1])), np.float64)
        k2 = np.asarray(gp0.f_kernels[1].cov(
            pj, jnp.asarray(xn[:, 1:2])), np.float64)
        s2 = float(np.asarray(gp0._noise_var(pj)))
        big = k1 * k2 + s2 * np.eye(len(xn))
        sign, logdet = np.linalg.slogdet(big)
        yo = yn.astype(np.float64)
        ll_d = -0.5 * (logdet + yo @ np.linalg.solve(big, yo)
                       + len(xn) * np.log(2 * np.pi))
        ll = float(gp0.loglike(gp0.params))
        assert abs(ll - ll_d) < 1e-3 * abs(ll_d)

    def test_grad_tracks_dense_ski_autodiff(self, ski_model):
        """BBMM stochastic-trace gradients: same envelope as the
        masked-grid / nll_iterative paths."""
        gp, x, y, _f = ski_model
        _big, wd, _kuu, _s2, pj = _ski_oracle(gp, x)
        n = x.shape[0]
        wj = jnp.asarray(wd, settings.dtype)

        def dense_nll(params):
            ks = gp._grams(params)
            kuu = ks[0]
            for k in ks[1:]:
                kuu = jnp.kron(kuu, k)
            s = (wj @ kuu @ wj.T
                 + gp._noise_var(params) * jnp.eye(n))
            lo = jnp.linalg.cholesky(s)
            a = jax.scipy.linalg.cho_solve((lo, True), jnp.asarray(y))
            return (0.5 * (jnp.asarray(y) @ a)
                    + jnp.sum(jnp.log(jnp.diagonal(lo)))
                    + 0.5 * n * np.log(2 * np.pi))

        fn = gp.th_loglike_fn()
        gk = jax.grad(lambda p: -fn(p, None, jnp.asarray(x),
                                    jnp.asarray(y)))(pj)
        gd = jax.grad(dense_nll)(pj)
        for k in gd:
            a_ = np.asarray(gd[k]).ravel()
            b_ = np.asarray(gk[k]).ravel()
            denom = np.maximum(np.abs(a_), 1.0)
            assert np.all(np.abs(a_ - b_) / denom < 0.15), (k, a_, b_)


class TestSKI3D:
    def test_3d_matches_dense_ski_oracle(self):
        """D=3 exercises the row-block Khatri-Rao MXU operator
        (ops/kron._ski_mxu_nd) end-to-end: NLL + moments against the
        dense rendering of the model's own gram."""
        rng = np.random.default_rng(2)
        n = 90
        x = np.stack([rng.uniform(0, 6, n), rng.uniform(-2, 2, n),
                      rng.uniform(1, 4, n)], 1).astype(np.float32)
        y = rng.standard_normal(n).astype(np.float32)
        gp = g3.SKIGP(kernel=[g3.MAT32(x[:, :1]), g3.SE(x[:, 1:2]),
                              g3.SE(x[:, 2:3])],
                      grid_shape=[12, 11, 10], ski_probes=16,
                      ski_lanczos=30, name="TSKI3")
        gp.observed(x, y)
        big, wd, kuu, _s2, _pj = _ski_oracle(gp, x)
        sign, logdet = np.linalg.slogdet(big)
        yo = y.astype(np.float64)
        alpha = np.linalg.solve(big, yo)
        ll_d = -0.5 * (logdet + yo @ alpha + n * np.log(2 * np.pi))
        ll = float(gp.loglike(gp.params))
        assert abs(ll - ll_d) < 1e-3 * abs(ll_d) + 1e-4
        xq = np.stack([np.linspace(0.5, 5.5, 5),
                       np.linspace(-1.5, 1.5, 5),
                       np.linspace(1.2, 3.8, 5)], 1).astype(np.float32)
        qi, qw = gp._taps(jnp.asarray(xq))
        wq = _dense_w(qi, qw, gp._grid_shape())
        b = wd @ kuu @ wq.T
        m_d = b.T @ alpha
        v_d = (np.diag(wq @ kuu @ wq.T)
               - np.sum(b * np.linalg.solve(big, b), axis=0))
        assert np.allclose(np.asarray(gp.mean(gp.params, xq)), m_d,
                           rtol=1e-3, atol=1e-4)
        assert np.allclose(np.asarray(gp.variance(gp.params, xq)), v_d,
                           rtol=1e-3, atol=1e-4)

    def test_3d_operator_matches_sparse_taps(self):
        """MXU fold == the gather/scatter reference on batched RHS."""
        from g3py_tpu.ops import kron as kr

        rng = np.random.default_rng(3)
        m = (9, 8, 7)
        n = 60
        idxs, ws = [], []
        for i, mi in enumerate(m):
            ix, w = kr.cubic_interp_axis(-1.0 + 0.3 * i, 0.2, mi,
                                         jnp.asarray(rng.uniform(
                                             -0.5 + 0.3 * i, 0.8 + 0.3 * i,
                                             n).astype(np.float32)))
            idxs.append(ix)
            ws.append(w)
        idxs, ws = tuple(idxs), tuple(ws)
        vb = jnp.asarray(rng.standard_normal((n, 5)).astype(np.float32))
        gb = jnp.asarray(rng.standard_normal(m + (5,)).astype(np.float32))
        wv, wtv, rg = kr.ski_operator(idxs, ws, m)
        assert np.allclose(np.asarray(wtv(vb)),
                           np.asarray(kr.ski_wtv(idxs, ws, vb, m)),
                           rtol=1e-5, atol=1e-6)
        assert np.allclose(np.asarray(wv(gb)),
                           np.asarray(kr.ski_wv(idxs, ws, gb)),
                           rtol=1e-5, atol=1e-6)
        e = jnp.zeros(n).at[3].set(1.0)
        assert np.allclose(np.asarray(rg(3)),
                           np.asarray(kr.ski_wtv(idxs, ws, e, m)),
                           rtol=1e-6, atol=1e-7)


class TestSKIPosterior:
    def test_moments_covariance_match_dense(self, ski_model):
        gp, x, y, _f = ski_model
        big, wd, kuu, _s2, pj = _ski_oracle(gp, x)
        xq = np.stack([np.linspace(0.5, 5.5, 7),
                       np.linspace(-1.5, 1.5, 7)], 1).astype(np.float32)
        qi, qw = gp._taps(jnp.asarray(xq))
        wq = _dense_w(qi, qw, gp._grid_shape())
        b = wd @ kuu @ wq.T
        alpha = np.linalg.solve(big, y.astype(np.float64))
        m_d = b.T @ alpha
        v_d = (np.diag(wq @ kuu @ wq.T)
               - np.sum(b * np.linalg.solve(big, b), axis=0))
        m = np.asarray(gp.mean(gp.params, xq))
        v = np.asarray(gp.variance(gp.params, xq))
        assert np.allclose(m, m_d, rtol=1e-3, atol=1e-4)
        assert np.allclose(v, v_d, rtol=1e-3, atol=1e-4)
        cv = np.asarray(gp.covariance(gp.params, xq))
        cv_d = wq @ kuu @ wq.T - b.T @ np.linalg.solve(big, b)
        assert np.allclose(cv, cv_d, rtol=1e-3, atol=1e-4)

    def test_sampler_matches_moments(self, ski_model):
        gp, x, y, _f = ski_model
        xq = np.stack([np.linspace(1.0, 5.0, 5),
                       np.linspace(-1.0, 1.0, 5)], 1).astype(np.float32)
        m = np.asarray(gp.mean(gp.params, xq))
        cv = np.asarray(gp.covariance(gp.params, xq))
        fs = gp.sampler(gp.params, xq, samples=3000, seed=1)
        assert fs.shape == (5, 3000)
        sd = np.sqrt(np.maximum(np.diag(cv), 1e-12))
        assert np.max(np.abs(fs.mean(1) - m) / np.maximum(sd, 1e-3)) < 0.2
        assert np.max(np.abs(np.cov(fs) - cv)) < 6e-3

    def test_prior_statistics_and_logpredictive(self, ski_model):
        gp, x, y, _f = ski_model
        vp = np.asarray(gp.variance(gp.params, x[:6], prior=True))
        assert np.all(vp > 0) and np.all(np.isfinite(vp))
        fs = gp.sampler(gp.params, x[:6], samples=2000, seed=2,
                        prior=True)
        assert np.isfinite(fs).all()
        # prior draws' variance tracks the SKI prior diag
        assert np.max(np.abs(fs.var(1) - vp) / vp) < 0.25
        lp = float(gp.logpredictive(gp.params, space=x[:20],
                                    vector=y[:20]))
        assert np.isfinite(lp)
        qlo = gp.quantiler(gp.params, x[:8], q=0.1)
        qhi = gp.quantiler(gp.params, x[:8], q=0.9)
        assert np.all(qlo <= qhi)


class TestSKITraining:
    def test_find_map_trains_and_predicts(self):
        rng = np.random.default_rng(3)
        n = 300
        x = np.stack([rng.uniform(0, 8, n),
                      rng.uniform(-2, 2, n)], 1).astype(np.float32)
        f = np.sin(x[:, 0]) * np.exp(-0.5 * x[:, 1] ** 2)
        y = (f + 0.1 * rng.standard_normal(n)).astype(np.float32)
        gp = g3.SKIGP(kernel=[g3.MAT52(x[:, :1]), g3.SE(x[:, 1:2])],
                      grid_shape=[32, 24], name="TSKIT")
        gp.observed(x, y)
        ll0 = float(gp.loglike(gp.params))
        p = gp.find_MAP(points=1, display=False, powell=False)
        ll1 = float(gp.loglike(p))
        assert ll1 > ll0 + 10
        m = np.asarray(gp.mean(p, x))
        rmse = float(np.sqrt(np.mean((m - f) ** 2)))
        assert rmse < 0.08
        sc = gp.scores(p, hidden=y, variance=True)
        assert np.isfinite(sc["_rmse"]) and np.isfinite(sc["_l2"])

    def test_predictor_serving(self, ski_model):
        gp, x, y, _f = ski_model
        pr = gp.predictor(gp.params)
        xq = x[:9]
        m = np.asarray(pr.mean(space=xq))
        assert np.allclose(m, np.asarray(gp.mean(gp.params, xq)),
                           rtol=1e-4, atol=1e-5)

    def test_nll_distributed_matches_loglike(self, ski_model):
        """GSPMD row sharding on the virtual 8-device mesh: n=120 pads
        to 128 with zero-weight rows; the closed-form padding correction
        keeps the value within the SLQ estimator's padded-operator
        noise."""
        gp, x, y, _f = ski_model
        ll = float(gp.loglike(gp.params))
        nd = float(gp.nll_distributed(gp.params))
        assert abs(nd + ll) < 5e-4 * abs(ll)
        g = jax.grad(lambda p: gp.nll_distributed(p))(
            {k: jnp.asarray(v) for k, v in gp.params.items()})
        assert all(np.isfinite(np.asarray(v)).all() for v in g.values())

    def test_bad_grid_shape_raises(self):
        x = np.zeros((5, 2), np.float32)
        gp = g3.SKIGP(kernel=[g3.SE(x[:, :1]), g3.SE(x[:, 1:2])],
                      grid_shape=[4, 16], name="TSKIB")
        with pytest.raises(ValueError, match="too small"):
            gp.observed(x, np.zeros(5, np.float32))
