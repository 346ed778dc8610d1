"""MultiStateSpaceGP: exact O(n) multi-output (LMC-mixed) time series.

The pinning claim is EXACTNESS of the per-row-emission Kalman machinery:
P channels mixed from Q latent Markovian GPs, observed at DIFFERENT
irregular times, must reproduce the dense coregionalized MVN computed
independently in numpy/scipy — NLL, posterior moments and predictive
density.  The reference's only multi-output story is the dense ICM
index-kernel at O((sum n_p)^3) (reference kernels.py:262-290); here the
oracle is built from the (separately validated) kernel grams + the LMC
mixing identity Cov[y_i, y_j] = sum_q W[p_i,q] W[p_j,q] k_q(t_i, t_j)
+ delta_ij s2_{p_i}.
"""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy import stats

import g3py_tpu as g3
from g3py_tpu.models.lmc import stack_outputs, with_output


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _two_channel_data(rng, n0=40, n1=28, span=10.0):
    """Two channels sampled at DIFFERENT irregular times."""
    t0 = np.sort(rng.uniform(0, span, n0)).astype(np.float32)
    t1 = np.sort(rng.uniform(0, span, n1)).astype(np.float32)
    f = lambda t: np.sin(t)
    y0 = (f(t0) + 0.15 * rng.standard_normal(n0)).astype(np.float32)
    y1 = (-0.8 * f(t1) + 0.5
          + 0.2 * rng.standard_normal(n1)).astype(np.float32)
    x, y = stack_outputs([t0[:, None], t1[:, None]], [y0, y1])
    return x, y, (t0, t1)


def _model(x, kernels, **kw):
    m = g3.MultiStateSpaceGP(space=x, kernel=kernels, outputs_dim=2,
                             name="M", **kw)
    return m


def _dense_cov(m, params, x):
    """Independent numpy oracle: the mixed coregionalized covariance over
    row-format x, from the model's own (separately validated) latent
    kernel grams + the LMC mixing identity."""
    pj = {k: jnp.asarray(v) for k, v in params.items()}
    t = np.asarray(x, np.float64)[:, :1].astype(np.float32)
    idx = np.rint(np.asarray(x)[:, 1]).astype(np.int64)
    w, b = (np.asarray(v, np.float64) for v in m.f_mixing.values(pj))
    s2 = np.asarray(m.f_likelihood._vars(pj), np.float64)
    ks = (list(m.f_kernels) * m.n_latents if m._shared_kernel
          else list(m.f_kernels))
    K = np.zeros((len(t), len(t)))
    for q, k in enumerate(ks):
        kq = np.asarray(k.cov(pj, jnp.asarray(t)), np.float64)
        K += np.outer(w[idx, q], w[idx, q]) * kq
    return K + np.diag(s2[idx]), b[idx], idx


class TestDenseParity:
    @pytest.mark.parametrize("shared", [False, True])
    def test_nll_matches_scipy_oracle(self, rng, shared):
        x, y, _ = _two_channel_data(rng)
        t = x[:, :1]
        kernels = (g3.MAT32(t) if shared
                   else [g3.MAT32(t), g3.OU(t)])
        m = _model(x, kernels)
        m.observed(x, y)
        p = m.params
        # make the mixing non-trivial so cross-channel coupling is tested
        wkey = [k for k in p if k.endswith("Mix_w")][0]
        p = dict(p)
        p[wkey] = np.array([[1.0, 0.3], [-0.7, 0.8]], np.float32)
        K, mu, _ = _dense_cov(m, p, x)
        ll_oracle = stats.multivariate_normal.logpdf(
            np.asarray(y, np.float64), mean=mu, cov=K)
        ll_m = float(m.loglike(p))
        assert abs(ll_m - ll_oracle) < 5e-4 * max(1.0, abs(ll_oracle))

    def test_posterior_moments_match_oracle(self, rng):
        x, y, _ = _two_channel_data(rng, n0=32, n1=24)
        t = x[:, :1]
        m = _model(x, [g3.MAT52(t), g3.OU(t)])
        m.observed(x, y)
        p = dict(m.params)
        wkey = [k for k in p if k.endswith("Mix_w")][0]
        p[wkey] = np.array([[1.0, 0.4], [-0.6, 0.9]], np.float32)
        # query BOTH channels on a common grid (cross-channel transfer)
        tq = np.linspace(0.5, 9.5, 15).astype(np.float32)
        xq = np.concatenate([with_output(tq[:, None], 0),
                             with_output(tq[:, None], 1)])
        xa = np.concatenate([x, xq])
        K, mu, _ = _dense_cov(m, p, xa)
        n = len(x)
        Koo = K[:n, :n]
        Kqo = K[n:, :n]
        pj = {k: jnp.asarray(v) for k, v in p.items()}
        s2 = np.asarray(m.f_likelihood._vars(pj), np.float64)
        idxq = np.rint(xq[:, 1]).astype(np.int64)
        # dense posterior for the NOISE-FREE mixed latent g at queries
        Kqq = K[n:, n:] - np.diag(s2[idxq])
        sol = np.linalg.solve(Koo, np.asarray(y, np.float64) - mu[:n])
        mean_d = mu[n:] + Kqo @ sol
        cov_d = Kqq - Kqo @ np.linalg.solve(Koo, Kqo.T)
        mean_m = np.asarray(m.mean(p, space=xq))
        var_m = np.asarray(m.variance(p, space=xq))
        np.testing.assert_allclose(mean_m, mean_d, atol=2e-4)
        np.testing.assert_allclose(var_m, np.diagonal(cov_d), atol=3e-4)
        # noise=True adds the per-channel variance
        vn = np.asarray(m.variance(p, space=xq, noise=True))
        np.testing.assert_allclose(vn - var_m, s2[idxq], rtol=1e-5)

    def test_logpredictive_matches_oracle(self, rng):
        x, y, _ = _two_channel_data(rng, n0=24, n1=20)
        t = x[:, :1]
        m = _model(x, [g3.MAT32(t), g3.MAT32(t)])
        m.observed(x, y)
        p = dict(m.params)
        wkey = [k for k in p if k.endswith("Mix_w")][0]
        p[wkey] = np.array([[1.0, 0.2], [0.3, 0.9]], np.float32)
        tq = np.linspace(1, 9, 9).astype(np.float32)
        xq = with_output(tq[:, None], 1)
        yq = (-0.8 * np.sin(tq) + 0.5).astype(np.float32)
        mean_m = np.asarray(m.mean(p, space=xq), np.float64)
        var_m = np.asarray(m.variance(p, space=xq, noise=True), np.float64)
        lp_oracle = float(np.sum(stats.norm.logpdf(
            np.asarray(yq, np.float64), mean_m, np.sqrt(var_m))))
        lp_m = float(m.logpredictive(p, space=xq, vector=yq))
        assert abs(lp_m - lp_oracle) < 1e-3 * max(1.0, abs(lp_oracle))

    def test_prior_moments(self, rng):
        x, y, _ = _two_channel_data(rng, n0=16, n1=16)
        t = x[:, :1]
        m = _model(x, [g3.MAT32(t), g3.OU(t)])
        m.observed(x, y)
        p = dict(m.params)
        wkey = [k for k in p if k.endswith("Mix_w")][0]
        p[wkey] = np.array([[1.0, 0.5], [-0.5, 1.0]], np.float32)
        K, mu, idx = _dense_cov(m, p, x)
        pj = {k: jnp.asarray(v) for k, v in p.items()}
        s2 = np.asarray(m.f_likelihood._vars(pj), np.float64)
        np.testing.assert_allclose(
            np.asarray(m.mean(p, space=x, prior=True)), mu, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(m.variance(p, space=x, prior=True)),
            np.diagonal(K) - s2[idx], rtol=2e-5)


class TestModelAPI:
    def test_find_map_improves_and_recovers_correlation(self, rng):
        x, y, _ = _two_channel_data(rng, n0=64, n1=48)
        t = x[:, :1]
        m = _model(x, g3.MAT32(t))        # shared kernel, Q=2
        m.observed(x, y)
        p0 = m.params
        params = m.find_MAP(start=p0, points=1, display=False)
        assert float(m.loglike(params)) >= float(m.loglike(p0)) - 1e-3
        # channel 1 = -0.8 * channel 0 (+ noise): the learned latent
        # correlation must come out strongly negative
        c = m.task_correlations(params)
        assert c.shape == (2, 2)
        np.testing.assert_allclose(np.diagonal(c), 1.0, atol=1e-6)
        assert c[0, 1] < -0.5

    def test_sampler_and_quantiler(self, rng):
        x, y, _ = _two_channel_data(rng, n0=24, n1=24)
        t = x[:, :1]
        m = _model(x, [g3.MAT32(t), g3.OU(t)])
        m.observed(x, y)
        p = m.params
        s = m.sampler(p, space=x, samples=5, noise=True, seed=2)
        assert s.shape == (len(x), 5) and np.all(np.isfinite(s))
        q_hi = m.quantiler(p, space=x, q=0.975, noise=True)
        q_lo = m.quantiler(p, space=x, q=0.025, noise=True)
        mean = np.asarray(m.mean(p, space=x))
        assert np.all((mean > q_lo) & (mean < q_hi))

    def test_joint_sampler_matches_dense_covariance(self, rng):
        """Simulation-smoother draws reproduce the dense posterior mean
        AND cross-channel covariance within MC error."""
        x, y, _ = _two_channel_data(rng, n0=20, n1=16)
        t = x[:, :1]
        m = _model(x, [g3.MAT32(t), g3.OU(t)])
        m.observed(x, y)
        p = dict(m.params)
        wkey = [k for k in p if k.endswith("Mix_w")][0]
        p[wkey] = np.array([[1.0, 0.4], [-0.7, 0.6]], np.float32)
        tq = np.linspace(1, 9, 6).astype(np.float32)
        xq = np.concatenate([with_output(tq[:, None], 0),
                             with_output(tq[:, None], 1)])
        draws = m.sampler(p, space=xq, samples=3000, seed=0)
        xa = np.concatenate([x, xq])
        K, mu, _ = _dense_cov(m, p, xa)
        n = len(x)
        pj = {k: jnp.asarray(v) for k, v in p.items()}
        s2 = np.asarray(m.f_likelihood._vars(pj), np.float64)
        idxq = np.rint(xq[:, 1]).astype(np.int64)
        Kqq = K[n:, n:] - np.diag(s2[idxq])
        Kqo = K[n:, :n]
        Koo = K[:n, :n]
        sol = np.linalg.solve(Koo, np.asarray(y, np.float64) - mu[:n])
        mean_d = mu[n:] + Kqo @ sol
        cov_d = Kqq - Kqo @ np.linalg.solve(Koo, Kqo.T)
        scale = float(np.abs(cov_d).max())
        np.testing.assert_allclose(draws.mean(axis=1), mean_d,
                                   atol=6 * np.sqrt(scale / 3000))
        np.testing.assert_allclose(np.cov(draws), cov_d, atol=0.12 * scale)

    def test_predictor_serving(self, rng):
        x, y, _ = _two_channel_data(rng, n0=24, n1=20)
        t = x[:, :1]
        m = _model(x, g3.MAT52(t))
        m.observed(x, y)
        p = m.params
        pr = m.predictor(p)
        xq = with_output(np.linspace(1, 9, 8)[:, None].astype(np.float32),
                         1)
        np.testing.assert_allclose(np.asarray(pr.mean(space=xq)),
                                   np.asarray(m.mean(p, space=xq)),
                                   atol=1e-5)

    def test_guards_and_errors(self, rng):
        x, y, _ = _two_channel_data(rng, n0=12, n1=12)
        t = x[:, :1]
        # LIN (dot kernel, non-stationary) has no state-space form; SE
        # DOES since the order-N Taylor leaf (ops/ssm.SELeaf) landed
        with pytest.raises(ValueError, match="state-space"):
            g3.MultiStateSpaceGP(space=x, kernel=g3.LIN(t), outputs_dim=2)
        with pytest.raises(ValueError, match="kernel list"):
            g3.MultiStateSpaceGP(space=x, kernel=[g3.OU(t), g3.OU(t),
                                                  g3.OU(t)],
                                 outputs_dim=2, latents=2)
        m = _model(x, g3.OU(t))
        with pytest.raises(ValueError, match="output ind"):
            bad = x.copy()
            bad[:, 1] = 5.0
            m.observed(bad, y)
        m2 = _model(x, g3.OU(t))
        with pytest.raises(ValueError, match="rows"):
            m2.observed(x[:, :1], y)
        m3 = _model(x, g3.OU(t))
        m3.observed(x, y)


class TestScaling:
    """The beyond-HBM (chunked) and multi-chip (time-sharded) paths give
    the SAME values as the plain parallel scans — the per-row-emission
    generalizations of the single-output monoid machinery."""

    def test_chunked_rows_nll_matches_plain(self, rng):
        """ops-level: chunked_kalman_nll(rows=...) == parallel_kalman_nll
        with the materialized per-row h/r, value and gradient, across
        dividing / non-dividing / oversized chunks."""
        import jax
        from g3py_tpu.ops.ssm import chunked_kalman_nll, \
            parallel_kalman_nll
        n, s, P, Q = 300, 4, 3, 2
        a = jnp.asarray(rng.standard_normal((n, s, s)) * 0.3,
                        jnp.float32)
        L = rng.standard_normal((n, s, s)) * 0.5
        q = jnp.asarray(np.einsum("nij,nkj->nik", L, L)
                        + 0.1 * np.eye(s), jnp.float32)
        hq = jnp.asarray(rng.standard_normal((Q, s)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((P, Q)), jnp.float32)
        r_vec = jnp.asarray(rng.uniform(0.1, 0.5, P), jnp.float32)
        idx = jnp.asarray(rng.integers(0, P, n), jnp.int32)
        y = jnp.asarray(rng.standard_normal(n), jnp.float32)
        obs = jnp.asarray(rng.random(n) > 0.1)
        h = jnp.sum(w[idx][:, :, None] * hq[None], axis=1)
        r = r_vec[idx]
        nll_plain, _, _ = parallel_kalman_nll(a, q, h, r, y, obs)
        for chunk in (64, 100, 300, 4096):
            nll_c = chunked_kalman_nll(a, q, None, None, y, obs,
                                       chunk=chunk,
                                       rows=(idx, w, hq, r_vec))
            np.testing.assert_allclose(float(nll_c), float(nll_plain),
                                       rtol=2e-6)

        def f_plain(ww):
            hh = jnp.sum(ww[idx][:, :, None] * hq[None], axis=1)
            nll, _, _ = parallel_kalman_nll(a, q, hh, r, y, obs)
            return nll

        def f_chunk(ww):
            return chunked_kalman_nll(a, q, None, None, y, obs, chunk=64,
                                      rows=(idx, ww, hq, r_vec))

        g1 = np.asarray(jax.grad(f_plain)(w))
        g2 = np.asarray(jax.grad(f_chunk)(w))
        np.testing.assert_allclose(g2, g1, rtol=1e-4,
                                   atol=1e-5 * np.max(np.abs(g1)))

    def test_model_chunked_routing_matches_plain(self, rng):
        """MultiStateSpaceGP above settings.ssm_chunk_threshold: loglike
        AND posterior statistics match the plain-path values."""
        from g3py_tpu.config import settings
        x, y, _ = _two_channel_data(rng, n0=120, n1=100)
        t = x[:, :1]
        m = _model(x, [g3.MAT32(t), g3.OU(t)])
        m.observed(x, y)
        p = m.params
        wkey = [k for k in p if k.endswith("Mix_w")][0]
        p = dict(p)
        p[wkey] = np.array([[1.0, 0.3], [-0.7, 0.8]], np.float32)
        ll_plain = float(m.loglike(p))
        tq = np.linspace(0.5, 9.5, 11).astype(np.float32)
        xq = np.concatenate([with_output(tq[:, None], 0),
                             with_output(tq[:, None], 1)])
        mean_plain = np.asarray(m.mean(p, space=xq))
        var_plain = np.asarray(m.variance(p, space=xq))
        old_thr, old_chunk = (settings.ssm_chunk_threshold,
                              settings.ssm_chunk)
        try:
            settings.ssm_chunk_threshold, settings.ssm_chunk = 64, 100
            m2 = g3.MultiStateSpaceGP(space=x, kernel=[g3.MAT32(t),
                                                       g3.OU(t)],
                                      outputs_dim=2, name="M2")
            m2.observed(x, y)
            p2 = {k.replace("M2", "M", 1): v
                  for k, v in m2.params.items()}
            assert set(p2) == set(m.params)
            p2c = {k.replace("M", "M2", 1): v for k, v in p.items()}
            ll_chunk = float(m2.loglike(p2c))
            g = np.asarray(m2.dlogp(p2c))
            mean_c = np.asarray(m2.mean(p2c, space=xq))
            var_c = np.asarray(m2.variance(p2c, space=xq))
        finally:
            settings.ssm_chunk_threshold = old_thr
            settings.ssm_chunk = old_chunk
        np.testing.assert_allclose(ll_chunk, ll_plain, rtol=2e-5)
        assert np.all(np.isfinite(g))
        np.testing.assert_allclose(mean_c, mean_plain, atol=2e-4)
        np.testing.assert_allclose(var_c, var_plain, atol=3e-4)

    def test_sharded_multi_matches_plain(self, rng):
        """nll_distributed (8-device virtual mesh, per-row emissions) ==
        -loglike, value AND gradient, at n that does not divide over
        the mesh (identity-element pad path)."""
        import jax
        x, y, _ = _two_channel_data(rng, n0=77, n1=60)
        t = x[:, :1]
        m = _model(x, [g3.MAT52(t), g3.OU(t)])
        m.observed(x, y)
        p = dict(m.params)
        wkey = [k for k in p if k.endswith("Mix_w")][0]
        p[wkey] = np.array([[1.0, 0.4], [-0.6, 0.9]], np.float32)
        v_plain = -float(m.loglike(p))
        v_shard = float(m.nll_distributed(p))
        np.testing.assert_allclose(v_shard, v_plain, rtol=1e-5)

        reg = m.active
        pure = m._logp_pure(prior=False)
        xj = jnp.asarray(x, jnp.float32)
        yj = jnp.asarray(y, jnp.float32)
        vec0 = jnp.zeros(0, jnp.float32)
        u = jnp.asarray(reg.dict_to_array(p))
        g1 = np.asarray(jax.grad(
            lambda ww: -pure(reg.array_to_dict_jax(ww), xj, xj, yj,
                             vec0))(u))
        g2 = np.asarray(jax.grad(
            lambda ww: m.nll_distributed(reg.array_to_dict_jax(ww)))(u))
        np.testing.assert_allclose(g2, g1, rtol=1e-4,
                                   atol=1e-5 * np.max(np.abs(g1)))

    def test_find_map_distributed_improves(self, rng):
        x, y, _ = _two_channel_data(rng, n0=48, n1=40)
        t = x[:, :1]
        m = _model(x, g3.MAT32(t))
        m.observed(x, y)
        lp0 = float(m.logp(m.params))
        p = m.find_MAP(engine="distributed", points=1, max_iters=10,
                       display=False)
        lp1 = float(m.logp(p))
        assert np.isfinite(lp1) and lp1 > lp0
