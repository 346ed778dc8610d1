"""SpatioTemporalSSGP: exact separable space-time GP, linear in time.

The pinning claim is EXACTNESS of the derived-mixing construction: for
``k = k_t(t) k_s(x)`` on m sites, the Kalman machinery with
``W = chol(K_s)`` must reproduce the dense product-kernel MVN computed
independently in numpy/scipy — NLL, on-site posterior moments, and
OFF-SITE field marginals (exact per the residual-independence argument
in models/spatiotemporal.py).  The reference's only route to this data
shape is the dense kernel-product algebra at O(n^3) (reference
kernels.py:51-75).
"""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy import stats

import g3py_tpu as g3
from g3py_tpu.models.lmc import stack_outputs, with_output


@pytest.fixture
def rng():
    return np.random.default_rng(11)


SITES = np.array([[0.0], [1.0], [2.5], [4.0]], np.float32)


def _st_data(rng, base=28):
    ts, ys = [], []
    for p in range(len(SITES)):
        n_p = base + 4 * p
        t = np.sort(rng.uniform(0, 10, n_p)).astype(np.float32)
        f = np.sin(t) * np.exp(-SITES[p, 0] / 3.0)
        ys.append((f + 0.1 * rng.standard_normal(n_p)).astype(np.float32))
        ts.append(t[:, None])
    return stack_outputs(ts, ys)


def _model(x, **kw):
    return g3.SpatioTemporalSSGP(space=x, kernel=g3.MAT32(x[:, :1]),
                                 space_kernel=g3.SE(SITES), sites=SITES,
                                 name="ST", **kw)


def _product_gram(st, params, t_all, xs_all):
    """Dense separable oracle gram from the model's own kernels."""
    pj = {k: jnp.asarray(v) for k, v in params.items()}
    kt = np.asarray(st.f_kernels[0].cov(pj, jnp.asarray(
        t_all[:, None].astype(np.float32))), np.float64)
    ks = np.asarray(st.f_space_kernel.cov(pj, jnp.asarray(
        xs_all[:, None].astype(np.float32))), np.float64)
    return kt * ks


class TestDenseParity:
    def test_nll_matches_scipy_oracle(self, rng):
        x, y = _st_data(rng)
        st = _model(x)
        st.observed(x, y)
        p = st.params
        pj = {k: jnp.asarray(v) for k, v in p.items()}
        tcol = np.asarray(x[:, 0], np.float32)
        idx = np.rint(x[:, 1]).astype(int)
        K = _product_gram(st, p, tcol, SITES[idx, 0])
        s2 = np.asarray(st.f_likelihood._vars(pj), np.float64)
        b = np.asarray(st.f_mixing.values(pj)[1], np.float64)
        ll_oracle = stats.multivariate_normal.logpdf(
            np.asarray(y, np.float64), mean=b[idx],
            cov=K + np.diag(s2[idx]))
        ll = float(st.loglike(p))
        assert abs(ll - ll_oracle) < 5e-4 * max(1.0, abs(ll_oracle))

    def test_onsite_posterior_matches_oracle(self, rng):
        x, y = _st_data(rng)
        st = _model(x)
        st.observed(x, y)
        p = st.params
        pj = {k: jnp.asarray(v) for k, v in p.items()}
        tq = np.linspace(0.5, 9.5, 9).astype(np.float32)
        xq = np.concatenate([with_output(tq[:, None], 1),
                             with_output(tq[:, None], 3)])
        tcol = np.asarray(x[:, 0], np.float32)
        idx = np.rint(x[:, 1]).astype(int)
        idxq = np.rint(xq[:, 1]).astype(int)
        t_all = np.concatenate([tcol, xq[:, 0]])
        xs_all = np.concatenate([SITES[idx, 0], SITES[idxq, 0]])
        K = _product_gram(st, p, t_all, xs_all)
        s2 = np.asarray(st.f_likelihood._vars(pj), np.float64)
        b = np.asarray(st.f_mixing.values(pj)[1], np.float64)
        n = len(tcol)
        Koo = K[:n, :n] + np.diag(s2[idx])
        sol = np.linalg.solve(Koo, np.asarray(y, np.float64) - b[idx])
        mean_d = b[idxq] + K[n:, :n] @ sol
        cov_d = K[n:, n:] - K[n:, :n] @ np.linalg.solve(Koo, K[n:, :n].T)
        np.testing.assert_allclose(np.asarray(st.mean(p, space=xq)),
                                   mean_d, atol=3e-4)
        np.testing.assert_allclose(np.asarray(st.variance(p, space=xq)),
                                   np.diagonal(cov_d), atol=3e-4)

    def test_field_offsite_matches_oracle(self, rng):
        """Marginal posterior at ARBITRARY spatial points is exact."""
        x, y = _st_data(rng)
        st = _model(x)
        st.observed(x, y)
        p = dict(st.params)
        p["ST_SpaceMix_b"] = np.zeros(len(SITES), np.float32)
        tq = np.linspace(0.5, 9.5, 7).astype(np.float32)
        xq = np.array([[0.5], [1.7], [3.2], [0.0], [4.0], [2.0], [3.9]],
                      np.float32)
        mq, vq = st.field(tq, xq, params=p)
        pj = {k: jnp.asarray(v) for k, v in p.items()}
        tcol = np.asarray(x[:, 0], np.float32)
        idx = np.rint(x[:, 1]).astype(int)
        t_all = np.concatenate([tcol, tq])
        xs_all = np.concatenate([SITES[idx, 0], xq[:, 0]])
        K = _product_gram(st, p, t_all, xs_all)
        s2 = np.asarray(st.f_likelihood._vars(pj), np.float64)
        n = len(tcol)
        Koo = K[:n, :n] + np.diag(s2[idx])
        sol = np.linalg.solve(Koo, np.asarray(y, np.float64))
        mean_d = K[n:, :n] @ sol
        cov_d = K[n:, n:] - K[n:, :n] @ np.linalg.solve(Koo, K[n:, :n].T)
        np.testing.assert_allclose(mq, mean_d, atol=2e-4)
        np.testing.assert_allclose(vq, np.diagonal(cov_d), atol=2e-4)

    def test_field_prior_and_guards(self, rng):
        x, y = _st_data(rng, base=12)
        st = _model(x)
        st.observed(x, y)
        p = dict(st.params)
        p["ST_SpaceMix_b"] = np.zeros(len(SITES), np.float32)
        tq = np.linspace(1, 9, 5).astype(np.float32)
        xq = np.array([[0.3], [1.5], [2.0], [3.0], [3.8]], np.float32)
        m0, v0 = st.field(tq, xq, params=p, prior=True)
        pj = {k: jnp.asarray(v) for k, v in p.items()}
        K = _product_gram(st, p, tq, xq[:, 0])
        np.testing.assert_allclose(m0, 0.0, atol=1e-6)
        np.testing.assert_allclose(v0, np.diagonal(K), rtol=2e-4)
        with pytest.raises(ValueError, match="noise"):
            st.field(tq, xq, params=p, noise=True)
        with pytest.raises(ValueError, match="rows"):
            st.field(tq[:3], xq, params=p)


class TestModelAPI:
    def test_find_map_improves(self, rng):
        x, y = _st_data(rng, base=24)
        st = _model(x)
        st.observed(x, y)
        lp0 = float(st.logp(st.params))
        p = st.find_MAP(points=1, display=False)
        lp1 = float(st.logp(p))
        assert np.isfinite(lp1) and lp1 >= lp0 - 1e-3
        c = st.task_correlations(p)
        assert c.shape == (4, 4)
        np.testing.assert_allclose(np.diagonal(c), 1.0, atol=1e-5)
        # nearby sites more correlated than far ones
        assert c[0, 1] > c[0, 3]

    def test_sharded_nll_inherited(self, rng):
        """nll_distributed (per-row emissions with the DERIVED chol(K_s)
        mixing built per device) == -loglike on the 8-dev mesh."""
        x, y = _st_data(rng, base=40)
        st = _model(x)
        st.observed(x, y)
        p = st.params
        v_plain = -float(st.loglike(p))
        v_shard = float(st.nll_distributed(p))
        np.testing.assert_allclose(v_shard, v_plain, rtol=1e-5)

    def test_sampler_and_quantiler_inherited(self, rng):
        x, y = _st_data(rng, base=14)
        st = _model(x)
        st.observed(x, y)
        p = st.params
        s = st.sampler(p, space=x, samples=4, noise=True, seed=1)
        assert s.shape == (len(x), 4) and np.all(np.isfinite(s))
        q_hi = st.quantiler(p, space=x, q=0.975, noise=True)
        q_lo = st.quantiler(p, space=x, q=0.025, noise=True)
        assert np.all(q_lo < q_hi)

    def test_constructor_guards(self):
        t = np.linspace(0, 1, 8, dtype=np.float32)[:, None]
        x = with_output(t, 0)
        with pytest.raises(ValueError, match="space_kernel"):
            g3.SpatioTemporalSSGP(space=x, kernel=g3.MAT32(t))


class TestSparse:
    """SparseSpatioTemporalSSGP: sparse in SPACE (m inducing sites),
    exact in TIME.  The pinning claim: with Z covering every distinct
    observed location the FITC residual vanishes and the model EQUALS
    the dense product-kernel MVN — NLL and posterior moments — while a
    strict subset Z degrades gracefully and still trains."""

    def _scattered(self, rng, n=120):
        xs = rng.uniform(0, 4, n).astype(np.float32)
        t = np.sort(rng.uniform(0, 10, n)).astype(np.float32)
        x = np.column_stack([t, xs]).astype(np.float32)
        y = (np.sin(t) * np.exp(-xs / 3.0)
             + 0.1 * rng.standard_normal(n)).astype(np.float32)
        return x, y

    def _onsite(self, rng):
        rows, ys = [], []
        for p in range(len(SITES)):
            n_p = 20 + 3 * p
            t = np.sort(rng.uniform(0, 10, n_p)).astype(np.float32)
            f = np.sin(t) * np.exp(-SITES[p, 0] / 3.0)
            ys.append((f + 0.1 * rng.standard_normal(n_p)).astype(
                np.float32))
            rows.append(np.column_stack([t, np.full(n_p, SITES[p, 0])]))
        return (np.concatenate(rows).astype(np.float32),
                np.concatenate(ys).astype(np.float32))

    def _sparse(self, x, inducing, **kw):
        return g3.SparseSpatioTemporalSSGP(
            space=x, kernel=g3.MAT32(x[:, :1]),
            space_kernel=g3.SE(x[:, 1:]), inducing=inducing,
            name="SST", **kw)

    def test_complete_sites_equal_dense_oracle(self, rng):
        x, y = self._onsite(rng)
        st = self._sparse(x, SITES)
        st.observed(x, y)
        p = st.params
        pj = {k: jnp.asarray(v) for k, v in p.items()}
        K = _product_gram(st, p, x[:, 0], x[:, 1])
        s2 = float(np.asarray(st.f_likelihood._vars(pj))[0])
        n = len(y)
        ll_oracle = stats.multivariate_normal.logpdf(
            np.asarray(y, np.float64), mean=np.zeros(n),
            cov=K + s2 * np.eye(n))
        ll = float(st.loglike(p))
        assert abs(ll - ll_oracle) < 5e-4 * max(1.0, abs(ll_oracle))
        # posterior moments at rows ON inducing sites == dense posterior
        tq = np.linspace(0.5, 9.5, 8).astype(np.float32)
        xq = np.column_stack([tq, np.full(8, SITES[2, 0])]).astype(
            np.float32)
        Kq = _product_gram(st, p, np.concatenate([x[:, 0], tq]),
                           np.concatenate([x[:, 1], xq[:, 1]]))
        Koo = Kq[:n, :n] + s2 * np.eye(n)
        sol = np.linalg.solve(Koo, np.asarray(y, np.float64))
        mean_d = Kq[n:, :n] @ sol
        cov_d = (Kq[n:, n:]
                 - Kq[n:, :n] @ np.linalg.solve(Koo, Kq[n:, :n].T))
        np.testing.assert_allclose(np.asarray(st.mean(p, space=xq)),
                                   mean_d, atol=3e-4)
        np.testing.assert_allclose(np.asarray(st.variance(p, space=xq)),
                                   np.diagonal(cov_d), atol=3e-4)
        # prior marginals: k_t(0) k_s(x, x) at on-site rows
        vp = np.asarray(st.variance(p, space=xq, prior=True))
        Kp = _product_gram(st, p, tq, xq[:, 1])
        np.testing.assert_allclose(vp, np.diagonal(Kp), rtol=3e-4)

    def test_subset_sites_train_and_serve(self, rng):
        x, y = self._scattered(rng, n=150)
        st = self._sparse(x, 8)
        st.observed(x, y)
        assert st.f_mixing.sites.shape == (8, 1)
        lp0 = float(st.logp(st.params))
        p = st.find_MAP(points=1, display=False)
        assert float(st.logp(p)) >= lp0 - 1e-3
        m = np.asarray(st.mean(p, space=x))
        truth = np.sin(x[:, 0]) * np.exp(-x[:, 1] / 3.0)
        rmse = float(np.sqrt(np.mean((m - truth) ** 2)))
        assert rmse < 0.12        # noise level is 0.1
        # FITC residual inflates marginals at rows far from Z: variance
        # stays positive and finite everywhere
        v = np.asarray(st.variance(p, space=x, noise=True))
        assert np.all(np.isfinite(v)) and np.all(v > 0)
        # field() works with scattered observations
        tq = np.linspace(1, 9, 6).astype(np.float32)
        xqs = np.linspace(0.2, 3.8, 6).astype(np.float32)
        mq, vq = st.field(tq, xqs, params=p)
        assert np.all(np.isfinite(mq)) and np.all(vq > 0)

    def test_sampler_quantiler_logpredictive(self, rng):
        x, y = self._onsite(rng)
        st = self._sparse(x, SITES)
        st.observed(x, y)
        p = st.params
        tq = np.linspace(1, 9, 6).astype(np.float32)
        xq = np.column_stack([tq, np.full(6, 1.0)]).astype(np.float32)
        draws = st.sampler(p, space=xq, samples=600, seed=2)
        m = np.asarray(st.mean(p, space=xq))
        v = np.asarray(st.variance(p, space=xq))
        assert draws.shape == (6, 600)
        np.testing.assert_allclose(draws.mean(axis=1), m,
                                   atol=6 * np.sqrt(v.max() / 600))
        np.testing.assert_allclose(draws.var(axis=1), v,
                                   rtol=0.35, atol=1e-4)
        qh = st.quantiler(p, space=xq, q=0.975, noise=True)
        ql = st.quantiler(p, space=xq, q=0.025, noise=True)
        assert np.all(qh > ql)
        lp = float(st.logpredictive(p, space=xq,
                                    vector=np.sin(tq).astype(np.float32)))
        assert np.isfinite(lp)

    def test_constructor_and_guards(self, rng):
        x, y = self._scattered(rng, n=40)
        with pytest.raises(ValueError, match="inducing"):
            g3.SparseSpatioTemporalSSGP(space=x, kernel=g3.MAT32(x[:, :1]),
                                        space_kernel=g3.SE(x[:, 1:]))
        st = self._sparse(x, 6)
        with pytest.raises(ValueError, match="rows"):
            st.observed(x[:, :1], y)

    def test_chunked_payload_path_matches_plain(self, rng):
        """Beyond-threshold routing (per-block A/Q + per-block
        interpolated emissions from the transposed-coordinate payload)
        == the plain path: loglike value, gradient finiteness, and
        posterior moments."""
        from g3py_tpu.config import settings

        x, y = self._scattered(rng, n=300)
        st = self._sparse(x, 6)
        st.observed(x, y)
        p = st.params
        sites = st.f_mixing.sites
        ll_plain = float(st.loglike(p))
        xq = x[:40]
        m_plain = np.asarray(st.mean(p, space=xq))
        v_plain = np.asarray(st.variance(p, space=xq))
        old = (settings.ssm_chunk_threshold, settings.ssm_chunk)
        try:
            settings.ssm_chunk_threshold, settings.ssm_chunk = 100, 128
            st2 = self._sparse(x, sites)
            st2.observed(x, y)
            ll_chunk = float(st2.loglike(p))
            g = np.asarray(st2.dlogp(p))
            m_chunk = np.asarray(st2.mean(p, space=xq))
            v_chunk = np.asarray(st2.variance(p, space=xq))
        finally:
            settings.ssm_chunk_threshold, settings.ssm_chunk = old
        np.testing.assert_allclose(ll_chunk, ll_plain, rtol=2e-5)
        assert np.all(np.isfinite(g)) and np.any(g != 0)
        np.testing.assert_allclose(m_chunk, m_plain, atol=3e-4)
        np.testing.assert_allclose(v_chunk, v_plain, atol=3e-4)

    def test_sharded_payload_nll_matches_plain(self, rng):
        """nll_distributed (time-axis-sharded, per-device interpolated
        emissions, 8-device mesh) == -loglike, value AND gradient, at an
        n that does NOT divide over the mesh (payload-replicating pad
        path), and find_MAP(engine='distributed') improves the logp."""
        import jax

        x, y = self._scattered(rng, n=157)
        st = self._sparse(x, 6)
        st.observed(x, y)
        p = st.params
        v_plain = -float(st.loglike(p))
        v_shard = float(st.nll_distributed(p))
        np.testing.assert_allclose(v_shard, v_plain, rtol=1e-5)

        reg = st.active
        u = jnp.asarray(reg.dict_to_array(p))
        xj = jnp.asarray(x)
        yj = jnp.asarray(y)
        vec0 = jnp.zeros(0, jnp.float32)
        pure = st._logp_pure(prior=False)
        g1 = np.asarray(jax.grad(
            lambda w: -pure(reg.array_to_dict_jax(w), xj, xj, yj,
                            vec0))(u))
        g2 = np.asarray(jax.grad(
            lambda w: st.nll_distributed(reg.array_to_dict_jax(w)))(u))
        np.testing.assert_allclose(g2, g1, rtol=1e-4,
                                   atol=1e-5 * np.max(np.abs(g1)))

        lp0 = float(st.logp(st.params))
        pd = st.find_MAP(engine="distributed", points=1, max_iters=10,
                         display=False)
        lp1 = float(st.logp(pd))
        assert np.isfinite(lp1) and lp1 > lp0
