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
