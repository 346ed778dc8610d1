"""NonGaussianSTSSGP: spatio-temporal log-Gaussian Cox processes on the
exact separable space-time state-space prior.

Pinning claims: (1) with GaussianLik the Laplace construction reduces
EXACTLY to the conjugate SpatioTemporalSSGP (itself pinned exact vs the
dense product-kernel MVN); (2) Poisson counts over the sites match an
independent dense numpy f64 Laplace on the model's OWN coregionalized
gram K_s(sites)[idx, idx] * k_t (R&W alg. 3.1) — evidence AND posterior
latent moments; (3) the model API carries the family: find_MAP trains
spatial hypers through chol(K_s)'s VJP, and field_rate(t, x) serves the
posterior intensity surface at arbitrary off-site locations.
"""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.special import gammaln

import g3py_tpu as g3
from g3py_tpu.models.lmc import stack_outputs, with_output


@pytest.fixture
def rng():
    return np.random.default_rng(17)


SITES = np.array([[0.0], [1.0], [2.5], [4.0]], np.float32)


def _count_data(rng, base=24, span=10.0):
    ts, ys = [], []
    for p in range(len(SITES)):
        n_p = base + 3 * p
        t = np.sort(rng.uniform(0, span, n_p)).astype(np.float32)
        g = 0.8 * np.sin(t) * np.exp(-SITES[p, 0] / 3.0) + 1.0
        ys.append(rng.poisson(np.exp(g)).astype(np.float32))
        ts.append(t[:, None])
    return stack_outputs(ts, ys)


def _model(x, likelihood=None, name="NS", **kw):
    return g3.NonGaussianSTSSGP(
        space=x, kernel=g3.MAT32(x[:, :1]), space_kernel=g3.SE(SITES),
        sites=SITES,
        likelihood=likelihood if likelihood is not None
        else g3.PoissonLik(), name=name, **kw)


def _laplace_oracle(K, off, y):
    """Dense numpy f64 Poisson Laplace (R&W alg. 3.1): returns
    (log evidence, mode f, avec, B-cholesky, sqrt(W))."""
    n = len(y)
    y64 = np.asarray(y, np.float64)
    f = np.zeros(n)
    for _ in range(60):
        mm = np.exp(off + f)
        wv = mm
        bvec = wv * f + (y64 - mm)
        sq = np.sqrt(wv)
        bm = np.eye(n) + sq[:, None] * K * sq[None, :]
        lb = np.linalg.cholesky(bm)
        avec = bvec - sq * np.linalg.solve(
            lb.T, np.linalg.solve(lb, sq * (K @ bvec)))
        f = K @ avec
    mm = np.exp(off + f)
    ll_data = float(np.sum(y64 * (off + f) - mm - gammaln(y64 + 1)))
    log_z = (ll_data - 0.5 * float(avec @ f)
             - float(np.sum(np.log(np.diagonal(lb)))))
    return log_z, f, avec, lb, np.sqrt(mm)


class TestOracles:
    def test_gaussian_likelihood_is_exact_stssgp(self, rng):
        """Newton converges in one step under GaussianLik: the Laplace
        evidence IS the conjugate SpatioTemporalSSGP evidence (var
        mapped from the shared GaussLik slot into the per-site
        MultiGaussLik vector)."""
        ts, ys = [], []
        for p in range(len(SITES)):
            t = np.sort(rng.uniform(0, 10, 22 + p)).astype(np.float32)
            f = np.sin(t) * np.exp(-SITES[p, 0] / 3.0)
            ys.append((f + 0.15 * rng.standard_normal(len(t)))
                      .astype(np.float32))
            ts.append(t[:, None])
        x, y = stack_outputs(ts, ys)
        ng = _model(x, likelihood=g3.GaussianLik(), name="NG")
        st = g3.SpatioTemporalSSGP(space=x, kernel=g3.MAT32(x[:, :1]),
                                   space_kernel=g3.SE(SITES),
                                   sites=SITES, name="SG")
        ng.observed(x, y)
        st.observed(x, y)
        png, pst = dict(ng.params), dict(st.params)
        png["NG_GaussLik_var"] = np.float32(0.04)
        pst["SG_MultiGaussLik_var"] = np.full(len(SITES), 0.04,
                                              np.float32)
        for k in png:
            tail = k[len("NG_"):]
            if "GaussLik" not in k and ("SG_" + tail) in pst:
                pst["SG_" + tail] = png[k]
        ll_ng = float(ng.loglike(png))
        ll_st = float(st.loglike(pst))
        assert abs(ll_ng - ll_st) < 2e-4 * max(1.0, abs(ll_st))
        xq = with_output(np.linspace(1, 9, 7).astype(np.float32)[:, None],
                         2)
        m_ng = np.asarray(ng.location(png, space=xq))
        m_st = np.asarray(st.location(pst, space=xq))
        np.testing.assert_allclose(m_ng, m_st, atol=2e-4)

    def test_poisson_matches_dense_laplace_oracle(self, rng):
        """Evidence and posterior latent moments vs the dense f64
        Laplace on K_s(sites)[idx, idx] * k_t from the model's own
        kernels (the exact coregionalization the derived mixing
        implements)."""
        x, y = _count_data(rng, base=18)
        m = _model(x, name="OR")
        m.observed(x, y)
        p = dict(m.params)
        pj = {k: jnp.asarray(v) for k, v in p.items()}
        n = len(y)
        idx = np.rint(x[:, 1]).astype(np.int64)
        tall = x[:, 0]
        ks = np.asarray(m.f_mixing.spatial_cov(pj), np.float64)
        kt = np.asarray(m.f_kernels[0].cov(
            pj, jnp.asarray(tall[:, None])), np.float64)
        K = ks[np.ix_(idx, idx)] * kt + 1e-8 * np.eye(n)
        b = np.asarray(g3.hypers.hval(m.f_mixing.b, p), np.float64)
        log_z, f, avec, lb, sq = _laplace_oracle(K, b[idx], y)
        ll_m = float(m.loglike(p))
        assert abs(ll_m - log_z) < 3e-4 * max(1.0, abs(log_z))
        g = np.asarray(m.dlogp(p))
        assert np.all(np.isfinite(g)) and np.any(g != 0)
        # posterior latent moments at held-out rows on site 2
        tq = np.linspace(1, 9, 8).astype(np.float32)
        xq = with_output(tq[:, None], 2)
        kq = np.asarray(m.f_kernels[0].cov(
            pj, jnp.asarray(tall[:, None]), jnp.asarray(tq[:, None])),
            np.float64)
        kcross = ks[np.ix_(idx, np.full(len(tq), 2))] * kq
        kqq = np.asarray(m.f_kernels[0].cov(
            pj, jnp.asarray(tq[:, None])), np.float64) * ks[2, 2]
        mean_d = kcross.T @ avec
        vmat = np.linalg.solve(lb, sq[:, None] * kcross)
        var_d = np.diagonal(kqq) - np.sum(vmat * vmat, axis=0)
        mq = np.asarray(m.location(p, space=xq)) - b[2]
        vq = np.asarray(m.kernel_diag(p, space=xq))
        np.testing.assert_allclose(mq, mean_d, atol=5e-3)
        np.testing.assert_allclose(vq, var_d, atol=3e-3)


class TestModelAPI:
    def test_fit_field_rate_and_statistics(self, rng):
        x, y = _count_data(rng)
        m = _model(x, name="FA")
        m.observed(x, y)
        lp0 = float(m.logp(m.params))
        p = m.find_MAP(points=1, max_iters=20, display=False)
        assert float(m.logp(p)) > lp0
        # on-site predictive rate tracks the truth in log space
        tq = np.linspace(0.5, 9.5, 12).astype(np.float32)
        for site in (0, 2):
            xq = with_output(tq[:, None], site)
            rate = np.asarray(m.mean(p, space=xq))
            assert np.all(np.isfinite(rate)) and np.all(rate > 0)
            true_g = 0.8 * np.sin(tq) * np.exp(-SITES[site, 0] / 3.0) + 1.0
            assert np.abs(np.log(rate) - true_g).mean() < 0.7
        # intensity surface at OFF-site locations (paired (t, x) queries,
        # as in SpatioTemporalSSGP.field — grid built host-side)
        xs_off = np.array([0.5, 3.2], np.float32)
        tt = np.repeat(tq, len(xs_off))
        xx = np.tile(xs_off, len(tq))
        lam, lam_var = m.field_rate(tt, xx, params=p)
        lam = lam.reshape(12, 2)
        lam_var = lam_var.reshape(12, 2)
        assert np.all(lam > 0) and np.all(np.isfinite(lam_var))
        # field at a SITE equals the on-site latent (bias excluded)
        fmu, _ = m.field(tq, np.full(12, SITES[2, 0], np.float32),
                         params=p)
        b = np.asarray(g3.hypers.hval(m.f_mixing.b, p))
        onsite = np.asarray(m.location(
            p, space=with_output(tq[:, None], 2))) - b[2]
        np.testing.assert_allclose(fmu, onsite, atol=3e-3)
        # sampler / quantiler / logpredictive through the Poisson link
        xq = with_output(tq[:, None], 1)
        s = m.sampler(p, space=xq, samples=3, noise=True)
        assert s.shape == (12, 3) and np.all(s >= 0)
        assert np.allclose(s, np.round(s))
        q9 = m.quantiler(p, space=xq, q=0.9)
        q1 = m.quantiler(p, space=xq, q=0.1)
        assert np.all(q9 >= q1) and np.all(q1 >= 0)
        tc = m.task_correlations(p)
        assert tc.shape == (len(SITES), len(SITES))
        assert np.allclose(np.diagonal(tc), 1.0, atol=1e-5)

    def test_sharded_nll_matches_plain(self, rng):
        """nll_distributed (8-device virtual mesh) == the plain Laplace
        objective — the inherited build_fn/aux sharding with the
        DERIVED mixing built per device."""
        x, y = _count_data(rng, base=20)
        m = _model(x, name="SH")
        m.observed(x, y)
        p = dict(m.params)
        v_plain = -float(m.loglike(p))
        v_shard = float(m.nll_distributed(p))
        np.testing.assert_allclose(v_shard, v_plain, rtol=1e-5)

    def test_constructor_guards(self):
        t = np.linspace(0, 1, 8).astype(np.float32)
        x = with_output(t[:, None], 0)
        with pytest.raises(ValueError, match="space_kernel"):
            g3.NonGaussianSTSSGP(space=x, kernel=g3.MAT32(x[:, :1]),
                                 name="G1")
        with pytest.raises(ValueError, match="ONE likelihood"):
            g3.NonGaussianSTSSGP(
                space=x, kernel=g3.MAT32(x[:, :1]),
                space_kernel=g3.SE(SITES), sites=SITES,
                likelihood=[g3.PoissonLik(), g3.PoissonLik()], name="G2")
