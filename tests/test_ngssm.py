"""NonGaussianSSGP: Laplace inference on the exact state-space prior.

Pinning claims: (1) with GaussianLik the Laplace evidence and posterior
are EXACT and equal StateSpaceGP's; (2) for Poisson counts the evidence
and posterior moments match an independent dense-numpy Laplace
implementation (Rasmussen & Williams alg. 3.1 / eq. 3.32); (3) the full
model API (find_MAP, statistics through the likelihood link, sampler,
quantiler, scores) carries the family.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.special import gammaln

import g3py_tpu as g3


@pytest.fixture
def rng():
    return np.random.default_rng(5)


def _times(rng, n=110):
    return np.sort(rng.uniform(0, 10, n)).reshape(-1, 1).astype(
        np.float32)


class TestLaplace:
    def test_gaussian_likelihood_is_exact_ssgp(self, rng):
        """Newton converges in one step for a Gaussian likelihood; the
        Laplace evidence IS the exact Gaussian evidence — identical to
        the conjugate StateSpaceGP (same kernel hypers, var mapped
        between the GaussLik/KernelNoise slots)."""
        t = _times(rng)
        y = (np.sin(t[:, 0])
             + 0.2 * rng.standard_normal(len(t))).astype(np.float32)
        ng = g3.NonGaussianSSGP(space=t, kernel=g3.MAT32(t),
                                likelihood=g3.GaussianLik(), name="NG")
        ss = g3.StateSpaceGP(space=t, kernel=g3.MAT32(t), name="SS")
        ng.observed(t, y)
        ss.observed(t, y)
        png, pss = dict(ng.params), dict(ss.params)
        png["NG_GaussLik_var"] = np.float32(0.04)
        pss["SS_Noise_var"] = np.float32(0.04)
        for k in ("MAT32_var", "MAT32_rate"):
            pss["SS_" + k] = png["NG_" + k]
        l_ng, l_ss = float(ng.loglike(png)), float(ss.loglike(pss))
        assert abs(l_ng - l_ss) < 2e-4 * max(1.0, abs(l_ss))
        tq = np.linspace(0, 10, 25).reshape(-1, 1).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(ng.location(png, space=tq)),
            np.asarray(ss.location(pss, space=tq)), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(ng.kernel_diag(png, space=tq)),
            np.asarray(ss.kernel_diag(pss, space=tq)), atol=1e-5)

    def test_poisson_matches_dense_laplace_oracle(self, rng):
        """Evidence + posterior latent moments vs an independent dense
        Newton/Laplace in numpy f64 (R&W alg. 3.1, eq. 3.32)."""
        t = _times(rng)
        n = len(t)
        f_true = np.sin(t[:, 0]) + 0.8
        y = rng.poisson(np.exp(f_true)).astype(np.float32)
        ng = g3.NonGaussianSSGP(space=t, kernel=g3.MAT32(t),
                                likelihood=g3.PoissonLik(), name="NP")
        ng.observed(t, y)
        p = ng.params
        pj = {k: jnp.asarray(v) for k, v in p.items()}
        K = np.asarray(ng.f_kernel.cov(pj, jnp.asarray(t)), np.float64)
        K += 1e-8 * np.eye(n)
        y64 = np.asarray(y, np.float64)
        f = np.zeros(n)
        for _ in range(50):
            w = np.exp(f)
            b = w * f + (y64 - np.exp(f))
            sq = np.sqrt(w)
            bmat = np.eye(n) + sq[:, None] * K * sq[None, :]
            lb = np.linalg.cholesky(bmat)
            avec = b - sq * np.linalg.solve(
                lb.T, np.linalg.solve(lb, sq * (K @ b)))
            f = K @ avec
        ll_data = float(np.sum(y64 * f - np.exp(f) - gammaln(y64 + 1)))
        log_z = (ll_data - 0.5 * float(avec @ f)
                 - float(np.sum(np.log(np.diagonal(lb)))))
        ll_ng = float(ng.loglike(p))
        assert abs(ll_ng - log_z) < 2e-4 * max(1.0, abs(log_z))
        # posterior latent moments at the observed rows
        m_q = np.asarray(ng.location(p, space=t))
        v_q = np.asarray(ng.kernel_diag(p, space=t))
        sq = np.sqrt(np.exp(f))
        lb = np.linalg.cholesky(np.eye(n) + sq[:, None] * K * sq[None, :])
        vmat = np.linalg.solve(lb, sq[:, None] * K)
        var_d = np.diagonal(K) - np.sum(vmat * vmat, axis=0)
        np.testing.assert_allclose(m_q, f, atol=5e-3)
        np.testing.assert_allclose(v_q, var_d, atol=2e-3)
        # the evidence gradient is finite in every hyper
        g = np.asarray(ng.dlogp(p))
        assert np.all(np.isfinite(g)) and np.any(g != 0)

    def test_model_api_poisson(self, rng):
        t = _times(rng, n=90)
        f_true = np.sin(t[:, 0]) + 0.8
        y = rng.poisson(np.exp(f_true)).astype(np.float32)
        ng = g3.NonGaussianSSGP(space=t, kernel=g3.MAT32(t),
                                likelihood=g3.PoissonLik(), name="NP")
        ng.observed(t, y)
        lp0 = float(ng.logp(ng.params))
        p = ng.find_MAP(points=1, display=False)
        assert float(ng.logp(p)) >= lp0 - 1e-3
        tq = np.linspace(0.5, 9.5, 20).reshape(-1, 1).astype(np.float32)
        rate = np.asarray(ng.mean(p, space=tq))
        assert np.all(rate > 0)
        rmse = float(np.sqrt(np.mean(
            (rate - np.exp(np.sin(tq[:, 0]) + 0.8)) ** 2)))
        assert rmse < 1.2
        vy = np.asarray(ng.variance(p, space=tq, noise=True))
        vf = np.asarray(ng.variance(p, space=tq))
        assert np.all(vy > 0) and np.all(vf > 0)
        qh = ng.quantiler(p, space=tq, q=0.975)
        ql = ng.quantiler(p, space=tq, q=0.025)
        assert np.all(qh > ql) and np.all(ql > 0)   # rate quantiles
        lp = float(ng.logpredictive(p, space=t, vector=y))
        assert np.isfinite(lp)
        draws = ng.sampler(p, space=tq, samples=6, noise=True, seed=1)
        assert draws.shape == (20, 6)
        assert np.all(draws >= 0) and np.allclose(draws, np.rint(draws))
        sc = ng.scores(p, space=t, hidden=y, logpred=True)
        assert np.isfinite(sc["_nlpd"]) and np.isfinite(sc["_l1"])

    def test_bernoulli_classification(self, rng):
        t = _times(rng, n=100)
        p_true = 1.0 / (1.0 + np.exp(-3.0 * np.sin(t[:, 0])))
        y = (rng.uniform(size=len(t)) < p_true).astype(np.float32)
        ng = g3.NonGaussianSSGP(space=t, kernel=g3.MAT52(t),
                                likelihood=g3.BernoulliLik(), name="NB")
        ng.observed(t, y)
        p = ng.find_MAP(points=1, display=False)
        prob = np.asarray(ng.mean(p, space=t))
        assert np.all((prob > 0) & (prob < 1))
        acc = float(np.mean((prob > 0.5) == (y > 0.5)))
        assert acc > 0.8
        # quantiles of the class probability stay in (0, 1)
        qh = ng.quantiler(p, space=t, q=0.975)
        assert np.all((qh > 0) & (qh < 1))

    def test_guards(self, rng):
        t = _times(rng, n=20)
        with pytest.raises(ValueError, match="Likelihood"):
            g3.NonGaussianSSGP(space=t, kernel=g3.MAT32(t),
                               likelihood="poisson")
        ng = g3.NonGaussianSSGP(space=t, kernel=g3.MAT32(t),
                                likelihood=g3.PoissonLik(), name="NP")
        with pytest.raises(ValueError, match="counts"):
            ng.observed(t, -np.ones(len(t), np.float32))
        ng.observed(t, rng.poisson(1.0, len(t)).astype(np.float32))


class TestNegBinomial:
    def test_matches_dense_laplace_oracle(self, rng):
        """NegBinomial evidence vs an independent dense Newton/Laplace
        in numpy f64 (R&W alg. 3.1 with W = (y+r) s(1-s),
        d1 = y - (y+r) s, s = m/(r+m))."""
        t = _times(rng)
        n = len(t)
        f_true = np.sin(t[:, 0]) + 0.8
        r = 2.5
        m_true = np.exp(f_true)
        y = rng.negative_binomial(r, r / (r + m_true)).astype(np.float32)
        ng = g3.NonGaussianSSGP(space=t, kernel=g3.MAT32(t),
                                likelihood=g3.NegBinomialLik(), name="NB")
        ng.observed(t, y)
        p = dict(ng.params)
        p["NB_NegBinLik_dispersion"] = np.float32(r)
        pj = {k: jnp.asarray(v) for k, v in p.items()}
        K = np.asarray(ng.f_kernel.cov(pj, jnp.asarray(t)), np.float64)
        K += 1e-8 * np.eye(n)
        y64 = np.asarray(y, np.float64)
        f = np.zeros(n)
        for _ in range(80):
            mm = np.exp(f)
            s = mm / (r + mm)
            w = (y64 + r) * s * (1.0 - s)
            d1 = y64 - (y64 + r) * s
            b = w * f + d1
            sq = np.sqrt(w)
            bmat = np.eye(n) + sq[:, None] * K * sq[None, :]
            lb = np.linalg.cholesky(bmat)
            avec = b - sq * np.linalg.solve(
                lb.T, np.linalg.solve(lb, sq * (K @ b)))
            f = K @ avec
        mm = np.exp(f)
        ll_data = float(np.sum(
            gammaln(y64 + r) - gammaln(r) - gammaln(y64 + 1.0)
            + r * np.log(r) + y64 * f - (y64 + r) * np.log(r + mm)))
        log_z = (ll_data - 0.5 * float(avec @ f)
                 - float(np.sum(np.log(np.diagonal(lb)))))
        ll_ng = float(ng.loglike(p))
        assert abs(ll_ng - log_z) < 2e-4 * max(1.0, abs(log_z))
        g = np.asarray(ng.dlogp(p))
        assert np.all(np.isfinite(g)) and np.any(g != 0)

    def test_model_api_and_dispersion_recovery(self, rng):
        """find_MAP trains the dispersion to a sane value on strongly
        overdispersed counts; statistics/sampler/quantiler carry the
        discrete-link conventions (inherited from PoissonLik)."""
        t = np.sort(rng.uniform(0, 40, 500)).reshape(-1, 1).astype(
            np.float32)
        f_true = np.sin(t[:, 0] / 2.0) + 1.2
        r = 1.5
        y = rng.negative_binomial(
            r, r / (r + np.exp(f_true))).astype(np.float32)
        ng = g3.NonGaussianSSGP(space=t, kernel=g3.MAT32(t),
                                likelihood=g3.NegBinomialLik(), name="NR")
        ng.observed(t, y)
        lp0 = float(ng.logp(ng.params))
        p = ng.find_MAP(points=1, max_iters=40, display=False)
        assert float(ng.logp(p)) > lp0
        r_hat = float(p["NR_NegBinLik_dispersion"])
        assert 0.5 < r_hat < 6.0           # true 1.5; Poisson limit >> 10
        tq = np.linspace(1, 39, 25).reshape(-1, 1).astype(np.float32)
        rate = np.asarray(ng.mean(p, space=tq))
        assert np.all(np.isfinite(rate)) and np.all(rate > 0)
        # predictive variance exceeds the rate: overdispersion survives
        # into the reported moments
        var = np.asarray(ng.variance(p, space=tq, noise=True))
        assert np.all(var > rate)
        q1, q9 = (ng.quantiler(p, space=tq, q=qq) for qq in (0.1, 0.9))
        assert np.all(q9 >= q1)
        s = ng.sampler(p, space=tq, samples=3, noise=True)
        assert s.shape == (25, 3) and np.all(s >= 0)
        assert np.allclose(s, np.round(s))
        with pytest.raises(ValueError, match="counts"):
            g3.NegBinomialLik().check_targets(-np.ones(3, np.float32))


class TestScaling:
    def test_chunked_matches_plain(self, rng):
        """Above settings.ssm_chunk_threshold every Newton pass and the
        evidence run as the chunked block scans: evidence, gradient and
        posterior statistics match the plain-path values."""
        from g3py_tpu.config import settings
        t = _times(rng, n=150)
        f_true = np.sin(t[:, 0]) + 0.5
        y = rng.poisson(np.exp(f_true)).astype(np.float32)
        ng = g3.NonGaussianSSGP(space=t, kernel=g3.MAT32(t),
                                likelihood=g3.PoissonLik(), name="NC")
        ng.observed(t, y)
        p = ng.params
        ll_plain = float(ng.loglike(p))
        tq = np.linspace(0.5, 9.5, 17).reshape(-1, 1).astype(np.float32)
        mean_plain = np.asarray(ng.mean(p, space=tq))
        var_plain = np.asarray(ng.variance(p, space=tq))
        old_thr, old_chunk = (settings.ssm_chunk_threshold,
                              settings.ssm_chunk)
        try:
            settings.ssm_chunk_threshold, settings.ssm_chunk = 64, 100
            ng2 = g3.NonGaussianSSGP(space=t, kernel=g3.MAT32(t),
                                     likelihood=g3.PoissonLik(),
                                     name="ND")
            ng2.observed(t, y)
            p2 = {k.replace("NC", "ND", 1): v for k, v in p.items()}
            ll_chunk = float(ng2.loglike(p2))
            g = np.asarray(ng2.dlogp(p2))
            mean_c = np.asarray(ng2.mean(p2, space=tq))
            var_c = np.asarray(ng2.variance(p2, space=tq))
        finally:
            settings.ssm_chunk_threshold = old_thr
            settings.ssm_chunk = old_chunk
        np.testing.assert_allclose(ll_chunk, ll_plain, rtol=2e-5)
        assert np.all(np.isfinite(g)) and np.any(g != 0)
        np.testing.assert_allclose(mean_c, mean_plain, atol=2e-4)
        np.testing.assert_allclose(var_c, var_plain, atol=3e-4)

    def test_sharded_matches_plain(self, rng):
        """nll_distributed (8-device virtual mesh): the whole Laplace
        loop as ONE SPMD program == -loglike, value AND gradient, at n
        that does not divide over the mesh (pad path)."""
        t = _times(rng, n=117)
        f_true = np.sin(t[:, 0]) + 0.5
        y = rng.poisson(np.exp(f_true)).astype(np.float32)
        ng = g3.NonGaussianSSGP(space=t, kernel=g3.MAT32(t),
                                likelihood=g3.PoissonLik(), name="NS")
        ng.observed(t, y)
        p = dict(ng.params)
        v_plain = -float(ng.loglike(p))
        v_shard = float(ng.nll_distributed(p))
        np.testing.assert_allclose(v_shard, v_plain, rtol=1e-5)

        reg = ng.active
        pure = ng._logp_pure(prior=False)
        xj = jnp.asarray(t, jnp.float32)
        yj = jnp.asarray(y, jnp.float32)
        vec0 = jnp.zeros(0, jnp.float32)
        u = jnp.asarray(reg.dict_to_array(p))
        g1 = np.asarray(jax.grad(
            lambda ww: -pure(reg.array_to_dict_jax(ww), xj, xj, yj,
                             vec0))(u))
        g2 = np.asarray(jax.grad(
            lambda ww: ng.nll_distributed(
                reg.array_to_dict_jax(ww)))(u))
        np.testing.assert_allclose(g2, g1, rtol=1e-4,
                                   atol=1e-5 * np.max(np.abs(g1)))

    def test_find_map_distributed_improves(self, rng):
        t = _times(rng, n=60)
        y = rng.poisson(np.exp(np.sin(t[:, 0]))).astype(np.float32)
        ng = g3.NonGaussianSSGP(space=t, kernel=g3.MAT32(t),
                                likelihood=g3.PoissonLik(), name="NF")
        ng.observed(t, y)
        lp0 = float(ng.logp(ng.params))
        p = ng.find_MAP(engine="distributed", points=1, max_iters=10,
                        display=False)
        lp1 = float(ng.logp(p))
        assert np.isfinite(lp1) and lp1 > lp0
