"""Non-conjugate sparse variational family (models/svgp.py +
models/likelihoods.py): bound correctness against the collapsed SGPR
optimum, robust regression under outliers, probit classification."""

import numpy as np
import jax.numpy as jnp
import pytest

import g3py_tpu as g3
from g3py_tpu.ops.linalg import safe_cholesky, solve_lower_triangular


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _sine_data(rng, n=400, noise=0.1):
    x = np.sort(rng.uniform(0, 10, n)).astype(np.float32).reshape(-1, 1)
    y = (np.sin(x[:, 0]) + noise * rng.standard_normal(n)).astype(np.float32)
    return x, y


class TestGaussianSVP:
    def test_elbo_at_optimal_q_equals_collapsed_bound(self, rng):
        """The conjugate identity that pins the bound arithmetic: at any
        hypers, plugging the ANALYTIC optimal whitened q into the SVP
        ELBO reproduces the SGPR collapsed bound exactly."""
        x, y = _sine_data(rng)
        m = 16
        sgp = g3.SGP(space=x[:4], location=g3.Bias(), kernel=g3.SE(x),
                     inducing=m, learn_inducing=False, name="TQg")
        sgp.observed(x, y)
        pm = sgp.find_MAP(points=1, display=False)
        target = float(sgp.loglike(pm))

        z = np.asarray(sgp.f_inducing.z_fixed)
        svp = g3.SVP(space=x[:4], location=g3.Bias(), kernel=g3.SE(x),
                     likelihood=g3.GaussianLik(), inducing=z,
                     learn_inducing=False, name="TQv")
        svp.observed(x, y)
        p = dict(svp.params_default)
        for k, v in pm.items():
            nk = k.replace("TQg_", "TQv_")
            if nk in p:
                p[nk] = v
        noise_key = [k for k in pm if "Noise" in k][0]
        lik_key = [k for k in p if "GaussLik" in k][0]
        p[lik_key] = pm[noise_key]

        pj = {k: jnp.asarray(v) for k, v in p.items()}
        luu = np.asarray(safe_cholesky(jnp.asarray(
            np.asarray(svp.f_kernel.cov(pj, jnp.asarray(z))))))
        kuf = np.asarray(svp.f_kernel.cov(pj, jnp.asarray(z),
                                          jnp.asarray(x)))
        V = np.asarray(solve_lower_triangular(jnp.asarray(luu),
                                              jnp.asarray(kuf)))
        s2 = float(p[lik_key])
        r = y - np.asarray(svp.f_location(pj, jnp.asarray(x)))
        S = np.linalg.inv(np.eye(m) + V @ V.T / s2)
        qm = S @ (V @ r) / s2
        Lq = np.linalg.cholesky(S)
        ql = np.tril(Lq, -1) + np.diag(np.log(np.diag(Lq)))
        p[[k for k in p if k.endswith("_Q_qm")][0]] = qm.astype(np.float32)
        p[[k for k in p if k.endswith("_Q_ql")][0]] = ql.astype(np.float32)
        got = float(svp.loglike(p))
        assert abs(got - target) / abs(target) < 1e-4

    def test_default_q_gives_zero_kl(self, rng):
        x, y = _sine_data(rng, n=60)
        svp = g3.SVP(space=x[:4], location=g3.Bias(), kernel=g3.SE(x),
                     inducing=8, name="TK0")
        svp.observed(x, y)
        pj = {k: jnp.asarray(v) for k, v in svp.params_default.items()}
        assert abs(float(svp.f_q.kl(pj))) < 1e-6

    def test_fit_svgp_approaches_collapsed_optimum(self, rng):
        x, y = _sine_data(rng)
        svp = g3.SVP(space=x[:4], location=g3.Bias(), kernel=g3.SE(x),
                     likelihood=g3.GaussianLik(), inducing=16, name="TFg")
        svp.observed(x, y)
        params, losses = svp.fit_svgp(batch_size=len(x), steps=3000,
                                      lr=1e-2, display=False)
        assert losses[-1] < losses[0]
        sgp = g3.SGP(space=x[:4], location=g3.Bias(), kernel=g3.SE(x),
                     inducing=16, name="TFc")
        sgp.observed(x, y)
        pm = sgp.find_MAP(points=1, display=False)
        # the uncollapsed bound can only sit below the collapsed optimum;
        # Adam should close to within a few nats
        assert float(svp.logp(params)) > float(sgp.logp(pm)) - 15.0
        pred = svp.predict(params=params, space=x, quantiles=True)
        rmse = float(np.sqrt(np.mean((pred.mean - np.sin(x[:, 0])) ** 2)))
        assert rmse < 0.1
        assert np.all(pred.quantile_up >= pred.quantile_down)

    def test_minibatch_trains(self, rng):
        x, y = _sine_data(rng, n=1000)
        svp = g3.SVP(space=x[:4], location=g3.Bias(), kernel=g3.SE(x),
                     inducing=16, name="TMb")
        svp.observed(x, y)
        params, losses = svp.fit_svgp(batch_size=200, steps=1500, lr=5e-3,
                                      display=False)
        assert losses[-1] < losses[0]
        assert np.isfinite(svp.loglike(params))

    def test_sharded_matches_single_device(self, rng):
        import jax

        x, y = _sine_data(rng, n=1000)
        svp = g3.SVP(space=x[:4], location=g3.Bias(), kernel=g3.SE(x),
                     likelihood=g3.StudentTLik(), inducing=12, name="TSh")
        svp.observed(x, y)
        _p1, l1 = svp.fit_svgp(batch_size=len(x), steps=5, lr=1e-2,
                               display=False)
        _p2, l2 = svp.fit_svgp(batch_size=len(x), steps=5, lr=1e-2,
                               display=False,
                               mesh=min(len(jax.devices()), 8))
        np.testing.assert_allclose(l1, l2, rtol=2e-5)


class TestStudentTSVP:
    def test_robust_to_outliers(self, rng):
        """10% gross outliers: the Student-t SVP's predictive mean must
        track the true function where the Gaussian sparse fit is dragged."""
        n = 500
        x = np.sort(rng.uniform(0, 10, n)).astype(np.float32).reshape(-1, 1)
        f = np.sin(x[:, 0])
        y = (f + 0.1 * rng.standard_normal(n)).astype(np.float32)
        out_idx = rng.choice(n, n // 10, replace=False)
        y[out_idx] += (8.0 * rng.standard_normal(len(out_idx))).astype(
            np.float32)

        svp = g3.SVP(space=x[:4], location=g3.Bias(), kernel=g3.SE(x),
                     likelihood=g3.StudentTLik(), inducing=20, name="TRt")
        svp.observed(x, y)
        pt, _ = svp.fit_svgp(batch_size=n, steps=3000, lr=1e-2,
                             display=False)
        rmse_t = float(np.sqrt(np.mean(
            (np.asarray(svp.mean(pt, x)) - f) ** 2)))

        sgp = g3.SGP(space=x[:4], location=g3.Bias(), kernel=g3.SE(x),
                     inducing=20, name="TRg")
        sgp.observed(x, y)
        pg = sgp.find_MAP(points=2, display=False)
        rmse_g = float(np.sqrt(np.mean(
            (np.asarray(sgp.mean(pg, x)) - f) ** 2)))
        assert rmse_t < 0.2
        assert rmse_t < 0.7 * rmse_g, (rmse_t, rmse_g)

    def test_predictive_variance_finite_and_wider_with_noise(self, rng):
        x, y = _sine_data(rng, n=200)
        svp = g3.SVP(space=x[:4], location=g3.Bias(), kernel=g3.SE(x),
                     likelihood=g3.StudentTLik(), inducing=12, name="TVt")
        svp.observed(x, y)
        p, _ = svp.fit_svgp(batch_size=len(x), steps=800, lr=1e-2,
                            display=False)
        v_lat = np.asarray(svp.variance(p, x, noise=False))
        v_pred = np.asarray(svp.variance(p, x, noise=True))
        assert np.all(np.isfinite(v_pred))
        assert np.all(v_pred >= v_lat - 1e-6)
        # covariance(noise=True) diagonal == variance(noise=True)
        # (conditionally independent t noise adds on the diagonal)
        cov_n = np.asarray(svp.covariance(p, x[:20], noise=True))
        v20 = np.asarray(svp.variance(p, x[:20], noise=True))
        np.testing.assert_allclose(np.diagonal(cov_n), v20, rtol=2e-3,
                                   atol=2e-4)

    def test_reported_variance_finite_even_at_tiny_nu(self, rng):
        """nu <= 2 has infinite t variance mathematically; the REPORTED
        moments clamp at nu_eff=2.05 so bands stay finite (logp exact)."""
        x, y = _sine_data(rng, n=60)
        svp = g3.SVP(space=x[:4], location=g3.Bias(), kernel=g3.SE(x),
                     likelihood=g3.StudentTLik(), inducing=8, name="TVn")
        svp.observed(x, y)
        p = dict(svp.params_default)
        nu_key = [k for k in p if k.endswith("_nu")][0]
        p[nu_key] = np.float32(1.2)
        v = np.asarray(svp.variance(p, x, noise=True))
        assert np.all(np.isfinite(v))
        assert np.isfinite(float(svp.loglike(p)))


class TestBernoulliSVP:
    def _class_data(self, rng, n=400):
        x = np.sort(rng.uniform(-4, 4, n)).astype(np.float32).reshape(-1, 1)
        p_true = 1.0 / (1.0 + np.exp(-3.0 * x[:, 0]))
        y = (rng.uniform(size=n) < p_true).astype(np.float32)
        return x, y, p_true

    def test_classification_learns(self, rng):
        x, y, p_true = self._class_data(rng)
        svp = g3.SVP(space=x[:4], kernel=g3.SE(x),
                     likelihood=g3.BernoulliLik(), inducing=16, name="TCb")
        svp.observed(x, y)
        params, losses = svp.fit_svgp(batch_size=len(x), steps=2000,
                                      lr=1e-2, display=False)
        assert losses[-1] < losses[0]
        probs = np.asarray(svp.mean(params, x))
        assert np.all(probs >= 0.0) and np.all(probs <= 1.0)
        acc = np.mean((probs > 0.5) == (y > 0.5))
        assert acc > 0.85, acc
        # calibration against the generating probabilities
        assert np.mean(np.abs(probs - p_true)) < 0.15

    def test_probit_predictive_is_analytic(self, rng):
        """E[Phi(f)] under Gaussian f: the analytic formula matches
        quadrature through the base class."""
        lik = g3.BernoulliLik()
        mu = np.linspace(-3, 3, 11).astype(np.float32)
        var = np.full(11, 0.7, np.float32)
        m_analytic, _ = lik.predictive_moments({}, jnp.asarray(mu),
                                               jnp.asarray(var))
        m_quad, _ = g3.Likelihood.predictive_moments(lik, {},
                                                     jnp.asarray(mu),
                                                     jnp.asarray(var))
        np.testing.assert_allclose(np.asarray(m_analytic),
                                   np.asarray(m_quad), atol=2e-3)

    def test_logpredictive_and_sampler(self, rng):
        x, y, _ = self._class_data(rng, n=120)
        svp = g3.SVP(space=x[:4], kernel=g3.SE(x),
                     likelihood=g3.BernoulliLik(), inducing=10, name="TLb")
        svp.observed(x, y)
        p, _ = svp.fit_svgp(batch_size=len(x), steps=500, lr=1e-2,
                            display=False)
        lp = svp.logpredictive(p, x, vector=y)
        assert np.isfinite(float(lp)) and float(lp) < 0.0
        draws = svp.sampler(p, x, samples=8, noise=True)
        assert set(np.unique(draws)).issubset({0.0, 1.0})
        qs = svp.quantiler(p, x, q=0.9, noise=True)
        assert np.all(np.isin(qs, [0.0, 1.0]))
        # noise=False: quantiles of the class PROBABILITY (probit-pushed
        # latent quantiles), bounded in [0, 1] and ordered
        q_up = svp.quantiler(p, x, q=0.975)
        q_dn = svp.quantiler(p, x, q=0.025)
        assert np.all(q_up >= q_dn)
        assert q_dn.min() >= 0.0 and q_up.max() <= 1.0


class TestPoissonSVP:
    def test_count_regression_learns(self, rng):
        n = 400
        x = np.sort(rng.uniform(0, 10, n)).astype(np.float32).reshape(-1, 1)
        rate_true = np.exp(1.0 + np.sin(x[:, 0]))
        y = rng.poisson(rate_true).astype(np.float32)
        svp = g3.SVP(space=x[:4], kernel=g3.SE(x),
                     likelihood=g3.PoissonLik(), inducing=16, name="TPo")
        svp.observed(x, y)
        params, losses = svp.fit_svgp(batch_size=n, steps=2000, lr=1e-2,
                                      display=False)
        assert losses[-1] < losses[0]
        m = np.asarray(svp.mean(params, x))
        assert np.all(m > 0)
        # relative rate error modest across the curve
        rel = np.abs(m - rate_true) / rate_true
        assert np.mean(rel) < 0.25, np.mean(rel)
        v = np.asarray(svp.variance(params, x, noise=True))
        assert np.all(v >= m - 1e-3)          # overdispersed vs Poisson
        draws = svp.sampler(params, x, samples=16, noise=True)
        assert np.all(draws >= 0) and np.allclose(draws, np.round(draws))
        q_up = svp.quantiler(params, x, q=0.975)
        assert np.all(q_up > 0)               # rate quantiles, positive

    def test_analytic_expected_logp_matches_quadrature(self, rng):
        lik = g3.PoissonLik()
        y = rng.poisson(3.0, 15).astype(np.float32)
        mu = rng.normal(1.0, 0.5, 15).astype(np.float32)
        var = np.full(15, 0.3, np.float32)
        a = np.asarray(lik.expected_logp({}, jnp.asarray(y),
                                         jnp.asarray(mu), jnp.asarray(var)))
        b = np.asarray(g3.Likelihood.expected_logp(
            lik, {}, jnp.asarray(y), jnp.asarray(mu), jnp.asarray(var)))
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3)

    def test_rejects_non_counts(self, rng):
        n = 40
        x = np.sort(rng.uniform(0, 5, n)).astype(np.float32).reshape(-1, 1)
        y = rng.standard_normal(n).astype(np.float32)
        svp = g3.SVP(space=x[:4], kernel=g3.SE(x),
                     likelihood=g3.PoissonLik(), inducing=8, name="TPr")
        with pytest.raises(ValueError, match="integer counts"):
            svp.observed(x, y)


class TestSVPIntegration:
    def test_sample_hypers_smoke(self, rng):
        x, y = _sine_data(rng, n=80)
        svp = g3.SVP(space=x[:4], location=g3.Bias(), kernel=g3.SE(x),
                     inducing=4, learn_inducing=False, name="TIs")
        svp.observed(x, y)
        p, _ = svp.fit_svgp(batch_size=len(x), steps=400, lr=1e-2,
                            display=False)
        dt = svp.sample_hypers(start=p, samples=30, chains=8,
                               burnin_tol=None, outlayer_percentile=None,
                               seed=0)
        assert len(dt) == 30 * 8
        assert np.all(np.isfinite(dt._ll))

    def test_scores_pipeline(self, rng):
        x, y = _sine_data(rng, n=100)
        svp = g3.SVP(space=x[:4], location=g3.Bias(), kernel=g3.SE(x),
                     inducing=8, name="TIc")
        svp.observed(x, y)
        p, _ = svp.fit_svgp(batch_size=len(x), steps=400, lr=1e-2,
                            display=False)
        svp.set_space(x, hidden=y)
        sc = svp.scores(p, logp=True, logpred=True)
        for k in ("_l1", "_l2", "_nlpd", "_loglike"):
            assert np.isfinite(sc[k]), k


class TestSVPGuards:
    def test_bernoulli_rejects_pm1_labels(self, rng):
        x, _ = _sine_data(rng, n=40)
        y = np.sign(rng.standard_normal(40)).astype(np.float32)  # {-1,+1}
        svp = g3.SVP(space=x[:4], kernel=g3.SE(x),
                     likelihood=g3.BernoulliLik(), inducing=8, name="TPm")
        with pytest.raises(ValueError, match=r"\{0, 1\}"):
            svp.observed(x, y)

    def test_bernoulli_noisy_covariance_unavailable(self, rng):
        x, _ = _sine_data(rng, n=40)
        y = (rng.uniform(size=40) > 0.5).astype(np.float32)
        svp = g3.SVP(space=x[:4], kernel=g3.SE(x),
                     likelihood=g3.BernoulliLik(), inducing=8, name="TPc")
        svp.observed(x, y)
        with pytest.raises(ValueError, match="additive-noise"):
            svp.th_covariance(noise=True)
        # latent covariance still served
        c = np.asarray(svp.covariance(svp.params_default, x[:10]))
        assert np.all(np.isfinite(c))

    def test_noisy_kernel_rejected(self, rng):
        x, y = _sine_data(rng, n=40)
        from g3py_tpu.hypers.kernels import KernelSum, KernelNoise
        k = KernelSum(g3.SE(x), KernelNoise(name="N0"))
        with pytest.raises(ValueError, match="noise-free"):
            g3.SVP(space=x[:4], kernel=k, inducing=8, name="TNg")

    def test_elbo_guarded_nonfinite(self, rng):
        x, y = _sine_data(rng, n=40)
        svp = g3.SVP(space=x[:4], location=g3.Bias(), kernel=g3.SE(x),
                     inducing=8, name="TGd")
        svp.observed(x, y)
        p = dict(svp.params_default)
        qm_key = [k for k in p if k.endswith("_Q_qm")][0]
        p[qm_key] = np.full_like(p[qm_key], np.nan)
        assert float(svp.loglike(p)) <= -1e29


class TestOrdinalSVP:
    """Cumulative-probit ordinal regression (likelihoods.py OrdinalLik).
    No reference counterpart (the reference has no discrete likelihoods
    at all)."""

    def _ordinal_data(self, rng, n=1200):
        x = rng.standard_normal((n, 2)).astype(np.float32)
        f = 1.5 * np.sin(1.5 * x[:, 0]) + 0.8 * x[:, 1]
        g = f + rng.standard_normal(n)
        y = np.digitize(g, [-1.5, 0.0, 1.2]).astype(np.float32)
        return x, y, f

    def test_fit_recovers_cut_spacings_and_classifies(self, rng):
        """The latent f is identified only up to shift (absorbed by the
        Bias location), so the CUT SPACINGS are the recoverable
        quantities; prediction quality vs the Bayes classifier built
        from the true latent is the end-to-end check."""
        x, y, f = self._ordinal_data(rng)
        lik = g3.OrdinalLik(4)
        mod = g3.SVP(space=x[:4], location=g3.Bias(), kernel=g3.SE(x),
                     likelihood=lik, inducing=x[::len(x) // 32][:32],
                     name="TOrd")
        mod.observed(x, y)
        params, losses = mod.fit_svgp(batch_size=256, steps=800, lr=3e-2,
                                      key=0, display=False)
        assert losses[-1] < losses[0]
        pj = {k: np.asarray(v) for k, v in params.items()}
        cuts = np.asarray(lik._cuts(pj))
        assert np.all(np.diff(cuts) > 0)  # ordering by construction
        np.testing.assert_allclose(np.diff(cuts), [1.5, 1.2], atol=0.45)
        probs = mod.predict_proba(params, x[:400])
        assert probs.shape == (400, 4)
        np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)
        acc = np.mean(mod.predict_class(params, x[:400]) == y[:400])
        # Bayes classifier from the TRUE latent (argmax bin prob)
        from scipy import stats
        cdf = stats.norm.cdf(np.array([-1.5, 0.0, 1.2])[None, :]
                             - f[:400, None])
        pb = np.diff(np.concatenate([np.zeros((400, 1)), cdf,
                                     np.ones((400, 1))], axis=1), axis=1)
        bayes = np.mean(np.argmax(pb, -1) == y[:400])
        assert acc > 0.85 * bayes

    def test_analytic_probs_match_quadrature(self, rng):
        lik = g3.OrdinalLik(5)
        lik.check_hypers("T5_")
        p = {k.name: np.asarray(v) for k, v in
             lik.default_hypers().items()}
        mu = np.linspace(-2, 2, 7).astype(np.float32)
        var = np.linspace(0.1, 2.0, 7).astype(np.float32)
        m_a, v_a = lik.predictive_moments(p, mu, var)
        m_q, v_q = g3.Likelihood.predictive_moments(lik, p, mu, var)
        np.testing.assert_allclose(np.asarray(m_a), np.asarray(m_q),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(v_a), np.asarray(v_q),
                                   atol=1e-4)
        probs = np.asarray(lik.probs(p, mu, var))
        np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-6)

    def test_sampler_frequencies_match_analytic_probs(self, rng):
        x, y, _ = self._ordinal_data(rng, n=200)
        lik = g3.OrdinalLik(4)
        mod = g3.SVP(space=x[:4], location=g3.Bias(), kernel=g3.SE(x),
                     likelihood=lik, inducing=8, name="TOs")
        mod.observed(x, y)
        params = mod.params_default
        draws = mod.sampler(params, x[:5], samples=4000, noise=True,
                            rng=np.random.default_rng(3))
        assert set(np.unique(draws)) <= {0.0, 1.0, 2.0, 3.0}
        probs = mod.predict_proba(params, x[:5])
        for i in range(5):
            emp = np.bincount(draws[i].astype(int), minlength=4) / 4000.0
            np.testing.assert_allclose(emp, probs[i], atol=0.04)

    def test_target_validation_and_median(self, rng):
        x, _, _ = self._ordinal_data(rng, n=50)
        mod = g3.SVP(space=x[:4], kernel=g3.SE(x),
                     likelihood=g3.OrdinalLik(3), inducing=8, name="TOv")
        with pytest.raises(ValueError, match="must lie in"):
            mod.observed(x, np.full(50, 5.0, np.float32))
        with pytest.raises(ValueError, match="integer ordinal"):
            mod.observed(x, np.full(50, 0.5, np.float32))
        with pytest.raises(ValueError, match="classes >= 2"):
            g3.OrdinalLik(1)
        assert mod.th_median() is None
        with pytest.raises(ValueError, match="additive-noise"):
            mod.th_covariance(noise=True)
