"""Heteroscedastic sparse variational regression (HeteroscedasticSVP +
HeteroscedasticLik): analytic-ELBO correctness, noise-field recovery,
calibration, serving.  No reference counterpart — the reference's noise
is a single scalar kernel hyper (WN/KernelNoise); this family resolves
WHERE the data is noisy.

Tolerance note: statistics that pass through Luu^{-1} (serving-path
whitened cross-solves) are reproducible across different compiled
programs only to ~1e-2 absolute when the SE lengthscale is much larger
than the inducing spacing (cond(Kuu) ~ 1e7, standard for all
inducing-point methods); the predictive fields themselves are stable."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import g3py_tpu as g3
from g3py_tpu.models.likelihoods import HeteroscedasticLik


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _step_noise_data(rng, n=600):
    """sin signal with a noise-level step at x=5 (8x scale change)."""
    x = np.sort(rng.uniform(0, 10, n)).astype(np.float32).reshape(-1, 1)
    f = np.sin(x[:, 0])
    sd = 0.05 + 0.4 * (x[:, 0] > 5)
    y = (f + sd * rng.standard_normal(n)).astype(np.float32)
    return x, y, f, sd


def _fit(rng, n=600, steps=1500):
    x, y, f, sd = _step_noise_data(rng, n)
    het = g3.HeteroscedasticSVP(space=x, location=g3.Bias(),
                                kernel=g3.SE(x), inducing=24,
                                name=f"HT{n}_{steps}")
    het.observed(x, y, hidden=f)
    params, losses = het.fit_svgp(batch_size=n, steps=steps, lr=2e-2,
                                  display=False)
    return het, params, losses, x, y, f, sd


class TestHeteroscedasticLik:
    def test_expected_logp_matches_mc(self, rng):
        """The analytic ELL (lognormal-moment identity) against brute MC."""
        lik = HeteroscedasticLik()
        lik.check_hypers("T_")
        b = 0.3
        p = {lik.bias.name: np.float32(b)}
        mu = jnp.asarray(rng.standard_normal((4, 2)), jnp.float32)
        var = jnp.asarray(rng.uniform(0.05, 0.5, (4, 2)), jnp.float32)
        y = jnp.asarray(rng.standard_normal(4), jnp.float32)
        ana = np.asarray(lik.expected_logp(p, y, mu, var))
        eps = rng.standard_normal((200000, 4, 2)).astype(np.float32)
        fdr = np.asarray(mu)[None] + np.sqrt(np.asarray(var))[None] * eps
        lv = fdr[..., 1] + b
        mc = (-0.5 * (np.log(2 * np.pi) + lv)
              - 0.5 * (np.asarray(y)[None] - fdr[..., 0]) ** 2
              * np.exp(-lv)).mean(0)
        np.testing.assert_allclose(ana, mc, rtol=2e-2, atol=5e-3)

    def test_predictive_moments(self, rng):
        """E[y] = m1 and Var[y] = v1 + exp(m2 + b + v2/2) exactly."""
        lik = HeteroscedasticLik()
        lik.check_hypers("T_")
        p = {lik.bias.name: np.float32(-1.0)}
        mu = jnp.asarray([[0.5, 0.2]], jnp.float32)
        var = jnp.asarray([[0.1, 0.3]], jnp.float32)
        m, v = lik.predictive_moments(p, mu, var)
        np.testing.assert_allclose(float(m[0]), 0.5, rtol=1e-6)
        np.testing.assert_allclose(float(v[0]),
                                   0.1 + np.exp(0.2 - 1.0 + 0.15),
                                   rtol=1e-5)

    def test_reduces_to_gaussian_at_constant_logvar(self, rng):
        """At v2 = 0 and m2 + b = log s2, the ELL equals GaussianLik's."""
        lik = HeteroscedasticLik()
        lik.check_hypers("T_")
        s2 = 0.07
        p = {lik.bias.name: np.float32(np.log(s2))}
        m1 = jnp.asarray(rng.standard_normal(6), jnp.float32)
        v1 = jnp.asarray(rng.uniform(0.01, 0.2, 6), jnp.float32)
        y = jnp.asarray(rng.standard_normal(6), jnp.float32)
        mu = jnp.stack([m1, jnp.zeros_like(m1)], -1)
        var = jnp.stack([v1, jnp.zeros_like(v1)], -1)
        het_ell = np.asarray(lik.expected_logp(p, y, mu, var))
        glik = g3.GaussianLik(var=np.float32(s2))
        g_ell = np.asarray(glik.expected_logp({}, y, m1, v1))
        np.testing.assert_allclose(het_ell, g_ell, rtol=1e-5)


class TestHeteroscedasticSVP:
    def test_recovers_step_noise_field(self, rng):
        het, params, losses, x, y, f, sd = _fit(rng)
        assert losses[-1] < losses[0] - 1000
        mu = np.asarray(het.mean(params, x))
        assert float(np.sqrt(np.mean((mu - f) ** 2))) < 0.12
        nf = het.noise_field(params, x)
        left = float(nf[x[:, 0] < 4].mean())
        right = float(nf[x[:, 0] > 6].mean())
        # true variances: 0.0025 and 0.2025 (81x apart)
        assert right > 10 * left
        assert 0.5 * 0.0025 < left < 4 * 0.0025
        assert 0.5 * 0.2025 < right < 2 * 0.2025

    def test_calibration_and_statistics(self, rng):
        het, params, _, x, y, f, sd = _fit(rng)
        v_lat = np.asarray(het.variance(params, x))
        v_all = np.asarray(het.variance(params, x, noise=True))
        assert v_lat.shape == (len(x),) and v_all.shape == (len(x),)
        assert np.all(v_all > v_lat)
        # the noisy predictive variance must TRACK the local noise level
        assert (v_all[x[:, 0] > 6].mean()
                > 5 * v_all[x[:, 0] < 4].mean())
        q_hi = het.quantiler(params, q=0.975, noise=True)
        q_lo = het.quantiler(params, q=0.025, noise=True)
        cover = float(np.mean((y >= q_lo) & (y <= q_hi)))
        assert 0.91 <= cover <= 0.99
        d = het.sampler(params, samples=8, noise=True)
        assert d.shape == (len(x), 8)
        # sampled scatter is wider on the noisy side
        assert (d[x[:, 0] > 6].std(axis=1).mean()
                > 3 * d[x[:, 0] < 4].std(axis=1).mean())
        cov = np.asarray(het.covariance(params, x[:40], noise=True))
        assert cov.shape == (40, 40)
        sc = het.scores(params, logp=True, logpred=True, variance=True)
        for k in ("_l2", "_rmse", "_logp", "_nlpd"):
            assert np.isfinite(sc[k]), k

    def test_median_equals_mean(self, rng):
        het, params, _, x, *_ = _fit(rng, steps=200)
        np.testing.assert_allclose(np.asarray(het.median(params, x)),
                                   np.asarray(het.mean(params, x)))

    def test_logpredictive_prefers_heteroscedastic_truth(self, rng):
        """The GH logpredictive must beat a homoscedastic SVP's on
        step-noise data (the whole point of the family)."""
        het, params, _, x, y, f, sd = _fit(rng)
        lp_het = float(het.logpredictive(params, x, vector=y))
        hom = g3.SVP(space=x, location=g3.Bias(), kernel=g3.SE(x),
                     likelihood=g3.GaussianLik(), inducing=24, name="HomC")
        hom.observed(x, y)
        ph, _ = hom.fit_svgp(batch_size=len(x), steps=1500, lr=2e-2,
                             display=False)
        lp_hom = float(hom.logpredictive(ph, x, vector=y))
        assert lp_het > lp_hom + 50.0

    def test_serving_and_export(self, rng, tmp_path):
        het, params, _, x, *_ = _fit(rng, steps=300)
        pr = het.predictor(params)
        mu = np.asarray(het.mean(params, x))
        # Luu^{-1} conditioning: different compiled programs agree to
        # ~1e-2 abs (see module docstring)
        np.testing.assert_allclose(np.asarray(pr.mean(space=x)), mu,
                                   atol=2e-2)
        path = str(tmp_path / "het")
        pr.export(path, var=True)
        ep = g3.load_predictor(path)
        out = ep(x[::6])
        assert set(out.keys()) == {"mean", "std", "variance"}
        np.testing.assert_allclose(out["mean"], mu[::6], atol=2e-2)

    def test_sharded_matches_single_device(self, rng):
        x, y, f, sd = _step_noise_data(rng, n=256)
        het = g3.HeteroscedasticSVP(space=x, kernel=g3.SE(x), inducing=8,
                                    name="HTSh")
        het.observed(x, y)
        _p1, l1 = het.fit_svgp(batch_size=len(x), steps=5, lr=1e-2,
                               display=False)
        _p2, l2 = het.fit_svgp(batch_size=len(x), steps=5, lr=1e-2,
                               display=False,
                               mesh=min(len(jax.devices()), 8))
        np.testing.assert_allclose(l1[0], l2[0], rtol=2e-5)
        np.testing.assert_allclose(l1, l2, rtol=1e-3)
