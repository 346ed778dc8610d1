"""Sampler tests: ensemble/PT/HMC recover known target moments."""

import jax.numpy as jnp
import numpy as np
import pytest

from g3py_tpu.bayesian.samplers import (
    ensemble_sampler,
    pt_sampler,
    hmc_sampler,
    mcmc_ensemble,
)


def gauss_logp(mu, sd):
    mu = jnp.asarray(mu)
    sd = jnp.asarray(sd)

    def logp(p):
        return -0.5 * jnp.sum(((p - mu) / sd) ** 2)

    return logp


class TestEnsemble:
    def test_recovers_gaussian_moments(self):
        mu = np.array([1.0, -2.0], np.float32)
        sd = np.array([0.5, 2.0], np.float32)
        # spread starts: identical walkers make the stretch move degenerate
        p0 = np.random.default_rng(0).standard_normal((32, 2)).astype(np.float32)
        chain, lnprob = ensemble_sampler(gauss_logp(mu, sd), p0, samples=800,
                                         key=0)
        assert chain.shape == (32, 800, 2)
        assert lnprob.shape == (32, 800)
        flat = chain[:, 400:, :].reshape(-1, 2)
        np.testing.assert_allclose(flat.mean(0), mu, atol=0.2)
        np.testing.assert_allclose(flat.std(0), sd, rtol=0.25)

    def test_rejects_odd_chains(self):
        with pytest.raises(ValueError):
            ensemble_sampler(gauss_logp([0.0], [1.0]),
                             np.zeros((3, 1), np.float32), samples=5)

    def test_sharded_runs(self):
        # walker axis over the 8-device CPU mesh
        p0 = np.random.default_rng(0).standard_normal((16, 2)).astype(np.float32)
        chain, lnprob = ensemble_sampler(gauss_logp([0.0, 0.0], [1.0, 1.0]), p0,
                                         samples=50, key=1, shard=True)
        assert np.all(np.isfinite(lnprob[:, -1]))


class TestParallelTempering:
    def test_multimodal_mixing(self):
        # two well-separated modes: PT should visit both
        def loglike(p):
            m = 4.0
            return jnp.logaddexp(-0.5 * jnp.sum((p - m) ** 2),
                                 -0.5 * jnp.sum((p + m) ** 2))

        def logprior(p):
            return -0.5 * jnp.sum((p / 10.0) ** 2)

        rng = np.random.default_rng(0)
        p0 = rng.standard_normal((4, 16, 1)).astype(np.float32) * 6
        chain, lnprob = pt_sampler(loglike, logprior, p0, samples=600, key=0)
        assert chain.shape == (16, 600, 1)
        flat = chain[:, 300:, 0].ravel()
        # both modes visited
        assert (flat > 2).mean() > 0.1
        assert (flat < -2).mean() > 0.1


class TestHMC:
    def test_recovers_gaussian(self):
        chain, lnprob = hmc_sampler(gauss_logp([0.5], [1.5]),
                                    np.zeros(1, np.float32), samples=2000,
                                    key=0, step_size=0.3, leapfrog_steps=8,
                                    chains=4)
        assert chain.shape == (4, 2000, 1)
        flat = chain[:, 1000:, 0].ravel()
        np.testing.assert_allclose(flat.mean(), 0.5, atol=0.2)
        np.testing.assert_allclose(flat.std(), 1.5, rtol=0.25)


class TestDriver:
    def test_mcmc_ensemble_jitters_start(self):
        lnprob, chain = mcmc_ensemble(2, samples=50, chains=8,
                                      start=np.array([1.0, 1.0], np.float32),
                                      logp=gauss_logp([1.0, 1.0], [1.0, 1.0]),
                                      seed=3)
        assert chain.shape == (8, 50, 2)
        # start jitter must not leave all walkers identical
        assert np.std(chain[:, 0, 0]) > 0

    def test_mcmc_ensemble_tempered(self):
        lnprob, chain = mcmc_ensemble(
            1, samples=50, chains=8, ntemps=3,
            start=np.array([0.5], np.float32),
            loglike=gauss_logp([0.0], [1.0]),
            logprior=gauss_logp([0.0], [3.0]), seed=4)
        assert chain.shape == (8, 50, 1)
        assert np.all(np.isfinite(lnprob))


class TestNUTS:
    def test_recovers_correlated_gaussian(self):
        import jax.numpy as jnp
        from g3py_tpu.bayesian.nuts import nuts_sampler

        cov = np.array([[1.0, 0.8], [0.8, 2.0]], np.float32)
        prec = jnp.asarray(np.linalg.inv(cov))

        def logp(p):
            return -0.5 * p @ prec @ p

        chain, lnprob, info = nuts_sampler(logp, np.zeros(2, np.float32),
                                           samples=800, warmup=200, key=0,
                                           chains=2)
        flat = chain[:, 300:, :].reshape(-1, 2)
        got = np.cov(flat.T)
        np.testing.assert_allclose(got, cov, atol=0.4)
        assert np.all(info["divergences"] == 0)
        assert np.all(info["accept_rate"] > 0.5)

    def test_chunked_dispatch_matches_monolithic(self):
        """chunk= splits warmup+sampling into bounded dispatches (the
        big-fused-program crash-envelope fix).  Same per-step algorithm:
        moments match the fused path, dense mass adapts, zero
        divergences."""
        import jax.numpy as jnp
        from g3py_tpu.bayesian.nuts import nuts_sampler

        cov = np.array([[1.0, 0.8], [0.8, 2.0]], np.float32)
        prec = jnp.asarray(np.linalg.inv(cov))

        def logp(p):
            return -0.5 * p @ prec @ p

        chain, lnprob, info = nuts_sampler(logp, np.zeros(2, np.float32),
                                           samples=800, warmup=200, key=0,
                                           chains=2, adapt_mass="dense",
                                           chunk=64)
        assert chain.shape == (2, 800, 2)
        flat = chain[:, 300:, :].reshape(-1, 2)
        np.testing.assert_allclose(np.cov(flat.T), cov, atol=0.4)
        assert np.all(info["divergences"] == 0)
        assert np.all(info["accept_rate"] > 0.5)
        assert np.all(np.isfinite(lnprob))

    def test_dense_mass_cuts_tree_depth(self):
        """adapt_mass='dense' (dense_e metric): on a strongly correlated
        gaussian the fitted full covariance decorrelates the dynamics —
        correct moments at materially lower tree depth (fewer gradient
        evals per effective sample) than the diagonal metric."""
        import jax.numpy as jnp
        from g3py_tpu.bayesian.nuts import nuts_sampler

        cov = np.array([[1.0, 0.95, 0.0], [0.95, 1.0, 0.0],
                        [0.0, 0.0, 0.01]], np.float32)
        prec = jnp.asarray(np.linalg.inv(cov).astype(np.float32))

        def logp(p):
            return -0.5 * p @ prec @ p

        depths = {}
        for mass in (True, "dense"):
            chain, _, info = nuts_sampler(logp, np.zeros(3, np.float32),
                                          samples=1200, warmup=400, key=0,
                                          chains=2, adapt_mass=mass)
            got = np.cov(chain[:, 400:, :].reshape(-1, 3).T)
            np.testing.assert_allclose(got, cov, atol=0.35,
                                       err_msg=str(mass))
            assert np.all(info["divergences"] == 0)
            depths[mass] = float(info["mean_tree_depth"].mean())
        assert depths["dense"] < depths[True] - 0.5, depths

    def test_gp_hypers_via_nuts(self, rng):
        import g3py_tpu as g3

        x = np.linspace(0, 6, 16).astype(np.float32).reshape(-1, 1)
        y = np.sin(x[:, 0]).astype(np.float32)
        gp = g3.GP(space=x, location=g3.Zero(), kernel=g3.SE(x), name="NUTSGP")
        gp.observed(x, y)
        dt = gp.sample_hypers(start=gp.params_default, samples=40, chains=2,
                              method="nuts", nuts_warmup=40, burnin_tol=None,
                              outlayer_percentile=None, seed=0)
        assert len(dt) == 80
        assert np.all(np.isfinite(dt._ll))


def _funnel_draws(m, d, seed=0):
    """Exact draws from Neal's funnel: v~N(0,3^2), x_i|v ~ N(0, e^v)."""
    rng = np.random.default_rng(seed)
    v = rng.normal(0.0, 3.0, size=(m,)).astype(np.float32)
    x = (rng.standard_normal((m, d - 1)) * np.exp(v / 2)[:, None]
         ).astype(np.float32)
    return np.concatenate([v[:, None], x], axis=1)


def _funnel_logp(d):
    def logp(p):
        v, x = p[0], p[1:]
        return (-0.5 * (v / 3.0) ** 2
                - 0.5 * jnp.sum(x * x) * jnp.exp(-v)
                - 0.5 * (d - 1) * v)

    return logp


class TestNeuTra:
    def test_flow_round_trip(self):
        from g3py_tpu.bayesian.neutra import (fit_flow, flow_forward,
                                              flow_inverse)

        draws = _funnel_draws(512, 3, seed=1)
        flow, losses = fit_flow(draws, steps=50, key=0)
        # fitted (non-identity) couplings must still invert exactly
        theta = np.random.default_rng(2).standard_normal((7, 3)).astype(
            np.float32) * 2
        z, ld_inv = flow_inverse(flow, jnp.asarray(theta))
        theta2, ld_fwd = flow_forward(flow, z)
        np.testing.assert_allclose(np.asarray(theta2), theta, rtol=2e-4,
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(ld_fwd), -np.asarray(ld_inv),
                                   rtol=1e-4, atol=1e-4)
        # training reduced the NLL
        assert losses[-1] < losses[0]

    def test_whitening_only_flow_is_dense_metric(self):
        from g3py_tpu.bayesian.neutra import fit_flow, flow_inverse

        rng = np.random.default_rng(3)
        cov = np.array([[2.0, 1.2], [1.2, 1.5]], np.float32)
        draws = (rng.multivariate_normal([1.0, -2.0], cov, size=4000)
                 ).astype(np.float32)
        flow, _ = fit_flow(draws, n_couplings=0)
        z, _ = flow_inverse(flow, jnp.asarray(draws))
        z = np.asarray(z)
        np.testing.assert_allclose(z.mean(0), 0.0, atol=0.05)
        np.testing.assert_allclose(np.cov(z.T), np.eye(2), atol=0.08)

    def test_neutra_beats_nuts_on_funnel(self):
        """Neal's funnel: plain NUTS diverges in the neck and under-explores
        v; through the fitted transport the latent posterior is near-normal,
        divergences drop and std(v) is recovered."""
        from g3py_tpu.bayesian.neutra import neutra_nuts
        from g3py_tpu.bayesian.nuts import nuts_sampler

        d = 2
        logp = _funnel_logp(d)
        draws = _funnel_draws(1024, d, seed=4)

        chain_p, _, info_p = nuts_sampler(
            logp, np.zeros(d, np.float32), 600, warmup=200, key=0, chains=2)
        chain_n, lnprob_n, info_n = neutra_nuts(
            logp, draws, 600, chains=2, warmup=200, key=0, fit_steps=400)

        assert chain_n.shape == (2, 600, d)
        assert np.all(np.isfinite(lnprob_n))
        div_p = int(np.sum(info_p["divergences"]))
        div_n = int(np.sum(info_n["divergences"]))
        assert div_n <= div_p, (div_n, div_p)
        v_n = chain_n[:, :, 0].ravel()
        # plain NUTS typically reports std(v) far below 3; the transport
        # must explore the neck (generous tolerance: short chains)
        assert np.std(v_n) > 2.0, np.std(v_n)
        assert abs(np.mean(v_n)) < 1.2, np.mean(v_n)

    def test_sample_hypers_neutra(self, rng):
        import g3py_tpu as g3

        x = np.linspace(0, 6, 16).astype(np.float32).reshape(-1, 1)
        y = np.sin(x[:, 0]).astype(np.float32)
        gp = g3.GP(space=x, location=g3.Zero(), kernel=g3.SE(x),
                   name="NeuTraGP")
        gp.observed(x, y)
        dt = gp.sample_hypers(start=gp.params_default, samples=30, chains=2,
                              method="neutra", nuts_warmup=30,
                              neutra_warmup=60, burnin_tol=None,
                              outlayer_percentile=None, seed=0)
        assert len(dt) == 60
        assert np.all(np.isfinite(dt._ll))


class TestADVI:
    def test_recovers_correlated_gaussian(self):
        """Full-rank ADVI on a correlated Gaussian target recovers mean
        AND covariance (the variational optimum is exact there)."""
        from g3py_tpu.bayesian.advi import fit_advi, advi_draws

        cov = np.array([[1.0, 0.8], [0.8, 1.0]], np.float32)
        prec = jnp.asarray(np.linalg.inv(cov))
        mu = jnp.asarray([1.5, -0.5])

        def logp(p):
            d = p - mu
            return -0.5 * d @ prec @ d

        fit = fit_advi(logp, np.zeros(2, np.float32), steps=1500,
                       mc=16, lr=0.05, seed=1)
        np.testing.assert_allclose(fit.mu, np.asarray(mu), atol=0.08)
        cov_q = fit.scale_tril @ fit.scale_tril.T
        np.testing.assert_allclose(cov_q, cov, atol=0.15)
        draws = advi_draws(fit, 2, 4000, seed=3)
        assert draws.shape == (2, 4000, 2)
        flat = draws.reshape(-1, 2)
        np.testing.assert_allclose(flat.mean(axis=0), np.asarray(mu),
                                   atol=0.08)
        np.testing.assert_allclose(np.cov(flat.T), cov, atol=0.2)

    def test_mean_field_understates_correlation(self):
        """Mean-field q has diagonal covariance by construction."""
        from g3py_tpu.bayesian.advi import fit_advi

        cov = np.array([[1.0, 0.9], [0.9, 1.0]], np.float32)
        prec = jnp.asarray(np.linalg.inv(cov))

        def logp(p):
            return -0.5 * p @ prec @ p

        fit = fit_advi(logp, np.zeros(2, np.float32), steps=800,
                       mc=8, lr=0.05, full_rank=False, seed=0)
        off = fit.scale_tril[1, 0]
        assert off == 0.0
        # mean-field variances shrink toward 1/prec_ii < 1
        var = np.diagonal(fit.scale_tril) ** 2
        assert np.all(var < 0.5)

    def test_sample_hypers_advi(self, rng):
        """method='advi' through the model API: datatrace with finite
        lls whose param means sit near the MAP, and the averaging
        machinery consumes it unchanged."""
        import g3py_tpu as g3

        x = np.linspace(0, 6, 16).astype(np.float32).reshape(-1, 1)
        y = (np.sin(x[:, 0]) + 0.1
             * rng.standard_normal(16)).astype(np.float32)
        gp = g3.GP(space=x, location=g3.Zero(), kernel=g3.SE(x),
                   name="ADVIGP")
        gp.observed(x, y)
        pmap = gp.find_MAP(points=1, display=False)
        dt = gp.sample_hypers(start=pmap, samples=40, chains=2,
                              method="advi", advi_steps=400,
                              burnin_tol=None, outlayer_percentile=None,
                              seed=0)
        assert len(dt) == 80
        assert np.all(np.isfinite(dt._ll))
        lp_map = float(gp.logp(pmap))
        # q centers at the mode: best draw's logp within a few nats
        assert dt._ll.max() > lp_map - 5.0
        avg = gp.average(dt, space=x)
        assert np.all(np.isfinite(np.asarray(avg.mean)))


class TestNoncenteredReparam:
    """sample_hypers(reparam='noncentered'): amplitude hypers sampled
    relative to the mapping-dependent data scale — a unit-Jacobian shear
    of the unconstrained vector (models/elliptical.py
    _noncentered_sampling_shear)."""

    def _wgp(self):
        import g3py_tpu as g3

        rng = np.random.default_rng(0)
        x = np.linspace(0, 6, 24).astype(np.float32).reshape(-1, 1)
        f = np.sin(x[:, 0]) + 1.5
        y = np.exp(0.8 * f + 0.05 * rng.standard_normal(24)
                   ).astype(np.float32)
        wgp = g3.WGP(space=x, location=g3.Bias(), kernel=g3.SE(x),
                     mapping=g3.BoxCoxLinear(y), name="NCPWGP")
        wgp.observed(x, y)
        return wgp

    def test_shear_is_exact_reparameterization(self):
        import jax.numpy as jnp

        wgp = self._wgp()
        shear, unshear = wgp._noncentered_sampling_shear()
        logp_tr, _, _ = wgp._sampling_logps(prior=False)
        reg = wgp.active
        u = jnp.asarray(reg.dict_to_array(wgp.params_default))
        # round trip
        v = unshear(u)
        np.testing.assert_allclose(np.asarray(shear(v)), np.asarray(u),
                                   rtol=1e-5, atol=1e-5)
        # the wrapped density evaluated at the sheared point equals the
        # original density (unit-Jacobian map)
        np.testing.assert_allclose(float(logp_tr(shear(v))),
                                   float(logp_tr(u)), rtol=1e-5)
        # the shear moves ONLY the amplitude (\*_var) dims
        moved = np.flatnonzero(np.abs(np.asarray(v - u)) > 1e-7)
        names = [reg.param_names()[reg.sampling_dims[i]] for i in moved]
        assert names and all(n.endswith("_var") for n in names)

    def test_sample_hypers_noncentered_runs(self):
        wgp = self._wgp()
        dt = wgp.sample_hypers(start=wgp.params_default, samples=30,
                               chains=2, method="nuts", nuts_warmup=30,
                               reparam="noncentered", burnin_tol=None,
                               outlayer_percentile=None, seed=0)
        assert len(dt) == 60
        assert np.all(np.isfinite(dt._ll))
        # datatrace rows are in the MODEL parameterization: re-evaluating
        # the model logp at a row reproduces the recorded _ll
        reg = wgp.active
        row = dt.iloc[7]
        u = np.asarray([row[c] for c in reg.param_names()], np.float32)
        lp = wgp._array_logp_sampling(u[np.asarray(reg.sampling_dims)])
        np.testing.assert_allclose(lp, row._ll, rtol=1e-4, atol=1e-3)

    def test_plain_gp_reparam_applies(self):
        """Identity mapping: the shear is a constant recentering by
        log var(y) — harmless and still exact."""
        import g3py_tpu as g3

        x = np.linspace(0, 6, 16).astype(np.float32).reshape(-1, 1)
        y = np.sin(x[:, 0]).astype(np.float32)
        gp = g3.GP(space=x, kernel=g3.SE(x), name="NCPGP")
        gp.observed(x, y)
        dt = gp.sample_hypers(start=gp.params_default, samples=20, chains=2,
                              method="ensemble", reparam="noncentered",
                              burnin_tol=None, outlayer_percentile=None,
                              seed=0)
        assert np.all(np.isfinite(dt._ll))
