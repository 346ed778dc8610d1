"""Sparse (inducing-point) GP family: SGPR collapsed bound.

No reference counterpart (the reference subsamples instead,
data.py:129-190); properties pinned here are the standard SGPR contracts:
the ELBO lower-bounds the exact loglikelihood, is tight at Z = X, the
sparse posterior collapses to the exact one at Z = X, inducing inputs
train by gradient, and the serving state (predictor + O(m^2) streaming
updates) matches direct evaluation.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import g3py_tpu as g3


@pytest.fixture
def data(rng):
    n = 120
    x = np.sort(rng.uniform(0, 8, n)).astype(np.float32).reshape(-1, 1)
    y = (np.sin(x[:, 0]) + 0.1 * rng.standard_normal(n)).astype(np.float32)
    return x, y


def _strip(params, frm, to):
    return {k.replace(frm, to): v for k, v in params.items()
            if "Inducing" not in k}


class TestSGPRBound:
    def test_elbo_lower_bounds_exact(self, data):
        x, y = data
        gp = g3.GP(space=x, location=g3.Bias(), kernel=g3.SE(x), name="TEx")
        gp.observed(x, y)
        sgp = g3.SGP(space=x, location=g3.Bias(), kernel=g3.SE(x),
                     inducing=16, name="TSp")
        sgp.observed(x, y)
        p0 = sgp.params_default
        elbo = sgp.loglike(p0)
        exact = gp.loglike(_strip(p0, "TSp_", "TEx_"))
        assert elbo <= exact + 1e-3
        assert np.isfinite(elbo)

    def test_tight_at_full_inducing(self, data):
        x, y = data
        gp = g3.GP(space=x, location=g3.Bias(), kernel=g3.SE(x), name="TEx2")
        gp.observed(x, y)
        sgp = g3.SGP(space=x, location=g3.Bias(), kernel=g3.SE(x),
                     inducing=x, name="TSp2")
        sgp.observed(x, y)
        p0 = sgp.params_default
        elbo = sgp.loglike(p0)
        exact = gp.loglike(_strip(p0, "TSp2_", "TEx2_"))
        # gap = KL residual, pure jitter/rounding at Z=X
        assert abs(exact - elbo) < 0.5, (elbo, exact)

    def test_posterior_collapses_at_full_inducing(self, data):
        x, y = data
        gp = g3.GP(space=x, location=g3.Bias(), kernel=g3.SE(x), name="TEx3")
        gp.observed(x, y)
        sgp = g3.SGP(space=x, location=g3.Bias(), kernel=g3.SE(x),
                     inducing=x, learn_inducing=False, name="TSp3")
        sgp.observed(x, y)
        p0 = sgp.params_default
        pe = _strip(p0, "TSp3_", "TEx3_")
        xq = np.linspace(0.5, 7.5, 40, dtype=np.float32).reshape(-1, 1)
        mu_s = np.asarray(sgp.mean(p0, xq))
        mu_e = np.asarray(gp.mean(pe, xq))
        sd_s = np.asarray(sgp.kernel_sd(p0, xq))
        sd_e = np.asarray(gp.kernel_sd(pe, xq))
        np.testing.assert_allclose(mu_s, mu_e, atol=2e-3)
        np.testing.assert_allclose(sd_s, sd_e, atol=5e-3)

    def test_gradient_trains_inducing(self, data):
        x, y = data
        sgp = g3.SGP(space=x, location=g3.Bias(), kernel=g3.SE(x),
                     inducing=12, name="TTr")
        sgp.observed(x, y)
        p0 = sgp.params_default
        params = sgp.find_MAP(points=1, display=False)
        assert sgp.logp(params) > sgp.logp(p0) + 10
        moved = np.abs(params["TTr_Inducing_z"]
                       - p0["TTr_Inducing_z"]).max()
        assert moved > 1e-3  # z receives gradient
        pred = sgp.predict(params=params)
        rmse = float(np.sqrt(np.mean((pred.mean - np.sin(x[:, 0])) ** 2)))
        assert rmse < 0.2
        assert np.all(pred.std >= 0)

    def test_tiny_noise_is_penalized_not_exploited(self, data):
        """Regression: the sigma-scaled (A = V/sigma) form of the bound
        suffered 1/sigma^2-amplified f32 cancellation — at sigma^2 -> 0 the
        ELBO evaluated to +7e7 and find_MAP drove the noise to zero (a 2%
        noise-band coverage).  In the V-parametrization the bound must go
        strongly NEGATIVE as sigma^2 -> 0 for a non-interpolating model."""
        x, y = data
        sgp = g3.SGP(space=x, location=g3.Bias(), kernel=g3.SE(x),
                     inducing=8, learn_inducing=False, name="TNz")
        sgp.observed(x, y)
        p = dict(sgp.params_default)
        base = sgp.loglike(p)
        for nv in (1e-6, 1e-10, 0.0):
            p["TNz_Noise_var"] = np.float32(nv)
            ll = sgp.loglike(p)
            assert ll < base - 100, (nv, ll, base)

    def test_fixed_inducing_has_no_param(self, data):
        x, y = data
        sgp = g3.SGP(space=x, location=g3.Bias(), kernel=g3.SE(x),
                     inducing=10, learn_inducing=False, name="TFx")
        sgp.observed(x, y)
        assert not any("Inducing" in k for k in sgp.params_default)
        assert np.isfinite(sgp.loglike(sgp.params_default))

    def test_more_points_than_data_tiles(self, rng):
        x = np.linspace(0, 1, 6, dtype=np.float32).reshape(-1, 1)
        y = x[:, 0].astype(np.float32)
        sgp = g3.SGP(space=x, location=g3.Bias(), kernel=g3.SE(x),
                     inducing=10, name="TTl")
        sgp.observed(x, y)
        z0 = sgp.params_default["TTl_Inducing_z"]
        assert z0.shape == (10, 1)
        assert np.isfinite(sgp.loglike(sgp.params_default))


class TestSGPRMasked:
    def test_masked_matches_subset(self, data):
        """Masked ELBO at mask w == ELBO of the physically-subset data
        (same inducing points)."""
        x, y = data
        sgp = g3.SGP(space=x, location=g3.Bias(), kernel=g3.SE(x),
                     inducing=14, learn_inducing=False, name="TMk")
        sgp.observed(x, y)
        p0 = {k: jnp.asarray(v) for k, v in sgp.params_default.items()}
        fn = sgp.th_loglike_masked_fn()
        w = np.zeros(len(x), np.float32)
        keep = np.arange(0, len(x), 2)
        w[keep] = 1.0
        masked = float(fn(p0, jnp.asarray(x), jnp.asarray(y),
                          jnp.asarray(w)))
        sub = g3.SGP(space=x[keep], location=g3.Bias(),
                     kernel=g3.SE(x[keep]),
                     inducing=np.asarray(sgp.f_inducing.value({}, x)),
                     learn_inducing=False, name="TMs")
        sub.observed(x[keep], y[keep])
        p_sub = {k.replace("TMk_", "TMs_"): v
                 for k, v in sgp.params_default.items()}
        direct = sub.loglike(p_sub)
        np.testing.assert_allclose(masked, direct, rtol=2e-4, atol=2e-3)


class TestSparseWarped:
    def test_identity_mapping_matches_sgp(self, data):
        x, y = data
        y = y + 3.0
        sgp = g3.SGP(space=x, location=g3.Bias(), kernel=g3.SE(x),
                     inducing=12, learn_inducing=False, name="TWi")
        sgp.observed(x, y)
        swgp = g3.SWGP(space=x, location=g3.Bias(), kernel=g3.SE(x),
                       mapping=g3.Identity(), inducing=12,
                       learn_inducing=False, name="TWj")
        # same fixed inducing set
        swgp.f_inducing.z_fixed = np.asarray(sgp.f_inducing.value({}, x))
        swgp.observed(x, y)
        p = sgp.params_default
        pw = {k.replace("TWi_", "TWj_"): v for k, v in p.items()}
        np.testing.assert_allclose(sgp.loglike(p), swgp.loglike(pw),
                                   rtol=1e-5)

    def test_warped_trains_and_predicts(self, rng):
        n = 100
        x = np.sort(rng.uniform(0, 6, n)).astype(np.float32).reshape(-1, 1)
        f = np.sin(x[:, 0]) + 1.5
        y = np.exp(0.5 * f + 0.05 * rng.standard_normal(n)).astype(
            np.float32)
        swgp = g3.SWGP(space=x, location=g3.Bias(), kernel=g3.SE(x),
                       mapping=g3.LogShifted(y), inducing=16, name="TWt")
        swgp.observed(x, y)
        params = swgp.find_MAP(points=1, display=False)
        assert swgp.logp(params) > swgp.logp(swgp.params_default)
        pred = swgp.predict(params=params)
        assert np.all(np.isfinite(pred.mean))
        assert np.all(np.isfinite(pred.std))
        # warped means live on the observed (positive) scale
        assert np.all(pred.mean > 0)


class TestSparsePredictor:
    def test_predictor_matches_direct(self, data):
        x, y = data
        sgp = g3.SGP(space=x, location=g3.Bias(), kernel=g3.SE(x),
                     inducing=16, name="TPr")
        sgp.observed(x, y)
        params = sgp.find_MAP(points=1, display=False)
        pr = sgp.predictor(params)
        xq = np.linspace(0.2, 7.8, 33, dtype=np.float32).reshape(-1, 1)
        np.testing.assert_allclose(np.asarray(pr.mean(space=xq)),
                                   np.asarray(sgp.mean(params, xq)),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(pr.std(space=xq)),
                                   np.asarray(sgp.kernel_sd(params, xq)),
                                   rtol=1e-3, atol=1e-4)

    def test_streaming_update_matches_fresh(self, data):
        x, y = data
        n_base = 100
        sgp = g3.SGP(space=x, location=g3.Bias(), kernel=g3.SE(x),
                     inducing=16, learn_inducing=False, name="TUp")
        sgp.observed(x[:n_base], y[:n_base])
        params = sgp.params_default
        pr = sgp.predictor(params)
        pr2 = pr.updated(x[n_base:], y[n_base:])
        # fresh factorization over the full data, on a separate process so
        # pr2's data-staleness guard stays valid
        sgp_f = g3.SGP(space=x, location=g3.Bias(), kernel=g3.SE(x),
                       inducing=np.asarray(sgp.f_inducing.value({}, x)),
                       learn_inducing=False, name="TUf")
        sgp_f.observed(x, y)
        params_f = {k.replace("TUp_", "TUf_"): v for k, v in params.items()}
        fresh = sgp_f.predictor(params_f)
        xq = np.linspace(0.2, 7.8, 21, dtype=np.float32).reshape(-1, 1)
        np.testing.assert_allclose(np.asarray(pr2.mean(space=xq)),
                                   np.asarray(fresh.mean(space=xq)),
                                   rtol=1e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(pr2.std(space=xq)),
                                   np.asarray(fresh.std(space=xq)),
                                   rtol=1e-2, atol=2e-3)


class TestPathwisePredictor:
    """Predictor.pathwise_sampler — Matheron draws against the baked
    state, for both the dense (L^{-1}) and sparse (q(u)) states."""

    def _fit(self, rng, cls, **kw):
        n = 250
        x = np.sort(rng.uniform(0, 10, n)).astype(np.float32).reshape(-1, 1)
        y = (np.sin(x[:, 0]) + 0.1 * rng.standard_normal(n)).astype(
            np.float32)
        proc = cls(space=x[:4], location=g3.Bias(), kernel=g3.SE(x), **kw)
        proc.observed(x, y)
        params = proc.find_MAP(points=1, display=False)
        return proc, params

    @pytest.mark.parametrize("kind", ["dense", "sparse"])
    def test_moments_match_posterior(self, rng, kind):
        if kind == "dense":
            proc, params = self._fit(rng, g3.GP, name="PWd")
        else:
            proc, params = self._fit(rng, g3.SGP, inducing=24, name="PWs")
        pr = proc.predictor(params)
        xq = np.linspace(0.5, 9.5, 40, dtype=np.float32).reshape(-1, 1)
        draws = pr.pathwise_sampler(space=xq, samples=512, key=1,
                                    n_features=4096)
        assert draws.shape == (40, 512)
        mu = np.asarray(proc.mean(params, xq))
        sd = np.asarray(proc.kernel_sd(params, xq))
        # feature/MC error ~ O(1/sqrt(F)) + O(1/sqrt(S))
        np.testing.assert_allclose(draws.mean(1), mu, atol=6e-3)
        np.testing.assert_allclose(draws.std(1), sd, atol=8e-3)

    def test_paths_consistent_across_batches(self, rng):
        proc, params = self._fit(rng, g3.SGP, inducing=16, name="PWc")
        pr = proc.predictor(params)
        xq = np.linspace(0, 10, 50, dtype=np.float32).reshape(-1, 1)
        d1 = pr.pathwise_sampler(space=xq[:30], samples=3, key=5)
        d2 = pr.pathwise_sampler(space=xq[10:40], samples=3, key=5)
        # same key => same continuous path, wherever it is evaluated
        np.testing.assert_allclose(d1[10:30], d2[:20], atol=2e-3)

    def test_studentt_rejected(self, rng):
        n = 60
        x = np.sort(rng.uniform(0, 5, n)).astype(np.float32).reshape(-1, 1)
        y = (np.sin(x[:, 0]) + 0.1 * rng.standard_normal(n)).astype(
            np.float32)
        tp = g3.TP(space=x[:4], location=g3.Bias(), kernel=g3.SE(x),
                   name="PWt")
        tp.observed(x, y)
        pr = tp.predictor(tp.params_default)
        with pytest.raises(ValueError, match="scale-mixture"):
            pr.pathwise_sampler(space=x[:5], samples=2)


class TestSVGP:
    def test_minibatch_training_approaches_collapsed_optimum(self, rng):
        n = 1500
        x = np.sort(rng.uniform(0, 10, n)).astype(np.float32).reshape(-1, 1)
        y = (np.sin(x[:, 0]) + 0.1 * rng.standard_normal(n)).astype(
            np.float32)
        sgp = g3.SGP(space=x[:4], location=g3.Bias(), kernel=g3.SE(x),
                     inducing=20, name="TVg")
        sgp.observed(x, y)
        params, losses = sgp.fit_svgp(batch_size=256, steps=1200, lr=5e-3,
                                      key=0, display=False)
        assert losses[-1] < losses[0]
        # the collapsed bound at the SVGP-trained hypers must be close to
        # the full-batch find_MAP optimum (both far above the default)
        elbo_svgp = sgp.loglike(params)
        p_map = sgp.find_MAP(points=1, display=False)
        elbo_map = sgp.loglike(p_map)
        elbo_def = sgp.loglike(sgp.params_default)
        assert elbo_svgp > elbo_def + 0.8 * (elbo_map - elbo_def)
        # serving from the collapsed state at the trained hypers
        pred = sgp.predict(params=params, space=x)
        rmse = float(np.sqrt(np.mean((pred.mean - np.sin(x[:, 0])) ** 2)))
        assert rmse < 0.1

    def test_natgrad_one_step_is_collapsed_optimum(self, rng):
        """rho=1 + full batch + lr=0: ONE natural-gradient step lands q
        exactly on the SGPR stationary point, so the uncollapsed ELBO
        equals the collapsed bound (+ logprior) — the conjugate-likelihood
        identity the NGD update is built on."""
        n = 400
        x = np.sort(rng.uniform(0, 10, n)).astype(np.float32).reshape(-1, 1)
        y = (np.sin(x[:, 0]) + 0.1 * rng.standard_normal(n)).astype(
            np.float32)
        sgp = g3.SGP(space=x[:4], location=g3.Bias(), kernel=g3.SE(x),
                     inducing=16, name="TVn1")
        sgp.observed(x, y)
        _params, losses = sgp.fit_svgp(batch_size=n, steps=2, lr=0.0,
                                       key=0, display=False, natgrad=1.0)
        target = -sgp.logp(sgp.params_default)
        assert abs(losses[1] - target) / abs(target) < 2e-5
        # step 2 recomputes the same stationary point: deterministic
        assert losses[0] == losses[1]

    def test_natgrad_training(self, rng):
        n = 1500
        x = np.sort(rng.uniform(0, 10, n)).astype(np.float32).reshape(-1, 1)
        y = (np.sin(x[:, 0]) + 0.1 * rng.standard_normal(n)).astype(
            np.float32)
        sgp = g3.SGP(space=x[:4], location=g3.Bias(), kernel=g3.SE(x),
                     inducing=20, name="TVng")
        sgp.observed(x, y)
        params, losses = sgp.fit_svgp(batch_size=256, steps=1200, lr=5e-3,
                                      key=0, display=False, natgrad=0.2)
        assert losses[-1] < losses[0]
        elbo_ng = sgp.loglike(params)
        p_map = sgp.find_MAP(points=1, display=False)
        elbo_map = sgp.loglike(p_map)
        elbo_def = sgp.loglike(sgp.params_default)
        assert elbo_ng > elbo_def + 0.8 * (elbo_map - elbo_def)

    def test_sharded_matches_single_device(self, rng):
        """Full-batch (deterministic) sharded training on the 8-device
        mesh reproduces the single-device loss trace step by step, and the
        sharded NGD step hits the collapsed optimum — the psum-composed
        estimator IS the single-device estimator."""
        n = 1000
        x = np.sort(rng.uniform(0, 10, n)).astype(np.float32).reshape(-1, 1)
        y = (np.sin(x[:, 0]) + 0.1 * rng.standard_normal(n)).astype(
            np.float32)
        sgp = g3.SGP(space=x[:4], location=g3.Bias(), kernel=g3.SE(x),
                     inducing=16, name="TVsh")
        sgp.observed(x, y)
        ndev = min(len(jax.devices()), 8)
        _p, l_ng = sgp.fit_svgp(batch_size=n, steps=2, lr=0.0, key=0,
                                display=False, natgrad=1.0, mesh=ndev)
        target = -sgp.logp(sgp.params_default)
        assert abs(l_ng[1] - target) / abs(target) < 5e-5
        _p1, l1 = sgp.fit_svgp(batch_size=n, steps=5, lr=1e-2, key=0,
                               display=False)
        _p2, l2 = sgp.fit_svgp(batch_size=n, steps=5, lr=1e-2, key=0,
                               display=False, mesh=ndev)
        np.testing.assert_allclose(l1, l2, rtol=2e-5)

    def test_sharded_minibatch_trains(self, rng):
        n = 1000
        x = np.sort(rng.uniform(0, 10, n)).astype(np.float32).reshape(-1, 1)
        y = (np.sin(x[:, 0]) + 0.1 * rng.standard_normal(n)).astype(
            np.float32)
        sgp = g3.SGP(space=x[:4], location=g3.Bias(), kernel=g3.SE(x),
                     inducing=16, name="TVsm")
        sgp.observed(x, y)
        params, losses = sgp.fit_svgp(batch_size=256, steps=400, lr=5e-3,
                                      key=0, display=False, natgrad=0.2,
                                      mesh=min(len(jax.devices()), 8))
        assert losses[-1] < losses[0]
        assert sgp.loglike(params) > sgp.loglike(sgp.params_default) + 100

    def test_warped_svgp_smoke(self, rng):
        n = 400
        x = np.sort(rng.uniform(0, 6, n)).astype(np.float32).reshape(-1, 1)
        y = np.exp(np.sin(x[:, 0])
                   + 0.05 * rng.standard_normal(n)).astype(np.float32)
        swgp = g3.SWGP(space=x[:4], location=g3.Bias(), kernel=g3.SE(x),
                       mapping=g3.LogShifted(y), inducing=12, name="TVw")
        swgp.observed(x, y)
        params, losses = swgp.fit_svgp(batch_size=128, steps=400, lr=5e-3,
                                       key=0, display=False)
        assert losses[-1] < losses[0]
        assert np.isfinite(swgp.loglike(params))
        pred = swgp.predict(params=params, space=x)
        assert np.all(np.isfinite(pred.mean)) and np.all(pred.mean > 0)


class TestSparseMultiOutput:
    def test_icm_matches_exact(self, rng):
        """2-task ICM (shared SE x KernelEquals + task-1 own kernel)
        through SGPR: the index-kernel algebra needs no sparse-specific
        handling (KernelEquals is piecewise-constant in the index column,
        so trained inducing inputs keep task indices intact) and the fit
        matches the exact GP."""
        n_per = 80
        x1 = np.sort(rng.uniform(0, 10, n_per)).astype(np.float32)
        x = np.concatenate([
            np.stack([np.zeros(n_per), x1], 1),
            np.stack([np.ones(n_per), x1], 1)]).astype(np.float32)
        y = (np.concatenate([np.sin(x1), 0.5 * np.sin(x1) + 0.2])
             + 0.05 * rng.standard_normal(2 * n_per)).astype(np.float32)

        def icm(suf):
            return (g3.SE([1], name="Sh" + suf)
                    * g3.KernelEquals([0], name="Eq" + suf)
                    + g3.SE([1], name="Ow" + suf)
                    * g3.KernelEquals([0], eq=1, name="Eo" + suf))

        sgp = g3.SGP(space=x[:4], location=g3.Bias(), kernel=icm("s"),
                     inducing=24, name="TMOs")
        sgp.observed(x, y)
        p = sgp.find_MAP(points=4, display=False)
        zkey = [k for k in p if k.endswith("_z")][0]
        idx_col = np.asarray(p[zkey])[:, 0]
        assert set(np.round(idx_col).tolist()) <= {0.0, 1.0}
        np.testing.assert_allclose(idx_col, np.round(idx_col), atol=1e-6)
        rmse_s = float(np.sqrt(np.mean(
            (np.asarray(sgp.mean(p, x)) - y) ** 2)))

        gp = g3.GP(space=x[:4], location=g3.Bias(), kernel=icm("x"),
                   name="TMOg")
        gp.observed(x, y)
        pg = gp.find_MAP(points=4, display=False)
        rmse_e = float(np.sqrt(np.mean(
            (np.asarray(gp.mean(pg, x)) - y) ** 2)))
        assert rmse_s < rmse_e * 1.25 + 0.01, (rmse_s, rmse_e)


class TestSparseSampling:
    def test_sample_hypers_smoke(self, data):
        x, y = data
        sgp = g3.SGP(space=x, location=g3.Bias(), kernel=g3.SE(x),
                     inducing=8, learn_inducing=False, name="TSh")
        sgp.observed(x, y)
        params = sgp.find_MAP(points=1, display=False)
        dt = sgp.sample_hypers(start=params, samples=40, chains=8,
                               burnin_tol=None, outlayer_percentile=None,
                               seed=0)
        assert len(dt) == 40 * 8
        assert np.all(np.isfinite(dt._ll))

    def test_scores_pipeline(self, data):
        x, y = data
        sgp = g3.SGP(space=x, location=g3.Bias(), kernel=g3.SE(x),
                     inducing=12, name="TSc")
        sgp.observed(x, y)
        sgp.hidden = y
        params = sgp.find_MAP(points=1, display=False)
        sc = sgp.scores(params, logp=True)
        assert np.isfinite(sc["_l2"]) and np.isfinite(sc["_logp"])
