"""End-to-end GaussianProcess tests: logp vs scipy, posterior vs naive
numpy, training, sampling, warped moments."""

import numpy as np
import pytest
from scipy.stats import multivariate_normal

from g3py_tpu.models import GP, WGP
from g3py_tpu.hypers.kernels import SE, WN
from g3py_tpu.hypers.means import Bias, Zero
from g3py_tpu.hypers.mappings import ArcsinhLinear, Identity


@pytest.fixture
def dataset(rng):
    x = np.linspace(0, 10, 25).astype(np.float32)
    y = (np.sin(x) + 0.1 * rng.standard_normal(25)).astype(np.float32)
    return x.reshape(-1, 1), y


@pytest.fixture
def gp(dataset):
    x, y = dataset
    gp = GP(space=x, location=Zero(), kernel=SE(x))
    gp.observed(x, y)
    return gp


def _naive_se(params, a, b, name="GP"):
    var = float(params[f"{name}_SE_var"])
    rate = np.asarray(params[f"{name}_SE_rate"], np.float64)
    d = ((a[:, None, :] - b[None, :, :]) ** 2 * 0.5 * rate**2).sum(-1)
    return var * np.exp(-d)


class TestGPCore:
    def test_logp_matches_scipy(self, gp, dataset):
        x, y = dataset
        params = gp.params_default
        K = _naive_se(params, x.astype(np.float64), x.astype(np.float64))
        K += float(params["GP_Noise_var"]) * np.eye(len(x))
        want = multivariate_normal.logpdf(y, np.zeros(len(x)), K)
        got = gp.logp(params)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-3)

    def test_array_dict_logp_consistent(self, gp):
        params = gp.params_default
        u = gp.active.dict_to_array(params)
        np.testing.assert_allclose(gp.logp(params), gp.logp(u, array=True),
                                   rtol=1e-4, atol=1e-3)

    def test_posterior_matches_naive(self, gp, dataset):
        x, y = dataset
        xs = np.linspace(0, 10, 33).astype(np.float32).reshape(-1, 1)
        params = gp.params_default
        K = _naive_se(params, x.astype(np.float64), x.astype(np.float64))
        K += float(params["GP_Noise_var"]) * np.eye(len(x))
        Ks = _naive_se(params, xs.astype(np.float64), x.astype(np.float64))
        mean_ref = Ks @ np.linalg.solve(K, y)
        got_mean = gp.mean(params, space=xs)
        np.testing.assert_allclose(got_mean, mean_ref, atol=1e-4)
        cov_ref = (_naive_se(params, xs.astype(np.float64), xs.astype(np.float64))
                   - Ks @ np.linalg.solve(K, Ks.T))
        sd_ref = np.sqrt(np.maximum(np.diag(cov_ref), 0))
        got_sd = gp.std(params, space=xs)
        np.testing.assert_allclose(got_sd, sd_ref, atol=1e-4)

    def test_dlogp_matches_finite_difference(self, gp):
        u = gp.active.dict_to_array(gp.params_default)
        g = np.asarray(gp.dlogp(u))
        eps = 1e-3
        for i in range(len(u)):
            up, dn = u.copy(), u.copy()
            up[i] += eps
            dn[i] -= eps
            fd = (gp.logp(up, array=True) - gp.logp(dn, array=True)) / (2 * eps)
            np.testing.assert_allclose(g[i], fd, rtol=2e-2, atol=2e-2)

    def test_predict_keys_and_shapes(self, gp):
        pred = gp.predict(quantiles=True, quantiles_noise=True, samples=4,
                          var=True, cov=True, median=True, distribution=True)
        n = len(gp.space)
        assert pred["mean"].shape == (n,)
        assert pred["std"].shape == (n,)
        assert pred["variance"].shape == (n,)
        assert pred["covariance"].shape == (n, n)
        assert pred["median"].shape == (n,)
        assert pred["samples"].shape == (n, 4)
        assert np.all(pred["quantile_up"] >= pred["quantile_down"])
        assert np.all(pred["noise_up"] >= pred["quantile_up"] - 1e-3)
        lp = pred["logpredictive"](np.asarray(pred["mean"]))
        assert np.isfinite(lp)

    def test_prior_predict(self, dataset):
        x, y = dataset
        gp = GP(space=x, location=Bias(), kernel=SE(x))
        pred = gp.predict()  # unobserved -> prior
        assert np.all(np.isfinite(pred["mean"]))

    def test_scores(self, gp, dataset):
        x, y = dataset
        gp.hidden = y
        s = gp.scores(logp=True, variance=True, median=True, logpred=True)
        for k in ["_l1", "_l2", "_mse", "_rmse", "_median_l1", "_logp",
                  "_loglike", "_logprior", "_nlpd"]:
            assert np.isfinite(s[k]), k

    def test_executed_counters(self, gp):
        _ = gp.logp()
        assert any(v > 0 for v in gp.executed.values())


class TestTraining:
    def test_find_map_improves(self, gp):
        start_lp = gp.logp()
        params = gp.find_MAP(points=2, display=False)
        assert gp.logp(params) >= start_lp - 1e-6

    def test_sample_hypers_pipeline(self, gp):
        params = gp.params_default
        dt = gp.sample_hypers(start=params, samples=60, chains=8,
                              burnin_tol=0.1, seed=1)
        assert len(dt) == 60 * 8
        assert "_ll" in dt and "_burnin" in dt and "_outlayer" in dt
        # transformed columns present for log-space hypers
        assert "GP_SE_var_log_" in dt.columns
        assert np.isfinite(dt._ll).all()

    def test_logp_chain(self, gp):
        u = gp.active.dict_to_array(gp.params_default)
        chain = np.stack([u, u * 1.05])
        out = np.asarray(gp.logp_chain(chain))
        assert out.shape == (2,)
        np.testing.assert_allclose(out[0], gp.logp(u, array=True), rtol=1e-5)

    def test_fix_vars_marginalized(self, gp):
        dt = gp.sample_hypers(start=gp.params_default, samples=30, chains=8,
                              burnin_tol=None, outlayer_percentile=None, seed=2)
        keys = ["GP_Noise_var_log_"]
        # fixed chain indexes flat param-name columns
        cols = gp.active.param_names()
        fixdt = dt[cols].copy()
        # map natural column to unconstrained: the datatrace stores natural
        # values in param columns; build an unconstrained frame
        uchain = np.stack([gp.active.dict_to_array(
            {c: fixdt.iloc[i][c] for c in cols}) for i in range(0, len(fixdt), 24)])
        import pandas as pd

        fixed_frame = pd.DataFrame(uchain, columns=cols)
        gp.active.fix_vars(fixed_frame, ["GP_Noise_var"])
        try:
            assert len(gp.active.sampling_dims) == gp.ndim - 1
            sampling = gp.active.sampling_params(gp.params_default)
            val = gp.fixed_logp(sampling)
            assert np.isfinite(val)
            grad = gp.fixed_dlogp(sampling)
            assert grad.shape == (gp.ndim - 1,)
        finally:
            gp.active.fix_vars()


class TestWarpedGP:
    def test_identity_warp_matches_gp(self, dataset):
        x, y = dataset
        wgp = WGP(space=x, location=Zero(), kernel=SE(x), mapping=Identity(),
                  name="WGPID")
        wgp.observed(x, y)
        gp = GP(space=x, location=Zero(), kernel=SE(x), name="GPREF")
        gp.observed(x, y)
        p_w = wgp.params_default
        p_g = gp.params_default
        # identity warp quadrature mean == analytic mean
        mw = wgp.mean(p_w)
        mg = gp.mean(p_g)
        np.testing.assert_allclose(mw, mg, atol=1e-3)

    def test_warped_logp_finite_and_trainable(self, dataset, rng):
        x, y = dataset
        y_pos = (np.exp(y * 0.5) + 1.0).astype(np.float32)
        wgp = WGP(space=x, location=Bias(), kernel=SE(x),
                  mapping=ArcsinhLinear(y_pos), name="WGP2")
        wgp.observed(x, y_pos)
        lp0 = wgp.logp()
        assert np.isfinite(lp0)
        g = np.asarray(wgp.dlogp())
        assert np.all(np.isfinite(g))
        pred = wgp.predict(quantiles=True)
        assert np.all(np.isfinite(pred["mean"]))


class TestPersistence:
    def test_save_load_roundtrip(self, gp, tmp_path):
        params = gp.params_default
        lp = gp.logp(params)
        path = str(tmp_path / "model.g3")
        gp.save(path)
        from g3py_tpu.utils import load_pkl

        loaded = load_pkl(path)
        loaded._compile_methods()
        assert loaded.name == gp.name
        np.testing.assert_allclose(loaded.logp(params), lp, rtol=1e-5)


class TestLOO:
    """Leave-one-out log pseudo-likelihood (GPML eq. 5.10-5.12)."""

    def test_loo_matches_per_fold_oracle(self, gp, dataset):
        """One-factorization LOO == n explicit held-out fold densities."""
        from scipy.stats import norm

        x, y = dataset
        params = gp.params_default
        x64 = x.astype(np.float64)
        K = _naive_se(params, x64, x64)
        K += float(params["GP_Noise_var"]) * np.eye(len(x))
        n = len(x)
        want = 0.0
        for i in range(n):
            m = np.arange(n) != i
            kim = K[i, m]
            sol = np.linalg.solve(K[np.ix_(m, m)], np.stack(
                [y[m].astype(np.float64), kim], axis=1))
            mu_i = kim @ sol[:, 0]
            var_i = K[i, i] - kim @ sol[:, 1]
            want += norm.logpdf(float(y[i]), mu_i, np.sqrt(var_i))
        got = gp.loo(params)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-3)

    def test_warped_loo_adds_jacobian(self, dataset, rng):
        """WGP LOO = latent-space LOO + the warping log-Jacobian, making
        values comparable across mappings on the same observed y."""
        import jax.numpy as jnp

        x, y = dataset
        y_pos = (np.exp(y * 0.5) + 1.0).astype(np.float32)
        wgp = WGP(space=x, location=Bias(), kernel=SE(x),
                  mapping=ArcsinhLinear(y_pos), name="WGPloo")
        wgp.observed(x, y_pos)
        params = wgp.params_default
        pj = {k: jnp.asarray(v) for k, v in params.items()}
        z = np.asarray(wgp.f_mapping.inv(pj, jnp.asarray(y_pos)),
                       np.float64)
        logdet = float(wgp.f_mapping.logdet_dinv(pj, jnp.asarray(y_pos)))
        cov = np.asarray(wgp.f_kernel_noise.cov(pj, jnp.asarray(x)),
                         np.float64)
        mu = np.asarray(wgp.f_location(pj, jnp.asarray(x)), np.float64)
        from scipy.stats import norm

        n = len(x)
        want = logdet
        r = z - mu
        for i in range(n):
            m = np.arange(n) != i
            kim = cov[i, m]
            sol = np.linalg.solve(cov[np.ix_(m, m)], np.stack(
                [r[m], kim], axis=1))
            mu_i = mu[i] + kim @ sol[:, 0]
            var_i = cov[i, i] - kim @ sol[:, 1]
            want += norm.logpdf(z[i], mu_i, np.sqrt(var_i))
        got = wgp.loo(params)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-2)

    def test_find_map_loo_objective(self, gp):
        """Hypers trained on the LOO pseudo-likelihood: the optimizer
        must improve LOO over the data-driven defaults."""
        pm = gp.find_MAP(points=1, powell=False, display=False,
                         objective="loo")
        assert np.isfinite(gp.loo(pm))
        assert gp.loo(pm) >= gp.loo(gp.params_default) - 1e-3
        with pytest.raises(ValueError):
            gp.find_MAP(objective="nonsense", display=False)
        with pytest.raises(ValueError):
            gp.find_MAP(engine="iterative", objective="loo", display=False)

    def test_find_map_loo_jax_engine(self, gp):
        """engine='jax' LOO MAP (vmapped multi-start on device) reaches
        the scipy engine's LOO optimum."""
        pm_sc = gp.find_MAP(points=1, powell=False, display=False,
                            objective="loo")
        pm_jx = gp.find_MAP(engine="jax", points=2, display=False,
                            objective="loo", max_iters=300)
        loo_sc = float(gp.loo(pm_sc))
        loo_jx = float(gp.loo(pm_jx))
        assert np.isfinite(loo_jx)
        # same optimum (or better — multi-start), within optimizer slack
        assert loo_jx >= loo_sc - 0.5

    def test_loo_differentiable(self, gp):
        """The LOO objective carries gradients (usable for training)."""
        import jax
        import jax.numpy as jnp

        fn = gp.th_loo_fn()
        pj = {k: jnp.asarray(v) for k, v in gp.params_default.items()}
        inputs = jnp.asarray(gp.inputs)
        outputs = jnp.asarray(gp.outputs)
        g = jax.grad(lambda p: fn(p, inputs, inputs, outputs))(pj)
        leaves = jax.tree_util.tree_leaves(g)
        assert leaves and all(np.all(np.isfinite(np.asarray(l)))
                              for l in leaves)
        assert any(float(np.abs(np.asarray(l)).max()) > 0 for l in leaves)
