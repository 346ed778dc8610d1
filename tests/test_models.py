"""Model-family tests: Student-t, marginal, transport, copula processes."""

import numpy as np
import pytest
from scipy import stats

from g3py_tpu.models import (
    TP, WTP, MP, TGP, CGP, CSTP, GP,
    Normal, StudentT, Uniform,
)
from g3py_tpu.hypers.kernels import SE
from g3py_tpu.hypers.means import Bias, Zero
from g3py_tpu.hypers.transports import TKernel, TLocation, TScale, TMapping
from g3py_tpu.hypers.mappings import ArcsinhLinear


@pytest.fixture
def data(rng):
    x = np.linspace(0, 6, 18).astype(np.float32).reshape(-1, 1)
    y = (np.sin(x[:, 0]) + 0.1 * rng.standard_normal(18)).astype(np.float32)
    return x, y


class TestStudentT:
    def test_logp_matches_scipy_mvt(self, data):
        x, y = data
        tp = TP(space=x, location=Zero(), kernel=SE(x), name="TPA")
        tp.observed(x, y)
        params = tp.params_default
        # scipy multivariate t with the same (nu-2)-normalized scale matrix
        var = float(params["TPA_SE_var"])
        rate = float(params["TPA_SE_rate"][0])
        nv = float(params["TPA_Noise_var"])
        nu = 2.0 + float(params["TPA_Freedom_degree"])
        d = (x[:, 0:1] - x[:, 0:1].T) ** 2
        K = var * np.exp(-0.5 * rate**2 * d) + nv * np.eye(len(x))
        scale = K  # covariance parameterization: Sigma = (nu-2)/nu * shape
        shape = scale * nu / (nu - 2.0)
        want = stats.multivariate_t.logpdf(y, loc=np.zeros(len(x)),
                                           shape=shape * (nu - 2.0) / nu, df=nu)
        # reference parameterization: logp uses (nu-2) normalization directly
        # -> build it by hand instead
        L = np.linalg.cholesky(K)
        z = np.linalg.solve(L, y)
        beta = z @ z
        n = len(x)
        from scipy.special import gammaln

        hand = (-0.5 * (nu + n) * np.log1p(beta / (nu - 2))
                + gammaln((nu + n) / 2) - gammaln(nu / 2)
                - 0.5 * n * np.log((nu - 2) * np.pi)
                - np.sum(np.log(np.diag(L))))
        np.testing.assert_allclose(tp.logp(params), hand, rtol=1e-4, atol=1e-3)

    def test_posterior_scaling_reduces_to_one_at_prior(self, data):
        x, y = data
        tp = TP(space=x, location=Zero(), kernel=SE(x), name="TPB")
        tp.observed(x, y)
        params = tp.params_default
        var_prior = tp.variance(params, prior=True)
        var_post = tp.variance(params)
        assert np.all(np.isfinite(var_post))
        # posterior freedom = prior freedom + n
        f_prior = tp.freedom(params, prior=True)
        f_post = tp.freedom(params)
        np.testing.assert_allclose(f_post - f_prior, len(x), atol=1e-4)

    def test_quantiles_and_sampler(self, data):
        x, y = data
        tp = TP(space=x, location=Bias(), kernel=SE(x), name="TPC")
        tp.observed(x, y)
        pred = tp.predict(quantiles=True, samples=3)
        assert np.all(pred["quantile_up"] >= pred["quantile_down"])
        assert pred["samples"].shape == (len(x), 3)

    def test_warped_tp(self, data):
        x, y = data
        y_pos = (np.exp(0.3 * y) + 1).astype(np.float32)
        wtp = WTP(space=x, location=Bias(), kernel=SE(x),
                  mapping=ArcsinhLinear(y_pos), name="WTPA")
        wtp.observed(x, y_pos)
        assert np.isfinite(wtp.logp())
        assert np.all(np.isfinite(wtp.predict()["mean"]))


class TestMarginal:
    def test_normal_density_logp(self, data, rng):
        x, y = data
        mp = MP(space=x, density=Normal(mu=Bias(x), sigma=Bias(x, name="S")),
                name="MPA")
        mp.observed(x, y)
        params = {"MPA_Bias_Bias": np.float32(0.2), "MPA_S_Bias": np.float32(0.5)}
        want = stats.norm.logpdf(y, loc=0.2, scale=0.5).sum()
        np.testing.assert_allclose(mp.logp(params), want, rtol=1e-4)

    def test_uniform_density(self, data):
        x, y = data
        mp = MP(space=x, density=Uniform(lower=Bias(x, name="L"),
                                         upper=Bias(x, name="U")), name="MPB")
        mp.observed(x, y)
        params = {"MPB_L_Bias": np.float32(-3.0), "MPB_U_Bias": np.float32(3.0)}
        want = -len(y) * np.log(6.0)
        np.testing.assert_allclose(mp.logp(params), want, rtol=1e-5)
        # outside support -> guard
        params_bad = {"MPB_L_Bias": np.float32(0.5), "MPB_U_Bias": np.float32(0.6)}
        assert mp.logp(params_bad) < -1e29

    def test_studentt_density_and_predict(self, data):
        x, y = data
        mp = MP(space=x, density=StudentT(mu=Bias(x), sigma=Bias(x, name="S"),
                                          nu=Bias(x, name="N")), name="MPC")
        mp.observed(x, y)
        params = {"MPC_Bias_Bias": np.float32(0.0), "MPC_S_Bias": np.float32(1.0),
                  "MPC_N_Bias": np.float32(5.0)}
        want = stats.t.logpdf(y, 5.0, loc=0.0, scale=1.0).sum()
        np.testing.assert_allclose(mp.logp(params), want, rtol=1e-4)
        pred = mp.predict(params=params, quantiles=True)
        assert np.all(np.isfinite(pred["mean"]))


class TestTransport:
    def test_tkernel_matches_gp_loglike(self, data):
        """A pure TKernel transport with zero-location is exactly the
        (unwarped, zero-mean) GP likelihood."""
        x, y = data
        tgp = TGP(space=x, transport=TKernel(SE(x), noisy=True), name="TGPA")
        tgp.observed(x, y)
        gp = GP(space=x, location=Zero(), kernel=SE(x), name="GPT")
        gp.observed(x, y)
        p_t = tgp.params_default
        p_g = gp.params_default
        # align param values (names differ: the transport prefixes NoiseSE)
        lt = tgp.loglike(p_t)
        lg = gp.loglike(p_g)
        np.testing.assert_allclose(lt, lg, rtol=1e-3, atol=1e-3)

    def test_composed_transport(self, data):
        x, y = data
        t = TLocation(Bias(x)) @ TKernel(SE(x), noisy=True)
        tgp = TGP(space=x, transport=t, name="TGPB")
        tgp.observed(x, y)
        assert np.isfinite(tgp.logp())
        g = np.asarray(tgp.dlogp())
        assert np.all(np.isfinite(g))
        pred = tgp.predict(quantiles=True, simulations=16)
        assert np.all(np.isfinite(pred["mean"]))

    def test_find_map_on_tgp(self, data):
        x, y = data
        tgp = TGP(space=x, transport=TKernel(SE(x), noisy=True), name="TGPC")
        tgp.observed(x, y)
        lp0 = tgp.logp()
        params = tgp.find_MAP(points=1, powell=False, display=False)
        assert tgp.logp(params) >= lp0 - 1e-6


class TestCopula:
    def test_gaussian_copula_with_normal_marginals_matches_gp_shape(self, data):
        x, y = data
        cgp = CGP(space=x, kernel=SE(x),
                  marginal=Normal(mu=Bias(x, name="CM"), sigma=Bias(x, name="CS")),
                  name="CGPA")
        cgp.observed(x, y)
        assert np.isfinite(cgp.logp())
        assert np.all(np.isfinite(np.asarray(cgp.dlogp())))

    def test_copula_quantiles_monotone(self, data):
        x, y = data
        cgp = CGP(space=x, kernel=SE(x),
                  marginal=Normal(mu=Bias(x, name="CM"), sigma=Bias(x, name="CS")),
                  name="CGPB")
        cgp.observed(x, y)
        q1 = cgp.quantiler(q=0.25)
        q2 = cgp.quantiler(q=0.75)
        assert np.all(q2 >= q1 - 1e-5)

    def test_studentt_copula(self, data):
        x, y = data
        cstp = CSTP(space=x, kernel=SE(x),
                    marginal=Normal(mu=Bias(x, name="CM"), sigma=Bias(x, name="CS")),
                    name="CSTPA")
        cstp.observed(x, y)
        assert np.isfinite(cstp.logp())


class TestIterativeModelNLL:
    def test_nll_iterative_matches_loglike(self, rng):
        """Model-level matrix-free NLL (the large-N path) must agree with
        the exact loglike on a small factorable problem, including the
        warping Jacobian, and be differentiable."""
        import jax
        import jax.numpy as jnp

        n = 120
        x = np.sort(rng.uniform(0, 15, n)).astype(np.float32).reshape(-1, 1)
        y = (np.exp(0.2 * np.sin(x[:, 0])) + 1.5
             + 0.05 * rng.standard_normal(n)).astype(np.float32)
        import g3py_tpu as g3

        wgp = g3.WGP(space=x, location=g3.Bias(), kernel=g3.SE(x),
                     mapping=g3.BoxCoxLinear(y), name="ITWGP")
        wgp.observed(x, y)
        params = wgp.params_default
        nll, info = wgp.nll_iterative(params, rank=40, cg_iters=300,
                                      probes=64, lanczos_iters=30)
        want = -float(wgp.loglike(params))
        np.testing.assert_allclose(float(nll), want, rtol=2e-2)

        reg = wgp.active
        u0 = jnp.asarray(reg.dict_to_array(params))

        def f(u):
            p = reg.array_to_dict_jax(u)
            return wgp.nll_iterative(p, rank=40, cg_iters=300, probes=64,
                                     lanczos_iters=30)[0]

        g_ = jax.grad(f)(u0)
        assert np.all(np.isfinite(np.asarray(g_)))


class TestIterativePredictor:
    """Matrix-free serving (models/predictor.py IterativePredictor): CG
    alpha + batched-PCG variance, no factorization, no n x n matrix —
    the serving counterpart of find_MAP(engine='iterative')."""

    def _fit(self, rng, cls=None, mapping=None, n=512):
        import g3py_tpu as g3

        x = np.sort(rng.uniform(0, 30, n)).astype(np.float32).reshape(-1, 1)
        y = (np.sin(0.5 * x[:, 0])
             + 0.1 * rng.standard_normal(n)).astype(np.float32)
        kws = dict(space=x, location=g3.Bias(), kernel=g3.SE(x), name="ITP")
        if mapping == "log":
            y = np.exp(0.3 * y).astype(np.float32)
            kws["mapping"] = g3.LogShifted(y)
            sp = g3.WGP(**kws)
        else:
            sp = g3.GP(**kws)
        sp.observed(x, y)
        return sp, sp.find_MAP(points=1, display=False)

    def test_matches_dense_predict(self, rng):
        import g3py_tpu as g3

        gp, params = self._fit(rng)
        xq = np.linspace(-2, 32, 120, dtype=np.float32).reshape(-1, 1)
        dense = gp.predict(params=params, space=xq, quantiles=True, var=True)
        pr = gp.predictor_iterative(params, rank=64, cg_iters=400)
        assert pr.cg_rel_residual < 1e-3
        out = pr(xq, quantiles=True, var=True)
        for k in ("mean", "std", "variance", "quantile_up", "quantile_down"):
            d, a = np.asarray(dense[k]), np.asarray(out[k])
            scale = np.max(np.abs(d)) + 1e-9
            assert np.max(np.abs(a - d)) / scale < 2e-3, k
        # independent-marginal logpredictive matches the dense semantics
        yq = np.interp(xq[:, 0], gp.inputs[:, 0], gp.outputs
                       ).astype(np.float32)
        ref = float(gp.logpredictive(params, xq, vector=yq, noise=True))
        got = pr.logpredictive(yq, space=xq)
        assert abs(got - ref) < 0.02 * abs(ref) + 0.5

    def test_f64_serves_near_interpolation(self, rng):
        """dtype='float64' reopens the near-interpolation envelope
        (docs/performance.md round-4 2x2): a lambda_1/sigma^2 ~ 5e8 gram
        that f32 PCG cannot solve (the predictor's residual guard
        refuses) serves cleanly in f64 and matches an independent numpy
        f64 dense oracle."""
        import jax.numpy as jnp
        import g3py_tpu as g3

        n = 512
        x = np.sort(rng.uniform(0, 100, n)).astype(np.float32).reshape(
            -1, 1)
        f = np.sin(0.3 * x[:, 0])
        nv = 1e-6
        y = (f + np.sqrt(nv) * rng.standard_normal(n)).astype(np.float32)
        gp = g3.GP(space=x[:4], location=g3.Bias(), kernel=g3.SE(x),
                   noisy=True, name="F64P")
        gp.observed(x, y)
        params = dict(gp.params_default)
        params[f"{gp.name}_SE_rate"] = np.asarray([0.3], np.float32)
        params[f"{gp.name}_SE_var"] = np.asarray(1.0, np.float32)
        params[f"{gp.name}_Noise_var"] = np.asarray(nv, np.float32)

        with pytest.raises(ValueError, match="did not converge"):
            gp.predictor_iterative(params, rank=64, cg_iters=400)

        pr = gp.predictor_iterative(params, rank=64, cg_iters=400,
                                    dtype="float64")
        assert pr.cg_rel_residual < 5e-4
        xq = np.linspace(5, 95, 64, dtype=np.float32).reshape(-1, 1)
        out = pr(xq, var=True)

        # independent f64 dense oracle
        pj = {k: jnp.asarray(v) for k, v in gp.filter_params(
            params).items()}
        bias = float(np.asarray(gp.f_location(pj, jnp.asarray(x))[0]))
        x64 = x[:, 0].astype(np.float64)
        q64 = xq[:, 0].astype(np.float64)
        K = np.exp(-0.5 * (0.3 * (x64[:, None] - x64[None, :])) ** 2)
        C = np.exp(-0.5 * (0.3 * (q64[:, None] - x64[None, :])) ** 2)
        alpha = np.linalg.solve(K + nv * np.eye(n),
                                y.astype(np.float64) - bias)
        mu_ref = bias + C @ alpha
        sol = np.linalg.solve(K + nv * np.eye(n), C.T)
        var_ref = 1.0 - np.sum(C * sol.T, axis=1)
        np.testing.assert_allclose(np.asarray(out["mean"]), mu_ref,
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(out["variance"]),
                                   np.maximum(var_ref, 0), atol=1e-4)

    def test_warped_moments_match(self, rng):
        gp, params = self._fit(rng, mapping="log", n=256)
        xq = np.linspace(0, 30, 60, dtype=np.float32).reshape(-1, 1)
        dense = gp.predict(params=params, space=xq, quantiles=True)
        pr = gp.predictor_iterative(params, rank=64, cg_iters=400)
        out = pr(xq, quantiles=True)
        for k in ("mean", "std", "quantile_up"):
            d, a = np.asarray(dense[k]), np.asarray(out[k])
            assert np.max(np.abs(a - d)) / (np.max(np.abs(d)) + 1e-9) \
                < 5e-3, k

    def test_pathwise_sampler_matches_posterior_moments(self, rng):
        """Matheron pathwise draws (RFF prior + multi-RHS PCG update): the
        empirical mean/std over many paths must match the analytic
        posterior moments to MC/feature error — the factorization-free
        replacement for Cholesky-colored sampling at large N."""
        gp, params = self._fit(rng, n=400)
        pr = gp.predictor_iterative(params, rank=64, cg_iters=300)
        xq = np.linspace(0, 30, 60, dtype=np.float32).reshape(-1, 1)
        S = 600
        draws = pr.sampler(space=xq, samples=S, key=1, n_features=4096)
        assert draws.shape == (60, S)
        mu_ref = np.asarray(pr.mean(space=xq))
        sd_ref = np.asarray(pr.std(space=xq))
        se = sd_ref / np.sqrt(S)
        assert np.max(np.abs(draws.mean(axis=1) - mu_ref) / (se + 1e-9)) < 5
        ratio = draws.std(axis=1) / (sd_ref + 1e-9)
        assert np.all(ratio > 0.8) and np.all(ratio < 1.2)
        # non-SE kernels are rejected (spectral density unknown)
        import g3py_tpu as g3

        x = gp.inputs
        gpo = g3.GP(space=x, kernel=g3.OU(x), name="PWOU")
        gpo.observed(x, gp.outputs)
        pro = gpo.predictor_iterative(gpo.params_default, rank=32,
                                      cg_iters=300)
        with pytest.raises(ValueError, match="signal"):
            pro.sampler(space=xq, samples=2)

    def test_pathwise_sampler_matern(self, rng):
        """Matern-3/2 pathwise draws: the multivariate-t spectral draws
        (2nu dof at rate/sqrt(2) scale) reproduce the posterior moments."""
        import g3py_tpu as g3

        n = 300
        x = np.sort(rng.uniform(0, 30, n)).astype(np.float32).reshape(-1, 1)
        y = (np.sin(0.5 * x[:, 0])
             + 0.1 * rng.standard_normal(n)).astype(np.float32)
        gp = g3.GP(space=x, location=g3.Bias(), kernel=g3.MAT32(x),
                   name="PWM32")
        gp.observed(x, y)
        params = gp.find_MAP(points=1, display=False)
        pr = gp.predictor_iterative(params, rank=64, cg_iters=400)
        xq = np.linspace(0, 30, 50, dtype=np.float32).reshape(-1, 1)
        S = 500
        # heavier-tailed Matern frequency draws carry more feature noise
        # than SE at fixed F — use more features and wider moment bounds
        draws = pr.sampler(space=xq, samples=S, key=2, n_features=8192)
        mu_ref = np.asarray(pr.mean(space=xq))
        sd_ref = np.asarray(pr.std(space=xq))
        se = sd_ref / np.sqrt(S)
        assert np.max(np.abs(draws.mean(1) - mu_ref) / (se + 1e-9)) < 6
        ratio = draws.std(1) / (sd_ref + 1e-9)
        assert np.all(ratio > 0.7) and np.all(ratio < 1.4), (
            ratio.min(), ratio.max())

    def test_pathwise_sampler_rq(self, rng):
        """RQ pathwise draws: gamma scale-mixture spectral draws
        (g ~ Gamma(alpha, alpha) per feature over the SE spectrum)
        reproduce the posterior moments."""
        import g3py_tpu as g3

        n = 300
        x = np.sort(rng.uniform(0, 30, n)).astype(np.float32).reshape(-1, 1)
        y = (np.sin(0.5 * x[:, 0])
             + 0.1 * rng.standard_normal(n)).astype(np.float32)
        gp = g3.GP(space=x, location=g3.Bias(), kernel=g3.RQ(x),
                   name="PWRQ")
        gp.observed(x, y)
        params = gp.find_MAP(points=1, display=False)
        pr = gp.predictor_iterative(params, rank=64, cg_iters=400)
        xq = np.linspace(0, 30, 50, dtype=np.float32).reshape(-1, 1)
        S = 500
        draws = pr.sampler(space=xq, samples=S, key=2, n_features=8192)
        mu_ref = np.asarray(pr.mean(space=xq))
        sd_ref = np.asarray(pr.std(space=xq))
        se = sd_ref / np.sqrt(S)
        assert np.max(np.abs(draws.mean(1) - mu_ref) / (se + 1e-9)) < 6
        ratio = draws.std(1) / (sd_ref + 1e-9)
        assert np.all(ratio > 0.7) and np.all(ratio < 1.4), (
            ratio.min(), ratio.max())

    def test_pathwise_sampler_sum_kernel(self, rng):
        """Sums of stationary kernels: spectra add, so the prior path is
        one feature block per part (SE + MAT32 here); moments recovered.
        Products stay rejected (spectra convolve — unsupported)."""
        import g3py_tpu as g3

        n = 400
        x = np.sort(rng.uniform(0, 30, n)).astype(np.float32).reshape(-1, 1)
        y = (np.sin(0.5 * x[:, 0]) + 0.2 * np.sin(3.1 * x[:, 0])
             + 0.1 * rng.standard_normal(n)).astype(np.float32)
        gp = g3.GP(space=x, location=g3.Bias(),
                   kernel=g3.SE(x) + g3.MAT32(x), name="PWSUM")
        gp.observed(x, y)
        params = gp.find_MAP(points=1, display=False)
        pr = gp.predictor_iterative(params, rank=64, cg_iters=400)
        xq = np.linspace(0, 30, 60, dtype=np.float32).reshape(-1, 1)
        S = 500
        draws = pr.sampler(space=xq, samples=S, key=1, n_features=8192)
        mu_ref = np.asarray(pr.mean(space=xq))
        sd_ref = np.asarray(pr.std(space=xq))
        se = sd_ref / np.sqrt(S)
        assert np.max(np.abs(draws.mean(1) - mu_ref) / (se + 1e-9)) < 6
        ratio = draws.std(1) / (sd_ref + 1e-9)
        assert np.all(ratio > 0.7) and np.all(ratio < 1.4)
        gp3 = g3.GP(space=x, location=g3.Bias(),
                    kernel=g3.SE(x) * g3.COS(x), name="PWPRD")
        gp3.observed(x, y)
        pr3 = gp3.predictor_iterative(gp3.params_default, rank=32,
                                      cg_iters=300)
        with pytest.raises(ValueError, match="sums of them"):
            pr3.sampler(space=xq, samples=2)

    def test_pathwise_sampler_dims_restricted_kernel(self, rng):
        """Round-4 review fix: a dims-restricted kernel (SE([0]) on
        2-column inputs — the multi-output idiom) must draw frequencies
        over the ACTIVE column only; before the fix the rates silently
        broadcast over the ignored task-index column and the draw std was
        off by >2x."""
        import g3py_tpu as g3

        n = 300
        t = np.sort(rng.uniform(0, 30, n)).astype(np.float32)
        task = (np.arange(n) % 2).astype(np.float32)
        x = np.stack([t, task], axis=1)
        y = (np.sin(0.5 * t) + 0.1 * rng.standard_normal(n)
             ).astype(np.float32)
        gp = g3.GP(space=x, location=g3.Bias(), kernel=g3.SE([0]),
                   name="PWDIMS")
        gp.observed(x, y)
        params = gp.find_MAP(points=1, display=False)
        pr = gp.predictor_iterative(params, rank=64, cg_iters=400)
        xq = x[::6]
        S = 400
        draws = pr.sampler(space=xq, samples=S, key=1, n_features=4096)
        mu_ref = np.asarray(pr.mean(space=xq))
        sd_ref = np.asarray(pr.std(space=xq))
        se = sd_ref / np.sqrt(S)
        assert np.max(np.abs(draws.mean(1) - mu_ref) / (se + 1e-9)) < 6
        ratio = draws.std(1) / (sd_ref + 1e-9)
        assert np.all(ratio > 0.7) and np.all(ratio < 1.4), (
            float(ratio.min()), float(ratio.max()))

    def test_sketch_variance_is_quicklook_only(self, rng):
        """The rank-R Woodbury sketch (exact_var=False) is finite and
        bounded by the prior variance but NOT accurate — documented
        quick-look only."""
        gp, params = self._fit(rng, n=256)
        xq = np.linspace(0, 30, 60, dtype=np.float32).reshape(-1, 1)
        pr = gp.predictor_iterative(params, rank=64, cg_iters=400)
        v = np.asarray(pr.variance(xq, exact_var=False))
        assert np.all(np.isfinite(v)) and np.all(v >= 0.0)

    def test_rejections_and_stale_guard(self, rng):
        import pytest as _pytest
        import g3py_tpu as g3

        gp, params = self._fit(rng, n=128)
        x = gp.inputs
        from g3py_tpu.models.predictor import IterativePredictor

        tp = g3.TP(space=x, location=g3.Bias(), kernel=g3.SE(x), name="ITTP")
        tp.observed(x, gp.outputs)
        with _pytest.raises(ValueError, match="gaussian"):
            IterativePredictor(tp, tp.params_default)
        # an unconverged solve must raise, not serve garbage (hardening)
        with _pytest.raises(ValueError, match="did not converge"):
            gp.predictor_iterative(params, rank=2, cg_iters=1)
        pr = gp.predictor_iterative(params, rank=32)
        gp.observed(x[:64], gp.outputs[:64])
        with _pytest.raises(ValueError, match="rebuild"):
            pr.mean(x[:8])


class TestPredictor:
    """Serving fast path: one factorization, matmul-only statistics
    (models/predictor.py; the reference re-factorized per statistic,
    reference stochastic.py:444-513)."""

    def _build(self, cls, rng, mapping=False, name="PR"):
        import g3py_tpu as g3

        x = np.linspace(0, 10, 60, dtype=np.float32).reshape(-1, 1)
        y = (np.abs(np.sin(x[:, 0])) + 0.5
             + 0.05 * rng.standard_normal(60)).astype(np.float32)
        kws = dict(space=x, location=g3.Bias(), kernel=g3.SE(x), name=name)
        if mapping:
            kws["mapping"] = g3.BoxCoxLinear(y)
        sp = cls(**kws)
        sp.observed(x, y)
        return sp, x, y

    @pytest.mark.parametrize("family,mapping", [
        ("GP", False), ("WGP", True), ("TP", False)])
    def test_matches_unfactored_predict(self, rng, family, mapping):
        import g3py_tpu as g3

        cls = {"GP": g3.GP, "WGP": g3.WGP, "TP": g3.TP}[family]
        sp, x, y = self._build(cls, rng, mapping=mapping,
                               name=family + "PRED")
        xq = np.linspace(-1, 11, 40, dtype=np.float32).reshape(-1, 1)
        params = sp.params_default
        cov = family != "WGP"  # warped covariance is not analytic
        base = sp.predict(params=params, space=xq, quantiles=True, var=True,
                          cov=cov)
        pr = sp.predictor(params)
        fast = pr(xq, quantiles=True, var=True, cov=cov)
        assert set(base.keys()) == set(fast.keys())
        for k in base:
            b, f = np.asarray(base[k]), np.asarray(fast[k])
            np.testing.assert_allclose(f, b, rtol=2e-4, atol=2e-4,
                                       err_msg=f"{family} {k}")
        # delegated single statistics and the executed-counter contract:
        # the observed gram is factored exactly once, in posterior_state
        mu = pr.mean(space=xq)
        np.testing.assert_allclose(np.asarray(mu), np.asarray(base["mean"]),
                                   rtol=2e-4, atol=2e-4)
        assert sp.compiles["posterior_state"].executed == 1

    def test_logpredictive_and_sampler_use_state(self, rng):
        import g3py_tpu as g3

        sp, x, y = self._build(g3.GP, rng, name="GPPREDLP")
        xq = np.linspace(0, 10, 25, dtype=np.float32).reshape(-1, 1)
        params = sp.params_default
        pr = sp.predictor(params)
        base = sp.predict(params=params, space=xq, distribution=True)
        fast = pr(xq, distribution=True)
        v = np.asarray(base["mean"])
        assert float(fast["logpredictive"](v)) == pytest.approx(
            float(base["logpredictive"](v)), rel=1e-5)
        s = pr.sampler(space=xq, samples=3, rng=np.random.default_rng(0))
        sb = sp.sampler(params, space=xq, samples=3,
                        rng=np.random.default_rng(0))
        np.testing.assert_allclose(s, sb, rtol=2e-4, atol=2e-4)

    def test_streaming_update_no_refactorization(self, rng):
        """Predictor.updated absorbs new observations by the block-Cholesky
        identity in O((n+m)^2 m): statistics match a full refactorization
        while the posterior_state counter proves none happened; the old
        predictor goes stale; updates chain."""
        import g3py_tpu as g3

        n, m = 160, 16
        x_all = np.sort(rng.uniform(0, 30, n + m)
                        ).astype(np.float32).reshape(-1, 1)
        y_all = (np.sin(0.5 * x_all[:, 0])
                 + 0.1 * rng.standard_normal(n + m)).astype(np.float32)
        sel = rng.permutation(n + m)
        old_i, new_i = np.sort(sel[:n]), np.sort(sel[n:])
        gp = g3.GP(space=x_all, location=g3.Bias(), kernel=g3.SE(x_all),
                   name="UPDT")
        gp.observed(x_all[old_i], y_all[old_i])
        params = gp.params_default
        pr = gp.predictor(params)
        xq = np.linspace(-1, 31, 40, dtype=np.float32).reshape(-1, 1)
        _ = pr(xq)
        n_state = gp.compiles["posterior_state"].executed

        pr2 = pr.updated(x_all[new_i], y_all[new_i])
        out2 = pr2(xq, quantiles=True, var=True)
        assert gp.compiles["posterior_state"].executed == n_state
        ref = gp.predictor(params)(xq, quantiles=True, var=True)
        for k in ("mean", "std", "variance", "quantile_up",
                  "quantile_down"):
            d, a = np.asarray(ref[k]), np.asarray(out2[k])
            scale = np.max(np.abs(d)) + 1e-9
            assert np.max(np.abs(a - d)) / scale < 2e-3, k
        with pytest.raises(ValueError, match="rebuild"):
            pr.mean(space=xq)
        pr3 = pr2.updated(x_all[new_i][:4] + 31.0, y_all[new_i][:4])
        assert np.all(np.isfinite(pr3.mean(space=xq)))
        # the update rides the shared elliptical state, so TP works too
        tp = g3.TP(space=x_all, location=g3.Bias(), kernel=g3.SE(x_all),
                   name="UPDTTP")
        tp.observed(x_all[old_i], y_all[old_i])
        paramst = tp.params_default  # capture: defaults are data-driven
        prt = tp.predictor(paramst)
        prt2 = prt.updated(x_all[new_i], y_all[new_i])
        reft = tp.predictor(paramst)(xq, quantiles=True)
        outt = prt2(xq, quantiles=True)
        np.testing.assert_allclose(np.asarray(outt["quantile_up"]),
                                   np.asarray(reft["quantile_up"]),
                                   rtol=2e-3, atol=2e-3)

    def test_positional_space_footgun_raises(self, rng):
        """ADVICE round-1: pr.mean(xq) used to silently serve the default
        space (xq swallowed by the ignored params slot) — now a TypeError.
        Internal dict-threading (TP freedom path) stays allowed."""
        import g3py_tpu as g3

        sp, x, y = self._build(g3.GP, rng, name="GPPREDFG")
        pr = sp.predictor(sp.params_default)
        xq = np.linspace(0, 5, 7, dtype=np.float32).reshape(-1, 1)
        with pytest.raises(TypeError, match="keyword arguments"):
            pr.mean(xq)
        mu = pr.mean(space=xq)
        assert np.shape(mu) == (7,)

    def test_live_space_after_set_space(self, rng):
        """ADVICE round-1: space=None statistics follow the process's
        CURRENT space, not a construction-time snapshot."""
        import g3py_tpu as g3

        sp, x, y = self._build(g3.GP, rng, name="GPPREDLS")
        pr = sp.predictor(sp.params_default)
        _ = pr.mean()
        new_space = x[:13]
        sp.set_space(new_space, hidden=y[:13])
        assert np.shape(pr.mean()) == (13,)

    def test_stale_data_guard(self, rng):
        import g3py_tpu as g3

        sp, x, y = self._build(g3.GP, rng, name="GPPREDG")
        pr = sp.predictor(sp.params_default)
        _ = pr(x[:5])
        # changing only the plotting space must NOT invalidate
        sp.set_space(x[:10], hidden=y[:10])
        _ = pr(x[:5])
        # changing the observed data must
        sp.observed(x[:30], y[:30])
        with pytest.raises(ValueError, match="rebuild"):
            pr(x[:5])

    def test_fused_bundle_single_dispatch(self, rng):
        """The fused predict computes every analytic statistic in ONE
        compiled call (one dispatch per query batch)."""
        import g3py_tpu as g3

        sp, x, y = self._build(g3.GP, rng, name="GPPREDF")
        xq = np.linspace(0, 10, 30, dtype=np.float32).reshape(-1, 1)
        params = sp.params_default
        pr = sp.predictor(params)
        base = sp.predict(params=params, space=xq, quantiles=True,
                          quantiles_noise=True, var=True, median=True)
        fast = pr(xq, quantiles=True, quantiles_noise=True, var=True,
                  median=True)
        assert set(base.keys()) == set(fast.keys())
        for k in base:
            np.testing.assert_allclose(
                np.asarray(fast[k]), np.asarray(base[k]), rtol=2e-4,
                atol=2e-4, err_msg=k)
        bundles = [k for k in pr._clone.compiles if k.startswith("posterior_bundle")
                   or "_bundle_" in k]
        assert len(bundles) == 1, pr._clone.compiles.keys()
        n0 = pr._clone.compiles[bundles[0]].executed
        _ = pr(xq, quantiles=True, quantiles_noise=True, var=True, median=True)
        assert pr._clone.compiles[bundles[0]].executed == n0 + 1

    def test_fused_matches_per_statistic_tp(self, rng):
        import g3py_tpu as g3

        sp, x, y = self._build(g3.TP, rng, name="TPPREDF")
        xq = np.linspace(0, 10, 30, dtype=np.float32).reshape(-1, 1)
        pr = sp.predictor(sp.params_default)
        fast = pr(xq, quantiles=True)
        slow = pr._clone.predict(space=xq, quantiles=True)
        for k in slow:
            np.testing.assert_allclose(
                np.asarray(fast[k]), np.asarray(slow[k]), rtol=2e-4,
                atol=2e-4, err_msg=k)

    def test_averaged_predictor_matches_average(self, rng):
        """AveragedPredictor (per-row factorizations baked once) must
        reproduce average() over the same datatrace rows."""
        import g3py_tpu as g3

        sp, x, y = self._build(g3.WGP, rng, mapping=True, name="AVPRED")
        params = sp.find_MAP(points=2, display=False)
        dt = sp.sample_hypers(start=params, samples=40, chains=4, seed=0)
        dt_small = dt.iloc[::10]
        base = sp.average(dt_small, scores=False, quantiles=True)
        ap = sp.averaged_predictor(dt_small)
        fast = ap(None, quantiles=True)
        assert set(base.keys()) == set(fast.keys())
        for k in base:
            np.testing.assert_allclose(np.asarray(fast[k]),
                                       np.asarray(base[k]), rtol=5e-4,
                                       atol=5e-4, err_msg=k)
        sp.set_space(x, hidden=y)
        bs = sp.average(dt_small, scores=True)
        fs = ap(None, scores=True)
        assert fs["_l1"] == pytest.approx(bs["_l1"], rel=1e-4)
        # row cap subsamples evenly
        ap2 = sp.averaged_predictor(dt_small, max_rows=3)
        assert len(ap2.rows) == 3
        # stale-data guard
        sp.observed(x[:20], y[:20])
        with pytest.raises(ValueError, match="rebuild"):
            ap(None)

    def test_clustered_predictors(self, rng):
        """One AveragedPredictor per posterior cluster; each serves the
        average of exactly its cluster's rows."""
        import g3py_tpu as g3
        from g3py_tpu.bayesian.average import cluster_datatrace

        sp, x, y = self._build(g3.GP, rng, name="CLPRED")
        params = sp.find_MAP(points=1, display=False)
        dt = sp.sample_hypers(start=params, samples=30, chains=4, seed=0)
        cluster_datatrace(sp, dt, n_components=2, bayesian=False)
        prs = sp.clustered_predictors(dt, max_rows=200)
        assert set(prs) == set(int(c) for c in dt._cluster.unique())
        for c, ap in prs.items():
            sel = dt[dt._cluster == c]
            base = sp.average(sel, quantiles=False)
            fast = ap(None, quantiles=False)
            np.testing.assert_allclose(np.asarray(fast["mean"]),
                                       np.asarray(base["mean"]),
                                       rtol=5e-4, atol=5e-4)
        with pytest.raises(ValueError, match="_cluster"):
            sp.clustered_predictors(dt.drop(columns=["_cluster"]))
