"""Linear Model of Coregionalization (LMCSVP): analytic multi-output
ELBO, mixing recovery, cross-output transfer, per-latent kernels,
statistics, sharded training, serving.

No reference counterpart at this cost — the reference's multi-output
story is the dense ICM index-kernel algebra (reference
kernels.py:262-290), one O((nP)^3) Cholesky over the stacked rows; these
tests pin the sparse-variational rebuild's math instead of parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import g3py_tpu as g3
from g3py_tpu.models.lmc import Mixing, MultiGaussianLik


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _two_output_data(rng, n=200, rho=(2.0, -1.5), bias=(1.0, 3.0),
                     noise=0.1):
    """Two outputs driven by ONE shared latent sin(x): maximally
    coregionalized, so cross-output learning is measurable."""
    x0 = np.sort(rng.uniform(0, 6, n)).astype(np.float32)[:, None]
    f = np.sin(x0[:, 0])
    ys = [(r * f + b + noise * rng.standard_normal(n)).astype(np.float32)
          for r, b in zip(rho, bias)]
    return x0, ys


class TestComponents:
    def test_mixing_defaults(self, rng):
        x0, (y0, y1) = _two_output_data(rng)
        x, y = g3.stack_outputs([x0, x0], [y0, y1])
        lmc = g3.LMCSVP(space=x, kernel=g3.SE(x0), outputs_dim=2,
                        latents=2, inducing=8)
        lmc.observed(x, y)
        p = lmc.params_default
        w = np.asarray(p[lmc.f_mixing.w.name])
        b = np.asarray(p[lmc.f_mixing.b.name])
        # biases default to the per-output means, loadings to the stds
        np.testing.assert_allclose(b, [np.mean(y0), np.mean(y1)], atol=0.05)
        assert w.shape == (2, 2)
        np.testing.assert_allclose(np.diagonal(w),
                                   [np.std(y0), np.std(y1)], rtol=0.05)
        v = np.asarray(p[lmc.f_likelihood.var.name])
        np.testing.assert_allclose(v, [np.var(y0) / 10, np.var(y1) / 10],
                                   rtol=0.1)

    def test_row_format_validation(self, rng):
        x0, ys = _two_output_data(rng, n=50)
        lmc = g3.LMCSVP(space=g3.with_output(x0, 0), kernel=g3.SE(x0),
                        outputs_dim=2, inducing=8)
        bad = g3.with_output(x0, 5)  # index out of range
        with pytest.raises(ValueError, match="output indices"):
            lmc.observed(bad, ys[0])

    def test_noise_kernel_rejected(self, rng):
        x0, _ = _two_output_data(rng, n=20)
        with pytest.raises(ValueError, match="noise-free"):
            g3.LMCSVP(space=g3.with_output(x0, 0),
                      kernel=g3.SE(x0) + g3.KernelNoise(x0),
                      outputs_dim=2)

    def test_kernel_list_length_checked(self, rng):
        x0, _ = _two_output_data(rng, n=20)
        with pytest.raises(ValueError, match="kernel list"):
            g3.LMCSVP(space=g3.with_output(x0, 0),
                      kernel=[g3.SE(x0), g3.SE(x0), g3.SE(x0)],
                      outputs_dim=2, latents=2)


class TestBound:
    def test_ell_matches_monte_carlo(self, rng):
        """The analytic per-row expected log-lik == MC over q(g)."""
        x0, (y0, y1) = _two_output_data(rng, n=60)
        x, y = g3.stack_outputs([x0, x0], [y0, y1])
        lmc = g3.LMCSVP(space=x, kernel=g3.SE(x0), outputs_dim=2,
                        latents=2, inducing=8)
        lmc.observed(x, y)
        p = lmc.params_random(sigma=0.3, rng=np.random.default_rng(3))
        pj = {k: jnp.asarray(np.asarray(v)) for k, v in p.items()}
        xj = jnp.asarray(x)
        ell = float(lmc._ell(pj, xj, jnp.asarray(y)))
        # MC: sample g ~ N(mg, vg) rowwise, average log N(y; g, s2_p)
        mg, vg, idx = lmc._mixed(pj, xj)
        mg, vg, idx = np.asarray(mg), np.asarray(vg), np.asarray(idx)
        s2 = np.asarray(lmc.f_likelihood._vars(pj))[idx]
        gs = mg[:, None] + np.sqrt(vg)[:, None] * rng.standard_normal(
            (len(mg), 4000))
        lp = (-0.5 * np.log(2 * np.pi * s2)[:, None]
              - (y[:, None] - gs) ** 2 / (2 * s2[:, None]))
        mc = float(np.sum(np.mean(lp, axis=1)))
        assert abs(ell - mc) < 0.02 * abs(ell) + 2.0

    def test_reduces_to_svp_at_identity_mixing(self, rng):
        """P=1, Q=1, W=1, b=0: the LMC ELBO == the scalar SVP ELBO with
        the same hypers/q (the mixing layer is exactly transparent)."""
        x0, (y0, _) = _two_output_data(rng, n=80)
        x = g3.with_output(x0, 0)
        z = np.linspace(0.5, 5.5, 8).astype(np.float32)[:, None]
        lmc = g3.LMCSVP(space=x, kernel=g3.SE(x0), outputs_dim=1,
                        latents=1, inducing=z, learn_inducing=False)
        lmc.observed(x, y0)
        svp = g3.SVP(space=x0, kernel=g3.SE(x0), inducing=z,
                     learn_inducing=False)
        svp.observed(x0, y0)
        ps = dict(svp.params_default)
        pl = dict(lmc.params_default)
        # align: same kernel hypers, W=1, b=0, same noise var
        for k_l, k_s in zip(sorted(k for k in pl if "SE" in k),
                            sorted(k for k in ps if "SE" in k)):
            pl[k_l] = ps[k_s]
        pl[lmc.f_mixing.w.name] = np.ones((1, 1), np.float32)
        pl[lmc.f_mixing.b.name] = np.zeros((1,), np.float32)
        pl[lmc.f_likelihood.var.name] = np.asarray(
            [ps[svp.f_likelihood.var.name]], np.float32)
        qm = rng.standard_normal(8).astype(np.float32)
        ql = (0.1 * rng.standard_normal((8, 8))).astype(np.float32)
        pl[lmc.f_q.qm.name] = qm[None, :]
        pl[lmc.f_q.ql.name] = ql[None, :, :]
        ps[svp.f_q.qm.name] = qm
        ps[svp.f_q.ql.name] = ql
        np.testing.assert_allclose(lmc.loglike(pl), svp.loglike(ps),
                                   rtol=2e-5, atol=1e-3)


class TestTraining:
    def test_recovers_mixing_and_transfers(self, rng):
        """Trained 2-output LMC recovers the +/- mixing (task correlation
        -> -1) and predicts at the noise floor."""
        x0, (y0, y1) = _two_output_data(rng)
        x, y = g3.stack_outputs([x0, x0], [y0, y1])
        lmc = g3.LMCSVP(space=x, kernel=g3.SE(x0), outputs_dim=2,
                        latents=2, inducing=16)
        lmc.observed(x, y)
        params, losses = lmc.fit_svgp(batch_size=400, steps=800, lr=3e-2,
                                      display=False)
        assert losses[-1] < losses[0] - 100
        corr = lmc.task_correlations(params)
        assert corr.shape == (2, 2)
        assert corr[0, 1] < -0.98           # anti-correlated outputs
        m1 = lmc.mean(params, g3.with_output(x0, 1))
        rmse = float(np.sqrt(np.mean((np.asarray(m1) - y1) ** 2)))
        assert rmse < 0.16                  # noise floor is 0.1

    def test_cross_output_transfer(self, rng):
        """Output 1 observed only on the LEFT half of the domain: the
        shared latent carries output-0 information across, beating an
        independent single-output SVP trained on the same output-1 rows."""
        x0, (y0, y1) = _two_output_data(rng, n=240)
        left = x0[:, 0] < 3.0
        x, y = g3.stack_outputs([x0, x0[left]], [y0, y1[left]])
        lmc = g3.LMCSVP(space=x, kernel=g3.SE(x0), outputs_dim=2,
                        latents=1, inducing=16)
        lmc.observed(x, y)
        params, _ = lmc.fit_svgp(batch_size=len(y), steps=900, lr=3e-2,
                                 display=False)
        xq = x0[~left]
        yq = y1[~left]
        m = np.asarray(lmc.mean(params, g3.with_output(xq, 1)))
        rmse_lmc = float(np.sqrt(np.mean((m - yq) ** 2)))
        solo = g3.SVP(space=x0[left], kernel=g3.SE(x0), inducing=16)
        solo.observed(x0[left], y1[left])
        psolo, _ = solo.fit_svgp(batch_size=int(left.sum()), steps=900,
                                 lr=3e-2, display=False)
        ms = np.asarray(solo.mean(psolo, xq))
        rmse_solo = float(np.sqrt(np.mean((ms - yq) ** 2)))
        # the solo model extrapolates blind; LMC rides output 0's data
        assert rmse_lmc < 0.5 * rmse_solo
        assert rmse_lmc < 0.3

    def test_per_latent_kernels(self, rng):
        """kernel=[k_slow, k_fast]: two latents with their own
        lengthscales train and beat the default by capturing both
        timescales."""
        n = 240
        x0 = np.sort(rng.uniform(0, 6, n)).astype(np.float32)[:, None]
        slow = np.sin(x0[:, 0])
        fast = 0.5 * np.sin(5.0 * x0[:, 0])
        y0 = (slow + fast + 0.05 * rng.standard_normal(n)).astype(
            np.float32)
        y1 = (slow - fast + 0.05 * rng.standard_normal(n)).astype(
            np.float32)
        x, y = g3.stack_outputs([x0, x0], [y0, y1])
        lmc = g3.LMCSVP(space=x, kernel=[g3.SE(x0), g3.SE(x0)],
                        outputs_dim=2, latents=2, inducing=24)
        lmc.observed(x, y)
        assert not lmc._shared_kernel
        params, losses = lmc.fit_svgp(batch_size=len(y), steps=1200,
                                      lr=3e-2, display=False)
        assert losses[-1] < losses[0]
        m0 = np.asarray(lmc.mean(params, g3.with_output(x0, 0)))
        rmse = float(np.sqrt(np.mean((m0 - y0) ** 2)))
        assert rmse < 0.15

    def test_sharded_matches_single_device(self, rng):
        """Full-batch sharded fit == single-device step-for-step (the
        LMC _ell override flows through the mesh trainer)."""
        if len(jax.devices()) < 2:
            pytest.skip("needs the virtual multi-device mesh")
        x0, (y0, y1) = _two_output_data(rng, n=96)
        x, y = g3.stack_outputs([x0, x0], [y0, y1])
        lmc = g3.LMCSVP(space=x, kernel=g3.SE(x0), outputs_dim=2,
                        latents=2, inducing=8)
        lmc.observed(x, y)
        _, l1 = lmc.fit_svgp(batch_size=len(y), steps=5, display=False)
        _, l2 = lmc.fit_svgp(batch_size=len(y), steps=5, display=False,
                             mesh=4)
        np.testing.assert_allclose(l1[0], l2[0], rtol=2e-5)
        np.testing.assert_allclose(l1[-1], l2[-1], rtol=2e-3)


class TestStatistics:
    @pytest.fixture
    def fitted(self, rng):
        x0, (y0, y1) = _two_output_data(rng, n=150)
        x, y = g3.stack_outputs([x0, x0], [y0, y1])
        lmc = g3.LMCSVP(space=x, kernel=g3.SE(x0), outputs_dim=2,
                        latents=2, inducing=12)
        lmc.observed(x, y)
        params, _ = lmc.fit_svgp(batch_size=len(y), steps=500, lr=3e-2,
                                 display=False)
        return lmc, params, x0, y0, y1

    def test_covariance_consistent_with_variance(self, fitted):
        lmc, params, x0, y0, y1 = fitted
        xq = g3.with_output(x0[:40], 1)
        cov = np.asarray(lmc.covariance(params, xq))
        var = np.asarray(lmc.variance(params, xq))
        np.testing.assert_allclose(np.diagonal(cov), var, rtol=1e-3,
                                   atol=1e-5)
        covn = np.asarray(lmc.covariance(params, xq, noise=True))
        varn = np.asarray(lmc.variance(params, xq, noise=True))
        np.testing.assert_allclose(np.diagonal(covn), varn, rtol=1e-3,
                                   atol=1e-5)
        # PSD
        evs = np.linalg.eigvalsh(np.asarray(covn, np.float64))
        assert evs.min() > -1e-4

    def test_cross_output_covariance_sign(self, fitted):
        """Cov between output 0 and output 1 AT THE SAME x is negative
        (the outputs are anti-correlated by construction)."""
        lmc, params, x0, _, _ = fitted
        xs = np.concatenate([g3.with_output(x0[10:11], 0),
                             g3.with_output(x0[10:11], 1)], axis=0)
        cov = np.asarray(lmc.covariance(params, xs))
        assert cov[0, 1] < 0

    def test_prior_statistics(self, fitted):
        lmc, params, x0, _, _ = fitted
        xq = g3.with_output(x0[:20], 0)
        m = np.asarray(lmc.mean(params, xq, prior=True))
        v = np.asarray(lmc.variance(params, xq, prior=True))
        assert m.shape == (20,) and v.shape == (20,)
        assert np.all(v > 0)
        # prior mean is bias + location (no data): roughly the y0 mean
        pj = {k: np.asarray(vv) for k, vv in params.items()}
        b0 = pj[lmc.f_mixing.b.name][0]
        np.testing.assert_allclose(m, np.full(20, b0), atol=1e-5)

    def test_logpredictive_matches_scipy(self, fitted):
        from scipy import stats

        lmc, params, x0, y0, _ = fitted
        xq = g3.with_output(x0[:30], 0)
        lp = float(lmc.logpredictive(params, xq, vector=y0[:30]))
        m = np.asarray(lmc.mean(params, xq))
        v = np.asarray(lmc.variance(params, xq, noise=True))
        ref = float(np.sum(stats.norm.logpdf(y0[:30], m, np.sqrt(v))))
        assert abs(lp - ref) < 1e-2

    def test_sampler_moments(self, fitted):
        lmc, params, x0, _, y1 = fitted
        xq = g3.with_output(x0[:25], 1)
        draws = lmc.sampler(params, xq, samples=3000, noise=True,
                            rng=np.random.default_rng(5))
        m = np.asarray(lmc.mean(params, xq))
        v = np.asarray(lmc.variance(params, xq, noise=True))
        np.testing.assert_allclose(draws.mean(axis=1), m, atol=0.1)
        np.testing.assert_allclose(draws.var(axis=1), v, rtol=0.2,
                                   atol=0.01)

    def test_quantiler_analytic(self, fitted):
        from scipy import stats

        lmc, params, x0, _, _ = fitted
        xq = g3.with_output(x0[:10], 0)
        qv = lmc.quantiler(params, xq, q=0.975, noise=True)
        m = np.asarray(lmc.mean(params, xq))
        v = np.asarray(lmc.variance(params, xq, noise=True))
        np.testing.assert_allclose(
            qv, stats.norm.ppf(0.975, m, np.sqrt(v)), rtol=1e-5)

    def test_predict_and_scores(self, fitted):
        lmc, params, x0, y0, _ = fitted
        xq = g3.with_output(x0, 0)
        sc = lmc.scores(params, space=xq, hidden=y0, logp=True,
                        logpred=True)
        assert sc["_l2"] < 0.05
        assert np.isfinite(sc["_nlpd"])
        assert lmc.predict(params, space=xq) is not None

    def test_predictor_serving(self, fitted):
        """The serving wrapper works over the row format (baked params,
        fused bundle)."""
        lmc, params, x0, y0, _ = fitted
        pr = lmc.predictor(params)
        xq = g3.with_output(x0[:20], 0)
        # different compiled programs: f32 reordering noise only
        np.testing.assert_allclose(np.asarray(pr.mean(space=xq)),
                                   np.asarray(lmc.mean(params, xq)),
                                   rtol=1e-4, atol=1e-4)

    def test_find_map_polish(self, fitted):
        """find_MAP (L-BFGS over the ELBO) accepts and improves (or at
        least does not degrade) the Adam solution."""
        lmc, params, _x0, _y0, _ = fitted
        polished = lmc.find_MAP(start=params, points=1, display=False)
        assert lmc.loglike(polished) >= lmc.loglike(params) - 1e-3
