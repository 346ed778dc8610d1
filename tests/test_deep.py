"""Deep kernel learning (hypers/features.py).

Not a reference feature (the reference's only neural construct is the
arcsine NN kernel) — pins the composition algebra, the param plumbing
through the flat sampling vector, and end-to-end representation
learning on a task axis-aligned ARD cannot express compactly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import g3py_tpu as g3


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


def _ridge_data(rng, n=160, d=3, noise=0.05):
    """y = sin(2 x.a): one relevant direction, non-axis-aligned."""
    x = rng.standard_normal((n, d)).astype(np.float32)
    a = np.array([1.0, -2.0, 0.5], np.float32)
    f = lambda X: np.sin(2.0 * (np.asarray(X) @ a))
    y = f(x) + noise * rng.standard_normal(n).astype(np.float32)
    return x, y, f


class TestDeepKernel:
    def test_cov_is_base_on_features(self, rng):
        """dk.cov == base.cov evaluated on dk.features — the defining
        composition, cross and square forms."""
        x, y, _ = _ridge_data(rng, n=48)
        dk = g3.DeepKernel(g3.MAT32, x, widths=(8, 2), activation="relu")
        gp = g3.GP(space=x[:4], kernel=dk, noisy=True, name="DKC")
        gp.observed(x, y)
        p = {k: jnp.asarray(v) for k, v in gp.params_default.items()}
        f1 = dk.features(p, x[:20])
        f2 = dk.features(p, x[20:])
        assert f1.shape == (20, 2)
        direct = np.asarray(dk.cov(p, x[:20], x[20:]))
        viabase = np.asarray(dk.base.cov(p, f1, f2))
        np.testing.assert_allclose(direct, viabase, rtol=1e-6)
        sq = np.asarray(dk.cov(p, x[:20]))
        np.testing.assert_allclose(sq, np.asarray(dk.base.cov(p, f1)),
                                   rtol=1e-6)
        # PSD up to jitter
        w = np.linalg.eigvalsh(sq)
        assert w.min() > -1e-4 * w.max()

    def test_default_hypers_deterministic_and_calibrated(self, rng):
        """Weight init is seeded (two builds agree exactly) and the base
        kernel's defaults are computed on the initial features."""
        x, y, _ = _ridge_data(rng, n=64)
        ps = []
        for tag in ("DKA", "DKB"):
            dk = g3.DeepKernel(g3.SE, x, widths=(8, 2))
            gp = g3.GP(space=x[:4], kernel=dk, noisy=True, name=tag)
            gp.observed(x, y)
            ps.append({k.replace(tag, "T"): np.asarray(v)
                       for k, v in gp.params_default.items()})
        assert set(ps[0]) == set(ps[1])
        for k in ps[0]:
            np.testing.assert_array_equal(ps[0][k], ps[1][k])
        w0 = ps[0]["T_DeepKernel_w0"]
        assert w0.shape == (3, 8) and np.abs(w0).max() > 0.05
        # SE rate defaulted on the feature spread, not the raw inputs
        assert np.all(ps[0]["T_DeepKernel_SE_rate"] > 0)

    def test_gradients_flow_to_weights(self, rng):
        x, y, _ = _ridge_data(rng, n=48)
        dk = g3.DeepKernel(g3.SE, x, widths=(8, 2))
        gp = g3.GP(space=x[:4], kernel=dk, noisy=True, name="DKG")
        gp.observed(x, y)
        p0 = gp.params_default
        pure = gp._logp_pure(prior=False)
        space, inputs, outputs = map(jnp.asarray,
                                     gp._resolve_data(None, None, None))
        vec = jnp.zeros(0, jnp.float32)
        pj = {k: jnp.asarray(v, jnp.float32) for k, v in p0.items()}
        grads = jax.grad(lambda q: pure(q, space, inputs, outputs, vec))(pj)
        for k in ("DKG_DeepKernel_w0", "DKG_DeepKernel_w1",
                  "DKG_DeepKernel_b0"):
            assert float(jnp.max(jnp.abs(grads[k]))) > 1e-6, k
        assert np.all(np.isfinite(np.asarray(
            gp.dlogp(gp.active.sampling_params(p0)))))

    def test_learns_the_ridge_direction(self, rng):
        """find_MAP trains the extractor jointly: NLL drops by >> the
        noise-model optimum and held-out predictions beat the constant
        predictor by a wide margin."""
        x, y, f = _ridge_data(rng)
        dk = g3.DeepKernel(g3.SE, x, widths=(16, 2))
        gp = g3.GP(space=x[:4], location=g3.Bias(), kernel=dk, noisy=True,
                   name="DKL")
        gp.observed(x, y)
        ll0 = gp.loglike(gp.params_default)
        pm = gp.find_MAP(points=2, powell=False, display=False)
        ll1 = gp.loglike(pm)
        assert ll1 > ll0 + 50.0
        xq = rng.standard_normal((64, 3)).astype(np.float32)
        mu = np.asarray(gp.mean(pm, space=xq))
        rmse = float(np.sqrt(np.mean((mu - f(xq)) ** 2)))
        assert rmse < 0.85 * float(np.std(f(xq)))

    def test_input_sensitivity_and_algebra(self, rng):
        x, y, _ = _ridge_data(rng, n=48)
        dk = g3.DeepKernel(g3.SE, x, widths=(8, 2))
        k = dk + g3.WN(x)
        gp = g3.GP(space=x[:4], kernel=k, noisy=False, name="DKS")
        gp.observed(x, y)
        p = {kk: jnp.asarray(v) for kk, v in gp.params_default.items()}
        s = np.asarray(dk.input_sensitivity(p))
        assert s.shape == (3,) and np.all(s >= 0) and s.max() > 0
        g = np.asarray(k.cov(p, x[:8]))
        assert g.shape == (8, 8) and np.all(np.isfinite(g))

    def test_l2_weight_potential(self, rng):
        """set_potential on the extractor regularizes the weights through
        the standard potentials path — INCLUDING when the kernel sits
        inside composite algebra (noisy=True wraps it in a KernelSum;
        registration must walk nested parts, stochastic._register_params)."""
        x, y, _ = _ridge_data(rng, n=48)
        dk = g3.DeepKernel(g3.SE, x, widths=(8, 2))
        dk.set_potential("_w", "L2", 10.0)
        gp = g3.GP(space=x[:4], kernel=dk, noisy=True, name="DKP")
        gp.observed(x, y)
        p = {k: jnp.asarray(v) for k, v in gp.params_default.items()}
        pot = dk.potential_logp(p)
        assert pot is not None and float(pot) < 0.0
        # the registry saw it: logp = loglike + flat-prior(0) + potential
        assert gp.logp(gp.params_default) == pytest.approx(
            gp.loglike(gp.params_default) + float(pot), rel=1e-5)

    def test_pathwise_sampler_through_deep_kernel(self, rng):
        """Matheron pathwise draws with a DeepKernel signal: the RFF
        prior is drawn in FEATURE space (base-kernel spectral density on
        phi(x)), so empirical draw moments must match the analytic
        posterior and same-key draws must be one consistent path."""
        x, y, _ = _ridge_data(rng)
        dk = g3.DeepKernel(g3.SE, x, widths=(16, 2))
        gp = g3.GP(space=x[:4], location=g3.Bias(), kernel=dk, noisy=True,
                   name="DKW")
        gp.observed(x, y)
        pm = gp.find_MAP(points=1, powell=False, display=False)
        pr = gp.predictor(pm)
        xq = rng.standard_normal((40, 3)).astype(np.float32)
        S = 600
        draws = pr.pathwise_sampler(space=xq, samples=S, key=2,
                                    n_features=4096)
        assert draws.shape == (40, S)
        mu_ref = np.asarray(pr.mean(space=xq))
        sd_ref = np.asarray(pr.std(space=xq))
        # the trained DKL interpolates its data manifold (sd down to
        # ~1e-4), where the finite-feature RFF bias dominates the MC
        # error — test MC error plus a small absolute bias floor, and
        # check std ratios only where the posterior is non-degenerate
        err = np.abs(draws.mean(axis=1) - mu_ref)
        assert np.max(err - 5.0 * sd_ref / np.sqrt(S)) < 0.05
        mask = sd_ref > 0.05
        assert mask.sum() >= 10
        ratio = draws.std(axis=1)[mask] / sd_ref[mask]
        assert np.all(ratio > 0.7) and np.all(ratio < 1.3)
        # consistency: the same key re-queried on a subset is the SAME
        # path (up to f32 program-reordering noise, amplified here by the
        # trained near-interpolation gram, noise var ~1e-5 — independent
        # draws would differ by the posterior sd, up to ~0.9)
        sub = pr.pathwise_sampler(space=xq[:10], samples=4, key=7,
                                  n_features=512)
        full = pr.pathwise_sampler(space=xq, samples=4, key=7,
                                   n_features=512)
        assert np.max(np.abs(sub - full[:10])) < 0.05

    def test_svgp_deep_kernel(self, rng):
        """Stochastic variational DKL (Wilson et al. 2016b): the extractor
        trains through fit_svgp's Adam loop with inducing points in input
        space."""
        x, y, f = _ridge_data(rng, n=400)
        dk = g3.DeepKernel(g3.SE, x, widths=(16, 2))
        svp = g3.SVP(space=x[:4], location=g3.Bias(), kernel=dk,
                     likelihood=g3.GaussianLik(), inducing=24, name="DKV")
        svp.observed(x, y)
        p0 = svp.params_default
        pm, hist = svp.fit_svgp(batch_size=128, steps=400, lr=3e-3,
                                start=p0, key=3, display=False)
        assert hist[-1] < hist[0] - 20.0
        mu = np.asarray(svp.mean(pm, space=x[:64]))
        assert np.all(np.isfinite(mu))
