"""NonGaussianMultiSSGP: Laplace inference on the exact LMC-mixed
multi-output state-space prior (multivariate log-Gaussian Cox processes,
mixed-modality channels).

Pinning claims: (1) the 2-channel Poisson evidence matches an
independent dense-numpy Laplace on the model's OWN coregionalized gram
(R&W alg. 3.1); (2) a likelihood LIST fuses modalities (counts +
Bernoulli) through shared latents; (3) chunked == plain and
sharded == plain (value AND gradient) on the 8-device virtual mesh;
(4) the model API (find_MAP incl. engine='distributed', statistics,
sampler, quantiler) carries the family.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.special import gammaln

import g3py_tpu as g3


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _data(rng, n0=70, n1=60, span=20.0):
    t0 = np.sort(rng.uniform(0, span, n0)).astype(np.float32)
    t1 = np.sort(rng.uniform(0, span, n1)).astype(np.float32)
    lat = lambda t: np.stack([np.sin(t / 2.0), np.cos(t / 3.0)], -1)
    w = np.array([[1.0, 0.3], [0.6, -0.8]], np.float32)
    b = np.array([1.0, 0.5], np.float32)
    g0 = lat(t0) @ w[0] + b[0]
    g1 = lat(t1) @ w[1] + b[1]
    y0 = rng.poisson(np.exp(g0)).astype(np.float32)
    y1 = rng.poisson(np.exp(g1)).astype(np.float32)
    return t0, t1, y0, y1


def _build(x, y, name, likelihood=None, **kw):
    m = g3.NonGaussianMultiSSGP(
        space=x, kernel=g3.MAT32(x[:, :1]),
        likelihood=likelihood if likelihood is not None
        else g3.PoissonLik(),
        outputs_dim=2, name=name, **kw)
    m.observed(x, y)
    return m


class TestOracle:
    def test_poisson_matches_dense_laplace_oracle(self, rng):
        """2-channel Poisson evidence vs dense numpy f64 Laplace on the
        model's own coregionalized gram K[k,l] = (W W')[p_k, p_l]
        k_t(t_k, t_l) with per-channel biases as the offset."""
        t0, t1, y0, y1 = _data(rng, n0=55, n1=45)
        x, y = g3.stack_outputs([t0[:, None], t1[:, None]], [y0, y1])
        m = _build(x, y, "OR")
        p = dict(m.params)
        pj = {k: jnp.asarray(v) for k, v in p.items()}
        n = len(y)
        idx = np.rint(x[:, 1]).astype(np.int64)
        tall = x[:, 0]
        w = np.asarray(g3.hypers.hval(m.f_mixing.w, p), np.float64)
        b = np.asarray(g3.hypers.hval(m.f_mixing.b, p), np.float64)
        kt = np.asarray(m.f_kernels[0].cov(
            pj, jnp.asarray(tall[:, None])), np.float64)
        K = (w @ w.T)[np.ix_(idx, idx)] * kt + 1e-8 * np.eye(n)
        y64 = np.asarray(y, np.float64)
        off = b[idx]
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
        ll_m = float(m.loglike(p))
        assert abs(ll_m - log_z) < 3e-4 * max(1.0, abs(log_z))
        g = np.asarray(m.dlogp(p))
        assert np.all(np.isfinite(g)) and np.any(g != 0)
        # posterior latent moments at held-out rows vs the dense oracle
        tq = np.linspace(1, 19, 9).astype(np.float32)
        xq = g3.with_output(tq[:, None], 1)
        kq = np.asarray(m.f_kernels[0].cov(
            pj, jnp.asarray(tall[:, None]), jnp.asarray(tq[:, None])),
            np.float64)                                   # (n, nq)
        kcross = ((w @ w.T)[np.ix_(idx, np.full(len(tq), 1))] * kq)
        kqq = np.asarray(m.f_kernels[0].cov(
            pj, jnp.asarray(tq[:, None])), np.float64) * (w @ w.T)[1, 1]
        sq = np.sqrt(np.exp(off + f))
        lb = np.linalg.cholesky(
            np.eye(n) + sq[:, None] * K * sq[None, :])
        mean_d = kcross.T @ avec
        vmat = np.linalg.solve(lb, sq[:, None] * kcross)
        var_d = np.diagonal(kqq) - np.sum(vmat * vmat, axis=0)
        mq = np.asarray(m.location(p, space=xq)) - b[1]
        vq = np.asarray(m.kernel_diag(p, space=xq))
        np.testing.assert_allclose(mq, mean_d, atol=5e-3)
        np.testing.assert_allclose(vq, var_d, atol=3e-3)


class TestModelAPI:
    def test_fit_and_statistics(self, rng):
        t0, t1, y0, y1 = _data(rng)
        x, y = g3.stack_outputs([t0[:, None], t1[:, None]], [y0, y1])
        m = _build(x, y, "MA")
        lp0 = float(m.logp(m.params))
        p = m.find_MAP(points=1, max_iters=25, display=False)
        assert float(m.logp(p)) > lp0
        tq = np.linspace(0.5, 19.5, 15).astype(np.float32)
        lat = lambda t: np.stack([np.sin(t / 2.0), np.cos(t / 3.0)], -1)
        w = np.array([[1.0, 0.3], [0.6, -0.8]], np.float32)
        b = np.array([1.0, 0.5], np.float32)
        for ch in (0, 1):
            xq = g3.with_output(tq[:, None], ch)
            rate = np.asarray(m.mean(p, space=xq))
            assert np.all(np.isfinite(rate)) and np.all(rate > 0)
            err = np.abs(np.log(rate) - (lat(tq) @ w[ch] + b[ch])).mean()
            assert err < 0.6
            vn = np.asarray(m.variance(p, space=xq, noise=True))
            v = np.asarray(m.variance(p, space=xq))
            assert np.all(vn >= rate * 0.99)   # Poisson: Var >= rate
            assert np.all(v >= 0)
        xq = g3.with_output(tq[:, None], 1)
        s = m.sampler(p, space=xq, samples=4, noise=True)
        assert s.shape == (15, 4) and np.all(s >= 0)
        assert np.allclose(s, np.round(s))
        q9 = m.quantiler(p, space=xq, q=0.9)
        q1 = m.quantiler(p, space=xq, q=0.1)
        assert np.all(q9 >= q1) and np.all(q1 >= 0)
        lpred = float(m.logpredictive(p, space=x[:25], vector=y[:25]))
        assert np.isfinite(lpred)
        tc = m.task_correlations(p)
        assert tc.shape == (2, 2) and abs(tc[0, 1]) <= 1.0

    def test_mixed_modality(self, rng):
        """Counts in channel 0, Bernoulli events in channel 1, shared
        latents; the per-channel likelihood list trains and predicts
        with each channel's own link."""
        t0, t1, y0, _ = _data(rng, n0=60, n1=50)
        pev = 1.0 / (1.0 + np.exp(-2.0 * np.sin(t1 / 2.0)))
        yb = (rng.uniform(size=len(t1)) < pev).astype(np.float32)
        x, y = g3.stack_outputs([t0[:, None], t1[:, None]], [y0, yb])
        m = _build(x, y, "MM",
                   likelihood=[g3.PoissonLik(), g3.BernoulliLik()])
        lp0 = float(m.logp(m.params))
        assert np.isfinite(lp0)
        g = np.asarray(m.dlogp(m.params))
        assert np.all(np.isfinite(g)) and np.any(g != 0)
        tq = np.linspace(1, 19, 10).astype(np.float32)
        pr = np.asarray(m.mean(m.params,
                               space=g3.with_output(tq[:, None], 1)))
        assert np.all((pr >= 0) & (pr <= 1))
        rate = np.asarray(m.mean(m.params,
                                 space=g3.with_output(tq[:, None], 0)))
        assert np.all(rate > 0)
        # Bernoulli channel quantiles are probabilities
        q9 = m.quantiler(m.params, space=g3.with_output(tq[:, None], 1),
                         q=0.9)
        assert np.all((q9 >= 0) & (q9 <= 1))

    def test_target_validation_per_channel(self, rng):
        t0, t1, y0, _ = _data(rng, n0=30, n1=25)
        x, _ = g3.stack_outputs([t0[:, None], t1[:, None]],
                                [y0, np.zeros(25, np.float32)])
        m = g3.NonGaussianMultiSSGP(
            space=x, kernel=g3.MAT32(x[:, :1]),
            likelihood=[g3.PoissonLik(), g3.BernoulliLik()],
            outputs_dim=2, name="TV")
        y_bad = np.concatenate([y0, 2.0 * np.ones(25, np.float32)])
        with pytest.raises(ValueError, match="0, 1"):
            m.observed(x, y_bad)

    def test_duplicate_likelihood_hypers_stay_separate(self, rng):
        t0, t1, y0, y1 = _data(rng, n0=25, n1=25)
        x, y = g3.stack_outputs(
            [t0[:, None], t1[:, None]],
            [y0.astype(np.float32), y1.astype(np.float32)])
        m = g3.NonGaussianMultiSSGP(
            space=x, kernel=g3.MAT32(x[:, :1]),
            likelihood=[g3.NegBinomialLik(), g3.NegBinomialLik()],
            outputs_dim=2, name="DU")
        m.observed(x, y)
        disp = [k for k in m.params if "dispersion" in k]
        assert len(disp) == 2 and len(set(disp)) == 2


class TestScaling:
    def test_chunked_matches_plain(self, rng):
        from g3py_tpu.config import settings

        t0, t1, y0, y1 = _data(rng, n0=80, n1=70)
        x, y = g3.stack_outputs([t0[:, None], t1[:, None]], [y0, y1])
        m = _build(x, y, "CP")
        p = m.params
        ll_plain = float(m.loglike(p))
        tq = np.linspace(1, 19, 8).astype(np.float32)
        xq = g3.with_output(tq[:, None], 0)
        mean_plain = np.asarray(m.mean(p, space=xq))
        old = settings.ssm_chunk_threshold, settings.ssm_chunk
        try:
            settings.ssm_chunk_threshold, settings.ssm_chunk = 64, 64
            m2 = _build(x, y, "CQ")
            p2 = {k.replace("CP", "CQ", 1): v for k, v in p.items()}
            ll_chunk = float(m2.loglike(p2))
            g = np.asarray(m2.dlogp(p2))
            mean_c = np.asarray(m2.mean(p2, space=xq))
        finally:
            settings.ssm_chunk_threshold, settings.ssm_chunk = old
        np.testing.assert_allclose(ll_chunk, ll_plain, rtol=2e-5)
        assert np.all(np.isfinite(g)) and np.any(g != 0)
        np.testing.assert_allclose(mean_c, mean_plain, atol=3e-4)

    def test_sharded_matches_plain(self, rng):
        """nll_distributed (8-device virtual mesh, build_fn/aux form):
        value AND gradient == the plain Laplace objective, at n that
        does not divide over the mesh."""
        t0, t1, y0, y1 = _data(rng, n0=61, n1=52)
        x, y = g3.stack_outputs([t0[:, None], t1[:, None]], [y0, y1])
        m = _build(x, y, "SH")
        p = dict(m.params)
        v_plain = -float(m.loglike(p))
        v_shard = float(m.nll_distributed(p))
        np.testing.assert_allclose(v_shard, v_plain, rtol=1e-5)

        reg = m.active
        pure = m._logp_pure(prior=False)
        xj = jnp.asarray(x, jnp.float32)
        yj = jnp.asarray(y, jnp.float32)
        vec0 = jnp.zeros(0, jnp.float32)
        u = jnp.asarray(reg.dict_to_array(p))
        g1 = np.asarray(jax.grad(
            lambda ww: -pure(reg.array_to_dict_jax(ww), xj, xj, yj,
                             vec0))(u))
        g2 = np.asarray(jax.grad(
            lambda ww: m.nll_distributed(reg.array_to_dict_jax(ww)))(u))
        np.testing.assert_allclose(g2, g1, rtol=1e-4,
                                   atol=1e-5 * np.max(np.abs(g1)))

    def test_find_map_distributed_improves(self, rng):
        t0, t1, y0, y1 = _data(rng, n0=30, n1=26)
        x, y = g3.stack_outputs([t0[:, None], t1[:, None]], [y0, y1])
        m = _build(x, y, "FD")
        lp0 = float(m.logp(m.params))
        p = m.find_MAP(engine="distributed", points=1, max_iters=8,
                       display=False)
        lp1 = float(m.logp(p))
        assert np.isfinite(lp1) and lp1 > lp0
