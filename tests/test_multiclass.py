"""Multi-class softmax classification (MulticlassSVP + CategoricalLik):
bound validity, head-batched q algebra, training, statistics, sharding.

No reference counterpart — the reference has no classification at all;
these tests pin the new capability's math instead of parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import g3py_tpu as g3
from g3py_tpu.models.likelihoods import CategoricalLik
from g3py_tpu.models.svgp import VariationalQ, VariationalQHeads


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _sector_data(rng, n=300, classes=3):
    """Angular-sector classes in 2-D: smooth boundaries, GP-learnable."""
    x = rng.standard_normal((n, 2)).astype(np.float32)
    ang = np.arctan2(x[:, 1], x[:, 0])
    y = ((ang + np.pi) // (2 * np.pi / classes)).clip(
        0, classes - 1).astype(np.float32)
    return x, y


class TestCategoricalLik:
    def test_logp_elem_is_log_softmax(self, rng):
        lik = CategoricalLik(4)
        f = jnp.asarray(rng.standard_normal((7, 4)), jnp.float32)
        y = jnp.asarray(rng.integers(0, 4, 7))
        lp = np.asarray(lik.logp_elem({}, y, f))
        ref = np.take_along_axis(
            np.asarray(jax.nn.log_softmax(f, axis=-1)),
            np.asarray(y)[:, None], axis=-1)[:, 0]
        np.testing.assert_allclose(lp, ref, rtol=1e-6)

    def test_jensen_bound_lower_bounds_mc(self, rng):
        """The analytic ELL bound mu_y - logsumexp(mu + var/2) must sit
        BELOW the true E[log softmax(f)_y] (estimated with heavy MC)."""
        lik = CategoricalLik(3)
        mu = jnp.asarray(rng.standard_normal((5, 3)), jnp.float32)
        var = jnp.asarray(rng.uniform(0.1, 2.0, (5, 3)), jnp.float32)
        y = jnp.asarray(rng.integers(0, 3, 5))
        bound = np.asarray(lik.expected_logp({}, y, mu, var))
        eps = rng.standard_normal((20000, 5, 3)).astype(np.float32)
        f = np.asarray(mu)[None] + np.sqrt(np.asarray(var))[None] * eps
        ls = np.asarray(jax.nn.log_softmax(jnp.asarray(f), axis=-1))
        mc = np.take_along_axis(
            ls, np.broadcast_to(np.asarray(y)[None, :, None],
                                (20000, 5, 1)), axis=-1)[..., 0].mean(0)
        assert np.all(bound <= mc + 3e-2)

    def test_bound_tight_at_zero_variance(self, rng):
        """var -> 0 collapses the bound to the exact log softmax."""
        lik = CategoricalLik(3)
        mu = jnp.asarray(rng.standard_normal((6, 3)), jnp.float32)
        y = jnp.asarray(rng.integers(0, 3, 6))
        bound = np.asarray(lik.expected_logp({}, y, mu,
                                             jnp.zeros_like(mu)))
        exact = np.asarray(lik.logp_elem({}, y, mu))
        np.testing.assert_allclose(bound, exact, rtol=1e-5, atol=1e-6)

    def test_probs_normalized_and_ordered(self, rng):
        lik = CategoricalLik(4)
        mu = jnp.asarray(rng.standard_normal((10, 4)), jnp.float32)
        var = jnp.asarray(rng.uniform(0.1, 1.0, (10, 4)), jnp.float32)
        p = np.asarray(lik.probs({}, mu, var))
        np.testing.assert_allclose(p.sum(-1), 1.0, rtol=1e-5)
        # the largest-mean class keeps the largest smoothed probability
        assert np.all(np.argmax(p, -1) == np.argmax(np.asarray(mu), -1))

    def test_rejects_bad_targets(self):
        lik = CategoricalLik(3)
        with pytest.raises(ValueError, match="lie in"):
            lik.check_targets(np.array([0.0, 1.0, 3.0]))
        with pytest.raises(ValueError, match="integer"):
            lik.check_targets(np.array([0.0, 0.5]))
        with pytest.raises(ValueError, match="classes >= 2"):
            CategoricalLik(1)


class TestVariationalQHeads:
    def test_default_is_prior_with_zero_kl(self):
        q = VariationalQHeads(5, 3, name="QH")
        q.check_hypers("T_")
        params = q.default_hypers()
        named = {p.name: v for p, v in params.items()}
        qm, lq = q.factors(named)
        assert qm.shape == (3, 5) and lq.shape == (3, 5, 5)
        np.testing.assert_allclose(np.asarray(lq),
                                   np.broadcast_to(np.eye(5), (3, 5, 5)))
        assert abs(float(q.kl(named))) < 1e-6

    def test_kl_is_sum_of_per_head_scalar_kls(self, rng):
        """Heads KL == the scalar VariationalQ formula summed per head."""
        m, C = 4, 3
        qh = VariationalQHeads(m, C, name="QH2")
        qh.check_hypers("T_")
        qm = rng.standard_normal((C, m)).astype(np.float32)
        ql = (0.3 * rng.standard_normal((C, m, m))).astype(np.float32)
        ph = {qh.qm.name: qm, qh.ql.name: ql}
        total = float(qh.kl(ph))
        acc = 0.0
        for c in range(C):
            qs = VariationalQ(m, name=f"Qs{c}")
            qs.check_hypers("T_")
            acc += float(qs.kl({qs.qm.name: qm[c], qs.ql.name: ql[c]}))
        np.testing.assert_allclose(total, acc, rtol=1e-5)


class TestMulticlassSVP:
    def _model(self, x, classes=3, m=24):
        svc = g3.MulticlassSVP(space=x, kernel=g3.SE(x), classes=classes,
                               inducing=m, name=f"MC{classes}_{m}")
        return svc

    def test_learns_sectors(self, rng):
        x, y = _sector_data(rng)
        svc = self._model(x)
        svc.observed(x, y)
        params, losses = svc.fit_svgp(batch_size=len(x), steps=600,
                                      lr=5e-2, display=False)
        assert losses[-1] < losses[0] - 100.0
        probs = svc.predict_proba(params)
        assert probs.shape == (len(x), 3)
        np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-4)
        acc = float((np.argmax(probs, -1) == y).mean())
        assert acc > 0.9
        assert (svc.predict_class(params) == np.argmax(probs, -1)).all()

    def test_statistics_shapes_and_scores(self, rng):
        x, y = _sector_data(rng, n=120)
        svc = self._model(x, m=12)
        svc.observed(x, y)
        params, _ = svc.fit_svgp(batch_size=len(x), steps=150, lr=5e-2,
                                 display=False)
        n = len(x)
        assert svc.location(params).shape == (n, 3)
        assert svc.kernel_diag(params).shape == (n, 3)
        assert svc.variance(params).shape == (n, 3)
        assert svc.variance(params, noise=True).shape == (n, 3)
        assert svc.covariance(params).shape == (3, n, n)
        f = svc.sampler(params, samples=4)
        assert f.shape == (n, 3, 4)
        lbl = svc.sampler(params, samples=4, noise=True)
        assert lbl.shape == (n, 4)
        assert set(np.unique(lbl)).issubset({0.0, 1.0, 2.0})
        qq = svc.quantiler(params, q=0.9)
        assert qq.shape == (n, 3) and np.all(qq >= 0) and np.all(qq <= 1)
        sc = svc.scores(params, logp=True, logpred=True, variance=True)
        for k in ("_accuracy", "_brier", "_nlpd", "_logp",
                  "_mean_prob_var"):
            assert np.isfinite(sc[k]), k
        assert 0.0 <= sc["_accuracy"] <= 1.0
        assert sc["_nlpd"] > 0.0

    def test_prior_statistics_broadcast_per_class(self, rng):
        x, y = _sector_data(rng, n=60)
        svc = self._model(x, m=8)
        svc.observed(x, y)
        loc = svc.location(svc.params_default, prior=True)
        kd = svc.kernel_diag(svc.params_default, prior=True)
        assert loc.shape == (60, 3) and kd.shape == (60, 3)
        # independent identical heads: all classes share the prior moments
        np.testing.assert_allclose(kd[:, 0], kd[:, 1])
        np.testing.assert_allclose(loc[:, 0], loc[:, 2])

    def test_default_q_elbo_equals_manual_bound(self, rng):
        """At q = prior (KL = 0) the loglike is exactly the Jensen data
        bound at the prior latent moments — pins the whole ELBO wiring."""
        x, y = _sector_data(rng, n=80)
        svc = self._model(x, m=10)
        svc.observed(x, y)
        p = svc.params_default
        got = float(svc.loglike(p))
        mf, varf = (np.asarray(a) for a in svc._latent(
            {k: jnp.asarray(v) for k, v in p.items()}, jnp.asarray(x)))
        manual = float(np.sum(
            np.take_along_axis(mf, y.astype(int)[:, None], -1)[:, 0]
            - np.asarray(jax.scipy.special.logsumexp(
                jnp.asarray(mf + 0.5 * varf), axis=-1))))
        np.testing.assert_allclose(got, manual, rtol=1e-5)

    def test_sharded_matches_single_device(self, rng):
        x, y = _sector_data(rng, n=256)
        svc = self._model(x, m=8)
        svc.observed(x, y)
        _p1, l1 = svc.fit_svgp(batch_size=len(x), steps=5, lr=1e-2,
                               display=False)
        _p2, l2 = svc.fit_svgp(batch_size=len(x), steps=5, lr=1e-2,
                               display=False,
                               mesh=min(len(jax.devices()), 8))
        # the FIRST loss is a pure function of the start point: exact up
        # to summation order.  Later steps drift faster than the scalar
        # family's: many ql-head gradients are ~0 at the default q, so
        # Adam's sign-like early updates amplify f32 psum ordering noise.
        np.testing.assert_allclose(l1[0], l2[0], rtol=2e-5)
        np.testing.assert_allclose(l1, l2, rtol=1e-3)

    def test_covariance_noise_unavailable(self, rng):
        x, y = _sector_data(rng, n=40)
        svc = self._model(x, m=6)
        svc.observed(x, y)
        with pytest.raises(ValueError, match="additive-noise"):
            svc.covariance(svc.params_default, noise=True)

    def test_find_map_polishes(self, rng):
        """find_MAP from an Adam start must not degrade the ELBO."""
        x, y = _sector_data(rng, n=100)
        svc = self._model(x, m=8)
        svc.observed(x, y)
        params, _ = svc.fit_svgp(batch_size=len(x), steps=200, lr=5e-2,
                                 display=False)
        before = float(svc.logp(params))
        polished = svc.find_MAP(start=params, points=1, powell=False,
                                display=False, max_time=30)
        assert float(svc.logp(polished)) >= before - 1e-3
