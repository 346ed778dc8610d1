"""Bayesian optimization (bayesian/bo.py) — beyond-reference module.

Pins the acquisition math against closed forms, the NaN-hardening that
keeps a collapsed surrogate from poisoning the ascent, and the loop
end-to-end on a 1-D multimodal objective.
"""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.stats import norm

import g3py_tpu as g3
from g3py_tpu.bayesian.bo import _log_h


def _f(x):
    x = np.atleast_2d(x)
    return (np.sin(3 * x[..., 0]) + 0.7 * np.cos(5 * x[..., 0])
            - 0.1 * (x[..., 0] - 1) ** 2)


_TRUE_MAX = 1.4295  # at x = 2.536 on [0, 4]


def _surrogate(name="BOs"):
    return g3.GP(space=np.zeros((4, 1), np.float32), location=g3.Bias(),
                 kernel=g3.SE(1), noisy=True, name=name)


class TestAcquisitions:
    def test_log_h_matches_direct_and_tail(self):
        z = jnp.asarray(np.linspace(-3.5, 3.0, 40), jnp.float32)
        got = np.asarray(_log_h(z))
        want = np.log(norm.pdf(np.asarray(z))
                      + np.asarray(z) * norm.cdf(np.asarray(z)))
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
        # far tail: finite, monotone increasing in z
        zt = jnp.asarray(np.linspace(-30.0, -5.0, 26), jnp.float32)
        t = np.asarray(_log_h(zt))
        assert np.all(np.isfinite(t)) and np.all(np.diff(t) > 0)

    def test_ei_closed_form(self):
        """EI from the module == the textbook formula on the surrogate's
        own posterior mean/std."""
        rng = np.random.default_rng(0)
        x = rng.uniform(0, 4, (12, 1)).astype(np.float32)
        y = _f(x).astype(np.float32)
        gp = _surrogate("BOe")
        gp.observed(x, y)
        pm = gp.find_MAP(points=1, powell=False, display=False)
        bo = g3.BayesOpt(gp, bounds=[[0.0, 4.0]], maximize=True, xi=0.0)
        bo.history["y"] = list(y)
        xq = np.linspace(0, 4, 30, dtype=np.float32)[:, None]
        mu = np.asarray(gp.mean(pm, space=xq))
        sd = np.asarray(gp.std(pm, space=xq))
        best = y.max()
        zz = (mu - best) / sd
        want = sd * (norm.pdf(zz) + zz * norm.cdf(zz))
        got = bo.acquisition(xq, params=pm, kind="EI")
        np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-5)
        # logEI agrees with log(EI) where EI is representable
        mask = want > 1e-6
        logei = bo.acquisition(xq, params=pm, kind="logEI")
        np.testing.assert_allclose(logei[mask], np.log(want[mask]),
                                   rtol=5e-3, atol=5e-3)

    def test_minimize_flips_sign(self):
        rng = np.random.default_rng(1)
        x = rng.uniform(0, 4, (10, 1)).astype(np.float32)
        y = ((x[:, 0] - 2.0) ** 2).astype(np.float32)
        gp = _surrogate("BOm")
        gp.observed(x, y)
        pm = gp.find_MAP(points=1, powell=False, display=False)
        bo = g3.BayesOpt(gp, bounds=[[0.0, 4.0]], maximize=False, beta=2.0)
        bo.history["y"] = list(y)
        xq = np.linspace(0, 4, 41, dtype=np.float32)[:, None]
        ucb = bo.acquisition(xq, params=pm, kind="UCB")
        # the minimization UCB peaks near the minimum at x=2
        assert abs(float(xq[np.argmax(ucb), 0]) - 2.0) < 0.6

    def test_degenerate_surrogate_is_sanitized(self):
        """Zero noise + duplicated rows = singular gram; acquisition must
        come back finite-or-minus-inf, never NaN."""
        x = np.array([[1.0], [1.0], [1.0], [2.0]], np.float32)
        y = np.array([0.5, 0.5, 0.5, -0.2], np.float32)
        gp = _surrogate("BOd")
        gp.observed(x, y)
        p = dict(gp.params_default)
        nk = [k for k in p if "Noise_var" in k][0]
        p[nk] = np.asarray(0.0, np.float32)
        bo = g3.BayesOpt(gp, bounds=[[0.0, 4.0]], maximize=True)
        bo.history["y"] = list(y)
        a = bo.acquisition(np.linspace(0, 4, 17)[:, None], params=p,
                           kind="logEI")
        assert not np.any(np.isnan(a))


class TestSuggest:
    def test_suggest_in_bounds_and_improves_on_screening(self):
        rng = np.random.default_rng(2)
        x = rng.uniform(0, 4, (14, 1)).astype(np.float32)
        y = _f(x).astype(np.float32)
        gp = _surrogate("BOg")
        gp.observed(x, y)
        pm = gp.find_MAP(points=1, powell=False, display=False)
        bo = g3.BayesOpt(gp, bounds=[[0.0, 4.0]], maximize=True, seed=3)
        bo.history["y"] = list(y)
        xs = bo.suggest(params=pm, kind="logEI", candidates=256, starts=8,
                        steps=40)
        assert xs.shape == (1,) and 0.0 <= xs[0] <= 4.0
        # the ascended point beats the best of a fresh random screen
        screen = bo._uniform(256)
        a_screen = bo.acquisition(screen, params=pm, kind="logEI").max()
        a_final = bo.acquisition(xs[None, :], params=pm, kind="logEI")[0]
        assert a_final >= a_screen - 1e-3

    def test_thompson_batch(self):
        rng = np.random.default_rng(4)
        x = rng.uniform(0, 4, (16, 1)).astype(np.float32)
        y = _f(x).astype(np.float32)
        gp = _surrogate("BOt")
        gp.observed(x, y)
        pm = gp.find_MAP(points=1, powell=False, display=False)
        bo = g3.BayesOpt(gp, bounds=[[0.0, 4.0]], maximize=True, seed=5)
        bo.history["y"] = list(y)
        xq = bo.suggest(params=pm, kind="thompson", q=3, candidates=256)
        assert xq.shape == (3, 1)
        assert np.all(xq >= 0.0) and np.all(xq <= 4.0)

    def test_qei_fantasies(self):
        """q > 1 analytic proposals via fantasies: right shape, in
        bounds, mutually distinct (each fantasy must dent the incumbent
        peak enough that the next ascent moves).  Hand-set hypers — a
        single-start MAP fit on 14 wiggly points can land in the
        degenerate all-noise optimum, where EVERY batch method
        legitimately collapses (flat acquisition); the test targets the
        fantasy mechanics, not fit luck."""
        rng = np.random.default_rng(6)
        x = rng.uniform(0, 4, (14, 1)).astype(np.float32)
        y = _f(x).astype(np.float32)
        gp = _surrogate("BOq")
        gp.observed(x, y)
        pm = dict(gp.params_default)
        for k in pm:
            if "SE_var" in k:
                pm[k] = np.float32(1.0)
            if "SE_rate" in k:
                pm[k] = np.asarray(pm[k]) * 0 + np.float32(2.0)
            if "Noise_var" in k:
                pm[k] = np.float32(0.01)
        bo = g3.BayesOpt(gp, bounds=[[0.0, 4.0]], maximize=True, seed=7,
                         xi=0.01)
        bo.history["y"] = list(y)
        for liar in ("mean", "best", "worst"):
            xq = bo.suggest(params=pm, kind="logEI", q=3, candidates=256,
                            starts=8, steps=40, liar=liar)
            assert xq.shape == (3, 1)
            assert np.all(xq >= 0.0) and np.all(xq <= 4.0)
            d = np.abs(xq[:, None, 0] - xq[None, :, 0])
            off = d[~np.eye(3, dtype=bool)]
            assert np.all(off > 1e-3), (liar, xq.ravel())
        with pytest.raises(ValueError):
            bo.suggest(params=pm, kind="logEI", q=2, liar="nonsense")


class TestLoop:
    def test_run_finds_the_global_max(self):
        gp = _surrogate("BOr")
        bo = g3.BayesOpt(gp, bounds=[[0.0, 4.0]], maximize=True, seed=1,
                         xi=0.05)
        pm, hist = bo.run(_f, iters=10, init=6, kind="UCB",
                          candidates=512, steps=30)
        assert len(hist["y"]) == 16
        assert np.all(np.diff(hist["best_y"]) >= -1e-6)
        xb, yb = bo.best()
        assert yb > 0.9  # true max 1.43; random-search 16 pts averages ~0.8
        # the noise floor held: refit params keep a positive noise
        nk = [k for k in pm if "Noise_var" in k][0]
        assert float(pm[nk]) > 0.0
