"""Datatrace analytics & plotting coverage: KDE round trips, clustering,
candidates, per-row errors, plot smoke tests (Agg backend)."""

import numpy as np
import pandas as pd
import pytest

import g3py_tpu as g3
from g3py_tpu.bayesian.average import (
    datatrace_to_kde,
    kde_to_datatrace,
    cluster_datatrace,
    errors_datatrace,
    find_candidates,
    marginal_datatrace,
    conditional_datatrace,
    plot_datatrace,
    hist_datatrace,
    kde_datatrace,
    scatter_datatrace,
)


@pytest.fixture(scope="module")
def gp_with_trace():
    rng = np.random.default_rng(0)
    x = np.linspace(0, 8, 24).astype(np.float32).reshape(-1, 1)
    y = (np.sin(x[:, 0]) + 0.1 * rng.standard_normal(24)).astype(np.float32)
    gp = g3.GP(space=x, location=g3.Bias(), kernel=g3.SE(x), name="ANL")
    gp.observed(x, y)
    gp.hidden = y
    dt = gp.sample_hypers(start=gp.params_default, samples=80, chains=8,
                          burnin_tol=0.2, seed=0)
    return gp, dt


class TestAnalytics:
    def test_kde_roundtrip(self, gp_with_trace):
        gp, dt = gp_with_trace
        kde = datatrace_to_kde(gp, dt, bandwidth=0.05)
        kde_dt = kde_to_datatrace(gp, kde, nsamples=50)
        assert len(kde_dt) >= 50
        assert np.all(np.isfinite(kde_dt["_ll"]))

    def test_clustering_and_candidates(self, gp_with_trace):
        gp, dt = gp_with_trace
        cluster_datatrace(gp, dt, n_components=2)
        assert "_cluster" in dt
        assert hasattr(gp, "_cluster")
        cands = find_candidates(dt, ll=2, mean=True, median=True)
        assert len(cands) >= 2
        assert "_ll" in cands

    def test_errors_datatrace(self, gp_with_trace):
        gp, dt = gp_with_trace
        sub = dt.iloc[:10].copy()
        errors_datatrace(gp, sub, space=gp.space, hidden=gp.hidden,
                         inputs=gp.inputs, outputs=gp.outputs, nlpd=True)
        assert "_l1" in sub and "_l2" in sub and "_nlpd" in sub
        assert np.isfinite(sub["_l1"]).all()

    def test_marginal_conditional(self, gp_with_trace):
        gp, dt = gp_with_trace
        m = marginal_datatrace(dt, like="SE", samples=20)
        assert len(m) == 20
        c = conditional_datatrace(dt, dt._ll > dt._ll.median())
        assert 0 < len(c) <= len(dt)

    def test_effective_sample_metrics(self, gp_with_trace):
        gp, dt = gp_with_trace
        target = g3.effective_sample_min(gp, p=2)
        assert target > 0
        for method in ["mIS", "adjusted", "batch"]:
            ess = g3.effective_sample_size(gp, dt, method=method, burnin=False,
                                           batch_size=5 if method == "batch" else None)
            assert ess >= 1, method


class TestBurnIn:
    def test_burn_in_change_point(self):
        """Pin the re-derived bisection (bayesian/average.py): on a chain
        whose walkers start dispersed and merge at a change point, the
        returned burn-in is the SMALLEST prefix window with |R-hat - 1|
        below tol — not the reference's stale previous upper bound (its
        ``burnin = upper`` before ``upper = n`` returns one bisection step
        above the minimal proven window)."""
        from g3py_tpu.bayesian.average import burn_in_samples, gelman_rubin

        rng = np.random.default_rng(3)
        nwalk, nsamp, ndim = 4, 256, 2
        chains = rng.standard_normal((nwalk, nsamp, ndim))
        # change point: walkers offset apart for the first 40 iterations
        offsets = 4.0 * np.array([-1.5, -0.5, 0.5, 1.5])
        chains[:, :40, :] += offsets[:, None, None]
        tol = 0.1
        b = burn_in_samples(chains, tol=tol)
        assert b < nsamp  # the full chain passes, so the bisection ran
        assert gelman_rubin(chains[:, :b, :]) < tol  # proven converged
        assert gelman_rubin(chains[:, :b - 1, :]) >= tol  # and minimal

    def test_burn_in_unconverged_returns_full(self):
        """When even the full window fails, the whole chain is burn-in."""
        from g3py_tpu.bayesian.average import burn_in_samples

        rng = np.random.default_rng(0)
        chains = rng.standard_normal((4, 64, 2))
        chains += np.arange(4)[:, None, None] * 50.0  # never merge
        assert burn_in_samples(chains, tol=0.1) == 64


class TestPlots:
    def test_plot_datatrace(self, gp_with_trace):
        gp, dt = gp_with_trace
        fig = plot_datatrace(dt, varnames=gp.active.param_names()[:2])
        assert fig is not None

    def test_hist_and_scatter(self, gp_with_trace):
        gp, dt = gp_with_trace
        hist_datatrace(dt, varnames=gp.active.param_names()[:2],
                       reference=gp.params_default)
        scatter_datatrace(dt, varnames=gp.active.param_names()[:2], samples=50)

    def test_process_plots(self, gp_with_trace):
        import matplotlib.pyplot as plt

        gp, dt = gp_with_trace
        gp.plot(quantiles_noise=False)
        plt.close("all")
        gp.plot_kernel()
        plt.close("all")
        gp.plot_concentration(figsize=None)
        plt.close("all")
        gp.plot_location()
        plt.close("all")
        gp.plot_space(observed=True)
        plt.close("all")

    def test_average_and_particles(self, gp_with_trace):
        gp, dt = gp_with_trace
        sub = dt.iloc[:: len(dt) // 4][:3]
        avg = gp.average(sub, quantiles=False, scores=True)
        assert "mean" in avg and "_l1" in avg
        parts = gp.particles(sub, nsamples=3)
        assert parts.shape == (len(gp.space), 3)

    def test_average_batch_matches_loop(self, gp_with_trace):
        """The vmapped datatrace average must reproduce the per-row loop
        (reference models.py:489-519 semantics) to f32 accumulation noise."""
        gp, dt = gp_with_trace
        sub = dt.iloc[:: len(dt) // 4][:4]
        batch = gp.average(sub, quantiles=True, quantiles_noise=True)
        loop = gp._average_loop(sub, True, quantiles=True, quantiles_noise=True)
        assert set(batch) == set(loop)
        for key in loop:
            a = np.asarray(batch[key], dtype=np.float64)
            b = np.asarray(loop[key], dtype=np.float64)
            np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-4,
                                       err_msg=key)

    def test_sample_api(self, gp_with_trace):
        gp, dt = gp_with_trace
        s = gp.sample(samples=2)
        assert s.shape == (len(gp.space), 2)


class TestFindMapJax:
    def test_jax_engine_matches_scipy(self):
        rng = np.random.default_rng(1)
        x = np.linspace(0, 8, 24).astype(np.float32).reshape(-1, 1)
        y = (np.sin(x[:, 0]) + 0.1 * rng.standard_normal(24)).astype(np.float32)
        gp = g3.GP(space=x, location=g3.Zero(), kernel=g3.SE(x), name="JOPT")
        gp.observed(x, y)
        p_jax = gp.find_MAP(points=2, engine="jax", display=False)
        p_sci = gp.find_MAP(points=2, display=False)
        np.testing.assert_allclose(gp.logp(p_jax), gp.logp(p_sci),
                                   rtol=1e-2, atol=0.5)

    def test_return_points(self):
        rng = np.random.default_rng(2)
        x = np.linspace(0, 4, 12).astype(np.float32).reshape(-1, 1)
        y = np.sin(x[:, 0]).astype(np.float32)
        gp = g3.GP(space=x, location=g3.Zero(), kernel=g3.SE(x), name="JOPT2")
        gp.observed(x, y)
        params, plist = gp.find_MAP(points=3, engine="jax",
                                    return_points=True, display=False)
        assert len(plist) == 3


class TestLagrange:
    def test_vector_constraint(self):
        """Vector-valued g with per-component multipliers (reference
        lagrange.py handles the general case)."""
        from g3py_tpu.utils.lagrange import (LagrangianConstraint,
                                             LagrangianMultiplier)

        f = lambda x: float(np.sum(x ** 2))
        c = LagrangianConstraint(lambda x: x, lower=np.array([1.0, 2.0]))
        opt = LagrangianMultiplier(f, [c])
        res = opt.minimize(np.zeros(2), outer_iters=30, tol=1e-6)
        np.testing.assert_allclose(res.x, [1.0, 2.0], atol=1e-3)

    def test_scalar_band(self):
        from g3py_tpu.utils.lagrange import (LagrangianConstraint,
                                             LagrangianMultiplier)

        f = lambda x: float((x[0] - 5.0) ** 2)
        c = LagrangianConstraint(lambda x: x[0], lower=0.0, upper=2.0)
        opt = LagrangianMultiplier(f, [c])
        res = opt.minimize(np.array([0.5]), outer_iters=30, tol=1e-6)
        np.testing.assert_allclose(res.x, [2.0], atol=1e-3)


class TestFindMapIterative:
    def test_iterative_engine_reaches_exact_map(self):
        """find_MAP(engine='iterative') optimizes the matrix-free objective
        (stochastic-trace gradients) and must land at the same optimum as
        the exact engine on a factorable problem."""
        rng = np.random.default_rng(0)
        n = 120
        x = np.sort(rng.uniform(0, 20, n)).astype(np.float32).reshape(-1, 1)
        y = (np.sin(0.8 * x[:, 0])
             + 0.1 * rng.standard_normal(n)).astype(np.float32)
        gp = g3.GP(space=x, location=g3.Bias(), kernel=g3.SE(x),
                   name="ITMAPT")
        gp.observed(x, y)
        p_it = gp.find_MAP(points=1, engine="iterative", display=False,
                           rank=60, cg_iters=400, probes=256)
        p_sc = gp.find_MAP(points=1, display=False)
        assert gp.logp(p_it) >= gp.logp(p_sc) - 1.0

    def test_device_loop_reaches_exact_map(self):
        """find_MAP(engine='iterative', loop='device') — the on-device
        optax L-BFGS scan over the matrix-free objective
        (bayesian/optimize_jax.lbfgs_minimize_guarded) — must land at the
        same optimum as the scipy host loop; the guard cliff (CG residual
        > 5e-2 reads as 1e10 with zero gradient) terminates it instead of
        trapping it (a rejected step RESETS the L-BFGS memory — a
        restored state would deterministically retry the identical
        failed step forever)."""
        rng = np.random.default_rng(0)
        n = 120
        x = np.sort(rng.uniform(0, 20, n)).astype(np.float32).reshape(-1, 1)
        y = (np.sin(0.8 * x[:, 0])
             + 0.1 * rng.standard_normal(n)).astype(np.float32)
        gp = g3.GP(space=x, location=g3.Bias(), kernel=g3.SE(x),
                   name="ITMAPD")
        gp.observed(x, y)
        p_dev = gp.find_MAP(points=1, engine="iterative", loop="device",
                            display=False, rank=60, cg_iters=400,
                            probes=256, max_iters=80)
        p_sc = gp.find_MAP(points=1, display=False)
        assert gp.logp(p_dev) >= gp.logp(p_sc) - 1.0

    def test_device_loop_guard_cliff_contract(self):
        """lbfgs_minimize_guarded against a hard trust cliff: the
        constrained minimum sits ON the cliff edge, every trial past it
        reads 1e10 with zero gradient.  Contract: the loop terminates,
        the returned point is TRUSTED (never the 1e10 guard value), it
        sits inside the trusted region, and it lands near the
        constrained optimum — the guard ejects the optimizer from
        untrusted territory instead of trapping or absorbing it.
        Known semantics pinned here: rejection is all-or-nothing on the
        full step vector, so once the trust boundary is ACTIVE the
        off-boundary coordinates stop improving too (measured final
        value 0.31 vs the constrained optimum 0.25 from a start at
        7.25) — the plateau stop then exits cleanly."""
        import jax.numpy as jnp

        from g3py_tpu.bayesian.optimize_jax import lbfgs_minimize_guarded

        def obj(u):
            v = jnp.sum(u ** 2)
            resid = jnp.where(u[0] > 0.5, 0.0, 1.0)  # trust only u0>0.5
            return v, resid

        pts, vals, iters = lbfgs_minimize_guarded(
            obj, np.array([[2.5, 1.0]], np.float32), max_iters=60,
            chunk=5, linesearch_steps=3, dispatch_budget=None)
        assert vals[0] < 1e9, "returned the guard value"
        assert pts[0, 0] > 0.5, "landed in the untrusted region"
        # start value 7.25, constrained optimum 0.25: require a landing
        # in its neighborhood (measured 0.308 — the active boundary
        # freezes the final fraction, see docstring)
        assert vals[0] < 0.6, "stalled far from the constrained optimum"


class TestWidget:
    """Widget path (reference models.py:759-789): slider-range logic
    headless + full ipywidgets construction and a programmatic slider
    update driving the plot callback."""

    def _gp(self):
        x = np.linspace(0, 6, 16).astype(np.float32).reshape(-1, 1)
        y = np.sin(x[:, 0]).astype(np.float32)
        gp = g3.GP(space=x, location=g3.Bias(), kernel=g3.SE(x),
                   name="WGT")
        gp.observed(x, y)
        return gp

    def test_widget_intervals(self):
        gp = self._gp()
        iv = gp._widget_intervals(gp.params_default)
        assert set(iv) == set(gp.params_default)
        for k, (lo, hi, v, st) in iv.items():
            assert lo <= v <= hi and st > 0
            val = float(np.mean(gp.params_default[k]))
            if val > 0.1:
                assert (lo, hi) == (0.0, 2 * val)
            elif val < -0.1:
                assert (lo, hi) == (2 * val, 0.0)
            else:
                assert (lo, hi) == (-5.0, 5.0)

    def test_widget_constructs_and_updates(self):
        ipywidgets = pytest.importorskip("ipywidgets")
        import matplotlib

        matplotlib.use("Agg")
        gp = self._gp()
        w = gp.widget(auto=True)  # interact: callback fires on update
        # programmatic slider move re-enters _widget_plot -> plot()
        name = next(iter(gp.params_default))
        sliders = [c for c in w.widget.children
                   if isinstance(c, ipywidgets.FloatSlider)]
        assert sliders
        sliders[0].value = float(sliders[0].value) * 0.9 + 0.01
        assert name in gp.widget_params or gp.widget_params
