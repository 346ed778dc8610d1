"""Tutorial 10 — Streaming serving (beyond the reference).

The reference re-built and re-factorized the observed gram inside every
compiled statistic on every ``predict`` call (reference
stochastic.py:444-513) — fine for a notebook, wrong for a service.  The
serving fast path factors the posterior ONCE and answers every query batch
with MXU matmuls:

    pr  = gp.predictor(params)      # one O(n^3) factorization on device
    out = pr(x_query, quantiles=True)

* all statistics (mean/std/median/quantiles/noise bands) of a query batch
  are ONE fused compiled call — one dispatch, one host sync;
* per-class semantics are identical to ``gp.predict`` (WGP Gauss-Hermite
  moments, TP posterior-df quantiles): outputs match to float32;
* the predictor pins the observed data it was built from and raises if the
  process's data changes underneath it.

Measured (docs/performance.md): posterior mean at n=4096, 256-point query
batches: 7.1 ms/batch unfactored vs 2.0 ms through the predictor on the
hosted chip — with ~50 us of device time (the rest is dispatch), so the
gap widens on standard runtimes and with training-set size.
"""

import numpy as np

import g3py_tpu as g3


def main(quick=True, plot=False):
    rng = np.random.default_rng(3)
    n = 120 if quick else 2048
    x = np.sort(rng.uniform(0, 20, n)).astype(np.float32).reshape(-1, 1)
    y = (np.exp(0.3 * np.sin(0.7 * x[:, 0])) + 1.0
         + 0.05 * rng.standard_normal(n)).astype(np.float32)

    # a warped GP: the serving path must reproduce Gauss-Hermite moments
    gp = g3.WGP(space=x, location=g3.Bias(), kernel=g3.SE(x),
                mapping=g3.BoxCoxLinear(y), name="SRV10")
    gp.observed(x, y)
    params = gp.find_MAP(points=2 if quick else 6, display=False)

    # ---- build the predictor: one factorization --------------------------
    pr = gp.predictor(params)

    # ---- stream query batches -------------------------------------------
    batches = [np.sort(rng.uniform(-1, 21, 64)).astype(np.float32)
               .reshape(-1, 1) for _ in range(3)]
    for i, xq in enumerate(batches):
        out = pr(xq, quantiles=True, quantiles_noise=True)
        assert np.all(np.asarray(out.quantile_down)
                      <= np.asarray(out.quantile_up) + 1e-5)
        if i == 0:
            # the fused statistics match the unfactored path to f32
            ref = gp.predict(params=params, space=xq, quantiles=True,
                             quantiles_noise=True)
            for k in ref:
                np.testing.assert_allclose(
                    np.asarray(out[k]), np.asarray(ref[k]),
                    rtol=5e-4, atol=5e-4, err_msg=k)

    # single statistics and held-out scoring reuse the same factorization
    mu = pr.mean(space=batches[-1])
    assert np.all(np.isfinite(np.asarray(mu)))
    state_calls = gp.compiles["posterior_state"].executed
    assert state_calls == 1, "the gram must be factored exactly once"

    # ---- Bayesian model-average serving ---------------------------------
    # per-row factorizations computed once (vmapped), then averaged
    # statistics stream as batched matmuls
    dt = gp.sample_hypers(start=params, samples=30 if quick else 300,
                          chains=4, seed=0)
    ap = gp.averaged_predictor(dt.iloc[:: max(1, len(dt) // 12)])
    avg = ap(batches[0], quantiles=True)
    ref_avg = gp.average(dt.iloc[:: max(1, len(dt) // 12)], scores=False,
                         quantiles=True, space=batches[0])
    np.testing.assert_allclose(np.asarray(avg["mean"]),
                               np.asarray(ref_avg["mean"]),
                               rtol=5e-4, atol=5e-4)

    # streaming updates: absorb new observations WITHOUT refactorizing
    # (block-Cholesky state extension, O(n^2 m) — round 4)
    x_new = np.sort(rng.uniform(21, 24, 8)).astype(np.float32).reshape(-1, 1)
    y_new = (np.exp(0.3 * np.sin(0.7 * x_new[:, 0])) + 1.0
             + 0.05 * rng.standard_normal(8)).astype(np.float32)
    n_state = gp.compiles["posterior_state"].executed
    pr_up = pr.updated(x_new, y_new)
    assert gp.compiles["posterior_state"].executed == n_state
    assert np.all(np.isfinite(pr_up.mean(space=batches[0])))
    pr = pr_up

    if plot:
        import matplotlib.pyplot as plt
        from _common import save_fig

        xg = np.linspace(-1, 25, 200, dtype=np.float32).reshape(-1, 1)
        srv = pr(xg, quantiles=True, quantiles_noise=True)
        plt.figure(figsize=(8, 3.5))
        plt.plot(x[:, 0], y, "k.", ms=3, alpha=0.4, label="train")
        plt.plot(x_new[:, 0], y_new, "C3x", ms=6,
                 label="streamed update (no refactorization)")
        plt.plot(xg[:, 0], np.asarray(srv["mean"]), "C0",
                 label="served mean")
        plt.fill_between(xg[:, 0], np.asarray(srv["quantile_down"]),
                         np.asarray(srv["quantile_up"]), alpha=0.25,
                         color="C0", label="95% noise band")
        plt.legend(loc="upper left", fontsize=8)
        plt.title("Factor-once serving of a warped GP + streaming update")
        save_fig("tut10_serving.png")

    # ---- AOT export: ship the predictor WITHOUT the model ----------------
    # One shape-polymorphic StableHLO bundle + the factorized state; the
    # artifact reloads with jax alone (no model code, no refactorization)
    # and was lowered for BOTH cpu and tpu — export on a CPU dev box,
    # serve on the TPU fleet.
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        pr.export(d, quantiles=True)
        ep = g3.load_predictor(d)
        out_art = ep(batches[0])
        ref_art = pr.predict(space=batches[0], quantiles=True)
        for k in out_art:
            np.testing.assert_allclose(out_art[k], np.asarray(ref_art[k]),
                                       rtol=5e-2, atol=1e-3)
        # any batch size through the same artifact (symbolic query dim)
        assert ep(batches[0][:7])["mean"].shape == (7,)

    # data changes invalidate loudly
    gp.observed(x[: n // 2], y[: n // 2])
    try:
        pr(batches[0])
        raise AssertionError("stale predictor must raise")
    except ValueError:
        pass

    if plot:
        import matplotlib.pyplot as plt

        gp.observed(x, y)
        pr = gp.predictor(params)
        xq = np.linspace(-1, 21, 300, dtype=np.float32).reshape(-1, 1)
        out = pr(xq, quantiles=True)
        plt.plot(xq[:, 0], out.mean, label="mean")
        plt.fill_between(xq[:, 0], out.quantile_down, out.quantile_up,
                         alpha=0.3, label="95%")
        plt.scatter(x[:, 0], y, s=6, c="k", label="obs")
        plt.legend()
        g3.plot_save("/tmp/tut10_serving.png")
    print("tut10 OK: fused serving path matches predict; state factored once")
    return pr


if __name__ == "__main__":
    main(quick=False, plot=True)
