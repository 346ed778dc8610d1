"""Tutorial 14 — Sensor networks: exact multi-output and spatio-temporal
GPs, linear in time.

Two data shapes the reference could only handle with dense index/product
kernels at O(n^3) (reference kernels.py:51-75, 262-290):

1. MULTI-OUTPUT time series — P channels sampled at different irregular
   times, coupled through shared latent processes.
   :class:`~g3py_tpu.models.statespace.MultiStateSpaceGP` makes this an
   LMC over Markovian latents: exact NLL/posterior in O(n) total events.

2. SPATIO-TEMPORAL fields — a sensor network measuring one field f(t, x)
   at m sites.  For separable k_t * k_s,
   :class:`~g3py_tpu.models.spatiotemporal.SpatioTemporalSSGP` derives
   the mixing from the spatial kernel (W = chol(K_s)) and stays exact —
   including posterior marginals at spatial points with NO sensor
   (``field``).

3. SCATTERED space-time observations — every row at its own (t, x), no
   repeated sites at all (drifting sensors, satellite tracks).
   :class:`~g3py_tpu.models.spatiotemporal.SparseSpatioTemporalSSGP`
   carries the field on m INDUCING sites and projects each row onto
   them by kernel interpolation (FITC residual in the row's noise):
   sparse in space, exact in time.

4. SPATIO-TEMPORAL COUNTS — a log-Gaussian Cox process: Poisson event
   counts per site with intensity exp(f(t, x) + b).
   :class:`~g3py_tpu.models.ngssm.NonGaussianSTSSGP` runs Laplace
   inference by iterated Kalman smoothing on the same exact separable
   prior; ``field_rate(t, x)`` serves the posterior intensity surface.
"""

import numpy as np

import g3py_tpu as g3
from _common import save_fig


def main(quick=True, plot=True):
    rng = np.random.default_rng(42)

    # ---- 1. two coupled channels at different irregular times ----------
    n0, n1 = (70, 50) if quick else (400, 300)
    t0 = np.sort(rng.uniform(0, 20, n0)).astype(np.float32)
    t1 = np.sort(rng.uniform(0, 20, n1)).astype(np.float32)
    f = lambda t: np.sin(t) + 0.4 * np.sin(3.1 * t)
    y0 = (f(t0) + 0.15 * rng.standard_normal(n0)).astype(np.float32)
    y1 = (-0.8 * f(t1) + 0.5
          + 0.2 * rng.standard_normal(n1)).astype(np.float32)
    x, y = g3.stack_outputs([t0[:, None], t1[:, None]], [y0, y1])

    mss = g3.MultiStateSpaceGP(space=x, kernel=g3.MAT32(t0[:, None]),
                               outputs_dim=2, name="Pair")
    mss.observed(x, y)
    params = mss.find_MAP(points=1, display=False)
    corr = mss.task_correlations(params)
    print(f"learned cross-channel correlation: {corr[0, 1]:+.3f} "
          "(truth: strongly negative)")
    assert corr[0, 1] < -0.3

    # channel 1 reconstructed where only channel 0 was observed
    tq = np.linspace(0.5, 19.5, 120).astype(np.float32)[:, None]
    xq1 = g3.with_output(tq, 1)
    m1 = np.asarray(mss.mean(params, space=xq1))
    rmse = float(np.sqrt(np.mean(
        (m1 - (-0.8 * f(tq[:, 0]) + 0.5)) ** 2)))
    print(f"channel-1 posterior rmse vs truth: {rmse:.3f}")

    if plot:
        import matplotlib.pyplot as plt

        q975 = mss.quantiler(params, space=xq1, q=0.975, noise=True)
        q025 = mss.quantiler(params, space=xq1, q=0.025, noise=True)
        plt.figure(figsize=(10, 4))
        plt.plot(t0, y0, "k.", ms=3, label="channel 0")
        plt.plot(t1, y1, "C3.", ms=4, label="channel 1")
        plt.plot(tq[:, 0], m1, "C3", lw=1.2, label="channel-1 mean")
        plt.fill_between(tq[:, 0], q025, q975, color="C3", alpha=0.2)
        plt.legend()
        plt.title("Multi-output state-space GP (exact, O(n) events)")
        save_fig("tut14_multioutput.png")

    # ---- 2. a 5-sensor network over a 1-D space ------------------------
    sites = np.array([[0.0], [1.0], [2.2], [3.5], [5.0]], np.float32)
    n_p = 40 if quick else 150
    field = lambda t, s: np.sin(t) * np.cos(0.6 * s)
    ts, ys = [], []
    for p in range(len(sites)):
        tp = np.sort(rng.uniform(0, 12, n_p)).astype(np.float32)
        ys.append((field(tp, sites[p, 0])
                   + 0.12 * rng.standard_normal(n_p)).astype(np.float32))
        ts.append(tp[:, None])
    xs, yv = g3.stack_outputs(ts, ys)

    st = g3.SpatioTemporalSSGP(space=xs, kernel=g3.MAT32(ts[0]),
                               space_kernel=g3.SE(sites), sites=sites,
                               name="Net")
    st.observed(xs, yv)
    params = st.find_MAP(points=1, display=False)

    # exact posterior marginals at spatial points with NO sensor
    tg = np.linspace(0.5, 11.5, 40 if quick else 120).astype(np.float32)
    xg = np.linspace(0.0, 5.0, 11 if quick else 41).astype(np.float32)
    TT, XX = np.meshgrid(tg, xg)
    mq, vq = st.field(TT.ravel(), XX.ravel()[:, None], params=params)
    truth = field(TT.ravel(), XX.ravel())
    rmse = float(np.sqrt(np.mean((mq - truth) ** 2)))
    cover = float(np.mean(np.abs(mq - truth) <= 1.96 * np.sqrt(vq)))
    print(f"field rmse over the (t, x) grid: {rmse:.3f}; "
          f"95% interval truth coverage: {cover:.2%}")
    assert rmse < 0.25 and cover > 0.8

    if plot:
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 2, figsize=(11, 4), sharey=True)
        im0 = axes[0].pcolormesh(TT, XX, truth.reshape(TT.shape),
                                 shading="auto")
        axes[0].plot([], [])
        axes[0].set_title("true field f(t, x)")
        axes[0].set_xlabel("t"); axes[0].set_ylabel("x")
        im1 = axes[1].pcolormesh(TT, XX, mq.reshape(TT.shape),
                                 shading="auto")
        for s in sites[:, 0]:
            axes[1].axhline(s, color="w", lw=0.5, alpha=0.6)
        axes[1].set_title("posterior mean (sensors = white lines)")
        axes[1].set_xlabel("t")
        fig.colorbar(im1, ax=axes, shrink=0.8)
        save_fig("tut14_spatiotemporal.png")

    # ---- 3. scattered observations: a drifting sensor ------------------
    n_s = 150 if quick else 900
    ts3 = np.sort(rng.uniform(0, 12, n_s)).astype(np.float32)
    xs3 = (2.5 + 2.0 * np.sin(0.4 * ts3)
           + 0.3 * rng.standard_normal(n_s)).astype(np.float32)
    y3 = (field(ts3, xs3)
          + 0.12 * rng.standard_normal(n_s)).astype(np.float32)
    xr = np.column_stack([ts3, xs3]).astype(np.float32)

    sst = g3.SparseSpatioTemporalSSGP(
        space=xr, kernel=g3.MAT32(xr[:, :1]),
        space_kernel=g3.SE(xr[:, 1:]), inducing=8, name="Drift")
    sst.observed(xr, y3)
    params = sst.find_MAP(points=1, display=False)
    m3, v3 = sst.field(TT.ravel(), XX.ravel()[:, None], params=params)
    rmse3 = float(np.sqrt(np.mean((m3 - truth) ** 2)))
    print(f"scattered-rows field rmse over the grid: {rmse3:.3f} "
          f"(one drifting sensor, {n_s} rows, 8 inducing sites)")
    assert np.all(np.isfinite(m3)) and np.all(v3 >= 0)

    # ---- 4. spatio-temporal counts: a log-Gaussian Cox process ---------
    # Event COUNTS at each site, intensity lambda(t, x) = exp(f(t, x) + b):
    # the same exact separable space-time prior, Laplace inference by
    # iterated Kalman smoothing — still O(n) in total events.
    n_c = 35 if quick else 120
    tsc, ysc = [], []
    for p in range(len(sites)):
        tp = np.sort(rng.uniform(0, 12, n_c)).astype(np.float32)
        lam = np.exp(0.9 * field(tp, sites[p, 0]) + 1.2)
        ysc.append(rng.poisson(lam).astype(np.float32))
        tsc.append(tp[:, None])
    xc, yc = g3.stack_outputs(tsc, ysc)

    cox = g3.NonGaussianSTSSGP(space=xc, kernel=g3.MAT32(tsc[0]),
                               space_kernel=g3.SE(sites), sites=sites,
                               likelihood=g3.PoissonLik(), name="Cox")
    cox.observed(xc, yc)
    params = cox.find_MAP(points=1, display=False)

    # posterior intensity surface at arbitrary (t, x) — paired queries.
    # field_rate excludes the per-site biases (sensor-calibration
    # semantics: off-site the global level is only identified up to the
    # b_site = 0 convention, since loc(t) + b_site enter every on-site
    # row together), so the off-site check is the intensity SHAPE —
    # centered log-intensity — and the level is checked on-site, where
    # the predictive mean through the likelihood is fully identified.
    lam_hat, _lam_var = cox.field_rate(TT.ravel(), XX.ravel(),
                                       params=params)
    lam_true = np.exp(0.9 * truth + 1.2)
    lh, lt = np.log(lam_hat), np.log(lam_true)
    shape_rmse = float(np.sqrt(np.mean(
        ((lh - lh.mean()) - (lt - lt.mean())) ** 2)))
    print(f"Cox-process log-intensity SHAPE rmse over the grid: "
          f"{shape_rmse:.3f}")
    assert np.all(lam_hat > 0) and shape_rmse < 0.45

    # on-site intensity (bias included): E[y | row] vs the truth
    lam_on = np.asarray(cox.mean(params, xc))
    lam_on_true = np.exp(0.9 * field(xc[:, 0],
                                     sites[np.rint(xc[:, 1]).astype(int),
                                           0]) + 1.2)
    on_rmse = float(np.sqrt(np.mean(
        (np.log(lam_on) - np.log(lam_on_true)) ** 2)))
    print(f"on-site log-intensity rmse (level identified): {on_rmse:.3f}")
    assert on_rmse < 0.6

    return params


if __name__ == "__main__":
    main(quick=False)
