"""Tutorial 13 — Time series at scale with the state-space GP.

The reference's tutorial datasets are all 1-D time series (sunspots, CO2,
EURUSD — reference data.py:11-118), yet its exact path is the O(n^3)
dense Cholesky and its only scaling strategy is subsampling
(data.py:129-190).  :class:`~g3py_tpu.models.statespace.StateSpaceGP`
computes the SAME exact marginal likelihood and posterior in O(n) work /
O(log n) depth (parallel-in-time Kalman, ops/ssm.py), so the full series
— or a million rows — costs milliseconds on one chip.

This tutorial fits the bundled sunspots series with a quasi-periodic
kernel (the ~11-year solar cycle: SIN periodic pattern whose shape
drifts on a Matern-3/2 timescale) plus an OU remainder, entirely through
the standard model API.
"""

import numpy as np

import g3py_tpu as g3
from _common import save_fig


def main(quick=True, plot=True):
    x, y = g3.data_sunspots()
    t = np.asarray(x, np.float32).reshape(-1, 1)
    y = np.asarray(y, np.float32)
    if quick:
        t, y = t[:150], y[:150]

    # ~11-year solar cycle: periodic x Matern drift + OU remainder.
    # freq is trainable; start it at the known cycle via a fixed value
    # would also work (hypers accept numbers to pin them).
    kernel = (g3.SIN(t, name="Cycle") * g3.MAT32(t, name="Drift")
              + g3.OU(t, name="Rest"))
    ssgp = g3.StateSpaceGP(space=t, kernel=kernel, harmonics=4,
                           name="Sun")
    ssgp.observed(t, y)

    start = dict(ssgp.params_default)
    start[ssgp.name + "_Cycle_freq"] = np.float32(1.0 / 11.0)
    params = ssgp.find_MAP(start=start, points=1, display=False,
                           powell=False, max_iters=30 if quick else 200)

    ll0, ll1 = float(ssgp.logp(start)), float(ssgp.logp(params))
    assert ll1 >= ll0 - 1e-3
    freq = float(np.asarray(
        params[ssgp.name + "_Cycle_freq"]).reshape(-1)[0])
    print(f"logp {ll0:.1f} -> {ll1:.1f}; learned cycle "
          f"{1.0 / max(freq, 1e-6):.1f} years")

    # smoothed in-sample fit + 30-year extrapolation with bands
    tq = np.arange(0, len(t) + (0 if quick else 30),
                   dtype=np.float32).reshape(-1, 1)
    mean = np.asarray(ssgp.mean(params, space=tq))
    q975 = ssgp.quantiler(params, space=tq, q=0.975, noise=True)
    q025 = ssgp.quantiler(params, space=tq, q=0.025, noise=True)
    inside = np.mean((y >= q025[: len(y)]) & (y <= q975[: len(y)]))
    print(f"95% band covers {inside:.2%} of the observations")
    assert inside > 0.85

    if plot:
        import matplotlib.pyplot as plt

        plt.figure(figsize=(10, 4))
        plt.plot(t[:, 0], y, "k.", ms=3, label="sunspots")
        plt.plot(tq[:, 0], mean, lw=1.2, label="smoothed mean")
        plt.fill_between(tq[:, 0], q025, q975, alpha=0.25,
                         label="95% band")
        plt.legend()
        plt.title("Sunspots: quasi-periodic state-space GP (exact O(n))")
        save_fig("tut13_sunspots.png")

    # ---- count data: Poisson observations on the exact O(n) prior ------
    # (NonGaussianSSGP: Laplace by iterated parallel Kalman smoothing)
    rng = np.random.default_rng(0)
    nc = 150 if quick else 600
    tc = np.sort(rng.uniform(0, 20, nc)).reshape(-1, 1).astype(np.float32)
    log_rate = 1.0 + np.sin(2 * np.pi * tc[:, 0] / 7.0)
    counts = rng.poisson(np.exp(log_rate)).astype(np.float32)
    ng = g3.NonGaussianSSGP(space=tc, kernel=g3.MAT32(tc),
                            likelihood=g3.PoissonLik(), name="Counts")
    ng.observed(tc, counts)
    p_ng = ng.find_MAP(points=1, display=False)
    rate = np.asarray(ng.mean(p_ng, space=tc))
    rmse_rate = float(np.sqrt(np.mean((rate - np.exp(log_rate)) ** 2)))
    print(f"Poisson series: posterior rate rmse {rmse_rate:.2f} "
          f"(rate scale ~{np.exp(log_rate).mean():.1f})")
    assert rmse_rate < 1.5

    if plot:
        import matplotlib.pyplot as plt

        q_hi = ng.quantiler(p_ng, space=tc, q=0.975)
        q_lo = ng.quantiler(p_ng, space=tc, q=0.025)
        plt.figure(figsize=(10, 3.5))
        plt.plot(tc[:, 0], counts, "k.", ms=3, label="counts")
        plt.plot(tc[:, 0], rate, "C1", lw=1.2, label="posterior rate")
        plt.fill_between(tc[:, 0], q_lo, q_hi, color="C1", alpha=0.2,
                         label="rate 95%")
        plt.legend()
        plt.title("Poisson counts: Laplace on the state-space GP")
        save_fig("tut13_poisson.png")

    return params


if __name__ == "__main__":
    main(quick=False)
