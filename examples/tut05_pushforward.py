"""Tutorial 05 — Pushforward (reference 05-Pushforward.ipynb).

Transport processes: define a process as a push-forward of white noise
through composed triangular maps (location + kernel-Cholesky + warping),
train it, predict by Monte Carlo.
"""

import numpy as np

import g3py_tpu as g3
from _common import sine_data, save_fig


def main(quick=True, plot=True):
    x, y = sine_data(n=20 if quick else 60, seed=2)
    y_pos = (np.exp(0.4 * y) + 0.5).astype(np.float32)

    transport = (g3.TMapping(g3.LogShifted(y_pos))
                 @ g3.TLocation(g3.Bias(x))
                 @ g3.TKernel(g3.SE(x), noisy=True))
    tgp = g3.TGP(space=x, transport=transport, name="GP05")
    tgp.observed(x, y_pos)

    lp0 = tgp.logp()
    assert np.isfinite(lp0)
    params = tgp.find_MAP(points=1, powell=False, display=False)
    assert tgp.logp(params) >= lp0 - 1e-6

    pred = tgp.predict(params=params, quantiles=True,
                       simulations=8 if quick else 50)
    assert np.all(np.isfinite(pred["mean"]))
    samples = tgp.sampler(params, samples=3)
    assert samples.shape == (len(x), 3)

    if plot:
        import matplotlib.pyplot as plt

        plt.plot(x[:, 0], pred["mean"], label="mean")
        plt.fill_between(x[:, 0], pred["quantile_down"], pred["quantile_up"],
                         alpha=0.3)
        plt.plot(x[:, 0], y_pos, "xk", label="obs")
        plt.legend()
        save_fig("tut05_pushforward.png")
    return {"params": params, "pred": pred}


if __name__ == "__main__":
    out = main(quick=False)
    print("mean[:5]:", out["pred"]["mean"][:5])
