"""Tutorial 07 — Multi Output (reference 07-Multi-Output.ipynb).

Multi-output regression through index-kernel coregionalization: the input
gets an output-index column, ``KernelEquals`` metrics gate per-output
kernels, and cross-output correlation comes from a shared kernel on the
remaining dims (the reference's DeltaEq/KernelEquals machinery,
metrics.py:39-52, kernels.py:262-290).
"""

import numpy as np

import g3py_tpu as g3
from _common import save_fig


def make_data(n=30, seed=4):
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 8, n).astype(np.float32)
    y0 = np.sin(t) + 0.1 * rng.standard_normal(n)
    y1 = 0.7 * np.sin(t + 0.4) + 0.1 * rng.standard_normal(n)
    # stacked input: [index, t]
    x = np.concatenate([
        np.stack([np.zeros(n, np.float32), t], axis=1),
        np.stack([np.ones(n, np.float32), t], axis=1),
    ])
    y = np.concatenate([y0, y1]).astype(np.float32)
    return x, y, t


def main(quick=True, plot=True):
    x, y, t = make_data(n=15 if quick else 40)

    # shared latent kernel on the time dim + per-output gated kernels on the
    # index column: K = K_shared(t) + K_eq0 * K0(t) + K_eq1 * K1(t)
    shared = g3.SE([1], name="Shared")
    gate0 = g3.KernelEquals([0], eq=0, name="Eq0")
    gate1 = g3.KernelEquals([0], eq=1, name="Eq1")
    own0 = g3.SE([1], name="Own0")
    own1 = g3.SE([1], name="Own1")
    kernel = shared + gate0 * own0 + gate1 * own1

    gp = g3.GP(space=x, location=g3.Bias(), kernel=kernel, name="GP07")
    gp.observed(x, y)
    lp0 = gp.logp()
    assert np.isfinite(lp0)

    params = gp.find_MAP(points=1, powell=False, display=False)
    assert gp.logp(params) >= lp0 - 1e-6

    # predict each output over its own slice of the stacked space
    n = len(t)
    pred0 = gp.predict(params=params, space=x[:n], quantiles=True)
    pred1 = gp.predict(params=params, space=x[n:], quantiles=True)
    assert np.all(np.isfinite(pred0["mean"]))
    assert np.all(np.isfinite(pred1["mean"]))

    if plot:
        import matplotlib.pyplot as plt

        plt.plot(t, pred0["mean"], label="output 0")
        plt.plot(t, pred1["mean"], label="output 1")
        plt.plot(t, y[:n], ".k")
        plt.plot(t, y[n:], "xk")
        plt.legend()
        save_fig("tut07_multioutput.png")

    # ---- scalable alternative: the LMC sparse variational family --------
    # The index-kernel construction above pays one dense O((nP)^3)
    # Cholesky over the stacked rows; LMCSVP (models/lmc.py) mixes Q
    # latent sparse GPs through a learned (P, Q) matrix at O(m^2) per
    # row, with per-output noise, and exposes the learned cross-output
    # correlation directly.
    xs, ys = g3.stack_outputs([t.reshape(-1, 1), t.reshape(-1, 1)],
                              [y[:n], y[n:]])
    lmc = g3.LMCSVP(space=xs, kernel=g3.SE(t.reshape(-1, 1)),
                    outputs_dim=2, latents=1,
                    inducing=min(12, n), name="LMC07")
    lmc.observed(xs, ys)
    pl, losses = lmc.fit_svgp(batch_size=len(ys),
                              steps=150 if quick else 1500,
                              display=False)
    corr = lmc.task_correlations(pl)
    print(f"LMC loss {float(losses[0]):.1f} -> {float(losses[-1]):.1f}; "
          f"learned task correlation {corr[0, 1]:+.2f}")
    m1 = np.asarray(lmc.mean(pl, g3.with_output(t.reshape(-1, 1), 1)))
    assert np.all(np.isfinite(m1))

    return {"params": params, "pred0": pred0, "pred1": pred1,
            "task_corr": corr}


if __name__ == "__main__":
    out = main(quick=False)
    print("output-0 mean[:5]:", out["pred0"]["mean"][:5])
