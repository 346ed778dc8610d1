"""Tutorial 06 — Copulas (reference 06-Copulas.ipynb / 06-Marginal-Process).

Marginal processes (independent marginal densities with Mean-valued
parameters) and proper copula processes: a latent-correlation GP coupled
with arbitrary marginals (the reference declared this family but left it as
stubs, copula.py:5-20).
"""

import numpy as np

import g3py_tpu as g3
from _common import sine_data, save_fig


def main(quick=True, plot=True):
    x, y = sine_data(n=20 if quick else 60, seed=3)
    y_shift = (y + 3.0).astype(np.float32)

    # marginal process: StudentT marginals with x-dependent location
    mp = g3.MP(space=x, density=g3.StudentT(
        mu=g3.Linear(x), sigma=g3.Bias(x, name="Sg"),
        nu=g3.Bias(x, name="Nu")), name="GP06m")
    mp.observed(x, y_shift)
    lp_mp = mp.logp()
    assert np.isfinite(lp_mp)
    pred_mp = mp.predict(quantiles=True)

    # gaussian copula with Normal marginals over a latent SE correlation
    cgp = g3.CGP(space=x, kernel=g3.SE(x),
                 marginal=g3.Normal(mu=g3.Bias(x, name="Mu"),
                                    sigma=g3.Bias(x, name="Si")), name="GP06c")
    cgp.observed(x, y_shift)
    lp0 = cgp.logp()
    params = cgp.find_MAP(points=1, powell=False, display=False)
    assert cgp.logp(params) >= lp0 - 1e-6
    pred = cgp.predict(params=params, quantiles=True)
    assert np.all(pred["quantile_up"] >= pred["quantile_down"] - 1e-5)

    # student-t copula variant
    cstp = g3.CSTP(space=x, kernel=g3.SE(x),
                   marginal=g3.Normal(mu=g3.Bias(x, name="Mu"),
                                      sigma=g3.Bias(x, name="Si")),
                   name="GP06t")
    cstp.observed(x, y_shift)
    assert np.isfinite(cstp.logp())

    if plot:
        import matplotlib.pyplot as plt

        plt.plot(x[:, 0], pred["mean"], label="copula mean")
        plt.fill_between(x[:, 0], pred["quantile_down"], pred["quantile_up"],
                         alpha=0.3)
        plt.plot(x[:, 0], y_shift, "xk")
        plt.legend()
        save_fig("tut06_copula.png")
    return {"lp_mp": lp_mp, "pred_mp": pred_mp, "pred": pred}


if __name__ == "__main__":
    out = main(quick=False)
    print("marginal logp:", out["lp_mp"])
