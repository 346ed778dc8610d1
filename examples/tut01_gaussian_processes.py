"""Tutorial 01 — Gaussian Processes (reference 01-Gaussian-Processes.ipynb).

Exact GP regression end-to-end on the CO2 series: observe, train by MAP,
predict with credible bands.
"""

import numpy as np

import g3py_tpu as g3
from _common import save_fig


def main(quick=True, plot=True):
    x_all, y_all = g3.data_co2()
    n = 80 if quick else 400
    x = np.asarray(x_all[:n], np.float32).reshape(-1, 1)
    y = np.asarray(y_all[:n], np.float32)
    y = (y - y.mean()) / y.std()

    obs, test = g3.random_obs(x, p=0.5, rng=np.random.default_rng(1))
    gp = g3.GP(space=x, location=g3.Bias(), kernel=g3.SE(x) + g3.WN(x),
               name="GP01")
    gp.observed(x[obs], y[obs])
    gp.hidden = y

    lp0 = gp.logp()
    params = gp.find_MAP(points=2, display=False)
    lp1 = gp.logp(params)
    assert lp1 >= lp0 - 1e-6

    pred = gp.predict(params=params, quantiles=True, quantiles_noise=True)
    scores = gp.scores(params, logp=True, variance=True)
    if plot:
        gp.plot(params=params)
        save_fig("tut01_fit.png")
    return {"params": params, "pred": pred, "scores": scores}


if __name__ == "__main__":
    out = main(quick=False)
    print("scores:", dict(out["scores"]))
