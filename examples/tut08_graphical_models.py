"""Tutorial 08 — Graphical Models (reference 08-Graphical-Models.ipynb).

Several processes joined in ONE GraphicalModel: shared hyperparameters
(the same Param object used by two kernels), a joint logp summing every
observed factor, and joint MAP training over the union parameter space
(the reference's ``GraphicalModel.active`` machinery, models.py:56-303).
"""

import numpy as np

import g3py_tpu as g3
from _common import sine_data, save_fig


def main(quick=True, plot=True):
    n = 16 if quick else 50
    x, y1 = sine_data(n=n, seed=5)
    _, y2 = sine_data(n=n, seed=6)
    y2 = (0.8 * y2 + 0.1).astype(np.float32)

    g3.GraphicalModel.active = None
    gm = g3.GraphicalModel("GM08")

    # one shared lengthscale governs both processes
    shared_rate = g3.Param("GM08_shared_rate", shape=(1,), prior=g3.FlatExp())
    p1 = g3.GP(space=x, location=g3.Bias(),
               kernel=g3.SE(x, metric=g3.ARD_L2(x, rate=shared_rate)),
               name="F1", active=gm)
    p2 = g3.GP(space=x, location=g3.Bias(),
               kernel=g3.SE(x, metric=g3.ARD_L2(x, rate=shared_rate)),
               name="F2", active=gm)
    p1.observed(x, y1)
    p2.observed(x, y2)

    names = gm.param_names()
    assert names.count("GM08_shared_rate") == 1

    # joint logp includes both likelihoods
    lp_joint = p1.logp()
    assert np.isfinite(lp_joint)
    np.testing.assert_allclose(p1.logp(), p2.logp(), rtol=1e-5)

    # joint MAP over the union parameter space
    params = p1.find_MAP(points=1, powell=False, display=False)
    assert p1.logp(params) >= lp_joint - 1e-6

    pred1 = p1.predict(params=params, quantiles=True)
    pred2 = p2.predict(params=params, quantiles=True)

    if plot:
        import matplotlib.pyplot as plt

        plt.plot(x[:, 0], pred1["mean"], label="F1")
        plt.plot(x[:, 0], pred2["mean"], label="F2")
        plt.plot(x[:, 0], y1, ".k")
        plt.plot(x[:, 0], y2, "xk")
        plt.legend()
        save_fig("tut08_graphical.png")
    g3.GraphicalModel.active = None
    return {"params": params, "pred1": pred1, "pred2": pred2}


if __name__ == "__main__":
    out = main(quick=False)
    print("shared rate:", out["params"]["GM08_shared_rate"])
