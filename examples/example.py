"""End-to-end smoke script (reference notebooks/example.py:1-31): build a
GP with a white-noise kernel on the CO2 data, check predict/plot in prior
and posterior modes, print the compile cache counters."""

import numpy as np

import g3py_tpu as g3
from _common import save_fig


def main(quick=True, plot=True):
    x_all, y_all = g3.data_co2()
    n = 60 if quick else 200
    x = np.asarray(x_all[:n], np.float32).reshape(-1, 1)
    y = np.asarray(y_all[:n], np.float32)
    y = (y - y.mean()) / y.std()

    gp = g3.GP(space=x, location=g3.Bias(), kernel=g3.WN(x), name="GPX")
    prior = gp.predict(prior=True)
    gp.observed(x, y)
    post = gp.predict()
    if plot:
        gp.plot(prior=True)
        save_fig("example_prior.png")
        gp.plot()
        save_fig("example_posterior.png")
    print("executed:", gp.executed)
    assert np.all(np.isfinite(prior["mean"]))
    assert np.all(np.isfinite(post["mean"]))
    return gp


if __name__ == "__main__":
    main(quick=False)
