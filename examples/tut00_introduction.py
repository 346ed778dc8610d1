"""Tutorial 00 — Introduction (reference notebooks/00-Introduction.ipynb).

Build a GP in three lines, look at its prior, observe data, look at its
posterior.
"""

import numpy as np

import g3py_tpu as g3
from _common import sine_data, save_fig


def main(quick=True, plot=True):
    x, y = sine_data(n=24 if quick else 100)
    gp = g3.GP(space=x, location=g3.Bias(), kernel=g3.SE(x), name="GP00")

    prior = gp.predict(prior=True, quantiles=True, samples=3)
    gp.observed(x, y)
    post = gp.predict(quantiles=True, quantiles_noise=True, samples=3)

    if plot:
        gp.plot(prior=True, samples=2)
        save_fig("tut00_prior.png")
        gp.plot(samples=2)
        save_fig("tut00_posterior.png")

    assert np.all(np.isfinite(prior["mean"]))
    assert np.all(np.isfinite(post["mean"]))
    # the posterior must interpolate near the observations
    assert np.mean((post["mean"] - y) ** 2) < np.mean((prior["mean"] - y) ** 2)
    return {"prior": prior, "posterior": post, "logp": gp.logp()}


if __name__ == "__main__":
    out = main(quick=False)
    print("logp:", out["logp"])
