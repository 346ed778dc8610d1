"""Tutorial 02 — Hyperparameters (reference 02-Hyperparameters.ipynb).

Data-driven defaults, random perturbations, the natural/transformed views,
manual priors, and regularization potentials.
"""

import numpy as np

import g3py_tpu as g3
from _common import sine_data


def main(quick=True, plot=False):
    x, y = sine_data(n=30)
    kernel = g3.SE(x)
    kernel.set_potential("var", reg="L2", c=0.1)  # shrink the amplitude
    gp = g3.GP(space=x, location=g3.Bias(), kernel=kernel, name="GP02")
    gp.observed(x, y)

    defaults = gp.params_default
    testvals = gp.params_test
    randomized = gp.params_random(sigma=0.2)
    transformed = gp.transform_params(defaults, to_transformed=True)

    # explicit prior: replace the default FlatExp amplitude by an
    # Exponential prior via a user-created Param
    amp = g3.Param("GP02b_SE_var", prior=g3.Exponential(lam=2.0))
    gp2 = g3.GP(space=x, location=g3.Zero(), kernel=g3.SE(x, var=amp),
                name="GP02b")
    gp2.observed(x, y)
    lp = gp2.logp()

    # setting params pins them for every later call
    gp.set_params(randomized)
    assert np.allclose(
        np.asarray(gp.params["GP02_SE_var"]),
        np.asarray(randomized["GP02_SE_var"]))
    gp.set_params(None)

    assert set(defaults) == set(testvals)
    assert any("_log_" in k for k in transformed)
    assert np.isfinite(lp)
    return {"defaults": defaults, "transformed": transformed, "logp2": lp}


if __name__ == "__main__":
    out = main(quick=False)
    print("defaults:", dict(out["defaults"]))
