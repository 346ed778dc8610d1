"""Tutorial 03 — Kernels (reference 03-Kernels.ipynb).

The kernel zoo and its algebra: stationary, periodic, dot-product and
composite kernels compared on one dataset.
"""

import numpy as np

import g3py_tpu as g3
from _common import sine_data, save_fig


def main(quick=True, plot=True):
    x, y = sine_data(n=30 if quick else 80)
    zoo = {
        "SE": g3.SE(x),
        "OU": g3.OU(x),
        "MAT32": g3.MAT32(x),
        "MAT52": g3.MAT52(x),
        "RQ": g3.RQ(x),
        "SIN": g3.SIN(x),
        "SE+LIN": g3.SE(x) + g3.LIN(x),
        "SE*SIN": g3.SE(x) * g3.SIN(x),
        "2*SE+1": 2.0 * g3.SE(x) + 0.1,
    }
    logps = {}
    for name, kernel in zoo.items():
        gp = g3.GP(space=x, location=g3.Zero(), kernel=kernel,
                   name="K" + name.replace("+", "p").replace("*", "t").replace(".", "_"))
        gp.observed(x, y)
        logps[name] = float(gp.logp())
        assert np.isfinite(logps[name]), name
        if plot and name == "SE":
            gp.plot_kernel()
            save_fig("tut03_kernel_se.png")
    # the periodic-on-sine data should like periodic structure
    return {"logps": logps}


if __name__ == "__main__":
    out = main(quick=False)
    for k, v in sorted(out["logps"].items(), key=lambda kv: -kv[1]):
        print(f"{k:>8}: {v:.2f}")
