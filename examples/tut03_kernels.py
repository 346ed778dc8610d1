"""Tutorial 03 — Kernels (reference 03-Kernels.ipynb).

The kernel zoo and its algebra: stationary, periodic, dot-product and
composite kernels compared on one dataset — then letting
``g3.search_kernel`` DISCOVER the composite structure automatically
(greedy compositional kernel search, Duvenaud et al. 2013)."""

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
    # -- automatic structure discovery -----------------------------------
    # 2-D additive task: sin(3 x1) + x2^2/2.  A joint ARD-SE must model
    # the full product space; the search discovers the dims-restricted
    # additive decomposition (~25 nats better marginal likelihood).
    # NOTE a 1-D SE is nearly universal in-sample — 1-D tasks don't
    # discriminate structure; additivity in 2-D+ does.
    rng = np.random.default_rng(5)
    n = 100 if quick else 140
    xs = rng.uniform(-2, 2, (n, 2)).astype(np.float32)
    ys = (np.sin(3 * xs[:, 0]) + 0.5 * xs[:, 1] ** 2
          + 0.1 * rng.standard_normal(n)).astype(np.float32)
    zoo = {"SE": g3.SE,
           "SE0": (lambda x_, name=None: g3.SE([0], name=name)),
           "SE1": (lambda x_, name=None: g3.SE([1], name=name))}
    # expand='all' runs the FULL CKS grammar (every subexpression gets
    # +B/*B, leaves get swapped) — more fits per round, but it can fix a
    # wrong base deep inside the incumbent, which root extension cannot
    res = g3.search_kernel(xs, ys, bases=("SE", "SE0", "SE1"),
                           depth=1 if quick else 2, points=1, zoo=zoo,
                           expand="root" if quick else "all")
    print(f"search_kernel winner: {res.best_name} "
          f"({len(res.table)} structures evaluated)")
    return {"logps": logps, "search": res.best_name}


if __name__ == "__main__":
    out = main(quick=False)
    for k, v in sorted(out["logps"].items(), key=lambda kv: -kv[1]):
        print(f"{k:>8}: {v:.2f}")
