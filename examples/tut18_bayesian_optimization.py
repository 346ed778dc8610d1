"""Tutorial 18 — Bayesian optimization: spending evaluations wisely.

The framework's surrogates + acquisition search turn any process into a
black-box optimizer (:class:`~g3py_tpu.bayesian.bo.BayesOpt` — beyond
the reference, which has no optimization-under-uncertainty story).  The
acquisition is built from the model's own pure mean/std statistic
functions, so a whole candidate batch is one jitted program and the
multi-start ascent runs ``jax.grad`` THROUGH the posterior algebra.

The walkthrough:

1. optimize a multimodal 1-D function with log-EI and UCB,
2. batch proposals by Thompson sampling (consistent pathwise draws),
3. a 2-D problem with a warped-GP surrogate (the objective's scale is
   skewed; the surrogate warps it instead of you hand-transforming),
4. comparing against random search at equal evaluation budget.
"""

import numpy as np

import g3py_tpu as g3
from _common import save_fig


def f_multi(x):
    """sin + cos + slow parabola: global max 1.4295 at x = 2.536."""
    x = np.atleast_2d(x)
    return (np.sin(3 * x[..., 0]) + 0.7 * np.cos(5 * x[..., 0])
            - 0.1 * (x[..., 0] - 1) ** 2)


def f_2d(x):
    """Skewed 2-D bowl with a ridge; minimum 0 at (1, 1.5)."""
    x = np.atleast_2d(x)
    return ((x[..., 0] - 1.0) ** 2
            + 2.0 * (x[..., 1] - 1.5) ** 2
            + 0.3 * np.sin(4 * x[..., 0]) ** 2)


def main(quick=True, plot=True):
    iters = 6 if quick else 30

    # ---- 1. 1-D multimodal, two acquisitions ------------------------------
    results = {}
    for kind in ("UCB", "logEI"):
        gp = g3.GP(space=np.zeros((4, 1), np.float32), location=g3.Bias(),
                   kernel=g3.SE(1), noisy=True, name=f"BO{kind}")
        bo = g3.BayesOpt(gp, bounds=[[0.0, 4.0]], maximize=True, seed=1,
                         xi=0.05)
        pm, hist = bo.run(f_multi, iters=iters, init=6, kind=kind,
                          candidates=512, steps=30)
        xb, yb = bo.best()
        results[kind] = (bo, pm, hist)
        print(f"{kind}: best {yb:.4f} at x={xb[0]:.3f} "
              f"(true 1.4295 at 2.536) after {len(hist['y'])} evals")

    # ---- 2. batch proposals: Thompson paths and qEI fantasies --------------
    bo, pm, _ = results["UCB"]
    xq = bo.suggest(params=pm, kind="thompson", q=4, candidates=512)
    print(f"thompson q=4 proposals: {np.round(xq.ravel(), 3)} "
          f"(independent posterior-path argmaxes)")
    # analytic acquisitions batch through sequential fantasies: each pick
    # conditions the next ascent on an imagined observation (the kriging
    # believer lies with the posterior mean), so the batch self-diversifies
    xf = bo.suggest(params=pm, kind="logEI", q=4, candidates=512,
                    steps=30, liar="mean")
    print(f"qEI (kriging-believer) q=4 proposals: "
          f"{np.round(xf.ravel(), 3)}")

    if plot:
        import matplotlib.pyplot as plt

        xg = np.linspace(0, 4, 400, dtype=np.float32)[:, None]
        fig, ax = plt.subplots(figsize=(8, 4))
        ax.plot(xg[:, 0], f_multi(xg), "k-", lw=1, label="objective")
        bo_u = results["UCB"][0]
        xs = np.concatenate(bo_u.history["x"])
        ax.plot(xs, bo_u.history["y"], "o", ms=5, alpha=0.7,
                label="UCB evaluations")
        mu = np.asarray(results["UCB"][0].process.mean(pm, space=xg))
        sd = np.asarray(results["UCB"][0].process.std(pm, space=xg))
        ax.plot(xg[:, 0], mu, lw=1, label="posterior mean")
        ax.fill_between(xg[:, 0], mu - 2 * sd, mu + 2 * sd, alpha=0.2)
        ax.legend()
        save_fig("tut18_bo.png")

    # ---- 3. 2-D minimization with a warped surrogate -----------------------
    gp2 = g3.WGP(space=np.zeros((4, 2), np.float32), location=g3.Bias(),
                 kernel=g3.SE(2), noisy=True,
                 mapping=g3.BoxCoxShifted(), name="BO2")
    bo2 = g3.BayesOpt(gp2, bounds=[[-1.0, 3.0], [-1.0, 3.5]],
                      maximize=False, seed=2, xi=0.05)
    pm2, hist2 = bo2.run(f_2d, iters=iters, init=8, kind="logEI",
                         candidates=512 if quick else 1024, steps=30)
    xb2, yb2 = bo2.best()
    print(f"2-D warped surrogate: best {yb2:.4f} at {np.round(xb2, 3)} "
          f"(true min 0 at [1, 1.5])")

    # ---- 4. random search at the same budget -------------------------------
    rng = np.random.default_rng(0)
    budget = len(hist2["y"])
    xr = np.stack([rng.uniform(-1, 3, budget),
                   rng.uniform(-1, 3.5, budget)], axis=1)
    yr = f_2d(xr).min()
    print(f"random search with the same {budget} evals: best {yr:.4f} "
          f"(BO {yb2:.4f})")
    return yb2, float(yr)


if __name__ == "__main__":
    main()
