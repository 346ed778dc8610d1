"""Tutorial 04 — Random Fields (reference 04-Random-Fields-Fixed.ipynb).

The benchmark workload: abalone data, warped GP (SE kernel + BoxCoxLinear
warping + noise), MAP training, ensemble MCMC over the hyperparameter
posterior, datatrace analytics, and fix_vars Rao-Blackwellized logp over a
pinned chain (the reference's %timeit workload, BASELINE.md).
"""

import numpy as np

import g3py_tpu as g3
from _common import save_fig


def main(quick=True, plot=True):
    x_all, y_all = g3.data_abalone()
    rng = np.random.default_rng(0)
    psamples = 0.01 if quick else 0.03  # reference psamples=0.03 => ~125 rows
    obs, _ = g3.random_obs(x_all, p=psamples, rng=rng)
    x = x_all[obs]
    y = y_all[obs]

    wgp = g3.WGP(space=x[: min(40, len(x))], location=g3.Bias(),
                 kernel=g3.SE(x), mapping=g3.BoxCoxLinear(y), name="GP04")
    wgp.observed(x, y)

    params = wgp.find_MAP(points=1, powell=False, display=False)
    assert np.isfinite(wgp.logp(params))

    dt = wgp.sample_hypers(start=params, samples=40 if quick else 300,
                           chains=2 * wgp.ndim, burnin_tol=0.1, seed=0)
    assert "_ll" in dt

    # convergence + posterior analytics
    rhat = g3.gelman_rubin(g3.datatrace_to_chains(wgp, dt))
    mess = g3.effective_sample_size(wgp, dt, burnin=False)

    # fix_vars: pin the warping hypers to the chain, marginalize the rest
    cols = wgp.active.param_names()
    fixed_rows = dt[cols].iloc[:: max(len(dt) // 10, 1)][:10]
    uchain = np.stack([
        wgp.active.dict_to_array({c: fixed_rows.iloc[i][c] for c in cols})
        for i in range(len(fixed_rows))
    ])
    import pandas as pd

    udt = pd.DataFrame(uchain, columns=cols)
    keys = [c for c in cols if "BoxCoxLinear" in c][:2]
    wgp.active.fix_vars(udt, keys)
    try:
        sampling = wgp.active.sampling_params(params)
        fixed_lp = wgp.fixed_logp(sampling)
        fixed_grad = wgp.fixed_dlogp(sampling)
        assert np.isfinite(fixed_lp)
        assert np.all(np.isfinite(fixed_grad))
    finally:
        wgp.active.fix_vars()

    if plot:
        g3.plot_datatrace(dt, varnames=cols[:3])
        save_fig("tut04_datatrace.png")
    return {"params": params, "rhat": rhat, "mess": mess,
            "fixed_logp": float(fixed_lp)}


if __name__ == "__main__":
    out = main(quick=False)
    print("rhat:", out["rhat"], "mESS:", out["mess"], "fixed_logp:",
          out["fixed_logp"])
