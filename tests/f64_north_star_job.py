"""Standalone float64 north-star job (BASELINE's "NLL matching to 1e-6").

Run in a subprocess by ``test_parity_reference.py::test_f64_north_star``
(x64 + ``settings.floatx`` are process-global, so this must not run inside
the float32 suite process).

The recorded reference scores are float64 records of the reference's own
FLOAT32 pipeline, so no implementation can match them beyond ~1e-4 — the
f32 rounding is in the oracle itself.  What CAN be demanded at 1e-6 is
algorithmic agreement with rounding removed: run this library's full
pipeline in float64 and compare against an INDEPENDENT plain-numpy float64
implementation of the same math (SE gram, Cholesky MVN loglike, warping
pullbacks, posterior moments, scores) at the reference experiment's own
configurations (sunsets.g3x oracle params + splits).  Exit code 0 iff every
comparison agrees to 1e-6 relative.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import scipy.linalg

from g3py_tpu.config import settings

settings.floatx = "float64"

import g3py_tpu as g3  # noqa: E402  (needs settings set first)
from g3py_tpu.utils.data import data_sunspots  # noqa: E402
from g3py_tpu.utils.reference_io import (  # noqa: E402
    load_experiment_frames,
    transformed_to_natural,
)

_VENDORED = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "data", "experiments", "sunsets.g3x")
REFERENCE = (_VENDORED if os.path.isfile(_VENDORED + ".r")
             else "/root/reference/notebooks/experiments/sunsets.g3x")
RTOL = 1e-6
LOG2PI = np.log(2.0 * np.pi)
failures = []


def check(name, mine, ref):
    mine, ref = float(mine), float(ref)
    rel = abs(mine - ref) / max(abs(ref), 1e-300)
    status = "ok" if rel < RTOL else "FAIL"
    print(f"{status:4s} {name}: pipeline={mine!r} independent={ref!r} "
          f"rel={rel:.2e}")
    if rel >= RTOL:
        failures.append(name)


def se_gram(x1, x2, var, rate):
    d = x1[:, None] - x2[None, :]
    return var * np.exp(-0.5 * (rate * d) ** 2)


def indep_loglike(x, y, par, prefix, tinv, logdet_dinv):
    """Plain-numpy f64 warped-MVN loglike: the math of gaussian.py's
    th_loglike_fn with none of its implementation."""
    n = len(x)
    var = float(par[f"{prefix}_SE_var"])
    rate = float(np.asarray(par[f"{prefix}_SE_rate"]).ravel()[0])
    nv = float(par[f"{prefix}_Noise_var"])
    bias = float(par[f"{prefix}_Bias_Bias"])
    kn = se_gram(x, x, var, rate) + nv * np.eye(n)
    L = scipy.linalg.cholesky(kn, lower=True)
    z = scipy.linalg.solve_triangular(L, tinv - bias, lower=True)
    return (-0.5 * n * LOG2PI - 0.5 * z @ z - np.sum(np.log(np.diag(L)))
            + logdet_dinv)


def main():
    results, sims = load_experiment_frames(REFERENCE)
    x64, y64 = data_sunspots()
    x64 = np.asarray(x64, np.float64)
    y64 = np.asarray(y64, np.float64)

    def oracle_row(model):
        return next(r for _, r in results.iterrows() if r["model"] == model)

    # ---- 1. NLL at the oracle params, three warping families ---------------
    for model in ("GP", "WGP1", "TGP2"):
        row = oracle_row(model)
        par = {k: np.asarray(v, np.float64)
               for k, v in transformed_to_natural(row["params"]).items()}
        sim = sims.loc[row["n_sim"]]
        obs_j = np.asarray(sim["obs"])
        xo, yo = x64[obs_j], y64[obs_j]

        common = dict(space=x64, location=g3.Bias(), kernel=g3.SE(x64),
                      name=model)
        if model == "GP":
            sp = g3.GP(**common)
            tinv, logdet = yo, 0.0
        elif model == "WGP1":
            sp = g3.WGP(mapping=g3.WarpingTanh(y64, n=1), **common)
            a = np.asarray(par["WGP1_WarpingTanh_a"], np.float64)
            b = np.asarray(par["WGP1_WarpingTanh_b"], np.float64)
            c = np.asarray(par["WGP1_WarpingTanh_c"], np.float64)
            tinv = yo + np.tanh(b * (yo[:, None] + c)) @ a
            dinv = 1.0 + (a * b * np.cosh(b * (yo[:, None] + c)) ** -2).sum(1)
            logdet = np.sum(np.log(dinv))
        else:  # TGP2 = ArcsinhLinear
            sp = g3.WGP(mapping=g3.ArcsinhLinear(y64), **common)
            scale = float(par["TGP2_ArcsinhLinear_scale"])
            shift = float(par["TGP2_ArcsinhLinear_shift"])
            tinv = np.arcsinh(yo) * scale + shift
            logdet = (len(yo) * np.log(scale)
                      - 0.5 * np.sum(np.log1p(yo ** 2)))
        sp.observed(xo, yo)
        check(f"{model} loglike", sp.loglike(par),
              indep_loglike(xo.ravel(), yo, par, model, tinv, logdet))

    # ---- 1b. Student-t NLL at the GP oracle config (same split/hypers,
    # default prior degree) — covers the multivariate-t scalarization ------
    import g3py_tpu as g3l
    from scipy.special import gammaln as sp_gammaln

    row = oracle_row("GP")
    par = {k: np.asarray(v, np.float64)
           for k, v in transformed_to_natural(row["params"]).items()}
    sim = sims.loc[row["n_sim"]]
    obs_j = np.asarray(sim["obs"])
    xo, yo = x64[obs_j], y64[obs_j]
    tp = g3l.TP(space=x64, location=g3l.Bias(), kernel=g3l.SE(x64),
                name="TPF")
    tp.observed(xo, yo)
    part = {k.replace("GP_", "TPF_"): v for k, v in par.items()}
    part["TPF_Freedom_degree"] = np.float64(
        np.asarray(tp.params_default["TPF_Freedom_degree"]))
    nu = 2.0 + float(part["TPF_Freedom_degree"])
    n_o = len(xo)
    var = float(part["TPF_SE_var"])
    rate = float(np.asarray(part["TPF_SE_rate"]).ravel()[0])
    nv = float(part["TPF_Noise_var"])
    bias = float(part["TPF_Bias_Bias"])
    kn = se_gram(xo.ravel(), xo.ravel(), var, rate) + nv * np.eye(n_o)
    L = scipy.linalg.cholesky(kn, lower=True)
    z = scipy.linalg.solve_triangular(L, yo - bias, lower=True)
    beta = z @ z
    ll_t = (-0.5 * (nu + n_o) * np.log1p(beta / (nu - 2.0))
            + sp_gammaln((nu + n_o) / 2.0) - sp_gammaln(nu / 2.0)
            - 0.5 * n_o * np.log((nu - 2.0) * np.pi)
            - np.sum(np.log(np.diag(L))))
    check("TP loglike", tp.loglike(part), ll_t)

    # ---- 2. GP test-split posterior scores at 1e-6 -------------------------
    row = oracle_row("GP")
    par = {k: np.asarray(v, np.float64)
           for k, v in transformed_to_natural(row["params"]).items()}
    sim = sims.loc[row["n_sim"]]
    obs_j, test_j = np.asarray(sim["obs"]), np.asarray(sim["test"])
    xo, yo = x64[obs_j], y64[obs_j]
    xt, yt = x64[test_j], y64[test_j]

    sp = g3.GP(space=x64, location=g3.Bias(), kernel=g3.SE(x64), name="GP")
    sp.observed(xo, yo)
    sp.set_space(xt, hidden=yt)
    mine = sp.scores(par, logpred=True, bias=True, variance=True)

    var = float(par["GP_SE_var"])
    rate = float(np.asarray(par["GP_SE_rate"]).ravel()[0])
    nv = float(par["GP_Noise_var"])
    bias = float(par["GP_Bias_Bias"])
    kn = se_gram(xo.ravel(), xo.ravel(), var, rate) + nv * np.eye(len(xo))
    kc = se_gram(xo.ravel(), xt.ravel(), var, rate)  # (obs, test)
    L = scipy.linalg.cholesky(kn, lower=True)
    w = scipy.linalg.solve_triangular(L, kc, lower=True)  # L^{-1} K_ot
    alpha = scipy.linalg.solve_triangular(L, yo - bias, lower=True)
    mu = bias + w.T @ alpha
    pvar = var - np.sum(w * w, axis=0)  # posterior diag, noise-free
    sd_n = np.sqrt(pvar + nv)  # predictive sd with observation noise
    l1 = np.mean(np.abs(mu - yt))
    l2 = np.mean((mu - yt) ** 2)
    mse = np.mean((mu - yt) ** 2 + pvar)
    nlpd = -np.mean(-0.5 * LOG2PI - np.log(sd_n)
                    - 0.5 * ((yt - mu) / sd_n) ** 2)
    check("GP test _l1", mine["_l1"], l1)
    check("GP test _l2", mine["_l2"], l2)
    check("GP test _mse", mine["_mse"], mse)
    check("GP test _rmse", mine["_rmse"], np.sqrt(mse))
    check("GP test _nlpd", mine["_nlpd"], nlpd)

    if failures:
        print(f"f64 north star: {len(failures)} FAILURES: {failures}")
        return 1
    print("f64 north star: all comparisons within 1e-6 relative")
    return 0


if __name__ == "__main__":
    sys.exit(main())
