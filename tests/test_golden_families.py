"""Golden-number regression pins for the post-reference model families.

One fixed-seed pinned workload per family added in driver round 2
(VERDICT round-2 item 6): SSM (single/multi-output/spatio-temporal/
non-Gaussian), Kronecker grid (complete + masked), SKI, the variational
family (SVP conjugate + robust, multiclass, heteroscedastic, LMC), deep
kernel learning, Bayesian-optimization suggestions and the CKS structure
search.  The original small GP/WGP pins live in test_golden.py.

All estimators run with fixed seeds on the CPU test platform, so every
number is deterministic; drift means a numerics change, deliberate or
not.  Regenerate deliberately with:

    python tests/test_golden_families.py --regen
"""

import json
import os

if __name__ == "__main__":  # --regen outside pytest: mirror conftest.py
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

import g3py_tpu as g3

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_families.json")


def _series(n, seed, span=10.0):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, span, n)).reshape(-1, 1).astype(np.float32)
    y = (np.sin(t[:, 0]) + 0.1 * rng.standard_normal(n)).astype(np.float32)
    return t, y


def _workloads():
    from g3py_tpu.models.lmc import stack_outputs

    out = {}
    rng = np.random.default_rng(99)

    # ---- StateSpaceGP: exact O(n) Markovian GP ----------------------------
    t, y = _series(48, seed=1)
    ss = g3.StateSpaceGP(space=t, kernel=g3.MAT32(t) + g3.OU(t),
                         name="GOLD_SS")
    ss.observed(t, y)
    tq = np.linspace(1, 9, 8).reshape(-1, 1).astype(np.float32)
    out["ssgp_logp"] = float(ss.logp())
    out["ssgp_dlogp_norm"] = float(np.linalg.norm(ss.dlogp()))
    out["ssgp_mean_sum"] = float(np.sum(ss.mean(space=tq)))
    out["ssgp_var_sum"] = float(np.sum(ss.variance(space=tq)))

    # ---- MultiStateSpaceGP: LMC multi-output time series ------------------
    t0, y0 = _series(30, seed=2)
    t1, y1 = _series(25, seed=3)
    xm, ym = stack_outputs([t0, t1], [y0, -0.5 * y1 + 0.3])
    ms = g3.MultiStateSpaceGP(space=xm, kernel=[g3.MAT32(t0), g3.OU(t0)],
                              outputs_dim=2, name="GOLD_MS")
    ms.observed(xm, ym)
    out["mssgp_logp"] = float(ms.logp())
    out["mssgp_dlogp_norm"] = float(np.linalg.norm(ms.dlogp()))

    # ---- SpatioTemporalSSGP: separable space-time on sites ----------------
    sites = np.array([[0.0], [1.0], [2.5]], np.float32)
    ts, ys = [], []
    for p in range(3):
        tp_, yp = _series(14 + p, seed=4 + p)
        ts.append(tp_)
        ys.append(yp * float(np.exp(-p / 3.0)))
    xs, ysr = stack_outputs(ts, ys)
    st = g3.SpatioTemporalSSGP(space=xs, kernel=g3.MAT32(xs[:, :1]),
                               space_kernel=g3.SE(sites), sites=sites,
                               name="GOLD_ST")
    st.observed(xs, ysr)
    out["stssgp_logp"] = float(st.logp())

    # ---- NonGaussianSSGP: Poisson counts on the exact SSM prior -----------
    t4, _ = _series(40, seed=8)
    lam = np.exp(0.8 * np.sin(t4[:, 0]))
    y4 = rng.poisson(lam).astype(np.float32)
    ng = g3.NonGaussianSSGP(space=t4, kernel=g3.MAT32(t4),
                            likelihood=g3.PoissonLik(), name="GOLD_NG")
    ng.observed(t4, y4)
    out["ngssm_poisson_logp"] = float(ng.logp())
    out["ngssm_mean_sum"] = float(np.sum(ng.mean(
        space=t4[::5])))

    # ---- GridGP: exact Kronecker grid ------------------------------------
    gt = np.linspace(0, 6, 8).astype(np.float32)
    gx = np.linspace(-2, 2, 6).astype(np.float32)
    rows = g3.grid_rows([gt, gx])
    fg = np.sin(rows[:, 0]) * np.exp(-0.3 * rows[:, 1] ** 2)
    yg = (fg + 0.1 * rng.standard_normal(rows.shape[0])).astype(np.float32)
    gg = g3.GridGP(axes=[gt, gx],
                   kernel=[g3.MAT32(gt[:, None]), g3.SE(gx[:, None])],
                   name="GOLD_GR")
    gg.observed(rows, yg)
    q5 = np.stack([np.linspace(0.5, 5.5, 5),
                   np.linspace(-1.5, 1.5, 5)], 1).astype(np.float32)
    out["grid_logp"] = float(gg.logp())
    out["grid_dlogp_norm"] = float(np.linalg.norm(gg.dlogp()))
    out["grid_mean_sum"] = float(np.sum(gg.mean(space=q5)))

    # ---- masked GridGP: incomplete grid, matrix-free path -----------------
    keep = np.sort(np.random.default_rng(5).choice(
        rows.shape[0], int(0.7 * rows.shape[0]), replace=False))
    mg = g3.GridGP(axes=[gt, gx],
                   kernel=[g3.MAT32(gt[:, None]), g3.SE(gx[:, None])],
                   masked_probes=8, masked_lanczos=20, name="GOLD_MG")
    mg.observed(rows[keep], yg[keep])
    out["masked_grid_logp"] = float(mg.logp())
    out["masked_grid_dlogp_norm"] = float(np.linalg.norm(mg.dlogp()))

    # ---- SKIGP: scattered rows on an inducing grid ------------------------
    xk = np.stack([np.random.default_rng(6).uniform(0, 6, 40),
                   np.random.default_rng(7).uniform(-2, 2, 40)],
                  1).astype(np.float32)
    yk = (np.sin(xk[:, 0]) + 0.1 * np.random.default_rng(8)
          .standard_normal(40)).astype(np.float32)
    sk = g3.SKIGP(kernel=[g3.MAT32(xk[:, :1]), g3.SE(xk[:, 1:2])],
                  grid_shape=[12, 10], ski_probes=8, ski_lanczos=20,
                  name="GOLD_SKI")
    sk.observed(xk, yk)
    out["skigp_logp"] = float(sk.logp())
    out["skigp_dlogp_norm"] = float(np.linalg.norm(sk.dlogp()))

    # ---- SVP: conjugate + robust likelihoods ------------------------------
    x8, y8 = _series(40, seed=9)
    svp = g3.SVP(space=x8[:4], location=g3.Bias(), kernel=g3.SE(x8),
                 likelihood=g3.GaussianLik(), inducing=8, name="GOLD_SVP")
    svp.observed(x8, y8)
    out["svp_gaussian_elbo"] = float(svp.logp())
    out["svp_gaussian_dlogp_norm"] = float(np.linalg.norm(svp.dlogp()))
    svt = g3.SVP(space=x8[:4], location=g3.Bias(), kernel=g3.SE(x8),
                 likelihood=g3.StudentTLik(), inducing=8, name="GOLD_SVT")
    svt.observed(x8, y8)
    out["svp_studentt_elbo"] = float(svt.logp())

    # ---- MulticlassSVP ----------------------------------------------------
    xc = np.random.default_rng(10).standard_normal((45, 2)).astype(
        np.float32)
    yc = (np.digitize(xc[:, 0] + 0.3 * xc[:, 1], [-0.5, 0.5])
          ).astype(np.float32)
    svc = g3.MulticlassSVP(space=xc, kernel=g3.SE(xc), classes=3,
                           inducing=9, name="GOLD_MC")
    svc.observed(xc, yc)
    out["multiclass_elbo"] = float(svc.logp())

    # ---- HeteroscedasticSVP -----------------------------------------------
    xh, yh = _series(40, seed=11)
    het = g3.HeteroscedasticSVP(space=xh, location=g3.Bias(),
                                kernel=g3.SE(xh), inducing=8,
                                name="GOLD_HET")
    het.observed(xh, yh)
    out["heteroscedastic_elbo"] = float(het.logp())

    # ---- LMCSVP -----------------------------------------------------------
    xl, yl = stack_outputs([t0, t1], [y0, 0.7 * y1])
    lmc = g3.LMCSVP(space=xl, kernel=g3.SE(t0), outputs_dim=2,
                    inducing=8, name="GOLD_LMC")
    lmc.observed(xl, yl)
    out["lmcsvp_elbo"] = float(lmc.logp())

    # ---- Deep kernel learning --------------------------------------------
    xd = np.random.default_rng(12).standard_normal((36, 3)).astype(
        np.float32)
    yd = (np.tanh(xd @ np.array([1.0, -0.5, 0.25], np.float32))
          + 0.1 * np.random.default_rng(13).standard_normal(36)
          ).astype(np.float32)
    dk = g3.DeepKernel(g3.SE, xd, widths=(8, 2))
    dgp = g3.GP(space=xd, location=g3.Bias(), kernel=dk, noisy=True,
                name="GOLD_DKL")
    dgp.observed(xd, yd)
    out["dkl_logp"] = float(dgp.logp())
    out["dkl_dlogp_norm"] = float(np.linalg.norm(dgp.dlogp()))

    # ---- BayesOpt: fixed-seed UCB suggestion at fixed hypers --------------
    xb = np.array([[0.4], [1.1], [2.0], [2.9], [3.6]], np.float32)
    yb = np.sin(2.0 * xb[:, 0]).astype(np.float32)
    bgp = g3.GP(space=xb, location=g3.Bias(), kernel=g3.SE(xb),
                noisy=True, name="GOLD_BO")
    bgp.observed(xb, yb)
    bo = g3.BayesOpt(bgp, bounds=[[0.0, 4.0]], maximize=True, seed=0)
    # hand-set sane hypers (the qEI-test lesson, CLAUDE.md round 15: a
    # default/MAP fit on a handful of points can land in the flat
    # all-noise optimum and the argmax degenerates to a boundary point)
    pb = dict(bgp.params_default)
    for k in pb:
        if k.endswith("SE_var"):
            pb[k] = np.asarray(1.0, np.float32)
        if k.endswith("Noise_var"):
            pb[k] = np.asarray(1e-4, np.float32)
        if "scales" in k:
            pb[k] = np.asarray(pb[k]) * 0 + 0.5
    xs_ucb = bo.suggest(params=pb, kind="UCB", candidates=256, starts=4,
                        steps=40)
    out["bo_ucb_suggest_x"] = float(np.ravel(xs_ucb)[0])

    return out


def test_golden_family_numbers():
    if not os.path.exists(GOLDEN):
        pytest.skip("golden file not generated yet")
    with open(GOLDEN) as f:
        want = json.load(f)
    got = _workloads()
    for k, v in want.items():
        np.testing.assert_allclose(
            got[k], v, rtol=5e-5, atol=5e-5,
            err_msg=f"golden drift in {k}: {got[k]} vs {v}")
    # nothing silently dropped from the pin set
    assert set(got) == set(want)


if __name__ == "__main__":
    import sys

    if "--regen" in sys.argv:
        vals = _workloads()
        with open(GOLDEN, "w") as f:
            json.dump(vals, f, indent=1, sort_keys=True)
        print("wrote", GOLDEN)
        for k, v in sorted(vals.items()):
            print(f"  {k}: {v}")
