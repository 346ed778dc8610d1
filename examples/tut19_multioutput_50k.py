"""Tutorial 19 — A 50,000-row two-output random field, trained and served
on one chip (BASELINE configs[4]: "multi-output graphical GP random field
at N=50k" — the reference's notebooks 04/08 composition at 400x their
scale; its dense gram alone would be 10 GB).

The model is the EXACT multi-output GP through index-kernel
coregionalization (the reference's DeltaEq machinery, kernels.py:262-290):
rows are ``(t, output_index)``, the kernel is the intrinsic
coregionalization form ``K = SE(t) + SE(t) * Coreg(output)``, and noise is
the usual ``GP(noisy=True)`` wrapper.  Nothing about the model changes at
50k rows — only the ENGINES do:

* training: ``find_MAP(engine='iterative')`` — the matrix-free
  preconditioned objective (lazy gram slabs, PCG quadratic form, SLQ
  logdet, BBMM trace gradients; ops/iterative.py).  No O(n^2) memory.
* serving:  ``gp.predictor_iterative(params)`` — one multi-RHS PCG for the
  state, then every statistic streams as blocked cross-gram matmuls.

Measured on the TPU v5e tunnel (2026-08-20, run with ``--full``):
data n=50,000; training = 6 L-BFGS iterations of the matrix-free
objective, NLL -11,021 -> -44,439 (wall 316 s incl. ~60 s compile);
serving state factored once in 56 s, 512-row held-out batch mean+std in
6.7 s; held-out RMSE 0.064 vs noise floor 0.05 (signal std 0.74).
"""

import sys
import time

import numpy as np

if __name__ == "__main__":  # direct runs: repo root + examples dir
    import os

    _root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(_root, "examples"))
    sys.path.insert(0, _root)

import g3py_tpu as g3


def make_field(n_points, rng):
    """Two correlated outputs of a smooth latent field over time."""
    t = np.sort(rng.uniform(0, 100, n_points)).astype(np.float32)
    f = np.sin(0.3 * t) * np.exp(-0.5 * ((t - 50) / 30) ** 2)
    y0 = f + 0.05 * rng.standard_normal(n_points)
    y1 = 0.6 * f + 0.3 + 0.05 * rng.standard_normal(n_points)
    x = np.concatenate([
        np.stack([t, np.zeros(n_points, np.float32)], 1),
        np.stack([t, np.ones(n_points, np.float32)], 1)]).astype(np.float32)
    y = np.concatenate([y0, y1]).astype(np.float32)
    ftrue = np.concatenate([f, 0.6 * f + 0.3]).astype(np.float32)
    return x, y, ftrue


def main(quick=True, plot=False):
    rng = np.random.default_rng(0)
    n_points = 200 if quick else 25_000
    x, y, ftrue = make_field(n_points, rng)
    n = len(y)

    # hold out a scattered test set
    test = np.sort(rng.choice(n, 512 if not quick else 64, replace=False))
    train = np.setdiff1d(np.arange(n), test)

    # intrinsic coregionalization: shared latent SE on the time column +
    # its output-equality modulation (KernelDot over the index column with
    # the Delta metric — tut07's algebra, here at scale)
    from g3py_tpu.hypers.kernels import KernelDot
    from g3py_tpu.hypers.metrics import Delta

    se = g3.SE([0], name="Time")
    coreg = KernelDot([1], metric=Delta, name="Coreg")
    gp = g3.GP(space=x[:4], location=g3.Bias(), kernel=se + se * coreg,
               noisy=True, name="MO19")
    gp.observed(x[train], y[train])

    it_kw = dict(rank=40, cg_iters=60, probes=8) if quick else dict(
        rank=80, cg_iters=100, probes=8)

    nll0, _ = gp.nll_iterative(gp.params_default, **it_kw)
    t0 = time.perf_counter()
    params = gp.find_MAP(engine="iterative", points=1, display=False,
                         max_iters=4 if quick else 6, **it_kw)
    t_train = time.perf_counter() - t0
    nll1, info1 = gp.nll_iterative(params, **it_kw)
    print(f"n={len(train)}: matrix-free NLL {float(nll0):.0f} -> "
          f"{float(nll1):.0f} in {t_train:.0f}s "
          f"(cg_resid {float(info1['cg_rel_residual']):.1e})", flush=True)
    assert float(nll1) < float(nll0) - 1.0
    assert float(info1["cg_rel_residual"]) < 5e-2

    # ---- serving: factor the state once, stream statistics ----------------
    t0 = time.perf_counter()
    pr = gp.predictor_iterative(params, rank=it_kw["rank"],
                                cg_iters=max(200, it_kw["cg_iters"]))
    t_state = time.perf_counter() - t0
    t0 = time.perf_counter()
    mu = np.asarray(pr.mean(space=x[test]))
    sd = np.asarray(pr.std(space=x[test]))
    t_serve = time.perf_counter() - t0
    rmse = float(np.sqrt(np.mean((mu - ftrue[test]) ** 2)))
    cover = float(np.mean(np.abs(y[test] - mu) <= 2 * np.sqrt(
        sd ** 2 + 0.05 ** 2)))
    print(f"serving: state {t_state:.1f}s, {len(test)}-row mean+std "
          f"{t_serve:.1f}s; held-out rmse {rmse:.3f} "
          f"(noise floor 0.05), 2sd coverage {cover:.2f}", flush=True)
    assert rmse < (0.25 if quick else 0.12)
    assert cover > 0.85

    if plot:
        from _common import save_fig
        import matplotlib.pyplot as plt

        o0 = x[test][:, 1] == 0
        plt.plot(x[test][o0, 0], mu[o0], ".", label="served mean (out 0)")
        plt.plot(x[test][o0, 0], ftrue[test][o0], "-k", lw=0.5,
                 label="truth")
        plt.legend()
        save_fig("tut19_mo50k.png")

    return dict(n=len(train), nll0=float(nll0), nll1=float(nll1),
                t_train=t_train, t_state=t_state, t_serve=t_serve,
                rmse=rmse)


if __name__ == "__main__":
    main(quick="--full" not in sys.argv, plot="--plot" in sys.argv)
