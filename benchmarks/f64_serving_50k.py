"""Serve the TRAINED tut19 50k two-output model matrix-free in f64
(VERDICT round-3 item 5 'done' condition: predictor_iterative serving
the trained 50k model with resid < 5e-2, or a measured closure note).

Round-3 measured that the f32 stack stalls at the trained optimum
(resid 0.22, guard refuses); the round-4 2x2 (f64_precond_ab.py) showed
only the FULL-f64 pipeline converges.  This script trains to the same
optimum (host iterative engine, ~6 L-BFGS iterations) and then builds
``predictor_iterative(dtype='float64')`` — measuring the build residual,
build wall, and a 256-point query batch on the live backend (f64 is
emulated on TPU; the state solve happens once).

Run: python benchmarks/f64_serving_50k.py [--quick]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/examples")


def main(quick=False):
    import jax

    import g3py_tpu as g3
    from g3py_tpu.hypers.kernels import KernelDot
    from g3py_tpu.hypers.metrics import Delta
    from tut19_multioutput_50k import make_field

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    n_points = 2000 if quick else 25_000
    x, y, ftrue = make_field(n_points, rng)
    n = len(y)
    test = np.sort(rng.choice(n, 512, replace=False))
    train = np.setdiff1d(np.arange(n), test)

    se = g3.SE([0], name="Time")
    coreg = KernelDot([1], metric=Delta, name="Coreg")
    gp = g3.GP(space=x[:4], location=g3.Bias(), kernel=se + se * coreg,
               noisy=True, name="MO19")
    gp.observed(x[train], y[train])
    it_kw = dict(rank=80, cg_iters=100, probes=8)
    start = dict(gp.params_default)
    start[f"{gp.name}_Time_rate"] = np.asarray([0.3], np.float32)

    t0 = time.perf_counter()
    params = gp.find_MAP(start=start, engine="iterative", points=1,
                         display=False, max_iters=6, **it_kw)
    print(f"trained in {time.perf_counter()-t0:.0f}s; Noise_var "
          f"{float(np.asarray(params[f'{gp.name}_Noise_var'])):.5f}",
          flush=True)

    # f32 stack at the trained optimum: expect the guard to refuse
    try:
        gp.predictor_iterative(params, rank=80, cg_iters=400)
        print("f32 predictor: UNEXPECTEDLY served", flush=True)
    except ValueError as e:
        print(f"f32 predictor refused (expected): {str(e)[:110]}",
              flush=True)

    # full-f64 pipeline — block=512: the f64 emulation's lazy slabs cost
    # ~4x their f32 size in temps (measured OOM at block=2048: 25.5 GB
    # vs 15.75 GB HBM)
    t0 = time.perf_counter()
    pr = gp.predictor_iterative(params, rank=80, cg_iters=400,
                                block=512, dtype="float64")
    t_build = time.perf_counter() - t0
    print(f"f64 predictor: build {t_build:.1f}s, "
          f"cg_rel_residual {pr.cg_rel_residual:.3e}", flush=True)

    xq = x[test[:256]]
    t0 = time.perf_counter()
    out = pr(xq, var=True)
    t_q = time.perf_counter() - t0
    mu = np.asarray(out["mean"])
    rmse = float(np.sqrt(np.mean((mu - ftrue[test[:256]]) ** 2)))
    print(f"f64 serve: 256-pt batch (exact var) {t_q:.1f}s, "
          f"rmse vs true field {rmse:.4f} (noise sd 0.05)", flush=True)


if __name__ == "__main__":
    main(quick="--quick" in sys.argv)
