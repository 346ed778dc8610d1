"""A/B: host (scipy) vs on-device (optax chunked scan) L-BFGS for the
matrix-free iterative MAP at the tut19 50k two-output workload
(VERDICT round-3 item 6: the host loop costs ~23-30 s per L-BFGS
iteration because every objective call is a tunnel round trip; target
<=5-6 s/iteration with the device loop).

Run (real TPU): python benchmarks/iterative_device_loop.py [--quick]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/examples")


def main(quick=False):
    import jax
    import jax.numpy as jnp

    import g3py_tpu as g3
    from g3py_tpu.config import settings
    from g3py_tpu.hypers.kernels import KernelDot
    from g3py_tpu.hypers.metrics import Delta
    from tut19_multioutput_50k import make_field

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    n_points = 2000 if quick else 25_000
    x, y, _ = make_field(n_points, rng)
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

    reg = gp.active
    prior_pure = gp._logp_pure(prior=True)
    xj = jnp.asarray(gp.inputs)
    yj = jnp.asarray(gp.outputs)
    vec0 = jnp.zeros(0, dtype=settings.dtype)

    def objective(u):
        p = reg.array_to_dict_jax(u)
        nll, info = gp.nll_iterative(p, **it_kw)
        return nll - prior_pure(p, xj, xj, yj, vec0), info["cg_rel_residual"]

    u0 = np.asarray(reg.dict_to_array(start), settings.floatx)

    # ---- device loop: chunked optax L-BFGS -------------------------------
    # One chunk of 4 iterations reached the tut19 optimum (-77,577) on
    # the first attempt (2026-08-21); a SECOND chunk dispatch crashed the
    # tunnel worker (the known big-fused-program crash mode) — so the
    # measurement is per-chunk-timed and each phase stands alone.  The
    # host baseline is round 3's recorded 181 s / 6 iterations (~30
    # s/iter, docs/performance.md) — re-measured here only if the device
    # phases survive.
    from g3py_tpu.bayesian import optimize_jax as oj

    # the crash is state-specific: BOTH observed faults were the chunk
    # dispatched FROM the converged state (-77577.5, |g|max 328) — a
    # fresh-start dispatch of the same cached program is the way to a
    # warm measurement.  Phase 1: one cold chunk (compile + 4 iters,
    # reaches the optimum).  Phase 2: perturbed start, ONE warm chunk.
    chunk = 4
    t0 = time.perf_counter()
    pts, vals, iters = oj.lbfgs_minimize_guarded(
        objective, u0, max_iters=chunk, chunk=chunk, display=True,
        linesearch_steps=5)
    t_dev = time.perf_counter() - t0
    it_dev = int(iters[0])
    print(f"[device cold ls5] total {t_dev:.1f}s for {it_dev} iters "
          f"(incl. compile) -> {t_dev/max(it_dev,1):.2f} s/iter; "
          f"final -logp {vals[0]:.1f}", flush=True)

    # warm re-run from a perturbed start with a CAPPED zoom budget: the
    # default budget saturates near guard cliffs (measured 59 s/iter —
    # every zoom step is a full objective+grad eval) — note a capped
    # linesearch changes the program, so this phase compiles its own
    u0b = (u0 * (1 + 0.05 * np.random.default_rng(1).standard_normal(
        len(u0)))).astype(settings.floatx)
    t0 = time.perf_counter()
    pts2, vals2, iters2 = oj.lbfgs_minimize_guarded(
        objective, u0b, max_iters=2 * chunk, chunk=chunk, display=True,
        linesearch_steps=5)
    t_dev2 = time.perf_counter() - t0
    it_dev2 = int(iters2[0])
    print(f"[device warm ls5] total {t_dev2:.1f}s for {it_dev2} iters -> "
          f"{t_dev2/max(it_dev2,1):.2f} s/iter; final -logp {vals2[0]:.1f}",
          flush=True)

    nll_dev, _ = gp.nll_iterative(reg.array_to_dict(pts2[0]), **it_kw)
    print(f"[summary] device warm {t_dev2/max(it_dev2,1):.2f} s/iter vs "
          f"host ~30 s/iter recorded (181s/6, round 3) "
          f"-> {30.0/(t_dev2/max(it_dev2,1)):.1f}x; "
          f"NLL at device optimum {float(nll_dev):.1f}", flush=True)

    if "--host" in sys.argv:
        t0 = time.perf_counter()
        params_host = gp.find_MAP(start=start, engine="iterative",
                                  points=1, display=True, max_iters=6,
                                  **it_kw)
        t_host = time.perf_counter() - t0
        nll_host, _ = gp.nll_iterative(params_host, **it_kw)
        print(f"[host] total {t_host:.1f}s for <=6 iters -> "
              f"{t_host/6:.2f} s/iter (lower bound); final NLL "
              f"{float(nll_host):.1f}", flush=True)


if __name__ == "__main__":
    main(quick="--quick" in sys.argv)
