"""Three consecutive crash-free 50k device-loop MAP runs (VERDICT r4
item 3 done-bar): ``find_MAP(engine='iterative', loop='device')`` at the
tut19 two-output 50k workload, dispatch-budget auto-chunking active, each
run from a distinct perturbed start, per-chunk walls logged.

The historical failure mode (4 worker faults in 6 dispatch sequences,
round 4) was a single long fused chunk program — most often one
dispatched FROM an already-converged state.  The fix under test is
``lbfgs_minimize_guarded(dispatch_budget=)``: chunk length auto-sized
from a timed objective eval so every dispatch stays under the measured
worker-crash envelope (benchmarks/crash_envelope.py ->
docs/performance.md).

Run (real TPU): python benchmarks/device_loop_3x.py [--budget 60]
                [--quick] [--runs 3]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/examples")


def main(budget=None, quick=False, runs=3):
    import jax

    import g3py_tpu as g3
    from g3py_tpu.config import settings
    from g3py_tpu.hypers.kernels import KernelDot
    from g3py_tpu.hypers.metrics import Delta
    from tut19_multioutput_50k import make_field

    print("backend:", jax.default_backend(), flush=True)
    if budget is not None:
        settings.dispatch_budget_s = float(budget)
    print("dispatch_budget_s:", settings.dispatch_budget_s, flush=True)

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

    base = dict(gp.params_default)
    base[f"{gp.name}_Time_rate"] = np.asarray([0.3], np.float32)
    reg = gp.active
    u_base = np.asarray(reg.dict_to_array(base), settings.floatx)

    # precompute every start dict up front: array_to_dict runs device ops
    # (transform.backward), and a post-crash recovery window must contain
    # NO device work outside a try block (measured: one crashed the
    # script exactly there)
    starts = []
    for r in range(runs):
        if r == 0:
            u0 = u_base
        else:
            u0 = (u_base * (1 + 0.05 * np.random.default_rng(100 + r)
                            .standard_normal(len(u_base)))
                  ).astype(settings.floatx)
        starts.append(reg.array_to_dict(u0))

    def probe(timeout_s=600.0):
        # bounded SUBPROCESS probes: an in-process device call issued
        # during the worker-restart window can WEDGE silently (measured
        # — one stuck this script's recovery loop for 10+ min while the
        # worker was already healthy again)
        import subprocess

        code = ("import numpy as np, jax.numpy as jnp; "
                "x = jnp.ones((128,128)); "
                "print(float(np.asarray(jnp.sum(x@x))))")
        t0 = time.perf_counter()
        while time.perf_counter() - t0 < timeout_s:
            try:
                r = subprocess.run([sys.executable, "-c", code],
                                   capture_output=True, timeout=240)
                if r.returncode == 0:
                    return True
            except subprocess.TimeoutExpired:
                pass
            time.sleep(30.0)
        return False

    ok_runs = 0
    for r in range(runs):
        start = starts[r]
        print(f"--- run {r + 1}/{runs} ---", flush=True)
        t0 = time.perf_counter()
        try:
            params = gp.find_MAP(start=start, engine="iterative",
                                 loop="device", points=1, display=True,
                                 max_iters=12, chunk=1,
                                 linesearch_steps=5, **it_kw)
            wall = time.perf_counter() - t0
            nll, info = gp.nll_iterative(params, **it_kw)
            print(f"run {r + 1}: OK wall={wall:.1f}s "
                  f"NLL={float(nll):.1f} "
                  f"cg_resid={float(info['cg_rel_residual']):.2e}",
                  flush=True)
            ok_runs += 1
        except Exception as e:
            wall = time.perf_counter() - t0
            print(f"run {r + 1}: FAILED after {wall:.1f}s "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)
            print("waiting out a possible worker restart...", flush=True)
            time.sleep(150.0)
            print(f"probe: {'alive' if probe() else 'STILL DOWN'}",
                  flush=True)

    print(f"RESULT: {ok_runs}/{runs} consecutive runs crash-free",
          flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget", type=float, default=None)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--runs", type=int, default=3)
    a = ap.parse_args()
    main(budget=a.budget, quick=a.quick, runs=a.runs)
