"""Map the hosted TPU tunnel's big-fused-program worker-crash envelope
(VERDICT r4 item 3).

Seven+ measured crashes across rounds share one shape: a SINGLE fused
program with a long device-side runtime (monolithic NUTS d=7 trees, 50k
device-loop L-BFGS chunks, 1e6-row SKI backward, one 32-pair fit_splits
run) kills the tunnel worker, while many short dispatches of the same
total work run clean.  This script measures the boundary directly: one
knob program — a lax.scan of n x n matmuls, scan length L sets the
device runtime, batch b sets the live-buffer footprint — dispatched at
increasing runtime targets until the worker dies, with bench.py's
wait+probe recovery between points.

Axes:
  * runtime: n=2048, b=1 (32 MB live), targets 2..300+ s
  * memory x runtime: b chosen for multi-GB live buffers at a few targets

Usage (real TPU):
    python benchmarks/crash_envelope.py [--max-target 300]

Each crash costs ~2-5 min of worker restart; the full sweep is ~30-60
min.  Results land in docs/performance.md and set the default dispatch
budget for auto-chunked device loops (optimize_jax.lbfgs_minimize_guarded
auto_budget, nuts_sampler(chunk=)).
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

_BACKEND_DEATH = ("FAILED_PRECONDITION", "UNAVAILABLE", "Unavailable",
                  "DEADLINE_EXCEEDED", "Socket closed", "backend error",
                  "INTERNAL")


def _probe(timeout_s=420.0):
    import jax.numpy as jnp

    t0 = time.perf_counter()
    attempt = 0
    while time.perf_counter() - t0 < timeout_s:
        try:
            x = jnp.full((128, 128), 1.0 + attempt)
            np.asarray(jnp.sum(x @ x))
            return True
        except Exception:
            attempt += 1
            time.sleep(20.0)
    return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-target", type=float, default=300.0)
    ap.add_argument("--n", type=int, default=2048)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    print(f"backend={jax.default_backend()}", flush=True)
    n = args.n

    def make_prog(b, length):
        @jax.jit
        def prog(x):
            def body(c, _):
                c = jnp.matmul(c, x) / np.float32(n)
                return c, ()

            c, _ = lax.scan(body, x, None, length=length)
            return jnp.sum(c)

        return prog

    def run_point(b, length, tag):
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((b, n, n))
            .astype(np.float32) if b > 1 else
            np.random.default_rng(0).standard_normal((n, n))
            .astype(np.float32))
        prog = make_prog(b, length)
        t0 = time.perf_counter()
        try:
            r = prog(x)
            np.asarray(r)  # force device->host sync (tunnel no-op rule)
            wall = time.perf_counter() - t0
            print(f"OK    {tag}: L={length} wall={wall:.1f}s", flush=True)
            return True, wall
        except Exception as e:
            wall = time.perf_counter() - t0
            msg = f"{type(e).__name__}: {e}"
            died = any(s in msg for s in _BACKEND_DEATH)
            print(f"{'CRASH' if died else 'ERR  '} {tag}: L={length} "
                  f"wall={wall:.1f}s {msg[:160]}", flush=True)
            if died:
                print("      waiting out worker restart...", flush=True)
                time.sleep(150.0)
                ok = _probe()
                print(f"      probe: {'alive' if ok else 'STILL DOWN'}",
                      flush=True)
            return False, wall

    # calibrate per-iteration cost (small program)
    ok, wall = run_point(1, 200, "calib")
    if not ok:
        ok, wall = run_point(1, 200, "calib-retry")
        if not ok:
            print("cannot calibrate; backend unhealthy", flush=True)
            return
    per_iter = wall / 200
    print(f"per-iter {per_iter*1e3:.2f} ms "
          f"({2*n**3*1e-12/per_iter:.1f} TFLOP/s)", flush=True)

    # ---- runtime axis at minimal memory ------------------------------------
    target = 2.0
    while target <= args.max_target:
        length = max(1, int(target / per_iter))
        ok, _ = run_point(1, length, f"runtime target={target:.0f}s")
        if not ok:
            # confirm reproducibility once before moving on
            run_point(1, length, f"runtime target={target:.0f}s confirm")
        target *= 2

    # ---- memory x runtime: ~4 GB live at a few targets ---------------------
    b = max(1, int(4e9 / (2 * n * n * 4)))  # x + carry live
    for target in (5.0, 20.0, 80.0):
        length = max(1, int(target / (per_iter * b)))
        ok, _ = run_point(b, length,
                          f"mem4GB target={target:.0f}s (b={b})")
        if not ok:
            run_point(b, length, f"mem4GB target={target:.0f}s confirm")

    print("sweep complete", flush=True)


if __name__ == "__main__":
    main()
