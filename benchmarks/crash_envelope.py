"""Map the hosted TPU tunnel's big-fused-program worker-crash envelope
(VERDICT r4 item 3).

Seven+ measured crashes across rounds share one shape: a SINGLE fused
program with a long device-side runtime (monolithic NUTS d=7 trees, 50k
device-loop L-BFGS chunks, 1e6-row SKI backward, one 32-pair fit_splits
run) kills the tunnel worker, while many short dispatches of the same
total work run clean.  This script measures the boundary directly along
three axes:

  * runtime: a lax.scan of 2048x2048 matmuls; scan length L sets device
    runtime at minimal memory (~32 MB live).
  * memory x runtime: batched carries sized to ~4 GB live.
  * control flow x runtime: a data-dependent while_loop nested inside
    the scan body (the zoom-linesearch / NUTS-tree shape every real
    crashing program shares).

Architecture: every measurement point runs in its OWN subprocess with a
hard timeout — a crashed point cannot take the sweep down (the first
cut died exactly that way: the post-crash device_put of the next
point's operand raised outside its try), and a post-restart WEDGED
process (the known silent-0%-CPU mode, CLAUDE.md) is bounded by the
subprocess timeout.  Worker-health probes are bounded subprocesses too.

First measured bracket (2026-08-21, this sweep's fixed-calibration
predecessor): wall 33.4 s OK / 39.5 s OK / 72.2 s CRASH — the envelope
sits between ~40 and ~70 s of single-dispatch device runtime.

Usage (real TPU):
    python benchmarks/crash_envelope.py                 # full sweep
    python benchmarks/crash_envelope.py --point L,b,inner  # one point
"""

import argparse
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

_BACKEND_DEATH = ("FAILED_PRECONDITION", "UNAVAILABLE", "Unavailable",
                  "DEADLINE_EXCEEDED", "Socket closed", "backend error",
                  "INTERNAL", "crashed or restarted")

# per-iteration device cost measured on the clean points of the first
# sweep: (39.5-3.3)/4e5 ~ 0.091 ms for one 2048^3 matmul (~190 TF/s,
# bf16-class default precision); dispatch overhead ~3 s
PER_ITER = 0.091e-3
OVERHEAD = 3.3


def run_single_point(spec):
    """Run ONE measurement point in this process (subprocess entry)."""
    L, b, inner = (int(v) for v in spec.split(","))
    import jax
    import jax.numpy as jnp
    from jax import lax

    n = 2048

    @jax.jit
    def prog(x):
        def body(c, _):
            if inner:
                def cond(st):
                    k, cc = st
                    return (k < inner) & (jnp.sum(cc[..., 0, 0]) <
                                          np.float32(1e30))

                def step(st):
                    k, cc = st
                    return k + 1, jnp.matmul(cc, x) / np.float32(n)

                _, c2 = lax.while_loop(cond, step, (jnp.asarray(0), c))
            else:
                c2 = jnp.matmul(c, x) / np.float32(n)
            return c2, ()

        c, _ = lax.scan(body, x, None, length=L)
        return jnp.sum(c)

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (b, n, n) if b > 1 else (n, n)).astype(np.float32))
    t0 = time.perf_counter()
    r = prog(x)
    np.asarray(r)  # force device->host sync (tunnel no-op rule)
    print(f"POINT_OK wall={time.perf_counter() - t0:.1f}", flush=True)


def probe_subprocess(timeout_total=900.0):
    """Bounded worker-health probe: tiny matmul in a subprocess."""
    code = ("import numpy as np, jax.numpy as jnp; "
            "x = jnp.ones((128,128)); print(float(np.asarray(jnp.sum(x@x))))")
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < timeout_total:
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, text=True, timeout=240)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        time.sleep(30.0)
    return False


def run_point(L, b, inner, tag, timeout=600):
    t0 = time.perf_counter()
    try:
        r = subprocess.run(
            [sys.executable, __file__, "--point", f"{L},{b},{inner}"],
            capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        print(f"WEDGE {tag}: L={L} no result in {timeout}s", flush=True)
        return False
    wall = time.perf_counter() - t0
    out = r.stdout + r.stderr
    if r.returncode == 0 and "POINT_OK" in out:
        dev = out.split("POINT_OK wall=")[1].split()[0]
        print(f"OK    {tag}: L={L} wall={dev}s (proc {wall:.0f}s)",
              flush=True)
        return True
    died = any(s in out for s in _BACKEND_DEATH)
    last = out.strip().splitlines()[-1][:160] if out.strip() else "?"
    print(f"{'CRASH' if died else 'ERR  '} {tag}: L={L} rc={r.returncode} "
          f"proc_wall={wall:.0f}s {last}", flush=True)
    if died:
        print("      waiting out worker restart...", flush=True)
        time.sleep(150.0)
        ok = probe_subprocess()
        print(f"      probe: {'alive' if ok else 'STILL DOWN'}", flush=True)
    return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--point", default=None)
    args = ap.parse_args()
    if args.point:
        run_single_point(args.point)
        return

    def L_for(target, b=1, inner=0):
        work = max(1, b) * max(1, inner if inner else 1)
        return max(1, int(target / (PER_ITER * work)))

    b4g = max(1, int(4e9 / (2 * 2048 * 2048 * 4)))
    points = [
        # bisect the 40..70 s bracket, then confirm the crash side
        (L_for(50), 1, 0, "runtime target=50s"),
        (L_for(60), 1, 0, "runtime target=60s"),
        (L_for(70), 1, 0, "runtime target=70s confirm-crash"),
        # memory axis: ~4 GB live at clean-side runtimes
        (L_for(15, b=b4g), b4g, 0, f"mem4GB target=15s (b={b4g})"),
        (L_for(30, b=b4g), b4g, 0, f"mem4GB target=30s (b={b4g})"),
        # control-flow axis: while_loop-in-scan at clean-side runtimes
        (L_for(15, inner=8), 1, 8, "whileloop target=15s (inner=8)"),
        (L_for(30, inner=8), 1, 8, "whileloop target=30s (inner=8)"),
        # and one deliberately past the envelope with nested control flow
        (L_for(70, inner=8), 1, 8, "whileloop target=70s (inner=8)"),
    ]
    for L, b, inner, tag in points:
        run_point(L, b, inner, tag)
    print("sweep complete", flush=True)


if __name__ == "__main__":
    main()
