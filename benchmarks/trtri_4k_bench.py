"""A/B trtri + lauum variants at n=4096 (and optionally 16384) on real TPU.

The 4k NLL+grad spends ~9 of its 11.2 ms in blocked_trtri (4.45 ms) +
blocked_lauum (4.58 ms) — both far below the 19.4 TF/s the same tiles hit
at 16k, because nb^3/6 dependency-chained small matmuls pay per-op
overhead.  Candidates:

  * recursive_trtri — level-batched pair-combining (~7 XLA ops)
  * blocked_lauum_panel at 4k (only ever measured at 16k)

Measurement discipline (CLAUDE.md): each variant timed inside ONE jit,
best-of-3 x repeats, host-transfer sync, all in one process back-to-back.
"""
import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)
from g3py_tpu.ops.linalg import (blocked_trtri, recursive_trtri,
                                 blocked_lauum, blocked_lauum_panel)

rng = np.random.default_rng(0)


def timeit(fn, x, repeat=30, best_of=3):
    r = fn(x)
    np.asarray(jnp.sum(r))
    times = []
    for _ in range(best_of):
        t0 = time.perf_counter()
        for _ in range(repeat):
            r = fn(x)
        np.asarray(jnp.sum(r))
        times.append((time.perf_counter() - t0) / repeat)
    return min(times)


sizes = [4096]
if "--16k" in sys.argv:
    sizes.append(16384)

for n in sizes:
    a = rng.standard_normal((n, n)).astype(np.float32)
    k = (a @ a.T / n + np.eye(n)).astype(np.float32)
    l = np.linalg.cholesky(k)
    lj = jnp.asarray(l)
    tf = n ** 3 / 3 / 1e12
    rep = 30 if n == 4096 else 3

    variants = {
        "blocked_trtri(512)": jax.jit(lambda x: blocked_trtri(x, block=512)),
        "blocked_trtri(1024)": jax.jit(lambda x: blocked_trtri(x, block=1024)),
        "recursive_trtri(256)": jax.jit(lambda x: recursive_trtri(x, base=256)),
        "recursive_trtri(512)": jax.jit(lambda x: recursive_trtri(x, base=512)),
        "recursive_trtri(1024)": jax.jit(lambda x: recursive_trtri(x, base=1024)),
    }
    ref = None
    for name, fn in variants.items():
        t = timeit(fn, lj, repeat=rep)
        out = np.asarray(fn(lj))
        if ref is None:
            ref = out
        err = np.abs(out - ref).max() / np.abs(ref).max()
        print(f"n={n} {name}: {t*1e3:.2f}ms ({tf/t:.1f} TF/s) relerr={err:.1e}",
              flush=True)

    linv = jnp.asarray(ref)
    lau = {
        "blocked_lauum(1024)": jax.jit(lambda x: blocked_lauum(x, block=1024)),
        "blocked_lauum(2048)": jax.jit(lambda x: blocked_lauum(x, block=2048)),
        "lauum_panel(512)": jax.jit(lambda x: blocked_lauum_panel(x, block=512)),
        "lauum_panel(1024)": jax.jit(lambda x: blocked_lauum_panel(x, block=1024)),
        "lauum_panel(2048)": jax.jit(lambda x: blocked_lauum_panel(x, block=2048)),
        "dense W'W": jax.jit(lambda x: jnp.matmul(
            x.T, x, precision=jax.lax.Precision.HIGHEST)),
    }
    ref2 = None
    for name, fn in lau.items():
        t = timeit(fn, linv, repeat=rep)
        out = np.asarray(fn(linv))
        if ref2 is None:
            ref2 = out
        err = np.abs(out - ref2).max() / np.abs(ref2).max()
        print(f"n={n} {name}: {t*1e3:.2f}ms ({tf/t:.1f} TF/s) relerr={err:.1e}",
              flush=True)
