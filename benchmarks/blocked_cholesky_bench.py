"""Real-TPU benchmark: blocked_cholesky vs XLA's monolithic cholesky.

VERDICT round-1 weak item 2: forward chol is 81.9ms of the 252.6ms 16k
NLL+grad at 17.9 TF/s vs the 30 TF/s f32 syrk ceiling; a syrk-rich blocked
factorization was never tried.  Timing discipline per CLAUDE.md: forced
device->host sync, best-of-repeat in one process, back-to-back variants.
"""
import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np
import jax, jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)
from g3py_tpu.ops.linalg import blocked_cholesky

rng = np.random.default_rng(0)


def sync(r):
    np.asarray(jnp.sum(r))


def timeit(fn, *a, repeat=10, warmup=2):
    for _ in range(warmup):
        r = fn(*a)
    sync(r)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(repeat):
            r = fn(*a)
        sync(r)
        best = min(best, (time.perf_counter() - t0) / repeat)
    return best


for n in (4096, 16384):
    m = rng.standard_normal((n, n)).astype(np.float32)
    A = jnp.asarray(m @ m.T + n * np.eye(n, dtype=np.float32))
    sync(A)
    flops = n ** 3 / 3
    rep = 10 if n == 4096 else 3

    xla = jax.jit(jnp.linalg.cholesky)
    t = timeit(xla, A, repeat=rep)
    print(f"n={n} xla: {t*1e3:.1f}ms {flops/t/1e12:.1f}TF/s", flush=True)
    l_ref = np.asarray(xla(A))

    blocks = (512, 1024) if n == 4096 else (1024, 2048)
    for b in blocks:
        fn = jax.jit(lambda a, _b=b: blocked_cholesky(a, block=_b))
        tc0 = time.perf_counter()
        l_b = fn(A)
        sync(l_b)
        t_compile = time.perf_counter() - tc0
        err = np.max(np.abs(np.asarray(l_b) - l_ref)) / np.max(np.abs(l_ref))
        t = timeit(fn, A, repeat=rep)
        print(f"n={n} blocked b={b}: {t*1e3:.1f}ms {flops/t/1e12:.1f}TF/s "
              f"(compile+first {t_compile:.1f}s, relerr {err:.2e})",
              flush=True)
