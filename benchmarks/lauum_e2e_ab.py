"""In-context A/B: lauum tile vs panel inside the full 4k NLL+grad.

Standalone, lauum_panel(512) measured 2.64 ms vs blocked_lauum(1024)
2.92 ms at n=4096 (trtri_4k_bench.py).  Standalone wins have reversed in
context before (blocked_cholesky, docs/performance.md), so this drives the
whole jitted NLL+grad with each backward-lauum variant A/B/A/B in one
process, swapping the variant by monkeypatching the panel entry point the
_mvn_bwd per-size policy dispatches at n=4096.

RESULT (v5e, 2026-08-17, one process): panel 8.22/8.25 ms vs tile
8.57/8.59 ms — panel adopted for n <= 4096 in ops/linalg.py _mvn_bwd.
"""
import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)
import g3py_tpu as g3
from g3py_tpu.ops import linalg as _linalg

rng = np.random.default_rng(0)
n, d = 4096, 8
x = rng.standard_normal((n, d)).astype(np.float32)
y = (np.sin(x[:, 0]) + 0.1 * rng.standard_normal(n)).astype(np.float32)
gp = g3.GP(space=x[:4], location=g3.Bias(), kernel=g3.SE(x), name="ABGP")
gp.observed(x, y)
reg = gp.active
pure = gp._logp_pure(prior=False)
u0 = jnp.asarray(reg.dict_to_array(gp.params_default))
xj, yj = jnp.asarray(x), jnp.asarray(y)


_panel_orig = _linalg.blocked_lauum_panel


def build(panel):
    # _mvn_bwd calls blocked_lauum_panel at n<=4096; route it to the tile
    # form for the "tile" variant
    _linalg.blocked_lauum_panel = (
        _panel_orig if panel
        else (lambda w, block: _linalg.blocked_lauum(w, block=1024)))

    @jax.jit
    def nll_grad(u):
        def nll(uu):
            return -pure(reg.array_to_dict_jax(uu), xj, xj, yj,
                         jnp.zeros(0, dtype=uu.dtype))
        return jax.value_and_grad(nll)(u)

    # force the trace NOW, while settings.lauum_panel holds this variant's
    # value (the flag is read at trace time)
    v, g_ = nll_grad(u0)
    np.asarray(jnp.sum(g_) + v)
    return nll_grad


def timeit(fn, repeat=40, best_of=3):
    v, g_ = fn(u0)
    np.asarray(jnp.sum(g_) + v)
    times = []
    for _ in range(best_of):
        t0 = time.perf_counter()
        for _ in range(repeat):
            v, g_ = fn(u0)
        np.asarray(jnp.sum(g_) + v)
        times.append((time.perf_counter() - t0) / repeat)
    return min(times)


f_tile = build(False)
f_panel = build(True)
for name, fn in (("tile", f_tile), ("panel", f_panel),
                 ("tile2", f_tile), ("panel2", f_panel)):
    t = timeit(fn)
    print(f"nll+grad n=4096 lauum={name}: {t*1e3:.2f}ms "
          f"({1/t:.1f} evals/s)", flush=True)
