"""SGPR collapsed-bound training cost at production scale on real TPU.

N=100k (2x the exact-path stretch config), d=8, m inducing: one jitted
ELBO+gradient evaluation — the L-BFGS step cost for sparse training.
Compare: the exact 16k NLL+grad is ~252 ms and N=50k matrix-free is
~8 s/NLL+grad (docs/performance.md); SGPR covers 100k in tens of ms.
"""
import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)
import g3py_tpu as g3

rng = np.random.default_rng(0)
n, d = 100_000, 8
x = rng.standard_normal((n, d)).astype(np.float32)
y = (np.sin(x[:, 0]) + 0.1 * rng.standard_normal(n)).astype(np.float32)

for m in (256, 512, 1024):
    sgp = g3.SGP(space=x[:4], location=g3.Bias(), kernel=g3.SE(x),
                 inducing=m, name=f"SB{m}")
    sgp.observed(x, y)
    reg = sgp.active
    pure = sgp._logp_pure(prior=False)
    u0 = jnp.asarray(reg.dict_to_array(sgp.params_default))
    xj, yj = jnp.asarray(x), jnp.asarray(y)

    @jax.jit
    def vg(u):
        def nll(uu):
            return -pure(reg.array_to_dict_jax(uu), xj, xj, yj,
                         jnp.zeros(0, dtype=uu.dtype))
        return jax.value_and_grad(nll)(u)

    v, g = vg(u0)
    np.asarray(jnp.sum(g) + v)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            v, g = vg(u0)
        np.asarray(jnp.sum(g) + v)
        times.append((time.perf_counter() - t0) / 10)
    t = min(times)
    print(f"SGPR n={n} m={m}: ELBO+grad {t*1e3:.1f}ms ({1/t:.1f} evals/s), "
          f"ndim={len(u0)}, elbo={-float(v):.1f}", flush=True)
