"""One MILLION training rows on one chip: SVGP minibatch training + the
collapsed SGPR predictor.

Step cost is O(|B| m^2) independent of n, and the raw data is only
n x (d+1) floats (36 MB at 1M x 8 f32) — so a million-row GP trains at
Adam speed on a single chip, and the one-time O(n m^2) collapsed
factorization serves exact-SGPR statistics afterwards.  The reference
could not touch this workload at any cost (its exact path is O(n^3) and
its only mitigation was subsampling).
"""
import sys
import time

sys.path.insert(0, '/root/repo')
import numpy as np
import jax

print("backend:", jax.default_backend(), flush=True)
import g3py_tpu as g3

rng = np.random.default_rng(0)
n, d, m = 1_000_000, 8, 512
x = rng.standard_normal((n, d)).astype(np.float32)
f = np.sin(x[:, 0]) + 0.5 * np.cos(x[:, 1])
y = (f + 0.1 * rng.standard_normal(n)).astype(np.float32)

z0 = x[:: n // m][:m]
sgp = g3.SGP(space=x[:4], location=g3.Bias(), kernel=g3.SE(x),
             inducing=z0, name="M1")
sgp.observed(x, y)

t0 = time.perf_counter()
params, losses = sgp.fit_svgp(batch_size=4096, steps=2000, lr=1e-2,
                              natgrad=0.3, key=0, display=False)
t_train = time.perf_counter() - t0
print(f"train: 2000 natgrad steps at batch 4096 in {t_train:.1f}s "
      f"({t_train/2000*1e3:.1f} ms/step incl compile), "
      f"-elbo {losses[0]:.0f} -> {losses[-1]:.0f}", flush=True)

# collapsed ELBO+grad at the trained hypers: the full-data O(n m^2) eval
import jax.numpy as jnp
reg = sgp.active
pure = sgp._logp_pure(prior=False)
u = jnp.asarray(reg.dict_to_array(params))
xj, yj = jnp.asarray(x), jnp.asarray(y)
vg = jax.jit(lambda uu: jax.value_and_grad(
    lambda w: -pure(reg.array_to_dict_jax(w), xj, xj, yj,
                    jnp.zeros(0, dtype=w.dtype)))(uu))
v, g = vg(u)
np.asarray(jnp.sum(g) + v)
t0 = time.perf_counter()
for _ in range(3):
    v, g = vg(u)
np.asarray(jnp.sum(g) + v)
t_eval = (time.perf_counter() - t0) / 3
print(f"collapsed ELBO+grad over ALL 1M rows: {t_eval*1e3:.0f} ms/eval "
      f"(elbo {-float(v):.0f})", flush=True)

# serve: one collapsed factorization, then streamed statistics
t0 = time.perf_counter()
pr = sgp.predictor(params)
xq = rng.standard_normal((256, d)).astype(np.float32)
out = pr(xq, quantiles=True)
t_first = time.perf_counter() - t0
t0 = time.perf_counter()
out = pr(rng.standard_normal((256, d)).astype(np.float32), quantiles=True)
t_warm = time.perf_counter() - t0
fq = np.sin(xq[:, 0]) + 0.5 * np.cos(xq[:, 1])
rmse = float(np.sqrt(np.mean((np.asarray(pr.mean(space=xq)) - fq) ** 2)))
print(f"serve: factor+first batch {t_first:.1f}s, warm 256-pt batch "
      f"{t_warm*1e3:.0f} ms, query rmse vs truth {rmse:.3f}", flush=True)
