"""Heteroscedastic SVGP at N=100k on one chip: two latent heads, fully
analytic ELBO — per-step cost is the same O(|B| m^2) class as the
conjugate family (the heads add one batched m x m matmul pair)."""
import sys
import time

sys.path.insert(0, '/root/repo')
import numpy as np
import jax

print("backend:", jax.default_backend(), flush=True)
import g3py_tpu as g3

rng = np.random.default_rng(0)
n, d, m = 100_000, 8, 256
x = rng.standard_normal((n, d)).astype(np.float32)
f = np.sin(x[:, 0]) + 0.5 * np.cos(x[:, 1])
sd = 0.05 + 0.45 * (x[:, 2] > 0)            # noise step in dim 2
y = (f + sd * rng.standard_normal(n)).astype(np.float32)

z0 = x[:: n // m][:m]
het = g3.HeteroscedasticSVP(space=x[:4], location=g3.Bias(),
                            kernel=g3.SE(x), inducing=z0, name="HET100k")
het.observed(x, y)

steps, bs = 3000, 2048
t0 = time.perf_counter()
params, losses = het.fit_svgp(batch_size=bs, steps=steps, lr=2e-2, key=0,
                              display=False)
t_train = time.perf_counter() - t0
print(f"train: {steps} Adam steps at batch {bs} (m={m}, 2 heads) in "
      f"{t_train:.1f}s ({t_train/steps*1e3:.1f} ms/step incl compile), "
      f"-elbo {losses[0]:.0f} -> {losses[-1]:.0f}", flush=True)

sub = slice(0, 20000)
mu = np.asarray(het.mean(params, x[sub]))
nf = het.noise_field(params, x[sub])
rmse = float(np.sqrt(np.mean((mu - f[sub]) ** 2)))
lo = float(nf[x[sub][:, 2] < -0.5].mean())
hi = float(nf[x[sub][:, 2] > 0.5].mean())
print(f"mean rmse vs truth {rmse:.3f}; noise field "
      f"{lo:.4f}/{hi:.4f} (true {0.05**2:.4f}/{0.5**2:.4f})", flush=True)
