"""Non-conjugate SVP on the real TPU: robust (Student-t) minibatch
training step rate at N=100k, d=8, m=256 — the quadrature ELBO's cost vs
the conjugate trainer's.
"""
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
f = np.sin(x[:, 0])
y = (f + 0.1 * rng.standard_normal(n)).astype(np.float32)
out = rng.choice(n, n // 20, replace=False)
y[out] += (8.0 * rng.standard_normal(len(out))).astype(np.float32)

z0 = x[:: n // m][:m]
svp = g3.SVP(space=x[:4], location=g3.Bias(), kernel=g3.SE(x),
             likelihood=g3.StudentTLik(), inducing=z0, name="SVPB")
svp.observed(x, y)

for steps, bs in ((200, 2048), (2000, 2048)):
    t0 = time.perf_counter()
    params, losses = svp.fit_svgp(batch_size=bs, steps=steps, lr=1e-2,
                                  display=False)
    wall = time.perf_counter() - t0
    mu = np.asarray(svp.mean(params, x[:4096]))
    rmse = float(np.sqrt(np.mean((mu - f[:4096]) ** 2)))
    print(f"steps={steps:5d} batch={bs}: wall={wall:7.2f}s "
          f"({wall/steps*1e3:6.1f} ms/step incl compile) "
          f"-elbo {losses[0]:.0f} -> {losses[-1]:.0f}  rmse={rmse:.3f}",
          flush=True)
