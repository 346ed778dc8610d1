"""Softmax GP classification at scale on one chip: N=100k rows, C=10
classes, m=256 shared inducing points.

Per-step cost is O(|B| m^2 + |B| m C): the C-class work is batched
matmuls over the heads axis on top of ONE shared Kuu Cholesky and ONE
cross-solve.  The reference has no classification of any kind at any
size; the closest modern CPU baselines run this workload in hours.
"""
import sys
import time

sys.path.insert(0, '/root/repo')
import numpy as np
import jax

print("backend:", jax.default_backend(), flush=True)
import g3py_tpu as g3

rng = np.random.default_rng(0)
n, d, C, m = 100_000, 8, 10, 256
x = rng.standard_normal((n, d)).astype(np.float32)
# smooth ground-truth class scores: random low-frequency feature mix
# frequency scaled so the latents are resolvable by m inducing points
# in 8-D (|w| ~ 0.5 => lengthscale ~ 2)
w1 = (0.5 * rng.standard_normal((d, C))).astype(np.float32)
w2 = (0.5 * rng.standard_normal((d, C))).astype(np.float32)
scores = np.sin(x @ w1) + 0.5 * np.cos(x @ (0.7 * w2))
y = np.argmax(scores + 0.3 * rng.standard_normal(scores.shape),
              axis=1).astype(np.float32)

z0 = x[:: n // m][:m]
svc = g3.MulticlassSVP(space=x[:4], kernel=g3.SE(x), classes=C,
                       inducing=z0, name="MC100k")
svc.observed(x, y)

steps, bs = 3000, 2048
t0 = time.perf_counter()
params, losses = svc.fit_svgp(batch_size=bs, steps=steps, lr=3e-2, key=0,
                              display=False)
t_train = time.perf_counter() - t0
print(f"train: {steps} Adam steps at batch {bs} (C={C}, m={m}) in "
      f"{t_train:.1f}s ({t_train/steps*1e3:.1f} ms/step incl compile), "
      f"-elbo {losses[0]:.0f} -> {losses[-1]:.0f}", flush=True)

t0 = time.perf_counter()
pred = svc.predict_class(params, space=x[:20000])
t_pred = time.perf_counter() - t0
acc = float(np.mean(pred == y[:20000]))
bayes = float(np.mean(np.argmax(scores[:20000], 1) == y[:20000]))
print(f"accuracy on 20k rows: {acc:.3f} (noise-ceiling {bayes:.3f}) "
      f"[{t_pred:.1f}s incl compile]", flush=True)
