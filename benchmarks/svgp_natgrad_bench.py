"""SVGP natural-gradient vs Adam on the real TPU: step cost and
convergence (steps and wall time to reach the collapsed-optimum ELBO
neighborhood) at N=100k, d=8, m=512.

The NGD path does one extra (batch, m^2) pieces pass per step (the
closed-form sufficient statistics), so its per-step cost is < 2x Adam's;
the question is how many FEWER steps it needs.  Convergence target: the
full-batch collapsed bound at the trained hypers, evaluated every run.
"""
import sys
import time

sys.path.insert(0, '/root/repo')
import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)
import g3py_tpu as g3

rng = np.random.default_rng(0)
n, d, m = 100_000, 8, 512
x = rng.standard_normal((n, d)).astype(np.float32)
y = (np.sin(x[:, 0]) + 0.1 * rng.standard_normal(n)).astype(np.float32)

sgp = g3.SGP(space=x[:4], location=g3.Bias(), kernel=g3.SE(x),
             inducing=m, name="NGB")
sgp.observed(x, y)

runs = [
    ("adam", dict(natgrad=None, lr=1e-2)),
    ("natgrad0.3", dict(natgrad=0.3, lr=1e-2)),
]
for steps in (200, 500, 1500):
    for label, kw in runs:
        t0 = time.perf_counter()
        params, losses = sgp.fit_svgp(batch_size=2048, steps=steps,
                                      key=0, display=False, **kw)
        wall = time.perf_counter() - t0
        elbo = float(sgp.loglike(params))
        print(f"{label:12s} steps={steps:5d}: wall={wall:7.2f}s "
              f"({wall/steps*1e3:6.1f} ms/step) "
              f"-elbo[last]={losses[-1]:10.1f} collapsed_elbo={elbo:12.1f}",
              flush=True)
