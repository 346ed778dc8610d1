"""Deep kernel learning on the real TPU.

Two workloads:

1. SV-DKL (Wilson et al. 2016b) at N=100k, d=16: a (128, 64, 4) tanh
   extractor feeding SE over 4-D features, m=256 inducing, minibatch
   Adam — the per-step cost adds two MXU matmul stacks (batch and
   inducing features) to the conjugate trainer's O(|B| m^2).
2. Exact-GP DKL NLL+gradient at n=4096: the representation's matmuls
   fused into the fused-MVN pipeline (compare the plain-SE 4k row,
   ~11 ms on this chip).

Timing discipline: warm best-of-3 with a forced device->host transfer
(the tunnel's block_until_ready is a no-op).
"""
import sys
import time

sys.path.insert(0, '/root/repo')
import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)
import g3py_tpu as g3
from g3py_tpu.config import settings

rng = np.random.default_rng(0)

# ---- 1. SV-DKL at 100k ------------------------------------------------
n, d = 100_000, 16
proj = rng.standard_normal((d, 2)).astype(np.float32) / np.sqrt(d)
x = rng.standard_normal((n, d)).astype(np.float32)
lat = x @ proj
f = np.sin(2.0 * lat[:, 0]) * np.cos(lat[:, 1])
y = (f + 0.1 * rng.standard_normal(n)).astype(np.float32)

dk = g3.DeepKernel(g3.SE, x, widths=(128, 64, 4))
z0 = x[:: n // 256][:256]
svp = g3.SVP(space=x[:4], location=g3.Bias(), kernel=dk,
             likelihood=g3.GaussianLik(), inducing=z0, name="DKB")
svp.observed(x, y)

for steps, bs in ((200, 2048), (2000, 2048)):
    t0 = time.perf_counter()
    params, losses = svp.fit_svgp(batch_size=bs, steps=steps, lr=3e-3,
                                  display=False)
    np.asarray(losses[-1])
    wall = time.perf_counter() - t0
    mu = np.asarray(svp.mean(params, x[:4096]))
    rmse = float(np.sqrt(np.mean((mu - f[:4096]) ** 2)))
    print(f"SV-DKL steps={steps:5d} batch={bs}: wall={wall:7.2f}s "
          f"({wall/steps*1e3:6.1f} ms/step incl compile) "
          f"-elbo {losses[0]:.0f} -> {losses[-1]:.0f}  rmse={rmse:.3f} "
          f"(signal std {np.std(f):.3f})", flush=True)

# ---- 2. exact DKL NLL+grad at 4096 --------------------------------------
n2 = 4096
x2 = x[:n2]
y2 = y[:n2]
dk2 = g3.DeepKernel(g3.SE, x2, widths=(128, 64, 4))
gp = g3.GP(space=x2[:4], location=g3.Bias(), kernel=dk2, noisy=True,
           name="DKE")
gp.observed(x2, y2)
reg = gp.active
p0 = gp.params_default
u0 = jnp.asarray(reg.sampling_params(p0), settings.dtype)
pure = gp._logp_pure(prior=False)
space, inputs, outputs = map(jnp.asarray, gp._resolve_data(None, None, None))
vec0 = jnp.zeros(0, settings.dtype)


@jax.jit
def nll_grad(u):
    val, g = jax.value_and_grad(
        lambda uu: -pure(reg.array_to_dict_jax(uu), space, inputs,
                         outputs, vec0))(u)
    return val, g


val, g = nll_grad(u0)
np.asarray(val)  # warm + force
best = np.inf
for _ in range(3):
    t0 = time.perf_counter()
    for _ in range(10):
        val, g = nll_grad(u0)
    np.asarray(val), np.asarray(jnp.sum(g))
    best = min(best, (time.perf_counter() - t0) / 10)
print(f"exact DKL NLL+grad n={n2} (width 128-64-4, {u0.size} params): "
      f"{best*1e3:.1f} ms/eval ({1.0/best:.1f} evals/s)", flush=True)
