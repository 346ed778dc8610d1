"""Non-Gaussian observations at millions of rows on one chip:
NonGaussianSSGP (Laplace by iterated parallel Kalman smoothing).

Poisson counts on a MAT32 latent — the exact-prior Laplace evidence
(models/ngssm.py, Nickisch/Solin/Grigorievskiy ICML 2018) costs
``ssm_laplace_iters`` log-depth smoother passes per evaluation, each
O(n).  The reference has no non-Gaussian observation models at all and
its exact-GP machinery is O(n^3); here the differentiated objective at
N=4M routes through the chunked block scans (every Newton pass AND the
evidence), keeping activation memory at O(ssm_chunk).

Gates chunked == plain on-chip before timing the big sizes.
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


def make_data(n, span):
    t = np.sort(rng.uniform(0, span, n)).astype(np.float32)
    f = (np.sin(2 * np.pi * t / 20.0)
         + 0.3 * np.sin(t / 3.0) + 0.5).astype(np.float32)
    y = rng.poisson(np.exp(f)).astype(np.float32)
    return t[:, None], y


def build(x, y, name):
    m = g3.NonGaussianSSGP(space=x[:4], kernel=g3.MAT32(x[:4]),
                           likelihood=g3.PoissonLik(), name=name)
    m.observed(x, y)
    return m


def nll_grad_fn(m):
    reg = m.active
    pure = m._logp_pure(prior=False)

    def vg(u, xj, yj):
        return jax.value_and_grad(
            lambda w: -pure(reg.array_to_dict_jax(w), xj, xj, yj,
                            jnp.zeros(0, dtype=w.dtype)))(u)

    return jax.jit(vg)


def sync(*xs):
    # block_until_ready is a no-op over the tunnel; force a transfer
    return [np.asarray(jnp.sum(jnp.asarray(v))) for v in xs]


# -- gate: chunked Laplace == plain, value AND grad, on this backend ---------
n_gate = 8192
x, y = make_data(n_gate, 400.0)
m = build(x, y, "G")
u = jnp.asarray(m.active.dict_to_array(m.params))
xj, yj = jnp.asarray(x), jnp.asarray(y)
vg = nll_grad_fn(m)
v_plain, g_plain = vg(u, xj, yj)
sync(v_plain, g_plain)
old = settings.ssm_chunk_threshold, settings.ssm_chunk
settings.ssm_chunk_threshold, settings.ssm_chunk = 1024, 2048
m2 = build(x, y, "G2")
vg2 = nll_grad_fn(m2)
u2 = jnp.asarray(m2.active.dict_to_array(m2.params))
v_c, g_c = vg2(u2, xj, yj)
sync(v_c, g_c)
settings.ssm_chunk_threshold, settings.ssm_chunk = old
rel_v = abs(float(v_c) - float(v_plain)) / abs(float(v_plain))
rel_g = float(np.max(np.abs(np.asarray(g_c) - np.asarray(g_plain)))
              / np.max(np.abs(np.asarray(g_plain))))
print(f"gate n={n_gate}: chunked-vs-plain rel_v={rel_v:.2e} "
      f"rel_g={rel_g:.2e}", flush=True)
assert rel_v < 1e-5 and rel_g < 1e-4

# -- timings (evidence + grad: one smoother pass per Newton iter) ------------
# Past 2^18 force the chunked route: the PLAIN differentiated Laplace
# program (15 checkpointed full-length scan passes) SIGKILLed the remote
# compile helper at 2^20 on this runtime — the chunked form compiles one
# block body and is the intended path at these sizes anyway.  Newton
# iters drop to 8 for the big sizes (log-concave Poisson converges in
# ~5; 15 iters at 2^20 made a multi-minute fused program, which is what
# crashes this tunnel's worker — see the fit_splits note in CLAUDE.md).
# Each size is try/except-guarded: one worker crash should not kill the
# later measurements (the worker recovers in ~2 min).
settings.ssm_chunk_threshold = 1 << 18
settings.ssm_laplace_iters = 8
for n in (1 << 18, 1 << 20, 1 << 22):
    try:
        x, y = make_data(n, 50.0 * n / 16384)
        m = build(x, y, f"B{n}")
        vg = nll_grad_fn(m)
        u = jnp.asarray(m.active.dict_to_array(m.params))
        xj, yj = jnp.asarray(x), jnp.asarray(y)
        t0 = time.time()
        v, g = vg(u, xj, yj)
        sync(v, g)
        t_cold = time.time() - t0
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            v, g = vg(u, xj, yj)
        sync(v, g)
        t_warm = (time.time() - t0) / reps
        path = "chunked" if n > settings.ssm_chunk_threshold else "plain"
        print(f"N={n}: Laplace NLL+grad cold {t_cold:.2f}s warm "
              f"{t_warm*1e3:.1f}ms ({path} path, iters=8) "
              f"nll={float(v):.1f} "
              f"grad_finite={bool(np.all(np.isfinite(np.asarray(g))))}",
              flush=True)
    except Exception as e:                          # noqa: BLE001
        print(f"N={n}: FAILED ({type(e).__name__}: {str(e)[:120]}) — "
              "waiting out the worker restart", flush=True)
        time.sleep(150)

# -- beyond-HBM smoothed serving at the biggest size -------------------------
n = 1 << 20
x, y = make_data(n, 50.0 * n / 16384)
m = build(x, y, "SV")
p = m.params
tq = np.linspace(1.0, 50.0 * n / 16384 - 1,
                 512).astype(np.float32)[:, None]
t0 = time.time()
rate = np.asarray(m.mean(p, space=tq))
t_cold = time.time() - t0
t0 = time.time()
rate = np.asarray(m.mean(p, space=tq))
t_warm = time.time() - t0
print(f"N={n}: 512-query predictive rate cold {t_cold:.1f}s warm "
      f"{t_warm:.2f}s finite={bool(np.all(np.isfinite(rate)))} "
      f"positive={bool(np.all(rate > 0))}", flush=True)
