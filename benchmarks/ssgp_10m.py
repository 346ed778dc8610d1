"""Beyond-HBM exact GP training objective: TEN MILLION rows on one chip.

The plain parallel Kalman filter (ops/ssm.parallel_kalman_nll) OOMs when
DIFFERENTIATED at N=1e7 — reverse-mode through the associative scan
stores every scan level (~2x the element tensors plus residuals).  The
chunked monoid scan (ops/ssm.chunked_kalman_nll) caps activation memory
at O(settings.ssm_chunk): lax.scan over blocks, jax.checkpoint on the
block body, the running prefix element carried exactly (filter elements
form a monoid, so blocking changes nothing numerically).

This script gates chunked==plain at N=1e6 (both paths fit there), then
times the exact NLL+grad at N=4e6 and N=1e7 through the model API
(StateSpaceGP routes through chunked_kalman_nll above
settings.ssm_chunk_threshold — models/statespace.py).

Workload mirrors the reference's time-series tutorials (reference
data.py:11-118) scaled 5 orders of magnitude past what its dense-only
path (reference gaussian.py:88-118) could represent.
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
    t = np.sort(rng.uniform(0, span, n)).reshape(-1, 1).astype(np.float32)
    f = np.sin(2 * np.pi * t[:, 0] / 20.0) + 0.3 * np.sin(t[:, 0] / 3.0)
    y = (f + 0.2 * rng.standard_normal(n)).astype(np.float32)
    return t, y


def nll_grad_fn(ss):
    reg = ss.active
    pure = ss._logp_pure(prior=False)

    def vg(u, xj, yj):
        return jax.value_and_grad(
            lambda w: -pure(reg.array_to_dict_jax(w), xj, xj, yj,
                            jnp.zeros(0, dtype=w.dtype)))(u)

    return jax.jit(vg)


def timed_eval(ss, t, y, reps=5):
    reg = ss.active
    u = jnp.asarray(reg.dict_to_array(ss.params))
    xj, yj = jnp.asarray(t), jnp.asarray(y)
    vg = nll_grad_fn(ss)
    t0 = time.perf_counter()
    v, g = vg(u, xj, yj)
    np.asarray(jnp.sum(g) + v)
    t_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        v, g = vg(u, xj, yj)
    np.asarray(jnp.sum(g) + v)
    t_eval = (time.perf_counter() - t0) / reps
    return t_eval, t_cold, float(v)


# -- gate: chunked == plain at N=1e6 (both fit) ------------------------------
n = 1_000_000
t, y = make_data(n, n / 50.0)
ss = g3.StateSpaceGP(space=t[:4], kernel=g3.MAT32(t) + g3.OU(t), name="S")
ss.observed(t, y)
old_thr = settings.ssm_chunk_threshold
try:
    settings.ssm_chunk_threshold = 1 << 60          # force plain
    te_p, tc_p, v_p = timed_eval(ss, t, y)
    ss._compiles.clear() if hasattr(ss, "_compiles") else None
    settings.ssm_chunk_threshold = 1                # force chunked
    ss2 = g3.StateSpaceGP(space=t[:4], kernel=g3.MAT32(t) + g3.OU(t),
                          name="S")
    ss2.observed(t, y)
    te_c, tc_c, v_c = timed_eval(ss2, t, y)
finally:
    settings.ssm_chunk_threshold = old_thr
rel = abs(v_c - v_p) / abs(v_p)
print(f"gate N=1e6: plain {te_p*1e3:.1f} ms (nll {v_p:.0f}) | chunked "
      f"{te_c*1e3:.1f} ms (nll {v_c:.0f}) | rel {rel:.2e}", flush=True)
assert rel < 1e-4

# -- beyond-HBM sizes through the model API (auto-chunked) -------------------
for n in (4_000_000, 10_000_000):
    t, y = make_data(n, n / 50.0)
    ss = g3.StateSpaceGP(space=t[:4], kernel=g3.MAT32(t) + g3.OU(t),
                         name="S")
    ss.observed(t, y)
    te, tc, v = timed_eval(ss, t, y, reps=3)
    print(f"N={n}: exact NLL+grad {te*1e3:.1f} ms/eval "
          f"(cold {tc:.1f}s, nll {v:.0f}, chunk {settings.ssm_chunk})",
          flush=True)

# -- beyond-HBM SERVING: smoothed posterior at 512 query points over the
# full 1e7-row history (chunked two-pass smoother, ssm.chunked_smoother_diag)
tq = np.linspace(float(t[0, 0]), float(t[-1, 0]), 512).astype(np.float32)
pj = {k: jnp.asarray(v) for k, v in ss.params.items()}
sm = jax.jit(lambda p, q_, xi, yo: ss._run_smoother(p, q_, xi, yo))
xj, yj = jnp.asarray(t), jnp.asarray(y)
t0 = time.perf_counter()
m_q, v_q = sm(pj, jnp.asarray(tq), xj, yj)
np.asarray(jnp.sum(m_q) + jnp.sum(v_q))
t_cold = time.perf_counter() - t0
t0 = time.perf_counter()
m_q, v_q = sm(pj, jnp.asarray(tq), xj, yj)
np.asarray(jnp.sum(m_q) + jnp.sum(v_q))
t_warm = time.perf_counter() - t0
truth = np.sin(2 * np.pi * tq / 20.0) + 0.3 * np.sin(tq / 3.0)
rmse = float(np.sqrt(np.mean((np.asarray(m_q) - truth) ** 2)))
print(f"N={n} serving: 512-query smoothed posterior warm {t_warm*1e3:.1f} "
      f"ms (cold {t_cold:.1f}s), rmse vs truth {rmse:.4f}", flush=True)
assert np.all(np.isfinite(np.asarray(m_q))) and np.all(
    np.asarray(v_q) >= 0.0)
