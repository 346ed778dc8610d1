"""EXACT multi-output GP at millions of events on one chip: MultiStateSpaceGP.

Two channels sampled at different irregular times, mixed from two latent
Markovian GPs (MAT32 + OU), per-channel noise — the exact LMC the
reference could only express as a dense ICM index-kernel at
O((sum n_p)^3) (reference kernels.py:262-290).  Here the joint NLL+grad
is linear in total event count and runs as per-row-emission Kalman
scans; past settings.ssm_chunk_threshold rows it routes through the
chunked monoid scan (ops/ssm.chunked_kalman_nll rows=...), whose
activation memory is O(chunk), so the differentiated objective scales
past one chip's HBM exactly as the single-output family does.

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


def make_data(n_total, span):
    """Two channels, ~60/40 split, different irregular times."""
    n0 = int(0.6 * n_total)
    n1 = n_total - n0
    t0 = np.sort(rng.uniform(0, span, n0)).astype(np.float32)
    t1 = np.sort(rng.uniform(0, span, n1)).astype(np.float32)
    f = lambda t: (np.sin(2 * np.pi * t / 20.0)
                   + 0.3 * np.sin(t / 3.0)).astype(np.float32)
    y0 = f(t0) + 0.2 * rng.standard_normal(n0).astype(np.float32)
    y1 = (-0.8 * f(t1) + 0.5
          + 0.3 * rng.standard_normal(n1).astype(np.float32))
    return g3.stack_outputs([t0[:, None], t1[:, None]], [y0, y1])


def build(x, y, name):
    t = x[:, :1]
    m = g3.MultiStateSpaceGP(space=x[:4],
                             kernel=[g3.MAT32(t[:4]), g3.OU(t[:4])],
                             outputs_dim=2, name=name)
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


# -- gate: chunked rows path == plain, value AND grad, on this backend ------
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

# -- timings -----------------------------------------------------------------
for n in (1 << 20, 1 << 21, 1 << 22):
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
    print(f"N={n}: NLL+grad cold {t_cold:.2f}s warm {t_warm*1e3:.1f}ms "
          f"({path} path) nll={float(v):.1f} grad_finite="
          f"{bool(np.all(np.isfinite(np.asarray(g))))}", flush=True)

# -- beyond-HBM smoothed serving at the biggest size -------------------------
n = 1 << 22
x, y = make_data(n, 50.0 * n / 16384)
m = build(x, y, "SV")
p = m.params
tq = np.linspace(1.0, 50.0 * n / 16384 - 1, 256).astype(np.float32)
xq = np.concatenate([g3.with_output(tq[:, None], 0),
                     g3.with_output(tq[:, None], 1)])
t0 = time.time()
mean = np.asarray(m.mean(p, space=xq))
t_cold = time.time() - t0
t0 = time.time()
mean = np.asarray(m.mean(p, space=xq))
t_warm = time.time() - t0
print(f"N={n}: 512-query smoothed posterior mean cold {t_cold:.1f}s "
      f"warm {t_warm*1e3:.0f}ms finite={bool(np.all(np.isfinite(mean)))}",
      flush=True)
print("done", flush=True)
