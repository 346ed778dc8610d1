"""EXACT GP on Cartesian grids: GridGP Kronecker inference on one chip.

The Kronecker path (ops/kron.py, models/grid.py) computes the EXACT
marginal likelihood of a separable-kernel GP on a full grid in
O(sum n_i^3) eigendecompositions + O(N sum n_i) tensor contractions —
at 256 x 256 (N = 65,536) the dense gram would be 17 GB and the
Cholesky ~9.4e13 FLOP (seconds-to-minutes at the measured ~18-30 TF/s,
memory-infeasible on one chip); the Kronecker NLL+grad is milliseconds.

Gate: NLL matches the dense np.kron oracle on a small grid before the
big sizes are timed (same discipline as benchmarks/ssgp_1m.py).
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


def make_grid(n_t, n_x, n_z=None):
    axes = [np.linspace(0, 8, n_t).astype(np.float32),
            np.linspace(-2, 2, n_x).astype(np.float32)]
    if n_z is not None:
        axes.append(np.linspace(0, 4, n_z).astype(np.float32))
    rows = g3.grid_rows(axes)
    f = np.sin(rows[:, 0]) * np.exp(-0.5 * rows[:, 1] ** 2)
    if n_z is not None:
        f = f * np.cos(0.7 * rows[:, 2])
    y = (f + 0.1 * rng.standard_normal(rows.shape[0])).astype(np.float32)
    return axes, rows, y


def kernels_for(axes):
    ks = [g3.MAT52(axes[0].reshape(-1, 1)),
          g3.SE(axes[1].reshape(-1, 1))]
    if len(axes) == 3:
        ks.append(g3.MAT32(axes[2].reshape(-1, 1)))
    return ks


def nll_grad_fn(gp):
    reg = gp.active
    pure = gp._logp_pure(prior=False)

    def vg(u, xj, yj):
        return jax.value_and_grad(
            lambda w: -pure(reg.array_to_dict_jax(w), xj, xj, yj,
                            jnp.zeros(0, dtype=w.dtype)))(u)

    return jax.jit(vg)


# -- correctness gate: Kronecker == dense oracle at 24 x 16 -------------------
axes, rows, y = make_grid(24, 16)
gp = g3.GridGP(axes=axes, kernel=kernels_for(axes), name="G")
gp.observed(rows, y)
pj = {k: jnp.asarray(v) for k, v in gp.params.items()}
k1 = np.asarray(gp.f_kernels[0].cov(pj, jnp.asarray(axes[0][:, None])),
                np.float64)
k2 = np.asarray(gp.f_kernels[1].cov(pj, jnp.asarray(axes[1][:, None])),
                np.float64)
s2 = float(np.asarray(gp._noise_var(pj)))
big = np.kron(k1, k2) + s2 * np.eye(len(y))
sign, logdet = np.linalg.slogdet(big)
ll_dense = -0.5 * (logdet + y @ np.linalg.solve(big, y.astype(np.float64))
                   + len(y) * np.log(2 * np.pi))
ll = float(gp.loglike(gp.params))
print(f"gate 24x16: kron {ll:.3f} dense {ll_dense:.3f} "
      f"rel {abs(ll - ll_dense) / abs(ll_dense):.2e}", flush=True)
assert abs(ll - ll_dense) / abs(ll_dense) < 1e-4

# -- exact NLL+grad timing at grid sizes the dense path cannot touch ----------
for shape in [(256, 256), (512, 512), (128, 128, 64)]:
    axes, rows, y = make_grid(*shape)
    n = rows.shape[0]
    gp = g3.GridGP(axes=axes, kernel=kernels_for(axes), name="G")
    gp.observed(rows, y)
    reg = gp.active
    u = jnp.asarray(reg.dict_to_array(gp.params))
    xj, yj = jnp.asarray(rows), jnp.asarray(y)
    vg = nll_grad_fn(gp)
    t0 = time.perf_counter()
    v, g = vg(u, xj, yj)
    np.asarray(jnp.sum(g) + v)                      # force transfer
    t_cold = time.perf_counter() - t0
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        v, g = vg(u, xj, yj)
    np.asarray(jnp.sum(g) + v)
    t_eval = (time.perf_counter() - t0) / reps
    print(f"grid {'x'.join(map(str, shape))} (N={n}): exact NLL+grad "
          f"{t_eval * 1e3:.1f} ms/eval (cold {t_cold:.1f}s, "
          f"nll {float(v):.0f})", flush=True)

# -- trainability + serving at 256 x 256 --------------------------------------
axes, rows, y = make_grid(256, 256)
gp = g3.GridGP(axes=axes, kernel=kernels_for(axes), name="G")
gp.observed(rows, y)
t0 = time.perf_counter()
params = gp.find_MAP(points=1, display=False, powell=False, max_iters=40)
t_fit = time.perf_counter() - t0
print(f"256x256 find_MAP (<=40 L-BFGS iters): {t_fit:.1f}s, "
      f"logp {float(gp.logp(params)):.0f} "
      f"(start {float(gp.logp(gp.params_default)):.0f})", flush=True)

xq = np.stack([np.linspace(0.3, 7.7, 512),
               0.6 * np.sin(np.linspace(0, 6, 512))],
              axis=1).astype(np.float32)
t0 = time.perf_counter()
m = np.asarray(gp.mean(params, xq))
t_cold = time.perf_counter() - t0
t0 = time.perf_counter()
m = np.asarray(gp.mean(params, xq))
t_warm = time.perf_counter() - t0
truth = np.sin(xq[:, 0]) * np.exp(-0.5 * xq[:, 1] ** 2)
print(f"256x256 posterior mean at 512 off-grid queries: cold {t_cold:.1f}s "
      f"warm {t_warm * 1e3:.1f}ms, rmse {np.sqrt(np.mean((m - truth) ** 2)):.4f}",
      flush=True)

# -- INCOMPLETE grid (masked-Kronecker matrix-free path) ----------------------
# 256 x 256 with 20% of cells missing: NLL+grad through masked_kron_nll
# (PCG + SLQ + BBMM trace gradient against the scatter->Kronecker->gather
# matvec).
axes, rows, y = make_grid(256, 256)
n = rows.shape[0]
keep = np.sort(rng.choice(n, int(0.8 * n), replace=False))
gp = g3.GridGP(axes=axes, kernel=kernels_for(axes), name="GM")
gp.observed(rows[keep], y[keep])
reg = gp.active
u = jnp.asarray(reg.dict_to_array(gp.params))
xj, yj = jnp.asarray(rows[keep]), jnp.asarray(y[keep])
vg = nll_grad_fn(gp)
t0 = time.perf_counter()
v, g = vg(u, xj, yj)
np.asarray(jnp.sum(g) + v)
t_cold = time.perf_counter() - t0
reps = 5
t0 = time.perf_counter()
for _ in range(reps):
    v, g = vg(u, xj, yj)
np.asarray(jnp.sum(g) + v)
t_eval = (time.perf_counter() - t0) / reps
print(f"masked 256x256 (80% observed, n_obs={len(keep)}): NLL+grad "
      f"{t_eval * 1e3:.1f} ms/eval (cold {t_cold:.1f}s, nll {float(v):.0f})",
      flush=True)
