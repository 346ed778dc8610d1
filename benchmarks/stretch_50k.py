"""N=50k multi-output stretch config: matrix-free preconditioned GP NLL on
one chip (BASELINE.md stretch row). Prints stage timings."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from jax import lax, random

import g3py_tpu as g3
from g3py_tpu.hypers.kernels import SE, KernelDot
from g3py_tpu.hypers.metrics import Delta
from g3py_tpu.ops import iterative as it

def sync(r):
    for x in jax.tree_util.tree_leaves(r):
        if hasattr(x, "dtype"):
            np.asarray(jnp.sum(x))

def main(n_points=25000, outputs=2, rank=80, cg_iters=100, probes=8,
         lanczos_iters=25):
    n = n_points * outputs
    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(0, 100, n_points)).astype(np.float32)
    x = np.stack([np.tile(t, outputs),
                  np.repeat(np.arange(outputs, dtype=np.float32), n_points)],
                 axis=1)
    y = (np.sin(0.3 * x[:, 0]) * (1 + 0.3 * x[:, 1])
         + 0.1 * rng.standard_normal(n)).astype(np.float32)

    # intrinsic-coregionalization form: K = K_t(time) x (1 + c delta(output))
    se = SE([0])                                # SE over the time column
    coreg = KernelDot([1], metric=Delta, name="Coreg")  # output equality
    k = se + se * coreg
    k.check_dims(x)
    k.check_hypers("ST_")
    params = {p.name: jnp.asarray(p.testval()) for p in k.hypers}
    noise = np.float32(0.05)
    xj, yj = jnp.asarray(x), jnp.asarray(y)

    # stage timings
    t0 = time.perf_counter()
    mv = jax.jit(lambda v: it.lazy_kernel_matvec(k, params, xj, v, block=2048)
                 + noise * v)
    v0 = mv(yj); sync(v0)
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(5):
        v0 = mv(yj)
    sync(v0)
    t_mv = (time.perf_counter() - t0) / 5
    print(f"n={n} matvec={t_mv*1e3:.0f}ms (compile {t_compile:.0f}s)", flush=True)

    t0 = time.perf_counter()
    nll, info = it.preconditioned_gp_nll(
        k, params, xj, yj, noise_var=noise, rank=rank, block=2048,
        cg_iters=cg_iters, probes=probes, lanczos_iters=lanczos_iters)
    nll = float(nll)
    t_first = time.perf_counter() - t0
    print(f"first eval (incl compiles): {t_first:.0f}s nll={nll:.1f} "
          f"cg_resid={float(info['cg_rel_residual']):.2e}", flush=True)

    # trainable path: one NLL+grad step through the stochastic-trace VJP
    t0 = time.perf_counter()
    val, grads = jax.value_and_grad(
        lambda p: it.preconditioned_gp_nll(
            k, p, xj, yj, noise_var=noise, rank=rank, block=2048,
            cg_iters=cg_iters, probes=probes,
            lanczos_iters=lanczos_iters)[0])(params)
    val = float(val); sync(grads)
    print(f"first NLL+grad (incl compiles): {time.perf_counter()-t0:.0f}s "
          f"nll={val:.1f}", flush=True)
    t0 = time.perf_counter()
    val, grads = jax.value_and_grad(
        lambda p: it.preconditioned_gp_nll(
            k, p, xj, yj, noise_var=noise, rank=rank, block=2048,
            cg_iters=cg_iters, probes=probes,
            lanczos_iters=lanczos_iters)[0])(params)
    val = float(val); sync(grads)
    print(f"steady NLL+grad: {time.perf_counter()-t0:.1f}s", flush=True)

    for tag, nv in [("steady eval", noise), ("steady eval 2", noise * 1.01)]:
        t0 = time.perf_counter()
        nll2, info2 = it.preconditioned_gp_nll(
            k, params, xj, yj, noise_var=jnp.float32(nv), rank=rank,
            block=2048, cg_iters=cg_iters, probes=probes,
            lanczos_iters=lanczos_iters)
        nll2 = float(nll2)  # force completion before stopping the clock
        print(f"{tag}: {time.perf_counter()-t0:.1f}s nll={nll2:.1f}",
              flush=True)

if __name__ == "__main__":
    main()


def train_demo(n_points=25000, outputs=2, iters=4):
    """A few L-BFGS steps of model-level matrix-free MAP at N=50k."""
    import g3py_tpu as g3
    from g3py_tpu.hypers.kernels import KernelDot
    from g3py_tpu.hypers.metrics import Delta

    n = n_points * outputs
    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(0, 100, n_points)).astype(np.float32)
    x = np.stack([np.tile(t, outputs),
                  np.repeat(np.arange(outputs, dtype=np.float32), n_points)],
                 axis=1)
    y = (np.sin(0.3 * x[:, 0]) * (1 + 0.3 * x[:, 1])
         + 0.1 * rng.standard_normal(n)).astype(np.float32)

    se = g3.SE([0])
    coreg = KernelDot([1], metric=Delta, name="Coreg")
    gp = g3.GP(space=x[:8], location=g3.Bias(), kernel=se + se * coreg,
               name="ST50")
    gp.observed(x, y)

    # the reference's data-driven lengthscale default (0.5/mean spacing)
    # degenerates at dense sampling (rate ~ 100 here); start from a
    # data-curvature-scale lengthscale instead
    start = dict(gp.params_default)
    start[f"{gp.name}_SE_rate"] = np.asarray([0.3], np.float32)
    nll0 = float(gp.nll_iterative(start, rank=80, cg_iters=100,
                                  probes=8)[0])
    t0 = time.perf_counter()
    params = gp.find_MAP(start=start, points=1, engine="iterative",
                         display=True, max_iters=iters, rank=80,
                         cg_iters=100, probes=8)
    t_train = time.perf_counter() - t0
    nll1 = float(gp.nll_iterative(params, rank=80, cg_iters=100,
                                  probes=8)[0])
    print(f"TRAIN n={n}: nll {nll0:.1f} -> {nll1:.1f} in {t_train:.0f}s "
          f"({iters} L-BFGS iters)", flush=True)
