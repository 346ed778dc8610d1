"""SKI/KISS-GP at scale on the real chip: scattered rows, one TPU.

The point of structured kernel interpolation is the regime no other
exact-flavoured path touches: MILLIONS of scattered low-D rows.  This
measures ski_nll+grad wall time at N in {1e5, 1e6}, grid 128x128, plus
a trained-model serving probe — forced device->host sync per the
measurement discipline (CLAUDE.md).

Run on the TPU tunnel:  python benchmarks/ski_scale.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax                                            # noqa: E402
import jax.numpy as jnp                               # noqa: E402

import g3py_tpu as g3                                 # noqa: E402
from g3py_tpu.config import settings                  # noqa: E402
from g3py_tpu.ops import kron as kr                   # noqa: E402


def sync(x):
    return float(np.asarray(jnp.sum(x)))


def bench(fn, *args, reps=5):
    out = fn(*args)
    sync(out[0] if isinstance(out, tuple) else out)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out[0] if isinstance(out, tuple) else out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    grid = (128, 128)

    for n in (100_000, 1_000_000):
        x = np.stack([rng.uniform(0, 10, n),
                      rng.uniform(-3, 3, n)], 1).astype(np.float32)
        f = np.sin(x[:, 0]) * np.exp(-0.3 * x[:, 1] ** 2)
        y = (f + 0.1 * rng.standard_normal(n)).astype(np.float32)

        gp = g3.SKIGP(kernel=[g3.MAT52(x[:, :1]), g3.SE(x[:, 1:2])],
                      grid_shape=list(grid), name=f"SKI{n}")
        gp.observed(x, y)
        pj = {k: jnp.asarray(v) for k, v in gp.params.items()}
        fn = gp.th_loglike_fn()
        xj, yj = jnp.asarray(x), jnp.asarray(y)

        val = jax.jit(lambda p: fn(p, None, xj, yj))
        vgrad = jax.jit(jax.value_and_grad(
            lambda p: -fn(p, None, xj, yj)))

        t0 = time.perf_counter()
        ll = float(np.asarray(val(pj)))
        print(f"N={n}: loglike={ll:.1f}  (cold "
              f"{time.perf_counter() - t0:.1f}s)", file=sys.stderr)
        tv = bench(val, pj)
        t0 = time.perf_counter()
        nll, g = vgrad(pj)
        sync(nll)
        cold_g = time.perf_counter() - t0
        tg = bench(lambda p: vgrad(p)[0], pj)
        print(f"N={n} grid={grid}: NLL {tv * 1e3:.1f}ms, NLL+grad "
              f"{tg * 1e3:.1f}ms (cold {cold_g:.1f}s)", file=sys.stderr)

        if n == 1_000_000:
            # train a few L-BFGS iters to show the path is usable
            t0 = time.perf_counter()
            p = gp.find_MAP(points=1, display=False, powell=False,
                            max_time=120)
            t_map = time.perf_counter() - t0
            ll1 = float(np.asarray(val({k: jnp.asarray(v)
                                        for k, v in p.items()})))
            # serving: posterior mean at 512 query rows
            xq = np.stack([rng.uniform(0, 10, 512),
                           rng.uniform(-3, 3, 512)], 1).astype(np.float32)
            # serve through the Predictor: alpha baked ONCE, the mean
            # statistic is then one matrix-free grid round-trip
            t0 = time.perf_counter()
            pr = gp.predictor(p)
            t_state = time.perf_counter() - t0
            t0 = time.perf_counter()
            m = np.asarray(pr.mean(space=xq))
            cold_serve = time.perf_counter() - t0
            t0 = time.perf_counter()
            m = np.asarray(pr.mean(space=xq))
            warm_serve = time.perf_counter() - t0
            print(f"serving state (one PCG): {t_state:.1f}s",
                  file=sys.stderr)
            mf = np.asarray(gp.mean(p, x[:4096]))
            rmse = float(np.sqrt(np.mean((mf - f[:4096]) ** 2)))
            print(f"N=1e6 find_MAP(budget 120s): {t_map:.1f}s, loglike "
                  f"{ll:.1f} -> {ll1:.1f}; rmse@train {rmse:.4f}; "
                  f"512-query mean cold {cold_serve:.1f}s / warm "
                  f"{warm_serve * 1e3:.1f}ms", file=sys.stderr)


if __name__ == "__main__":
    main()
