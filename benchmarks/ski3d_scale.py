"""3-D SKI at scale on the real chip: scattered (x, y, t) point clouds.

D=3 exercises the row-block Khatri-Rao MXU operator
(ops/kron._ski_mxu_nd) — the sparse gather/scatter path runs ~50M
elem/s on this runtime (64 taps/row at n=200k is ~13M elements per
direction, ~0.5s/matvec), the folded matmul form costs n*prod(m) MACs.

Run on the TPU tunnel:  python benchmarks/ski3d_scale.py
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
    n = 200_000
    grid = (64, 64, 32)
    x = np.stack([rng.uniform(0, 10, n), rng.uniform(-3, 3, n),
                  rng.uniform(0, 5, n)], 1).astype(np.float32)
    f = (np.sin(x[:, 0]) * np.exp(-0.3 * x[:, 1] ** 2)
         * np.cos(0.8 * x[:, 2]))
    y = (f + 0.1 * rng.standard_normal(n)).astype(np.float32)

    gp = g3.SKIGP(kernel=[g3.MAT52(x[:, :1]), g3.SE(x[:, 1:2]),
                          g3.SE(x[:, 2:3])],
                  grid_shape=list(grid), name="SKI3")
    gp.observed(x, y)
    pj = {k: jnp.asarray(v) for k, v in gp.params.items()}
    xj, yj = jnp.asarray(x), jnp.asarray(y)

    # raw matvec A/B: MXU fold vs sparse gather/scatter
    idx, w = jax.jit(gp._taps)(xj)
    idxs, ws = tuple(idx), tuple(w)
    ks = [jnp.asarray(np.asarray(k)) for k in gp._grams(pj)]
    v = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    for mode in (True, False):
        settings.ski_mxu = mode
        wv, wtv, _ = kr.ski_operator(idxs, ws, grid)

        @jax.jit
        def mv5(vv):
            def body(c, _):
                return wv(kr.kron_apply(list(ks), wtv(c))) + 0.01 * c, None

            out, _ = jax.lax.scan(body, vv, None, length=5)
            return out

        t = bench(mv5, v, reps=3) / 5
        print(f"D=3 matvec (mxu={mode}): {t * 1e3:.1f}ms", file=sys.stderr)
    settings.ski_mxu = True

    fn = gp.th_loglike_fn()
    val = jax.jit(lambda p: fn(p, None, xj, yj))
    vgrad = jax.jit(jax.value_and_grad(lambda p: -fn(p, None, xj, yj)))
    t0 = time.perf_counter()
    ll = float(np.asarray(val(pj)))
    print(f"N={n} grid={grid}: loglike={ll:.1f} (cold "
          f"{time.perf_counter() - t0:.1f}s)", file=sys.stderr)
    tv = bench(val, pj, reps=3)
    t0 = time.perf_counter()
    sync(vgrad(pj)[0])
    cold_g = time.perf_counter() - t0
    tg = bench(lambda p: vgrad(p)[0], pj, reps=3)
    print(f"N={n} grid={grid}: NLL {tv * 1e3:.0f}ms, NLL+grad "
          f"{tg * 1e3:.0f}ms (cold {cold_g:.1f}s)", file=sys.stderr)

    # serving through the Predictor (alpha baked once)
    t0 = time.perf_counter()
    pr = gp.predictor(pj)
    t_state = time.perf_counter() - t0
    xq = np.stack([rng.uniform(0, 10, 512), rng.uniform(-3, 3, 512),
                   rng.uniform(0, 5, 512)], 1).astype(np.float32)
    t0 = time.perf_counter()
    m = np.asarray(pr.mean(space=xq))
    cold_serve = time.perf_counter() - t0
    t0 = time.perf_counter()
    m = np.asarray(pr.mean(space=xq))
    warm = time.perf_counter() - t0
    print(f"serving: state {t_state:.1f}s, 512-query mean cold "
          f"{cold_serve:.1f}s / warm {warm * 1e3:.1f}ms", file=sys.stderr)


if __name__ == "__main__":
    main()
