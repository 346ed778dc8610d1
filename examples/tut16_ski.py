"""Tutorial 16 — KISS-GP: millions of SCATTERED rows via grid interpolation.

:class:`~g3py_tpu.models.grid.GridGP` (tutorial 15) needs the data ON
the lattice; :class:`~g3py_tpu.models.ski.SKIGP` handles arbitrary
scattered low-D rows by interpolating them onto a uniform inducing grid
with cubic convolution taps (structured kernel interpolation, Wilson &
Nickisch 2015): ``K ~ W K_uu W'``.  The matvec is two interpolation
matmuls around per-axis Kronecker contractions, so exact-flavoured
inference (PCG quadratic form + SLQ logdet + BBMM trace gradients)
reaches row counts the dense O(N^3) gram never could — ~456 ms per
NLL+gradient at N = 100,000 on one TPU chip.

The walkthrough:

1. fit a 2-D field from scattered observations,
2. predict on a dense evaluation grid (means + bands) and at the
   training rows,
3. check SKI against the exact dense GP on a small subset (rows placed
   on grid nodes make the interpolation exact),
4. serve through a Predictor (alpha factored once, mean = one grid
   round-trip per batch),
5. train data-parallel over a device mesh with
   ``find_MAP(engine='distributed')``.
"""

import numpy as np

import g3py_tpu as g3
from _common import save_fig


def main(quick=True, plot=True):
    rng = np.random.default_rng(11)

    # ---- 1. scattered observations of a smooth 2-D field ----------------
    n = 600 if quick else 200_000
    grid = [24, 20] if quick else [128, 128]
    xs = np.stack([rng.uniform(0, 8, n),
                   rng.uniform(-2, 2, n)], axis=1).astype(np.float32)
    field = np.sin(xs[:, 0]) * np.exp(-0.5 * xs[:, 1] ** 2)
    y = (field + 0.1 * rng.standard_normal(n)).astype(np.float32)

    gp = g3.SKIGP(kernel=[g3.MAT52(xs[:, :1]), g3.SE(xs[:, 1:2])],
                  grid_shape=grid, name="SKI")
    gp.observed(xs, y)
    params = gp.find_MAP(points=1, display=False, powell=False)

    m = np.asarray(gp.mean(params, xs))
    rmse = float(np.sqrt(np.mean((m - field) ** 2)))
    print(f"SKI fit: N = {n} scattered rows on a "
          f"{grid[0]}x{grid[1]} inducing grid, rmse vs truth {rmse:.4f}")
    assert rmse < 0.08

    # ---- 2. dense evaluation grid with uncertainty bands -----------------
    n_q = 30
    tq = np.linspace(0.3, 7.7, n_q).astype(np.float32)
    xq = np.stack([tq, 0.6 * np.sin(tq)], axis=1)
    mq = np.asarray(gp.mean(params, xq))
    lo = gp.quantiler(params, xq, q=0.025)
    hi = gp.quantiler(params, xq, q=0.975)
    truth_q = np.sin(xq[:, 0]) * np.exp(-0.5 * xq[:, 1] ** 2)
    cover = float(np.mean((truth_q >= lo) & (truth_q <= hi)))
    print(f"off-data track: rmse {np.sqrt(np.mean((mq - truth_q) ** 2)):.4f}, "
          f"95%-band coverage {cover:.2f}")
    assert cover >= 0.7

    # ---- 3. SKI == exact GP for rows on grid nodes ----------------------
    ax0, ax1 = (a[:, 0] for a in gp._axes)
    xn = np.stack([ax0[rng.choice(len(ax0), 40)],
                   ax1[rng.choice(len(ax1), 40)]], 1).astype(np.float32)
    xn = np.unique(xn, axis=0)
    yn = rng.standard_normal(len(xn)).astype(np.float32)
    import jax.numpy as jnp

    pj = {k: jnp.asarray(v) for k, v in params.items()}
    k1 = np.asarray(gp.f_kernels[0].cov(pj, jnp.asarray(xn[:, :1])),
                    np.float64)
    k2 = np.asarray(gp.f_kernels[1].cov(pj, jnp.asarray(xn[:, 1:2])),
                    np.float64)
    s2 = float(np.asarray(gp._noise_var(pj)))
    big = k1 * k2 + s2 * np.eye(len(xn))
    sign, logdet = np.linalg.slogdet(big)
    yo = yn.astype(np.float64)
    ll_dense = -0.5 * (logdet + yo @ np.linalg.solve(big, yo)
                       + len(xn) * np.log(2 * np.pi))
    geom, axes_keep = gp._geom, gp._axes
    gp.observed(xn, yn)
    gp._geom, gp._axes = geom, axes_keep     # keep the trained grid
    ll_ski = float(gp.loglike(params))
    print(f"on-node rows: SKI loglike {ll_ski:.3f} vs exact dense "
          f"{ll_dense:.3f}")
    assert abs(ll_ski - ll_dense) < 1e-3 * abs(ll_dense)
    gp.observed(xs, y)
    gp._geom, gp._axes = geom, axes_keep

    # ---- 4. serving: factor alpha once, stream query batches ------------
    pr = gp.predictor(params)
    mq2 = np.asarray(pr.mean(space=xq))
    assert np.allclose(mq2, mq, rtol=1e-3, atol=1e-4)
    print("predictor serving: baked-alpha mean matches the model path")

    # ---- 5. data-parallel training over a device mesh --------------------
    ll0 = float(gp.loglike(gp.params_default))
    p_dist = gp.find_MAP(engine="distributed", points=1, display=False,
                         max_iters=10 if quick else 100)
    ll1 = float(gp.loglike(p_dist))
    print(f"find_MAP(engine='distributed'): loglike {ll0:.1f} -> {ll1:.1f}")
    assert ll1 > ll0

    if plot:
        import matplotlib.pyplot as plt

        te = np.linspace(0, 8, 60).astype(np.float32)
        xe = np.linspace(-2, 2, 40).astype(np.float32)
        tt, xx = np.meshgrid(te, xe, indexing="ij")
        rows = np.stack([tt.ravel(), xx.ravel()], 1).astype(np.float32)
        me = np.asarray(gp.mean(params, rows)).reshape(60, 40)
        fig, axs = plt.subplots(1, 3, figsize=(13, 3.6))
        axs[0].scatter(xs[:, 0], xs[:, 1], c=y, s=4)
        axs[0].set_title("scattered observations")
        axs[1].imshow(me.T, origin="lower", aspect="auto",
                      extent=[0, 8, -2, 2])
        axs[1].plot(xq[:, 0], xq[:, 1], "w--", lw=1)
        axs[1].set_title("SKIGP posterior mean")
        axs[2].plot(xq[:, 0], truth_q, "k-", label="truth")
        axs[2].plot(xq[:, 0], mq, "C0-", label="mean")
        axs[2].fill_between(xq[:, 0], lo, hi, alpha=0.25)
        axs[2].set_title("off-data track")
        axs[2].legend()
        save_fig("tut16_ski.png")

    return params


if __name__ == "__main__":
    main(quick=True, plot=True)
