"""Tutorial 15 — Gridded fields: exact Kronecker GP regression.

Images, rasters, dense space-time lattices: when observations cover a
full Cartesian grid ``axes_1 x ... x axes_D`` and the kernel separates
across axes, the gram is a Kronecker product and
:class:`~g3py_tpu.models.grid.GridGP` runs EXACT inference in
``O(sum n_i^3)`` per-axis eigendecompositions + tensor contractions —
a 256 x 256 grid (N = 65,536 points) trains exactly where the dense
O(N^3) gram (the reference's only multi-D path, reference
kernels.py:51-75) is beyond any hardware.

The walkthrough:

1. fit a 2-D field on a grid with a separable MAT52 x SE kernel,
2. predict at OFF-GRID query rows (means, bands, full covariance),
3. draw exact JOINT posterior field samples (Matheron on the
   per-axis-augmented grid),
4. check the Kronecker NLL equals the dense product-kernel oracle on a
   small grid,
5. train on an INCOMPLETE grid (missing cells) through the matrix-free
   masked-Kronecker path and reconstruct the held-out cells.
"""

import numpy as np

import g3py_tpu as g3
from _common import save_fig


def main(quick=True, plot=True):
    rng = np.random.default_rng(7)

    # ---- 1. a smooth 2-D field observed on a full grid ------------------
    n_t, n_x = (24, 16) if quick else (96, 64)
    t = np.linspace(0, 8, n_t).astype(np.float32)
    x = np.linspace(-2, 2, n_x).astype(np.float32)
    tt, xx = np.meshgrid(t, x, indexing="ij")
    field = np.sin(tt) * np.exp(-0.5 * xx ** 2)
    y = (field.ravel()
         + 0.1 * rng.standard_normal(n_t * n_x)).astype(np.float32)

    gp = g3.GridGP(axes=[t, x],
                   kernel=[g3.MAT52(t[:, None]), g3.SE(x[:, None])],
                   name="Grid")
    gp.observed(gp.space, y)          # rows in meshgrid 'ij' order
    params = gp.find_MAP(points=1 if quick else 4, display=False)

    m = np.asarray(gp.mean(params, gp.space))
    rmse = float(np.sqrt(np.mean((m - field.ravel()) ** 2)))
    print(f"grid fit: N = {n_t * n_x} points, "
          f"posterior-mean rmse vs truth {rmse:.4f}")
    assert rmse < 0.06

    # ---- 2. off-grid queries: moments, bands, full covariance -----------
    n_q = 40
    xq = np.stack([np.linspace(0.3, 7.7, n_q),
                   0.6 * np.sin(np.linspace(0, 6, n_q))],
                  axis=1).astype(np.float32)          # a diagonal track
    mq = np.asarray(gp.mean(params, xq))
    lo = gp.quantiler(params, xq, q=0.025, noise=True)
    hi = gp.quantiler(params, xq, q=0.975, noise=True)
    truth_q = np.sin(xq[:, 0]) * np.exp(-0.5 * xq[:, 1] ** 2)
    cover = float(np.mean((truth_q >= lo) & (truth_q <= hi)))
    print(f"off-grid track: rmse {np.sqrt(np.mean((mq - truth_q) ** 2)):.4f}, "
          f"95%-band coverage {cover:.2f}")
    assert cover > 0.8

    cv = np.asarray(gp.covariance(params, xq[:8]))
    assert np.allclose(cv, cv.T, atol=1e-5) and np.all(
        np.diag(cv) >= -1e-6)

    # ---- 3. exact joint posterior field draws ----------------------------
    draws = gp.sampler(params, xq, samples=200, seed=1)
    emp_sd = draws.std(axis=1)
    ana_sd = np.sqrt(np.maximum(np.asarray(
        gp.variance(params, xq)), 1e-12))
    print(f"joint draws: empirical sd vs analytic sd max rel "
          f"{np.max(np.abs(emp_sd - ana_sd) / np.maximum(ana_sd, 1e-3)):.3f}")

    # ---- 4. dense-oracle check on a small sub-grid ------------------------
    ts, xs = t[:8], x[:6]
    sub = g3.GridGP(axes=[ts, xs],
                    kernel=[g3.MAT52(ts[:, None]), g3.SE(xs[:, None])],
                    name="GridS")
    ys = y.reshape(n_t, n_x)[:8, :6].ravel()
    sub.observed(sub.space, ys)
    import jax.numpy as jnp
    pj = {k: jnp.asarray(v) for k, v in sub.params.items()}
    k1 = np.asarray(sub.f_kernels[0].cov(pj, jnp.asarray(ts[:, None])))
    k2 = np.asarray(sub.f_kernels[1].cov(pj, jnp.asarray(xs[:, None])))
    s2 = float(np.asarray(sub._noise_var(pj)))
    big = np.kron(k1, k2) + s2 * np.eye(48)
    sign, logdet = np.linalg.slogdet(big)
    ll_dense = -0.5 * (logdet + ys @ np.linalg.solve(big, ys)
                       + 48 * np.log(2 * np.pi))
    ll = float(sub.loglike(sub.params))
    print(f"Kronecker NLL vs dense oracle: {ll:.4f} vs {ll_dense:.4f}")
    assert abs(ll - ll_dense) < 1e-4 * abs(ll_dense)

    # ---- 5. incomplete grid: missing cells, matrix-free --------------------
    # Drop 30% of the cells (a cloud-masked raster): the observed block
    # of the Kronecker gram is no longer eigen-diagonalizable, but its
    # matvec still is, so the NLL/posterior run matrix-free (PCG + SLQ +
    # BBMM trace gradients) with the same exact semantics.
    rng2 = np.random.default_rng(11)
    n_cells = n_t * n_x
    keep = np.sort(rng2.choice(n_cells, int(0.7 * n_cells),
                               replace=False))
    drop = np.setdiff1d(np.arange(n_cells), keep)
    gpm = g3.GridGP(axes=[t, x],
                    kernel=[g3.MAT52(t[:, None]), g3.SE(x[:, None])],
                    masked_probes=16, name="GridM")
    gpm.observed(gp.space[keep], y[keep])
    pm = gpm.find_MAP(points=1, display=False, powell=False)
    m_miss = np.asarray(gpm.mean(pm, gp.space[drop]))
    rmse_miss = float(np.sqrt(np.mean(
        (m_miss - field.ravel()[drop]) ** 2)))
    print(f"masked grid ({len(keep)}/{n_cells} cells observed): "
          f"held-out-cell rmse {rmse_miss:.4f}")
    assert rmse_miss < 0.08

    if plot:
        import matplotlib.pyplot as plt

        fig, axs = plt.subplots(1, 3, figsize=(13, 3.6))
        axs[0].imshow(field.T, origin="lower", aspect="auto",
                      extent=[t[0], t[-1], x[0], x[-1]])
        axs[0].set_title("true field")
        axs[1].imshow(m.reshape(n_t, n_x).T, origin="lower",
                      aspect="auto", extent=[t[0], t[-1], x[0], x[-1]])
        axs[1].plot(xq[:, 0], xq[:, 1], "w--", lw=1)
        axs[1].set_title("GridGP posterior mean")
        axs[2].plot(xq[:, 0], truth_q, "k-", label="truth")
        axs[2].plot(xq[:, 0], mq, "C0-", label="mean")
        axs[2].fill_between(xq[:, 0], lo, hi, alpha=0.25)
        axs[2].set_title("off-grid track")
        axs[2].legend()
        save_fig("tut15_grids.png")

    return params


if __name__ == "__main__":
    main(quick=True, plot=True)
