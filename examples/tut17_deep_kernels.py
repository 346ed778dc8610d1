"""Tutorial 17 — Deep kernel learning: let the MXU learn the geometry.

Stationary kernels measure similarity in the RAW input coordinates; when
the signal lives on a lower-dimensional nonlinear manifold (a ridge
direction, a warped latent space), axis-aligned ARD lengthscales can't
express it.  :class:`~g3py_tpu.hypers.features.DeepKernel` (Wilson, Hu,
Salakhutdinov & Xing, AISTATS 2016) composes a trainable MLP feature
extractor with any base kernel from the zoo:

    k(x, x') = base( phi_w(x), phi_w(x') )

The extractor's weight matrices are ordinary array-valued hypers with
flat priors, so the ONE flat parameter vector carries them and every
trainer works unchanged: ``find_MAP`` trains them by exact marginal
likelihood, ``fit_svgp`` by minibatch ELBO at scale, ``sample_hypers``
gives them a posterior.  On TPU the feature matmuls batch over all N
rows and feed straight into the gram build — the representation runs on
the MXU alongside the covariance algebra.

The walkthrough:

1. a ridge function in 3-D that defeats plain ARD-SE at this sample
   size; DeepKernel finds the 1-D structure,
2. inspecting the learned representation (features + input sensitivity),
3. stochastic variational DKL: the same extractor through SVP's
   minibatch Adam at larger N,
4. weight-decay regularization via the standard potentials path.
"""

import numpy as np

import g3py_tpu as g3
from _common import save_fig


def main(quick=True, plot=True):
    rng = np.random.default_rng(17)

    # ---- 1. a non-axis-aligned ridge: y = sin(2 x.a) ---------------------
    n, d = (160, 3) if quick else (800, 3)
    a = np.array([1.0, -2.0, 0.5], np.float32)
    x = rng.standard_normal((n, d)).astype(np.float32)
    f = lambda X: np.sin(2.0 * (np.asarray(X) @ a))
    y = f(x) + 0.05 * rng.standard_normal(n).astype(np.float32)
    xq = rng.standard_normal((200, d)).astype(np.float32)

    dk = g3.DeepKernel(g3.SE, x, widths=(16, 2))
    deep = g3.GP(space=x[:4], location=g3.Bias(), kernel=dk, noisy=True,
                 name="Deep")
    deep.observed(x, y)
    p_deep = deep.find_MAP(points=2, powell=False, display=False)

    flat = g3.GP(space=x[:4], location=g3.Bias(), kernel=g3.SE(x),
                 noisy=True, name="Flat")
    flat.observed(x, y)
    p_flat = flat.find_MAP(points=2, powell=False, display=False)

    def rmse(gp, p):
        mu = np.asarray(gp.mean(p, space=xq))
        return float(np.sqrt(np.mean((mu - f(xq)) ** 2)))

    r_deep, r_flat = rmse(deep, p_deep), rmse(flat, p_flat)
    print(f"held-out rmse: DeepKernel-SE {r_deep:.3f}  vs  ARD-SE "
          f"{r_flat:.3f}  (signal std {np.std(f(xq)):.3f})")

    # ---- 2. the learned representation -----------------------------------
    import jax.numpy as jnp
    pj = {k: jnp.asarray(v) for k, v in p_deep.items()}
    feats = np.asarray(dk.features(pj, xq))
    proj = xq @ a
    corr = max(abs(np.corrcoef(feats[:, j], proj)[0, 1])
               for j in range(feats.shape[1]))
    sens = np.asarray(dk.input_sensitivity(pj))
    print(f"best |corr(feature, x.a)| = {corr:.3f}; input sensitivity "
          f"(true direction |a| = {np.abs(a)}): {np.round(sens, 2)}")

    if plot:
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 2, figsize=(10, 4))
        order = np.argsort(proj)
        axes[0].plot(proj[order], f(xq)[order], "k-", lw=1, label="truth")
        axes[0].plot(proj, np.asarray(deep.mean(p_deep, space=xq)), ".",
                     ms=4, label="DeepKernel")
        axes[0].plot(proj, np.asarray(flat.mean(p_flat, space=xq)), ".",
                     ms=4, alpha=0.5, label="ARD-SE")
        axes[0].set_xlabel("x . a (latent ridge coordinate)")
        axes[0].legend()
        axes[1].scatter(feats[:, 0], feats[:, 1], c=proj, s=8)
        axes[1].set_title("learned 2-D features, colored by x . a")
        save_fig("tut17_ridge.png")

    # ---- 3. stochastic variational DKL at larger N ------------------------
    n_big = 2000 if quick else 100_000
    xb = rng.standard_normal((n_big, d)).astype(np.float32)
    yb = f(xb) + 0.05 * rng.standard_normal(n_big).astype(np.float32)
    dkv = g3.DeepKernel(g3.SE, xb, widths=(16, 2))
    svp = g3.SVP(space=xb[:4], location=g3.Bias(), kernel=dkv,
                 likelihood=g3.GaussianLik(), inducing=32, name="DKV")
    svp.observed(xb, yb)
    pv, losses = svp.fit_svgp(batch_size=256, steps=2000 if quick else 5000,
                              lr=1e-2, display=False)
    mu = np.asarray(svp.mean(pv, space=xq))
    print(f"SV-DKL at N={n_big}: -elbo {losses[0]:.0f} -> {losses[-1]:.0f},"
          f" held-out rmse {np.sqrt(np.mean((mu - f(xq))**2)):.3f}")

    # ---- 4. weight decay through potentials -------------------------------
    dkr = g3.DeepKernel(g3.SE, x, widths=(16, 2))
    dkr.set_potential("_w", "L2", 0.01)  # gentle weight decay
    reg_gp = g3.GP(space=x[:4], location=g3.Bias(), kernel=dkr, noisy=True,
                   name="Reg")
    reg_gp.observed(x, y)
    p_reg = reg_gp.find_MAP(points=1, powell=False, display=False)
    wn = sum(float(np.sum(np.square(p_reg[k]))) for k in p_reg if "_w" in k)
    wn0 = sum(float(np.sum(np.square(p_deep[k]))) for k in p_deep
              if "_w" in k)
    print(f"L2-potential weight norm {wn:.1f} vs unregularized {wn0:.1f}")

    return r_deep, r_flat


if __name__ == "__main__":
    main()
