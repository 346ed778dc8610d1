"""Tutorial 12 — Non-Gaussian observations (beyond the reference).

The reference's only story for non-Gaussian data was deterministic
warping (reference gaussian.py:115-174): reshape the marginals, keep the
Gaussian noise.  That cannot express outlier-robust NOISE, binary
targets, or counts.  The sparse variational process (``g3.SVP``,
models/svgp.py) closes all three with one mechanism — a whitened q(u)
carried in the parameter vector and an elementwise likelihood component:

* ``g3.StudentTLik()`` — robust regression.  5-10% gross outliers barely
  move the predictive mean (polynomial tail penalty), where a Gaussian
  fit inflates its noise and drags toward them.
* ``g3.BernoulliLik()`` — probit classification; the predictive class
  probability is analytic.
* ``g3.PoissonLik()`` — count regression (log link); ELBO and predictive
  moments fully analytic.
* ``g3.MulticlassSVP`` (``CategoricalLik``) — softmax multi-class
  classification: C latent GPs sharing one kernel/inducing set, analytic
  Jensen bound ELBO, predictive class-probability matrix.
* ``g3.HeteroscedasticSVP`` (``HeteroscedasticLik``) — input-dependent
  noise: a second latent head models log-variance, fully analytic ELBO;
  ``noise_field`` returns the learned noise map.

Train with ``fit_svgp`` (Adam over hypers AND q; minibatch or full
batch, optionally ``mesh=`` data-parallel).  ``find_MAP`` is polish-only
here: the (hypers, q) coupling is badly conditioned for cold L-BFGS.
"""

import numpy as np

import g3py_tpu as g3


def main(quick=True, plot=False):
    rng = np.random.default_rng(12)
    n = 200 if quick else 2000
    steps = 800 if quick else 3000
    out = {}

    # ---- 1. robust regression under gross outliers -------------------------
    x = np.sort(rng.uniform(0, 10, n)).astype(np.float32).reshape(-1, 1)
    f_true = np.sin(x[:, 0])
    y = (f_true + 0.1 * rng.standard_normal(n)).astype(np.float32)
    bad = rng.choice(n, n // 10, replace=False)
    y[bad] += (6.0 * rng.standard_normal(len(bad))).astype(np.float32)

    robust = g3.SVP(space=x[:4], location=g3.Bias(), kernel=g3.SE(x),
                    likelihood=g3.StudentTLik(), inducing=16, name="T12r")
    robust.observed(x, y)
    pr, lr = robust.fit_svgp(batch_size=n, steps=steps, lr=1e-2,
                             display=False)
    rmse_robust = float(np.sqrt(np.mean(
        (np.asarray(robust.mean(pr, x)) - f_true) ** 2)))

    gauss = g3.SGP(space=x[:4], location=g3.Bias(), kernel=g3.SE(x),
                   inducing=16, name="T12g")
    gauss.observed(x, y)
    pg = gauss.find_MAP(points=2, display=False)
    rmse_gauss = float(np.sqrt(np.mean(
        (np.asarray(gauss.mean(pg, x)) - f_true) ** 2)))
    assert rmse_robust < rmse_gauss, (rmse_robust, rmse_gauss)
    out["rmse_robust"] = rmse_robust
    out["rmse_gauss"] = rmse_gauss

    # ---- 2. probit classification ------------------------------------------
    xc = np.sort(rng.uniform(-4, 4, n)).astype(np.float32).reshape(-1, 1)
    p_true = 1.0 / (1.0 + np.exp(-3.0 * xc[:, 0]))
    yc = (rng.uniform(size=n) < p_true).astype(np.float32)
    clf = g3.SVP(space=xc[:4], kernel=g3.SE(xc),
                 likelihood=g3.BernoulliLik(), inducing=16, name="T12c")
    clf.observed(xc, yc)
    pc, _ = clf.fit_svgp(batch_size=n, steps=steps, lr=1e-2, display=False)
    probs = np.asarray(clf.mean(pc, xc))
    out["clf_acc"] = float(np.mean((probs > 0.5) == (yc > 0.5)))
    assert out["clf_acc"] > 0.8
    # quantiles are class-PROBABILITY quantiles (probit-pushed), in [0,1]
    q_hi = clf.quantiler(pc, xc, q=0.975)
    assert q_hi.max() <= 1.0 and q_hi.min() >= 0.0

    # ---- 3. count regression ------------------------------------------------
    xp_ = np.sort(rng.uniform(0, 10, n)).astype(np.float32).reshape(-1, 1)
    rate_true = np.exp(1.0 + np.sin(xp_[:, 0]))
    yp_ = rng.poisson(rate_true).astype(np.float32)
    cnt = g3.SVP(space=xp_[:4], kernel=g3.SE(xp_),
                 likelihood=g3.PoissonLik(), inducing=16, name="T12p")
    cnt.observed(xp_, yp_)
    pp, _ = cnt.fit_svgp(batch_size=n, steps=steps, lr=1e-2, display=False)
    m = np.asarray(cnt.mean(pp, xp_))
    out["poisson_rel_err"] = float(np.mean(np.abs(m - rate_true)
                                           / rate_true))
    assert out["poisson_rel_err"] < 0.35

    # ---- 4. multi-class softmax classification ------------------------------
    # Three angular-sector classes in 2-D: one latent GP per class sharing
    # the kernel and inducing set (g3.MulticlassSVP), analytic Jensen
    # softmax bound as the ELBO data term.
    xm = rng.standard_normal((n, 2)).astype(np.float32)
    angm = np.arctan2(xm[:, 1], xm[:, 0])
    ym = ((angm + np.pi) // (2 * np.pi / 3)).clip(0, 2).astype(np.float32)
    svc = g3.MulticlassSVP(space=xm, kernel=g3.SE(xm), classes=3,
                           inducing=24, name="T12m")
    svc.observed(xm, ym)
    pm, _ = svc.fit_svgp(batch_size=n, steps=steps, lr=5e-2, display=False)
    probs3 = svc.predict_proba(pm)            # (n, 3), rows sum to 1
    out["multiclass_acc"] = float(
        np.mean(svc.predict_class(pm) == ym))
    assert out["multiclass_acc"] > 0.85
    assert np.allclose(probs3.sum(-1), 1.0, atol=1e-4)

    # ---- 5. heteroscedastic regression: the noise is a GP too --------------
    # y = f1 + N(0, exp(f2 + b)): two latent heads over one kernel, fully
    # analytic ELBO (Lazaro-Gredilla & Titsias 2011).  The model resolves
    # WHERE the data is noisy — a scalar-noise GP cannot.
    xh = np.sort(rng.uniform(0, 10, n)).astype(np.float32).reshape(-1, 1)
    fh = np.sin(xh[:, 0])
    sd_h = 0.05 + 0.4 * (xh[:, 0] > 5)          # noise step at x=5
    yh = (fh + sd_h * rng.standard_normal(n)).astype(np.float32)
    het = g3.HeteroscedasticSVP(space=xh, location=g3.Bias(),
                                kernel=g3.SE(xh), inducing=24, name="T12h")
    het.observed(xh, yh, hidden=fh)
    ph, _ = het.fit_svgp(batch_size=n, steps=2 * steps, lr=2e-2,
                         display=False)
    nf = het.noise_field(ph, xh)                 # learned variance map
    out["noise_ratio"] = float(nf[xh[:, 0] > 6].mean()
                               / nf[xh[:, 0] < 4].mean())
    assert out["noise_ratio"] > 10.0             # true ratio is 81x

    if plot:
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 3, figsize=(15, 4))
        axes[0].plot(x, f_true, "k-", lw=1)
        axes[0].plot(x, np.asarray(robust.mean(pr, x)), "r-", label="t")
        axes[0].plot(x, np.asarray(gauss.mean(pg, x)), "b--", label="gauss")
        axes[0].plot(x, y, "k.", ms=2)
        axes[0].set_title("robust"); axes[0].legend()
        axes[1].plot(xc, p_true, "k-"); axes[1].plot(xc, probs, "r-")
        axes[1].plot(xc, yc, "k.", ms=2); axes[1].set_title("probit")
        axes[2].plot(xp_, rate_true, "k-"); axes[2].plot(xp_, m, "r-")
        axes[2].plot(xp_, yp_, "k.", ms=2); axes[2].set_title("poisson")
        from _common import save_fig
        save_fig("tut12_likelihoods.png")

    return out


if __name__ == "__main__":
    print(main())
