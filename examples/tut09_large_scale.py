"""Tutorial 09 — Large-scale inference (beyond the reference).

The reference's only answer to large N was subsampling (random_obs
p-fractions, reference data.py:129-164).  This build adds two genuine
scaling axes, demonstrated here on deliberately tiny shapes so the tutorial
runs anywhere; the same calls ran the real N=50k stretch configuration
(benchmarks/stretch_50k.py: 4.3 s/NLL, 7.9 s/NLL+grad on one chip).

1. Matrix-free single-device path: ``gp.nll_iterative`` — lazy gram slabs,
   preconditioned CG quadratic form, batched-SLQ logdet, stochastic-trace
   gradient (ops/iterative.py).
2. Device-sharded path: ``parallel.distributed_gp_nll`` — per-device gram
   row bands, blocked panel Cholesky over the mesh, custom-VJP gradient
   (parallel/cholesky.py).
3. Sparse variational path: ``g3.SGP`` — Titsias' collapsed bound in
   O(n m^2) MXU matmuls with gradient-trained inducing inputs
   (models/sparse.py); the right tool when an approximate posterior is
   acceptable and n is far beyond factorization scale.
"""

import numpy as np

import g3py_tpu as g3


def main(quick=True, plot=False):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    n = 160 if quick else 2048
    x = np.sort(rng.uniform(0, 30, n)).astype(np.float32).reshape(-1, 1)
    y = (np.sin(0.6 * x[:, 0]) + 0.1 * rng.standard_normal(n)).astype(np.float32)

    # ---- 1. matrix-free NLL + gradient on the model API --------------------
    gp = g3.GP(space=x, location=g3.Bias(), kernel=g3.SE(x), name="BIG09")
    gp.observed(x, y)
    params = gp.params_default
    nll, info = gp.nll_iterative(params, rank=40, cg_iters=200, probes=32)
    exact = -gp.loglike(params)
    assert abs(float(nll) - exact) / abs(exact) < 5e-2, (float(nll), exact)
    assert float(info["cg_rel_residual"]) < 1e-2

    reg = gp.active
    u0 = jnp.asarray(reg.dict_to_array(params))

    def f(u):
        return gp.nll_iterative(reg.array_to_dict_jax(u), rank=40,
                                cg_iters=200, probes=32)[0]

    grad = jax.grad(f)(u0)
    assert np.all(np.isfinite(np.asarray(grad)))

    # one gradient step must reduce the NLL
    u1 = u0 - 1e-3 * grad
    assert float(f(u1)) < float(f(u0))

    # ---- 1b. matrix-free SERVING: train iteratively, serve iteratively ------
    # (round 4) one PCG solve + blocked cross-grams; no O(n^3), no n x n
    pr = gp.predictor_iterative(params, rank=40, cg_iters=300)
    xq = np.linspace(0, 30, 50, dtype=np.float32).reshape(-1, 1)
    out = pr(xq, quantiles=True)
    ref = gp.predict(params=params, space=xq, quantiles=True)
    for k in ("mean", "std"):
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   rtol=5e-3, atol=5e-3, err_msg=k)

    # joint posterior draws WITHOUT a factorization: pathwise (Matheron)
    # sampling over random-Fourier prior paths + one multi-RHS CG update
    draws = pr.sampler(space=xq, samples=8, key=0, n_features=2048)
    assert draws.shape == (len(xq), 8) and np.all(np.isfinite(draws))

    if plot:
        import matplotlib.pyplot as plt
        from _common import save_fig

        plt.figure(figsize=(8, 3.5))
        plt.plot(x[:, 0], y, "k.", ms=3, alpha=0.35, label="data")
        plt.plot(xq[:, 0], np.asarray(out["mean"]), "C0",
                 label="matrix-free mean (PCG)")
        plt.fill_between(xq[:, 0], np.asarray(out["quantile_down"]),
                         np.asarray(out["quantile_up"]), alpha=0.25,
                         color="C0", label="95% band")
        plt.plot(xq[:, 0], np.asarray(draws)[:, :4], "C1", lw=0.6,
                 alpha=0.7)
        plt.legend(loc="upper right", fontsize=8)
        plt.title("Serving without a factorization: PCG statistics "
                  "+ pathwise draws")
        save_fig("tut09_iterative_serving.png")

    # ---- 2. device-sharded NLL + gradient over the mesh ---------------------
    from g3py_tpu.parallel import make_mesh, distributed_gp_nll

    mesh = make_mesh(axis_names=("dp",))

    def cov_fn(p, x1, x2):
        d2 = ((x1[:, None, :] - x2[None, :, :]) ** 2).sum(-1)
        return p["var"] * jnp.exp(-0.5 * d2 / p["ls"] ** 2)

    nll_sharded = distributed_gp_nll(cov_fn, mesh=mesh,
                                     noise_fn=lambda p: p["nv"])
    p0 = {"var": jnp.float32(1.0), "ls": jnp.float32(1.0),
          "nv": jnp.float32(0.1)}
    val, grads = jax.value_and_grad(
        lambda p: nll_sharded(p, x, y))(p0)
    assert np.isfinite(float(val))
    assert all(np.isfinite(float(v)) for v in grads.values())

    # ---- 3. sparse variational GP (SGPR): O(n m^2), bound on the exact
    # loglike, inducing inputs trained by gradient with the hypers ----------
    sgp = g3.SGP(space=x, location=g3.Bias(), kernel=g3.SE(x),
                 inducing=24, name="SGP09")
    sgp.observed(x, y)
    elbo0 = sgp.loglike(sgp.params_default)
    sparams = sgp.find_MAP(points=1, display=False)
    elbo1 = sgp.loglike(sparams)
    assert elbo1 > elbo0
    spred = sgp.predict(params=sparams)
    assert np.all(np.isfinite(spred.mean)) and np.all(spred.std >= 0)

    # ---- 4. minibatch SVGP with natural gradients, sharded over the mesh:
    # the n-independent trainer — per-device batch shards, one psum/step --
    vparams, losses = sgp.fit_svgp(batch_size=128, steps=300, lr=5e-3,
                                   natgrad=0.3, mesh=mesh, display=False)
    assert losses[-1] < losses[0]

    # ---- 5. non-conjugate sparse family: Student-t ROBUST regression
    # (outliers get polynomial penalty) and probit classification — the
    # uncollapsed ELBO is the ordinary loglike, q(u) lives in the params --
    y_out = y.copy()
    y_out[:: len(y) // 8] += 6.0          # gross outliers
    svp = g3.SVP(space=x, location=g3.Bias(), kernel=g3.SE(x),
                 likelihood=g3.StudentTLik(), inducing=16, name="SVP09")
    svp.observed(x, y_out)
    rparams, rloss = svp.fit_svgp(batch_size=len(x), steps=800, lr=1e-2,
                                  display=False)
    assert rloss[-1] < rloss[0]
    assert np.all(np.isfinite(svp.mean(rparams, x)))

    yc = (y > np.median(y)).astype(np.float32)
    svc = g3.SVP(space=x, kernel=g3.SE(x), likelihood=g3.BernoulliLik(),
                 inducing=16, name="SVC09")
    svc.observed(x, yc)
    cparams, _ = svc.fit_svgp(batch_size=len(x), steps=600, lr=1e-2,
                              display=False)
    probs = np.asarray(svc.mean(cparams, x))
    assert np.all((probs >= 0) & (probs <= 1))

    return {"nll_iterative": float(nll), "nll_exact": float(exact),
            "nll_sharded": float(val), "sgpr_elbo": float(elbo1),
            "svgp_elbo": float(-losses[-1]),
            "classifier_acc": float(np.mean((probs > .5) == (yc > .5))),
            "n_devices": len(mesh.devices.ravel())}


if __name__ == "__main__":
    out = main()
    print(out)
