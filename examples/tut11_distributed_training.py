"""Tutorial 11 — Multi-chip exact-GP training through the model API.

The reference trains by ``find_MAP`` on a single host (reference
stochastic.py:566-674); its only parallelism is a multiprocessing chain
pool.  Here the SAME call trains an exact model whose N x N gram is
row-band-sharded over a ``jax.sharding.Mesh`` — the unsharded matrix never
exists on any chip, in forward or backward pass (parallel/cholesky.py):

    params = gp.find_MAP(engine="distributed", points=2)

* works for the gaussian family (GP/WGP — mean + warping Jacobian
  included) and the Student-t family (TP/WTP — nu/gammaln scalarization of
  the same sharded quad/logdet primitive);
* every objective/gradient evaluation is ONE SPMD program: band-wise gram
  build, cooperative blocked Cholesky (one psum + one all_gather per
  panel riding ICI), sharded TRSM, custom-VJP backward that assembles
  K^{-1} band-by-band;
* ``gp.nll_distributed(params)`` exposes the raw objective for custom
  training loops.

Constraints: the standard ``noisy=True`` construction, and n divisible by
the mesh device count.  On a CPU dev box, virtualize a mesh with
``XLA_FLAGS=--xla_force_host_platform_device_count=8``.
"""

import numpy as np

import g3py_tpu as g3


def main(quick=True, plot=False):
    import jax

    n_dev = len(jax.devices())
    rng = np.random.default_rng(11)
    n = 128 if quick else 4096
    n -= n % n_dev  # the band layout needs n divisible by the mesh
    x = np.sort(rng.uniform(0, 20, n)).astype(np.float32).reshape(-1, 1)
    y = (np.sin(0.8 * x[:, 0])
         + 0.1 * rng.standard_normal(n)).astype(np.float32)

    gp = g3.GP(space=x, location=g3.Bias(), kernel=g3.SE(x), name="DIST11")
    gp.observed(x, y)

    # the sharded objective equals the single-device loglike
    p0 = gp.params_default
    nll_sharded = float(gp.nll_distributed(p0))
    nll_exact = -float(gp.loglike(p0))
    np.testing.assert_allclose(nll_sharded, nll_exact, rtol=1e-4, atol=5e-3)

    # train through the standard surface; the optimum matches the default
    # (single-device scipy) engine
    params = gp.find_MAP(engine="distributed", points=2, display=False,
                         max_iters=60 if quick else 200)
    lp_dist = float(gp.logp(params))
    lp_ref = float(gp.logp(gp.find_MAP(points=2, display=False)))
    assert lp_dist > lp_ref - 2.0, (lp_dist, lp_ref)

    # the Student-t family rides the same primitive
    tp = g3.TP(space=x, location=g3.Bias(), kernel=g3.SE(x), name="DIST11T")
    tp.observed(x, y)
    np.testing.assert_allclose(float(tp.nll_distributed(tp.params_default)),
                               -float(tp.loglike(tp.params_default)),
                               rtol=1e-4, atol=5e-3)

    # serve the model you trained: the gram stays band-sharded, queries
    # are a per-device cross-gram + sharded TRSM + psums
    pr = gp.predictor_distributed(params)
    xq = np.linspace(0, 20, 40, dtype=np.float32).reshape(-1, 1)
    out = pr(xq, quantiles=True)
    ref = gp.predict(params=params, space=xq, quantiles=True)
    for k in ("mean", "std"):
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   rtol=2e-3, atol=2e-3, err_msg=k)

    if plot:
        gp.plot(params=params)
        g3.show()
    return {"n": n, "n_devices": n_dev, "logp_distributed": lp_dist,
            "logp_reference_engine": lp_ref}


if __name__ == "__main__":
    out = main()
    print(out)
