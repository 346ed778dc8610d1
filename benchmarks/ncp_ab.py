"""A/B: plain NUTS vs non-centered-reparameterized NUTS on the bench
WGP workload (n=125, d=8, BoxCoxLinear warping — bench.py's sampler rows).

The funnel hypothesis (VERDICT round-2 item 3): the remaining divergences
come from the amplitude ridge — kernel/noise variances chasing the
mapping-dependent scale of z = g^{-1}(y).  reparam='noncentered'
(models/elliptical.py `_noncentered_sampling_shear`) shears that ridge
away with a unit-Jacobian map.  This script measures divergences, accept
rate, and steady-state ESS/s for both parameterizations back-to-back in
one process (the only trustworthy comparison on the tunnel).

Run: python benchmarks/ncp_ab.py [--cpu]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main(cpu=False):
    if cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    import g3py_tpu as g3
    from g3py_tpu.bayesian.nuts import nuts_sampler
    from g3py_tpu.bayesian.average import _mESS

    rng = np.random.default_rng(0)
    n2, d = 125, 8
    x2 = rng.standard_normal((n2, d)).astype(np.float32)
    y2 = (np.abs(np.sin(x2[:, 0])) + 0.5
          + 0.1 * rng.standard_normal(n2)).astype(np.float32)
    wgp = g3.WGP(space=x2[:4], location=g3.Bias(), kernel=g3.SE(x2),
                 mapping=g3.BoxCoxLinear(y2), name="BWGP")
    wgp.observed(x2, y2)
    reg = wgp.active
    pm = wgp.find_MAP(points=2, powell=False, display=False)
    u0 = np.asarray(reg.dict_to_array(pm))[reg.sampling_dims]

    logp_tr, _, _ = wgp._sampling_logps(prior=False)
    shear, unshear = wgp._noncentered_sampling_shear()
    logp_nc = lambda v: logp_tr(shear(v))
    v0 = np.asarray(unshear(jnp.asarray(u0)))

    samples, warmup, chains = 300, 200, 4
    frac = (samples / 2) / (samples + warmup)

    def run(tag, logp, start, mass, ta):
        _ = nuts_sampler(logp, start, samples=10, warmup=10, key=0,
                         chains=chains, max_depth=6, target_accept=ta,
                         adapt_mass=mass)
        t0 = time.perf_counter()
        ch, _lp, info = nuts_sampler(logp, start, samples=samples,
                                     warmup=warmup, key=1, chains=chains,
                                     max_depth=6, target_accept=ta,
                                     adapt_mass=mass)
        t = time.perf_counter() - t0
        ch = np.asarray(ch)
        return ch, info, t

    for tag, logp, start, back, mass, ta in (
            ("plain_dense95", logp_tr, u0, None, "dense", 0.95),
            ("ncp_dense95", logp_nc, v0, shear, "dense", 0.95),
            ("ncp_diag95", logp_nc, v0, shear, True, 0.95),
            ("ncp_dense90", logp_nc, v0, shear, "dense", 0.90),
            ("ncp_dense80", logp_nc, v0, shear, "dense", 0.80)):
        ch, info, t = run(tag, logp, start, mass, ta)
        if back is not None:
            sh = ch.shape
            ch = np.asarray(jax.vmap(back)(
                jnp.asarray(ch.reshape(-1, sh[-1])))).reshape(sh)
        ess = sum(_mESS(ch[c, samples // 2:, :]) for c in range(chains))
        ess_s = ess / (t * frac)
        div = int(np.asarray(info["divergences"]).sum())
        acc = float(np.asarray(info["accept_rate"]).mean())
        depth = float(np.asarray(info.get("mean_tree_depth", np.nan)).mean())
        print(f"{tag}: ess/s={ess_s:.2f} div={div} accept={acc:.2f} "
              f"depth={depth:.2f} wall={t:.1f}s", flush=True)


if __name__ == "__main__":
    main(cpu="--cpu" in sys.argv)
