"""NeuTra diagnosis A/B (VERDICT round-2 item 2).

BENCH_r02 measured neutra at 0.98x dense-NUTS ESS/s with 151 divergences
(vs the round-5 claim of 1.9x / 41 div).  Hypotheses, measured here
back-to-back in one process on the bench WGP workload:

* h1: the NUTS baseline improved (dense mass landed round 4) while the
  neutra bench leg still runs DIAG mass in z-space — z-space retains
  linear correlations a RealNVP's scale-shift couplings don't remove.
  -> run neutra with dense mass too.
* h2: flow fit budget/quality (1500 steps on ensemble half-run draws)
  varies by window -> report flow ELBO-proxy loss + divergence count.
* h3: combine with reparam='noncentered' (round-3): fit the flow in the
  already-ridge-free NCP space and let NUTS ride both.

Run: python benchmarks/neutra_ab.py [--cpu]
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
    from g3py_tpu.bayesian.samplers import ensemble_sampler
    from g3py_tpu.bayesian.average import _mESS
    from g3py_tpu.bayesian.neutra import (fit_flow, neutra_logp,
                                          flow_inverse, flow_forward)

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
    ndim = len(u0)

    logp_tr, _, _ = wgp._sampling_logps(prior=False)
    shear, unshear = wgp._noncentered_sampling_shear()
    logp_nc = lambda v: logp_tr(shear(v))

    samples, warmup, chains = 300, 200, 4
    frac = (samples / 2) / (samples + warmup)

    # ---- shared ensemble warmup draws (once; both flows fit on these) ----
    ch_w = 32
    p0w = (u0[None, :] * (1 + 0.05 * rng.standard_normal((ch_w, ndim)))
           ).astype(np.float32)
    iters_w = 400
    ch_e, _ = ensemble_sampler(logp_tr, p0w, iters_w, key=1)
    draws = np.asarray(ch_e)[:, iters_w // 2:, :].reshape(-1, ndim)
    draws_nc = np.asarray(jax.vmap(unshear)(jnp.asarray(draws)))

    def nuts_run(logp, z0, mass):
        _ = nuts_sampler(logp, z0[:1], samples=10, warmup=10, key=0,
                         chains=1, max_depth=6, target_accept=0.95,
                         adapt_mass=mass)
        t0 = time.perf_counter()
        ch, _lp, info = nuts_sampler(logp, z0, samples=samples,
                                     warmup=warmup, key=1, chains=chains,
                                     max_depth=6, target_accept=0.95,
                                     adapt_mass=mass)
        return np.asarray(ch), info, time.perf_counter() - t0

    def report(tag, theta, info, t, t_extra=0.0):
        ess = sum(_mESS(theta[c, samples // 2:, :]) for c in range(chains))
        ess_s = ess / (t * frac)
        div = int(np.asarray(info["divergences"]).sum())
        print(f"{tag}: ess/s={ess_s:.2f} div={div} "
              f"accept={float(np.asarray(info['accept_rate']).mean()):.2f} "
              f"depth={float(np.asarray(info.get('mean_tree_depth', np.nan)).mean()):.2f} "
              f"wall={t:.1f}s extra={t_extra:.0f}s", flush=True)
        return ess_s, div

    # ---- baseline: plain NUTS, dense mass --------------------------------
    ch, info, t = nuts_run(logp_tr, np.tile(u0, (chains, 1)), "dense")
    base_ess, base_div = report("nuts_dense", ch, info, t)

    # ---- neutra variants --------------------------------------------------
    for tag, base_logp, base_draws, back in (
            ("neutra", logp_tr, draws, None),
            ("neutra_ncp", logp_nc, draws_nc, shear)):
        t0 = time.perf_counter()
        flow, losses = fit_flow(base_draws, n_couplings=6, hidden=32,
                                steps=1500, key=0)
        t_fit = time.perf_counter() - t0
        lt = neutra_logp(base_logp, flow)
        z0, _ = flow_inverse(flow, jnp.asarray(base_draws[:chains]))
        z0 = np.asarray(z0)
        for mass_tag, mass in (("diag", True), ("dense", "dense")):
            ch, info, t = nuts_run(lt, z0, mass)
            theta = np.asarray(jax.vmap(jax.vmap(
                lambda z: flow_forward(flow, z)[0]))(jnp.asarray(ch)))
            if back is not None:
                sh = theta.shape
                theta = np.asarray(jax.vmap(back)(jnp.asarray(
                    theta.reshape(-1, sh[-1])))).reshape(sh)
            ess_s, div = report(f"{tag}_{mass_tag}", theta, info, t, t_fit)
            print(f"  -> vs nuts_dense: {ess_s / max(base_ess, 1e-9):.2f}x "
                  f"(flow loss {float(np.asarray(losses)[-1]):.1f})",
                  flush=True)


if __name__ == "__main__":
    main(cpu="--cpu" in sys.argv)
