"""NeuTra step-size tuning: with the flow curing ALL divergences
(neutra_ab.py measured 0 at ta=0.95 where plain dense-NUTS has ~170),
the conservative target_accept inherited from the raw-space funnel is
pure waste — bigger steps end trees earlier.  Sweep ta under dense mass
in z-space, one process."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
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

    ch_w = 32
    p0w = (u0[None, :] * (1 + 0.05 * rng.standard_normal((ch_w, ndim)))
           ).astype(np.float32)
    iters_w = 400
    ch_e, _ = ensemble_sampler(logp_tr, p0w, iters_w, key=1)
    draws = np.asarray(ch_e)[:, iters_w // 2:, :].reshape(-1, ndim)
    flow, _losses = fit_flow(draws, n_couplings=6, hidden=32, steps=1500,
                             key=0)
    lt = neutra_logp(logp_tr, flow)
    z0 = np.asarray(flow_inverse(flow, jnp.asarray(draws[:4]))[0])

    samples, warmup, chains = 300, 200, 4
    frac = (samples / 2) / (samples + warmup)
    for ta in (0.9, 0.8, 0.7, 0.6):
        _ = nuts_sampler(lt, z0[:1], samples=10, warmup=10, key=0,
                         chains=1, max_depth=6, target_accept=ta,
                         adapt_mass="dense")
        t0 = time.perf_counter()
        ch, _lp, info = nuts_sampler(lt, z0, samples=samples,
                                     warmup=warmup, key=1, chains=chains,
                                     max_depth=6, target_accept=ta,
                                     adapt_mass="dense")
        t = time.perf_counter() - t0
        theta = np.asarray(jax.vmap(jax.vmap(
            lambda z: flow_forward(flow, z)[0]))(jnp.asarray(np.asarray(ch))))
        ess = sum(_mESS(theta[c, samples // 2:, :]) for c in range(chains))
        print(f"neutra_dense_ta{ta}: ess/s={ess / (t * frac):.2f} "
              f"div={int(np.asarray(info['divergences']).sum())} "
              f"accept={float(np.asarray(info['accept_rate']).mean()):.2f} "
              f"depth={float(np.asarray(info['mean_tree_depth']).mean()):.2f} "
              f"wall={t:.1f}s", flush=True)


if __name__ == "__main__":
    main()
