"""Depth probe: ncp_dense95 at max_depth 7 (the round-3 sweep saturated
depth at the runtime-imposed 6; d=8 w300 crashed the tunnel worker twice,
d=7 keeps the program half that size).  One variant, one process."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
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
    for tag, md in (("ncp_dense95_d7", 7),):
        _ = nuts_sampler(logp_nc, np.tile(v0, (chains, 1)), samples=10,
                         warmup=10, key=0, chains=chains, max_depth=md,
                         target_accept=0.95, adapt_mass="dense")
        t0 = time.perf_counter()
        ch, _lp, info = nuts_sampler(logp_nc, np.tile(v0, (chains, 1)),
                                     samples=samples, warmup=warmup, key=1,
                                     chains=chains, max_depth=md,
                                     target_accept=0.95, adapt_mass="dense")
        t = time.perf_counter() - t0
        ch = np.asarray(ch)
        sh = ch.shape
        theta = np.asarray(jax.vmap(shear)(jnp.asarray(
            ch.reshape(-1, sh[-1])))).reshape(sh)
        ess = sum(_mESS(theta[c, samples // 2:, :]) for c in range(chains))
        print(f"{tag}: ess/s={ess / (t * frac):.2f} "
              f"div={int(np.asarray(info['divergences']).sum())} "
              f"accept={float(np.asarray(info['accept_rate']).mean()):.2f} "
              f"depth={float(np.asarray(info['mean_tree_depth']).mean()):.2f} "
              f"wall={t:.1f}s", flush=True)


if __name__ == "__main__":
    main()
