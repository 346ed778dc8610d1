"""A/B: monolithic vs chunked-dispatch NUTS, and the depth>6 unlock
(VERDICT r4 item 4).

On the hosted TPU tunnel a monolithic NUTS program at max_depth=7 kills
the worker (measured round 3; the whole 500-iteration chain is ONE fused
dispatch whose runtime doubles per depth).  ``nuts_sampler(chunk=)``
splits warmup+sampling into bounded dispatches, so the question becomes
measurable: does d=7/8 (deeper trees, smaller divergence floor) pay for
the chunk-dispatch overhead on the bench WGP workload (n=125 d=8
BoxCoxLinear — bench.py's sampler rows)?

All configs run the round-3 best geometry: reparam='noncentered' + dense
mass + ta=0.95.  Back-to-back in one process, 2 reps per config.

MEASURED (v5e tunnel, 2026-08-21, w200):
    mono_d6   4.92 div=80 | 8.18 div=95
    chunk_d6  4.87 div=9  | 6.00 div=97   <- chunk overhead ~ZERO
    chunk_d7  7.23 div=27 | 5.70 div=283
    chunk_d8  6.09 div=165| 4.72 div=209  <- deeper trees do NOT cut div
and with --warmup 400 at chunk_d7 (3 reps): 4.59 div=12 / 7.72 div=85 /
7.91 div=50 — median div 50 at 7.7 ESS/s, the bench config of record.
Conclusions in docs/samplers.md: the depth ceiling was a dispatch
artifact and is GONE (chunked d=7/8 run clean at ~zero overhead); the
residual divergence mass is adaptation/geometry-bound (w200
under-adapts the dense mass — accept undershoots; d=8's longer
trajectories hit MORE divergent leaves), and divergence counts at 300
samples are high-variance across keys (9..283 within same-class
configs).

Run: python benchmarks/nuts_depth_ab.py [--cpu] [--chunk 25]
     [--warmup 400]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main(cpu=False, chunk=25, warmup=200):
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

    samples, chains = 300, 4
    frac = (samples / 2) / (samples + warmup)

    def run(tag, depth, ck, key):
        t0 = time.perf_counter()
        ch, _lp, info = nuts_sampler(logp_nc, v0, samples=samples,
                                     warmup=warmup, key=key, chains=chains,
                                     max_depth=depth, target_accept=0.95,
                                     adapt_mass="dense", chunk=ck)
        t = time.perf_counter() - t0
        ch = np.asarray(ch)
        sh = ch.shape
        ch = np.asarray(jax.vmap(shear)(
            jnp.asarray(ch.reshape(-1, sh[-1])))).reshape(sh)
        ess = sum(_mESS(ch[c, samples // 2:, :]) for c in range(chains))
        ess_s = ess / (t * frac)
        div = int(np.asarray(info["divergences"]).sum())
        acc = float(np.asarray(info["accept_rate"]).mean())
        dep = float(np.asarray(info["mean_tree_depth"]).mean())
        print(f"{tag}: ess/s={ess_s:.2f} div={div} accept={acc:.2f} "
              f"depth={dep:.2f} wall={t:.1f}s", flush=True)
        return ess_s, div, t

    configs = [("mono_d6", 6, None), ("chunk_d6", 6, chunk),
               ("chunk_d7", 7, chunk), ("chunk_d8", 8, chunk)]
    for tag, depth, ck in configs:
        # first call compiles; run twice with distinct keys and report both
        for rep in (1, 2):
            try:
                run(f"{tag}_r{rep}", depth, ck, key=rep)
            except Exception as e:  # keep the sweep alive across a crash
                print(f"{tag}_r{rep}: FAILED {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)
                time.sleep(150.0)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--chunk", type=int, default=25)
    ap.add_argument("--warmup", type=int, default=200)
    a = ap.parse_args()
    main(cpu=a.cpu, chunk=a.chunk, warmup=a.warmup)
