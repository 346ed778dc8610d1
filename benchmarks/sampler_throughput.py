"""Real-TPU sampler throughput: ensemble + NUTS at the abalone-WGP workload
(the reference's 878us-per-logp benchmark config, BASELINE.md) and a 4k GP
for scale comparison.

Both samplers run the whole chain as one lax.scan under jit, so the tunnel
dispatch cost is amortized over every iteration (VERDICT round-1 task 8).
ESS is the mESS estimator (arXiv:1512.07713) over the second half of each
chain.  Prints one summary line per workload.
"""
import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np
import jax

print("backend:", jax.default_backend(), flush=True)
import g3py_tpu as g3
from g3py_tpu.utils.data import data_abalone
from g3py_tpu.bayesian.samplers import ensemble_sampler
from g3py_tpu.bayesian.nuts import nuts_sampler
from g3py_tpu.bayesian.average import _mESS

rng = np.random.default_rng(0)


def bench_model(name, gp, ens_iters=500, nuts_samples=300, nuts_warmup=150,
                chains_ens=32, chains_nuts=4):
    logp_tr, _, _ = gp._sampling_logps(prior=False)
    u0 = gp.active.dict_to_array(gp.find_MAP(display=False, points=1))
    ndim = len(u0)
    p0 = (u0[None, :] * (1 + 0.05 * rng.standard_normal((chains_ens, ndim)))
          ).astype(np.float32)

    # ---- ensemble (affine-invariant stretch move) --------------------------
    _ = ensemble_sampler(logp_tr, p0, 10, key=0)  # warm jit
    t0 = time.perf_counter()
    ch, lp = ensemble_sampler(logp_tr, p0, ens_iters, key=1)
    ch = np.asarray(ch)
    t_ens = time.perf_counter() - t0
    half = ch[:, ens_iters // 2:, :]
    ess_e = sum(_mESS(half[c]) for c in range(half.shape[0]))
    ens_steps = chains_ens * ens_iters / t_ens
    # half-run ESS over the half-run's wall share: steady-state ESS/s
    ens_ess = ess_e / (t_ens / 2)

    # ---- NUTS --------------------------------------------------------------
    _ = nuts_sampler(logp_tr, u0, samples=10, warmup=10, key=0,
                     chains=chains_nuts, max_depth=6)
    t0 = time.perf_counter()
    chn, lpn, info = nuts_sampler(logp_tr, u0, samples=nuts_samples,
                                  warmup=nuts_warmup, key=1,
                                  chains=chains_nuts, max_depth=6)
    chn = np.asarray(chn)
    t_nuts = time.perf_counter() - t0
    ess_n = sum(_mESS(chn[c, nuts_samples // 2:, :])
                for c in range(chn.shape[0]))
    nuts_ess = ess_n / (t_nuts * (nuts_samples / 2) / (nuts_samples + nuts_warmup))
    print(f"{name}: ensemble {ens_steps:.0f} steps/s ess/s={ens_ess:.1f} "
          f"(chains={chains_ens} iters={ens_iters} t={t_ens:.2f}s) | "
          f"NUTS ess/s={nuts_ess:.1f} t={t_nuts:.2f}s "
          f"accept={np.asarray(info['accept_rate']).mean():.2f} "
          f"depth={np.asarray(info["mean_tree_depth"]).mean():.1f} "
          f"div={int(np.asarray(info['divergences']).sum())}", flush=True)


# ---- abalone WGP (reference benchmark workload, n=125 obs) -----------------
ab = data_abalone(dataframe=True)
cols = ["Length", "Diam", "Height", "Whole", "Shucked", "Viscera", "Shell"]
xa = np.asarray(ab[cols], np.float32)
ya = np.asarray(ab["Rings"], np.float32)
sel = rng.choice(len(xa), 125, replace=False)
xa, ya = xa[sel], ya[sel]
wgp = g3.WGP(space=xa[:4], location=g3.Bias(), kernel=g3.SE(xa),
             mapping=g3.BoxCoxLinear(ya), name="SWGP")
wgp.observed(xa, ya)
bench_model("abalone-WGP n=125", wgp)

# ---- 4k GP (opt-in: the big-gram fused sampler scans have crashed the
# hosted tunnel's TPU worker — run with G3PY_BENCH_4K=1 on a standard
# runtime) -------------------------------------------------------------------
import os

if os.environ.get("G3PY_BENCH_4K"):
    n, d = 4096, 8
    x = rng.standard_normal((n, d)).astype(np.float32)
    y = (np.sin(x[:, 0]) + 0.1 * rng.standard_normal(n)).astype(np.float32)
    gp = g3.GP(space=x[:4], location=g3.Bias(), kernel=g3.SE(x), name="SGP4")
    gp.observed(x, y)
    bench_model("GP n=4096", gp, ens_iters=100, nuts_samples=60,
                nuts_warmup=40, chains_ens=16, chains_nuts=2)
