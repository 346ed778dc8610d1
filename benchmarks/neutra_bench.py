"""Real-TPU NeuTra vs dense-mass NUTS at the abalone-WGP workload.

The warped-GP hyper posterior is funnel-shaped; dense_e NUTS halves
divergences vs diag (105 -> 51 measured round 4) but cannot straighten the
funnel.  NeuTra (bayesian/neutra.py) fits a RealNVP transport to ensemble
warmup draws and runs NUTS in the latent space.  This script measures, on
hardware, whether the transport actually cuts divergences / raises ESS/s
at the reference benchmark workload (BASELINE.md 878us/eval config).

End-to-end wall time for NeuTra includes its ensemble warmup and flow fit
(that is the honest cost a user pays).  max_depth stays at 6 — deeper
fused NUTS scans have crashed the hosted tunnel's TPU worker (CLAUDE.md).
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
from g3py_tpu.bayesian.neutra import fit_flow, neutra_logp, flow_forward, flow_inverse
from g3py_tpu.bayesian.average import _mESS

rng = np.random.default_rng(0)

ab = data_abalone(dataframe=True)
cols = ["Length", "Diam", "Height", "Whole", "Shucked", "Viscera", "Shell"]
xa = np.asarray(ab[cols], np.float32)
ya = np.asarray(ab["Rings"], np.float32)
sel = rng.choice(len(xa), 125, replace=False)
xa, ya = xa[sel], ya[sel]
wgp = g3.WGP(space=xa[:4], location=g3.Bias(), kernel=g3.SE(xa),
             mapping=g3.BoxCoxLinear(ya), name="NWGP")
wgp.observed(xa, ya)

logp_tr, _, _ = wgp._sampling_logps(prior=False)
u0 = wgp.active.dict_to_array(wgp.find_MAP(display=False, points=1))
ndim = len(u0)
SAMPLES, WARMUP, CHAINS = 300, 200, 4

# ---- baseline: dense-mass NUTS (the round-4 bench configuration) -----------
_ = nuts_sampler(logp_tr, u0, samples=10, warmup=10, key=0, chains=CHAINS,
                 max_depth=6, target_accept=0.95, adapt_mass="dense")
t0 = time.perf_counter()
chn, lpn, info = nuts_sampler(logp_tr, u0, samples=SAMPLES, warmup=WARMUP,
                              key=1, chains=CHAINS, max_depth=6,
                              target_accept=0.95, adapt_mass="dense")
chn = np.asarray(chn)
t_nuts = time.perf_counter() - t0
ess_n = sum(_mESS(chn[c, SAMPLES // 2:, :]) for c in range(CHAINS))
nuts_ess = ess_n / (t_nuts * (SAMPLES / 2) / (SAMPLES + WARMUP))
print(f"dense NUTS: t={t_nuts:.1f}s ess/s={nuts_ess:.1f} "
      f"div={int(np.asarray(info['divergences']).sum())} "
      f"accept={np.asarray(info['accept_rate']).mean():.2f} "
      f"depth={np.asarray(info['mean_tree_depth']).mean():.1f}", flush=True)

# ---- NeuTra: ensemble warmup -> flow fit -> latent NUTS --------------------
t_all0 = time.perf_counter()
n_walk = max(2 * ndim, 16); n_walk += n_walk % 2
p0 = (u0[None, :] * (1 + 0.05 * rng.standard_normal((n_walk, ndim)))
      ).astype(np.float32)
_ = ensemble_sampler(logp_tr, p0, 10, key=0)
t0 = time.perf_counter()
wchain, _wlp = ensemble_sampler(logp_tr, p0, 500, key=2)
draws = np.asarray(wchain)[:, 250:, :].reshape(-1, ndim)
t_warm = time.perf_counter() - t0

t0 = time.perf_counter()
flow, losses = fit_flow(draws, n_couplings=6, hidden=32, steps=1500, key=0)
t_fit = time.perf_counter() - t0

lt = neutra_logp(logp_tr, flow)
idx = rng.choice(draws.shape[0], CHAINS, replace=False)
z0, _ = flow_inverse(flow, draws[idx])
z0 = np.asarray(z0)

_ = nuts_sampler(lt, z0[:1], samples=10, warmup=10, key=0, chains=1,
                 max_depth=6)
t0 = time.perf_counter()
zch, zlp, zinfo = nuts_sampler(lt, z0, samples=SAMPLES, warmup=WARMUP,
                               key=3, chains=CHAINS, max_depth=6,
                               target_accept=0.95, adapt_mass=True)
t_lat = time.perf_counter() - t0
theta = np.asarray(jax.vmap(jax.vmap(lambda z: flow_forward(flow, z)[0]))(
    np.asarray(zch)))
ess_t = sum(_mESS(theta[c, SAMPLES // 2:, :]) for c in range(CHAINS))
t_total = time.perf_counter() - t_all0
neutra_ess = ess_t / (t_lat * (SAMPLES / 2) / (SAMPLES + WARMUP))
neutra_ess_e2e = ess_t * 2 / t_total  # both halves' worth per total wall
print(f"NeuTra: warmup={t_warm:.1f}s fit={t_fit:.1f}s (nll "
      f"{losses[0]:.2f}->{losses[-1]:.2f}) latent-nuts={t_lat:.1f}s "
      f"ess/s={neutra_ess:.1f} (e2e {neutra_ess_e2e:.1f}) "
      f"div={int(np.asarray(zinfo['divergences']).sum())} "
      f"accept={np.asarray(zinfo['accept_rate']).mean():.2f} "
      f"depth={np.asarray(zinfo['mean_tree_depth']).mean():.1f} "
      f"total={t_total:.1f}s", flush=True)
