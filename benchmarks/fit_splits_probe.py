"""Probe the fit_splits config that crashed the tunnel TPU worker once
(round 3): 8 splits x 4 starts = 32 pairs at n=512, now through the
pair_chunk sequential-chunk path (VERDICT round-1 task 7).  Records wall
times per chunk size; a worker crash shows up as a hard failure.
"""
import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np
import jax

print("backend:", jax.default_backend(), flush=True)
import g3py_tpu as g3

rng = np.random.default_rng(0)
n = 512
x = np.sort(rng.uniform(0, 50, n)).astype(np.float32).reshape(-1, 1)
y = (np.sin(0.4 * x[:, 0]) + 0.1 * rng.standard_normal(n)).astype(np.float32)
gp = g3.GP(space=x, location=g3.Bias(), kernel=g3.SE(x), name="FSP")
gp.observed(x, y)

S, points = 8, 4
masks = np.zeros((S, n), np.float32)
for i in range(S):
    masks[i, np.sort(rng.choice(n, int(0.8 * n), replace=False))] = 1.0

for chunk in (8, 16, None):
    label = chunk if chunk is not None else "fused-32"
    t0 = time.time()
    try:
        plist, vals = gp.fit_splits(masks, points=points, max_iters=60,
                                    pair_chunk=chunk)
        ok = np.all(np.isfinite(vals))
        print(f"pair_chunk={label}: {time.time()-t0:.1f}s finite={ok} "
              f"best_logps={np.round(np.max(vals, axis=1), 1)}", flush=True)
    except Exception as e:
        print(f"pair_chunk={label}: FAILED after {time.time()-t0:.1f}s: {e}",
              flush=True)
