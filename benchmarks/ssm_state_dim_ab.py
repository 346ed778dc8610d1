"""A/B: VPU multiply-reduce vs MXU 6-pass-f32 matmul for the batched
tiny-matrix products inside the parallel Kalman scans, as a function of
state dimension S.

Small S (the 1-D families, S<=8): the VPU broadcast-multiply-reduce won
decisively in round 8 (einsum-highest was 160x slower at S=3).  Large S
(the spatio-temporal family: S = m_sites * s_t, e.g. 64): the VPU path's
(n, S, S, S) broadcast intermediate is O(n S^3) HBM traffic while the
MXU path reads O(n S^2) — this script locates the crossover that sets
settings.ssm_mxu_state_dim.  Both paths are exact f32, so the decision
is purely about speed.
"""
import sys
import time

sys.path.insert(0, '/root/repo')
import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)
from g3py_tpu.config import settings
from g3py_tpu.ops import ssm

rng = np.random.default_rng(0)
N = 16384


def make(s):
    # spectral radius of c*randn(s,s) ~ c*sqrt(s): scale by 1/sqrt(s) so
    # the chain stays stable (S=32/64 at fixed c=0.3 overflowed to NaN
    # NLLs in the first run — timings were still valid, values weren't)
    a = ((0.5 / np.sqrt(s))
         * rng.standard_normal((N, s, s))).astype(np.float32)
    L = (0.4 * rng.standard_normal((N, s, s))).astype(np.float32)
    q = (np.einsum("nij,nkj->nik", L, L)
         + 0.1 * np.eye(s)).astype(np.float32)
    h = rng.standard_normal(s).astype(np.float32)
    y = rng.standard_normal(N).astype(np.float32)
    return jnp.asarray(a), jnp.asarray(q), jnp.asarray(h), jnp.asarray(y)


def timed(fn, *args):
    v = fn(*args)                      # compile
    np.asarray(jnp.sum(v[0]))
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        for _ in range(5):
            v = fn(*args)
        np.asarray(jnp.sum(v[0]))
        best = min(best, (time.time() - t0) / 5)
    return best


for s in (4, 8, 16, 32, 64):
    a, q, h, y = make(s)
    vals = {}
    for label, thr in (("vpu", 10_000), ("mxu", 1)):
        settings.ssm_mxu_state_dim = thr

        @jax.jit
        def run(a, q, h, y):
            nll, m_f, _ = ssm.parallel_kalman_nll(a, q, h,
                                                  jnp.float32(0.3), y)
            return nll, m_f

        t = timed(run, a, q, h, y)
        vals[label] = (t, float(run(a, q, h, y)[0]))
    rel = abs(vals["vpu"][1] - vals["mxu"][1]) / max(abs(vals["vpu"][1]),
                                                     1.0)
    print(f"S={s:3d}: vpu {vals['vpu'][0]*1e3:8.2f}ms   "
          f"mxu {vals['mxu'][0]*1e3:8.2f}ms   "
          f"ratio {vals['vpu'][0]/vals['mxu'][0]:.2f}   nll rel {rel:.1e}",
          flush=True)
settings.ssm_mxu_state_dim = 16
print("done", flush=True)
