import sys, time; sys.path.insert(0, '/root/repo')
import numpy as np
import jax, jax.numpy as jnp
print("backend:", jax.default_backend(), flush=True)
import g3py_tpu as g3
from g3py_tpu.ops.linalg import safe_cholesky, mvn_quad_logdet, blocked_trtri

rng = np.random.default_rng(0)

def sync(r):
    leaves = [x for x in (r if isinstance(r, (tuple,list)) else (r,)) if hasattr(x,'dtype')]
    for x in leaves: np.asarray(jnp.sum(x))

def timeit(fn, *a, repeat=10, warmup=2):
    for _ in range(warmup): r = fn(*a)
    sync(r)
    t0 = time.perf_counter()
    for _ in range(repeat): r = fn(*a)
    sync(r)
    return (time.perf_counter()-t0)/repeat

for n in (4096, 16384):
    d = 8
    x = rng.standard_normal((n, d)).astype(np.float32)
    y = (np.sin(x[:,0]) + 0.1*rng.standard_normal(n)).astype(np.float32)
    gp = g3.GP(space=x[:4], location=g3.Bias(), kernel=g3.SE(x), name=f"P{n}")
    gp.observed(x, y)
    reg = gp.active; pure = gp._logp_pure(prior=False)
    u0 = jnp.asarray(reg.dict_to_array(gp.params_default))
    xj, yj = jnp.asarray(x), jnp.asarray(y)
    params = reg.array_to_dict_jax(u0)
    kern = gp.f_kernel_noise

    gram = jax.jit(lambda u: kern.cov(reg.array_to_dict_jax(u), xj))
    K = gram(u0); sync(K)
    chol = jax.jit(lambda k: safe_cholesky(k))
    L = chol(K); sync(L)
    xchol = jax.jit(jnp.linalg.cholesky)
    mql = jax.jit(lambda k, r: mvn_quad_logdet(k, r))
    trtri = jax.jit(lambda l: blocked_trtri(l, block=1024))
    Li = trtri(L); sync(Li)
    mm = jax.jit(lambda a: jnp.matmul(a.T, a, precision=jax.lax.Precision.HIGHEST))
    nllg = jax.jit(jax.value_and_grad(lambda u: -pure(reg.array_to_dict_jax(u), xj, xj, yj, jnp.zeros(0, dtype=u.dtype))))
    nll = jax.jit(lambda u: -pure(reg.array_to_dict_jax(u), xj, xj, yj, jnp.zeros(0, dtype=u.dtype)))
    rep = 10 if n == 4096 else 3
    print(f"n={n} gram={timeit(gram,u0,repeat=rep)*1e3:.1f}ms "
          f"safechol={timeit(chol,K,repeat=rep)*1e3:.1f}ms "
          f"xlachol={timeit(xchol,K,repeat=rep)*1e3:.1f}ms "
          f"mql={timeit(mql,K,yj,repeat=rep)*1e3:.1f}ms "
          f"trtri={timeit(trtri,L,repeat=rep)*1e3:.1f}ms "
          f"syrk={timeit(mm,Li,repeat=rep)*1e3:.1f}ms "
          f"nll={timeit(nll,u0,repeat=rep)*1e3:.1f}ms "
          f"nll+grad={timeit(nllg,u0,repeat=rep)*1e3:.1f}ms", flush=True)
