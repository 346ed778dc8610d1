"""State-space (SDE) representation of 1-D stationary GPs + parallel Kalman.

A stationary GP on a 1-D input with an OU / Matern-3/2 / Matern-5/2 /
cosine / periodic kernel (or sums and products of them) is EXACTLY (or,
for the exp-sin^2 periodic, to a truncated-harmonic tolerance) a
linear-Gaussian state-space model (Hartikainen & Sarkka 2010; Solin &
Sarkka 2014 for the periodic expansion): a latent state z(t) in R^s
follows a linear SDE whose H-projection has the kernel as its stationary
covariance.  Exact GP regression then costs O(n s^3) instead of O(n^3) —
and on TPU the sequential Kalman recursion is replaced by the
PARALLEL-IN-TIME form of Sarkka & Garcia-Fernandez, "Temporal
Parallelization of Bayesian Smoothers" (IEEE TAC 2021): filtering and
smoothing are associative scans, O(log n) depth on hardware, mapping
directly onto ``jax.lax.associative_scan``.  This is the TPU-native
answer to the reference's only scaling strategy — subsampling (reference
data.py:129-190) — for the time-series datasets the reference itself
ships (sunspots, CO2, EURUSD): EXACT inference at N=1e6 in milliseconds.

Kernel parametrization matches this library's dense forms exactly
(hypers/kernels.py, hypers/metrics.py) so the SSM NLL equals the dense
``mvn_quad_logdet`` NLL to float32 rounding (tested):

* ``OU``     (ARD_L1): k = v exp(-r|t|)                  -> lambda = r
* ``MAT32``  (ARD_L2): d3 = sqrt(1.5) r |t|              -> lambda = sqrt(1.5) r
* ``MAT52``  (ARD_L2): d5 = sqrt(2.5) r |t|              -> lambda = sqrt(2.5) r
* ``COS``    (Difference): k = v cos(2 pi f t)           -> 2-D rotation
* ``SIN``    (exp-sin^2): k = v exp(-2 r sin^2(pi f t))
             = v e^{-r} [I_0(r) + 2 sum_j I_j(r) cos(2 pi f j t)]
             (EXACT Bessel identity; truncated at ``harmonics`` J)
* ``SE``     (ARD_L2): k = v exp(-0.5 r^2 t^2) — the one APPROXIMATE
             leaf (non-rational spectrum): order-``ssm_se_order`` Taylor
             spectral factorization, kernel error <= 9.1e-4 var at the
             default order 8 (see :class:`SELeaf`)
* ``SM``     (spectral-mixture component): v exp(-2 pi^2 r^2 t^2)
             cos(2 pi f t) = SE-envelope (rate 2 pi r) x cosine — rides
             :class:`SELeaf`'s approximation via Kronecker composition
* products of the above (KernelProd): Kronecker state composition —
  H(A1 (x) A2)(P1 (x) P2)H' = k1 k2, the quasi-periodic construction.

Matern state blocks (companion form, z = (f, f', ...), H picks the first
component):

* OU:     s=1, A = e^{-c},                      Pinf = v
* MAT32:  s=2, A = e^{-c} (I + N dt),           N = F + lambda I nilpotent^2
* MAT52:  s=3, A = e^{-c} (I + N dt + N^2 dt^2/2), N nilpotent^3

with c = lambda dt and Q = Pinf - A Pinf A' (exact discretization of the
stationary SDE — no matrix exponential solver needed: N is nilpotent, so
the series is finite and exactly differentiable).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.special import gammaln

from ..config import settings
from ..hypers import hval

__all__ = ["ssm_leaves", "ssm_blocks", "parallel_kalman_nll",
           "chunked_kalman_nll", "chunked_smoother_diag", "sharded_ssm_nll",
           "sharded_ssm_laplace", "parallel_smoother",
           "parallel_kalman_filter", "SSMLeaf",
           "periodic_coefficients", "small_inv", "small_chol",
           "ssm_prior_state_sample"]

LOG2PI = np.log(2.0 * np.pi)
TWOPI = 2.0 * np.pi


# ---------------------------------------------------------------------------
# leaves: per-kernel-component SSM descriptions
# ---------------------------------------------------------------------------


class SSMLeaf:
    """One kernel component's SSM description.  ``blocks(params, dt)``
    returns the discretized transition stack ``A`` (n, s, s), the
    stationary covariance ``Pinf`` (s, s) and the measurement row ``H``
    (s,); the component's stationary variance is ``H Pinf H'``."""

    dim = 0

    def blocks(self, params, dt):
        raise NotImplementedError


class MaternLeaf(SSMLeaf):
    """OU / Matern-3/2 / Matern-5/2 companion-form blocks."""

    def __init__(self, family, kernel, lam_scale, dim):
        self.family = family          # 'ou' | 'mat32' | 'mat52'
        self.kernel = kernel
        self.lam_scale = float(lam_scale)
        self.dim = int(dim)

    def values(self, params):
        """(variance, lambda) as jax scalars.  The kernel leaf's
        ``var``/``metric.rate`` hyper slots are only populated at
        ``check_hypers`` time, after the leaf walk runs in the process
        constructor."""
        v = jnp.asarray(hval(self.kernel.var, params),
                        settings.dtype).reshape(())
        r = jnp.asarray(hval(self.kernel.metric.rate, params),
                        settings.dtype).reshape(())
        return v, self.lam_scale * r

    def blocks(self, params, dt):
        v, lam = self.values(params)
        c = lam * dt
        e = jnp.exp(-c)
        if self.family == "ou":
            a = e[:, None, None]
            return a, v.reshape(1, 1), np.ones(1, settings.floatx)
        if self.family == "mat32":
            # N = F + lam I, F = [[0, 1], [-lam^2, -2 lam]]; N^2 = 0
            n_mat = jnp.stack([
                jnp.stack([lam, jnp.ones_like(lam)]),
                jnp.stack([-lam * lam, -lam]),
            ])                                         # (2, 2)
            eye = jnp.eye(2, dtype=settings.dtype)
            a = e[:, None, None] * (eye[None]
                                    + dt[:, None, None] * n_mat[None])
            pinf = jnp.diag(jnp.stack([v, v * lam * lam]))
            h = np.zeros(2, settings.floatx)
            h[0] = 1.0
            return a, pinf, h
        # mat52: F = [[0,1,0],[0,0,1],[-l^3,-3l^2,-3l]]; N = F + l I,
        # N^3 = 0 (triple eigenvalue), so expm is the finite series below
        z = jnp.zeros_like(lam)
        one = jnp.ones_like(lam)
        n_mat = jnp.stack([
            jnp.stack([lam, one, z]),
            jnp.stack([z, lam, one]),
            jnp.stack([-lam ** 3, -3.0 * lam * lam, -2.0 * lam]),
        ])                                             # (3, 3)
        n2 = jnp.matmul(n_mat, n_mat,
                        precision=settings.matmul_precision)
        eye = jnp.eye(3, dtype=settings.dtype)
        a = e[:, None, None] * (eye[None]
                                + dt[:, None, None] * n_mat[None]
                                + 0.5 * (dt ** 2)[:, None, None] * n2[None])
        l2 = lam * lam
        k13 = -v * l2 / 3.0
        pinf = jnp.stack([
            jnp.stack([v, z, k13]),
            jnp.stack([z, v * l2 / 3.0, z]),
            jnp.stack([k13, z, v * l2 * l2]),
        ])
        h = np.zeros(3, settings.floatx)
        h[0] = 1.0
        return a, pinf, h


def _se_unit_system(order, _cache={}):
    """Host-side f64 precompute of the unit-lengthscale SE state-space
    approximation (Hartikainen & Sarkka 2010): truncate the Taylor series
    of 1/S(w) (S = sqrt(2 pi) e^{-w^2/2}) at ``order`` terms, spectrally
    factor the resulting all-pole density (left-half-plane roots of
    ``sum_k (-s^2/2)^k / k!``), and solve the stationary Lyapunov
    equation of the companion-form SDE.  Returned in BALANCED state
    coordinates (Pinf has unit diagonal — the raw companion Pinf spans
    ~1e6 at order 8, which would put f32 filter updates in cancellation
    territory) and EIGEN form, so the runtime discretization is just

        A(dt)[j, k] = Re sum_i W[j, k, i] exp(mu_i * dt / l)

    with fixed complex constants (mu, W): exactly differentiable in the
    lengthscale, no matrix exponential at trace time.  Returns numpy f64
    ``(mu_re, mu_im, w_re, w_im, pinf)``; max kernel error vs the true
    SE is 4.3e-3 / 9.1e-4 / 2.0e-4 / 4.7e-5 of var at order 6/8/10/12
    in f64, uniformly in the lengthscale (the system scales exactly).
    In f32, order 10 is the practical CEILING (2.1e-4 measured): the
    balanced eigen constants grow ~13x per +2 orders (1.4e3 at 8,
    1.8e4 at 10, 2.5e5 at 12) and their f32 cancellation noise swamps
    the method error beyond order 10."""
    if order in _cache:
        return _cache[order]
    import math
    from scipy.linalg import solve_lyapunov

    n = int(order)
    coeffs = np.zeros(2 * n + 1)
    for k in range(n + 1):
        coeffs[2 * k] = (-0.5) ** k / math.factorial(k)
    roots = np.roots(coeffs[::-1])
    lhp = roots[roots.real < 0]
    if len(lhp) != n:                                  # pragma: no cover
        raise ValueError(f"SE spectral factorization failed at order {n}")
    d_poly = np.poly(lhp).real                         # monic, stable
    f_mat = np.zeros((n, n))
    f_mat[:-1, 1:] = np.eye(n - 1)
    f_mat[-1, :] = -d_poly[::-1][:n]
    l_vec = np.zeros(n)
    l_vec[-1] = 1.0
    q_c = np.sqrt(2.0 * np.pi) * (2.0 ** n) * math.factorial(n)
    pinf = solve_lyapunov(f_mat, -q_c * np.outer(l_vec, l_vec))
    pinf = 0.5 * (pinf + pinf.T)
    pinf = pinf / pinf[0, 0]                           # k(0) = var exactly
    mu, v_eig = np.linalg.eig(f_mat)
    w_full = np.einsum("ji,ik->jki", v_eig, np.linalg.inv(v_eig))
    # balance: unit-diagonal Pinf (t[0] = 1, so H = e_0 is unchanged)
    t_bal = 1.0 / np.sqrt(np.diag(pinf))
    pinf = pinf * np.outer(t_bal, t_bal)
    w_full = w_full * (t_bal[:, None, None] / t_bal[None, :, None])
    _cache[order] = (np.ascontiguousarray(mu.real),
                     np.ascontiguousarray(mu.imag),
                     np.ascontiguousarray(w_full.real),
                     np.ascontiguousarray(w_full.imag), pinf)
    return _cache[order]


class SELeaf(SSMLeaf):
    """SE kernel (kernels.py SE: v exp(-0.5 r^2 tau^2)) as an order-``s``
    Taylor state-space APPROXIMATION — the one non-exact leaf (the SE
    spectrum is not rational, so no finite-state form exists; Hartikainen
    & Sarkka 2010).  Kernel error <= 9.1e-4 of var at the default order 8
    (``settings.ssm_se_order``; 2.1e-4 at 10 — the f32 ceiling, see
    :func:`_se_unit_system`), uniform in the lengthscale.  The unit system is precomputed on the host in f64;
    at runtime ``A(dt) = Re sum_i W_i e^{mu_i r dt}`` (l = 1/r for this
    library's ARD_L2 rate parametrization) — a VPU broadcast-reduce over
    the order axis, differentiable in both hypers."""

    def __init__(self, kernel, order):
        self.kernel = kernel
        self.dim = int(order)

    def blocks(self, params, dt):
        v = jnp.asarray(hval(self.kernel.var, params),
                        settings.dtype).reshape(())
        r = jnp.asarray(hval(self.kernel.metric.rate, params),
                        settings.dtype).reshape(())
        a, pinf_u = _se_discretize(self.dim, r * dt)   # c = dt/lengthscale
        pinf = v * pinf_u
        h = np.zeros(self.dim, settings.floatx)
        h[0] = 1.0
        return a, pinf, h


def _se_discretize(order, c):
    """(A (n, s, s), Pinf_unit (s, s)) of the balanced SE unit system at
    scaled steps ``c = rate * dt``: A = Re(W e^{mu c}) as a VPU
    multiply-reduce over the eigen axis (see _bmm — 'highest' batched
    matmuls are pathological on this runtime)."""
    mu_re, mu_im, w_re, w_im, pinf_u = _se_unit_system(order)
    mu_re = jnp.asarray(mu_re, settings.dtype)
    mu_im = jnp.asarray(mu_im, settings.dtype)
    w_re = jnp.asarray(w_re, settings.dtype)
    w_im = jnp.asarray(w_im, settings.dtype)
    decay = jnp.exp(c[:, None] * mu_re[None])          # (n, s)
    phase = c[:, None] * mu_im[None]
    re_part = decay * jnp.cos(phase)
    im_part = decay * jnp.sin(phase)
    a = (jnp.sum(re_part[:, None, None, :] * w_re[None], axis=-1)
         - jnp.sum(im_part[:, None, None, :] * w_im[None], axis=-1))
    return a, jnp.asarray(pinf_u, settings.dtype)


class SMLeaf(SSMLeaf):
    """Spectral-mixture component (kernels.py SM:
    v exp(-2 pi^2 r^2 tau^2) cos(2 pi f tau)) as the Kronecker product
    of the SE envelope leaf and the exact 2-D rotation state — the SM
    envelope is an SE at rate 2 pi r (0.5 r_se^2 = 2 pi^2 r^2), so the
    approximation quality is exactly :class:`SELeaf`'s at the same
    order.  A full spectral-mixture kernel ``SM + SM + ...`` then rides
    the additive block-diagonal stack like any kernel sum — giving the
    Wilson-Adams spectral mixture an O(n) exact-inference path."""

    def __init__(self, kernel, order):
        self.kernel = kernel
        self.order = int(order)
        self.dim = 2 * self.order

    def blocks(self, params, dt):
        v = jnp.asarray(hval(self.kernel.var, params),
                        settings.dtype).reshape(())
        r = jnp.asarray(hval(self.kernel.rate, params),
                        settings.dtype).reshape(())
        f = jnp.asarray(hval(self.kernel.freq, params),
                        settings.dtype).reshape(())
        a1, p1 = _se_discretize(self.order, (TWOPI * r) * dt)
        a2 = _rotation_stack(TWOPI * f, dt)
        p2 = jnp.eye(2, dtype=settings.dtype)
        n = dt.shape[0]
        a = (a1[:, :, None, :, None] * a2[:, None, :, None, :]).reshape(
            n, self.dim, self.dim)
        pinf = v * (p1[:, None, :, None] * p2[None, :, None, :]).reshape(
            self.dim, self.dim)
        h = np.zeros(self.dim, settings.floatx)
        h[0] = 1.0                       # kron(e0_se, e0_rot)
        return a, pinf, h


def _rotation_stack(omega, dt):
    """(n, 2, 2) rotation matrices by angle omega*dt (the cosine
    kernel's exact transition: H A(tau) Pinf H' = v cos(omega tau))."""
    th = omega * dt
    c, s = jnp.cos(th), jnp.sin(th)
    return jnp.stack([jnp.stack([c, -s], axis=-1),
                      jnp.stack([s, c], axis=-1)], axis=-2)


class CosLeaf(SSMLeaf):
    """COS kernel (kernels.py COS: v cos(2 pi f tau)): exact 2-D
    rotation state, Q = 0."""

    dim = 2

    def __init__(self, kernel):
        self.kernel = kernel

    def blocks(self, params, dt):
        v = jnp.asarray(hval(self.kernel.var, params),
                        settings.dtype).reshape(())
        f = jnp.asarray(hval(self.kernel.freq, params),
                        settings.dtype).reshape(())
        a = _rotation_stack(TWOPI * f, dt)
        pinf = v * jnp.eye(2, dtype=settings.dtype)
        h = np.zeros(2, settings.floatx)
        h[0] = 1.0
        return a, pinf, h


def periodic_coefficients(r, harmonics, terms=64):
    """Harmonic variances of the exp-sin^2 periodic kernel: ``c`` with
    ``c[0] = e^{-r} I_0(r)``, ``c[j] = 2 e^{-r} I_j(r)`` so that
    exp(-2 r sin^2(pi f tau)) = sum_j c_j cos(2 pi f j tau) EXACTLY as
    harmonics -> inf (the Jacobi-Anger / modified-Bessel identity).

    Computed by the ascending series of I_j in the log domain (each term
    exp((2k+j) ln(r/2) - lgamma(k+1) - lgamma(k+j+1) - r), bounded by 1),
    differentiable in ``r`` and accurate in f32 for r up to ~30 with the
    default 64 terms — far beyond any trainable periodic lengthscale."""
    r = jnp.asarray(r, settings.dtype).reshape(())
    j = jnp.arange(harmonics + 1, dtype=settings.dtype)[:, None]
    k = jnp.arange(terms, dtype=settings.dtype)[None, :]
    # guard ln(r/2) at r->0: terms with 2k+j>0 vanish anyway
    logr2 = jnp.log(jnp.maximum(r, 1e-30) / 2.0)
    logterm = ((2.0 * k + j) * logr2 - gammaln(k + 1.0)
               - gammaln(k + j + 1.0) - r)
    i_scaled = jnp.sum(jnp.exp(logterm), axis=1)       # e^{-r} I_j(r)
    scale = jnp.concatenate([jnp.ones(1, settings.dtype),
                             jnp.full((harmonics,), 2.0, settings.dtype)])
    return scale * i_scaled


class PeriodicLeaf(SSMLeaf):
    """SIN kernel (kernels.py SIN: v exp(-2 r sin^2(pi f tau))) as a
    truncated sum of ``harmonics`` cosine blocks plus a constant (j=0)
    state.  The truncation tail is sum_{j>J} 2 e^{-r} I_j(r) — below f32
    resolution for J >= ~r + 8."""

    def __init__(self, kernel, harmonics):
        self.kernel = kernel
        self.harmonics = int(harmonics)
        self.dim = 1 + 2 * self.harmonics

    def blocks(self, params, dt):
        v = jnp.asarray(hval(self.kernel.var, params),
                        settings.dtype).reshape(())
        f = jnp.asarray(hval(self.kernel.freq, params),
                        settings.dtype).reshape(())
        r = jnp.asarray(hval(self.kernel.rate, params),
                        settings.dtype).reshape(())
        c = periodic_coefficients(r, self.harmonics)
        n = dt.shape[0]
        s = self.dim
        a = jnp.zeros((n, s, s), settings.dtype)
        pinf = jnp.zeros((s, s), settings.dtype)
        h = np.zeros(s, settings.floatx)
        # j = 0: random constant (A = 1, Pinf = v c_0)
        a = a.at[:, 0, 0].set(1.0)
        pinf = pinf.at[0, 0].set(v * c[0])
        h[0] = 1.0
        for jh in range(1, self.harmonics + 1):
            o = 1 + 2 * (jh - 1)
            a = a.at[:, o:o + 2, o:o + 2].set(
                _rotation_stack(TWOPI * f * jh, dt))
            pinf = pinf.at[o, o].set(v * c[jh])
            pinf = pinf.at[o + 1, o + 1].set(v * c[jh])
            h[o] = 1.0
        return a, pinf, h


class ProductLeaf(SSMLeaf):
    """Kernel product via Kronecker state composition: for SSM kernels
    k1, k2 with blocks (A_i, P_i, H_i), the product kernel k1 k2 has
    blocks (A1 (x) A2, P1 (x) P2, H1 (x) H2) — then H A(tau) P H' =
    (H1 A1 P1 H1')(H2 A2 P2 H2') = k1(tau) k2(tau).  This is the
    quasi-periodic construction (Solin & Sarkka 2014): SIN * MAT32 gives
    a periodic pattern whose shape drifts on the Matern timescale."""

    def __init__(self, left, right):
        self.left = left
        self.right = right
        self.dim = left.dim * right.dim

    def blocks(self, params, dt):
        a1, p1, h1 = self.left.blocks(params, dt)
        a2, p2, h2 = self.right.blocks(params, dt)
        n = dt.shape[0]
        # Kronecker products as pure broadcasts (no contraction)
        a = (a1[:, :, None, :, None] * a2[:, None, :, None, :]).reshape(
            n, self.dim, self.dim)
        pinf = (p1[:, None, :, None] * p2[None, :, None, :]).reshape(
            self.dim, self.dim)
        h = np.kron(h1, h2).astype(settings.floatx)
        return a, pinf, h


def _leaf_of(k, harmonics):
    """One non-composite kernel -> SSMLeaf, or raise naming the part."""
    from ..hypers.kernels import (OU, MAT32, MAT52, COS, SIN, SE, SM,
                                  KernelProd)
    from ..hypers.metrics import ARD_L1, ARD_L2

    if isinstance(k, KernelProd):
        return ProductLeaf(_leaf_of(k.k1, harmonics),
                           _leaf_of(k.k2, harmonics))
    if isinstance(k, MAT32) or isinstance(k, MAT52):
        if type(k.metric) is not ARD_L2:
            raise ValueError(
                f"{type(k).__name__} needs its default ARD_L2 metric "
                "for the state-space form")
        fam = "mat32" if isinstance(k, MAT32) else "mat52"
        scale = np.sqrt(1.5) if fam == "mat32" else np.sqrt(2.5)
        return MaternLeaf(fam, k, scale, 2 if fam == "mat32" else 3)
    if isinstance(k, OU):
        if type(k.metric) is not ARD_L1:
            raise ValueError(
                "OU needs its default ARD_L1 metric for the "
                "state-space form")
        return MaternLeaf("ou", k, 1.0, 1)
    if isinstance(k, SE):
        if type(k.metric) is not ARD_L2:
            raise ValueError(
                "SE needs its default ARD_L2 metric for the "
                "state-space form")
        return SELeaf(k, getattr(settings, "ssm_se_order", 8))
    if isinstance(k, SM):
        return SMLeaf(k, getattr(settings, "ssm_se_order", 8))
    if isinstance(k, COS):
        return CosLeaf(k)
    if isinstance(k, SIN):
        return PeriodicLeaf(k, harmonics)
    raise ValueError(
        f"kernel part {type(k).__name__} has no state-space "
        "form (supported: OU, MAT32, MAT52, SE/SM — approximate, order "
        "settings.ssm_se_order — COS, SIN and their sums/products; "
        "use the dense/sparse families otherwise)")


def ssm_leaves(kernel, harmonics=None):
    """Host-side walk of a kernel tree into :class:`SSMLeaf` blocks.
    Sums (KernelSum) become additive block-diagonal leaves; products
    (KernelProd) become Kronecker :class:`ProductLeaf`; supported
    atoms: OU, MAT32, MAT52, COS, SIN (truncated at ``harmonics``
    cosine terms, default ``settings.ssm_harmonics``)."""
    from ..hypers.kernels import KernelSum

    if harmonics is None:
        harmonics = getattr(settings, "ssm_harmonics", 7)
    out = []
    stack = [kernel]
    while stack:
        k = stack.pop(0)
        if isinstance(k, KernelSum):
            stack = [k.k1, k.k2] + stack
            continue
        out.append(_leaf_of(k, harmonics))
    return out


def ssm_blocks(leaves, params, dt, stationary_first=True):
    """Stack the additive kernel's leaf SSMs into one block-diagonal
    model over the step vector ``dt`` (n,): returns ``A`` (n, s, s),
    ``Q`` (n, s, s), ``Pinf`` (s, s), ``H`` (s,).  Row 0's A is ZEROED
    and its Q set to Pinf, encoding the exact stationary prior
    x_1 ~ N(0, Pinf) through the uniform filter element
    (``stationary_first=False`` skips that — the sharded NLL builds
    blocks per device, where only the GLOBAL first row is the prior)."""
    mats = [leaf.blocks(params, dt) for leaf in leaves]
    s = sum(leaf.dim for leaf in leaves)
    n = dt.shape[0]
    a = jnp.zeros((n, s, s), settings.dtype)
    pinf = jnp.zeros((s, s), settings.dtype)
    h = np.zeros((s,), settings.floatx)
    off = 0
    for leaf, (a_l, p_l, h_l) in zip(leaves, mats):
        d = leaf.dim
        a = a.at[:, off:off + d, off:off + d].set(a_l)
        pinf = pinf.at[off:off + d, off:off + d].set(p_l)
        h[off:off + d] = h_l
        off += d
    # Q = Pinf - A Pinf A' is a cancellation-prone difference (Q -> 0 as
    # dt -> 0): _bmm keeps the products in native full f32 (see _bmm)
    q = pinf[None] - _bmm(a, _bmm(jnp.broadcast_to(pinf, a.shape),
                                  _bt(a)))
    if stationary_first:
        # the first step starts from the stationary prior exactly
        a = a.at[0].set(0.0)
        q = q.at[0].set(pinf)
    return a, q, pinf, jnp.asarray(h)


def ssm_blocks_multi(leaf_sets, params, dt, stationary_first=True):
    """Block-diagonal stack of Q independent latent SSMs (the state model
    behind the LMC-mixed multi-output state-space GP): returns
    ``A`` (n, S, S), ``Q`` (n, S, S), ``Pinf`` (S, S) and ``Hq`` (Q, S),
    where ``S = sum_q s_q`` and row q of ``Hq`` carries latent q's
    emission vector in its own state segment (zeros elsewhere) — so an
    event row observing output p emits through
    ``h_row = sum_q W[p, q] Hq[q]``.

    ``leaf_sets`` entries may repeat the SAME list object (shared-kernel
    latents); identical sets are materialized once and replicated into
    their diagonal blocks."""
    mats, cache = [], {}
    for leaves in leaf_sets:
        key = id(leaves)
        if key not in cache:
            cache[key] = ssm_blocks(leaves, params, dt,
                                    stationary_first=stationary_first)
        mats.append(cache[key])
    dims = [int(m[3].shape[0]) for m in mats]
    s_tot = sum(dims)
    n = dt.shape[0]
    a = jnp.zeros((n, s_tot, s_tot), settings.dtype)
    q = jnp.zeros((n, s_tot, s_tot), settings.dtype)
    pinf = jnp.zeros((s_tot, s_tot), settings.dtype)
    hq = jnp.zeros((len(leaf_sets), s_tot), settings.dtype)
    off = 0
    for i, (a_l, q_l, p_l, h_l) in enumerate(mats):
        d = dims[i]
        a = a.at[:, off:off + d, off:off + d].set(a_l)
        q = q.at[:, off:off + d, off:off + d].set(q_l)
        pinf = pinf.at[off:off + d, off:off + d].set(p_l)
        hq = hq.at[i, off:off + d].set(h_l)
        off += d
    return a, q, pinf, hq


def _bmm(x, y):
    """Batched tiny-matrix multiply as VPU multiply+reduce.

    The state blocks are (s, s) with s <= ~32, batched over n rows.  On
    TPU, ``jnp.einsum`` at default precision rounds through bf16 (the
    recursion compounds to ~1e-3 relative NLL error at n=2k), while
    ``precision='highest'`` triggers the 6-pass f32 MXU emulation —
    measured 160x slower at these shapes (6.8ms -> 1077ms for the n=16k
    filter scan).  Broadcast-multiply-reduce runs on the VPU in native
    full f32: accurate AND fast.

    In theory LARGE states (the spatio-temporal family, S = m_sites *
    s_t) should flip the verdict — the multiply-reduce materializes an
    (n, s, s, s) intermediate, O(n s^3) HBM traffic, vs O(n s^2) reads
    for the MXU — but MEASURED on this runtime the VPU wins at every S
    (benchmarks/ssm_state_dim_ab.py: S=64 n=16k filter 692ms VPU vs
    4698ms MXU; tiny batched matmuls dispatch poorly on the emulated
    MXU, same pathology as the slow XLA matrix TRSM).  The dispatch
    stays behind ``settings.ssm_mxu_state_dim`` (default off at 10_000)
    for runtimes with healthy small-matmul paths; both branches are
    exact f32 ('highest' = the 6-pass exact emulation)."""
    if x.shape[-1] >= settings.ssm_mxu_state_dim:
        return jnp.matmul(x, y, precision="highest")
    return jnp.sum(x[..., :, :, None] * y[..., None, :, :], axis=-2)


def _bmv(x, v):
    """Batched tiny matrix @ vector: (..., s, s) x (..., s) -> (..., s)."""
    return jnp.sum(x * v[..., None, :], axis=-1)


def _bvm(v, x):
    """Batched vector @ matrix (x' v): (..., s) x (..., s, s) -> (..., s)."""
    return jnp.sum(x * v[..., :, None], axis=-2)


def _bt(x):
    return jnp.swapaxes(x, -1, -2)


def small_inv(m):
    """Batched inverse of small well-conditioned matrices by UNROLLED
    Gauss-Jordan (no pivoting).  XLA's tiny-batched LU path (what
    ``jnp.linalg.solve`` lowers to) is catastrophically slow on TPU —
    row-loop with dynamic slices per scan stage; this is s fused
    elementwise passes instead.  No pivoting is safe here: every matrix
    inverted in the Kalman combines is I + (PSD)(PSD) or a PD predicted
    covariance, strongly diagonally dominant."""
    s = m.shape[-1]
    eye = jnp.eye(s, dtype=m.dtype)
    aug = jnp.concatenate(
        [m, jnp.broadcast_to(eye, m.shape)], axis=-1)   # (..., s, 2s)
    for i in range(s):
        piv = aug[..., i:i + 1, i:i + 1]
        row = aug[..., i:i + 1, :] / piv
        col = aug[..., :, i:i + 1]
        # one update clears column i in all other rows AND normalizes
        # row i: for row i the update is aug_i - (piv-1)·row = row
        aug = aug - (col - eye[:, i:i + 1]) * row
    return aug[..., s:]


def small_chol(m):
    """Batched tiny-matrix Cholesky, unrolled (Cholesky-Banachiewicz),
    PSD-SINGULAR-safe: a zero pivot produces a zero factor column instead
    of NaN — exact for the rotation blocks whose Q is identically 0
    (COS/SIN harmonics) and for the dt=0 duplicate-time rows."""
    s = m.shape[-1]
    idx = jnp.arange(s)
    l = jnp.zeros_like(m)
    for j in range(s):
        d = m[..., j, j] - jnp.sum(l[..., j, :] ** 2, axis=-1)
        dsafe = jnp.sqrt(jnp.maximum(d, 0.0))
        inv = jnp.where(dsafe > 0.0, 1.0 /
                        jnp.where(dsafe > 0.0, dsafe, 1.0), 0.0)
        col = (m[..., :, j]
               - jnp.sum(l * l[..., j:j + 1, :], axis=-1)) * inv[..., None]
        l = l.at[..., :, j].set(jnp.where(idx > j, col, 0.0))
        l = l.at[..., j, j].set(dsafe)
    return l


def ssm_prior_state_sample(a, q, key):
    """One joint draw of the latent state trajectory x ~ N(0, SSM prior):
    the linear recurrence x_k = A_k x_{k-1} + w_k, w_k ~ N(0, Q_k), runs
    as ONE associative scan over (A, w) pairs with composition
    (A2 A1, A2 w1 + w2) — O(log n) depth like the filter.  Row 0's
    (A=0, Q=Pinf) convention makes x_1 ~ N(0, Pinf) exactly."""
    n, s, _ = a.shape
    eps = jax.random.normal(key, (n, s), dtype=a.dtype)
    w = _bmv(small_chol(q), eps)

    def comb(e1, e2):
        a1, b1 = e1
        a2, b2 = e2
        return _bmm(a2, a1), _bmv(a2, b1) + b2

    _, x = lax.associative_scan(comb, (a, w))
    return x


def _filter_elements(a, q, h, r, y, obs):
    """Per-step associative filtering elements (Sarkka & G-F 2021 eq. 10)
    for a SCALAR measurement y_k = h'x_k + N(0, r), with ``obs`` masking
    rows that carry no observation (prediction-only time points).

    ``h`` may be a shared (s,) vector or PER-ROW (n, s) — the latter is
    how the multi-output (LMC-mixed) state-space GP observes one output
    channel per event row: h_k = sum_q W[p_k, q] H_q.  ``r`` likewise is
    a scalar or a per-row (n,) vector (per-output noise variances)."""
    hb = jnp.broadcast_to(h, a.shape[:-1])             # (n, s)
    qh = _bmv(q, hb)                                   # Q H'
    s = jnp.sum(qh * hb, axis=-1) + r                  # H Q H' + r
    k = qh / s[:, None]                                # gain (n, s)
    k = jnp.where(obs[:, None], k, 0.0)
    eye = jnp.eye(a.shape[-1], dtype=a.dtype)
    ikh = eye[None] - k[:, :, None] * hb[:, None, :]
    a_e = _bmm(ikh, a)
    b_e = k * y[:, None]
    c_e = _bmm(ikh, q)
    ah = _bvm(hb, a)                                   # A' H
    w = jnp.where(obs, 1.0 / s, 0.0)
    eta = ah * (w * y)[:, None]
    j_e = ah[:, :, None] * ah[:, None, :] * w[:, None, None]
    return a_e, b_e, c_e, eta, j_e


def _filter_combine(e1, e2):
    """Associative combination of filtering elements (earlier, later)."""
    a1, b1, c1, n1, j1 = e1
    a2, b2, c2, n2, j2 = e2
    s = a1.shape[-1]
    eye = jnp.eye(s, dtype=a1.dtype)
    m = eye[None] + _bmm(c1, j2)
    # C1, J2 are symmetric, so Mt = I + J2 C1 = M' — ONE inverse serves
    # both solve groups (and small_inv beats the tiny-batched LU path)
    minv = small_inv(m)
    mtinv = _bt(minv)
    a = _bmm(a2, _bmm(minv, a1))
    b = _bmv(a2, _bmv(minv, b1 + _bmv(c1, n2))) + b2
    minv_c1 = _bmm(minv, c1)
    c = _bmm(a2, _bmm(minv_c1, _bt(a2))) + c2
    w = _bmv(mtinv, n2 - _bmv(j2, b1))
    eta = _bvm(w, a1) + n1
    j = _bmm(_bt(a1), _bmm(_bmm(mtinv, j2), a1)) + j1
    return a, b, c, eta, j


def parallel_kalman_filter(a, q, h, r, y, obs=None):
    """Parallel-in-time Kalman filter: returns filtered means (n, s) and
    covariances (n, s, s) via one ``associative_scan`` (log-depth)."""
    if obs is None:
        obs = jnp.ones(y.shape, bool)
    elems = _filter_elements(a, q, h, r, y, obs)
    _, m_f, p_f, _, _ = lax.associative_scan(_filter_combine, elems)
    return m_f, p_f


def parallel_kalman_nll(a, q, h, r, y, obs=None):
    """Exact negative log marginal likelihood -log p(y) of the LGSSM,
    plus the filtered moments: ``(nll, m_f, P_f)``.

    The per-step terms log N(y_k; H m_k^-, H P_k^- H' + r) are computed
    pointwise from the scan's filtered output shifted by one step — the
    whole NLL is two O(log n)-depth passes, no sequential loop.

    ``h``/``r`` may be per-row ((n, s) / (n,)) — see _filter_elements."""
    if obs is None:
        obs = jnp.ones(y.shape, bool)
    m_f, p_f = parallel_kalman_filter(a, q, h, r, y, obs)
    mu, sig = _innovation_moments(a, q, h, r, m_f, p_f)
    ll = -0.5 * (LOG2PI + jnp.log(sig) + (y - mu) ** 2 / sig)
    return -jnp.sum(jnp.where(obs, ll, 0.0)), m_f, p_f


def _innovation_moments(a, q, h, r, m_f, p_f):
    """Per-row one-step-ahead predictive moments (mu_k, sig_k) from the
    filtered moments shifted by one step; ``h``/``r`` may be per-row."""
    m_prev = jnp.concatenate([jnp.zeros_like(m_f[:1]), m_f[:-1]], axis=0)
    p_prev = jnp.concatenate([jnp.zeros_like(p_f[:1]), p_f[:-1]], axis=0)
    m_pred = _bmv(a, m_prev)
    p_pred = _bmm(a, _bmm(p_prev, _bt(a))) + q
    hb = jnp.broadcast_to(h, a.shape[:-1])
    mu = jnp.sum(m_pred * hb, axis=-1)
    sig = jnp.sum(_bmv(p_pred, hb) * hb, axis=-1) + r
    return mu, sig


def parallel_kalman_quad_logdet(a, q, h, r, y, obs=None):
    """(quad, logdet) split of the Gaussian NLL's innovation
    decomposition: ``logdet = sum_k log sig_k = log det(K + diag(r))``
    and ``quad = sum_k v_k^2 / sig_k = y' (K + diag(r))^{-1} y`` —
    the Kalman innovations ARE the LDL factorization of the dense
    marginal covariance, so elliptical (Student-t) and warped densities
    over the SAME covariance need only these two scalars (the O(n)
    counterpart of ``ops/linalg.mvn_quad_logdet``'s (beta, logdet_half)
    pair; note logdet here is the FULL log-determinant, not the
    half)."""
    if obs is None:
        obs = jnp.ones(y.shape, bool)
    m_f, p_f = parallel_kalman_filter(a, q, h, r, y, obs)
    mu, sig = _innovation_moments(a, q, h, r, m_f, p_f)
    quad = jnp.sum(jnp.where(obs, (y - mu) ** 2 / sig, 0.0))
    logdet = jnp.sum(jnp.where(obs, jnp.log(sig), 0.0))
    return quad, logdet


def _filter_identity(s, n, dtype):
    """The filter monoid's identity element batched to n rows:
    (A=I, b=0, C=0, eta=0, J=0) — combine(identity, e) == e (verified
    algebraically; tested)."""
    eye = jnp.broadcast_to(jnp.eye(s, dtype=dtype), (n, s, s))
    z_v = jnp.zeros((n, s), dtype)
    z_m = jnp.zeros((n, s, s), dtype)
    return eye, z_v, z_m, z_v, z_m


def _rows_hr(idxb, rows):
    """Per-row emission vectors and noise variances for a block of
    output indices ``idxb`` (chunk,) from ``rows = (w, hq, r_vec)``:
    ``h_k = sum_q W[p_k, q] Hq[q]`` (the LMC-mixed multi-output SSM),
    ``r_k = r_vec[p_k]``.  Built INSIDE scan bodies so no full-length
    (n, s) tensor ever exists (the T(8, 128) lane-padding blowup —
    see chunked_kalman_nll's layout note); the tiny-Q contraction is a
    VPU multiply-reduce (``_bmm`` rationale)."""
    w, hq, r_vec = rows
    hb = jnp.sum(w[idxb][:, :, None] * hq[None], axis=1)   # (chunk, s)
    return hb, r_vec[idxb]


def chunked_kalman_nll(a, q, h, r, y, obs=None, chunk=262_144, rows=None,
                       blocks_fn=None, dt=None, pinf=None, split=False):
    """Exact LGSSM NLL with O(chunk) activation memory: ``lax.scan``
    over blocks of ``chunk`` rows, a rematerialized associative scan
    inside each block, the running prefix element carried across blocks
    (the filter elements form a monoid, so blocking is exact).

    Differentiating the plain parallel filter stores every scan level —
    ~2x the element tensors PLUS per-level residuals, which at N=1e7
    exceeds one chip's HBM (measured: the N=1e7 grad compile OOM-kills
    the compile helper while N=1e6 runs in 128.7 ms).  Here backward
    memory is one block's scan plus nc tiny carries; wall cost is one
    recompute of the forward per block.

    Returns the NLL only (training path); use the plain filter+smoother
    for posterior statistics at serving sizes.

    The filter ELEMENTS are built inside the scan body from each block's
    (A, Q, y) slice — full-length (n, s) element tensors must never
    exist: XLA lays them out in T(8, 128) tiles with the size-s axis on
    the 128 lanes, a 128/s padding blowup (measured 42.7x at s=3 —
    three 4.88 GB copies of 117 MB tensors OOM'd the N=1e7 backward).
    (n, s, s) inputs get the benign n-minor layout (~1.3x).

    ``rows=(idx, w, hq, r_vec)`` is the PER-ROW-EMISSION form (the
    LMC-mixed multi-output SSM): ``idx`` (n,) int32 output index per
    event row, ``w`` (P, Q) mixing, ``hq`` (Q, s) latent emission rows,
    ``r_vec`` (P,) per-output noise variances.  ``h``/``r`` are ignored;
    each block's h/r are built inside the scan body (``_rows_hr``) so
    the (n, s) per-row tensor never materializes — only the layout-safe
    (n,) index rides the scan.

    ``blocks_fn=(dt_block -> (A, Q))`` with ``dt`` (n,) and ``pinf``
    (s, s) is the BLOCKS-ON-THE-FLY form for LARGE state dims (the
    spatio-temporal families, S = m * s_t): the (n, S, S) transition
    stacks — 16 GB at S=64, n=1e6 — are never materialized; each block
    builds its own from the layout-safe step vector (typically
    ``lambda d: ssm_blocks(leaves, params, d, stationary_first=False)
    [:2]``).  The global first row's stationary prior and the pad rows'
    identity elements are applied here, so ``blocks_fn`` stays the
    plain per-row discretization.

    ``rows=(payload_T, rows_fn)`` with a CALLABLE second element is the
    PAYLOAD form of per-row emissions (interpolated emissions — the
    sparse spatio-temporal family): ``payload_T`` (k, n) carries each
    row's features TRANSPOSED (n on the 128-lane axis — the (n, k)
    layout would pad k up to 128 lanes, the same T(8, 128) blowup as
    the (n, s) element tensors), and ``rows_fn(payload_block (k, c))
    -> (h (c, s), r (c,))`` builds the block's emissions inside the
    scan body.

    ``split=True`` returns the ``(quad, logdet)`` innovation split
    instead of the folded NLL (see
    :func:`parallel_kalman_quad_logdet`) — the elliptical/warped
    families' beyond-HBM path."""
    n = y.shape[0]
    if obs is None:
        obs = jnp.ones(n, bool)
    s = a.shape[-1] if blocks_fn is None else pinf.shape[-1]
    chunk = int(min(chunk, n))
    nc = -(-n // chunk)
    pad = nc * chunk - n
    payload_mode = rows is not None and callable(rows[1])
    if rows is None:
        feed = None
    elif payload_mode:
        feed = jnp.asarray(rows[0])
    else:
        feed = jnp.asarray(rows[0], jnp.int32)
    if pad:
        # TRUE identity-element padding (A=I, Q=0, obs=False -> filter
        # element (I, 0, 0, 0, 0)): pads cannot perturb any prefix, and
        # their masked NLL terms stay finite (sig = h'P_prev h + r > 0)
        if blocks_fn is None:
            a = jnp.concatenate([a, jnp.broadcast_to(
                jnp.eye(s, dtype=a.dtype), (pad, s, s))])
            q = jnp.concatenate([q, jnp.zeros((pad, s, s), q.dtype)])
        else:
            dt = jnp.concatenate([dt, jnp.zeros(pad, dt.dtype)])
        y = jnp.concatenate([y, jnp.zeros(pad, y.dtype)])
        obs = jnp.concatenate([obs, jnp.zeros(pad, bool)])
        if payload_mode:
            # replicate a REAL row's payload: rows_fn stays in-domain
            # (r > 0), the obs mask removes the padded terms
            feed = jnp.concatenate([feed, jnp.broadcast_to(
                feed[:, :1], (feed.shape[0], pad))], axis=1)
        elif feed is not None:
            feed = jnp.concatenate([feed, jnp.zeros(pad, jnp.int32)])
    if blocks_fn is None:
        aq_blocks = (a.reshape(nc, chunk, s, s),
                     q.reshape(nc, chunk, s, s),
                     y.reshape(nc, chunk), obs.reshape(nc, chunk))
    else:
        aq_blocks = (dt.reshape(nc, chunk), jnp.arange(nc),
                     y.reshape(nc, chunk), obs.reshape(nc, chunk))
    if feed is not None:
        fb = (jnp.moveaxis(feed.reshape(-1, nc, chunk), 1, 0)
              if payload_mode else feed.reshape(nc, chunk))
        aq_blocks = aq_blocks + (fb,)

    @jax.checkpoint
    def body(carry, xs):
        prev, nll_acc = carry                    # prefix at block start
        if blocks_fn is None:
            ab, qb, yb, ob = xs[:4]
        else:
            dtb, bi, yb, ob = xs[:4]
            ab, qb = blocks_fn(dtb)
            # pad rows (last block only) -> the monoid identity
            valid = ((bi * chunk + jnp.arange(chunk))
                     < n)[:, None, None]
            eye_s = jnp.eye(s, dtype=ab.dtype)
            ab = jnp.where(valid, ab, eye_s[None])
            qb = jnp.where(valid, qb, jnp.zeros_like(qb))
            # only the GLOBAL first row starts from the stationary prior
            fb = bi == 0
            ab = ab.at[0].set(jnp.where(fb, jnp.zeros_like(ab[0]),
                                        ab[0]))
            qb = qb.at[0].set(jnp.where(fb, jnp.asarray(
                pinf, qb.dtype), qb[0]))
        if rows is None:
            hb, rb = h, r
        elif payload_mode:
            hb, rb = rows[1](xs[4])
        else:
            hb, rb = _rows_hr(xs[4], rows[1:])
        eb = _filter_elements(ab, qb, hb, rb, yb, ob)
        pref = lax.associative_scan(_filter_combine, eb)
        carry_b = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (chunk,) + x.shape), prev)
        full = _filter_combine(carry_b, pref)    # earlier prefix ∘ block
        m_f, p_f = full[1], full[2]
        # predicted moments: previous row's filtered state (the block's
        # first row predicts from the carried prefix)
        m_prev = jnp.concatenate([prev[1][None], m_f[:-1]], axis=0)
        p_prev = jnp.concatenate([prev[2][None], p_f[:-1]], axis=0)
        m_pred = _bmv(ab, m_prev)
        p_pred = _bmm(ab, _bmm(p_prev, _bt(ab))) + qb
        mu = jnp.sum(m_pred * hb, axis=-1)
        sig = jnp.sum(_bmv(p_pred, hb) * hb, axis=-1) + rb
        new_prev = jax.tree.map(lambda x: x[-1], full)
        if split:
            # (quad, logdet) split — separate sums, same per-row terms
            quad_b = jnp.sum(jnp.where(ob, (yb - mu) ** 2 / sig, 0.0))
            ld_b = jnp.sum(jnp.where(ob, jnp.log(sig), 0.0))
            return (new_prev,
                    nll_acc + jnp.stack([quad_b, ld_b])), None
        ll = -0.5 * (LOG2PI + jnp.log(sig) + (yb - mu) ** 2 / sig)
        nll_b = -jnp.sum(jnp.where(ob, ll, 0.0))
        return (new_prev, nll_acc + nll_b), None

    init = (jax.tree.map(lambda x: x[0],
                         _filter_identity(s, 1, y.dtype)),
            jnp.zeros(2 if split else (), y.dtype))
    (_, acc), _ = lax.scan(body, init, aq_blocks)
    if split:
        return acc[0], acc[1]
    return acc


def chunked_smoother_diag(a, q, h, r, y, obs=None, chunk=262_144,
                          rows=None, blocks_fn=None, dt=None, pinf=None):
    """H-projected smoothed posterior (mean, var), each (n,), with
    O(chunk) live memory — the beyond-HBM SERVING path.

    Two block passes, both exact (the filter elements and the RTS
    smoothing elements each form a monoid):

    1. forward ``lax.scan`` over blocks storing only the nc tiny
       block-START filter prefixes;
    2. backward ``lax.scan`` over blocks: recompute the local filter
       from the stored prefix, build the local smoothing elements
       (the block's last row uses the NEXT block's first (A, Q); the
       global last row gets (0, m_f, P_f) — the pad rows' A=0 make
       that automatic), reverse-scan them locally, and fold in the
       suffix element carried from the later blocks.

    Emitting only the scalar projections H'm_s and H'P_s H avoids
    materializing ANY full-length (n, s) tensor — which XLA tiles as
    T(8, 128) with the size-s axis padded onto the 128 lanes, a 128/s
    memory blowup (see chunked_kalman_nll; measured 42.7x at s=3).

    Padding rows (A=0, Q=I, obs=False) leave real rows' smoothed
    moments untouched: unobserved future rows never change a smoothed
    marginal, and A=0 terminates the backward recursion with the
    filtered moments exactly as the plain ``parallel_smoother`` does.

    ``rows=(idx, w, hq, r_vec)``: per-row-emission (multi-output) form,
    see :func:`chunked_kalman_nll` — the returned mean/var are then the
    per-row MIXED projections h_k' m_s / h_k' P_s h_k.

    ``blocks_fn``/``dt``/``pinf``: blocks-on-the-fly form for large
    state dims; ``rows=(payload_T, rows_fn)``: payload form of per-row
    emissions — see :func:`chunked_kalman_nll` for both."""
    n = y.shape[0]
    if obs is None:
        obs = jnp.ones(n, bool)
    s = a.shape[-1] if blocks_fn is None else pinf.shape[-1]
    chunk = int(min(chunk, n))
    nc = -(-n // chunk)
    pad = nc * chunk - n
    payload_mode = rows is not None and callable(rows[1])
    if rows is None:
        feed = None
    elif payload_mode:
        feed = jnp.asarray(rows[0])
    else:
        feed = jnp.asarray(rows[0], jnp.int32)
    if pad:
        if blocks_fn is None:
            a = jnp.concatenate([a, jnp.zeros((pad, s, s), a.dtype)])
            q = jnp.concatenate([q, jnp.broadcast_to(
                jnp.eye(s, dtype=q.dtype), (pad, s, s))])
        else:
            dt = jnp.concatenate([dt, jnp.zeros(pad, dt.dtype)])
        y = jnp.concatenate([y, jnp.zeros(pad, y.dtype)])
        obs = jnp.concatenate([obs, jnp.zeros(pad, bool)])
        if payload_mode:
            feed = jnp.concatenate([feed, jnp.broadcast_to(
                feed[:, :1], (feed.shape[0], pad))], axis=1)
        elif feed is not None:
            feed = jnp.concatenate([feed, jnp.zeros(pad, jnp.int32)])
    if blocks_fn is None:
        blocks = (a.reshape(nc, chunk, s, s), q.reshape(nc, chunk, s, s),
                  y.reshape(nc, chunk), obs.reshape(nc, chunk))
    else:
        blocks = (dt.reshape(nc, chunk), jnp.arange(nc),
                  y.reshape(nc, chunk), obs.reshape(nc, chunk))
    if feed is not None:
        fb = (jnp.moveaxis(feed.reshape(-1, nc, chunk), 1, 0)
              if payload_mode else feed.reshape(nc, chunk))
        blocks = blocks + (fb,)
    # each block's smoothing tail needs the NEXT block's first (A, Q);
    # the last block gets the pad convention (A=0, Q=I) so the global
    # final smoothing element reduces to (0, m_f, P_f)
    if blocks_fn is None:
        a_next = jnp.concatenate([blocks[0][1:, 0],
                                  jnp.zeros((1, s, s), a.dtype)])
        q_next = jnp.concatenate([blocks[1][1:, 0],
                                  jnp.eye(s, dtype=q.dtype)[None]])
    else:
        # next-first rows are always REAL rows (pads only ever pad the
        # last block's tail, and nc*chunk - n < chunk)
        an_r, qn_r = blocks_fn(blocks[0][1:, 0])
        a_next = jnp.concatenate([an_r,
                                  jnp.zeros((1, s, s), an_r.dtype)])
        q_next = jnp.concatenate([qn_r,
                                  jnp.eye(s, dtype=qn_r.dtype)[None]])

    def _block_hr(ib):
        if rows is None:
            return h, r
        if payload_mode:
            return rows[1](ib)
        return _rows_hr(ib, rows[1:])

    def _block_aq(xs):
        """(ab, qb, yb, ob, ib) from one block's scan slice, building
        A/Q on the fly (with pad + global-prior fixes) when asked."""
        if blocks_fn is None:
            ab, qb, yb, ob = xs[:4]
        else:
            dtb, bi, yb, ob = xs[:4]
            ab, qb = blocks_fn(dtb)
            valid = ((bi * chunk + jnp.arange(chunk))
                     < n)[:, None, None]
            eye_s = jnp.eye(s, dtype=ab.dtype)
            ab = jnp.where(valid, ab, jnp.zeros_like(ab))
            qb = jnp.where(valid, qb, eye_s[None])
            fb = bi == 0
            ab = ab.at[0].set(jnp.where(fb, jnp.zeros_like(ab[0]),
                                        ab[0]))
            qb = qb.at[0].set(jnp.where(fb, jnp.asarray(
                pinf, qb.dtype), qb[0]))
        ib = xs[4] if rows is not None else None
        return ab, qb, yb, ob, ib

    def local_filter(start_c, ab, qb, yb, ob, ib=None):
        hb, rb = _block_hr(ib)
        eb = _filter_elements(ab, qb, hb, rb, yb, ob)
        pref = lax.associative_scan(_filter_combine, eb)
        carry_b = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (chunk,) + x.shape),
            start_c)
        return _filter_combine(carry_b, pref)

    def fwd(carry, xs):
        full = local_filter(carry, *_block_aq(xs))
        return jax.tree.map(lambda x: x[-1], full), carry

    ident_f = jax.tree.map(lambda x: x[0],
                           _filter_identity(s, 1, y.dtype))
    _, starts = lax.scan(fwd, ident_f, blocks)      # (nc, ...) tiny

    def bwd(suffix, xs):
        start_c, *rest = xs
        an, qn = rest[-2:]
        ab, qb, yb, ob, ib = _block_aq(tuple(rest[:-2]))
        hb, _rb = _block_hr(ib)
        full = local_filter(start_c, ab, qb, yb, ob, ib)
        m_f, p_f = full[1], full[2]
        a_n = jnp.concatenate([ab[1:], an[None]], axis=0)
        q_n = jnp.concatenate([qb[1:], qn[None]], axis=0)
        p_pred = _bmm(a_n, _bmm(p_f, _bt(a_n))) + q_n
        e_k = _bmm(p_f, _bmm(_bt(a_n), small_inv(p_pred)))
        g_k = m_f - _bmv(e_k, _bmv(a_n, m_f))
        l_k = p_f - _bmm(e_k, _bmm(p_pred, _bt(e_k)))
        suf = lax.associative_scan(_smoother_combine, (e_k, g_k, l_k),
                                   reverse=True)
        suffix_b = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (chunk,) + x.shape),
            suffix)
        total = _smoother_combine(suffix_b, suf)
        hrow = jnp.broadcast_to(hb, (chunk, s))
        mean_b = jnp.sum(total[1] * hrow, axis=-1)
        var_b = jnp.sum(jnp.sum(total[2] * hrow[:, None, :], axis=-1)
                        * hrow, axis=-1)
        new_suffix = jax.tree.map(lambda x: x[0], total)
        return new_suffix, (mean_b, var_b)

    ident_s = (jnp.eye(s, dtype=y.dtype), jnp.zeros(s, y.dtype),
               jnp.zeros((s, s), y.dtype))
    _, (mean, var) = lax.scan(bwd, ident_s,
                              (starts,) + blocks + (a_next, q_next),
                              reverse=True)
    return mean.reshape(-1)[:n], var.reshape(-1)[:n]


_sharded_nll_cache = {}


def _sharded_filter_nll(a_l, q_l, pinf, h, rr, y_l, obs_l, axis, n_dev,
                        split=False):
    """Per-shard tail of the time-axis-sharded NLL (runs INSIDE
    shard_map): local associative filter scan, all_gather of the D tiny
    per-shard monoid totals, static fold of the earlier shards' totals
    into this shard's carry, per-row predictive NLL terms, scalar psum.
    ``h`` may be shared (s,) or per-row (m_loc, s); ``rr`` scalar or
    per-row (m_loc,) — the multi-output (LMC-mixed) form.
    ``split=True`` psums the (quad, logdet) innovation pair instead of
    the folded NLL (elliptical/warped families)."""
    idx = lax.axis_index(axis)
    first = idx == 0
    # only the GLOBAL first row starts from the stationary prior
    a_l = a_l.at[0].set(jnp.where(first, jnp.zeros_like(a_l[0]),
                                  a_l[0]))
    q_l = q_l.at[0].set(jnp.where(first, pinf, q_l[0]))
    elems = _filter_elements(a_l, q_l, h, rr, y_l, obs_l)
    pref = lax.associative_scan(_filter_combine, elems)
    tot = jax.tree.map(lambda x: lax.all_gather(x[-1:], axis), pref)
    s = a_l.shape[-1]
    carry = _filter_identity(s, 1, a_l.dtype)
    for j in range(n_dev):                    # D static tiny combines
        ej = jax.tree.map(lambda x: x[j], tot)
        comb = _filter_combine(carry, ej)
        use = jnp.asarray(j, idx.dtype) < idx
        carry = jax.tree.map(lambda c, nw: jnp.where(use, nw, c),
                             carry, comb)
    mloc = y_l.shape[0]
    carry_b = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (mloc,) + x.shape[1:]), carry)
    full = _filter_combine(carry_b, pref)
    m_f, p_f = full[1], full[2]
    # predicted moments: previous row's filtered state; the shard's
    # first row predicts from the carried cross-device prefix
    m_prev = jnp.concatenate([carry[1], m_f[:-1]], axis=0)
    p_prev = jnp.concatenate([carry[2], p_f[:-1]], axis=0)
    m_pred = _bmv(a_l, m_prev)
    p_pred = _bmm(a_l, _bmm(p_prev, _bt(a_l))) + q_l
    hb = jnp.broadcast_to(h, a_l.shape[:-1])
    mu = jnp.sum(m_pred * hb, axis=-1)
    sig = jnp.sum(_bmv(p_pred, hb) * hb, axis=-1) + rr
    if split:
        quad = jnp.sum(jnp.where(obs_l, (y_l - mu) ** 2 / sig, 0.0))
        ld = jnp.sum(jnp.where(obs_l, jnp.log(sig), 0.0))
        return lax.psum(jnp.stack([quad, ld]), axis)
    ll = -0.5 * (LOG2PI + jnp.log(sig) + (y_l - mu) ** 2 / sig)
    return lax.psum(-jnp.sum(jnp.where(obs_l, ll, 0.0)), axis)


def sharded_ssm_nll(leaves, params, dt, r, y, obs=None, mesh=None,
                    axis="dp", split=False):
    """Time-axis-sharded exact LGSSM NLL over a device mesh (SPMD).

    The filtering elements form a monoid (Sarkka & Garcia-Fernandez
    2021), so the time axis shards like any prefix sum: each device
    builds the state blocks for ITS OWN rows (``ssm_blocks`` over the
    local dt slice — the O(n s^2) block tensors never exist unsharded),
    runs one local ``associative_scan``, and the only cross-device
    traffic is an ``all_gather`` of the D per-device monoid totals
    (D tiny (s, s) tensors riding ICI) plus the final scalar ``psum``
    of per-shard NLL terms.  Each device folds the totals of the
    devices before it into its carry, exactly as the chunked scan does
    across blocks — numerically identical combines, identical order.

    This is the multi-chip training objective for
    :meth:`~g3py_tpu.models.statespace.StateSpaceGP.nll_distributed`:
    exact GP NLL at N beyond one chip's HBM with per-device memory
    O(n/D · s^2).  Fully differentiable w.r.t. ``params`` and ``r``
    (plain autodiff through ``shard_map``; the collectives transpose).

    Rows must arrive time-sorted; ``dt`` is the step vector with
    ``dt[0] == 0`` (as in the single-chip path).  n not divisible by D
    is padded with dt=0 / obs=False rows, whose filter elements are the
    monoid identity (A=I from dt=0, gain masked to 0) and whose NLL
    terms are masked out."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from ..parallel.cholesky import _resolve_mesh

    mesh = _resolve_mesh(mesh, axis)
    n_dev = mesh.shape[axis]
    n = y.shape[0]
    if obs is None:
        obs = jnp.ones(n, bool)
    mrows = -(-n // n_dev)
    pad = mrows * n_dev - n
    if pad:
        dt = jnp.concatenate([dt, jnp.zeros(pad, dt.dtype)])
        y = jnp.concatenate([y, jnp.zeros(pad, y.dtype)])
        obs = jnp.concatenate([obs, jnp.zeros(pad, bool)])

    def body(dt_l, y_l, obs_l, p, rr):
        a_l, q_l, pinf, h = ssm_blocks(leaves, p, dt_l,
                                       stationary_first=False)
        return _sharded_filter_nll(a_l, q_l, pinf, h, rr, y_l, obs_l,
                                   axis, n_dev, split=split)

    # jit handles the scatter of replicated inputs onto the in_specs
    # shardings (a bare eager shard_map call asserts on the sharding
    # override); under an outer jit this inlines into the caller's
    # program, so the training objective stays ONE compiled SPMD program.
    # The jitted fn is cached per (leaves, mesh, axis) — jit's own cache
    # keys on function identity, so rebuilding it per call would retrace
    # and RECOMPILE the whole SPMD program on every eager call (compiles
    # run 20-300s over the hosted tunnel).
    key = (tuple(leaves), mesh, axis, bool(split))
    fn = _sharded_nll_cache.get(key)
    if fn is None:
        fn = jax.jit(shard_map(
            body, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(), P()),
            out_specs=P()))
        _sharded_nll_cache[key] = fn
    params_j = {k: jnp.asarray(v) for k, v in params.items()}
    return fn(jnp.asarray(dt), jnp.asarray(y), obs, params_j,
              jnp.asarray(r, dt.dtype))


def sharded_ssm_nll_multi(leaf_sets, params, dt, idx, y, mix_fn,
                          obs=None, mesh=None, axis="dp"):
    """Time-axis-sharded exact NLL for the LMC-mixed MULTI-OUTPUT
    state-space GP (:class:`~g3py_tpu.models.statespace
    .MultiStateSpaceGP`): the per-row-emission form of
    :func:`sharded_ssm_nll`.  Each device builds the block-diagonal
    latent stack for ITS rows (``ssm_blocks_multi`` over the local dt
    slice) and its rows' emission vectors ``h_k = sum_q W[p_k, q] Hq[q]``
    / noise ``r_vec[p_k]`` from the local index shard — collective
    traffic is unchanged (one all_gather of D (S, S) monoid totals +
    scalar psum).

    ``idx`` (n,) int32 output index per time-sorted row; ``mix_fn`` maps
    the params dict to ``(w (P, Q), r_vec (P,))`` and must be a stable
    per-model callable (it keys the jit cache alongside the leaf sets).
    Fully differentiable w.r.t. ``params``."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from ..parallel.cholesky import _resolve_mesh

    mesh = _resolve_mesh(mesh, axis)
    n_dev = mesh.shape[axis]
    n = y.shape[0]
    if obs is None:
        obs = jnp.ones(n, bool)
    idx = jnp.asarray(idx, jnp.int32)
    mrows = -(-n // n_dev)
    pad = mrows * n_dev - n
    if pad:
        dt = jnp.concatenate([dt, jnp.zeros(pad, dt.dtype)])
        y = jnp.concatenate([y, jnp.zeros(pad, y.dtype)])
        obs = jnp.concatenate([obs, jnp.zeros(pad, bool)])
        idx = jnp.concatenate([idx, jnp.zeros(pad, jnp.int32)])

    def body(dt_l, y_l, obs_l, idx_l, p):
        a_l, q_l, pinf, hq = ssm_blocks_multi(leaf_sets, p, dt_l,
                                              stationary_first=False)
        w, r_vec = mix_fn(p)
        h = jnp.sum(w[idx_l][:, :, None] * hq[None], axis=1)
        rr = r_vec[idx_l]
        return _sharded_filter_nll(a_l, q_l, pinf, h, rr, y_l, obs_l,
                                   axis, n_dev)

    key = (tuple(tuple(ls) for ls in leaf_sets), mix_fn, mesh, axis)
    fn = _sharded_nll_cache.get(key)
    if fn is None:
        fn = jax.jit(shard_map(
            body, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis), P()),
            out_specs=P()))
        _sharded_nll_cache[key] = fn
    params_j = {k: jnp.asarray(v) for k, v in params.items()}
    return fn(jnp.asarray(dt), jnp.asarray(y), obs, idx, params_j)


def sharded_ssm_nll_payload(build_fn, params, dt, payload_T, y, obs=None,
                            mesh=None, axis="dp"):
    """Time-axis-sharded exact NLL with PAYLOAD-FORM per-row emissions —
    the sharded counterpart of :func:`chunked_kalman_nll`'s
    ``rows=(payload_T, rows_fn)`` form (the sparse spatio-temporal
    family, interpolated emissions): each device builds its (A, Q)
    blocks from its LOCAL dt slice and its rows' emission vectors /
    noise variances from the LOCAL payload shard, so neither the
    (n, S, S) transition stacks nor the (n, m) weight rows ever exist
    unsharded.  Collective traffic is unchanged from
    :func:`sharded_ssm_nll`: one all_gather of D tiny (S, S) monoid
    totals + the final scalar psum.

    ``payload_T`` (k, n) carries per-row features TRANSPOSED (n on the
    128-lane axis — see chunked_kalman_nll's layout note) and shards
    along its second axis.  ``build_fn(params, dt_l (m,), payload_l
    (k, m)) -> (a_l, q_l, pinf, h_l (m, s), r_l (m,))`` must be a STABLE
    per-model callable (it keys the jit cache; rebuilding it per call
    would recompile the SPMD program every eager call).  Replicated
    per-device setup inside build_fn (e.g. the m x m spatial Cholesky)
    is fine — it is O(m^3) against the O(n/D) row work.

    Rows must arrive time-sorted with ``dt[0] == 0``.  n not divisible
    by D pads with dt=0 / obs=False rows whose payload replicates a real
    row (build_fn stays in-domain, r > 0; the obs mask removes their
    NLL terms and zeros their gain, and A(0)=I, Q(0)=0 make them monoid
    identities).  Fully differentiable w.r.t. ``params``."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from ..parallel.cholesky import _resolve_mesh

    mesh = _resolve_mesh(mesh, axis)
    n_dev = mesh.shape[axis]
    n = y.shape[0]
    if obs is None:
        obs = jnp.ones(n, bool)
    payload_T = jnp.asarray(payload_T)
    mrows = -(-n // n_dev)
    pad = mrows * n_dev - n
    if pad:
        dt = jnp.concatenate([dt, jnp.zeros(pad, dt.dtype)])
        y = jnp.concatenate([y, jnp.zeros(pad, y.dtype)])
        obs = jnp.concatenate([obs, jnp.zeros(pad, bool)])
        payload_T = jnp.concatenate([payload_T, jnp.broadcast_to(
            payload_T[:, :1], (payload_T.shape[0], pad))], axis=1)

    def body(dt_l, y_l, obs_l, pay_l, p):
        a_l, q_l, pinf, h_l, r_l = build_fn(p, dt_l, pay_l)
        return _sharded_filter_nll(a_l, q_l, pinf, h_l, r_l, y_l, obs_l,
                                   axis, n_dev)

    key = (build_fn, mesh, axis)
    fn = _sharded_nll_cache.get(key)
    if fn is None:
        fn = jax.jit(shard_map(
            body, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(None, axis), P()),
            out_specs=P()))
        _sharded_nll_cache[key] = fn
    params_j = {k: jnp.asarray(v) for k, v in params.items()}
    return fn(jnp.asarray(dt), jnp.asarray(y), obs, payload_T, params_j)


def sharded_ssm_laplace(leaves, params, dt, y, loc, d12_fn, ll_fn,
                        iters=15, mesh=None, axis="dp", build_fn=None,
                        aux=None):
    """Time-axis-sharded LAPLACE evidence for non-Gaussian observations
    on the exact SSM prior — the multi-chip training objective of
    :class:`~g3py_tpu.models.ngssm.NonGaussianSSGP`.

    The whole iterated-Kalman-smoothing Newton loop (Nickisch, Solin &
    Grigorievskiy, ICML 2018 — see models/ngssm.py) runs as ONE SPMD
    program over the mesh: each device builds the (A, Q) blocks for its
    own row shard, and every Newton step is a sharded filter+smoother
    pass whose only cross-device traffic is one ``all_gather`` of the D
    tiny per-device FILTER monoid totals (forward) plus one of the D
    SMOOTHER monoid totals (backward) and a ``ppermute`` handing each
    device its successor's first (A, Q) for the local smoothing tail —
    the sharded counterpart of :func:`chunked_smoother_diag`'s two-pass
    block structure, numerically identical combines.  The evidence
    (data term, quadratic, and the innovation log-determinant
    ``log|I + K W| = sum log s_k + sum log w_k``) reduces by ``psum``.

    ``d12_fn(params, y_l, g_l) -> (d1, d2)`` gives the per-element
    likelihood gradient/curvature at g = loc + f and ``ll_fn(params,
    y_l, g_l)`` the per-element log-likelihood; both must be STABLE
    per-model callables (they key the jit cache — bound methods are
    fine, they compare by (instance, function)).  Rows must arrive
    time-sorted with ``dt[0] == 0``; n not divisible by D pads with
    dt=0 / obs=False rows (monoid identities forward, and their
    smoothing elements reduce to the identity because A(0)=I, Q(0)=0).
    Fully differentiable w.r.t. ``params``.

    MULTI-OUTPUT form (:class:`~g3py_tpu.models.ngssm
    .NonGaussianMultiSSGP`): pass ``build_fn(params, dt_l, aux_l) ->
    (a_l, q_l, pinf, h_l (m, S))`` and ``aux`` (n,) — each device then
    builds its block-diagonal latent stack AND its rows' mixed emission
    vectors from the local aux shard (the per-row channel index as a
    float vector), and ``d12_fn``/``ll_fn`` receive ``aux_l`` as a 4th
    argument for the per-row likelihood selection.  ``leaves`` may be
    None in this form; ``build_fn`` keys the jit cache and must be
    stable per model."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from ..parallel.cholesky import _resolve_mesh

    mesh = _resolve_mesh(mesh, axis)
    n_dev = mesh.shape[axis]
    n = y.shape[0]
    obs = jnp.ones(n, bool)
    mrows = -(-n // n_dev)
    pad = mrows * n_dev - n
    has_aux = aux is not None
    if not has_aux:
        aux = jnp.zeros(n, dt.dtype)
    aux = jnp.asarray(aux, dt.dtype)
    if pad:
        dt = jnp.concatenate([dt, jnp.zeros(pad, dt.dtype)])
        y = jnp.concatenate([y, jnp.zeros(pad, y.dtype)])
        loc = jnp.concatenate([loc, jnp.zeros(pad, loc.dtype)])
        obs = jnp.concatenate([obs, jnp.zeros(pad, bool)])
        aux = jnp.concatenate([aux, jnp.zeros(pad, aux.dtype)])
    iters = int(iters)

    def body(dt_l, y_l, loc_l, obs_l, aux_l, p):
        if build_fn is None:
            a_l, q_l, pinf, h = ssm_blocks(leaves, p, dt_l,
                                           stationary_first=False)
        else:
            a_l, q_l, pinf, h = build_fn(p, dt_l, aux_l)
        lik_args = (aux_l,) if has_aux else ()
        idx = lax.axis_index(axis)
        first = idx == 0
        # only the GLOBAL first row starts from the stationary prior
        a_l = a_l.at[0].set(jnp.where(first, jnp.zeros_like(a_l[0]),
                                      a_l[0]))
        q_l = q_l.at[0].set(jnp.where(first, pinf, q_l[0]))
        s = a_l.shape[-1]
        m_loc = y_l.shape[0]
        # successor's first (A, Q) for the local smoothing tail; the
        # global tail gets the (A=0, Q=I) terminal convention (ppermute
        # leaves non-destination devices zero, so A=0 is automatic)
        perm = [(d, d - 1) for d in range(1, n_dev)]
        a_nf = (lax.ppermute(a_l[0], axis, perm) if perm
                else jnp.zeros_like(a_l[0]))
        q_nf = (lax.ppermute(q_l[0], axis, perm) if perm
                else jnp.zeros_like(q_l[0]))
        q_nf = jnp.where(idx == n_dev - 1, jnp.eye(s, dtype=q_nf.dtype),
                         q_nf)

        def smooth_mean(w, ytil):
            # forward: local filter + fold of the earlier shards' totals
            elems = _filter_elements(a_l, q_l, h, 1.0 / w, ytil, obs_l)
            pref = lax.associative_scan(_filter_combine, elems)
            tot = jax.tree.map(lambda x: lax.all_gather(x[-1:], axis),
                               pref)
            carry = _filter_identity(s, 1, a_l.dtype)
            for j in range(n_dev):                # D static tiny combines
                ej = jax.tree.map(lambda x: x[j], tot)
                comb = _filter_combine(carry, ej)
                use = jnp.asarray(j, idx.dtype) < idx
                carry = jax.tree.map(
                    lambda c, nw: jnp.where(use, nw, c), carry, comb)
            carry_b = jax.tree.map(
                lambda x: jnp.broadcast_to(x, (m_loc,) + x.shape[1:]),
                carry)
            full = _filter_combine(carry_b, pref)
            m_f, p_f = full[1], full[2]
            # backward: local smoothing elements (chunked_smoother_diag's
            # block tail, with the successor's first (A, Q) from ICI)
            a_n = jnp.concatenate([a_l[1:], a_nf[None]], axis=0)
            q_n = jnp.concatenate([q_l[1:], q_nf[None]], axis=0)
            p_pred = _bmm(a_n, _bmm(p_f, _bt(a_n))) + q_n
            e_k = _bmm(p_f, _bmm(_bt(a_n), small_inv(p_pred)))
            g_k = m_f - _bmv(e_k, _bmv(a_n, m_f))
            l_k = p_f - _bmm(e_k, _bmm(p_pred, _bt(e_k)))
            suf = lax.associative_scan(_smoother_combine,
                                       (e_k, g_k, l_k), reverse=True)
            tot_s = jax.tree.map(lambda x: lax.all_gather(x[:1], axis),
                                 suf)
            carry_s = (jnp.eye(s, dtype=a_l.dtype)[None],
                       jnp.zeros((1, s), a_l.dtype),
                       jnp.zeros((1, s, s), a_l.dtype))
            # fold LATER shards' totals, last-first — the same order the
            # chunked backward scan composes its block suffixes in
            for j in range(n_dev - 1, -1, -1):
                tj = jax.tree.map(lambda x: x[j], tot_s)
                comb = _smoother_combine(carry_s, tj)
                use = jnp.asarray(j, idx.dtype) > idx
                carry_s = jax.tree.map(
                    lambda c, nw: jnp.where(use, nw, c), carry_s, comb)
            suffix_b = jax.tree.map(
                lambda x: jnp.broadcast_to(x, (m_loc,) + x.shape[1:]),
                carry_s)
            total = _smoother_combine(suffix_b, suf)
            return jnp.sum(total[1] * h, axis=-1)

        def newton(f, _):
            d1, d2 = d12_fn(p, y_l, loc_l + f, *lik_args)
            # same clamp as the single-chip path (models/ngssm.py) so
            # the two objectives agree exactly
            w = jnp.clip(-d2, 1e-6, 1e8)
            ytil = f + d1 / w
            return smooth_mean(w, ytil), None

        f_hat, _ = lax.scan(jax.checkpoint(newton),
                            jnp.zeros_like(y_l), None, length=iters)
        d1, d2 = d12_fn(p, y_l, loc_l + f_hat, *lik_args)
        w = jnp.clip(-d2, 1e-6, 1e8)
        ytil = f_hat + d1 / w
        _quad_pm, logdet = _sharded_filter_nll(
            a_l, q_l, pinf, h, 1.0 / w, ytil, obs_l, axis, n_dev,
            split=True)
        quad = lax.psum(jnp.sum(jnp.where(
            obs_l, f_hat * w * (ytil - f_hat), 0.0)), axis)
        ll_data = lax.psum(jnp.sum(jnp.where(
            obs_l, ll_fn(p, y_l, loc_l + f_hat, *lik_args), 0.0)), axis)
        logw = lax.psum(jnp.sum(jnp.where(obs_l, jnp.log(w), 0.0)),
                        axis)
        return ll_data - 0.5 * quad - 0.5 * (logdet + logw)

    key = (build_fn if build_fn is not None else tuple(leaves),
           d12_fn, ll_fn, iters, mesh, axis, has_aux)
    fn = _sharded_nll_cache.get(key)
    if fn is None:
        fn = jax.jit(shard_map(
            body, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P()),
            out_specs=P()))
        _sharded_nll_cache[key] = fn
    params_j = {k: jnp.asarray(v) for k, v in params.items()}
    return fn(jnp.asarray(dt), jnp.asarray(y),
              jnp.asarray(loc, dt.dtype), obs, aux, params_j)


def _smoother_combine(e1, e2):
    """Combination of smoothing elements.  Under ``reverse=True``
    ``associative_scan`` passes (accumulated LATER suffix, earlier) —
    verified against matmul composition — so ``e2`` is the earlier
    element and the composition is earlier ∘ later."""
    g1, h1, l1 = e1                                    # later suffix
    g2, h2, l2 = e2                                    # earlier
    g = _bmm(g2, g1)
    hh = _bmv(g2, h1) + h2
    ll = _bmm(g2, _bmm(l1, _bt(g2))) + l2
    return g, hh, ll


def parallel_smoother(a, q, m_f, p_f):
    """Parallel RTS smoother from the filtered moments: returns smoothed
    means (n, s) and covariances (n, s, s) via one reverse
    ``associative_scan``."""
    n, s = m_f.shape
    a_n = a[1:]                                        # A_{k+1}, k=0..n-2
    p_pred = _bmm(a_n, _bmm(p_f[:-1], _bt(a_n))) + q[1:]
    # E_k = P_k A_{k+1}' P_pred^{-1} (P_pred is PD: small_inv safe, and
    # its inverse is symmetric)
    e_k = _bmm(p_f[:-1], _bmm(_bt(a_n), small_inv(p_pred)))
    g_k = m_f[:-1] - _bmv(e_k, _bmv(a_n, m_f[:-1]))
    l_k = p_f[:-1] - _bmm(e_k, _bmm(p_pred, _bt(e_k)))
    g = jnp.concatenate([e_k, jnp.zeros((1, s, s), e_k.dtype)], axis=0)
    hh = jnp.concatenate([g_k, m_f[-1:]], axis=0)
    ll = jnp.concatenate([l_k, p_f[-1:]], axis=0)
    _, m_s, p_s = lax.associative_scan(_smoother_combine, (g, hh, ll),
                                       reverse=True)
    return m_s, p_s
