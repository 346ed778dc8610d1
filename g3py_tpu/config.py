"""Global configuration for g3py_tpu.

The reference library configured its numeric policy through ambient Theano
flags (``/root/reference/g3py/config.py:1-14``: float32 everywhere,
``warn_float64='raise'``, FAST_RUN).  Here the policy is an explicit,
importable settings object instead of import side-effects: float32 is the
default compute dtype (TPU-native), jitter/robustness knobs are explicit,
and nothing mutates interpreter-global state besides matplotlib's backend
(selected lazily in :mod:`g3py_tpu.utils.plots`).
"""

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class Settings:
    """Numeric & runtime policy.

    Attributes:
      floatx: compute dtype for all model tensors (reference: Theano float32).
      strict_dtypes: if True, ``asarray_x`` raises when it would silently
        downcast float64 data (mirrors Theano ``warn_float64='raise'``).
      cholesky_max_tries: bounded jitter-escalation attempts in
        :func:`g3py_tpu.ops.linalg.safe_cholesky` (reference maxtries=20 plus
        the initial clean attempt).
      cholesky_jitter: relative base jitter, ``mean(diag) * cholesky_jitter``.
      logp_guard: value returned by distribution logps when NaN/Inf guards
        trip (reference uses -1e30, gaussian.py:234-241).
      quadrature_degree: Gauss-Hermite degree for warped-process moments
        (reference n=10, gaussian.py:127-174).
      mc_simulations: default Monte-Carlo draws for transport moments
        (reference default 30, transport.py:173-211).
    """

    floatx: str = "float32"
    strict_dtypes: bool = False
    # Matmul precision for gram/linalg matmuls.  JAX's default lets the MXU
    # run bf16 passes (~2^-7 relative error) — unacceptable for kernel grams
    # feeding a Cholesky.  'highest' = full fp32 accumulate.
    matmul_precision: str = "highest"
    cholesky_max_tries: int = 21
    cholesky_jitter: float = 1e-6
    logp_guard: float = -1e30
    quadrature_degree: int = 10
    mc_simulations: int = 30
    # Cosine harmonics kept in the state-space expansion of the SIN
    # (exp-sin^2 periodic) kernel (ops/ssm.py PeriodicLeaf); truncation
    # tail is sum_{j>J} 2 e^{-r} I_j(r) — keep J >= rate + ~8.
    ssm_harmonics: int = 7
    # Taylor order of the SE kernel's state-space approximation
    # (ops/ssm.py SELeaf, Hartikainen & Sarkka 2010): max kernel error
    # relative to var is 4.3e-3 / 9.1e-4 / 2.1e-4 at order 6 / 8 / 10 in
    # f32.  Order 10 is the f32 CEILING: the eigen-form constants grow
    # ~13x per +2 (2.5e5 at order 12) and their cancellation noise
    # swamps the method error beyond 10; >=12 only pays under
    # floatx='float64' (4.7e-5 method error at 12).  Cost is an
    # order-dim state in the Kalman scans.
    ssm_se_order: int = 8
    # Newton iterations for the Laplace mode of the non-Gaussian
    # state-space family (models/ngssm.py); each is one parallel
    # smoothing pass.  Log-concave likelihoods converge in ~5; 15 leaves
    # slack for Student-t's clamped curvature.
    ssm_laplace_iters: int = 15
    # Above this many rows, StateSpaceGP switches from the plain parallel
    # Kalman programs to the chunked monoid scans: loglike ->
    # ops/ssm.chunked_kalman_nll (O(ssm_chunk) activation memory, so the
    # differentiated NLL scales past the one-chip HBM limit of the plain
    # filter, ~1e6 rows measured), posterior statistics ->
    # ops/ssm.chunked_smoother_diag (two-pass smoother, no full-length
    # (n, s) tensors).  Values are static-shape thresholds.
    ssm_chunk_threshold: int = 1_048_576
    ssm_chunk: int = 262_144

    # Target device-runtime (seconds) for ONE dispatch of a long-running
    # fused program on the hosted TPU tunnel — the big-fused-program
    # worker-crash envelope, MEASURED round 5 by direct bisection
    # (benchmarks/crash_envelope.py; docs/performance.md): the boundary
    # is CUMULATIVE COMPUTE per dispatch — every crash >= 1.13e16 FLOP,
    # every clean point <= 9.45e15 (~50-55 s of MXU-ACTIVE time at the
    # ~190 TF/s scan rate) — while wall duration (110-164 s stalled
    # dispatches ran clean), live memory (4 GB), control flow, and loop
    # trip count (1M tiny-matmul trips) are all exonerated.  For
    # MXU-dense programs seconds ~ compute, so a 30 s budget leaves 2x
    # headroom; memory-bound programs can safely run longer.  Consumed by
    # auto-chunked device loops (optimize_jax.lbfgs_minimize_guarded);
    # None disables auto-sizing.  Chunked NUTS (nuts_sampler(chunk=))
    # bounds its dispatches by iteration count instead (the
    # per-iteration cost is workload-dependent but small).
    dispatch_budget_s: object = 30.0
    # State dim at/above which the batched tiny-matrix products in the
    # Kalman scans go to the MXU (6-pass exact-f32 matmul) instead of
    # the VPU multiply-reduce (ops/ssm._bmm).  MEASURED NEGATIVE at
    # every S on this runtime (benchmarks/ssm_state_dim_ab.py, n=16k
    # filter: S=4 6.6 vs 1207ms, S=16 20.5 vs 706ms, S=64 692 vs
    # 4698ms) — the emulated MXU dispatches tiny batched matmuls
    # poorly, so the default keeps everything on the VPU; lower this on
    # runtimes where batched small matmuls are healthy.
    ssm_mxu_state_dim: int = 10_000
    # SKI (ops/kron.ski_operator): densify the 4-tap interpolation into
    # per-axis (n, m_i) matrices so W v / W' v are MXU matmuls.  Measured
    # on the v5e tunnel at n=100k, grid 128x128: gather 33ms + scatter
    # 38ms per matvec vs ~6.6 GFLOP of matmul — the sparse path is
    # ~50M elem/s there.  Applies to D <= 2 grids whose dense taps fit
    # ski_mxu_max_elems; batched RHS chunk by ski_mxu_chunk columns.
    ski_mxu: bool = True
    ski_mxu_chunk: int = 8
    ski_mxu_max_elems: float = 6e8
    # probes per vmapped chunk in the SKI SLQ/BBMM estimators — each
    # chunked probe's MXU matvec makes a (chunk, n, m) intermediate, so
    # this bounds peak HBM at million-row n (2 -> 1 GB at n=1e6 m=128).
    ski_probe_chunk: int = 2
    # row-block Khatri-Rao slab budget (elements) for the D>=3 MXU
    # interpolation scan (ops/kron._ski_mxu_nd): block rows R ~
    # ski_mxu_block_elems / prod(m_rest).
    ski_mxu_block_elems: float = 1.6e7
    plot_big: bool = False
    # Fused Pallas gram kernels on ARD_L2 (TPU only, tile-aligned shapes;
    # transparent XLA fallback otherwise).  True = families measured at
    # >= XLA parity on real hardware (mat32, mat52); "all" = also se/rq
    # (which measured slower than XLA's own fusion); False = never.
    # Numbers in ops/pallas_gram.py and docs/performance.md.
    pallas_gram: object = True
    # Blocked (syrk-tile) Cholesky for the CLEAN first factorization attempt
    # at n >= 8192 (ops/linalg.py blocked_cholesky).  Measured on v5e f32:
    # STANDALONE it wins (76.2 ms vs XLA's 79.5 ms at n=16384, block 1024)
    # but in the full differentiated NLL graph it LOSES (245.1 vs 241.9 ms
    # e2e, reproduced A/B/A/B in one process) — XLA schedules the monolithic
    # factorization better alongside the surrounding passes.  Default False;
    # the kernel stays available for standalone factorizations.
    blocked_cholesky: bool = False

    @property
    def dtype(self):
        return jnp.dtype(self.floatx)


settings = Settings()


def floatx():
    """The active compute dtype (numpy dtype object)."""
    return np.dtype(settings.floatx)


def set_floatx(name: str):
    settings.floatx = name


def asarray_x(value):
    """Convert to the active float dtype.

    Under ``settings.strict_dtypes`` a float64 input is an error, mirroring
    the reference's ``warn_float64='raise'`` policy (config.py:9)."""
    arr = np.asarray(value)
    if settings.strict_dtypes and arr.dtype == np.float64:
        raise TypeError(
            "float64 input under strict_dtypes (reference warn_float64='raise')"
        )
    if np.issubdtype(arr.dtype, np.floating) or np.issubdtype(arr.dtype, np.integer):
        return arr.astype(settings.floatx)
    return arr


def device_count():
    return jax.device_count()


def version():
    """Dependency version dump (reference g3py/__init__.py:18-37)."""
    import flax
    import optax

    info = {
        "g3py_tpu": __version__,
        "jax": jax.__version__,
        "numpy": np.__version__,
        "flax": flax.__version__,
        "optax": optax.__version__,
        "backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
    }
    for k, v in info.items():
        print(f"{k}: {v}")
    return info


__version__ = "0.1.0"
