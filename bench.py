"""Benchmark driver: prints ONE JSON line.

Headline metric: exact-GP NLL+gradient evaluations/second at N=4096
(SE kernel + noise, 8-D inputs, float32) on the default backend — the
driver-set target metric (BASELINE.json: "NLL+grad evals/sec at N=4k/16k;
Cholesky GFLOP/s; NUTS eff. samples/sec").

The JSON line keeps the required schema (metric/value/unit/vs_baseline =
the headline) and carries every BASELINE metric as a parsed row under
``"metrics"`` (VERDICT round-1 task 4):

* gp_nll_grad_evals_per_sec_n4096_d8 — vs the reference's only recorded
  measurement, one compiled posterior-logp eval at 878 us on the abalone
  WGP workload (N~125, Theano f32 CPU; BASELINE.md) timed here identically.
* gp_nll_grad_evals_per_sec_n16384_d8 — vs the CPU LAPACK stand-in for the
  Theano reference at the same workload (206.26 s/eval,
  benchmarks/cpu_standin.py).
* cholesky_gflops_n16384 — vs the same stand-in's spotrf segment.
* ensemble_ess_per_sec_wgp_n125 — steady-state ensemble ESS/s; its
  vs_baseline is the clean eval-rate ratio against the reference's
  recorded 878 us/eval (same move family, ESS-per-eval cancels).
* nuts_ess_per_sec_wgp_n125 — NUTS ESS/s on the same workload in the
  best-measured configuration (reparam='noncentered' + dense mass,
  ta=0.95, d<=6 — benchmarks/ncp_ab.py: divergences halved at par ESS);
  vs_baseline is NUTS vs our own measured ensemble ESS/s.  On this
  funnel-shaped warped-GP posterior the ensemble wins that ratio —
  reported honestly; the reference had no gradient sampler at all.

Resilience (VERDICT round-3 item 1): the hosted TPU tunnel's worker can
die mid-run (FAILED_PRECONDITION cascades killed 9/13 rows in
BENCH_r03).  Every section now runs through ``_section``: on a
backend-death error it waits out the ~2-minute worker restart window,
probes the backend with a tiny matmul until it answers, and retries the
section ONCE.  The first section to kill the worker is named in the
notes so compile-heavy triggers can be tracked across rounds.
"""

import json
import time

import numpy as np

# errors that mean "the tunnel worker died", not "this row is broken"
_BACKEND_DEATH = ("FAILED_PRECONDITION", "UNAVAILABLE", "Unavailable",
                  "DEADLINE_EXCEEDED", "Socket closed", "backend error",
                  "INTERNAL")


def _timeit(fn, *args, repeat=50, warmup=5, best_of=3):
    for _ in range(warmup):
        r = fn(*args)
    _block(r)
    times = []
    for _ in range(best_of):
        t0 = time.perf_counter()
        for _ in range(repeat):
            r = fn(*args)
        _block(r)
        times.append((time.perf_counter() - t0) / repeat)
    return min(times)


def _block(r):
    """Force completion.  ``block_until_ready`` is a no-op over the hosted
    TPU tunnel (CLAUDE.md), so pull one scalar to the host instead."""
    import jax.numpy as jnp

    leaves = [x for x in (r if isinstance(r, (tuple, list)) else (r,))
              if hasattr(x, "dtype")]
    for x in leaves:
        np.asarray(jnp.sum(x))


def _probe_backend(timeout_s=420.0):
    """Wait until the backend answers a tiny matmul.  Worker restart
    takes ~2 min, and an IN-PROCESS device call issued during the
    restart window can WEDGE silently and never return (measured — one
    froze a recovery loop for 10+ min while the worker was already
    healthy), so each probe attempt is a SUBPROCESS with a hard
    timeout."""
    import subprocess
    import sys

    code = ("import numpy as np, jax.numpy as jnp; "
            "x = jnp.ones((128,128)); "
            "print(float(np.asarray(jnp.sum(x@x))))")
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < timeout_s:
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, timeout=240)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        time.sleep(20.0)
    return False


def _state_path():
    import os

    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "bench_resume_state.json")


class _Bench:
    """Collects rows/notes across sections with two recovery layers.

    Layer 1 (in-process): on a backend-death error, wait out the ~2-min
    worker restart, probe (subprocess), retry the section once.

    Layer 2 (re-exec): a worker death of the "TPU worker process crashed
    or restarted" mode leaves THIS process's jax client permanently
    broken — every later device call raises UNAVAILABLE instantly even
    though the worker is back (measured round 5; clearing
    jax._src.xla_bridge backends does NOT revive the axon plugin
    channel).  When the in-process retry ALSO dies on a backend-death
    error, the run state (rows/notes/completed sections) is persisted
    and the process re-execs itself with ``--resume``: completed
    sections are skipped, the remaining ones run on a fresh client.
    Bounded at 3 re-execs."""

    MAX_EXECS = 3

    def __init__(self, state=None):
        state = state or {}
        self.rows = state.get("rows", [])
        self.notes = state.get("notes", [])
        self.ctx = {}
        self.first_death = state.get("first_death")
        self.completed = state.get("completed", [])
        self.execs = state.get("execs", 0)

    def _save_state(self):
        state = {"rows": self.rows, "notes": self.notes,
                 "completed": self.completed,
                 "first_death": self.first_death, "execs": self.execs}
        try:
            with open(_state_path(), "w") as f:
                json.dump(state, f)
        except OSError:
            pass

    def _reexec(self, name):
        import os
        import sys

        self.execs += 1
        self.notes.append(
            f"{name}: client dead after worker restart (in-process retry "
            f"raised a backend death); re-exec {self.execs}/"
            f"{self.MAX_EXECS} with a fresh client, resuming after "
            f"{len(self.completed)} sections")
        self._save_state()
        os.execv(sys.executable, [sys.executable,
                                  os.path.abspath(__file__),
                                  "--resume", _state_path()])

    def section(self, name, fn):
        """Run one bench section; on backend death wait + probe + retry
        once; if the retry also dies (dead client), re-exec with resume.
        A genuine per-row failure is recorded and skipped.

        Side effects of a failed first attempt are rolled back before the
        retry (rows/notes truncated, fresh ctx keys dropped) so a
        mid-section death cannot emit duplicate metric rows (ADVICE r4)."""
        if name in self.completed:
            return True
        n_rows, n_notes = len(self.rows), len(self.notes)
        ctx_keys = set(self.ctx)
        for attempt in (1, 2):
            try:
                fn()
                self.completed.append(name)
                self._save_state()
                return True
            except Exception as e:  # noqa: BLE001 - bench must survive rows
                del self.rows[n_rows:]
                del self.notes[n_notes:]
                for k in list(self.ctx):
                    if k not in ctx_keys:
                        del self.ctx[k]
                msg = f"{type(e).__name__}: {e}"
                died = any(s in msg for s in _BACKEND_DEATH)
                if died and attempt == 1:
                    if self.first_death is None:
                        self.first_death = name
                    self.notes.append(
                        f"{name}: backend death ({msg[:140]}); waiting out "
                        "worker restart and retrying once")
                    time.sleep(150.0)
                    ok = _probe_backend()
                    self.notes.append(
                        f"{name}: backend probe after restart wait: "
                        f"{'alive' if ok else 'STILL DOWN'}")
                    continue
                if died and self.execs < self.MAX_EXECS:
                    self._reexec(name)  # does not return
                self.notes.append(f"{name} skipped: {msg[:200]}")
                return False
        return False


def _run(b):
    import jax
    import jax.numpy as jnp
    import g3py_tpu as g3

    rng = np.random.default_rng(0)
    rows, notes, ctx = b.rows, b.notes, b.ctx
    d = 8

    # ---- headline: NLL+grad at N=4096, d=8 ---------------------------------
    def sec_headline():
        n = 4096
        x = rng.standard_normal((n, d)).astype(np.float32)
        y = (np.sin(x[:, 0]) + 0.1 * rng.standard_normal(n)).astype(np.float32)
        gp = g3.GP(space=x[:4], location=g3.Bias(), kernel=g3.SE(x), name="BGP")
        gp.observed(x, y)
        reg = gp.active
        pure = gp._logp_pure(prior=False)
        u0 = jnp.asarray(reg.dict_to_array(gp.params_default))
        xj, yj = jnp.asarray(x), jnp.asarray(y)

        @jax.jit
        def nll_grad(u):
            def nll(uu):
                return -pure(reg.array_to_dict_jax(uu), xj, xj, yj,
                             jnp.zeros(0, dtype=uu.dtype))

            return jax.value_and_grad(nll)(u)

        t_main = _timeit(nll_grad, u0, repeat=20)
        evals_per_sec = 1.0 / t_main

        # ---- vs_baseline: WGP logp at N=125, d=8 (reference 878 us) --------
        n2 = 125
        x2 = rng.standard_normal((n2, d)).astype(np.float32)
        y2 = (np.abs(np.sin(x2[:, 0])) + 0.5
              + 0.1 * rng.standard_normal(n2)).astype(np.float32)
        wgp = g3.WGP(space=x2[:4], location=g3.Bias(), kernel=g3.SE(x2),
                     mapping=g3.BoxCoxLinear(y2), name="BWGP")
        wgp.observed(x2, y2)
        reg2 = wgp.active
        pure2 = wgp._logp_pure(prior=False)
        u2 = jnp.asarray(reg2.dict_to_array(wgp.params_default))
        x2j, y2j = jnp.asarray(x2), jnp.asarray(y2)

        @jax.jit
        def wgp_logp(u):
            return pure2(reg2.array_to_dict_jax(u), x2j, x2j, y2j,
                         jnp.zeros(0, dtype=u.dtype))

        t_ref_workload = _timeit(wgp_logp, u2, repeat=200, warmup=20)
        vs_baseline = 878e-6 / t_ref_workload

        # Amortized per-eval cost when the dispatch overhead is shared
        # across a vmapped batch (what samplers/multi-start optimizers
        # actually run).  Single-eval dispatch through the hosted TPU
        # tunnel costs ~0.8 ms, so the honest device-side number is the
        # batched one.
        batch = 32
        u2b = jnp.tile(u2[None, :], (batch, 1))
        wgp_logp_batch = jax.jit(jax.vmap(
            lambda u: pure2(reg2.array_to_dict_jax(u), x2j, x2j, y2j,
                            jnp.zeros(0, dtype=u.dtype))))
        t_batched = _timeit(wgp_logp_batch, u2b, repeat=100, warmup=10) / batch

        rows.append({"metric": "gp_nll_grad_evals_per_sec_n4096_d8",
                     "value": round(evals_per_sec, 3), "unit": "evals/sec",
                     "vs_baseline": round(vs_baseline, 3)})
        notes.append(
            f"backend={jax.default_backend()} "
            f"t_nll_grad_n4096={t_main*1e3:.2f}ms "
            f"t_wgp_logp_n125={t_ref_workload*1e6:.0f}us (ref 878us; "
            f"single-eval time is ~0.8ms tunnel dispatch) "
            f"t_wgp_logp_n125_batched={t_batched*1e6:.0f}us/eval "
            f"(vs_ref_batched={878e-6/t_batched:.1f}x)")
        ctx["wgp"] = wgp
        ctx["u2"] = u2

    b.section("headline_n4096", sec_headline)

    # ---- scaling point: N=16384 (BASELINE asks N=4k/16k) --------------------
    def sec_16k():
        n16 = 16384
        x16 = rng.standard_normal((n16, d)).astype(np.float32)
        y16 = (np.sin(x16[:, 0])
               + 0.1 * rng.standard_normal(n16)).astype(np.float32)
        gp16 = g3.GP(space=x16[:4], location=g3.Bias(), kernel=g3.SE(x16),
                     name="BGP16")
        gp16.observed(x16, y16)
        reg16 = gp16.active
        pure16 = gp16._logp_pure(prior=False)
        u16 = jnp.asarray(reg16.dict_to_array(gp16.params_default))
        x16j, y16j = jnp.asarray(x16), jnp.asarray(y16)

        @jax.jit
        def nll_grad16(u):
            def nll(uu):
                return -pure16(reg16.array_to_dict_jax(uu), x16j, x16j, y16j,
                               jnp.zeros(0, dtype=uu.dtype))

            return jax.value_and_grad(nll)(u)

        t16 = _timeit(nll_grad16, u16, repeat=3, warmup=2, best_of=2)
        # Theano-CPU stand-in for the BASELINE ">=5x per L-BFGS step" target:
        # the same N=16384 NLL+grad (gram + spotrf + spotri + analytic
        # dNLL/dK contraction, float32 LAPACK/OpenBLAS) measured on this
        # machine's CPU (1 core, 169 GFLOP/s sgemm) = 206.26 s/eval
        # (benchmarks/cpu_standin.py, 2026-08-16).
        cpu_standin = 206.26
        rows.append({"metric": "gp_nll_grad_evals_per_sec_n16384_d8",
                     "value": round(1.0 / t16, 4), "unit": "evals/sec",
                     "vs_baseline": round(cpu_standin / t16, 1)})
        notes.append(f"t_nll_grad_n16384={t16*1e3:.1f}ms ({1.0/t16:.2f} "
                     f"evals/sec, vs_cpu_lapack_standin={cpu_standin/t16:.0f}x)")
        ctx["t16"] = t16

        # ---- Cholesky GFLOP/s at N=16384 -----------------------------------
        from g3py_tpu.ops.linalg import safe_cholesky

        k16 = gp16.f_kernel_noise.cov(
            {k: jnp.asarray(v) for k, v in gp16.params_default.items()}, x16j)
        k16 = jnp.asarray(k16) + 0.1 * jnp.eye(n16)
        _block(k16)
        # the shipped factorization path: robust jitter search around XLA's
        # monolithic cholesky (settings.blocked_cholesky defaults False —
        # the tile form measured slower IN CONTEXT, docs/performance.md)
        chol16 = jax.jit(safe_cholesky)
        t_chol = _timeit(chol16, k16, repeat=3, warmup=2, best_of=2)
        gflops = n16 ** 3 / 3 / t_chol / 1e9
        # CPU stand-in spotrf at the same size: 37.11 s measured 2026-08-17
        # (cpu_standin.py segment; that run's total was 240.6 s under
        # background load vs 206.26 s idle, so this is a mildly
        # conservative-for-us baseline)
        rows.append({"metric": "cholesky_gflops_n16384",
                     "value": round(gflops, 1), "unit": "GFLOP/s",
                     "vs_baseline": round(37.11 / t_chol, 1)})
        notes.append(f"t_cholesky_n16384={t_chol*1e3:.1f}ms "
                     f"({gflops/1e3:.1f} TFLOP/s)")

    b.section("dense_n16384", sec_16k)

    # ---- state-space family: EXACT 1-D NLL+grad at N=16384 -----------------
    # Same mathematical quantity as the dense 16k row (exact marginal
    # likelihood + gradient) on the time-series workload, via the O(n)
    # parallel-Kalman path (ops/ssm.py).  vs_baseline = the same CPU
    # LAPACK stand-in an exact dense eval costs (206.26 s) — the
    # reference has no sub-cubic exact path at any cost.
    def sec_ssgp():
        tss = np.sort(rng.uniform(0, 16384 / 50.0, 16384)).reshape(
            -1, 1).astype(np.float32)
        yss = (np.sin(2 * np.pi * tss[:, 0] / 20.0)
               + 0.2 * rng.standard_normal(16384)).astype(np.float32)
        ssg = g3.StateSpaceGP(space=tss[:4],
                              kernel=g3.MAT32(tss) + g3.OU(tss),
                              name="BSSG")
        ssg.observed(tss, yss)
        regss = ssg.active
        press = ssg._logp_pure(prior=False)
        uss = jnp.asarray(regss.dict_to_array(ssg.params_default))
        tssj, yssj = jnp.asarray(tss), jnp.asarray(yss)

        @jax.jit
        def ss_nll_grad(u):
            def nll(uu):
                return -press(regss.array_to_dict_jax(uu), tssj, tssj,
                              yssj, jnp.zeros(0, dtype=uu.dtype))

            return jax.value_and_grad(nll)(u)

        t_ss = _timeit(ss_nll_grad, uss, repeat=20, warmup=3)
        rows.append({"metric": "ssgp_exact_nll_grad_evals_per_sec_n16384",
                     "value": round(1.0 / t_ss, 2), "unit": "evals/sec",
                     "vs_baseline": round(206.26 / t_ss, 1)})
        notes.append(f"t_ssgp_nll_grad_n16384={t_ss*1e3:.2f}ms "
                     f"(exact O(n) path; dense on-chip floor ~250ms)")

    b.section("ssgp_n16384", sec_ssgp)

    # ---- exact MULTI-OUTPUT time series: 2-channel LMC-mixed Kalman -------
    # Two channels at different irregular times, mixed from two latent
    # Markovian GPs (models/statespace.MultiStateSpaceGP) — the
    # reference's only multi-output exact story is the dense ICM index
    # kernel at O((sum n_p)^3) (reference kernels.py:262-290); this is
    # the same 16k-event workload through the per-row-emission O(n)
    # scan.  vs_baseline = the CPU LAPACK dense-eval stand-in (206.26 s).
    # NOTE: BENCH_r03's crash cascade started at this row — its compile
    # is the biggest fused scan in the bench; keep it modest.
    def sec_mssgp():
        n0m, n1m = 9830, 6554                      # 16384 total events
        t0m = np.sort(rng.uniform(0, 327.0, n0m)).astype(np.float32)
        t1m = np.sort(rng.uniform(0, 327.0, n1m)).astype(np.float32)
        y0m = (np.sin(2 * np.pi * t0m / 20.0)
               + 0.2 * rng.standard_normal(n0m)).astype(np.float32)
        y1m = (-0.8 * np.sin(2 * np.pi * t1m / 20.0) + 0.5
               + 0.3 * rng.standard_normal(n1m)).astype(np.float32)
        xm, ym = g3.stack_outputs([t0m[:, None], t1m[:, None]],
                                  [y0m, y1m])
        msg = g3.MultiStateSpaceGP(
            space=xm[:4], kernel=[g3.MAT32(t0m[:4, None]),
                                  g3.OU(t0m[:4, None])],
            outputs_dim=2, name="BMSG")
        msg.observed(xm, ym)
        regms = msg.active
        prems = msg._logp_pure(prior=False)
        ums = jnp.asarray(regms.dict_to_array(msg.params_default))
        xmj, ymj = jnp.asarray(xm), jnp.asarray(ym)

        @jax.jit
        def ms_nll_grad(u):
            def nll(uu):
                return -prems(regms.array_to_dict_jax(uu), xmj, xmj,
                              ymj, jnp.zeros(0, dtype=uu.dtype))

            return jax.value_and_grad(nll)(u)

        t_ms = _timeit(ms_nll_grad, ums, repeat=20, warmup=3)
        rows.append({"metric":
                     "mssgp_exact_nll_grad_evals_per_sec_n16384_p2",
                     "value": round(1.0 / t_ms, 2), "unit": "evals/sec",
                     "vs_baseline": round(206.26 / t_ms, 1)})
        notes.append(f"t_mssgp_nll_grad_n16384_p2={t_ms*1e3:.2f}ms "
                     "(exact multi-output O(n) path)")

    b.section("mssgp_n16384", sec_mssgp)

    # ---- Kronecker grid family: EXACT NLL+grad at 256x256 (N=65,536) -------
    # Separable MAT52 x SE kernel on a full Cartesian grid
    # (models/grid.py, ops/kron.py): per-axis eigendecompositions +
    # tensor contractions, analytic eigh-free custom-VJP backward.
    # vs_baseline = the CPU LAPACK stand-in's dense exact eval
    # extrapolated O(N^3) from its measured 206.26 s at 16k to
    # N=65,536 (x64) — the dense gram alone is 17 GB, beyond the chip.
    def sec_grid():
        ngt, ngx = 256, 256
        tgr = np.linspace(0, 8, ngt).astype(np.float32)
        xgr = np.linspace(-2, 2, ngx).astype(np.float32)
        rows_g = g3.grid_rows([tgr, xgr])
        fgr = np.sin(rows_g[:, 0]) * np.exp(-0.5 * rows_g[:, 1] ** 2)
        ygr = (fgr + 0.1 * rng.standard_normal(
            rows_g.shape[0])).astype(np.float32)
        ggp = g3.GridGP(axes=[tgr, xgr],
                        kernel=[g3.MAT52(tgr[:, None]),
                                g3.SE(xgr[:, None])], name="BGrid")
        ggp.observed(rows_g, ygr)
        regg = ggp.active
        preg = ggp._logp_pure(prior=False)
        ugr = jnp.asarray(regg.dict_to_array(ggp.params_default))
        xgj, ygj = jnp.asarray(rows_g), jnp.asarray(ygr)

        @jax.jit
        def grid_nll_grad(u):
            def nll(uu):
                return -preg(regg.array_to_dict_jax(uu), xgj, xgj, ygj,
                             jnp.zeros(0, dtype=uu.dtype))

            return jax.value_and_grad(nll)(u)

        t_gr = _timeit(grid_nll_grad, ugr, repeat=20, warmup=3)
        rows.append({"metric": "gridgp_exact_nll_grad_evals_per_sec_"
                               "n65536_256x256",
                     "value": round(1.0 / t_gr, 2), "unit": "evals/sec",
                     "vs_baseline": round(206.26 * 64 / t_gr, 1)})
        notes.append(f"t_gridgp_nll_grad_256x256={t_gr*1e3:.2f}ms "
                     "(exact Kronecker path; vs_baseline extrapolates "
                     "the 16k dense stand-in O(N^3) to N=65,536)")

    b.section("gridgp_256x256", sec_grid)

    # ---- KISS-GP: exact-flavoured NLL+grad on 100k SCATTERED rows ----------
    # Structured kernel interpolation (models/ski.py, ops/kron.ski_nll):
    # cubic taps onto a 128x128 inducing grid, interpolation densified
    # to MXU matmuls (ski_operator), matrix-free PCG+SLQ+BBMM estimator.
    # vs_baseline extrapolates the CPU stand-in's dense exact eval
    # O(N^3) from 206.26 s at 16k to N=100,000 (x238).
    def sec_ski():
        nsk = 100_000
        xsk = np.stack([rng.uniform(0, 10, nsk),
                        rng.uniform(-3, 3, nsk)], 1).astype(np.float32)
        fsk = np.sin(xsk[:, 0]) * np.exp(-0.3 * xsk[:, 1] ** 2)
        ysk = (fsk + 0.1 * rng.standard_normal(nsk)).astype(np.float32)
        sgp = g3.SKIGP(kernel=[g3.MAT52(xsk[:, :1]), g3.SE(xsk[:, 1:2])],
                       grid_shape=[128, 128], name="BSKI")
        sgp.observed(xsk, ysk)
        regs = sgp.active
        pres = sgp._logp_pure(prior=False)
        usk = jnp.asarray(regs.dict_to_array(sgp.params_default))
        xskj, yskj = jnp.asarray(xsk), jnp.asarray(ysk)

        @jax.jit
        def ski_nll_grad(u):
            def nll(uu):
                return -pres(regs.array_to_dict_jax(uu), xskj, xskj,
                             yskj, jnp.zeros(0, dtype=uu.dtype))

            return jax.value_and_grad(nll)(u)

        t_sk = _timeit(ski_nll_grad, usk, repeat=10, warmup=2)
        rows.append({"metric": "skigp_nll_grad_evals_per_sec_"
                               "n100k_grid128",
                     "value": round(1.0 / t_sk, 2), "unit": "evals/sec",
                     "vs_baseline": round(206.26 * 238 / t_sk, 1)})
        notes.append(f"t_skigp_nll_grad_n100k={t_sk*1e3:.2f}ms "
                     "(scattered rows, KISS-GP MXU interpolation; "
                     "vs_baseline extrapolates the 16k dense stand-in "
                     "O(N^3) to N=1e5)")

    b.section("skigp_n100k", sec_ski)

    # ---- sparse family at production scale: SGPR ELBO+grad at N=100k -------
    # The reference's only big-N strategy was subsampling (data.py:129-190
    # p-fractions); the sparse family trains on ALL rows in O(n m^2).
    # vs_baseline = how many of these 100k-row sparse steps fit in ONE
    # exact 16k NLL+grad eval measured above (same chip, same run).
    def sec_sgpr():
        nsp, msp = 100_000, 512
        xsp = rng.standard_normal((nsp, d)).astype(np.float32)
        ysp = (np.sin(xsp[:, 0])
               + 0.1 * rng.standard_normal(nsp)).astype(np.float32)
        # explicit inducing subset: skips the k-means default (minutes of
        # host time at 100k rows) — eval cost is what this row measures
        zsp = xsp[:: nsp // msp][:msp]
        sgp = g3.SGP(space=xsp[:4], location=g3.Bias(), kernel=g3.SE(xsp),
                     inducing=zsp, name="BSGP")
        sgp.observed(xsp, ysp)
        regs = sgp.active
        pures = sgp._logp_pure(prior=False)
        usp = jnp.asarray(regs.dict_to_array(sgp.params_default))
        xspj, yspj = jnp.asarray(xsp), jnp.asarray(ysp)

        @jax.jit
        def elbo_grad(u):
            def nll(uu):
                return -pures(regs.array_to_dict_jax(uu), xspj, xspj, yspj,
                              jnp.zeros(0, dtype=uu.dtype))

            return jax.value_and_grad(nll)(u)

        t_sp = _timeit(elbo_grad, usp, repeat=10, warmup=3)
        if "t16" not in ctx:  # resumed run: recover t16 from its row
            for r in rows:
                if r["metric"] == "gp_nll_grad_evals_per_sec_n16384_d8":
                    ctx["t16"] = 1.0 / r["value"]
        vsb = ctx["t16"] / t_sp if "t16" in ctx else float("nan")
        rows.append({"metric": "sgpr_elbo_grad_evals_per_sec_n100k_m512",
                     "value": round(1.0 / t_sp, 2), "unit": "evals/sec",
                     "vs_baseline": round(vsb, 1)})
        notes.append(f"t_sgpr_elbo_grad_n100k_m512={t_sp*1e3:.1f}ms "
                     f"(exact16k/sparse100k={vsb:.0f}x)")

    b.section("sgpr_n100k", sec_sgpr)

    # ---- BASELINE configs[4]: 2-output graphical random field at N=50k ----
    # Matrix-free preconditioned NLL+grad on the exact ICM-coregionalized
    # model (tut19; the reference's notebooks-04/08 composition at 400x
    # their scale — its dense gram alone is 10 GB).  vs_baseline = eval
    # rate x the CPU stand-in's 16k wall (206.26 s): any positive row
    # means a workload the reference could not form at all.
    def sec_mo50k():
        from g3py_tpu.hypers.kernels import KernelDot
        from g3py_tpu.hypers.metrics import Delta

        n_mo = 25_000
        t_ax = np.sort(rng.uniform(0, 100, n_mo)).astype(np.float32)
        x_mo = np.concatenate([
            np.stack([t_ax, np.zeros(n_mo, np.float32)], 1),
            np.stack([t_ax, np.ones(n_mo, np.float32)], 1)])
        f_mo = np.sin(0.3 * t_ax)
        y_mo = np.concatenate([f_mo, 0.6 * f_mo + 0.3]).astype(np.float32)
        y_mo += 0.05 * rng.standard_normal(2 * n_mo).astype(np.float32)
        se_mo = g3.SE([0], name="Time")
        gp_mo = g3.GP(space=x_mo[:4], location=g3.Bias(),
                      kernel=se_mo + se_mo * KernelDot([1], metric=Delta,
                                                       name="Coreg"),
                      noisy=True, name="BMO")
        gp_mo.observed(x_mo, y_mo)
        reg_mo = gp_mo.active
        # curvature-scale lengthscale start (the data-driven default
        # degenerates at dense 1-D sampling; stretch_50k.py lesson) so the
        # timed solve is a trusted, converging CG — a real workload
        p_mo = dict(gp_mo.params_default)
        p_mo["BMO_Time_rate"] = np.asarray([0.3], np.float32)
        u_mo = jnp.asarray(reg_mo.dict_to_array(p_mo))

        @jax.jit
        def mo_nll_grad(u):
            def nll(uu):
                return gp_mo.nll_iterative(
                    reg_mo.array_to_dict_jax(uu), rank=80, block=2048,
                    cg_iters=100, probes=8)[0]

            return jax.value_and_grad(nll)(u)

        t_mo = _timeit(mo_nll_grad, u_mo, repeat=1, warmup=1, best_of=3)
        rows.append({"metric": "mo_gp_nll_grad_evals_per_sec_n50k_p2",
                     "value": round(1.0 / t_mo, 3), "unit": "evals/sec",
                     "vs_baseline": round(206.26 / t_mo, 1)})
        notes.append(f"t_mo50k_nll_grad={t_mo:.2f}s (matrix-free ICM, "
                     f"rank80 cg100 probes8)")

    b.section("mo50k", sec_mo50k)

    # ---- serving fast path: factored vs unfactored posterior mean ----------
    def _pipeline(fn, *args, reps=20):
        # pipeline the dispatches and sync ONCE: per-call tunnel round
        # trips are ~0.8 ms idle but ~30 ms under contention, so synced
        # per-call timing is meaningless in a bad window (CLAUDE.md)
        outs = [fn(*args) for _ in range(3)]
        _block(outs[-1])
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(reps)]
        _block(outs[-1])
        return (time.perf_counter() - t0) / reps

    def sec_serving():
        ns, m = 2048, 256
        xs = rng.standard_normal((ns, d)).astype(np.float32)
        ys = (np.sin(xs[:, 0])
              + 0.1 * rng.standard_normal(ns)).astype(np.float32)
        gps = g3.GP(space=xs[:4], location=g3.Bias(), kernel=g3.SE(xs),
                    name="BSRV")
        gps.observed(xs, ys)
        ps = gps.params_default
        xq = rng.standard_normal((m, d)).astype(np.float32)
        vec = np.zeros(m, dtype=np.float32)
        _ = gps.mean(ps, xq)
        bkey = [k for k in gps.compiles if k.startswith("posterior_mean")][0]
        pdict = {k: np.asarray(v, np.float32)
                 for k, v in gps.filter_params(ps).items()}
        base_fn = gps.compiles[bkey].fn

        t_unf = _pipeline(base_fn, pdict, xq, gps._inputs, gps._outputs, vec)
        pr = gps.predictor(ps)
        _ = pr.mean(space=xq)
        fkey = [k for k in pr._clone.compiles
                if k.startswith("posterior_mean")][0]
        t_srv = _pipeline(pr._clone.compiles[fkey].fn, xq, vec)
        # parsed row (13th): serving throughput of the factored fast path;
        # vs_baseline = the unfactored/factored speedup on the same batch
        rows.append({"metric": "serving_mean_batches_per_sec_n2048_m256",
                     "value": round(1.0 / t_srv, 1), "unit": "batches/sec",
                     "vs_baseline": round(t_unf / t_srv, 1)})
        notes.append(f"serving_mean_n2048_m256: unfactored={t_unf*1e3:.2f}ms "
                     f"predictor={t_srv*1e3:.2f}ms ({t_unf/t_srv:.0f}x)")

    b.section("serving", sec_serving)

    # ---- serving at the HEADLINE conditioning size: n=16384 ----------------
    # The ledger's strongest serving result (pipelined mean 108.9 ms ->
    # 1.31 ms, 83x at n=16384) gets its own driver-witnessed row
    # (VERDICT r4 item 7).  The predictor factors once (posterior_state:
    # linv/alpha); every batch after that is matmul-only.
    def sec_serving16k():
        ns, m = 16384, 256
        xs = rng.standard_normal((ns, d)).astype(np.float32)
        ys = (np.sin(xs[:, 0])
              + 0.1 * rng.standard_normal(ns)).astype(np.float32)
        gps = g3.GP(space=xs[:4], location=g3.Bias(), kernel=g3.SE(xs),
                    name="BSRV16")
        gps.observed(xs, ys)
        ps = gps.params_default
        xq = rng.standard_normal((m, d)).astype(np.float32)
        vec = np.zeros(m, dtype=np.float32)
        _ = gps.mean(ps, xq)
        bkey = [k for k in gps.compiles if k.startswith("posterior_mean")][0]
        pdict = {k: np.asarray(v, np.float32)
                 for k, v in gps.filter_params(ps).items()}
        base_fn = gps.compiles[bkey].fn
        t_unf = _pipeline(base_fn, pdict, xq, gps._inputs, gps._outputs,
                          vec, reps=5)
        pr = gps.predictor(ps)
        _ = pr.mean(space=xq)
        fkey = [k for k in pr._clone.compiles
                if k.startswith("posterior_mean")][0]
        t_srv = _pipeline(pr._clone.compiles[fkey].fn, xq, vec, reps=50)
        rows.append({"metric": "serving_mean_batches_per_sec_n16384_m256",
                     "value": round(1.0 / t_srv, 1), "unit": "batches/sec",
                     "vs_baseline": round(t_unf / t_srv, 1)})
        notes.append(f"serving_mean_n16384_m256: unfactored={t_unf*1e3:.2f}ms "
                     f"predictor={t_srv*1e3:.2f}ms ({t_unf/t_srv:.0f}x)")

    b.section("serving_n16384", sec_serving16k)

    # ---- sampler throughput at the reference benchmark workload -------------
    # Three rows: the ensemble (the reference's own sampler family — emcee
    # stretch moves) where vs_baseline is the clean eval-rate ratio against
    # the recorded 878us/eval (ESS-per-eval cancels: same move, same
    # workload); NUTS ESS/s (a gradient sampler the reference never had)
    # in the round-3 best-measured configuration — reparam='noncentered'
    # + dense mass at ta=0.95 (benchmarks/ncp_ab.py: divergences 170->80
    # at par ESS/s vs the centered chain) — where vs_baseline is NUTS vs
    # our own measured ensemble ESS/s; and NeuTra.
    def sec_samplers():
        from g3py_tpu.bayesian.nuts import nuts_sampler
        from g3py_tpu.bayesian.samplers import ensemble_sampler
        from g3py_tpu.bayesian.average import _mESS

        if "wgp" not in ctx:
            # resumed run: rebuild the canonical sampler workload by
            # REPLAYING sec_headline's rng stream (x2/y2 must stay
            # byte-identical across rounds for row comparability)
            rr = np.random.default_rng(0)
            rr.standard_normal((4096, d))
            rr.standard_normal(4096)
            x2 = rr.standard_normal((125, d)).astype(np.float32)
            y2 = (np.abs(np.sin(x2[:, 0])) + 0.5
                  + 0.1 * rr.standard_normal(125)).astype(np.float32)
            wgp_r = g3.WGP(space=x2[:4], location=g3.Bias(),
                           kernel=g3.SE(x2), mapping=g3.BoxCoxLinear(y2),
                           name="BWGP")
            wgp_r.observed(x2, y2)
            import jax.numpy as _jnp

            ctx["wgp"] = wgp_r
            ctx["u2"] = _jnp.asarray(
                wgp_r.active.dict_to_array(wgp_r.params_default))
            notes.append("samplers: resumed run rebuilt the WGP workload "
                         "by rng-stream replay")
        wgp, u2 = ctx["wgp"], ctx["u2"]
        logp_tr, _, _ = wgp._sampling_logps(prior=False)
        ch_w, ndim2 = 32, len(np.asarray(u2))
        p0w = (np.asarray(u2)[None, :]
               * (1 + 0.05 * rng.standard_normal((ch_w, ndim2)))
               ).astype(np.float32)
        iters_w = 400
        _ = ensemble_sampler(logp_tr, p0w, 10, key=0)
        # Sampler rows are MEDIAN-OF-3 captures (VERDICT r4 item 5: the
        # tunnel's ±30% contention spread made single-capture rows swing
        # 9.7→12.3 within one round).  The compiled program is shared;
        # each rep re-runs with a fresh key.
        ens_runs, ens_walls = [], []
        for rep in range(3):
            t0 = time.perf_counter()
            ch_e, _lp = ensemble_sampler(logp_tr, p0w, iters_w, key=1 + rep)
            ch_e = np.asarray(ch_e)
            t_ens = time.perf_counter() - t0
            ess_e = sum(_mESS(ch_e[c, iters_w // 2:, :])
                        for c in range(ch_w))
            # ESS measured on the last half of the run, which took
            # ~t_ens/2 of wall — steady-state rate, same normalization as
            # the NUTS row
            ens_runs.append(ess_e / (t_ens / 2))
            ens_walls.append(t_ens)
        ens_ess_s = float(np.median(ens_runs))
        evals_s = ch_w * iters_w / float(np.median(ens_walls))
        rows.append({"metric": "ensemble_ess_per_sec_wgp_n125",
                     "value": round(ens_ess_s, 1), "unit": "ESS/sec",
                     "vs_baseline": round(evals_s * 878e-6, 2),
                     "spread": [round(min(ens_runs), 1),
                                round(max(ens_runs), 1)]})

        # NUTS in the best-measured config (VERDICT r3 item 3 / r4 item
        # 4): the non-centered amplitude shear (models/elliptical.py
        # _noncentered_sampling_shear) + dense mass + ta=0.95 + depth 7
        # via CHUNKED dispatch (nuts_sampler(chunk=25) — bounded
        # dispatches broke the monolithic-program d<=6 crash ceiling at
        # ~zero overhead, benchmarks/nuts_depth_ab.py) + warmup 400
        # (w200 under-adapts the dense mass: accept undershoots and
        # divergences spike; w400 measured median div 50 at 7.7 ESS/s
        # over 3 reps — benchmarks/nuts_depth_ab.py --warmup 400,
        # docs/samplers.md).  Chains are sheared back to
        # the original coordinates before the ESS estimate so the number
        # is comparable across configs.
        shear, unshear = wgp._noncentered_sampling_shear()
        logp_nc = lambda v: logp_tr(shear(v))
        import jax.numpy as jnp
        v0 = np.asarray(unshear(jnp.asarray(np.asarray(u2))))

        samples, warmup, chains_n = 300, 400, 4
        # primer with the SAME 25-length segments the real run uses
        # (warmup 50 -> two 25-step phases), so every chunked program is
        # compile-cached before rep 1 is timed
        _ = nuts_sampler(logp_nc, v0, samples=25, warmup=50,
                         key=0, chains=chains_n, max_depth=7,
                         target_accept=0.95, adapt_mass="dense", chunk=25)
        # scale measured half-chain ESS to the full wall time share it used
        frac = (samples / 2) / (samples + warmup)
        nuts_runs, nuts_divs, nuts_accs = [], [], []
        for rep in range(3):
            t0 = time.perf_counter()
            chn, lpn, info = nuts_sampler(logp_nc, v0,
                                          samples=samples, warmup=warmup,
                                          key=1 + rep,
                                          chains=chains_n, max_depth=7,
                                          target_accept=0.95,
                                          adapt_mass="dense", chunk=25)
            chn = np.asarray(chn)
            t_nuts = time.perf_counter() - t0
            sh = chn.shape
            chn = np.asarray(jax.vmap(shear)(
                jnp.asarray(chn.reshape(-1, sh[-1])))).reshape(sh)
            ess = sum(_mESS(chn[c, samples // 2:, :])
                      for c in range(chains_n))
            nuts_runs.append(ess / (t_nuts * frac))
            nuts_divs.append(int(np.asarray(info["divergences"]).sum()))
            nuts_accs.append(float(np.asarray(info["accept_rate"]).mean()))
        nuts_ess_s = float(np.median(nuts_runs))
        rows.append({"metric": "nuts_ess_per_sec_wgp_n125",
                     "value": round(nuts_ess_s, 1), "unit": "ESS/sec",
                     "vs_baseline": round(nuts_ess_s / max(ens_ess_s, 1e-9),
                                          1),
                     "spread": [round(min(nuts_runs), 1),
                                round(max(nuts_runs), 1)]})
        notes.append(
            f"ensemble {evals_s:.0f} logp-evals/s (ref 1139/s) ess/s="
            f"{ens_ess_s:.1f} [{min(ens_runs):.1f},{max(ens_runs):.1f}] | "
            f"nuts_ess/s={nuts_ess_s:.1f} "
            f"[{min(nuts_runs):.1f},{max(nuts_runs):.1f}] (ncp+dense "
            f"ta=0.95 d7 chunked w400, accept={np.median(nuts_accs):.2f}, "
            f"div={sorted(nuts_divs)[1]} of {nuts_divs})")

        # ---- NeuTra: NUTS through a transport fitted to the ensemble
        # run's draws (bayesian/neutra.py); vs_baseline is NeuTra vs the
        # NUTS row's steady-state ESS/s.  Round-3 measured role: the
        # LOW-DIVERGENCE sampler — always far fewer divergences than plain
        # dense NUTS (0-84 vs 94-170 across same-day captures at ta=0.95),
        # ESS/s ratio swinging 0.65x-1.98x window to window (4-chain mESS
        # on a contended tunnel is noisy; trees saturate the runtime's
        # d<=6 cap, and d=7 crashes the tunnel worker — measured).  Runs
        # dense z-space mass (the best-measured config); the ensemble
        # remains the production sampler. --------------------------------
        from g3py_tpu.bayesian.neutra import (fit_flow, neutra_logp,
                                              flow_inverse, flow_forward)

        draws = ch_e[:, iters_w // 2:, :].reshape(-1, ndim2)
        t_fit0 = time.perf_counter()
        flow, _losses = fit_flow(draws, n_couplings=6, hidden=32,
                                 steps=1500, key=0)
        t_fit = time.perf_counter() - t_fit0
        lt = neutra_logp(logp_tr, flow)
        z0, _ = flow_inverse(flow, jnp.asarray(draws[:chains_n]))
        z0 = np.asarray(z0)
        _ = nuts_sampler(lt, z0[:1], samples=10, warmup=10, key=0, chains=1,
                         max_depth=6)
        nt_runs, nt_divs, nt_accs = [], [], []
        for rep in range(3):
            t0 = time.perf_counter()
            zch, _zlp, zinfo = nuts_sampler(lt, z0, samples=samples,
                                            warmup=warmup, key=1 + rep,
                                            chains=chains_n, max_depth=6,
                                            target_accept=0.95,
                                            adapt_mass="dense")
            t_neutra = time.perf_counter() - t0
            theta = np.asarray(jax.vmap(jax.vmap(
                lambda z: flow_forward(flow, z)[0]))(jnp.asarray(zch)))
            ess_nt = sum(_mESS(theta[c, samples // 2:, :])
                         for c in range(chains_n))
            nt_runs.append(ess_nt / (t_neutra * frac))
            nt_divs.append(int(np.asarray(zinfo["divergences"]).sum()))
            nt_accs.append(float(np.asarray(zinfo["accept_rate"]).mean()))
        neutra_ess_s = float(np.median(nt_runs))
        rows.append({"metric": "neutra_ess_per_sec_wgp_n125",
                     "value": round(neutra_ess_s, 1), "unit": "ESS/sec",
                     "vs_baseline": round(
                         neutra_ess_s / max(nuts_ess_s, 1e-9), 2),
                     "spread": [round(min(nt_runs), 1),
                                round(max(nt_runs), 1)]})
        notes.append(
            f"neutra_ess/s={neutra_ess_s:.1f} "
            f"[{min(nt_runs):.1f},{max(nt_runs):.1f}] (fit {t_fit:.0f}s, "
            f"div={sorted(nt_divs)[1]} of {nt_divs}, "
            f"accept={np.median(nt_accs):.2f})")

    b.section("samplers", sec_samplers)


def main():
    import os
    import sys

    state = None
    if "--resume" in sys.argv:
        path = sys.argv[sys.argv.index("--resume") + 1]
        try:
            with open(path) as f:
                state = json.load(f)
        except (OSError, ValueError):
            state = None
    b = _Bench(state)
    _run(b)
    _emit(b)
    try:  # completed (possibly after re-execs): drop the resume state
        os.remove(_state_path())
    except OSError:
        pass


def _emit(b):
    import os

    if b.first_death is not None:
        b.notes.append(f"first backend death at section: {b.first_death}")
    if not b.rows:
        out = {"metric": "gp_nll_grad_evals_per_sec_n4096_d8",
               "value": float("nan"), "unit": "evals/sec",
               "vs_baseline": float("nan"), "metrics": []}
    else:
        out = dict(b.rows[0])
        out["metrics"] = b.rows

    # The driver's tail window truncates long stdout from the FRONT, which
    # head-truncated the single ~2.6 KB JSON line in 2 of 4 rounds
    # (BENCH_r02/r04 parsed: null — VERDICT r4 item 2).  So: the FULL
    # machine-readable artifact (rows incl. units/vs_baseline/spread +
    # notes) goes to BENCH_full.json next to this script; stdout prints the
    # comment lines FIRST and ends with one compact (<1 KB) JSON line in
    # the required schema, with per-row [name, value] pairs under
    # "metrics" — the last line always survives the tail window.
    out["notes"] = b.notes
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_full.json")
    try:
        with open(full_path, "w") as f:
            json.dump(out, f, indent=1)
    except OSError as e:  # never let the artifact write kill the run
        b.notes.append(f"BENCH_full.json write failed: {e}")
    for note in b.notes:
        print("# " + note, flush=True)
    compact = {"metric": out["metric"], "value": out["value"],
               "unit": out["unit"], "vs_baseline": out["vs_baseline"],
               "metrics": [[r["metric"], r["value"]] for r in b.rows],
               "full": "BENCH_full.json"}
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1000:  # keep the parse guarantee over completeness
        compact.pop("metrics")
        compact["n_rows"] = len(b.rows)
        line = json.dumps(compact, separators=(",", ":"))
    print(line, flush=True)


if __name__ == "__main__":
    main()
