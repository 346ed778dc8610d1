"""AOT serving export (Predictor.export / load_predictor): artifact
roundtrip across model families, symbolic-batch polymorphism, integrity
guards.  No reference counterpart (the reference pickles the model object
and recompiles Theano graphs at load, reference models.py:55-83)."""

import numpy as np
import pytest

import g3py_tpu as g3


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _data(rng, n=128):
    x = np.sort(rng.uniform(0, 10, n)).astype(np.float32).reshape(-1, 1)
    y = (np.sin(x[:, 0]) + 0.1 * rng.standard_normal(n)).astype(np.float32)
    return x, y


def _assert_close(out, ref, keys):
    # exported artifacts run a DIFFERENT compiled program than the inline
    # fused bundle (shape-polymorphic lowering): agreement is to f32
    # program-reordering noise, amplified by GH-moment cancellation for
    # warped stds — not bitwise
    assert set(out.keys()) == set(keys)
    for k in out:
        np.testing.assert_allclose(out[k], np.asarray(ref[k]), rtol=5e-2,
                                   atol=1e-3, err_msg=k)


class TestExportRoundtrip:
    def test_gp_bundle_and_polymorphic_batch(self, rng, tmp_path):
        x, y = _data(rng)
        gp = g3.GP(space=x, location=g3.Bias(), kernel=g3.SE(x),
                   name="ExpGP")
        gp.observed(x, y)
        params = gp.find_MAP(points=2, display=False)
        pr = gp.predictor(params)
        path = str(tmp_path / "gp")
        pr.export(path, quantiles=True, quantiles_noise=True, var=True)

        ep = g3.load_predictor(path)
        xq = np.linspace(-1, 11, 97).astype(np.float32).reshape(-1, 1)
        out = ep(xq)
        ref = pr.predict(space=xq, quantiles=True, quantiles_noise=True,
                         var=True)
        _assert_close(out, ref,
                      ["mean", "std", "variance", "quantile_up",
                       "quantile_down", "noise_std", "noise_up",
                       "noise_down"])
        # symbolic batch: the SAME artifact serves any query count
        out13 = ep(xq[:13])
        assert out13["mean"].shape == (13,)
        np.testing.assert_allclose(out13["mean"], out["mean"][:13],
                                   rtol=1e-4, atol=1e-5)
        # single-statistic access runs the bundle and selects
        np.testing.assert_allclose(ep.mean(xq), out["mean"])
        assert ep.statistics == ep.manifest["statistics"]

    def test_wgp_bundle(self, rng, tmp_path):
        x, y = _data(rng)
        yw = np.exp(0.5 * y) + 2.0
        wgp = g3.WGP(space=x, location=g3.Bias(), kernel=g3.SE(x),
                     mapping=g3.LogShifted(yw), name="ExpWGP")
        wgp.observed(x, yw)
        params = wgp.find_MAP(points=2, display=False)
        pr = wgp.predictor(params)
        path = str(tmp_path / "wgp")
        pr.export(path, quantiles=True)
        ep = g3.load_predictor(path)
        xq = x[::3]
        _assert_close(ep(xq), pr.predict(space=xq, quantiles=True),
                      ["mean", "std", "quantile_up", "quantile_down"])

    def test_sparse_state_bundle(self, rng, tmp_path):
        x, y = _data(rng, n=256)
        sgp = g3.SGP(space=x, location=g3.Bias(), kernel=g3.SE(x),
                     inducing=16, name="ExpSGP")
        sgp.observed(x, y)
        params, _ = sgp.fit_svgp(batch_size=256, steps=100, lr=1e-2,
                                 display=False)
        pr = sgp.predictor(params)
        path = str(tmp_path / "sgp")
        pr.export(path, quantiles=True)
        ep = g3.load_predictor(path)
        xq = x[::5]
        _assert_close(ep(xq), pr.predict(space=xq, quantiles=True),
                      ["mean", "std", "quantile_up", "quantile_down"])

    def test_svp_bundle(self, rng, tmp_path):
        """Variational family: empty posterior state, params-only baking
        — robust-regression server exported and reloaded."""
        x, y = _data(rng, n=200)
        svp = g3.SVP(space=x, location=g3.Bias(), kernel=g3.SE(x),
                     likelihood=g3.StudentTLik(), inducing=16, name="ExpSVP")
        svp.observed(x, y)
        params, _ = svp.fit_svgp(batch_size=200, steps=100, lr=1e-2,
                                 display=False)
        pr = svp.predictor(params)
        xq = x[::4]
        np.testing.assert_allclose(
            pr.mean(space=xq), np.asarray(svp.mean(params, xq)),
            rtol=1e-4, atol=1e-5)
        path = str(tmp_path / "svp")
        pr.export(path, var=True)
        ep = g3.load_predictor(path)
        _assert_close(ep(xq), pr.predict(space=xq, var=True),
                      ["mean", "std", "variance"])
        # no analytic latent quantile hook -> loud error, not silent junk
        with pytest.raises(ValueError, match="quantile"):
            pr.export(str(tmp_path / "svpq"), quantiles=True)

    def test_multiclass_classifier_export(self, rng, tmp_path):
        """A deployed softmax classifier: the artifact returns the class-
        probability matrix."""
        x = rng.standard_normal((150, 2)).astype(np.float32)
        ang = np.arctan2(x[:, 1], x[:, 0])
        y = ((ang + np.pi) // (2 * np.pi / 3)).clip(0, 2).astype(np.float32)
        svc = g3.MulticlassSVP(space=x, kernel=g3.SE(x), classes=3,
                               inducing=12, name="ExpMC")
        svc.observed(x, y)
        params, _ = svc.fit_svgp(batch_size=150, steps=300, lr=5e-2,
                                 display=False)
        pr = svc.predictor(params)
        path = str(tmp_path / "mc")
        pr.export(path)
        ep = g3.load_predictor(path)
        probs = ep.mean(x)
        assert probs.shape == (150, 3)
        np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-4)
        np.testing.assert_allclose(probs, svc.predict_proba(params, x),
                                   rtol=5e-2, atol=1e-3)
        acc = float(np.mean(np.argmax(probs, -1) == y))
        assert acc > 0.9

    def test_fixed_batch_export(self, rng, tmp_path):
        x, y = _data(rng)
        gp = g3.GP(space=x, kernel=g3.SE(x), name="ExpGPf")
        gp.observed(x, y)
        pr = gp.predictor(gp.params_default)
        path = str(tmp_path / "fixed")
        pr.export(path, batch=32)
        ep = g3.load_predictor(path)
        xq = x[:32]
        out = ep(xq)
        assert out["mean"].shape == (32,)
        assert ep.manifest["symbolic_batch"] is False
        with pytest.raises(Exception):
            ep(x[:16])  # wrong batch for a fixed-shape artifact

    def test_artifact_contents_and_manifest(self, rng, tmp_path):
        import json
        import os

        x, y = _data(rng)
        gp = g3.GP(space=x, kernel=g3.SE(x), name="ExpGPm")
        gp.observed(x, y)
        pr = gp.predictor(gp.params_default)
        path = str(tmp_path / "m")
        pr.export(path)
        files = set(os.listdir(path))
        assert {"bundle.bin", "state.npz", "manifest.json"} <= files
        man = json.load(open(os.path.join(path, "manifest.json")))
        assert man["process"] == "GaussianProcess"
        assert man["n_obs"] == len(x) and man["ndim"] == 1
        assert man["symbolic_batch"] is True
        assert "cpu" in man["platforms"]

    def test_export_requires_statistics(self, rng, tmp_path):
        x, y = _data(rng)
        gp = g3.GP(space=x, kernel=g3.SE(x), name="ExpGPe")
        gp.observed(x, y)
        pr = gp.predictor(gp.params_default)
        with pytest.raises(ValueError, match="at least one statistic"):
            pr.export(str(tmp_path / "e"), mean=False, std=False)

    def test_stale_predictor_refuses_export(self, rng, tmp_path):
        x, y = _data(rng)
        gp = g3.GP(space=x, kernel=g3.SE(x), name="ExpGPs")
        gp.observed(x, y)
        pr = gp.predictor(gp.params_default)
        gp.observed(x[:64], y[:64])
        with pytest.raises(ValueError, match="rebuild"):
            pr.export(str(tmp_path / "s"))
