"""Completeness sweep: every kernel, mean, mapping, metric and prior runs
through a full GP logp + gradient + prediction without breakage."""

import numpy as np
import pytest

import g3py_tpu as g3
from g3py_tpu.hypers import kernels as K
from g3py_tpu.hypers import means as Mn
from g3py_tpu.hypers import mappings as Mp
from g3py_tpu.hypers import metrics as Mt


@pytest.fixture
def data(rng):
    x = np.linspace(0.1, 6, 14).astype(np.float32).reshape(-1, 1)
    y = (np.sin(x[:, 0]) + 1.6 + 0.1 * rng.standard_normal(14)).astype(np.float32)
    return x, y


def _drive(kernel=None, location=None, mapping=None, name="Z", data=None):
    x, y = data
    gp = g3.GP(space=x,
               location=location if location is not None else g3.Zero(),
               kernel=kernel if kernel is not None else g3.SE(x),
               mapping=mapping, name=name)
    gp.observed(x, y)
    lp = gp.logp()
    assert np.isfinite(lp), f"{name}: logp not finite"
    g = np.asarray(gp.dlogp())
    assert np.all(np.isfinite(g)), f"{name}: grad not finite"
    pred = gp.predict()
    assert np.all(np.isfinite(pred["mean"])), f"{name}: mean not finite"
    return gp, lp


KERNELS = ["SE", "OU", "RQ", "MAT32", "MAT52", "WN", "BW", "VAR", "NIL",
           "LIN", "POL", "NN", "COS", "SIN", "SINC", "SM", "KernelNoise"]


class TestKernelZoo:
    @pytest.mark.parametrize("kname", KERNELS)
    def test_kernel_in_gp(self, kname, data):
        x, y = data
        kernel = getattr(K, kname)(x)
        if kname in ("NIL", "KernelNoise"):
            # degenerate-by-design kernels: just require no crash
            gp = g3.GP(space=x, location=g3.Bias(), kernel=kernel,
                       name="ZK" + kname)
            gp.observed(x, y)
            assert gp.logp() is not None
            return
        _drive(kernel=kernel, name="ZK" + kname, data=data)

    def test_kernel_max(self, data):
        x, y = data
        _drive(kernel=K.KernelMax(K.SE(x), K.OU(x)), name="ZKMax", data=data)

    def test_kernel_equals_gate(self, data):
        x, y = data
        _drive(kernel=K.KernelEquals(x, eq=0) * K.SE(x) + K.SE(x),
               name="ZKEq", data=data)


class TestMeanZoo:
    @pytest.mark.parametrize("mname", ["Zero", "Bias", "Linear", "Power"])
    def test_mean_in_gp(self, mname, data):
        x, y = data
        _drive(location=getattr(Mn, mname)(x), name="ZM" + mname, data=data)

    def test_blackbox_mean(self, data):
        x, y = data
        _drive(location=Mn.BlackBox(np.full(len(x), 1.6, np.float32)),
               name="ZMBB", data=data)

    def test_mean_algebra(self, data):
        x, y = data
        _drive(location=Mn.Bias(x) + 0.5 * Mn.Linear(x), name="ZMAlg",
               data=data)


MAPPINGS = ["Identity", "LinearMapping", "LogShifted", "BoxCoxShifted",
            "BoxCoxLinear", "BoxCoxLinear2", "ArcsinhLinear", "SinhArcsinh",
            "Logistic", "WarpingTanh", "WarpingBoxCox"]


class TestMappingZoo:
    @pytest.mark.parametrize("mpname", MAPPINGS)
    def test_mapping_in_gp(self, mpname, data):
        x, y = data
        mapping = getattr(Mp, mpname)(y)
        gp, lp = _drive(mapping=mapping, location=g3.Bias(),
                        name="ZP" + mpname, data=data)

    def test_composed_mapping_in_gp(self, data):
        x, y = data
        _drive(mapping=Mp.ArcsinhLinear(y) @ Mp.LinearMapping(y),
               location=g3.Bias(), name="ZPComp", data=data)


class TestMetricVariants:
    @pytest.mark.parametrize("metric_cls", [Mt.ARD_L1, Mt.ARD_L2, Mt.L1,
                                            Mt.L2])
    def test_se_over_metric(self, metric_cls, data):
        x, y = data
        kernel = K.KernelStationaryExponential(x, metric=metric_cls(x))
        _drive(kernel=kernel, name="ZT" + metric_cls.__name__, data=data)

    def test_psd_metrics(self, data):
        x, y = data
        _drive(kernel=K.KernelDot(x, metric=Mt.PSD_Dot(x, p=2)),
               name="ZTPSD", data=data)


class TestPriorVariants:
    @pytest.mark.parametrize("prior", [g3.Flat(), g3.ExpFlat(), g3.FlatExp(),
                                       g3.FlatPos(), g3.FlatExpId(),
                                       g3.Exponential(2.0),
                                       g3.UniformPrior(0.01, 10.0)])
    def test_prior_on_amplitude(self, prior, data):
        x, y = data
        amp = g3.Param(f"ZR{type(prior).__name__}_var", prior=prior)
        gp = g3.GP(space=x, location=g3.Zero(), kernel=g3.SE(x, var=amp),
                   name="ZR" + type(prior).__name__)
        gp.observed(x, y)
        lp = gp.logp()
        assert np.isfinite(lp)
        u = gp.active.dict_to_array(gp.params_default)
        lp_arr = gp.logp(u, array=True)
        np.testing.assert_allclose(lp, lp_arr, rtol=1e-4, atol=1e-3)
        assert np.all(np.isfinite(gp.dlogp()))


class TestCrossMean:
    def test_cross_mean_with_custom_kernel(self, data):
        x, y = data
        gp = g3.GP(space=x, location=g3.Zero(), kernel=g3.SE(x), name="ZX")
        gp.observed(x, y)
        out = gp.cross_mean()
        assert out.shape == (len(x),)
        assert np.all(np.isfinite(out))
        # prior branch returns the prior location
        out_prior = gp.cross_mean(prior=True)
        np.testing.assert_allclose(out_prior, 0.0, atol=1e-6)


class TestParamsProcess:
    def test_transfer_between_processes(self, data):
        x, y = data
        gp1 = g3.GP(space=x, location=g3.Bias(), kernel=g3.SE(x), name="PA")
        gp2 = g3.GP(space=x, location=g3.Bias(), kernel=g3.SE(x), name="PB")
        gp1.observed(x, y)
        gp2.observed(x, y)
        p1 = gp1.params_default
        transferred = gp2.params_process(process=gp1, params=p1)
        assert "PB_SE_var" in transferred
        np.testing.assert_allclose(np.asarray(transferred["PB_SE_var"]),
                                   np.asarray(p1["PA_SE_var"]))
        assert np.isfinite(gp2.logp(transferred))


class TestMaternGradients:
    @pytest.mark.parametrize("K", ["MAT32", "MAT52"])
    def test_lengthscale_gradient_finite_and_correct(self, K, rng):
        """sqrt(d) at the gram diagonal (d=0 exactly) used to NaN the rate
        gradient, which the sanitizer then zeroed — Matern lengthscales were
        untrainable (the reference shares the masked flaw)."""
        import g3py_tpu as g3

        x = rng.standard_normal((16, 2)).astype(np.float32)
        y = np.sin(x[:, 0]).astype(np.float32)
        gp = g3.GP(space=x, location=g3.Zero(), kernel=getattr(g3, K)(x),
                   name=f"MGRAD{K}")
        gp.observed(x, y)
        u0 = gp.active.dict_to_array(gp.params_default)
        g_a = np.asarray(gp.dlogp(u0, array=True))
        eps = 1e-3
        for i in range(len(u0)):
            up, dn = u0.copy(), u0.copy()
            up[i] += eps
            dn[i] -= eps
            fd = (gp.logp(up, array=True) - gp.logp(dn, array=True)) / (2 * eps)
            assert abs(g_a[i] - fd) <= 0.05 * abs(fd) + 0.02, (i, g_a[i], fd)


class TestGradientAudit:
    """dlogp vs central differences across the trainability-risky zoo
    members (sqrt/abs/arcsin kinks at the gram diagonal used to NaN or flip
    gradients UNDER JIT — the Matern and OU regressions of round 2)."""

    @pytest.mark.parametrize("kname", ["OU", "SIN", "NN", "SM", "RQ"])
    def test_kernel_dlogp_matches_fd(self, kname, rng):
        import g3py_tpu as g3

        x = np.sort(rng.uniform(0, 6, 14)).astype(np.float32).reshape(-1, 1)
        y = (np.sin(x[:, 0]) + 0.05 * rng.standard_normal(14)).astype(np.float32)
        gp = g3.GP(space=x, location=g3.Zero(), kernel=getattr(g3, kname)(x),
                   name=f"GAUD{kname}")
        gp.observed(x, y)
        u0 = gp.active.dict_to_array(gp.params_default)
        ga = np.asarray(gp.dlogp(u0, array=True))
        eps = 1e-3
        for i in range(len(u0)):
            up, dn = u0.copy(), u0.copy()
            up[i] += eps
            dn[i] -= eps
            fd = (gp.logp(up, array=True) - gp.logp(dn, array=True)) / (2 * eps)
            assert abs(ga[i] - fd) <= 0.08 * abs(fd) + 0.05, (kname, i, ga[i], fd)
