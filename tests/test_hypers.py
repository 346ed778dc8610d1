"""Hypers-layer tests: kernel grams vs hand values, mapping bijector
round-trips, analytic logdets vs autodiff, defaults, algebra."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from g3py_tpu.hypers import Freedom, FlatExp, Param
from g3py_tpu.hypers import kernels as K
from g3py_tpu.hypers import mappings as M
from g3py_tpu.hypers import means as Mn
from g3py_tpu.hypers import metrics as Mt


def make_params(component, x, y, prefix="T_"):
    component.check_dims(x)
    component.check_hypers(prefix)
    defaults = component.default_hypers_dims(x, y)
    params = {p.name: np.asarray(v, np.float32) for p, v in defaults.items()}
    # any hyper without a data-driven default gets its prior testval
    for p in component.hypers:
        params.setdefault(p.name, p.testval())
    return params


@pytest.fixture
def data(rng):
    x = rng.standard_normal((20, 2)).astype(np.float32)
    y = (np.sin(x[:, 0]) + 0.1 * rng.standard_normal(20)).astype(np.float32)
    return x, y


class TestKernels:
    def test_se_matches_naive(self, data):
        x, y = data
        k = K.SE(x)
        params = make_params(k, x, y)
        got = np.asarray(k.cov(params, x))
        var = params["T_SE_var"]
        rate = params["T_SE_rate"]
        d = ((x[:, None, :] - x[None, :, :]) ** 2 * 0.5 * rate**2).sum(-1)
        want = var * np.exp(-d)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_cross_cov_shape(self, data):
        x, y = data
        x2 = x[:7]
        k = K.SE(x)
        params = make_params(k, x, y)
        assert k.cov(params, x, x2).shape == (20, 7)

    def test_noise_kernel_square_vs_cross(self, data):
        x, y = data
        k = K.KernelNoise(x, var=0.5)
        k.check_dims(x)
        k.check_hypers("T_")
        sq = np.asarray(k.cov({}, x))
        np.testing.assert_allclose(sq, 0.5 * np.eye(20), atol=1e-6)
        cr = np.asarray(k.cov({}, x, x[:5]))
        np.testing.assert_allclose(cr, 0.0, atol=1e-7)

    def test_sum_and_scale_algebra(self, data):
        x, y = data
        ks = K.SE(x) + K.WN(x)
        k2 = 2.0 * K.SE(x)
        params = make_params(ks, x, y)
        c = np.asarray(ks.cov(params, x))
        c1 = np.asarray(ks.k1.cov(params, x))
        c2 = np.asarray(ks.k2.cov(params, x))
        np.testing.assert_allclose(c, c1 + c2, rtol=1e-6)
        p2 = make_params(k2, x, y)
        np.testing.assert_allclose(
            np.asarray(k2.cov(p2, x)), 2.0 * np.asarray(k2.k_inner.cov(p2, x)), rtol=1e-6
        )

    def test_stationary_zoo_psd(self, data):
        x, y = data
        for cls in [K.SE, K.OU, K.RQ, K.MAT32, K.MAT52, K.SIN, K.SM]:
            k = cls(x)
            params = make_params(k, x, y)
            c = np.asarray(k.cov(params, x)).astype(np.float64)
            w = np.linalg.eigvalsh((c + c.T) / 2)
            assert w.min() > -1e-4 * max(w.max(), 1), f"{cls.__name__} not PSD"

    def test_kernel_k0_is_var(self, data):
        # stationary kernels: k(x, x) == var on the diagonal
        x, y = data
        for cls in [K.SE, K.OU, K.RQ, K.MAT32, K.MAT52]:
            k = cls(x)
            params = make_params(k, x, y)
            c = np.asarray(k.cov(params, x))
            np.testing.assert_allclose(
                np.diag(c), params[f"T_{cls.__name__}_var"], rtol=1e-4,
                err_msg=cls.__name__,
            )

    def test_linear_and_poly(self, data):
        x, y = data
        params_lin = make_params(K.LIN(x), x, y)
        k = K.LIN(x)
        k.check_dims(x)
        k.check_hypers("T_")
        c = np.asarray(k.cov(params_lin, x))
        bias = params_lin["T_LIN_bias"]
        rate = params_lin["T_LIN_rate"]
        want = bias + (x * rate**2 * 1.0)[:, None, :].transpose(1, 0, 2)  # placeholder
        want = bias + np.einsum("id,jd,d->ij", x, x, rate.astype(np.float64) ** 2)
        np.testing.assert_allclose(c, want, rtol=1e-3, atol=1e-3)

    def test_nn_kernel_bounded(self, data):
        x, y = data
        k = K.NN(x)
        params = make_params(k, x, y)
        c = np.asarray(k.cov(params, x))
        var = params["T_NN_var"]
        assert np.all(np.abs(c) <= var * np.pi / 2 + 1e-5)
        assert np.all(np.isfinite(c))

    def test_periodic_cos(self, data):
        x, y = data
        k = K.COS(x)
        params = make_params(k, x, y)
        c = np.asarray(k.cov(params, x))
        f = params["T_COS_freq"]
        var = params["T_COS_var"]
        want = var * np.prod(
            np.cos(2 * np.pi * (x[:, None, :] - x[None, :, :]) * f), axis=-1
        )
        np.testing.assert_allclose(c, want, rtol=1e-3, atol=1e-3)

    def test_active_dims_composite(self, rng):
        x = rng.standard_normal((15, 3)).astype(np.float32)
        y = rng.standard_normal(15).astype(np.float32)
        k = K.SE([0, 1]) * K.OU([2])
        k.check_dims(x)
        k.check_hypers("T_")
        params = {p.name: p.testval() for p in k.hypers}
        # SE part must ignore column 2
        x_perturbed = x.copy()
        x_perturbed[:, 2] += 1.0
        c1 = np.asarray(k.k1.cov(params, x))
        c2 = np.asarray(k.k1.cov(params, x_perturbed))
        np.testing.assert_allclose(c1, c2, atol=1e-6)

    def test_input_sensitivity(self, data):
        x, y = data
        k = K.SE(x)
        params = make_params(k, x, y)
        s = np.asarray(k.input_sensitivity(params))
        assert s.shape == (2,)
        assert np.all(s > 0)


class TestMetrics:
    def test_delta(self, rng):
        x = rng.integers(0, 2, (6, 3)).astype(np.float32)
        m = Mt.Delta(x)
        got = np.asarray(m.gram({}, x, x))
        want = (x[:, None, :] == x[None, :, :]).sum(-1).astype(np.float32)
        np.testing.assert_allclose(got, want)

    def test_minimum(self, rng):
        x = np.abs(rng.standard_normal((5, 1))).astype(np.float32)
        m = Mt.Minimum(x)
        got = np.asarray(m.gram({}, x, x))
        want = np.minimum(x[:, None, 0], x[None, :, 0])
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_psd_dot(self, rng):
        x = rng.standard_normal((6, 3)).astype(np.float32)
        y = rng.standard_normal(6).astype(np.float32)
        m = Mt.PSD_Dot(x, p=2)
        m.check_hypers("T_")
        params = {p.name: p.testval() for p in m.hypers}
        got = np.asarray(m.gram(params, x, x))
        D = params["T_directions"]
        r = params["T_rate"]
        Mmat = D.T @ D + np.diag(r**2)
        want = x @ Mmat @ x.T
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


class TestMeans:
    def test_zoo(self, data):
        x, y = data
        params = make_params(Mn.Bias(x), x, y)
        b = Mn.Bias(x)
        b.check_dims(x)
        b.check_hypers("T_")
        np.testing.assert_allclose(
            np.asarray(b({"T_Bias_Bias": np.float32(2.0)}, x)), 2.0
        )
        z = Mn.Zero(x)
        np.testing.assert_allclose(np.asarray(z({}, x)), 0.0)
        lin = Mn.Linear(x)
        lin.check_hypers("T_")
        p = {q.name: q.testval() for q in lin.hypers}
        p["T_Linear_Coeff"] = np.array([1.0, -1.0], np.float32)
        got = np.asarray(lin(p, x))
        np.testing.assert_allclose(got, x[:, 0] - x[:, 1], rtol=1e-5, atol=1e-5)

    def test_algebra(self, data):
        x, y = data
        m = Mn.Bias(x) + Mn.Linear(x)
        m.check_dims(x)
        m.check_hypers("T_")
        p = {q.name: q.testval() for q in m.hypers}
        got = np.asarray(m(p, x))
        want = np.asarray(m.m1(p, x)) + np.asarray(m.m2(p, x))
        np.testing.assert_allclose(got, want, rtol=1e-6)


ANALYTIC_MAPPINGS = [
    (M.LinearMapping, {}),
    (M.LogShifted, {}),
    (M.BoxCoxShifted, {}),
    (M.BoxCoxLinear, {}),
    (M.BoxCoxLinear2, {}),
    (M.ArcsinhLinear, {}),
    (M.SinhArcsinh, {}),
]


class TestMappings:
    @pytest.mark.parametrize("cls,kw", ANALYTIC_MAPPINGS)
    def test_roundtrip(self, cls, kw, rng):
        y = (np.abs(rng.standard_normal(12)) + 0.5).astype(np.float32)
        m = cls(y, **kw)
        m.check_hypers("T_")
        params = {p.name: np.asarray(v, np.float32) for p, v in m.default_hypers(None, y).items()}
        x = m.inv(params, y)
        back = m.forward(params, x)
        np.testing.assert_allclose(np.asarray(back), y, rtol=1e-3, atol=1e-3)

    @pytest.mark.parametrize("cls,kw", ANALYTIC_MAPPINGS)
    def test_logdet_matches_autodiff(self, cls, kw, rng):
        y = (np.abs(rng.standard_normal(8)) + 0.5).astype(np.float32)
        m = cls(y, **kw)
        m.check_hypers("T_")
        params = {p.name: np.asarray(v, np.float32) for p, v in m.default_hypers(None, y).items()}
        # perturb away from the identity-like defaults
        for k in params:
            params[k] = params[k] * np.float32(1.1) + np.float32(0.05)
        analytic = float(m.logdet_dinv(params, y))
        auto = float(m.logdet_dinv_num(params, y))
        np.testing.assert_allclose(analytic, auto, rtol=1e-3, atol=1e-3)

    def test_identity(self):
        m = M.Identity()
        y = jnp.arange(4.0)
        np.testing.assert_allclose(np.asarray(m.inv({}, y)), np.asarray(y))
        assert float(m.logdet_dinv({}, y)) == 0.0

    def test_warping_tanh_newton_forward(self, rng):
        y = rng.standard_normal(6).astype(np.float32)
        m = M.WarpingTanh(y, n=2)
        m.check_hypers("T_")
        params = {p.name: np.asarray(v, np.float32) for p, v in m.default_hypers(None, y).items()}
        latent = np.asarray(m.inv(params, y))
        recovered = np.asarray(m.forward(params, latent))
        np.testing.assert_allclose(recovered, y, atol=1e-3)

    def test_composition(self, rng):
        y = (np.abs(rng.standard_normal(6)) + 1.0).astype(np.float32)
        m = M.ArcsinhLinear(y) @ M.LinearMapping(y)
        m.check_hypers("T_")
        params = {}
        for comp in (m.m1, m.m2):
            for p, v in comp.default_hypers(None, y).items():
                params[p.name] = np.asarray(v, np.float32)
        analytic = float(m.logdet_dinv(params, y))
        auto = float(m.logdet_dinv_num(params, y))
        np.testing.assert_allclose(analytic, auto, rtol=1e-3, atol=1e-3)


class TestFreedom:
    def test_default_and_call(self, data):
        x, y = data
        f = Freedom()
        f.check_hypers("T_")
        params = {p.name: np.asarray(v, np.float32) for p, v in f.default_hypers(x, y).items()}
        assert float(f(params)) == pytest.approx(2.0 + len(y))


class TestPriorInstanceHyper:
    def test_prior_instance_overrides_default(self):
        """A Prior instance passed as a hyper value creates the slot under
        the conventional name with that prior (round-3 ergonomic API)."""
        import numpy as np
        import g3py_tpu as g3
        from g3py_tpu.hypers import Exponential

        rng = np.random.default_rng(0)
        x = np.linspace(0, 5, 20, dtype=np.float32).reshape(-1, 1)
        y = np.sin(x[:, 0]).astype(np.float32)
        gp = g3.GP(space=x, location=g3.Bias(), kernel=g3.SE(x),
                   name="PRIAPI", var_noise=Exponential(2.0))
        gp.observed(x, y)
        assert "PRIAPI_Noise_var" in gp.params_default
        reg = gp.active
        p = [p for p in reg.ordered_params if p.name == "PRIAPI_Noise_var"][0]
        assert isinstance(p.prior, Exponential) and p.prior.lam == 2.0
        # prior logp term actually contributes: lam sensitivity
        params = dict(gp.params_default)
        lp = gp.logp(params)
        params2 = dict(params, PRIAPI_Noise_var=np.float32(
            float(params["PRIAPI_Noise_var"]) * 2.0))
        lp2 = gp.logp(params2)
        assert np.isfinite(lp) and np.isfinite(lp2) and lp != lp2
