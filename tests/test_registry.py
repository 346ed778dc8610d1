"""GraphicalModel registry tests: bijection, defaults, fix_vars, shared
hypers across processes (the *graphical* model)."""

import numpy as np
import pandas as pd
import pytest

from g3py_tpu.bayesian.registry import GraphicalModel
from g3py_tpu.hypers import Param, Flat, FlatExp
from g3py_tpu.hypers.kernels import SE
from g3py_tpu.hypers.means import Bias, Zero
from g3py_tpu.models import GP


@pytest.fixture
def data(rng):
    x = np.linspace(0, 5, 12).astype(np.float32).reshape(-1, 1)
    y = np.sin(x[:, 0]).astype(np.float32)
    return x, y


class TestBijection:
    def test_roundtrip(self, data):
        x, y = data
        gp = GP(space=x, location=Bias(), kernel=SE(x), name="RGA")
        gp.observed(x, y)
        params = gp.params_default
        u = gp.active.dict_to_array(params)
        assert u.shape == (gp.ndim,)
        back = gp.active.array_to_dict(u)
        for k in params:
            np.testing.assert_allclose(np.asarray(back[k]), np.asarray(params[k]),
                                       rtol=1e-5, err_msg=k)

    def test_param_names_order(self, data):
        x, y = data
        gp = GP(space=x, location=Bias(), kernel=SE(x), name="RGB")
        names = gp.active.param_names()
        assert len(names) == gp.ndim
        assert names[0].startswith("RGB_")

    def test_transform_params(self, data):
        x, y = data
        gp = GP(space=x, location=Bias(), kernel=SE(x), name="RGC")
        gp.observed(x, y)
        params = gp.params_default
        tr = gp.transform_params(params, to_transformed=True)
        assert "RGC_SE_var_log_" in tr
        np.testing.assert_allclose(float(tr["RGC_SE_var_log_"]),
                                   np.log(float(params["RGC_SE_var"])), rtol=1e-5)
        # and back
        back = gp.transform_params(tr, to_transformed=False)
        np.testing.assert_allclose(float(back["RGC_SE_var"]),
                                   float(params["RGC_SE_var"]), rtol=1e-5)

    def test_params_random_perturbs(self, data):
        x, y = data
        gp = GP(space=x, location=Bias(), kernel=SE(x), name="RGD")
        gp.observed(x, y)
        p1 = gp.params_random(sigma=0.3)
        p2 = gp.params_default
        diffs = [np.abs(np.asarray(p1[k]) - np.asarray(p2[k])).max() for k in p2]
        assert max(diffs) > 0


class TestGraphical:
    def test_shared_model_two_processes(self, data):
        """Two processes joined in one active model: registry merges params
        and logp sums both observed factors (reference models.py:103-107)."""
        x, y = data
        GraphicalModel.active = None
        gm = GraphicalModel("GM_SHARED")
        gp1 = GP(space=x, location=Zero(), kernel=SE(x), name="P1", active=gm)
        gp2 = GP(space=x, location=Zero(), kernel=SE(x), name="P2", active=gm)
        gp1.observed(x, y)
        gp2.observed(x, (y * 2).astype(np.float32))
        assert gp1.active is gp2.active
        ndim = gp1.ndim
        assert ndim == 6  # 3 params each (SE var, rate, noise var)
        lp = gp1.logp()
        # joint logp = sum of both likelihoods + priors; removing one
        # process's contribution changes it
        assert np.isfinite(lp)
        ll1 = gp1.loglike()
        ll2 = gp2.loglike()
        np.testing.assert_allclose(ll1, ll2, rtol=1e-5)  # same joint loglike
        GraphicalModel.active = None

    def test_shared_param_object(self, data):
        """The same Param instance used by two components is registered once."""
        x, y = data
        GraphicalModel.active = None
        shared_var = Param("SHARED_var", shape=(), prior=FlatExp())
        gm = GraphicalModel("GM_SHARE2")
        gp1 = GP(space=x, location=Zero(), kernel=SE(x, var=shared_var),
                 name="Q1", active=gm)
        gp2 = GP(space=x, location=Zero(), kernel=SE(x, var=shared_var),
                 name="Q2", active=gm)
        names = gm.param_names()
        assert names.count("SHARED_var") == 1
        GraphicalModel.active = None


class TestFixVars:
    def test_sampling_dims_and_embedding(self, data):
        x, y = data
        gp = GP(space=x, location=Bias(), kernel=SE(x), name="RFE")
        gp.observed(x, y)
        reg = gp.active
        cols = reg.param_names()
        u = reg.dict_to_array(gp.params_default)
        chain = np.stack([u, u * 1.1, u * 0.9]).astype(np.float32)
        dt = pd.DataFrame(chain, columns=cols)
        reg.fix_vars(dt, [cols[0]])
        try:
            assert reg.fixed_dims == [0]
            assert reg.sampling_dims == list(range(1, gp.ndim))
            sp = reg.sampling_params(gp.params_default)
            assert sp.shape == (gp.ndim - 1,)
            d = reg.dict_from_sampling_array(sp)
            assert set(d.keys()) == set(gp.params_default.keys())
        finally:
            reg.fix_vars()
        assert reg.sampling_dims == list(range(gp.ndim))


class TestCompatSurface:
    def test_reference_names_present(self):
        """Every public name the reference star-exports resolves here
        (reference __init__.py:5-15; legacy-only classes documented n/a in
        PARITY.md)."""
        import g3py_tpu as g3

        for name in ["tt_to_num", "tt_to_cov", "tt_to_bounded", "inf_to_num",
                     "CholeskyRobust", "cholesky_robust", "inverse_function",
                     "gradient", "makefn", "transformed_hypers",
                     "modelcontext", "debug_p", "PositiveFlat",
                     "NonTransformLog", "save_csv", "load_csv", "subplot",
                     "tight_layout", "style_text", "datasets_path"]:
            assert hasattr(g3, name), name

    def test_compat_semantics(self):
        import jax.numpy as jnp
        import g3py_tpu as g3

        out = g3.tt_to_num(jnp.asarray([np.nan, 1.0]))
        assert np.all(np.isfinite(np.asarray(out)))
        tr = g3.transformed_hypers({"GP_SE_var": np.float32(2.0)})
        assert "GP_SE_var_log_" in tr
        assert g3.modelcontext() is not None or g3.modelcontext(42) == 42
