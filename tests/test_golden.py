"""Golden-number regression tests.

The reference had no test suite; its parity oracle was notebook outputs
(SURVEY.md section 4).  These fixtures pin OUR outputs on fixed-seed
workloads so future rounds can refactor kernels/logps without silent
numerical drift.  Regenerate deliberately with:

    python tests/test_golden.py --regen
"""

import json
import os

import numpy as np
import pytest

import g3py_tpu as g3

GOLDEN = os.path.join(os.path.dirname(__file__), "golden.json")


def _workloads():
    rng = np.random.default_rng(1234)
    x = np.linspace(0, 10, 32).astype(np.float32).reshape(-1, 1)
    y = (np.sin(x[:, 0]) + 0.1 * rng.standard_normal(32)).astype(np.float32)
    y_pos = (np.exp(0.3 * y) + 1.0).astype(np.float32)

    out = {}

    gp = g3.GP(space=x, location=g3.Bias(), kernel=g3.SE(x), name="GOLD_GP")
    gp.observed(x, y)
    out["gp_logp_default"] = float(gp.logp())
    out["gp_mean_sum"] = float(np.sum(gp.mean()))
    out["gp_std_sum"] = float(np.sum(gp.std()))
    out["gp_dlogp_norm"] = float(np.linalg.norm(gp.dlogp()))

    wgp = g3.WGP(space=x, location=g3.Bias(), kernel=g3.SE(x),
                 mapping=g3.BoxCoxLinear(y_pos), name="GOLD_WGP")
    wgp.observed(x, y_pos)
    out["wgp_logp_default"] = float(wgp.logp())
    out["wgp_mean_sum"] = float(np.sum(wgp.mean()))

    tp = g3.TP(space=x, location=g3.Zero(), kernel=g3.MAT52(x), name="GOLD_TP")
    tp.observed(x, y)
    out["tp_logp_default"] = float(tp.logp())
    out["tp_var_sum"] = float(np.sum(tp.variance()))

    tgp = g3.TGP(space=x, transport=g3.TLocation(g3.Bias(x))
                 @ g3.TKernel(g3.SE(x), noisy=True), name="GOLD_TGP")
    tgp.observed(x, y)
    out["tgp_logp_default"] = float(tgp.logp())

    cgp = g3.CGP(space=x, kernel=g3.SE(x),
                 marginal=g3.Normal(mu=g3.Bias(x, name="M"),
                                    sigma=g3.Bias(x, name="S")),
                 name="GOLD_CGP")
    cgp.observed(x, y_pos)
    out["cgp_logp_default"] = float(cgp.logp())
    return out


def test_golden_numbers():
    if not os.path.exists(GOLDEN):
        pytest.skip("golden file not generated yet")
    with open(GOLDEN) as f:
        want = json.load(f)
    got = _workloads()
    for k, v in want.items():
        np.testing.assert_allclose(
            got[k], v, rtol=2e-4, atol=2e-3,
            err_msg=f"golden drift in {k}: {got[k]} vs {v}")


if __name__ == "__main__":
    import sys

    if "--regen" in sys.argv:
        vals = _workloads()
        with open(GOLDEN, "w") as f:
            json.dump(vals, f, indent=1, sort_keys=True)
        print("wrote", GOLDEN)
        for k, v in sorted(vals.items()):
            print(f"  {k}: {v}")
