"""Compositional kernel search (bayesian/structure.py)."""

import numpy as np
import pytest

import g3py_tpu as g3
from g3py_tpu.bayesian.structure import (_expansions, _node_name,
                                         _replace, _subexpr_paths)


@pytest.fixture(scope="module")
def trend_plus_periodic():
    rng = np.random.default_rng(3)
    x = np.linspace(0, 6, 120, dtype=np.float32)[:, None]
    y = (0.8 * x[:, 0] + 1.5 * np.sin(2.2 * np.pi * x[:, 0])
         + 0.1 * rng.standard_normal(120)).astype(np.float32)
    return x, y


@pytest.fixture(scope="module")
def additive_2d():
    """sin(3 x1) + 0.5 x2^2: at n=140 random 2-D points the additive
    decomposition beats the joint ARD-SE by ~25 nats of in-sample
    marginal likelihood (a 1-D SE is nearly universal in-sample, so 1-D
    tasks do NOT discriminate — this one does)."""
    rng = np.random.default_rng(5)
    n = 140
    x = rng.uniform(-2, 2, (n, 2)).astype(np.float32)
    y = (np.sin(3 * x[:, 0]) + 0.5 * x[:, 1] ** 2
         + 0.1 * rng.standard_normal(n)).astype(np.float32)
    return x, y


class TestKernelSearch:
    def test_discovers_additive_structure(self, additive_2d):
        """The greedy search must leave the joint ARD-SE behind and keep
        a composite carrying a dims-restricted additive part."""
        x, y = additive_2d
        zoo = {"SE": g3.SE,
               "SE0": (lambda x_, name=None: g3.SE([0], name=name)),
               "SE1": (lambda x_, name=None: g3.SE([1], name=name))}
        res = g3.search_kernel(x, y, bases=("SE", "SE0", "SE1"), depth=1,
                               points=1, zoo=zoo)
        rows = {r["name"]: r for r in res.table}
        assert res.best_name in rows
        assert res.best_name != "SE" and "SE" in res.best_name
        assert (rows[res.best_name]["criterion"]
                < rows["SE"]["criterion"] - 10.0)
        # the winner is refittable from a fresh instance (same model name
        # so the fitted param dict keys line up)
        k = res.best_kernel()
        gp = g3.GP(space=x[:4], location=g3.Bias(), kernel=k, noisy=True,
                   name="KSearch")
        gp.observed(x, y)
        assert np.isfinite(gp.loglike(res.params))

    def test_failed_candidates_lose_not_crash(self, trend_plus_periodic):
        x, y = trend_plus_periodic

        class Boom(g3.SE):
            def cov(self, params, x1, x2=None):
                raise RuntimeError("no")

        res = g3.search_kernel(x, y, bases=("SE", "BOOM"), depth=1,
                               points=1, zoo={"SE": g3.SE, "BOOM": Boom})
        rows = {r["name"]: r for r in res.table}
        assert np.isfinite(rows["SE"]["criterion"])
        assert not np.isfinite(rows["BOOM"]["criterion"])
        assert "SE" in res.best_name and "BOOM" not in res.best_name

    def test_full_grammar_enumeration(self):
        """The 'all' expansion implements the complete CKS grammar:
        every subexpression gets +B/*B, every leaf gets swapped."""
        tree = ("+", ("*", "SE", "LIN"), "SIN")
        bases = ("SE", "LIN", "SIN")
        names = {_node_name(c) for c in _expansions(tree, bases)}
        # subexpression extension BELOW the root (root-only can't do it)
        assert "(((SE * LIN) + SE) + SIN)" in names
        assert "((SE * (LIN * SIN)) + SIN)" in names
        # leaf swap deep inside the product
        assert "((SE * SIN) + SIN)" in names
        # the incumbent itself is never a candidate
        assert _node_name(tree) not in names
        # paths address the right nodes
        assert set(_subexpr_paths(tree)) == {(), (1,), (2,), (1, 1),
                                             (1, 2)}
        swapped = _replace(tree, (1, 2), "SIN")
        assert _node_name(swapped) == "((SE * SIN) + SIN)"

    def test_expand_all_reaches_leaf_swap(self, additive_2d):
        """expand='all' must at least match root extension on the
        additive task, and its table must contain leaf-swap candidates
        (structures no root extension of the incumbent can produce)."""
        x, y = additive_2d
        zoo = {"SE0": (lambda x_, name=None: g3.SE([0], name=name)),
               "SE1": (lambda x_, name=None: g3.SE([1], name=name))}
        root = g3.search_kernel(x, y, bases=("SE0", "SE1"), depth=1,
                                points=1, zoo=zoo)
        full = g3.search_kernel(x, y, bases=("SE0", "SE1"), depth=1,
                                points=1, zoo=zoo, expand="all")
        rows_f = {r["name"]: r for r in full.table}
        assert (rows_f[full.best_name]["criterion"]
                <= min(r["criterion"] for r in root.table) + 1e-6)
        # the full grammar evaluated a leaf swap of a composite
        composite = [n for n in rows_f if " " in n]
        assert composite, "grammar round produced no composites"
        with pytest.raises(ValueError):
            g3.search_kernel(x, y, bases=("SE0",), zoo=zoo,
                             expand="nonsense")

    def test_loo_criterion(self, trend_plus_periodic):
        """criterion='loo' scores by negative LOO pseudo-likelihood."""
        x, y = trend_plus_periodic
        res = g3.search_kernel(x, y, bases=("SE",), depth=0,
                               criterion="loo", points=1)
        row = res.table[0]
        assert np.isfinite(row["criterion"])
        assert row["criterion"] == pytest.approx(
            -res.gp.loo(res.params), rel=1e-6)

    def test_loglike_criterion_and_validation(self, trend_plus_periodic):
        x, y = trend_plus_periodic
        res = g3.search_kernel(x, y, bases=("SE",), depth=0,
                               criterion="loglike", points=1)
        assert res.best_name == "SE"
        row = res.table[0]
        assert row["criterion"] == pytest.approx(-row["loglike"], rel=1e-6)
        with pytest.raises(ValueError):
            g3.search_kernel(x, y, bases=("SE",), criterion="nonsense")
