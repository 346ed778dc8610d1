"""Integration tests: every tutorial example runs end-to-end in quick mode
(the reference's tutorial notebooks were its de-facto test suite,
SURVEY.md section 4)."""

import importlib
import os
import sys

import pytest

pytestmark = pytest.mark.slow

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples")


@pytest.fixture(autouse=True)
def _example_path():
    sys.path.insert(0, EXAMPLES)
    yield
    sys.path.remove(EXAMPLES)


MODULES = [
    "example",
    "tut00_introduction",
    "tut01_gaussian_processes",
    "tut02_hyperparameters",
    "tut03_kernels",
    "tut04_random_fields",
    "tut05_pushforward",
    "tut06_copulas",
    "tut07_multi_output",
    "tut08_graphical_models",
    "tut09_large_scale",
    "tut10_serving",
    "tut11_distributed_training",
    "tut12_likelihoods",
    "tut13_time_series",
    "tut14_spatiotemporal",
    "tut15_grids",
    "tut16_ski",
    "tut17_deep_kernels",
    "tut18_bayesian_optimization",
    "tut19_multioutput_50k",
]


@pytest.mark.parametrize("name", MODULES)
def test_example_runs(name):
    mod = importlib.import_module(name)
    mod.main(quick=True, plot=False)


class TestNotebooks:
    """The committed notebook surface must be a pure function of the
    tutorial sources (tools/make_notebooks.py): rebuild each flagship
    .ipynb in memory and compare the cell structure + code sources
    against the file in-tree (outputs/execution counts ignored — those
    carry the executed render)."""

    def _tool(self):
        sys.path.insert(0, os.path.join(os.path.dirname(EXAMPLES),
                                        "tools"))
        import make_notebooks
        return make_notebooks

    def test_notebooks_in_sync(self):
        import nbformat

        mk = self._tool()
        nbdir = os.path.join(os.path.dirname(EXAMPLES), "notebooks")
        for name in mk.FLAGSHIPS:
            path = os.path.join(nbdir, name + ".ipynb")
            assert os.path.exists(path), f"missing notebook {name}"
            committed = nbformat.read(path, as_version=4)
            rebuilt = mk.build_notebook(name)
            assert len(committed.cells) == len(rebuilt.cells), name
            for ci, (a, b) in enumerate(zip(committed.cells,
                                            rebuilt.cells)):
                assert a.cell_type == b.cell_type, (name, ci)
                assert a.source == b.source, (
                    f"{name} cell {ci} drifted from the .py source — "
                    "regenerate with tools/make_notebooks.py")

    def test_notebooks_have_outputs(self):
        """The committed flagships must carry an executed render (the
        reference's notebooks ship with outputs)."""
        import nbformat

        mk = self._tool()
        nbdir = os.path.join(os.path.dirname(EXAMPLES), "notebooks")
        for name in mk.FLAGSHIPS:
            nb = nbformat.read(os.path.join(nbdir, name + ".ipynb"),
                               as_version=4)
            outs = [o for c in nb.cells if c.cell_type == "code"
                    for o in c.get("outputs", [])]
            assert outs, f"{name} has no executed outputs"
            kinds = {o.get("output_type") for o in outs}
            assert "error" not in kinds, f"{name} rendered with an error"
