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
