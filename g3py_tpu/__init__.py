"""g3py_tpu — TPU-native generalized graphical (Gaussian) processes.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of g3py
(reference: griosd/g3py): exact/warped Gaussian processes, Student-t
processes, marginal and transport (push-forward) processes, kernel/mean/
mapping algebra, MAP training, ensemble MCMC over hyperparameter
posteriors, model averaging/selection, and analysis tooling — designed
TPU-first (jit/grad pure functions, MXU-tiled grams, robust Cholesky
pipelines, vmapped/sharded samplers) rather than translated from the
reference's Theano/PyMC3 graph machinery.
"""

from . import config
from .config import settings, version, floatx, set_floatx
from .utils import (
    DictObj,
    MaxTime,
    clone,
    nan_to_high,
    save_pkl,
    load_pkl,
    save_datatrace,
    load_datatrace,
    save_json,
)
from . import ops

__version__ = config.__version__
