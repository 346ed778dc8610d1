"""Multi-device parallelism: mesh helpers and sharded computation.

The reference's only parallelism was a ``multiprocessing.Pool`` over MCMC
chains (``/root/reference/g3py/processes/stochastic.py:773-783``).  The
TPU-native equivalents here:

* chain/walker parallelism — walker-axis sharding of the ensemble sampler
  (see :func:`g3py_tpu.bayesian.samplers.ensemble_sampler` ``shard=True``);
* data parallelism over the training-set axis for the O(N^2) gram — shard
  the N rows of the inputs over the mesh and let XLA partition the
  pairwise matmuls (collectives ride ICI);
* embarrassing parallelism for Experiment simulations (one simulation per
  host/device group over DCN).
"""

from .mesh import make_mesh, data_sharding, replicate
from .sharded import sharded_logp_fn, sharded_ensemble_step, pt_sampler_sharded
from .cholesky import (distributed_cholesky, distributed_trsm,
                       distributed_gp_nll, distributed_quad_logdet,
                       distributed_posterior)

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicate",
    "sharded_logp_fn",
    "sharded_ensemble_step",
    "pt_sampler_sharded",
    "distributed_cholesky",
    "distributed_trsm",
    "distributed_gp_nll",
    "distributed_quad_logdet",
    "distributed_posterior",
]
