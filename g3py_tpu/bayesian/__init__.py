"""Bayesian layer: model container, training, sampling, analysis
(reference ``g3py/bayesian/``)."""

from .registry import GraphicalModel, Model, get_model
from .models import PlotModel
from .selection import optimize, Experiment
from .fanout import lbfgs_fanout, lbfgs_fanout_sharded, fit_splits
from .samplers import ensemble_sampler, pt_sampler, hmc_sampler, mcmc_ensemble
from .nuts import nuts_sampler, nuts_warmup
from .neutra import fit_flow, neutra_logp, neutra_nuts
from .advi import fit_advi, advi_draws
from .bo import BayesOpt
from .structure import search_kernel, KernelSearch
from .average import (
    chains_to_datatrace,
    datatrace_to_chains,
    datatrace_to_kde,
    kde_to_datatrace,
    cluster_datatrace,
    errors_datatrace,
    marginal_datatrace,
    conditional_datatrace,
    marginal,
    conditional,
    find_candidates,
    gelman_rubin,
    burn_in_samples,
    effective_sample_min,
    effective_sample_size,
    plot_datatrace,
    plot_clusters,
    kde_datatrace,
    hist_datatrace,
    scatter_datatrace,
)
