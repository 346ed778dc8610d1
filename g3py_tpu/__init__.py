"""g3py_tpu — TPU-native generalized graphical (Gaussian) processes.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of g3py
(reference: griosd/g3py): exact/warped Gaussian processes, Student-t
processes, marginal, transport (push-forward) and copula processes,
kernel/mean/mapping/transport algebra with data-driven defaults, MAP
training, ensemble MCMC / parallel tempering / HMC over hyperparameter
posteriors, model averaging/selection, and analysis tooling — designed
TPU-first (jit/grad pure functions, MXU-tiled grams, robust Cholesky
pipelines, vmapped/device-sharded samplers) rather than translated from
the reference's Theano/PyMC3 graph machinery.

The flat namespace mirrors the reference's ``import g3py as g3`` surface
(``/root/reference/g3py/__init__.py:1-38``).
"""

from . import config
from .config import settings, version, floatx, set_floatx

# support layer
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
from .utils.data import (
    save_csv,
    load_csv,
    datasets_path,
    data_sunspots,
    data_co2,
    data_engel,
    data_heart,
    data_eurusd,
    data_abalone,
    data_creep,
    data_ailerons,
    data_rivers,
    random_obs,
    uniform_obs,
)
from .utils.plots import (
    subplot,
    tight_layout,
    style_text,
    figure,
    plot,
    show,
    plot_text,
    plot_save,
    plot_img,
    show_img,
    plot_matrix,
    grid2d,
    plot_2d,
    style_seaborn,
    style_normal,
    style_big,
    style_big_seaborn,
    style_widget,
)
from .utils.lagrange import LagrangianConstraint, LagrangianMultiplier
from .utils.checkpoint import save_checkpoint, load_checkpoint
from .utils.debug import (
    debug,
    show_graph,
    print_graph,
    debug_mode,
    profile_trace,
    set_debug,
)

# numeric core
from . import ops
from .ops import (
    safe_cholesky,
    cho_solve,
    solve_lower_triangular,
    solve_upper_triangular,
    gauss_hermite,
    newton_inverse,
)

# hypers layer
from .hypers import (
    Hypers,
    Param,
    Freedom,
    Flat,
    ExpFlat,
    FlatExp,
    FlatPos,
    PositiveFlat,
    NonTransformLog,
    FlatExpId,
    Exponential,
    Uniform as UniformPrior,
    Null,
)
from .hypers.metrics import (
    Metric,
    One,
    Delta,
    DeltaEq,
    DeltaEq2,
    Minimum,
    Difference,
    L1,
    L2,
    ARD,
    ARD_L1,
    ARD_L2,
    ARD_Dot,
    ARD_DotBias,
    PSD,
    PSD_Dot,
    PSD_L2,
)
from .hypers.kernels import (
    Kernel,
    KernelDot,
    KernelStationary,
    KernelSum,
    KernelProd,
    KernelScale,
    KernelShift,
    KernelMax,
    KernelEquals,
    KernelEquals2,
    KernelNoise,
    BW,
    VAR,
    NIL,
    LIN,
    POL,
    NN,
    WN,
    RQ,
    MAT32,
    MAT52,
    OU,
    SE,
    KernelPeriodic,
    COS,
    SIN,
    SINC,
    SM,
)
from .hypers.features import DeepKernel
from .hypers.means import (
    Mean,
    Location,
    BlackBox,
    Zero,
    Bias,
    Linear,
    Power,
)
from .hypers.mappings import (
    Mapping,
    MappingComposed,
    Identity,
    LinearMapping,
    LogShifted,
    BoxCoxShifted,
    BoxCoxLinear,
    BoxCoxLinear2,
    WarpingTanh,
    WarpingBoxCox,
    ArcsinhLinear,
    SinhArcsinh,
    Logistic,
)
from .hypers.transports import (
    Transport,
    TransportComposed,
    ID,
    TElemwise,
    TLinear,
    TNoLinear,
    TLocation,
    TScale,
    TMapping,
    TKernel,
    TTriangular,
)

# process layer
from .models import (
    StochasticProcess,
    EllipticalProcess,
    Predictor,
    AveragedPredictor,
    IterativePredictor,
    DistributedPredictor,
    ExportedPredictor,
    load_predictor,
    GaussianProcess,
    WarpedGaussianProcess,
    StudentTProcess,
    WarpedStudentTProcess,
    MarginalProcess,
    Density,
    SymmetricDensity,
    Uniform,
    Normal,
    StudentT,
    TransportProcess,
    TransportGaussianProcess,
    CopulaProcess,
    CopulaGaussianProcess,
    CopulaStudentTProcess,
    TransformedStudentTProcess,
    InducingPoints,
    SparseGaussianProcess,
    SparseWarpedGaussianProcess,
    select_inducing,
    Likelihood,
    GaussianLik,
    StudentTLik,
    BernoulliLik,
    PoissonLik,
    NegBinomialLik,
    OrdinalLik,
    CategoricalLik,
    HeteroscedasticLik,
    VariationalQ,
    VariationalQHeads,
    SparseVariationalProcess,
    MulticlassSVP,
    HeteroscedasticSVP,
    Mixing,
    MultiGaussianLik,
    LMCSVP,
    with_output,
    stack_outputs,
    StateSpaceGP,
    SSGP,
    MultiStateSpaceGP,
    LMCSSGP,
    SpatioTemporalSSGP,
    STSSGP,
    SparseSpatioTemporalSSGP,
    NonGaussianSSGP,
    NGSSGP,
    NonGaussianMultiSSGP,
    NGMSSGP,
    NonGaussianSTSSGP,
    NGSTSSGP,
    GridGP,
    SKIGP,
    grid_rows,
    GP,
    WGP,
    TP,
    WTP,
    MP,
    TGP,
    CGP,
    CSTP,
    SGP,
    SWGP,
    SVP,
)

# bayesian layer
from .bayesian import (
    GraphicalModel,
    Model,
    get_model,
    PlotModel,
    optimize,
    Experiment,
    fit_splits,
    lbfgs_fanout,
    ensemble_sampler,
    pt_sampler,
    hmc_sampler,
    mcmc_ensemble,
    nuts_sampler,
    nuts_warmup,
    fit_flow,
    neutra_logp,
    neutra_nuts,
    fit_advi,
    advi_draws,
    BayesOpt,
    search_kernel,
    KernelSearch,
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

from . import parallel

__version__ = config.__version__

# reference-name compatibility surface (tt_to_num, makefn, CholeskyRobust,
# inverse_function, transformed_hypers, modelcontext, ...)
from .compat import *  # noqa: E402,F401,F403
