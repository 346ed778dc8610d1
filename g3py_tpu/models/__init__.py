"""Process-layer models (reference ``g3py/processes/__init__.py``)."""

from .stochastic import StochasticProcess
from .elliptical import EllipticalProcess
from .predictor import (Predictor, AveragedPredictor,
                        IterativePredictor, DistributedPredictor,
                        ExportedPredictor, load_predictor)
from .gaussian import (
    GaussianProcess,
    WarpedGaussianProcess,
    WarpedGaussianDistribution,
    warped_gaussian_logp_cho,
)
from .studentt import (
    StudentTProcess,
    WarpedStudentTProcess,
    WarpedStudentTDistribution,
    warped_studentt_logp_cho,
)
from .marginal import (
    MarginalProcess,
    Density,
    SymmetricDensity,
    Uniform,
    Normal,
    StudentT,
)
from .transport import (
    TransportProcess,
    TransportGaussianProcess,
    TransportGaussianDistribution,
    transport_gaussian_logp_t,
)
from .copula import (
    CopulaProcess,
    CopulaGaussianProcess,
    CopulaStudentTProcess,
    TransformedStudentTProcess,
)
from .sparse import (
    InducingPoints,
    SparseGaussianProcess,
    SparseWarpedGaussianProcess,
    select_inducing,
)
from .likelihoods import (
    Likelihood,
    GaussianLik,
    StudentTLik,
    BernoulliLik,
    PoissonLik,
    NegBinomialLik,
    OrdinalLik,
    CategoricalLik,
    HeteroscedasticLik,
)
from .svgp import (
    VariationalQ,
    VariationalQHeads,
    SparseVariationalProcess,
    MulticlassSVP,
    HeteroscedasticSVP,
)
from .lmc import (
    Mixing,
    MultiGaussianLik,
    LMCSVP,
    with_output,
    stack_outputs,
)
from .statespace import StateSpaceGP, SSGP, MultiStateSpaceGP, LMCSSGP
from .ngssm import (NonGaussianSSGP, NGSSGP, NonGaussianMultiSSGP,
                    NGMSSGP, NonGaussianSTSSGP, NGSTSSGP)
from .spatiotemporal import (SpatioTemporalSSGP, STSSGP,
                             SparseSpatioTemporalSSGP)
from .grid import GridGP, grid_rows
from .ski import SKIGP

# aliases (reference processes/__init__.py:9-16)
GP = GaussianProcess
WGP = WarpedGaussianProcess
TP = StudentTProcess
WTP = WarpedStudentTProcess
MP = MarginalProcess
TGP = TransportGaussianProcess
CGP = CopulaGaussianProcess
CSTP = CopulaStudentTProcess
SGP = SparseGaussianProcess
SWGP = SparseWarpedGaussianProcess
SVP = SparseVariationalProcess

__all__ = [
    "StochasticProcess",
    "EllipticalProcess",
    "Predictor",
    "AveragedPredictor",
    "IterativePredictor",
    "DistributedPredictor",
    "ExportedPredictor",
    "load_predictor",
    "GaussianProcess",
    "WarpedGaussianProcess",
    "WarpedGaussianDistribution",
    "warped_gaussian_logp_cho",
    "StudentTProcess",
    "WarpedStudentTProcess",
    "WarpedStudentTDistribution",
    "warped_studentt_logp_cho",
    "MarginalProcess",
    "Density",
    "SymmetricDensity",
    "Uniform",
    "Normal",
    "StudentT",
    "TransportProcess",
    "TransportGaussianProcess",
    "TransportGaussianDistribution",
    "transport_gaussian_logp_t",
    "CopulaProcess",
    "CopulaGaussianProcess",
    "CopulaStudentTProcess",
    "TransformedStudentTProcess",
    "InducingPoints",
    "SparseGaussianProcess",
    "SparseWarpedGaussianProcess",
    "select_inducing",
    "Likelihood",
    "GaussianLik",
    "StudentTLik",
    "BernoulliLik",
    "PoissonLik",
    "NegBinomialLik",
    "OrdinalLik",
    "CategoricalLik",
    "HeteroscedasticLik",
    "VariationalQ",
    "VariationalQHeads",
    "SparseVariationalProcess",
    "MulticlassSVP",
    "HeteroscedasticSVP",
    "Mixing",
    "MultiGaussianLik",
    "LMCSVP",
    "with_output",
    "stack_outputs",
    "StateSpaceGP",
    "SSGP",
    "MultiStateSpaceGP",
    "LMCSSGP",
    "SpatioTemporalSSGP",
    "STSSGP",
    "SparseSpatioTemporalSSGP",
    "NonGaussianSSGP",
    "NGSSGP",
    "NonGaussianMultiSSGP",
    "NGMSSGP",
    "NonGaussianSTSSGP",
    "NGSTSSGP",
    "GridGP",
    "SKIGP",
    "grid_rows",
    "GP", "WGP", "TP", "WTP", "MP", "TGP", "CGP", "CSTP", "SGP", "SWGP",
    "SVP",
]
