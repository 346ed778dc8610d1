"""Numeric core: robust linear algebra, guards, gram builders, quadrature.

TPU-native replacement for the reference's Theano tensor layer
(``/root/reference/g3py/libs/tensors.py``).
"""

from .guards import to_num, inf_to_num, to_cov, to_bounded
from .linalg import (
    safe_cholesky,
    solve_lower_triangular,
    solve_upper_triangular,
    cho_solve,
    log_det_from_chol,
    blocked_trtri,
    mvn_quad_logdet,
)
from .gram import (
    weighted_sqdist,
    weighted_dot,
    pairwise_sum,
    pairwise_prod,
    sqdist,
)
from .quadrature import gauss_hermite, hermgauss
from .root import newton_inverse
from .iterative import (
    cg_solve,
    slq_logdet,
    lazy_kernel_matvec,
    iterative_gp_nll,
    pivoted_cholesky,
    woodbury_preconditioner,
    pcg_solve,
    preconditioned_gp_nll,
)

__all__ = [
    "to_num",
    "inf_to_num",
    "to_cov",
    "to_bounded",
    "safe_cholesky",
    "solve_lower_triangular",
    "solve_upper_triangular",
    "cho_solve",
    "log_det_from_chol",
    "blocked_trtri",
    "mvn_quad_logdet",
    "weighted_sqdist",
    "weighted_dot",
    "pairwise_sum",
    "pairwise_prod",
    "sqdist",
    "gauss_hermite",
    "hermgauss",
    "newton_inverse",
    "cg_solve",
    "slq_logdet",
    "lazy_kernel_matvec",
    "iterative_gp_nll",
    "pivoted_cholesky",
    "woodbury_preconditioner",
    "pcg_solve",
    "preconditioned_gp_nll",
]
