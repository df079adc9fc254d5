"""cvxpylayers_tpu: a TPU-native differentiable convex optimization framework.

A from-scratch JAX/XLA/Pallas re-design of the capability stack behind
cvxpy/cvxpylayers (CVXPY canonicalization + diffcp/SCS/Clarabel/Moreau
solvers + framework layer wrappers): declare a parametrized convex program
once, compile it into fixed-sparsity affine maps from parameters to cone
program data, and solve/differentiate batches of instances natively on TPU
under jit/vmap/grad/pjit.
"""

__version__ = "0.1.0"

from .layer import CvxpyLayer, SolverError, WarmStart  # noqa: E402,F401
from .expressions import (  # noqa: E402,F401
    Constant,
    Constraint,
    Equality,
    ExpCone,
    Inequality,
    Maximize,
    Minimize,
    NonNeg,
    Parameter,
    PowCone3D,
    Problem,
    PSD,
    SOC,
    Variable,
    abs,
    bmat,
    conv,
    cumsum,
    kron,
    diag,
    entr,
    exp,
    geo_mean,
    hstack,
    huber,
    inv_pos,
    kl_div,
    lambda_max,
    lambda_min,
    log,
    log_det,
    log_sum_exp,
    logistic,
    matrix_frac,
    max,
    maximum,
    min,
    minimum,
    multiply,
    neg,
    norm,
    pnorm,
    pos,
    power,
    quad_form,
    quad_over_lin,
    rel_entr,
    reshape,
    sigma_max,
    sqrt,
    square,
    sum,
    sum_squares,
    trace,
    vstack,
)
