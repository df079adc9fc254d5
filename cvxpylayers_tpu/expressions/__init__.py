"""Public expression API (the cvxpy-like namespace of the framework)."""

from .constraints import (
    Constraint,
    Equality,
    ExpCone,
    Inequality,
    NonNeg,
    PowCone3D,
    PSD,
    SOC,
)
from .expression import Curvature, Expression, Sign
from .leaf import Constant, Parameter, Variable
from .problem import Maximize, Minimize, Problem
from .atoms.affine import (
    bmat,
    conv,
    cumsum,
    kron,
    diag,
    hstack,
    multiply,
    reshape,
    sum,
    trace,
    vstack,
)
from .atoms.nonlinear import (
    abs,
    entr,
    exp,
    geo_mean,
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
    neg,
    norm,
    pnorm,
    pos,
    power,
    quad_form,
    quad_over_lin,
    rel_entr,
    sigma_max,
    sqrt,
    square,
    sum_squares,
)

__all__ = [
    "Constraint", "Equality", "ExpCone", "Inequality", "NonNeg", "PowCone3D",
    "PSD", "SOC", "Curvature", "Expression", "Sign", "Constant", "Parameter",
    "Variable", "Maximize", "Minimize", "Problem", "bmat", "conv", "cumsum", "kron", "diag", "hstack",
    "multiply", "reshape", "sum", "trace", "vstack", "abs", "entr", "exp",
    "geo_mean", "huber", "inv_pos", "kl_div", "lambda_max", "lambda_min",
    "log", "log_det", "log_sum_exp", "logistic", "max", "maximum", "min", "minimum",
    "matrix_frac", "neg", "norm", "pnorm", "sigma_max", "pos", "power", "quad_form", "quad_over_lin",
    "rel_entr", "sqrt", "square", "sum_squares",
]
