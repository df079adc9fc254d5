from .cvxpylayer import CvxpyLayer, SolverError

__all__ = ["CvxpyLayer", "SolverError"]
