from .cvxpylayer import CvxpyLayer

__all__ = ["CvxpyLayer"]
