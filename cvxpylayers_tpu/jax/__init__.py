"""Drop-in import-path parity with the reference (`from cvxpylayers.jax
import CvxpyLayer`): the native layer IS the JAX layer."""

from ..layer import CvxpyLayer, SolverError

__all__ = ["CvxpyLayer", "SolverError"]
