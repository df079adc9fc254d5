"""MLX frontend (API parity with the reference's mlx layer).

Importable only where MLX is installed (Apple silicon); raises a
guidance ImportError elsewhere. See cvxpylayer.py for the layer.
"""

from .cvxpylayer import CvxpyLayer  # noqa: F401

__all__ = ["CvxpyLayer"]
