"""MLX frontend placeholder.

The reference ships an MLX layer (cvxpylayers mlx/cvxpylayer.py) for Apple
silicon. MLX does not run on TPU hosts, so this package intentionally
raises at import with guidance; the torch and jax frontends cover the
cross-framework story here.
"""

raise ImportError(
    "cvxpylayers_tpu.mlx: MLX is Apple-silicon-only and unavailable on TPU "
    "hosts. Use cvxpylayers_tpu (JAX, native) or cvxpylayers_tpu.torch."
)
