"""Test configuration.

Tests run on CPU in float64 (solver accuracy checks need it). The driver
environment pins JAX_PLATFORMS=axon (TPU tunnel) and shadows the env var, so
the platform must be forced through the config API before any backend
initialization. The multi-chip sharding path (cvxpylayers_tpu.parallel) is
exercised against a virtual multi-device CPU mesh in dedicated tests.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
