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

import zlib

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _order_independent_rng(request):
    """Reseed each module's shared `rng` deterministically per test.

    Several modules draw problem data from a module-level
    `np.random.default_rng(k)`, which makes the data depend on execution
    ORDER (a test sees different instances under -k selection or
    pytest-xdist than in a full sequential run). Reseeding from a stable
    hash of the test id makes every test's data deterministic and
    order-independent, so the suite can run under xdist and single tests
    reproduce exactly.
    """
    mod = request.node.module
    if hasattr(mod, "rng") and isinstance(
        getattr(mod, "rng"), np.random.Generator
    ):
        seed = zlib.crc32(request.node.nodeid.encode())
        mod.rng = np.random.default_rng(seed)
