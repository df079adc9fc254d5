"""MLX frontend: full run where mlx is installed (Apple silicon),
import-guidance contract elsewhere (reference tests/test_mlx.py and
tests/test_import_isolation.py patterns)."""

import importlib

import numpy as np
import pytest


def test_import_contract():
    """Without mlx, importing the frontend raises a guidance error;
    with mlx, CvxpyLayer must be exposed."""
    try:
        import mlx.core  # noqa: F401
        have_mlx = True
    except ImportError:
        have_mlx = False
    if have_mlx:
        mod = importlib.import_module("cvxpylayers_tpu.mlx")
        assert hasattr(mod, "CvxpyLayer")
    else:
        with pytest.raises(ImportError, match="mlx"):
            importlib.import_module("cvxpylayers_tpu.mlx")


try:
    import mlx.core as mlx
except ImportError:
    mlx = None

import cvxpylayers_tpu as ct  # noqa: E402

pytestmark_mlx = pytest.mark.skipif(mlx is None, reason="mlx not installed")


def _simplex_layer(n=5):
    from cvxpylayers_tpu.mlx import CvxpyLayer

    x = ct.Variable(n)
    v = ct.Parameter(n)
    prob = ct.Problem(
        ct.Minimize(ct.sum_squares(x - v)), [ct.sum(x) == 1, x >= 0]
    )
    return CvxpyLayer(prob, parameters=[v], variables=[x])


@pytestmark_mlx
class TestMlxFrontend:
    def test_forward_matches_jax(self):
        layer = _simplex_layer()
        rng = np.random.default_rng(0)
        vv = rng.standard_normal(5)
        (xs,) = layer(mlx.array(vv))
        import jax.numpy as jnp

        (ref,) = layer._layer(jnp.asarray(vv))
        np.testing.assert_allclose(np.array(xs), np.asarray(ref),
                                   atol=1e-6)

    def test_gradients(self):
        layer = _simplex_layer()
        rng = np.random.default_rng(1)
        vv = mlx.array(rng.standard_normal(5))

        def loss(v_):
            (xs,) = layer(v_)
            return (xs ** 2).sum()

        g = mlx.grad(loss)(vv)
        assert np.isfinite(np.array(g)).all()

    def test_warm_start(self):
        layer = _simplex_layer()
        rng = np.random.default_rng(2)
        vv = mlx.array(rng.standard_normal(5))
        (x1,) = layer(vv, warm_start=True)
        (x2,) = layer(vv, warm_start=True)
        np.testing.assert_allclose(np.array(x1), np.array(x2), atol=1e-7)
