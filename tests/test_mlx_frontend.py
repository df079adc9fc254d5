"""MLX frontend: full run where mlx is installed (Apple silicon),
import-guidance contract elsewhere (reference tests/test_mlx.py and
tests/test_import_isolation.py patterns)."""

import importlib

import numpy as np
import pytest


def _make_stub_mlx():
    """A minimal fake mlx.core: arrays are numpy, custom_function is a
    recording decorator — enough to execute every closure in
    cvxpylayers_tpu/mlx/cvxpylayer.py (the bridge logic is framework-
    agnostic numpy round-trips). Reference pattern: import-isolation by
    sys.modules injection (cvxpylayers tests/test_import_isolation.py)."""
    import types

    core = types.ModuleType("mlx.core")
    instances = []

    class custom_function:  # noqa: N801 - mlx casing
        def __init__(self, fn):
            self._fn = fn
            self._vjp = None
            instances.append(self)

        def vjp(self, fn):
            self._vjp = fn
            return fn

        def __call__(self, *args):
            self._last_primals = args
            self._last_outputs = self._fn(*args)
            return self._last_outputs

    core.array = lambda x: np.asarray(x)
    core.custom_function = custom_function
    core._instances = instances
    pkg = types.ModuleType("mlx")
    pkg.core = core
    return pkg, core


@pytest.fixture
def stub_mlx(monkeypatch):
    """Inject the stub mlx and (re)import the frontend against it."""
    if mlx is not None:
        pytest.skip("real mlx installed; stub smoke test is redundant")
    import sys

    pkg, core = _make_stub_mlx()
    monkeypatch.setitem(sys.modules, "mlx", pkg)
    monkeypatch.setitem(sys.modules, "mlx.core", core)
    for name in ("cvxpylayers_tpu.mlx", "cvxpylayers_tpu.mlx.cvxpylayer"):
        monkeypatch.delitem(sys.modules, name, raising=False)
    mod = importlib.import_module("cvxpylayers_tpu.mlx.cvxpylayer")
    yield mod, core
    for name in ("cvxpylayers_tpu.mlx", "cvxpylayers_tpu.mlx.cvxpylayer"):
        sys.modules.pop(name, None)


class TestMlxStubBridge:
    """Execute the mlx bridge end to end against the stub backend —
    closes the zero-executed-coverage gap (mlx ships only on Apple
    silicon): forward closure, registered vjp closure, warm-start cache,
    and the solver-failure contract all run here."""

    def _layer(self, mod, n=5):
        x = ct.Variable(n)
        v = ct.Parameter(n)
        prob = ct.Problem(
            ct.Minimize(ct.sum_squares(x - v)), [ct.sum(x) == 1, x >= 0]
        )
        return mod.CvxpyLayer(prob, parameters=[v], variables=[x])

    def test_forward_matches_jax(self, stub_mlx):
        mod, core = stub_mlx
        layer = self._layer(mod)
        rng = np.random.default_rng(0)
        vv = rng.standard_normal(5)
        (xs,) = layer(core.array(vv))
        import jax.numpy as jnp

        (ref,) = layer._layer(jnp.asarray(vv))
        np.testing.assert_allclose(np.array(xs), np.asarray(ref),
                                   atol=1e-6)

    def test_vjp_closure_matches_jax_grad(self, stub_mlx):
        mod, core = stub_mlx
        layer = self._layer(mod)
        rng = np.random.default_rng(1)
        vv = rng.standard_normal(5)
        (xs,) = layer(core.array(vv))
        inst = core._instances[-1]
        assert inst._vjp is not None
        (g,) = inst._vjp(inst._last_primals, np.ones_like(np.array(xs)),
                         inst._last_outputs)

        import jax
        import jax.numpy as jnp

        ref = jax.grad(lambda v_: jnp.sum(layer._layer(v_)[0]))(
            jnp.asarray(vv)
        )
        np.testing.assert_allclose(np.array(g), np.asarray(ref), atol=1e-5)

    def test_warm_start_cache(self, stub_mlx):
        mod, core = stub_mlx
        layer = self._layer(mod)
        vv = core.array(np.random.default_rng(2).standard_normal(5))
        (x1,) = layer(vv, warm_start=True)
        assert layer._warm is not None
        (x2,) = layer(vv, warm_start=True)
        np.testing.assert_allclose(np.array(x1), np.array(x2), atol=1e-7)

    def test_infeasible_raises(self, stub_mlx):
        mod, core = stub_mlx
        from cvxpylayers_tpu.layer.cvxpylayer import SolverError

        x = ct.Variable(1)
        p = ct.Parameter(1)
        prob = ct.Problem(ct.Minimize(ct.sum(x)), [x >= 1, x <= p - 2])
        layer = mod.CvxpyLayer(prob, parameters=[p], variables=[x])
        with pytest.raises(SolverError, match="infeasible"):
            layer(core.array(np.zeros(1)))
        # opt-out path returns data instead of raising
        (out,) = layer(core.array(np.zeros(1)), check_status=False)
        assert np.array(out).shape == (1,)


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
