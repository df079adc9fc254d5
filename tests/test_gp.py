"""Geometric programming (gp=True) path — the reference's test_basic_gp
problem (cvxpylayers tests/test_torch.py:429-458) against a scipy oracle,
plus transform validation and gradcheck."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.optimize

import cvxpylayers_tpu as ct
from cvxpylayers_tpu import CvxpyLayer
from cvxpylayers_tpu.canon.dgp import is_dgp

rng = np.random.default_rng(5)


def _reference_gp_layer():
    x = ct.Variable((), pos=True)
    y = ct.Variable((), pos=True)
    z = ct.Variable((), pos=True)
    a = ct.Parameter((), pos=True)
    b = ct.Parameter((), pos=True)
    c = ct.Parameter(())
    objective = 1.0 / (x * y * z)
    constraints = [a * (x * y + x * z + y * z) <= b, x >= y**c]
    problem = ct.Problem(ct.Minimize(objective), constraints)
    layer = CvxpyLayer(
        problem, parameters=[a, b, c], variables=[x, y, z], gp=True
    )
    return layer


def _gp_oracle(av, bv, cv):
    """Solve the same GP in log space with scipy (trust-constr)."""

    def obj(u):
        return -(u[0] + u[1] + u[2])

    def con1(u):
        x, y, z = np.exp(u)
        return bv - av * (x * y + x * z + y * z)

    def con2(u):
        return u[0] - cv * u[1]

    best = None
    for start in [np.zeros(3), -np.ones(3), np.array([-1.0, -2.0, -1.0])]:
        res = scipy.optimize.minimize(
            obj, start,
            constraints=[
                {"type": "ineq", "fun": con1},
                {"type": "ineq", "fun": con2},
            ],
            method="SLSQP", options={"ftol": 1e-14, "maxiter": 500},
        )
        if res.success and (best is None or res.fun < best.fun):
            best = res
    return np.exp(best.x)


class TestGP:
    def test_is_dgp(self):
        x = ct.Variable((), pos=True)
        y = ct.Variable((), pos=True)
        a = ct.Parameter((), pos=True)
        good = ct.Problem(
            ct.Minimize(1.0 / (x * y)), [a * (x + y) <= 1.0]
        )
        assert is_dgp(good)
        bad = ct.Problem(ct.Minimize(x - y))  # subtraction is not DGP
        assert not is_dgp(bad)

    def test_reference_basic_gp(self):
        layer = _reference_gp_layer()
        av, bv, cv = 2.0, 1.0, 0.5
        xs, ys, zs = layer(
            jnp.asarray(av), jnp.asarray(bv), jnp.asarray(cv)
        )
        want = _gp_oracle(av, bv, cv)
        got = np.array([float(xs), float(ys), float(zs)])
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_gp_gradients_fd(self):
        layer = _reference_gp_layer()

        def f(a_, b_, c_):
            xs, ys, zs = layer(a_, b_, c_)
            return xs + 2 * ys + 3 * zs

        args = (jnp.asarray(2.0), jnp.asarray(1.0), jnp.asarray(0.5))
        g = jax.grad(f, argnums=(0, 1, 2))(*args)
        eps = 1e-6
        for k in range(3):
            pert = [jnp.asarray(float(a)) for a in args]
            pert[k] = pert[k] + eps
            fp = float(f(*pert))
            pert[k] = pert[k] - 2 * eps
            fm = float(f(*pert))
            num = (fp - fm) / (2 * eps)
            assert abs(float(g[k]) - num) < 2e-4 * (1 + abs(num)), (
                k, float(g[k]), num
            )

    def test_gp_batched(self):
        layer = _reference_gp_layer()
        B = 3
        av = jnp.asarray(np.linspace(1.5, 2.5, B))
        bv = jnp.asarray(np.linspace(0.8, 1.2, B))
        cv = jnp.asarray(np.linspace(0.4, 0.6, B))
        xs, ys, zs = layer(av, bv, cv)
        assert xs.shape == (B,)
        for i in range(B):
            want = _gp_oracle(float(av[i]), float(bv[i]), float(cv[i]))
            got = np.array([float(xs[i]), float(ys[i]), float(zs[i])])
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_gp_rejects_nonpos_variable(self):
        x = ct.Variable(())  # missing pos=True
        a = ct.Parameter((), pos=True)
        prob = ct.Problem(ct.Minimize(a * x), [x >= 1.0])
        with pytest_raises_valueerror():
            CvxpyLayer(prob, parameters=[a], variables=[x], gp=True)


def pytest_raises_valueerror():
    import pytest

    return pytest.raises(ValueError, match="DGP|pos")
