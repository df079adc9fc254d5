"""CVXPY-interop conformance battery (SURVEY section 7.1.2).

Skips cleanly when cvxpy is not installed. With cvxpy present, declares
the reference corpus problems in REAL cvxpy, hands the cp.Problem
straight to the native CvxpyLayer (interop shim converts it), and
compares primal/dual solutions and gradients against cvxpy's own direct
solves at the reference accuracy contract (1e-6 primal / 1e-4 grads;
cf. cvxpylayers tests/test_torch.py:104,787).
"""

import numpy as np
import pytest

cp = pytest.importorskip("cvxpy")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cvxpylayers_tpu import CvxpyLayer  # noqa: E402

rng = np.random.default_rng(42)


def _solve_cvxpy(problem, params, values):
    for p, v in zip(params, values):
        p.value = np.asarray(v)
    problem.solve(solver=cp.CLARABEL)
    return problem


class TestConformance:
    def test_lad_regression(self):
        # reference tests/test_torch.py:41-59
        n, m = 2, 4
        x = cp.Variable(n)
        A = cp.Parameter((m, n))
        b = cp.Parameter(m)
        prob = cp.Problem(cp.Minimize(cp.norm(A @ x - b, 1)), [x >= 0])
        layer = CvxpyLayer(prob, parameters=[A, b], variables=[x])
        Av = rng.standard_normal((m, n))
        bv = rng.standard_normal(m)
        (xs,) = layer(jnp.asarray(Av), jnp.asarray(bv))
        _solve_cvxpy(prob, [A, b], [Av, bv])
        np.testing.assert_allclose(np.asarray(xs), x.value, atol=1e-6)

    def test_least_squares_with_gradients(self):
        n, m = 3, 6
        beta = cp.Variable(n)
        X = cp.Parameter((m, n))
        y = cp.Parameter(m)
        prob = cp.Problem(cp.Minimize(cp.sum_squares(X @ beta - y)))
        layer = CvxpyLayer(prob, parameters=[X, y], variables=[beta])
        Xv = rng.standard_normal((m, n))
        yv = rng.standard_normal(m)
        (bs,) = layer(jnp.asarray(Xv), jnp.asarray(yv))
        ref = np.linalg.lstsq(Xv, yv, rcond=None)[0]
        np.testing.assert_allclose(np.asarray(bs), ref, atol=1e-6)
        # envelope gradient vs finite differences
        def loss(y_):
            return jnp.sum(layer(jnp.asarray(Xv), y_)[0] ** 2)

        g = jax.grad(loss)(jnp.asarray(yv))
        eps = 1e-6
        for i in range(m):
            e = np.zeros(m)
            e[i] = eps
            fd = (float(loss(jnp.asarray(yv + e)))
                  - float(loss(jnp.asarray(yv - e)))) / (2 * eps)
            np.testing.assert_allclose(float(g[i]), fd, atol=1e-4)

    def test_simplex_projection_with_eq_dual(self):
        n = 5
        x = cp.Variable(n)
        v = cp.Parameter(n)
        cons = [cp.sum(x) == 1, x >= 0]
        prob = cp.Problem(cp.Minimize(cp.sum_squares(x - v)), cons)
        layer = CvxpyLayer(prob, parameters=[v],
                           variables=[x, cons[0]])
        vv = rng.standard_normal(n)
        xs, nu = layer(jnp.asarray(vv))
        _solve_cvxpy(prob, [v], [vv])
        np.testing.assert_allclose(np.asarray(xs), x.value, atol=1e-6)
        np.testing.assert_allclose(
            np.abs(np.asarray(nu)).reshape(()),
            np.abs(cons[0].dual_value), atol=1e-5,
        )

    def test_logistic_regression_exp_cone(self):
        # reference tests/test_torch.py:158-187
        nf, ns = 2, 6
        beta = cp.Variable(nf)
        Xy = cp.Parameter((ns, nf))
        prob = cp.Problem(
            cp.Minimize(
                cp.sum(cp.logistic(Xy @ beta)) + 0.1 * cp.sum_squares(beta)
            )
        )
        layer = CvxpyLayer(prob, parameters=[Xy], variables=[beta])
        Xv = rng.standard_normal((ns, nf))
        (bs,) = layer(jnp.asarray(Xv))
        _solve_cvxpy(prob, [Xy], [Xv])
        np.testing.assert_allclose(np.asarray(bs), beta.value, atol=1e-5)

    def test_sdp_trace_objective(self):
        # reference tests/test_torch.py:233-248 shape class
        s = 3
        X = cp.Variable((s, s), symmetric=True)
        C = cp.Parameter((s, s))
        prob = cp.Problem(
            cp.Minimize(cp.trace(C @ X)),
            [cp.trace(X) == 1, X >> 0],
        )
        layer = CvxpyLayer(prob, parameters=[C], variables=[X])
        Cv = rng.standard_normal((s, s))
        Cv = (Cv + Cv.T) / 2
        (Xs,) = layer(jnp.asarray(Cv))
        w = np.linalg.eigvalsh(Cv)
        np.testing.assert_allclose(
            float(np.trace(Cv @ np.asarray(Xs))), w[0], atol=1e-6
        )

    def test_socp_norm_constraint(self):
        n = 4
        x = cp.Variable(n)
        v = cp.Parameter(n)
        prob = cp.Problem(
            cp.Minimize(cp.sum_squares(x - v)), [cp.norm(x, 2) <= 1.0]
        )
        layer = CvxpyLayer(prob, parameters=[v], variables=[x])
        vv = rng.standard_normal(n) * 2
        (xs,) = layer(jnp.asarray(vv))
        ref = vv / max(np.linalg.norm(vv), 1.0)
        np.testing.assert_allclose(np.asarray(xs), ref, atol=1e-6)
