"""Model zoo vs closed-form / independent oracles (the reference's
functional-layer zoo contract, cvxpylayers tests/test_mlx.py:664-939)."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.optimize
import scipy.special

from cvxpylayers_tpu import models

rng = np.random.default_rng(11)


def simplex_projection(v):
    n = v.size
    u = np.sort(v)[::-1]
    css = np.cumsum(u) - 1
    ks = np.arange(1, n + 1)
    rho = np.max(ks[u - css / ks > 0])
    tau = css[rho - 1] / rho
    return np.maximum(v - tau, 0)


class TestZoo:
    def test_relu(self):
        layer = models.relu(6)
        x = rng.standard_normal(6)
        (y,) = layer(jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(y), np.maximum(x, 0), atol=1e-7)
        # gradient: d relu / dx = 1[x > 0]
        J = jax.jacobian(lambda v: layer(v)[0])(jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(J), np.diag((x > 0).astype(float)), atol=1e-6
        )

    def test_sigmoid(self):
        layer = models.sigmoid(5)
        x = rng.standard_normal(5)
        (y,) = layer(jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(y), scipy.special.expit(x), atol=1e-6
        )

    def test_softmax(self):
        layer = models.softmax(5)
        x = rng.standard_normal(5)
        (y,) = layer(jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(y), scipy.special.softmax(x), atol=1e-6
        )

    def test_sparsemax(self):
        layer = models.sparsemax(7)
        x = rng.standard_normal(7) * 2
        (y,) = layer(jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(y), simplex_projection(x), atol=1e-6
        )

    def test_csparsemax(self):
        layer = models.csparsemax(6, u=0.3)
        x = rng.standard_normal(6) * 3
        (y,) = layer(jnp.asarray(x))
        y = np.asarray(y)
        assert abs(y.sum() - 1) < 1e-6
        assert np.all(y <= 0.3 + 1e-7) and np.all(y >= -1e-7)
        # oracle via SLSQP
        res = scipy.optimize.minimize(
            lambda z: 0.5 * np.sum((z - x) ** 2),
            np.ones(6) / 6,
            constraints=[
                {"type": "eq", "fun": lambda z: z.sum() - 1},
                {"type": "ineq", "fun": lambda z: z},
                {"type": "ineq", "fun": lambda z: 0.3 - z},
            ],
            method="SLSQP", options={"ftol": 1e-14, "maxiter": 300},
        )
        np.testing.assert_allclose(y, res.x, atol=1e-5)

    def test_lml(self):
        n, k = 6, 2
        layer = models.lml(n, k)
        x = rng.standard_normal(n)
        (y,) = layer(jnp.asarray(x))
        y = np.asarray(y)
        assert abs(y.sum() - k) < 1e-6
        # KKT: y_i = sigmoid(x_i + nu) for the nu matching the budget
        from scipy.optimize import brentq

        nu = brentq(
            lambda t: scipy.special.expit(x + t).sum() - k, -50, 50
        )
        np.testing.assert_allclose(y, scipy.special.expit(x + nu), atol=1e-6)

    def test_box_qp(self):
        n, mi = 5, 3
        layer = models.box_qp(n, mi)
        x = rng.standard_normal(n)
        G = rng.standard_normal((mi, n))
        h = np.abs(rng.standard_normal(mi)) + 0.5
        (y,) = layer(jnp.asarray(x), jnp.asarray(G), jnp.asarray(h))
        y = np.asarray(y)
        res = scipy.optimize.minimize(
            lambda z: 0.5 * np.sum((z - x) ** 2),
            np.clip(x, 0, 1),
            constraints=[{"type": "ineq", "fun": lambda z: h - G @ z}],
            bounds=[(0, 1)] * n,
            method="SLSQP", options={"ftol": 1e-14, "maxiter": 300},
        )
        np.testing.assert_allclose(y, res.x, atol=1e-5)

    def test_markowitz_grads(self):
        n = 6
        layer = models.markowitz(n, gamma=0.5)
        mu = jnp.asarray(rng.standard_normal(n) * 0.1)
        F = jnp.asarray(rng.standard_normal((n, n)) / np.sqrt(n))
        (w,) = layer(mu, F)
        w_np = np.asarray(w)
        assert abs(w_np.sum() - 1) < 1e-6 and np.all(w_np >= -1e-7)
        g = jax.grad(lambda m_: jnp.sum(layer(m_, F)[0] ** 2))(mu)
        assert np.all(np.isfinite(np.asarray(g)))

    def test_logistic_regression(self):
        nf, ns = 3, 12
        layer = models.logistic_regression_layer(nf, ns, reg=1e-1)
        X = rng.standard_normal((ns, nf))
        yv = rng.choice([-1.0, 1.0], ns)
        Xy = -yv[:, None] * X
        (beta,) = layer(jnp.asarray(Xy))
        beta = np.asarray(beta)

        def obj(b):
            z = Xy @ b
            return np.sum(np.logaddexp(0, z)) + 1e-1 * np.sum(b**2)

        res = scipy.optimize.minimize(obj, np.zeros(nf), method="BFGS",
                                      options={"gtol": 1e-12})
        np.testing.assert_allclose(beta, res.x, atol=1e-5)

    def test_ellipsoid_projection(self):
        n = 4
        layer = models.ellipsoid_projection(n)
        x = rng.standard_normal(n) * 3
        A = np.eye(n) * 0.5 + 0.05 * rng.standard_normal((n, n))
        b = 0.1 * rng.standard_normal(n)
        (y,) = layer(jnp.asarray(x), jnp.asarray(A), jnp.asarray(b))
        y = np.asarray(y)
        assert np.linalg.norm(A @ y + b) <= 1 + 1e-7
        res = scipy.optimize.minimize(
            lambda z: 0.5 * np.sum((z - x) ** 2),
            np.zeros(n),
            constraints=[{
                "type": "ineq",
                "fun": lambda z: 1 - np.linalg.norm(A @ z + b),
            }],
            method="SLSQP", options={"ftol": 1e-14, "maxiter": 300},
        )
        np.testing.assert_allclose(y, res.x, atol=1e-4)

    def test_batched_zoo(self):
        layer = models.sparsemax(5)
        X = rng.standard_normal((9, 5))
        (Y,) = layer(jnp.asarray(X))
        for i in range(9):
            np.testing.assert_allclose(
                np.asarray(Y[i]), simplex_projection(X[i]), atol=1e-6
            )
