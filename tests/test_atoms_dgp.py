"""DGP atom batch: prod, gmatmul, one_minus_pos, pf_eigenvalue,
eye_minus_inv, plus exp/log/xexp/pnorm log-log rules — closed-form
oracles through the gp=True pipeline (the reference reaches these through
cvxpy's Dgp2Dcp; cvxpy atoms prod/gmatmul/one_minus_pos/pf_eigenvalue/
eye_minus_inv)."""

import jax
import jax.numpy as jnp
import numpy as np

import cvxpylayers_tpu as ct
from cvxpylayers_tpu import CvxpyLayer

rng = np.random.default_rng(11)


class TestProd:
    def test_max_prod_on_simplex(self):
        # max prod(x) s.t. sum(x) <= s  ->  x_i = s/n
        n = 4
        x = ct.Variable(n, pos=True)
        s = ct.Parameter((), pos=True)
        prob = ct.Problem(ct.Maximize(ct.prod(x)), [ct.sum(x) <= s])
        layer = CvxpyLayer(prob, parameters=[s], variables=[x], gp=True)
        (xs,) = layer(jnp.asarray(2.0))
        np.testing.assert_allclose(np.asarray(xs), np.full(n, 0.5),
                                   atol=1e-5)

    def test_gradcheck_fd(self):
        n = 3
        x = ct.Variable(n, pos=True)
        s = ct.Parameter((), pos=True)
        prob = ct.Problem(ct.Maximize(ct.prod(x)), [ct.sum(x) <= s])
        layer = CvxpyLayer(prob, parameters=[s], variables=[x], gp=True)

        def loss(sv):
            return jnp.sum(layer(sv)[0])

        sv = jnp.asarray(3.0)
        g = jax.grad(loss)(sv)
        eps = 1e-5
        fd = (float(loss(sv + eps)) - float(loss(sv - eps))) / (2 * eps)
        np.testing.assert_allclose(float(g), fd, rtol=1e-4, atol=1e-6)


class TestGmatmul:
    def test_pinned(self):
        A = rng.standard_normal((3, 4))
        x = ct.Variable(4, pos=True)
        p = ct.Parameter(4, pos=True)
        prob = ct.Problem(
            ct.Minimize(ct.sum(ct.gmatmul(A, x))), [x == p]
        )
        layer = CvxpyLayer(prob, parameters=[p], variables=[x], gp=True)
        pv = np.abs(rng.standard_normal(4)) + 0.5
        (xs,) = layer(jnp.asarray(pv))
        np.testing.assert_allclose(np.asarray(xs), pv, rtol=1e-6)

    def test_value(self):
        A = np.array([[1.0, -2.0], [0.5, 3.0]])
        xv = np.array([2.0, 0.7])
        got = ct.gmatmul(A, ct.Constant(xv)).value
        np.testing.assert_allclose(got, np.exp(A @ np.log(xv)), rtol=1e-12)


class TestOneMinusPos:
    def test_max(self):
        x = ct.Variable((), pos=True)
        p = ct.Parameter((), pos=True)
        prob = ct.Problem(ct.Maximize(ct.one_minus_pos(x)), [x >= p])
        layer = CvxpyLayer(prob, parameters=[p], variables=[x], gp=True)
        (xs,) = layer(jnp.asarray(0.3))
        np.testing.assert_allclose(float(xs), 0.3, atol=1e-6)


class TestPfEigenvalue:
    def test_pinned(self):
        n = 3
        Av = np.abs(rng.standard_normal((n, n))) + 0.1
        X = ct.Variable((n, n), pos=True)
        pA = ct.Parameter((n, n), pos=True)
        prob = ct.Problem(ct.Minimize(ct.pf_eigenvalue(X)), [X == pA])
        layer = CvxpyLayer(prob, parameters=[pA], variables=[X], gp=True)
        (Xs,) = layer(jnp.asarray(Av))
        np.testing.assert_allclose(np.asarray(Xs), Av, rtol=1e-5)

    def test_scaling_design(self):
        # min pf(diag(d) A diag(d)^-1 scaled by x): pick the classic
        # free-scaling problem min_x pf(A * outer(x, 1/x)) == pf(A);
        # instead pin two entries and verify monotone improvement exists:
        # here just check the epigraph is tight on a direct min with a
        # row-sum cap.
        n = 3
        Av = np.abs(rng.standard_normal((n, n))) + 0.2
        X = ct.Variable((n, n), pos=True)
        pA = ct.Parameter((n, n), pos=True)
        # X >= A elementwise, minimize pf(X) -> X = A (pf is increasing)
        prob = ct.Problem(ct.Minimize(ct.pf_eigenvalue(X)), [X >= pA])
        layer = CvxpyLayer(prob, parameters=[pA], variables=[X], gp=True)
        (Xs,) = layer(jnp.asarray(Av))
        lam = np.max(np.real(np.linalg.eigvals(np.asarray(Xs))))
        want = np.max(np.real(np.linalg.eigvals(Av)))
        np.testing.assert_allclose(lam, want, rtol=1e-5)


class TestEyeMinusInv:
    def test_pinned(self):
        n = 3
        Av = np.abs(rng.standard_normal((n, n)))
        Av = 0.5 * Av / np.max(np.abs(np.linalg.eigvals(Av)))
        X = ct.Variable((n, n), pos=True)
        pA = ct.Parameter((n, n), pos=True)
        prob = ct.Problem(
            ct.Minimize(ct.sum(ct.eye_minus_inv(X))), [X == pA]
        )
        layer = CvxpyLayer(prob, parameters=[pA], variables=[X], gp=True)
        (Xs,) = layer(jnp.asarray(Av))
        np.testing.assert_allclose(np.asarray(Xs), Av, rtol=1e-4)

    def test_value(self):
        Av = np.array([[0.1, 0.2], [0.05, 0.3]])
        got = ct.eye_minus_inv(ct.Constant(Av)).value
        np.testing.assert_allclose(
            got, np.linalg.inv(np.eye(2) - Av), rtol=1e-12
        )


class TestLogLogRules:
    def test_xexp_gp(self):
        x = ct.Variable((), pos=True)
        p = ct.Parameter((), pos=True)
        prob = ct.Problem(ct.Minimize(ct.xexp(x)), [x >= p])
        layer = CvxpyLayer(prob, parameters=[p], variables=[x], gp=True)
        (xs,) = layer(jnp.asarray(1.7))
        np.testing.assert_allclose(float(xs), 1.7, atol=1e-5)

    def test_log_gp(self):
        x = ct.Variable((), pos=True)
        p = ct.Parameter((), pos=True)
        prob = ct.Problem(ct.Maximize(ct.log(x)), [x <= p])
        layer = CvxpyLayer(prob, parameters=[p], variables=[x], gp=True)
        (xs,) = layer(jnp.asarray(3.0))
        np.testing.assert_allclose(float(xs), 3.0, atol=1e-5)

    def test_norm2_gp(self):
        x = ct.Variable(3, pos=True)
        p = ct.Parameter(3, pos=True)
        prob = ct.Problem(ct.Minimize(ct.norm(x, 2)), [x >= p])
        layer = CvxpyLayer(prob, parameters=[p], variables=[x], gp=True)
        pv = np.array([1.0, 2.0, 0.5])
        (xs,) = layer(jnp.asarray(pv))
        np.testing.assert_allclose(np.asarray(xs), pv, rtol=1e-5)
