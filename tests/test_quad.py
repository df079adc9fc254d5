"""Native quadratic objective path (P != 0): sum_squares extraction,
parametric quad_form (the reference's _quad_form_dpp capability), and
param-scaled quadratics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cvxpylayers_tpu as ct
from cvxpylayers_tpu import CvxpyLayer
from cvxpylayers_tpu.canon import stuff

rng = np.random.default_rng(21)


class TestExtraction:
    def test_projection_layer_is_pure_qp(self):
        n = 6
        x = ct.Variable(n)
        v = ct.Parameter(n)
        prob = ct.Problem(ct.Minimize(ct.sum_squares(x - v)), [x >= 0])
        prog = stuff(prob, [v])
        assert prog.dims.soc == ()
        assert prog.n == n  # no auxiliary epigraph variable
        assert prog.P_rows.size == n  # P = 2I
        # q map: -2v
        np.testing.assert_allclose(
            prog.reduced_q.toarray()[:n, :n], -2 * np.eye(n)
        )

    def test_param_dependent_matrix_falls_back(self):
        # sum_squares(A_param @ x): V depends on params -> epigraph path
        n, m = 3, 4
        x = ct.Variable(n)
        A = ct.Parameter((m, n))
        prob = ct.Problem(ct.Minimize(ct.sum_squares(A @ x)), [ct.sum(x) == 1])
        prog = stuff(prob, [A])
        assert prog.P_rows.size == 0
        assert len(prog.dims.soc) == 1

    def test_mixed_linear_plus_quadratic(self):
        n = 4
        x = ct.Variable(n)
        c = ct.Parameter(n)
        v = ct.Parameter(n)
        prob = ct.Problem(
            ct.Minimize(c @ x + ct.sum_squares(x - v) + 1.5), [x >= -10]
        )
        prog = stuff(prob, [c, v])
        assert prog.P_rows.size == n
        layer = CvxpyLayer(prob, parameters=[c, v], variables=[x])
        cv = rng.standard_normal(n)
        vv = rng.standard_normal(n)
        (xs,) = layer(jnp.asarray(cv), jnp.asarray(vv))
        # analytic: min c'x + ||x - v||^2 -> x = v - c/2 (interior)
        np.testing.assert_allclose(np.asarray(xs), vv - cv / 2, atol=1e-7)


class TestMarkowitzScale:
    def test_markowitz_n150_sparse_param_maps(self):
        # n=150 => n_param ~ 22.7k; the dense reduced_P would be
        # O(nnz_P x n_param) = 22500 x 22651 (~4 GB in f64) — the layer
        # must route through the sparse gather/segment-sum appliers
        # (reference analogue: BCSR buffers, jax/cvxpylayer.py:321-326)
        n = 150
        x = ct.Variable(n)
        mu = ct.Parameter(n)
        Sig = ct.Parameter((n, n), PSD=True)
        gamma = 2.0
        prob = ct.Problem(
            ct.Minimize(gamma * ct.quad_form(x, Sig) - mu @ x),
            [ct.sum(x) == 1, x >= 0],
        )
        import time

        t0 = time.time()
        layer = CvxpyLayer(prob, parameters=[mu, Sig], variables=[x])
        assert time.time() - t0 < 30.0
        F = rng.standard_normal((n, 15))
        Sv = F @ F.T / n + 0.1 * np.eye(n)
        muv = rng.standard_normal(n) * 0.1
        (xs,) = layer(jnp.asarray(muv), jnp.asarray(Sv),
                      solver_args={"solve_method": "ipm"})
        import scipy.optimize as so

        res = so.minimize(
            lambda z: gamma * z @ Sv @ z - muv @ z, np.ones(n) / n,
            jac=lambda z: 2 * gamma * Sv @ z - muv,
            constraints=[{"type": "eq", "fun": lambda z: z.sum() - 1,
                          "jac": lambda z: np.ones(n)}],
            bounds=[(0, None)] * n, method="SLSQP",
            options={"maxiter": 300, "ftol": 1e-12},
        )
        obj = float(
            gamma * np.asarray(xs) @ Sv @ np.asarray(xs)
            - muv @ np.asarray(xs)
        )
        np.testing.assert_allclose(obj, res.fun, atol=1e-8)
        # gradients flow through the sparse appliers
        g = jax.grad(
            lambda m_: jnp.sum(
                layer(m_, jnp.asarray(Sv),
                      solver_args={"solve_method": "ipm"})[0] ** 2
            )
        )(jnp.asarray(muv))
        assert np.isfinite(np.asarray(g)).all()


class TestQuadFormParam:
    def test_forward_analytic(self):
        # min quad_form(x, P) + q'x -> x* = -(2P)^{-1} q
        n = 4
        x = ct.Variable(n)
        P = ct.Parameter((n, n), PSD=True)
        q = ct.Parameter(n)
        prob = ct.Problem(ct.Minimize(ct.quad_form(x, P) + q @ x))
        layer = CvxpyLayer(prob, parameters=[P, q], variables=[x])
        L = rng.standard_normal((n, n))
        Pv = L @ L.T + np.eye(n)
        qv = rng.standard_normal(n)
        (xs,) = layer(jnp.asarray(Pv), jnp.asarray(qv))
        want = -np.linalg.solve(2 * Pv, qv)
        np.testing.assert_allclose(np.asarray(xs), want, atol=1e-7)

    def test_gradients_vs_analytic(self):
        n = 3
        x = ct.Variable(n)
        P = ct.Parameter((n, n), PSD=True)
        q = ct.Parameter(n)
        prob = ct.Problem(ct.Minimize(ct.quad_form(x, P) + q @ x))
        layer = CvxpyLayer(prob, parameters=[P, q], variables=[x])
        L = rng.standard_normal((n, n))
        Pv = jnp.asarray(L @ L.T + np.eye(n))
        qv = jnp.asarray(rng.standard_normal(n))

        def f(P_, q_):
            (xs,) = layer(P_, q_)
            return jnp.sum(xs**2)

        def f_exact(P_, q_):
            Ps = 0.5 * (P_ + P_.T)
            xs = -jnp.linalg.solve(2 * Ps, q_)
            return jnp.sum(xs**2)

        g = jax.grad(f, argnums=(0, 1))(Pv, qv)
        ge = jax.grad(f_exact, argnums=(0, 1))(Pv, qv)
        np.testing.assert_allclose(np.asarray(g[0]), np.asarray(ge[0]),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(g[1]), np.asarray(ge[1]),
                                   atol=1e-6)

    def test_quad_form_with_constraints(self):
        # Markowitz-like: min quad_form(w, Sigma) - mu'w, sum w == 1
        n = 5
        w = ct.Variable(n)
        Sigma = ct.Parameter((n, n), PSD=True)
        mu = ct.Parameter(n)
        prob = ct.Problem(
            ct.Minimize(ct.quad_form(w, Sigma) - mu @ w), [ct.sum(w) == 1]
        )
        layer = CvxpyLayer(prob, parameters=[Sigma, mu], variables=[w])
        L = rng.standard_normal((n, n)) / np.sqrt(n)
        Sv = L @ L.T + 0.1 * np.eye(n)
        mv = rng.standard_normal(n) * 0.1
        (ws,) = layer(jnp.asarray(Sv), jnp.asarray(mv))
        # analytic KKT: 2 Sigma w - mu + lam 1 = 0, 1'w = 1
        K = np.block([[2 * Sv, np.ones((n, 1))], [np.ones((1, n)), np.array([[0.0]])]])
        sol = np.linalg.solve(K, np.concatenate([mv, [1.0]]))
        np.testing.assert_allclose(np.asarray(ws), sol[:n], atol=1e-7)

    def test_requires_psd_flag(self):
        x = ct.Variable(3)
        P = ct.Parameter((3, 3))
        with pytest.raises(ValueError, match="PSD"):
            ct.quad_form(x, P)

    def test_quad_form_in_constraint_rejected(self):
        x = ct.Variable(3)
        P = ct.Parameter((3, 3), PSD=True)
        prob = ct.Problem(
            ct.Minimize(ct.sum(x)), [ct.quad_form(x, P) <= 1, x >= -5]
        )
        with pytest.raises((ValueError, NotImplementedError)):
            CvxpyLayer(prob, parameters=[P], variables=[x])


class TestParamScaledQuad:
    def test_gamma_times_sum_squares(self):
        # min gamma*||F x||^2 - mu'x s.t. sum x == 1 (Markowitz pattern with
        # parametric risk aversion)
        n = 4
        x = ct.Variable(n)
        gamma = ct.Parameter((), nonneg=True)
        mu = ct.Parameter(n)
        F = rng.standard_normal((n, n)) / np.sqrt(n)
        prob = ct.Problem(
            ct.Minimize(gamma * ct.sum_squares(ct.Constant(F) @ x) - mu @ x),
            [ct.sum(x) == 1],
        )
        prog = stuff(prob, [gamma, mu])
        assert prog.P_rows.size > 0
        assert prog.dims.soc == ()
        layer = CvxpyLayer(prob, parameters=[gamma, mu], variables=[x])
        gv, mv = 0.7, rng.standard_normal(n) * 0.1
        (xs,) = layer(jnp.asarray(gv), jnp.asarray(mv))
        S = 2 * gv * F.T @ F
        K = np.block([[S, np.ones((n, 1))], [np.ones((1, n)), np.array([[0.0]])]])
        sol = np.linalg.solve(K, np.concatenate([mv, [1.0]]))
        np.testing.assert_allclose(np.asarray(xs), sol[:n], atol=1e-6)

        g = jax.grad(
            lambda g_, m_: jnp.sum(layer(g_, m_)[0] ** 2), argnums=(0, 1)
        )(jnp.asarray(gv), jnp.asarray(mv))
        assert np.isfinite(float(g[0]))


class TestSumSquarePattern:
    def test_sum_of_square_is_native_qp(self):
        n = 5
        x = ct.Variable(n)
        v = ct.Parameter(n)
        prob = ct.Problem(
            ct.Minimize(ct.sum(ct.square(x - v))), [x >= 0]
        )
        prog = stuff(prob, [v])
        assert prog.dims.soc == ()      # no per-element SOC epigraphs
        assert prog.P_rows.size == n
        layer = CvxpyLayer(prob, parameters=[v], variables=[x])
        vv = rng.standard_normal(n)
        (xs,) = layer(jnp.asarray(vv))
        np.testing.assert_allclose(
            np.asarray(xs), np.maximum(vv, 0), atol=1e-7
        )
