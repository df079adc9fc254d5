"""SDP layers, config hygiene, and miscellaneous reference-corpus parity
tests (cvxpylayers tests/test_torch.py:233-248 SDP; tests/test_parse_args.py
solver_args mutation regressions)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cvxpylayers_tpu as ct
from cvxpylayers_tpu import CvxpyLayer

rng = np.random.default_rng(33)


class TestSDPLayer:
    def test_trace_minimization(self):
        # min trace(C X) s.t. X >> 0, X_ii == 1 (correlation-matrix SDP)
        s = 3
        X = ct.Variable((s, s), PSD=True)
        C = ct.Parameter((s, s))
        cons = [X[i, i] == 1 for i in range(s)]
        prob = ct.Problem(ct.Minimize(ct.trace(C @ X)), cons)
        layer = CvxpyLayer(prob, parameters=[C], variables=[X])
        Cv = rng.standard_normal((s, s))
        Cv = 0.5 * (Cv + Cv.T)
        (Xs,) = layer(jnp.asarray(Cv), solver_args={"max_iters": 8000})
        Xs = np.asarray(Xs)
        # feasibility
        np.testing.assert_allclose(np.diag(Xs), 1.0, atol=1e-6)
        assert np.linalg.eigvalsh(Xs).min() >= -1e-7
        # optimality vs scipy (parametrize X by its off-diagonals)
        import itertools
        import scipy.optimize

        idx = list(itertools.combinations(range(s), 2))

        def make_X(z):
            M = np.eye(s)
            for k, (i, j) in enumerate(idx):
                M[i, j] = M[j, i] = z[k]
            return M

        def obj(z):
            return float(np.sum(Cv * make_X(z)))

        res = scipy.optimize.minimize(
            obj, np.zeros(len(idx)),
            constraints=[{
                "type": "ineq",
                "fun": lambda z: np.linalg.eigvalsh(make_X(z)).min(),
            }],
            method="SLSQP", options={"ftol": 1e-12, "maxiter": 500},
        )
        np.testing.assert_allclose(
            float(np.sum(Cv * Xs)), res.fun, atol=1e-4
        )

    def test_lambda_max_layer(self):
        # min lambda_max(A + diag(x)) over x — a classic eigenvalue layer
        s = 3
        x = ct.Variable(s)
        A = ct.Parameter((s, s))
        prob = ct.Problem(
            ct.Minimize(ct.lambda_max(A + ct.diag(x))), [ct.sum(x) == 0]
        )
        layer = CvxpyLayer(prob, parameters=[A], variables=[x])
        Av = rng.standard_normal((s, s))
        Av = 0.5 * (Av + Av.T)
        (xs,) = layer(jnp.asarray(Av), solver_args={"max_iters": 8000})
        xs = np.asarray(xs)
        assert abs(xs.sum()) < 1e-6
        # compare against scipy direct minimization
        import scipy.optimize

        def obj(z):
            zz = np.concatenate([z, [-z.sum()]])
            return np.linalg.eigvalsh(Av + np.diag(zz)).max()

        res = scipy.optimize.minimize(
            obj, np.zeros(s - 1), method="Nelder-Mead",
            options={"xatol": 1e-10, "fatol": 1e-12, "maxiter": 2000},
        )
        got = np.linalg.eigvalsh(Av + np.diag(xs)).max()
        assert got <= res.fun + 1e-5

    def test_psd_constraint_dual_is_matrix(self):
        s = 2
        X = ct.Variable((s, s), symmetric=True)
        C = ct.Parameter((s, s))
        con = ct.PSD(X)
        prob = ct.Problem(
            ct.Minimize(ct.trace(C @ X) + ct.sum_squares(ct.reshape(X, (4,)))),
            [con],
        )
        layer = CvxpyLayer(
            prob, parameters=[C], variables=[X, con.dual_variables[0]]
        )
        Cv = np.array([[1.0, 0.3], [0.3, 2.0]])
        Xs, D = layer(jnp.asarray(Cv))
        assert D.shape == (s, s)
        # dual of PSD cone is PSD
        assert np.linalg.eigvalsh(np.asarray(D)).min() >= -1e-7


class TestConfigHygiene:
    def test_solver_args_not_mutated(self):
        # reference regression: per-call solver_args must not be mutated
        # (cvxpylayers interfaces/__init__.py:4-10)
        layer, _ = _lad()
        args = {"eps": 1e-6, "max_iters": 500}
        snapshot = dict(args)
        layer(jnp.zeros((3, 2)), jnp.ones(3), solver_args=args)
        assert args == snapshot

    def test_constructor_args_are_defaults(self):
        layer, _ = _lad(solver_args={"max_iters": 12, "refine_steps": 0})
        with pytest.raises(ct.SolverError):
            layer(jnp.asarray(rng.standard_normal((3, 2))),
                  jnp.asarray(rng.standard_normal(3)))
        # per-call override restores accuracy
        (xs,) = layer(
            jnp.asarray(rng.standard_normal((3, 2))),
            jnp.asarray(rng.standard_normal(3)),
            solver_args={"max_iters": 2000, "refine_steps": 10},
        )
        assert np.all(np.isfinite(np.asarray(xs)))


def _lad(**kw):
    x = ct.Variable(2)
    A = ct.Parameter((3, 2))
    b = ct.Parameter(3)
    prob = ct.Problem(ct.Minimize(0.5 * ct.pnorm(A @ x - b, p=1)), [x >= 0])
    return CvxpyLayer(prob, parameters=[A, b], variables=[x], **kw), (2, 3)


class TestPowerConeLayer:
    def test_power_objective(self):
        # max x^0.7 s.t. x <= p  -> x = p (monotone), exercise pow cone
        x = ct.Variable((), nonneg=True)
        p = ct.Parameter(())
        prob = ct.Problem(ct.Maximize(ct.power(x, 0.7)), [x <= p])
        layer = CvxpyLayer(prob, parameters=[p], variables=[x])
        (xs,) = layer(jnp.asarray(2.0))
        np.testing.assert_allclose(float(xs), 2.0, atol=1e-6)
        g = jax.grad(lambda p_: layer(p_)[0])(jnp.asarray(2.0))
        np.testing.assert_allclose(float(g), 1.0, atol=1e-5)

    def test_geo_mean_layer(self):
        # max geo_mean(x) s.t. sum x == p  -> x_i = p/n
        n = 3
        x = ct.Variable(n, nonneg=True)
        p = ct.Parameter(())
        prob = ct.Problem(ct.Maximize(ct.geo_mean(x)), [ct.sum(x) == p])
        layer = CvxpyLayer(prob, parameters=[p], variables=[x])
        (xs,) = layer(jnp.asarray(6.0))
        np.testing.assert_allclose(np.asarray(xs), 2.0, atol=1e-5)
