"""cvxpy-style plain-solve path: Problem.solve() populates
Variable.value, constraint.dual_value, problem.status / value
(the capability the layered stack builds on — cvxpy Problem.solve)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.optimize

import cvxpylayers_tpu as ct

rng = np.random.default_rng(11)


class TestProblemSolve:
    def test_lp_vs_linprog(self):
        n = 4
        x = ct.Variable(n)
        c = ct.Parameter(n)
        c.value = rng.standard_normal(n)
        prob = ct.Problem(ct.Minimize(c @ x), [x >= -1, x <= 1])
        val = prob.solve()
        ref = scipy.optimize.linprog(c.value, bounds=[(-1, 1)] * n)
        np.testing.assert_allclose(val, ref.fun, atol=1e-8)
        np.testing.assert_allclose(x.value, ref.x, atol=1e-7)
        assert prob.status == "optimal"
        assert prob.value == val

    def test_zero_parameter_qp_and_duals(self):
        y = ct.Variable(3)
        t = np.array([0.3, -0.7, 2.0])
        con = y <= 1
        prob = ct.Problem(ct.Minimize(ct.sum_squares(y - t)), [con])
        val = prob.solve()
        ref = np.clip(t, None, 1.0)
        np.testing.assert_allclose(val, ((ref - t) ** 2).sum(), atol=1e-9)
        np.testing.assert_allclose(y.value, ref, atol=1e-8)
        # KKT: active rows carry dual 2*(t - 1)
        np.testing.assert_allclose(
            con.dual_value, np.maximum(2 * (t - 1), 0), atol=1e-7
        )

    def test_maximize_and_cached_resolve(self):
        n = 4
        x = ct.Variable(n)
        c = ct.Parameter(n)
        prob = ct.Problem(ct.Maximize(c @ x), [x >= -1, x <= 1])
        c.value = np.abs(rng.standard_normal(n))
        np.testing.assert_allclose(prob.solve(), c.value.sum(), atol=1e-7)
        c.value = np.abs(rng.standard_normal(n)) + 1.0
        # re-solve reuses the cached canonicalization + jitted solver
        np.testing.assert_allclose(prob.solve(), c.value.sum(), atol=1e-7)
        assert len(prob._solve_layers) == 1

    def test_socp(self):
        n = 5
        v = rng.standard_normal(n) * 2
        x = ct.Variable(n)
        prob = ct.Problem(ct.Minimize(ct.sum_squares(x - v)),
                          [ct.norm(x, 2) <= 1.0])
        prob.solve()
        ref = v / max(np.linalg.norm(v), 1.0)
        np.testing.assert_allclose(x.value, ref, atol=1e-7)

    def test_infeasible_and_unbounded(self):
        z = ct.Variable(2)
        pi = ct.Problem(ct.Minimize(ct.sum(z)), [z >= 1, z <= 0])
        assert pi.solve() == float("inf")
        assert pi.status == "infeasible"
        assert z.value is None
        pu = ct.Problem(ct.Minimize(ct.sum(z)), [z <= 0])
        assert pu.solve() == float("-inf")
        assert pu.status == "unbounded"

    def test_gp(self):
        xg = ct.Variable((), pos=True)
        yg = ct.Variable((), pos=True)
        prob = ct.Problem(ct.Minimize(xg * yg + 1.0 / (xg * yg)),
                          [xg * yg <= 2.0, xg >= 0.5])
        val = prob.solve(gp=True)
        # min t + 1/t over reachable t = x*y: optimum at t = 1
        np.testing.assert_allclose(val, 2.0, atol=1e-6)
        np.testing.assert_allclose(
            float(xg.value) * float(yg.value), 1.0, atol=1e-6
        )

    def test_missing_parameter_value_raises(self):
        x = ct.Variable(2)
        c = ct.Parameter(2)
        prob = ct.Problem(ct.Minimize(c @ x), [x >= 0, x <= 1])
        with pytest.raises(ValueError, match="has no value"):
            prob.solve()
