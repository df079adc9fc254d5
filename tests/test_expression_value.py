"""Post-solve numeric evaluation: `expr.value` for every atom family
(cvxpy API — users evaluate arbitrary expressions after Problem.solve).
Oracles are the defining numpy formulas."""

import numpy as np
import pytest

import cvxpylayers_tpu as ct

rng = np.random.default_rng(3)


class TestAtomValues:
    def test_formula_parity(self):
        v = rng.standard_normal(6)
        M = rng.standard_normal((4, 4))
        S = M @ M.T + np.eye(4)
        X = ct.Constant(v)
        Xm = ct.Constant(S)
        eig = np.linalg.eigvalsh(S)
        sv = np.linalg.svd(S, compute_uv=False)
        pos = np.abs(v) + 0.1
        checks = [
            (ct.abs(X), np.abs(v)),
            (ct.pos(X), np.maximum(v, 0)),
            (ct.square(X), v ** 2),
            (ct.exp(X), np.exp(v)),
            (ct.log(ct.Constant(pos)), np.log(pos)),
            (ct.logistic(X), np.logaddexp(0, v)),
            (ct.huber(X, 0.5),
             np.where(np.abs(v) <= .5, v ** 2, .5 * (2 * np.abs(v) - .5))),
            (ct.norm(X, 1), np.abs(v).sum()),
            (ct.norm(X, 2), np.linalg.norm(v)),
            (ct.norm(X, np.inf), np.abs(v).max()),
            (ct.sum_squares(X), (v ** 2).sum()),
            (ct.pnorm(X, 3), (np.abs(v) ** 3).sum() ** (1 / 3)),
            (ct.pnorm(ct.Constant(pos), 0.5),
             (pos ** 0.5).sum() ** 2),
            (ct.lambda_max(Xm), eig.max()),
            (ct.lambda_min(Xm), eig.min()),
            (ct.log_det(Xm), np.linalg.slogdet(S)[1]),
            (ct.sigma_max(Xm), sv[0]),
            (ct.norm_nuc(Xm), sv.sum()),
            (ct.lambda_sum_largest(Xm, 2), np.sort(eig)[::-1][:2].sum()),
            (ct.sum_largest(X, 3), np.sort(v)[::-1][:3].sum()),
            (ct.maximum(X, 0.2), np.maximum(v, 0.2)),
            (ct.minimum(X, 0.2), np.minimum(v, 0.2)),
            (ct.quad_over_lin(X, ct.Constant(2.0)), (v ** 2).sum() / 2),
            (ct.matrix_frac(ct.Constant(v[:4]), Xm),
             v[:4] @ np.linalg.solve(S, v[:4])),
            (ct.entr(ct.Constant(pos)), -pos * np.log(pos)),
            (ct.rel_entr(ct.Constant(pos), ct.Constant(pos * 2)),
             pos * np.log(0.5)),
            (ct.log_sum_exp(X), np.log(np.exp(v).sum())),
            (ct.harmonic_mean(ct.Constant(pos)),
             pos.size / np.sum(1 / pos)),
            (ct.dotsort(X, np.array([0.5, 1.5])),
             np.dot(np.sort(v), np.sort(np.r_[0.5, 1.5, np.zeros(4)]))),
            (ct.tv(X), np.abs(np.diff(v)).sum()),
            (ct.sqrt(ct.Constant(pos)), np.sqrt(pos)),
            (ct.inv_pos(ct.Constant(pos)), 1 / pos),
        ]
        for expr, want in checks:
            got = expr.value
            assert got is not None, type(expr).__name__
            np.testing.assert_allclose(
                np.asarray(got, float).reshape(np.shape(want)), want,
                atol=1e-10, err_msg=type(expr).__name__,
            )

    def test_missing_leaf_gives_none(self):
        x = ct.Variable(3)
        assert ct.norm(x, 2).value is None
        assert ct.sum_squares(x - 1.0).value is None

    def test_post_solve_expression(self):
        x = ct.Variable(3)
        t = np.array([0.2, 0.9, -0.4])
        prob = ct.Problem(ct.Minimize(ct.sum_squares(x - t)), [x >= 0])
        prob.solve()
        np.testing.assert_allclose(
            float(ct.norm(x - t, 2).value),
            np.linalg.norm(np.clip(t, 0, None) - t), atol=1e-7,
        )

    def test_suppfunc_value_inner_solve(self):
        # support function of the box [-1, 1]^3 at x: sum |x_i|
        y = ct.Variable(3)
        x = ct.Constant(np.array([0.5, -2.0, 1.0]))
        sf = ct.suppfunc(y, [y >= -1, y <= 1])(x)
        np.testing.assert_allclose(float(sf.value), 3.5, atol=1e-6)

    def test_partial_optimize_value_inner_solve(self):
        # g(x) = min_z ||z - x||^2 + ||z||^2 = ||x||^2 / 2
        x = ct.Variable(2)
        z = ct.Variable(2)
        inner = ct.Problem(
            ct.Minimize(ct.sum_squares(z - x) + ct.sum_squares(z))
        )
        g = ct.partial_optimize(inner, [z])
        x.value = np.array([1.0, -2.0])
        np.testing.assert_allclose(float(g.value), 2.5, atol=1e-6)

    def test_perspective_value(self):
        x = ct.Variable(2)
        f = ct.sum_squares(x)
        s = ct.Constant(2.0)
        p = ct.perspective(f, s)
        x.value = np.array([1.0, 2.0])
        # s * f(x/s) = 2 * ||x/2||^2 = ||x||^2 / 2
        np.testing.assert_allclose(float(p.value), 2.5, atol=1e-10)


class TestConstraintViolations:
    """cvxpy post-solve API: constraint.residual / violation()."""

    def test_polyhedral(self):
        x = ct.Variable(3)
        x.value = np.array([0.5, -0.2, 1.0])
        np.testing.assert_allclose((x >= 0).residual, [0, 0.2, 0])
        np.testing.assert_allclose((ct.sum(x) == 1).violation(), 0.3)
        assert (x >= -1).violation() == 0.0

    def test_cones(self):
        x = ct.Variable(3)
        x.value = np.array([0.5, -0.2, 1.0])
        soc = ct.SOC(ct.Constant(1.0), x)
        np.testing.assert_allclose(
            soc.violation(), max(np.linalg.norm(x.value) - 1, 0),
            atol=1e-12,
        )
        X = ct.Variable((2, 2))
        X.value = np.array([[1.0, 2.0], [2.0, 1.0]])
        np.testing.assert_allclose(ct.PSD(X).violation(), 1.0, atol=1e-10)
        ok = ct.ExpCone(ct.Constant(0.0), ct.Constant(1.0),
                        ct.Constant(2.0))
        assert ok.violation() == 0.0
        bad = ct.ExpCone(ct.Constant(0.0), ct.Constant(1.0),
                         ct.Constant(0.5))
        assert bad.violation() > 0.1
        pw = ct.PowCone3D(ct.Constant(1.0), ct.Constant(1.0),
                          ct.Constant(2.0), 0.5)
        assert pw.violation() > 0.5

    def test_missing_values_none(self):
        y = ct.Variable(2)
        assert (y >= 0).violation() is None

    def test_post_solve_feasibility(self):
        x = ct.Variable(4)
        t = np.array([2.0, -1.0, 0.5, 0.3])
        cons = [x >= 0, ct.sum(x) == 1]
        prob = ct.Problem(ct.Minimize(ct.sum_squares(x - t)), cons)
        prob.solve()
        for c in cons:
            assert c.violation() < 1e-6

    def test_is_dgp(self):
        a = ct.Variable((), pos=True)
        b = ct.Variable((), pos=True)
        gp = ct.Problem(ct.Minimize(a * b + 1 / (a * b)), [a * b <= 2])
        assert gp.is_dgp()
        x = ct.Variable(2)
        lp = ct.Problem(ct.Minimize(ct.sum(x)), [x >= 0])
        assert not lp.is_dgp()
