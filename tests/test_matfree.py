"""Matrix-free (sparse-assembly) large-instance route tests.

Oracle strategy mirrors the rest of the suite: the dense route (already
oracle-tested against linprog/SLSQP/closed forms) is the reference for
the sparse route — same problem, both assemblies, solutions and
gradients must agree; plus direct SpMV unit oracles against numpy and a
finite-difference gradcheck. Reference analogue: the sparse per-instance
handoff in cvxpylayers interfaces/diffcp_if.py:46-70.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cvxpylayers_tpu as ct
from cvxpylayers_tpu import CvxpyLayer
from cvxpylayers_tpu.solver.matfree import SparseOps

rng = np.random.default_rng(11)

SPARSE = {"assembly": "sparse"}
DENSE = {"assembly": "dense"}


class TestSparseOps:
    def _random_ops(self, m, n, nnz_a, nnz_p_diag=True):
        # CSR-ordered unique (row, col) pattern, like the stuffer emits
        pat = np.unique(
            np.stack([rng.integers(0, m, nnz_a), rng.integers(0, n, nnz_a)],
                     axis=1),
            axis=0,
        )
        A_rows, A_cols = pat[:, 0], pat[:, 1]
        if nnz_p_diag:
            P_rows = P_cols = np.arange(n)
        else:
            i = rng.integers(0, n, 3 * n)
            j = rng.integers(0, n, 3 * n)
            patp = np.unique(
                np.stack([np.concatenate([i, j]), np.concatenate([j, i])],
                         axis=1), axis=0,
            )
            P_rows, P_cols = patp[:, 0], patp[:, 1]
        ops = SparseOps(A_rows, A_cols, m, n, P_rows, P_cols)
        return ops, (A_rows, A_cols), (P_rows, P_cols)

    def test_matvecs_match_dense(self):
        m, n = 23, 11
        ops, (ar, ac), (pr, pc) = self._random_ops(m, n, 60,
                                                   nnz_p_diag=False)
        A_data = rng.standard_normal(len(ar))
        P_data = rng.standard_normal(len(pr))
        A = np.zeros((m, n))
        A[ar, ac] = A_data
        P = np.zeros((n, n))
        np.add.at(P, (pr, pc), P_data)
        x = rng.standard_normal(n)
        y = rng.standard_normal(m)
        np.testing.assert_allclose(
            np.asarray(ops.A_mv(jnp.asarray(A_data), jnp.asarray(x))),
            A @ x, atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(ops.A_rmv(jnp.asarray(A_data), jnp.asarray(y))),
            A.T @ y, atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(ops.P_mv(jnp.asarray(P_data), jnp.asarray(x))),
            P @ x, atol=1e-12)
        # Ruiz reductions
        np.testing.assert_allclose(
            np.asarray(ops.A_col_max(jnp.asarray(np.abs(A_data)))),
            np.abs(A).max(axis=0), atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(ops.A_row_max(jnp.asarray(np.abs(A_data)))),
            np.abs(A).max(axis=1), atol=1e-12)

    def test_data_grads_match_dense_outer(self):
        m, n = 17, 9
        ops, (ar, ac), (pr, pc) = self._random_ops(m, n, 40,
                                                   nnz_p_diag=False)
        y, v = rng.standard_normal(m), rng.standard_normal(m)
        u, x = rng.standard_normal(n), rng.standard_normal(n)
        dA_dense = np.outer(y, u) + np.outer(v, x)
        got = np.asarray(ops.A_data_grad(*map(jnp.asarray, (y, u, v, x))))
        np.testing.assert_allclose(got, dA_dense[ar, ac], atol=1e-12)
        dP_dense = np.outer(u, x)
        gotP = np.asarray(ops.P_data_grad(jnp.asarray(u), jnp.asarray(x)))
        np.testing.assert_allclose(gotP, dP_dense[pr, pc], atol=1e-12)


def _routes_match(layer, param_vals, sargs_extra=None, atol=1e-5,
                  grad_atol=1e-4, loss=None):
    """Solve with both assemblies; assert outputs and parameter grads
    agree. Returns the sparse-route outputs."""
    extra = sargs_extra or {}
    vals = [jnp.asarray(v) for v in param_vals]

    def run(assembly):
        sargs = {"assembly": assembly, **extra}
        outs, status, _ = layer.solve_with_info(*vals, solver_args=sargs)
        assert int(np.asarray(status)) == 0, (assembly, status)
        if loss is None:
            def loss_fn(*p):
                outs = layer(*p, solver_args=sargs)
                return sum(jnp.sum(o ** 2) for o in outs)
        else:
            def loss_fn(*p):
                return loss(layer(*p, solver_args=sargs))
        grads = jax.grad(loss_fn, argnums=tuple(range(len(vals))))(*vals)
        return outs, grads

    outs_d, grads_d = run("dense")
    outs_s, grads_s = run("sparse")
    for od, os_ in zip(outs_d, outs_s):
        np.testing.assert_allclose(np.asarray(os_), np.asarray(od),
                                   atol=atol, rtol=1e-4)
    for gd, gs in zip(grads_d, grads_s):
        np.testing.assert_allclose(np.asarray(gs), np.asarray(gd),
                                   atol=grad_atol, rtol=1e-3)
    return outs_s


class TestSparseRouteParity:
    def test_box_qp_diag_p(self):
        # sum_squares objective -> structurally diagonal P: exercises the
        # matrix-free polyhedral Schur split (elementwise Pinv)
        n = 8
        x = ct.Variable(n)
        t = ct.Parameter(n)
        prob = ct.Problem(
            ct.Minimize(ct.sum_squares(x - t)),
            [x >= -1, x <= 1],
        )
        layer = CvxpyLayer(prob, parameters=[t], variables=[x])
        assert layer._p_diag_only
        tv = 2.0 * rng.standard_normal(n)
        (xs,) = _routes_match(layer, [tv])
        np.testing.assert_allclose(np.asarray(xs), np.clip(tv, -1, 1),
                                   atol=1e-6)

    def test_lad_lp(self):
        # polyhedral, P structurally incomplete -> CG-normal operator KKT
        n, m = 5, 12
        x = ct.Variable(n)
        A = ct.Parameter((m, n))
        b = ct.Parameter(m)
        prob = ct.Problem(ct.Minimize(ct.pnorm(A @ x - b, 1)), [x >= 0])
        layer = CvxpyLayer(prob, parameters=[A, b], variables=[x])
        Av = rng.standard_normal((m, n))
        bv = rng.standard_normal(m)
        _routes_match(layer, [Av, bv], grad_atol=5e-4)

    def test_markowitz_socp(self):
        # SOC cones + dense-pattern P (covariance parameter): the general
        # matrix-free KKT route
        n = 6
        w = ct.Variable(n)
        L = ct.Parameter((n, n))  # covariance factor
        mu = ct.Parameter(n)
        gamma = 0.3
        prob = ct.Problem(
            ct.Minimize(gamma * ct.sum_squares(L @ w) - mu @ w),
            [ct.sum(w) == 1, w >= 0],
        )
        layer = CvxpyLayer(prob, parameters=[L, mu], variables=[w])
        Lv = rng.standard_normal((n, n)) * 0.4 + np.eye(n)
        muv = rng.standard_normal(n) * 0.1
        (ws,) = _routes_match(layer, [Lv, muv], atol=5e-5, grad_atol=2e-3)
        np.testing.assert_allclose(float(np.sum(np.asarray(ws))), 1.0,
                                   atol=1e-6)

    def test_exp_cone_logistic(self):
        # exp cones through the matrix-free factored cone-Jacobian KKT
        n, m = 3, 8
        beta = ct.Variable(n)
        X = ct.Parameter((m, n))
        prob = ct.Problem(
            ct.Minimize(
                ct.sum(ct.logistic(X @ beta)) + ct.sum_squares(beta)
            )
        )
        layer = CvxpyLayer(prob, parameters=[X], variables=[beta])
        Xv = rng.standard_normal((m, n))
        _routes_match(layer, [Xv], atol=1e-4, grad_atol=2e-3)

    def test_gradcheck_finite_difference(self):
        n = 4
        x = ct.Variable(n)
        t = ct.Parameter(n)
        prob = ct.Problem(
            ct.Minimize(ct.sum_squares(x - t)), [ct.sum(x) == 1]
        )
        layer = CvxpyLayer(prob, parameters=[t], variables=[x])
        tv = jnp.asarray(rng.standard_normal(n))

        def f(t_):
            (xs,) = layer(t_, solver_args=SPARSE)
            return jnp.sum(xs ** 3)

        g = jax.grad(f)(tv)
        eps = 1e-6
        for i in range(n):
            e = jnp.zeros(n).at[i].set(eps)
            fd = (f(tv + e) - f(tv - e)) / (2 * eps)
            np.testing.assert_allclose(float(g[i]), float(fd), atol=1e-4)

    def test_forward_derivative_mode(self):
        n = 3
        x = ct.Variable(n)
        t = ct.Parameter(n)
        prob = ct.Problem(
            ct.Minimize(ct.sum_squares(x - t)), [ct.sum(x) == 0]
        )
        layer = CvxpyLayer(prob, parameters=[t], variables=[x])
        tv = jnp.asarray(rng.standard_normal(n))

        def f(t_):
            (xs,) = layer(
                t_, solver_args={"assembly": "sparse",
                                 "derivative": "forward"}
            )
            return xs

        Jf = jax.jacfwd(f)(tv)
        def f_adj(t_):
            (xs,) = layer(t_, solver_args=SPARSE)
            return xs
        Jr = jax.jacrev(f_adj)(tv)
        np.testing.assert_allclose(np.asarray(Jf), np.asarray(Jr),
                                   atol=1e-6)

    def test_infeasible_status(self):
        x = ct.Variable(1)
        lo = ct.Parameter(1)
        prob = ct.Problem(ct.Minimize(ct.sum_squares(x)),
                          [x >= lo, x <= -1.0])
        layer = CvxpyLayer(prob, parameters=[lo], variables=[x])
        _, status, _ = layer.solve_with_info(
            jnp.asarray([1.0]), solver_args=SPARSE
        )
        assert int(np.asarray(status)) == 2  # PRIMAL_INFEASIBLE

    def test_warm_start_state(self):
        n = 6
        x = ct.Variable(n)
        t = ct.Parameter(n)
        prob = ct.Problem(ct.Minimize(ct.sum_squares(x - t)), [x >= 0])
        layer = CvxpyLayer(prob, parameters=[t], variables=[x])
        tv = jnp.asarray(np.abs(rng.standard_normal((1, n))))
        outs, ws, st, it0 = layer.solve_and_state(
            tv, solver_args=SPARSE
        )
        outs2, _, st2, it1 = layer.solve_and_state(
            tv, warm_start=ws, solver_args=SPARSE
        )
        assert int(np.asarray(it1)[0]) <= int(np.asarray(it0)[0])
        np.testing.assert_allclose(
            np.asarray(outs2[0]), np.asarray(outs[0]), atol=1e-6
        )

    def test_ipm_raises_on_sparse(self):
        x = ct.Variable(2)
        t = ct.Parameter(2)
        prob = ct.Problem(ct.Minimize(ct.sum_squares(x - t)), [x >= 0])
        layer = CvxpyLayer(prob, parameters=[t], variables=[x])
        with pytest.raises(ValueError, match="dense"):
            layer(jnp.asarray([1.0, 2.0]),
                  solver_args={"assembly": "sparse", "solve_method": "ipm"})

    def test_pdhg_rejects_quadratic_on_sparse(self):
        x = ct.Variable(2)
        t = ct.Parameter(2)
        prob = ct.Problem(ct.Minimize(ct.sum_squares(x - t)), [x >= 0])
        layer = CvxpyLayer(prob, parameters=[t], variables=[x])
        with pytest.raises(ValueError, match="quadratic"):
            layer(jnp.asarray([1.0, 2.0]),
                  solver_args={"assembly": "sparse",
                               "solve_method": "pdhg"})


class TestSparsePdhg:
    """Matrix-free PDHG (solve_method='pdhg' + assembly='sparse') — the
    MPAX-raPDHG role at large-sparse-LP scale. Oracle: scipy linprog on
    an optimal-transport LP; gradients vs the ADMM sparse route (both
    carry the same custom_vjp rules)."""

    def _ot_layer(self, n_s=6, n_d=5):
        C = ct.Parameter((n_s, n_d))
        P = ct.Variable((n_s, n_d), nonneg=True)
        a = np.full(n_s, 1.0 / n_s)
        b = np.full(n_d, 1.0 / n_d)
        prob = ct.Problem(
            ct.Minimize(ct.sum(ct.multiply(C, P))),
            [P @ ct.Constant(np.ones(n_d)) == ct.Constant(a),
             P.T @ ct.Constant(np.ones(n_s)) == ct.Constant(b)],
        )
        return CvxpyLayer(prob, parameters=[C], variables=[P]), (a, b)

    PDHG = {"assembly": "sparse", "solve_method": "pdhg",
            "eps_abs": 1e-6, "eps_rel": 1e-6,
            "admm_eps_abs": 1e-4, "admm_eps_rel": 1e-4,
            "max_iters": 20000, "epoch": 500, "refine_steps": 10}

    def test_ot_lp_matches_linprog(self):
        from scipy.optimize import linprog

        n_s, n_d = 6, 5
        layer, (a, b) = self._ot_layer(n_s, n_d)
        Cv = jnp.asarray(np.abs(rng.standard_normal((n_s, n_d))))
        (plan,), st, _ = layer.solve_with_info(Cv, solver_args=self.PDHG)
        assert int(np.asarray(st)) == 0
        Aeq = np.zeros((n_s + n_d, n_s * n_d))
        for i in range(n_s):
            Aeq[i, i * n_d:(i + 1) * n_d] = 1.0
        for j in range(n_d):
            Aeq[n_s + j, j::n_d] = 1.0
        ref = linprog(np.asarray(Cv).ravel(), A_eq=Aeq,
                      b_eq=np.concatenate([a, b]), bounds=(0, None))
        obj = float(jnp.sum(plan * Cv))
        assert abs(obj - ref.fun) < 1e-5

    def test_gap_certificate_blocks_vacuous_solves(self):
        """r5 regression (the r4 ot-bench bug): at a loose eps 1e-3 on
        a larger OT LP the per-entry plan scale is 1/n^2 and |y|_1 is
        large, so the infinity-norm KKT residual checks alone certified
        near-uniform plans whose objective sat ~1.6 ABOVE the optimum
        (gap = F1'x - y'F2 is unbounded by per-row residuals). With the
        duality-gap certificate, SOLVED must imply the objective is at
        eps scale of the linprog optimum — and the gap-aware internal
        loop must still genuinely reach SOLVED."""
        from scipy.optimize import linprog

        n_s = n_d = 16
        layer, (a, b) = self._ot_layer(n_s, n_d)
        xs = rng.standard_normal(n_s)
        ys = rng.standard_normal(n_d)
        Cv = jnp.asarray((xs[:, None] - ys[None, :]) ** 2)
        Aeq = np.zeros((n_s + n_d, n_s * n_d))
        for i in range(n_s):
            Aeq[i, i * n_d:(i + 1) * n_d] = 1.0
        for j in range(n_d):
            Aeq[n_s + j, j::n_d] = 1.0
        ref = linprog(np.asarray(Cv).ravel(), A_eq=Aeq,
                      b_eq=np.concatenate([a, b]), bounds=(0, None))
        loose = {"assembly": "sparse", "eps_abs": 1e-3, "eps_rel": 1e-3,
                 "admm_eps_abs": 3e-4, "admm_eps_rel": 3e-4,
                 "max_iters": 60000, "epoch": 500, "refine_steps": 10}
        for sargs in (dict(loose, solve_method="pdhg"), loose):
            (plan,), st, _ = layer.solve_with_info(Cv, solver_args=sargs)
            obj = float(jnp.sum(plan * Cv))
            method = sargs.get("solve_method", "admm")
            assert int(np.asarray(st)) == 0, method
            # the certified claim: eps-scale optimality, not the r4
            # near-uniform plan's ~1.6 error
            assert abs(obj - ref.fun) < 5e-3, (method, obj, ref.fun)

    def test_gradients_match_admm_route(self):
        layer, _ = self._ot_layer()
        Cv = jnp.asarray(np.abs(rng.standard_normal((6, 5))) + 0.1)
        admm = dict(self.PDHG)
        del admm["solve_method"]

        # entropic-free OT has vertex solutions; perturb the loss so the
        # implicit gradient is evaluated at the same (unique-enough)
        # optimum under both routes
        def loss(C_, sargs):
            (plan,) = layer(C_, solver_args=sargs)
            return jnp.sum(plan * C_) + 0.5 * jnp.sum(plan ** 2)

        g_p = jax.grad(lambda C_: loss(C_, self.PDHG))(Cv)
        g_a = jax.grad(lambda C_: loss(C_, admm))(Cv)
        assert bool(jnp.all(jnp.isfinite(g_p)))
        np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_a),
                                   atol=1e-4)


class TestMarkowitzLarge:
    """VERDICT r2 'done' criterion: Markowitz n=500 (batch >= 128 on the
    TPU bench; here batch-light CPU correctness) constructs in seconds
    and solves + differentiates correctly through the sparse route."""

    def _layer(self, n, k):
        w = ct.Variable(n, nonneg=True)
        mu = ct.Parameter(n)
        F = ct.Parameter((k, n))
        prob = ct.Problem(
            ct.Maximize(mu @ w),
            [ct.norm(F @ w, 2) <= 0.25, ct.sum(w) == 1],
        )
        return CvxpyLayer(prob, parameters=[mu, F], variables=[w])

    def test_midsize_route_parity(self):
        n, k = 60, 8
        layer = self._layer(n, k)
        muv = rng.standard_normal(n) * 0.1
        Fv = rng.standard_normal((k, n)) / np.sqrt(n)
        extra = {"max_iters": 4000, "cg_iters": 80}
        (ws,) = _routes_match(layer, [muv, Fv], sargs_extra=extra,
                              atol=1e-4, grad_atol=5e-3)
        np.testing.assert_allclose(float(np.asarray(ws).sum()), 1.0,
                                   atol=1e-5)

    def test_n500_constructs_and_solves(self):
        import time

        n, k = 500, 30
        t0 = time.time()
        layer = self._layer(n, k)
        build_s = time.time() - t0
        assert build_s < 20.0, f"construction took {build_s:.1f}s"
        from cvxpylayers_tpu.solver.settings import SolverSettings

        assert layer._route(SolverSettings()) == "sparse"
        muv = jnp.asarray(rng.standard_normal(n) * 0.1)
        Fv = jnp.asarray(rng.standard_normal((k, n)) / np.sqrt(n))
        sargs = {"max_iters": 4000, "cg_iters": 100,
                 "eps_abs": 1e-5, "eps_rel": 1e-5}
        (ws,), status, _ = layer.solve_with_info(muv, Fv,
                                                 solver_args=sargs)
        assert int(np.asarray(status)) == 0
        wv = np.asarray(ws)
        assert wv.min() > -1e-6
        np.testing.assert_allclose(wv.sum(), 1.0, atol=1e-5)
        # risk constraint active or satisfied
        assert float(np.linalg.norm(np.asarray(Fv) @ wv)) <= 0.25 + 1e-5
        # grads flow
        g = jax.grad(
            lambda m_, F_: jnp.sum(
                layer(m_, F_, solver_args=sargs)[0] ** 2
            ),
            argnums=(0, 1),
        )(muv, Fv)
        assert np.isfinite(np.asarray(g[0])).all()
        assert np.isfinite(np.asarray(g[1])).all()


class TestAutoRoute:
    def test_small_problem_stays_dense(self):
        x = ct.Variable(3)
        t = ct.Parameter(3)
        prob = ct.Problem(ct.Minimize(ct.sum_squares(x - t)), [x >= 0])
        layer = CvxpyLayer(prob, parameters=[t], variables=[x])
        from cvxpylayers_tpu.solver.settings import SolverSettings

        assert layer._route(SolverSettings()) == "dense"

    def test_large_problem_auto_sparse(self):
        # m*n above _DENSE_ASSEMBLY_LIMIT must auto-route sparse without
        # ever materializing the dense A. n=400 box QP: m=800, n=400.
        n = 400
        x = ct.Variable(n)
        t = ct.Parameter(n)
        prob = ct.Problem(
            ct.Minimize(ct.sum_squares(x - t)), [x >= -1, x <= 1]
        )
        layer = CvxpyLayer(prob, parameters=[t], variables=[x])
        from cvxpylayers_tpu.solver.settings import SolverSettings

        assert layer._route(SolverSettings()) == "sparse"
        tv = 2.0 * rng.standard_normal(n)
        (xs,) = layer(jnp.asarray(tv))
        np.testing.assert_allclose(np.asarray(xs), np.clip(tv, -1, 1),
                                   atol=1e-6)

    def test_problem_solve_through_sparse(self):
        n = 5
        x = ct.Variable(n)
        t = ct.Parameter(n)
        t.value = np.abs(rng.standard_normal(n)) + 0.5
        prob = ct.Problem(ct.Minimize(ct.sum_squares(x - t)), [x <= 0])
        val_s = prob.solve(solver_args=SPARSE)
        xs = np.asarray(x.value)
        np.testing.assert_allclose(xs, np.zeros(n), atol=1e-6)
        # value parity with the dense route (the t't constant is
        # parameter-quadratic, outside the DPP-affine offset — both
        # routes share that contract)
        val_d = prob.solve(solver_args=DENSE)
        np.testing.assert_allclose(val_s, val_d, atol=1e-8)
