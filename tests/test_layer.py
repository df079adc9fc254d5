"""CvxpyLayer end-to-end tests, modeled on the reference's corpus
(cvxpylayers tests/test_torch.py, tests/test_jax.py, SURVEY section 4):
closed-form oracles, scipy cross-checks, gradcheck, batching contracts,
dual variables, jit/vmap/grad composition, and error paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.optimize
from jax.test_util import check_grads

import cvxpylayers_tpu as ct
from cvxpylayers_tpu import CvxpyLayer, SolverError

rng = np.random.default_rng(7)


def lad_layer(n=2, m=3):
    x = ct.Variable(n)
    A = ct.Parameter((m, n))
    b = ct.Parameter(m)
    prob = ct.Problem(ct.Minimize(0.5 * ct.pnorm(A @ x - b, p=1)), [x >= 0])
    return CvxpyLayer(prob, parameters=[A, b], variables=[x]), (n, m)


class TestForward:
    def test_lad_vs_linprog(self):
        layer, (n, m) = lad_layer()
        Av = rng.standard_normal((m, n))
        bv = rng.standard_normal(m)
        (xs,) = layer(jnp.asarray(Av), jnp.asarray(bv))
        c = np.concatenate([np.zeros(n), 0.5 * np.ones(m)])
        A_ub = np.block(
            [[Av, -np.eye(m)], [-Av, -np.eye(m)],
             [-np.eye(n), np.zeros((n, m))]]
        )
        b_ub = np.concatenate([bv, -bv, np.zeros(n)])
        ref = scipy.optimize.linprog(
            c, A_ub=A_ub, b_ub=b_ub, bounds=(None, None), method="highs"
        )
        np.testing.assert_allclose(np.asarray(xs), ref.x[:n], atol=1e-6)

    def test_least_squares_closed_form(self):
        # min ||Ax - b||^2 + ||x||^2 -> x* = (A'A + I)^{-1} A'b
        n, m = 4, 7
        x = ct.Variable(n)
        A = ct.Parameter((m, n))
        b = ct.Parameter(m)
        prob = ct.Problem(
            ct.Minimize(ct.sum_squares(A @ x - b) + ct.sum_squares(x))
        )
        layer = CvxpyLayer(prob, parameters=[A, b], variables=[x])
        Av = rng.standard_normal((m, n))
        bv = rng.standard_normal(m)
        (xs,) = layer(jnp.asarray(Av), jnp.asarray(bv))
        want = np.linalg.solve(Av.T @ Av + np.eye(n), Av.T @ bv)
        np.testing.assert_allclose(np.asarray(xs), want, atol=1e-7)

    def test_simplex_projection_qp(self):
        # min ||x - v||^2 s.t. sum x == 1, x >= 0
        n = 6
        x = ct.Variable(n)
        v = ct.Parameter(n)
        prob = ct.Problem(
            ct.Minimize(ct.sum_squares(x - v)), [ct.sum(x) == 1, x >= 0]
        )
        layer = CvxpyLayer(prob, parameters=[v], variables=[x])
        vv = rng.standard_normal(n)
        (xs,) = layer(jnp.asarray(vv))
        # oracle: sort-based simplex projection
        u = np.sort(vv)[::-1]
        css = np.cumsum(u) - 1
        ks = np.arange(1, n + 1)
        rho = np.max(ks[u - css / ks > 0])
        tau = css[rho - 1] / rho
        np.testing.assert_allclose(np.asarray(xs), np.maximum(vv - tau, 0),
                                   atol=1e-7)


class TestGradients:
    def test_lad_check_grads(self):
        layer, (n, m) = lad_layer()
        Av = jnp.asarray(rng.standard_normal((m, n)))
        bv = jnp.asarray(rng.standard_normal(m))

        def f(A_, b_):
            (xs,) = layer(A_, b_)
            return jnp.sum(xs)

        check_grads(f, (Av, bv), order=1, modes=["rev"], atol=1e-3, rtol=1e-3)

    def test_least_squares_grads_vs_analytic(self):
        n, m = 3, 5
        x = ct.Variable(n)
        A = ct.Parameter((m, n))
        b = ct.Parameter(m)
        prob = ct.Problem(
            ct.Minimize(ct.sum_squares(A @ x - b) + ct.sum_squares(x))
        )
        layer = CvxpyLayer(prob, parameters=[A, b], variables=[x])
        Av = jnp.asarray(rng.standard_normal((m, n)))
        bv = jnp.asarray(rng.standard_normal(m))

        def f(A_, b_):
            (xs,) = layer(A_, b_)
            return jnp.sum(xs**2)

        def f_exact(A_, b_):
            xs = jnp.linalg.solve(
                A_.T @ A_ + jnp.eye(n), A_.T @ b_
            )
            return jnp.sum(xs**2)

        gA, gb = jax.grad(f, argnums=(0, 1))(Av, bv)
        gA2, gb2 = jax.grad(f_exact, argnums=(0, 1))(Av, bv)
        np.testing.assert_allclose(np.asarray(gA), np.asarray(gA2), atol=1e-6)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(gb2), atol=1e-6)

    def test_entropy_layer_grads(self):
        # max c'x + sum entr(x) s.t. sum x == 1, x >= 0  => x = softmax(c)
        n = 5
        x = ct.Variable(n)
        c = ct.Parameter(n)
        prob = ct.Problem(
            ct.Maximize(c @ x + ct.sum(ct.entr(x))),
            [ct.sum(x) == 1, x >= 0],
        )
        layer = CvxpyLayer(prob, parameters=[c], variables=[x])
        cv = jnp.asarray(rng.standard_normal(n))
        (xs,) = layer(cv)
        np.testing.assert_allclose(
            np.asarray(xs), np.asarray(jax.nn.softmax(cv)), atol=1e-6
        )
        J = jax.jacobian(lambda c_: layer(c_)[0])(cv)
        p = np.asarray(jax.nn.softmax(cv))
        J_want = np.diag(p) - np.outer(p, p)
        np.testing.assert_allclose(np.asarray(J), J_want, atol=1e-5)


class TestBatching:
    def test_batched_matches_loop(self):
        layer, (n, m) = lad_layer()
        B = 4
        Av = rng.standard_normal((B, m, n))
        bv = rng.standard_normal((B, m))
        xs_b = layer(jnp.asarray(Av), jnp.asarray(bv))[0]
        assert xs_b.shape == (B, n)
        for i in range(B):
            (xi,) = layer(jnp.asarray(Av[i]), jnp.asarray(bv[i]))
            np.testing.assert_allclose(np.asarray(xs_b[i]), np.asarray(xi),
                                       atol=1e-7)

    def test_mixed_broadcasting(self):
        layer, (n, m) = lad_layer()
        B = 3
        Av = rng.standard_normal((m, n))          # unbatched
        bv = rng.standard_normal((B, m))          # batched
        xs = layer(jnp.asarray(Av), jnp.asarray(bv))[0]
        assert xs.shape == (B, n)
        for i in range(B):
            (xi,) = layer(jnp.asarray(Av), jnp.asarray(bv[i]))
            np.testing.assert_allclose(np.asarray(xs[i]), np.asarray(xi),
                                       atol=1e-7)

    def test_batch_size_one_preserved(self):
        layer, (n, m) = lad_layer()
        Av = rng.standard_normal((1, m, n))
        bv = rng.standard_normal((1, m))
        xs = layer(jnp.asarray(Av), jnp.asarray(bv))[0]
        assert xs.shape == (1, n)
        xs2 = layer(jnp.asarray(Av[0]), jnp.asarray(bv[0]))[0]
        assert xs2.shape == (n,)

    def test_inconsistent_batch_raises(self):
        layer, (n, m) = lad_layer()
        with pytest.raises(ValueError, match="batch"):
            layer(
                jnp.zeros((2, m, n)), jnp.zeros((3, m))
            )


class TestDuals:
    def test_equality_dual_kkt(self):
        # min ||x - v||^2 s.t. sum x == 1; KKT: 2(x - v) + lam * 1 = 0
        n = 4
        x = ct.Variable(n)
        v = ct.Parameter(n)
        con = ct.sum(x) == 1
        prob = ct.Problem(ct.Minimize(ct.sum_squares(x - v)), [con])
        layer = CvxpyLayer(
            prob, parameters=[v], variables=[x, con.dual_variables[0]]
        )
        vv = rng.standard_normal(n)
        xs, lam = layer(jnp.asarray(vv))
        x_np = np.asarray(xs)
        lam_np = float(np.asarray(lam))
        # stationarity wrt x of ||x-v||^2 + lam*(sum x - 1)
        np.testing.assert_allclose(2 * (x_np - vv) + lam_np, 0, atol=1e-6)
        np.testing.assert_allclose(x_np.sum(), 1.0, atol=1e-8)

    def test_inequality_dual_lp(self):
        # LP duals vs scipy.linprog marginals
        n, m = 4, 7
        x = ct.Variable(n)
        c = ct.Parameter(n)
        G = rng.standard_normal((m, n))
        x_f = rng.standard_normal(n)
        h = G @ x_f + np.abs(rng.standard_normal(m)) + 0.3
        con = ct.Constant(G) @ x <= ct.Constant(h)
        box = ct.norm(x, "inf") <= 5.0
        del box
        box_lo = x >= -5.0
        box_hi = x <= 5.0
        prob = ct.Problem(ct.Minimize(c @ x), [con, box_lo, box_hi])
        layer = CvxpyLayer(
            prob, parameters=[c], variables=[x, con.dual_variables[0]]
        )
        cv = rng.standard_normal(n)
        xs, duals = layer(jnp.asarray(cv))
        ref = scipy.optimize.linprog(
            cv,
            A_ub=np.vstack([G, -np.eye(n), np.eye(n)]),
            b_ub=np.concatenate([h, 5 * np.ones(n), 5 * np.ones(n)]),
            bounds=(None, None), method="highs",
        )
        np.testing.assert_allclose(np.asarray(xs), ref.x, atol=1e-6)
        # scipy highs returns marginals with opposite sign convention
        np.testing.assert_allclose(
            np.asarray(duals), -ref.ineqlin.marginals[:m], atol=1e-6
        )

    def test_dual_only_and_batched(self):
        n = 3
        x = ct.Variable(n)
        v = ct.Parameter(n)
        con = ct.sum(x) == 1
        prob = ct.Problem(ct.Minimize(ct.sum_squares(x - v)), [con])
        layer = CvxpyLayer(
            prob, parameters=[v], variables=[con.dual_variables[0]]
        )
        B = 3
        vv = rng.standard_normal((B, n))
        (lams,) = layer(jnp.asarray(vv))
        assert lams.shape == (B,) + ()
        # analytic: x = v - lam/2 * 1; sum x = 1 -> lam = 2(sum v - 1)/n
        want = 2 * (vv.sum(axis=1) - 1) / n
        np.testing.assert_allclose(np.asarray(lams), want, atol=1e-6)

    def test_dual_gradients(self):
        n = 3
        x = ct.Variable(n)
        v = ct.Parameter(n)
        con = ct.sum(x) == 1
        prob = ct.Problem(ct.Minimize(ct.sum_squares(x - v)), [con])
        layer = CvxpyLayer(
            prob, parameters=[v], variables=[con.dual_variables[0]]
        )

        def f(v_):
            (lam,) = layer(v_)
            return lam**2

        vv = jnp.asarray(rng.standard_normal(n))
        g = jax.grad(f)(vv)
        want = jax.grad(lambda v_: (2 * (jnp.sum(v_) - 1) / n) ** 2)(vv)
        np.testing.assert_allclose(np.asarray(g), np.asarray(want), atol=1e-6)


class TestCompilation:
    def test_jit(self):
        layer, (n, m) = lad_layer()
        Av = jnp.asarray(rng.standard_normal((m, n)))
        bv = jnp.asarray(rng.standard_normal(m))

        @jax.jit
        def f(A_, b_):
            return layer(A_, b_)[0]

        np.testing.assert_allclose(
            np.asarray(f(Av, bv)), np.asarray(layer(Av, bv)[0]), atol=1e-9
        )

    def test_external_vmap(self):
        layer, (n, m) = lad_layer()
        B = 3
        Av = jnp.asarray(rng.standard_normal((B, m, n)))
        bv = jnp.asarray(rng.standard_normal((B, m)))
        f = jax.vmap(lambda A_, b_: layer(A_, b_)[0])
        got = f(Av, bv)
        want = layer(Av, bv)[0]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-7)

    def test_jit_grad_vmap_composition(self):
        layer, (n, m) = lad_layer()
        B = 2
        Av = jnp.asarray(rng.standard_normal((B, m, n)))
        bv = jnp.asarray(rng.standard_normal((B, m)))

        @jax.jit
        def loss(A_, b_):
            xs = jax.vmap(lambda a, c: layer(a, c)[0])(A_, b_)
            return jnp.sum(xs)

        g = jax.grad(loss)(Av, bv)
        assert np.all(np.isfinite(np.asarray(g)))


class TestErrors:
    def test_wrong_count(self):
        layer, (n, m) = lad_layer()
        with pytest.raises(ValueError, match="expected 2 parameters"):
            layer(jnp.zeros((m, n)))

    def test_wrong_shape(self):
        layer, (n, m) = lad_layer()
        with pytest.raises(ValueError, match="expects shape"):
            layer(jnp.zeros((m, n + 1)), jnp.zeros(m))

    def test_infeasible_raises(self):
        x = ct.Variable(1)
        p = ct.Parameter(1)
        prob = ct.Problem(ct.Minimize(ct.sum(x)), [x >= 1, x <= p - 2])
        layer = CvxpyLayer(prob, parameters=[p], variables=[x])
        with pytest.raises(SolverError, match="infeasible"):
            layer(jnp.asarray([0.0]))

    def test_solve_with_info_never_raises(self):
        # eager solve_with_info on a failing instance reports the status
        # instead of raising — raising is __call__'s job only
        x = ct.Variable(1)
        p = ct.Parameter(1)
        prob = ct.Problem(ct.Minimize(ct.sum(x)), [x >= 1, x <= p - 2])
        layer = CvxpyLayer(prob, parameters=[p], variables=[x])
        from cvxpylayers_tpu.solver.settings import PRIMAL_INFEASIBLE

        _, status, _ = layer.solve_with_info(jnp.asarray([0.0]))
        assert int(status) == PRIMAL_INFEASIBLE

    def test_verbose_smoke(self, capfd):
        x = ct.Variable(2)
        p = ct.Parameter(2)
        prob = ct.Problem(ct.Minimize(ct.sum_squares(x - p)), [x >= 0])
        layer = CvxpyLayer(prob, parameters=[p], variables=[x],
                           verbose=True)
        (xs,) = layer(jnp.asarray([1.0, -1.0]))
        jax.effects_barrier()
        out = capfd.readouterr().out
        assert "solved" in out and "iters" in out

    def test_unbounded_raises(self):
        x = ct.Variable(1)
        p = ct.Parameter(1)
        prob = ct.Problem(ct.Minimize(p @ x), [x <= 0])
        layer = CvxpyLayer(prob, parameters=[p], variables=[x])
        with pytest.raises(SolverError, match="unbounded"):
            layer(jnp.asarray([1.0]))

    def test_non_dpp_rejected(self):
        x = ct.Variable(2)
        a = ct.Parameter(2)
        bscale = ct.Parameter(())
        prob = ct.Problem(
            ct.Minimize(ct.sum_squares(x - (bscale * a))), []
        )
        with pytest.raises(ValueError, match="DPP"):
            CvxpyLayer(prob, parameters=[a, bscale], variables=[x])

    def test_wrong_params_set(self):
        x = ct.Variable(2)
        a = ct.Parameter(2)
        other = ct.Parameter(2)
        prob = ct.Problem(ct.Minimize(ct.sum_squares(x - a)))
        with pytest.raises(ValueError, match="parameters"):
            CvxpyLayer(prob, parameters=[a, other], variables=[x])

    def test_unknown_solver_arg(self):
        layer, _ = lad_layer()
        with pytest.raises(ValueError, match="solver_args"):
            layer(jnp.zeros((3, 2)), jnp.zeros(3),
                  solver_args={"bogus_option": 1})

    def test_solver_args_change_behavior(self):
        layer, (n, m) = lad_layer()
        Av = jnp.asarray(rng.standard_normal((m, n)))
        bv = jnp.asarray(rng.standard_normal(m))
        # absurdly low iteration budget with no polish -> must fail
        with pytest.raises(SolverError):
            layer(Av, bv, solver_args={"max_iters": 25, "refine_steps": 0,
                                       "eps": 1e-9})


class TestSOCPLayer:
    def test_markowitz_style(self):
        # min -mu'w + gamma*||Sigma^{1/2} w||  s.t. sum w == 1, w >= 0
        n = 5
        w = ct.Variable(n)
        mu = ct.Parameter(n)
        F = rng.standard_normal((n, n)) / np.sqrt(n)
        prob = ct.Problem(
            ct.Minimize(-mu @ w + 2.0 * ct.norm(ct.Constant(F) @ w, 2)),
            [ct.sum(w) == 1, w >= 0],
        )
        layer = CvxpyLayer(prob, parameters=[mu], variables=[w])
        muv = jnp.asarray(rng.standard_normal(n))
        (ws,) = layer(muv)
        w_np = np.asarray(ws)
        assert abs(w_np.sum() - 1) < 1e-7
        assert np.all(w_np >= -1e-8)
        # oracle via scipy SLSQP
        res = scipy.optimize.minimize(
            lambda w_: float(-np.asarray(muv) @ w_
                             + 2.0 * np.linalg.norm(F @ w_)),
            np.ones(n) / n,
            constraints=[
                {"type": "eq", "fun": lambda w_: w_.sum() - 1},
                {"type": "ineq", "fun": lambda w_: w_},
            ],
            method="SLSQP", options={"maxiter": 500, "ftol": 1e-12},
        )
        np.testing.assert_allclose(w_np, res.x, atol=1e-5)

        g = jax.grad(lambda m_: jnp.sum(layer(m_)[0] ** 2))(muv)
        assert np.all(np.isfinite(np.asarray(g)))


class TestInputContracts:
    def test_mixed_dtype_inputs_promote(self):
        # f32 + f64 parameters promote; outputs follow the promoted dtype
        n = 4
        x = ct.Variable(n)
        a = ct.Parameter(n)
        b = ct.Parameter(n)
        prob = ct.Problem(ct.Minimize(ct.sum_squares(x - a - b)))
        layer = CvxpyLayer(prob, parameters=[a, b], variables=[x])
        av = jnp.asarray(np.ones(n), jnp.float32)
        bv = jnp.asarray(np.ones(n), jnp.float64)
        (xs,) = layer(av, bv)
        assert xs.dtype == jnp.float64
        np.testing.assert_allclose(np.asarray(xs), 2 * np.ones(n),
                                   atol=1e-7)
        (xs32,) = layer(av, bv.astype(jnp.float32))
        assert xs32.dtype == jnp.float32

    def test_batch_shape_error_breadth(self):
        # reference error-path breadth (tests/test_torch.py:251-352)
        n = 3
        x = ct.Variable(n)
        a = ct.Parameter(n)
        M = ct.Parameter((n, n))
        prob = ct.Problem(ct.Minimize(ct.sum_squares(M @ x - a)))
        layer = CvxpyLayer(prob, parameters=[a, M], variables=[x])
        ok_a = jnp.zeros(n)
        ok_M = jnp.eye(n)
        # wrong core shape
        with pytest.raises(ValueError, match="expects shape"):
            layer(jnp.zeros(n + 1), ok_M)
        # too many leading dims
        with pytest.raises(ValueError, match="expects shape"):
            layer(jnp.zeros((2, 2, n)), ok_M)
        # inconsistent batch sizes across parameters
        with pytest.raises(ValueError, match="inconsistent batch"):
            layer(jnp.zeros((2, n)), jnp.zeros((3, n, n)))
        # batched matrix whose trailing dims are wrong
        with pytest.raises(ValueError, match="expects shape"):
            layer(ok_a, jnp.zeros((2, n, n + 1)))
        # batch size 1 is preserved, not squeezed
        (xs,) = layer(jnp.zeros((1, n)), jnp.eye(n)[None])
        assert xs.shape == (1, n)

    def test_iteration_count_regression_guard(self):
        # algorithmic canary: the canonical simplex projection must
        # converge in one epoch of ADMM + polish (catches solver
        # regressions that would silently melt the bench)
        n = 8
        x = ct.Variable(n)
        v = ct.Parameter(n)
        prob = ct.Problem(
            ct.Minimize(ct.sum_squares(x - v)), [ct.sum(x) == 1, x >= 0]
        )
        layer = CvxpyLayer(prob, parameters=[v], variables=[x])
        vv = jnp.asarray(np.linspace(-1, 1, n))
        _, st, it = layer.solve_with_info(vv)
        assert int(st) == 0
        assert int(it) <= 75, int(it)


class TestForwardModeDerivative:
    """solver_args={"derivative": "forward"}: custom_jvp implicit
    differentiation (the diffcp `derivative` direction, reference
    interfaces/diffcp_if.py solve_and_derivative). Enables jax.jvp and
    jax.jacfwd through the layer; the default "adjoint" stays the rule
    for jax.grad / jacrev."""

    def _layer(self):
        n, mi = 6, 4
        x = ct.Variable(n)
        v = ct.Parameter(n)
        G = ct.Parameter((mi, n))
        h = ct.Parameter(mi)
        layer = CvxpyLayer(
            ct.Problem(ct.Minimize(ct.sum_squares(x - v)),
                       [G @ x <= h, x >= -1, x <= 1]),
            parameters=[v, G, h], variables=[x],
        )
        r = np.random.default_rng(0)
        vv = jnp.asarray(r.standard_normal(n))
        Gv = jnp.asarray(r.standard_normal((mi, n)) * 0.4)
        hv = jnp.asarray(np.abs(r.standard_normal(mi)) + 0.3)
        return layer, (vv, Gv, hv)

    def test_jvp_matches_finite_differences(self):
        layer, (vv, Gv, hv) = self._layer()
        sa = {"derivative": "forward"}

        def f(v_):
            return layer(v_, Gv, hv, solver_args=sa)[0]

        dv = jnp.asarray(np.random.default_rng(1).standard_normal(
            vv.shape))
        _, dxs = jax.jvp(f, (vv,), (dv,))
        eps = 1e-6
        fd = (f(vv + eps * dv) - f(vv - eps * dv)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(dxs), np.asarray(fd),
                                   atol=1e-7)

    def test_jacfwd_matches_jacrev(self):
        layer, (vv, Gv, hv) = self._layer()

        def f(v_):
            return layer(v_, Gv, hv,
                         solver_args={"derivative": "forward"})[0]

        def g(v_):
            return layer(v_, Gv, hv)[0]

        Jf = np.asarray(jax.jacfwd(f)(vv))
        Jr = np.asarray(jax.jacrev(g)(vv))
        np.testing.assert_allclose(Jf, Jr, atol=1e-8)

    def test_jvp_matrix_param_and_batch(self):
        layer, (vv, Gv, hv) = self._layer()
        sa = {"derivative": "forward"}
        B = 3
        r = np.random.default_rng(2)
        vb = jnp.asarray(r.standard_normal((B,) + vv.shape))
        dG = jnp.asarray(r.standard_normal(Gv.shape))

        def f(G_):
            return layer(vb, G_, hv, solver_args=sa)[0]

        _, dxs = jax.jvp(f, (Gv,), (dG,))
        eps = 1e-6
        fd = (f(Gv + eps * dG) - f(Gv - eps * dG)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(dxs), np.asarray(fd),
                                   atol=1e-6)

    def test_invalid_mode_rejected(self):
        layer, (vv, Gv, hv) = self._layer()
        with pytest.raises(ValueError, match="derivative"):
            layer(vv, Gv, hv, solver_args={"derivative": "central"})


class TestMatmulPrecision:
    """solver_args matmul_precision: pins every matmul in the solve via
    jax.default_matmul_precision (on TPU f32 the MXU takes bf16 inputs
    by default, which can flip borderline-degenerate instances into a
    different polish basin than CPU f32 — measured solved 0.984 -> 1.0
    on the LAD bench config). On CPU the modes are numerically
    equivalent, so these are contract tests."""

    def _layer(self):
        n, m = 3, 5
        x = ct.Variable(n, nonneg=True)
        A = ct.Parameter((m, n))
        b = ct.Parameter(m)
        prob = ct.Problem(ct.Minimize(0.5 * ct.pnorm(A @ x - b, 1)))
        return CvxpyLayer(prob, parameters=[A, b], variables=[x]), (n, m)

    def test_solution_and_grads_match_default(self):
        layer, (n, m) = self._layer()
        r = np.random.default_rng(11)
        Av = jnp.asarray(r.standard_normal((4, m, n)), jnp.float32)
        bv = jnp.asarray(r.standard_normal((4, m)), jnp.float32)

        def loss(mp):
            def f(A_):
                sa = {"eps": 1e-4, "max_iters": 600}
                if mp:
                    sa["matmul_precision"] = mp
                return jnp.sum(layer(A_, bv, solver_args=sa)[0] ** 2)
            return f

        v0, g0 = jax.value_and_grad(loss(None))(Av)
        for mp in ("high", "highest"):
            v1, g1 = jax.value_and_grad(loss(mp))(Av)
            np.testing.assert_allclose(float(v1), float(v0),
                                       atol=1e-5, rtol=1e-4)
            np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                                       atol=1e-4, rtol=1e-3)

    def test_invalid_value_rejected(self):
        layer, (n, m) = self._layer()
        r = np.random.default_rng(12)
        Av = jnp.asarray(r.standard_normal((m, n)), jnp.float32)
        bv = jnp.asarray(r.standard_normal(m), jnp.float32)
        with pytest.raises(ValueError, match="matmul_precision"):
            layer(Av, bv, solver_args={"matmul_precision": "bf16"})


class TestSolverArgsBehaviorContract:
    """solver_args must measurably change solver behavior through the
    LAYER API — the reference treats this as a contract (loose vs tight
    eps changes accuracy, max_iters caps iterations;
    /root/reference/tests/test_torch.py:705-752)."""

    def _layer(self, n=6):
        x = ct.Variable(n, nonneg=True)
        t = ct.Parameter(n)
        prob = ct.Problem(ct.Minimize(ct.sum_squares(x - t)),
                          [ct.sum(x) == 1])
        return CvxpyLayer(prob, parameters=[t], variables=[x])

    def test_eps_monotone_accuracy(self):
        # KKT residual at the solution responds monotonically to eps
        # (statuses agree; tighter eps => at least as accurate)
        layer = self._layer()
        r = np.random.default_rng(21)
        tv = jnp.asarray(r.standard_normal(6))

        def kkt_err(eps, refine):
            (x,), st, _ = layer.solve_with_info(
                tv, solver_args={"eps": eps, "refine_steps": refine,
                                 "max_iters": 2000},
            )
            assert int(np.asarray(st)) == 0
            # stationarity on the support: 2(x - t) + nu = 0 with
            # shared nu; measure spread of the implied multiplier
            x = np.asarray(x)
            act = x > 1e-7
            g = 2 * (x - np.asarray(tv))[act]
            feas = abs(float(x.sum()) - 1.0)
            return max(feas, float(np.ptp(g)))

        loose = kkt_err(1e-2, 0)
        tight = kkt_err(1e-9, 10)
        assert tight <= loose
        assert tight < 1e-6  # the tight setting actually delivers

    def test_admm_eps_monotone_iterations(self):
        # tighter internal ADMM tolerance => strictly more iterations
        # (epoch-quantized), through the layer API
        layer = self._layer()
        r = np.random.default_rng(22)
        tv = jnp.asarray(r.standard_normal(6))

        def iters(admm_eps):
            _, st, it = layer.solve_with_info(
                tv, solver_args={"eps": 1e-6, "refine_steps": 8,
                                 "admm_eps_abs": admm_eps,
                                 "admm_eps_rel": admm_eps,
                                 "epoch": 10, "max_iters": 5000},
            )
            assert int(np.asarray(st)) == 0
            return int(np.asarray(it))

        assert iters(1e-8) > iters(1e-2)

    def test_eps_gap_scale_gates_certification(self):
        # eps_gap_scale multiplies ONLY the duality-gap term of the
        # SOLVED certificates (the escape hatch for flat-epigraph f32
        # classes whose dual stays ~1e-3 loose while the solution is
        # tight, refine.py). Wiring contract through the layer API: a
        # zero scale makes the internal gap check unsatisfiable, so the
        # first-order loop runs to the cap (vs ~50 iters at default);
        # the final polish certificate still reads the gap (exactly 0.0
        # here in f64 — the polish lands on the vertex — so SOLVED is
        # correct at any scale); larger scales never un-solve a lane.
        layer = self._layer()
        r = np.random.default_rng(25)
        tv = jnp.asarray(r.standard_normal(6))

        def run(scale):
            _, st, it = layer.solve_with_info(
                tv, solver_args={"eps": 1e-6, "refine_steps": 8,
                                 "max_iters": 2000,
                                 "eps_gap_scale": scale},
            )
            return int(np.asarray(st)), int(np.asarray(it))

        st1, it1 = run(1.0)
        st_hi, _ = run(100.0)
        st0, it0 = run(0.0)
        assert st1 == 0 and st_hi == 0 and st0 == 0
        assert it0 == 2000  # zero gap tolerance gates internal stopping
        assert it1 < 200

    def test_max_iters_caps_and_flags(self):
        # a starved cap flags MAX_ITERS and reports iters == cap; the
        # eager API raises (diffcp.SolverError parity)
        layer = self._layer()
        r = np.random.default_rng(23)
        tv = jnp.asarray(r.standard_normal(6))
        sa = {"eps": 1e-12, "refine_steps": 0, "admm_eps_abs": 1e-14,
              "admm_eps_rel": 1e-14, "max_iters": 10, "epoch": 10}
        _, st, it = layer.solve_with_info(tv, solver_args=sa)
        assert int(np.asarray(st)) == 1
        assert int(np.asarray(it)) == 10
        with pytest.raises(SolverError, match="max_iters"):
            layer(tv, solver_args=sa)

    def test_per_call_overrides_constructor(self):
        # constructor defaults merge with per-call overrides; the
        # per-call dict must not be mutated (reference
        # tests/test_parse_args.py:221-248 regression)
        x = ct.Variable(3, nonneg=True)
        t = ct.Parameter(3)
        prob = ct.Problem(ct.Minimize(ct.sum_squares(x - t)),
                          [ct.sum(x) == 1])
        layer = CvxpyLayer(prob, parameters=[t], variables=[x],
                           solver_args={"max_iters": 10, "epoch": 10,
                                        "refine_steps": 0,
                                        "eps": 1e-12,
                                        "admm_eps_abs": 1e-14,
                                        "admm_eps_rel": 1e-14})
        tv = jnp.asarray(np.random.default_rng(24).standard_normal(3))
        _, st, _ = layer.solve_with_info(tv)
        assert int(np.asarray(st)) == 1  # constructor default starves
        override = {"max_iters": 2000, "refine_steps": 8, "eps": 1e-7,
                    "admm_eps_abs": 1e-5, "admm_eps_rel": 1e-5}
        before = dict(override)
        _, st2, _ = layer.solve_with_info(tv, solver_args=override)
        assert int(np.asarray(st2)) == 0
        assert override == before  # caller dict not mutated
