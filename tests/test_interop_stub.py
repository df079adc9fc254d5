"""Executed coverage for the cvxpy interop shim WITHOUT cvxpy installed
(VERDICT r3 #6, mirroring the mlx-stub trick): `_cvxpy_stub` fakes the
public cvxpy expression-DAG surface the shim walks (same class names,
same duck-typed attributes), so `canon/cvxpy_interop.py` executes its
real dispatch paths in this environment. The six conformance cases from
test_conformance_cvxpy.py run against the stub with native oracles
(closed forms / a natively-declared twin layer) — the reference corpus
being cvxpy-written is exactly why this surface matters
(/root/reference/tests/test_torch.py:41-59 etc.)."""

import importlib
import sys

import numpy as np
import pytest

try:
    import cvxpy as _real_cvxpy  # noqa: F401

    HAVE_REAL = True
except ImportError:
    HAVE_REAL = False

import jax
import jax.numpy as jnp

import cvxpylayers_tpu as ct
from cvxpylayers_tpu import CvxpyLayer

rng = np.random.default_rng(7)


@pytest.fixture
def cp(monkeypatch):
    """Inject the stub as `cvxpy` (skipped when the real one exists —
    then test_conformance_cvxpy.py runs the battery for real)."""
    if HAVE_REAL:
        pytest.skip("real cvxpy installed; the real battery covers this")
    stub = importlib.import_module("_cvxpy_stub")
    monkeypatch.setitem(sys.modules, "cvxpy", stub)
    yield stub


class TestConversionMechanics:
    def test_is_cvxpy_problem(self, cp):
        from cvxpylayers_tpu.canon.cvxpy_interop import is_cvxpy_problem

        x = cp.Variable(2)
        prob = cp.Problem(cp.Minimize(cp.sum_squares(x)), [x >= 0])
        assert is_cvxpy_problem(prob)
        assert not is_cvxpy_problem(object())

    def test_leaf_attributes_carry_over(self, cp):
        from cvxpylayers_tpu.canon.cvxpy_interop import convert_problem

        x = cp.Variable(3, nonneg=True)
        S = cp.Variable((2, 2), symmetric=True)
        t = cp.Parameter(3, name="theta", pos=True)
        prob = cp.Problem(
            cp.Minimize(cp.sum_squares(x - t) + cp.trace(S)), [S >> 0]
        )
        native, (nt,), (nx, nS) = convert_problem(prob, [t], [x, S])
        assert nx.nonneg and nS.symmetric
        assert nt.name == "theta" and nt.pos
        assert native.is_dcp()

    def test_unknown_atom_raises(self, cp):
        from cvxpylayers_tpu.canon.cvxpy_interop import (
            InteropError,
            convert_problem,
        )

        class frobnicate(cp.Expression):  # noqa: N801 — fake atom
            pass

        x = cp.Variable(2)
        prob = cp.Problem(cp.Minimize(frobnicate([x])))
        with pytest.raises(InteropError, match="frobnicate"):
            convert_problem(prob, [], [x])

    def test_soc_and_expcone_constraints_convert(self, cp):
        from cvxpylayers_tpu.canon.cvxpy_interop import convert_problem

        x = cp.Variable(3)
        t = cp.Variable()
        u = cp.Variable()
        prob = cp.Problem(
            cp.Minimize(t),
            [cp.SOC(t, x), cp.ExpCone(t, u, t + 1.0)],
        )
        native, _, _ = convert_problem(prob, [], [t])
        kinds = [type(c).__name__ for c in native.constraints]
        assert "SOC" in kinds[0]
        assert any("Exp" in k for k in kinds)

    def test_per_part_dual_variable_mapping(self, cp):
        from cvxpylayers_tpu.canon.cvxpy_interop import convert_problem

        x = cp.Variable(3)
        t = cp.Parameter(3)
        soc = cp.SOC(cp.sum(x), x)
        prob = cp.Problem(cp.Minimize(cp.sum_squares(x - t)), [soc])
        native, _, n_vars = convert_problem(
            prob, [t], [x, soc.dual_variables[0], soc.dual_variables[1]]
        )
        nat_con = native.constraints[0]
        assert n_vars[1] is nat_con.dual_variables[0]
        assert n_vars[2] is nat_con.dual_variables[1]


class TestConformanceViaStub:
    """The six battery cases, stub-converted, native oracles."""

    def test_lad_regression(self, cp):
        n, m = 2, 4
        x = cp.Variable(n)
        A = cp.Parameter((m, n))
        b = cp.Parameter(m)
        prob = cp.Problem(cp.Minimize(cp.norm(A @ x - b, 1)), [x >= 0])
        layer = CvxpyLayer(prob, parameters=[A, b], variables=[x])
        Av = rng.standard_normal((m, n))
        bv = rng.standard_normal(m)
        (xs,) = layer(jnp.asarray(Av), jnp.asarray(bv))
        # oracle: the natively-declared twin layer
        xn = ct.Variable(n)
        An = ct.Parameter((m, n))
        bn = ct.Parameter(m)
        twin = CvxpyLayer(
            ct.Problem(ct.Minimize(ct.pnorm(An @ xn - bn, 1)), [xn >= 0]),
            parameters=[An, bn], variables=[xn],
        )
        (xt,) = twin(jnp.asarray(Av), jnp.asarray(bv))
        np.testing.assert_allclose(np.asarray(xs), np.asarray(xt),
                                   atol=1e-7)

    def test_least_squares_with_gradients(self, cp):
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

        def loss(y_):
            return jnp.sum(layer(jnp.asarray(Xv), y_)[0] ** 2)

        g = jax.grad(loss)(jnp.asarray(yv))
        eps = 1e-6
        for i in range(0, m, 2):
            e = np.zeros(m)
            e[i] = eps
            fd = (float(loss(jnp.asarray(yv + e)))
                  - float(loss(jnp.asarray(yv - e)))) / (2 * eps)
            np.testing.assert_allclose(float(g[i]), fd, atol=1e-4)

    def test_simplex_projection_with_eq_dual(self, cp):
        n = 5
        x = cp.Variable(n)
        v = cp.Parameter(n)
        cons = [cp.sum(x) == 1, x >= 0]
        prob = cp.Problem(cp.Minimize(cp.sum_squares(x - v)), cons)
        layer = CvxpyLayer(prob, parameters=[v],
                           variables=[x, cons[0]])
        vv = rng.standard_normal(n)
        xs, nu = layer(jnp.asarray(vv))
        xs = np.asarray(xs)
        assert abs(xs.sum() - 1.0) < 1e-6 and xs.min() > -1e-7
        # KKT: 2(x - v) + nu * 1 - mu = 0 with mu >= 0, mu_i x_i = 0;
        # on the support, nu = -2(x - v)_i (sign convention modulo)
        active = xs > 1e-6
        kkt = 2 * (xs - vv)[active]
        assert np.allclose(kkt, kkt[0], atol=1e-5)
        assert abs(np.abs(np.asarray(nu)).reshape(())
                   - np.abs(kkt[0])) < 1e-4

    def test_logistic_regression_exp_cone(self, cp):
        nf, ns = 2, 6
        beta = cp.Variable(nf)
        Xy = cp.Parameter((ns, nf))
        prob = cp.Problem(
            cp.Minimize(
                cp.sum(cp.logistic(Xy @ beta))
                + 0.1 * cp.sum_squares(beta)
            )
        )
        layer = CvxpyLayer(prob, parameters=[Xy], variables=[beta])
        Xv = rng.standard_normal((ns, nf))
        (bs,) = layer(jnp.asarray(Xv))
        # oracle: scipy smooth minimization
        from scipy.optimize import minimize as spmin

        def f(b_):
            z = Xv @ b_
            return float(np.logaddexp(0, z).sum() + 0.1 * (b_ @ b_))

        ref = spmin(f, np.zeros(nf), method="BFGS", tol=1e-12).x
        np.testing.assert_allclose(np.asarray(bs), ref, atol=1e-5)

    def test_sdp_trace_objective(self, cp):
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

    def test_socp_norm_constraint(self, cp):
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

    # ---- r5 widening (VERDICT r4 #9): battery grows to ten cases ----

    def test_optnet_box_qp_matrix_param_constraint(self, cp):
        # matrix Parameter INSIDE a constraint (G @ x <= h) — the
        # OptNet pattern (reference tests/test_torch.py:958-975) —
        # plus batched-parameter broadcasting through the layer call
        n, m = 4, 3
        x = cp.Variable(n)
        vv = cp.Parameter(n)
        G = cp.Parameter((m, n))
        h = cp.Parameter(m)
        prob = cp.Problem(cp.Minimize(cp.sum_squares(x - vv)),
                          [G @ x <= h, x >= 0, x <= 1])
        layer = CvxpyLayer(prob, parameters=[vv, G, h],
                           variables=[x])
        B = 3
        v_b = rng.standard_normal((B, n))
        G_u = rng.standard_normal((m, n)) * 0.3   # UNBATCHED: broadcast
        h_b = np.abs(rng.standard_normal((B, m))) + 1.0
        (xs,) = layer(jnp.asarray(v_b), jnp.asarray(G_u),
                      jnp.asarray(h_b))
        assert xs.shape == (B, n)
        # oracle: scipy per instance
        from scipy.optimize import minimize as spmin

        for i in range(B):
            ref = spmin(
                lambda z: float(((z - v_b[i]) ** 2).sum()),
                np.clip(v_b[i], 0, 1),
                constraints=[{"type": "ineq",
                              "fun": lambda z: h_b[i] - G_u @ z}],
                bounds=[(0.0, 1.0)] * n, method="SLSQP",
                options={"ftol": 1e-12},
            ).x
            np.testing.assert_allclose(np.asarray(xs[i]), ref,
                                       atol=1e-4)

    def test_entropy_projection_with_entr(self, cp):
        # the softmax layer through the shim: max c'y + sum(entr(y))
        # s.t. sum(y) = 1 — closed form y* = softmax(c)
        n = 6
        y = cp.Variable(n, nonneg=True)
        c = cp.Parameter(n)
        prob = cp.Problem(
            cp.Maximize(c @ y + cp.sum(cp.entr(y))),
            [cp.sum(y) == 1],
        )
        layer = CvxpyLayer(prob, parameters=[c], variables=[y])
        cv = rng.standard_normal(n)
        (ys,) = layer(jnp.asarray(cv),
                      solver_args={"eps_abs": 1e-7, "eps_rel": 1e-7})
        ref = np.exp(cv) / np.exp(cv).sum()
        np.testing.assert_allclose(np.asarray(ys), ref, atol=1e-5)

    def test_scipy_sparse_constant(self, cp):
        # cvxpy Constants routinely hold scipy.sparse matrices; the
        # shim must densify (np.asarray alone yields a 0-d object
        # array — the r5 fix this case pins)
        import scipy.sparse as sp

        n = 4
        x = cp.Variable(n)
        v = cp.Parameter(n)
        D = sp.diags([2.0, 1.0, 0.5, 0.25]).tocsr()
        prob = cp.Problem(
            cp.Minimize(cp.sum_squares(cp.Constant(D) @ x - v))
        )
        layer = CvxpyLayer(prob, parameters=[v], variables=[x])
        vv = rng.standard_normal(n)
        (xs,) = layer(jnp.asarray(vv))
        ref = vv / np.array([2.0, 1.0, 0.5, 0.25])
        np.testing.assert_allclose(np.asarray(xs), ref, atol=1e-6)

    def test_scalene_composition_and_promote(self, cp):
        # neg/scalene-class composition (cvxpy's scalene = alpha pos +
        # beta neg) + an explicit Promote broadcast node — asymmetric
        # (quantile-flavored) regression with a closed-form check via
        # SLSQP
        n = 3
        x = cp.Variable(n)
        p = cp.Parameter(n)
        t = cp.Parameter()  # scalar, Promote-broadcast to (n,)
        resid = x - p
        obj = (cp.sum(cp.scalene(resid, 2.0, 3.0))
               + cp.sum_squares(x - cp.Promote(t, (n,))))
        prob = cp.Problem(cp.Minimize(obj))
        layer = CvxpyLayer(prob, parameters=[p, t], variables=[x])
        pv = rng.standard_normal(n)
        tv = 0.3
        (xs,) = layer(jnp.asarray(pv), jnp.asarray(tv),
                      solver_args={"eps_abs": 1e-7, "eps_rel": 1e-7})
        from scipy.optimize import minimize as spmin

        def f(z):
            r = z - pv
            return float(2.0 * np.maximum(r, 0).sum()
                         + 3.0 * np.maximum(-r, 0).sum()
                         + ((z - tv) ** 2).sum())

        ref = spmin(f, pv, method="Nelder-Mead",
                    options={"xatol": 1e-10, "fatol": 1e-12}).x
        np.testing.assert_allclose(np.asarray(xs), ref, atol=1e-4)

    # ---- late-r5 widening: index / huber / quad_over_lin / norm_inf ----

    def test_index_slicing_constraints(self, cp):
        # slicing is ubiquitous in the reference corpus (x[0], x[1:3]);
        # exercises the shim's `index` node path (node.key passthrough)
        n = 4
        x = cp.Variable(n)
        v = cp.Parameter(n)
        prob = cp.Problem(
            cp.Minimize(cp.sum_squares(x - v)),
            [x[0] == x[3], x[1:3] <= 0.5],
        )
        layer = CvxpyLayer(prob, parameters=[v], variables=[x])
        vv = rng.standard_normal(n) + 0.5
        (xs,) = layer(jnp.asarray(vv),
                      solver_args={"eps_abs": 1e-8, "eps_rel": 1e-8})
        from scipy.optimize import minimize as spmin

        ref = spmin(
            lambda z: float(((z - vv) ** 2).sum()), vv, method="SLSQP",
            constraints=[
                {"type": "eq", "fun": lambda z: z[0] - z[3]},
                {"type": "ineq", "fun": lambda z: 0.5 - z[1:3]},
            ],
            options={"ftol": 1e-12},
        ).x
        np.testing.assert_allclose(np.asarray(xs), ref, atol=1e-5)

    def test_huber_robust_regression(self, cp):
        # reference examples use huber robust fitting; M passthrough
        m, n, M = 6, 3, 0.6
        A = rng.standard_normal((m, n))
        x = cp.Variable(n)
        b = cp.Parameter(m)
        prob = cp.Problem(
            cp.Minimize(cp.sum(cp.huber(A @ x - b, M))
                        + 0.01 * cp.sum_squares(x))
        )
        layer = CvxpyLayer(prob, parameters=[b], variables=[x])
        bv = rng.standard_normal(m) * 2.0
        (xs,) = layer(jnp.asarray(bv),
                      solver_args={"eps_abs": 1e-8, "eps_rel": 1e-8})
        from scipy.optimize import minimize as spmin

        def f(z):
            r = np.abs(A @ z - bv)
            h = np.where(r <= M, r ** 2, M * (2 * r - M))
            return float(h.sum() + 0.01 * (z ** 2).sum())

        ref = spmin(f, np.zeros(n), method="Nelder-Mead",
                    options={"xatol": 1e-10, "fatol": 1e-13,
                             "maxiter": 20000}).x
        np.testing.assert_allclose(np.asarray(xs), ref, atol=1e-4)

    def test_quad_over_lin_closed_form(self, cp):
        # min qol(x - v, t) + t  s.t. sum(x) = 1, t >= 0.1:
        # inner min over t gives 2||x - v||, whose simplex-affine
        # minimizer is the mean-shift projection — closed form
        n = 4
        x = cp.Variable(n)
        t = cp.Variable(nonneg=True)
        v = cp.Parameter(n)
        prob = cp.Problem(
            cp.Minimize(cp.quad_over_lin(x - v, t) + t),
            [cp.sum(x) == 1, t >= 0.1],
        )
        layer = CvxpyLayer(prob, parameters=[v], variables=[x, t])
        vv = rng.standard_normal(n) + 2.0  # sum(vv) far from 1
        (xs, ts) = layer(jnp.asarray(vv),
                         solver_args={"eps_abs": 1e-8, "eps_rel": 1e-8})
        shift = (1.0 - vv.sum()) / n
        ref_x = vv + shift
        ref_t = np.abs(1.0 - vv.sum()) / np.sqrt(n)
        assert ref_t > 0.1  # the bound is inactive by construction
        np.testing.assert_allclose(np.asarray(xs), ref_x, atol=1e-5)
        np.testing.assert_allclose(float(ts), ref_t, atol=1e-5)

    def test_norm_inf_chebyshev(self, cp):
        # min ||Ax - b||_inf — exercises the dedicated norm_inf node
        # cvxpy builds for p='inf'; oracle via the LP epigraph form
        m, n = 5, 2
        A = rng.standard_normal((m, n))
        x = cp.Variable(n)
        b = cp.Parameter(m)
        prob = cp.Problem(cp.Minimize(cp.norm(A @ x - b, "inf")))
        layer = CvxpyLayer(prob, parameters=[b], variables=[x])
        bv = rng.standard_normal(m)
        (xs,) = layer(jnp.asarray(bv),
                      solver_args={"eps_abs": 1e-8, "eps_rel": 1e-8})
        from scipy.optimize import linprog

        c = np.r_[np.zeros(n), 1.0]
        A_ub = np.block([[A, -np.ones((m, 1))], [-A, -np.ones((m, 1))]])
        b_ub = np.r_[bv, -bv]
        lp = linprog(c, A_ub=A_ub, b_ub=b_ub,
                     bounds=[(None, None)] * (n + 1))
        obj = float(np.max(np.abs(A @ np.asarray(xs) - bv)))
        np.testing.assert_allclose(obj, lp.fun, atol=1e-5)
