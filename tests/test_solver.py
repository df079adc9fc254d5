"""ADMM solver + Newton polish + implicit-diff correctness.

Oracles follow the reference's test strategy (SURVEY section 4): closed-form
KKT solutions, scipy.linprog cross-checks, analytic projections, softmax for
entropy problems, infeasibility status contracts, batched == loop-of-single,
and finite-difference gradient checks of the custom_vjp.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.optimize

from cvxpylayers_tpu.cones import ConeDims
from cvxpylayers_tpu.diff import make_diff_solver
from cvxpylayers_tpu.solver import (
    DUAL_INFEASIBLE,
    PRIMAL_INFEASIBLE,
    SOLVED,
    SolverSettings,
    make_admm_solver,
    make_polished_solver,
)

rng = np.random.default_rng(3)
ST = SolverSettings()


def _solve(dims, n, P, q, A, b, settings=ST):
    f = jax.jit(make_polished_solver(dims, n, settings))
    return f(
        jnp.asarray(P), jnp.asarray(q), jnp.asarray(A), jnp.asarray(b),
        jnp.zeros(n), jnp.zeros(dims.total), jnp.zeros(dims.total),
    )


class TestEqualityQP:
    def test_closed_form(self):
        # min 1/2 x'Px + q'x s.t. Gx = h  -> KKT linear system
        n, p = 6, 2
        L = rng.standard_normal((n, n))
        P = L @ L.T + np.eye(n)
        q = rng.standard_normal(n)
        G = rng.standard_normal((p, n))
        h = rng.standard_normal(p)
        dims = ConeDims(zero=p)
        res = _solve(dims, n, P, q, G, h)
        assert int(res.status) == SOLVED
        KKT = np.block([[P, G.T], [G, np.zeros((p, p))]])
        sol = np.linalg.solve(KKT, np.concatenate([-q, h]))
        np.testing.assert_allclose(np.asarray(res.x), sol[:n], atol=1e-7)
        # dual: our convention Px + q + G'y = 0
        np.testing.assert_allclose(np.asarray(res.y), sol[n:], atol=1e-6)


class TestBoxQP:
    def test_projection_onto_box(self):
        # min 1/2||x - v||^2 s.t. 0 <= x <= 1  (A = [[-I],[I]]; s = b - Ax)
        n = 8
        v = rng.standard_normal(n) * 2
        P = np.eye(n)
        q = -v
        A = np.vstack([-np.eye(n), np.eye(n)])
        b = np.concatenate([np.zeros(n), np.ones(n)])
        dims = ConeDims(nonneg=2 * n)
        res = _solve(dims, n, P, q, A, b)
        assert int(res.status) == SOLVED
        np.testing.assert_allclose(np.asarray(res.x), np.clip(v, 0, 1), atol=1e-7)


class TestLP:
    def test_vs_linprog(self):
        n, m = 6, 10
        A = rng.standard_normal((m, n))
        x_feas = rng.standard_normal(n)
        b = A @ x_feas + np.abs(rng.standard_normal(m)) + 0.1
        q = rng.standard_normal(n)
        # bounded: add box -10 <= x <= 10
        A_full = np.vstack([A, np.eye(n), -np.eye(n)])
        b_full = np.concatenate([b, 10 * np.ones(n), 10 * np.ones(n)])
        dims = ConeDims(nonneg=m + 2 * n)
        res = _solve(dims, n, np.zeros((n, n)), q, A_full, b_full)
        assert int(res.status) == SOLVED
        ref = scipy.optimize.linprog(
            q, A_ub=A_full, b_ub=b_full, bounds=(None, None), method="highs"
        )
        np.testing.assert_allclose(float(res.pobj), ref.fun, atol=1e-6)
        np.testing.assert_allclose(np.asarray(res.x), ref.x, atol=1e-5)


class TestSOCP:
    def test_projection_onto_soc(self):
        # min 1/2||x - v||^2 s.t. x in SOC  (s = x, b = 0, A = -I)
        d = 5
        v = rng.standard_normal(d) * 2
        P = np.eye(d)
        q = -v
        A = -np.eye(d)
        b = np.zeros(d)
        dims = ConeDims(soc=(d,))
        res = _solve(dims, d, P, q, A, b)
        assert int(res.status) == SOLVED
        from cvxpylayers_tpu.cones.projections import project_soc

        want = np.asarray(project_soc(jnp.asarray(v)))
        np.testing.assert_allclose(np.asarray(res.x), want, atol=1e-7)


class TestExp:
    def test_entropy_softmax(self):
        # max sum entr(x) + c'x  s.t. sum x == 1, x >= 0  -> x = softmax(c-1)?
        # min -sum entr(x) - c'x: optimal x_i = exp(c_i) / sum exp(c_j)
        # KKT: log x_i + 1 - c_i + lam = 0 -> x_i = e^{c_i - 1 - lam}
        n = 4
        c = rng.standard_normal(n)
        # variables: x (n), t (n) epigraph of -entr: t_i >= x_i log x_i
        # formulate directly in cone form:
        #   min sum t - c'x
        #   s.t. sum x = 1  (zero cone)
        #        (-t_i, x_i, 1) in Kexp  (t_i >= x_i log x_i = -entr)
        # cone rows for exp: s = (u1,u2,u3) = (-t_i, x_i, 1)
        nv = 2 * n  # x then t
        q = np.concatenate([-c, np.ones(n)])
        rows = []
        bvec = []
        # zero row: sum x = 1: s = 1 - sum x = 0 -> A row = [1...1, 0...0]
        A = np.zeros((1 + 3 * n, nv))
        b = np.zeros(1 + 3 * n)
        A[0, :n] = 1.0
        b[0] = 1.0
        for i in range(n):
            r = 1 + 3 * i
            # s_r = -t_i  => A[r, n+i] = 1, b = 0
            A[r, n + i] = 1.0
            # s_{r+1} = x_i => A[r+1, i] = -1
            A[r + 1, i] = -1.0
            # s_{r+2} = 1
            b[r + 2] = 1.0
        del rows, bvec
        dims = ConeDims(zero=1, exp=n)
        res = _solve(dims, nv, np.zeros((nv, nv)), q, A, b)
        assert int(res.status) == SOLVED
        x = np.asarray(res.x[:n])
        want = np.exp(c) / np.sum(np.exp(c))
        np.testing.assert_allclose(x, want, atol=1e-6)


class TestStatuses:
    def test_primal_infeasible(self):
        # x >= 1 and x <= 0: infeasible
        A = np.array([[-1.0], [1.0]])
        b = np.array([-1.0, 0.0])
        dims = ConeDims(nonneg=2)
        res = _solve(dims, 1, np.zeros((1, 1)), np.zeros(1), A, b)
        assert int(res.status) == PRIMAL_INFEASIBLE

    def test_dual_infeasible(self):
        # min -x s.t. x >= 0: unbounded below
        A = np.array([[-1.0]])
        b = np.array([0.0])
        dims = ConeDims(nonneg=1)
        res = _solve(dims, 1, np.zeros((1, 1)), np.array([-1.0]), A, b)
        assert int(res.status) == DUAL_INFEASIBLE


class TestBatching:
    def test_vmap_matches_loop(self):
        n, m = 4, 6
        dims = ConeDims(nonneg=m)
        solver = make_polished_solver(dims, n, ST)
        B = 5
        P = np.stack([np.eye(n)] * B)
        qs = rng.standard_normal((B, n))
        A = rng.standard_normal((m, n))
        x_f = rng.standard_normal(n)
        bs = np.stack([A @ x_f + np.abs(rng.standard_normal(m)) + 0.5
                       for _ in range(B)])
        As = np.stack([A] * B)
        batched = jax.jit(jax.vmap(solver))(
            jnp.asarray(P), jnp.asarray(qs), jnp.asarray(As), jnp.asarray(bs),
            jnp.zeros((B, n)), jnp.zeros((B, m)), jnp.zeros((B, m)),
        )
        single = jax.jit(solver)
        for i in range(B):
            ri = single(
                jnp.asarray(P[i]), jnp.asarray(qs[i]), jnp.asarray(As[i]),
                jnp.asarray(bs[i]), jnp.zeros(n), jnp.zeros(m), jnp.zeros(m),
            )
            np.testing.assert_allclose(
                np.asarray(batched.x[i]), np.asarray(ri.x), atol=1e-6
            )


class TestDiff:
    def _fd_check(self, dims, n, P, q, A, b, out_fn, atol=2e-4, eps=1e-6):
        solver = make_diff_solver(dims, n, ST)
        m = dims.total

        def loss(P_, q_, A_, b_):
            x, y, s, status, iters = solver(
                P_, q_, A_, b_, jnp.zeros(n), jnp.zeros(m), jnp.zeros(m)
            )
            return out_fn(x, y, s)

        g = jax.grad(loss, argnums=(0, 1, 2, 3))(
            jnp.asarray(P), jnp.asarray(q), jnp.asarray(A), jnp.asarray(b)
        )
        loss_j = jax.jit(loss)

        def num(f, arr, darr):
            return (
                float(loss_j(*darr(arr + eps * f)))
                - float(loss_j(*darr(arr - eps * f)))
            ) / (2 * eps)

        # probe a few random directions per argument
        args = [np.asarray(P), np.asarray(q), np.asarray(A), np.asarray(b)]
        for k in range(4):
            direction = [rng.standard_normal(a.shape) for a in args]
            # zero all but k
            direction = [
                d if i == k else np.zeros_like(d)
                for i, d in enumerate(direction)
            ]
            analytic = sum(
                float(np.sum(np.asarray(gi) * di))
                for gi, di in zip(g, direction)
            )
            f_p = [jnp.asarray(a + eps * d) for a, d in zip(args, direction)]
            f_m = [jnp.asarray(a - eps * d) for a, d in zip(args, direction)]
            numeric = (float(loss_j(*f_p)) - float(loss_j(*f_m))) / (2 * eps)
            assert abs(analytic - numeric) <= atol * (1 + abs(numeric)), (
                k, analytic, numeric
            )

    def test_grad_box_qp(self):
        n = 5
        v = rng.standard_normal(n)
        P = np.eye(n)
        q = -v
        A = np.vstack([-np.eye(n), np.eye(n)])
        b = np.concatenate([np.zeros(n), np.ones(n)])
        dims = ConeDims(nonneg=2 * n)
        self._fd_check(dims, n, P, q, A, b, lambda x, y, s: jnp.sum(x**2))

    def test_grad_eq_qp_with_duals(self):
        n, p = 5, 2
        L = rng.standard_normal((n, n))
        P = L @ L.T + np.eye(n)
        q = rng.standard_normal(n)
        G = rng.standard_normal((p, n))
        h = rng.standard_normal(p)
        dims = ConeDims(zero=p)
        self._fd_check(
            dims, n, P, q, G, h, lambda x, y, s: jnp.sum(x) + jnp.sum(y**2)
        )

    def test_grad_socp(self):
        d = 4
        v = rng.standard_normal(d) + np.array([2.0, 0, 0, 0])
        P = np.eye(d)
        q = -v
        A = -np.eye(d)
        b = np.zeros(d)
        dims = ConeDims(soc=(d,))
        self._fd_check(dims, d, P, q, A, b, lambda x, y, s: jnp.sum(x**3))

    def test_envelope_theorem_lp(self):
        # d(q'x*)/dq = x* for LP with unique solution (reference
        # tests/test_moreau.py:1813-1821 pattern)
        n, m = 4, 8
        A = rng.standard_normal((m, n))
        x_f = rng.standard_normal(n)
        b = A @ x_f + np.abs(rng.standard_normal(m)) + 0.3
        A_full = np.vstack([A, np.eye(n), -np.eye(n)])
        b_full = np.concatenate([b, 5 * np.ones(n), 5 * np.ones(n)])
        q = rng.standard_normal(n)
        dims = ConeDims(nonneg=m + 2 * n)
        solver = make_diff_solver(dims, n, ST)
        mm = dims.total

        def obj(q_):
            x, *_ = solver(
                jnp.zeros((n, n)), q_, jnp.asarray(A_full), jnp.asarray(b_full),
                jnp.zeros(n), jnp.zeros(mm), jnp.zeros(mm),
            )
            return q_ @ x

        g = jax.grad(obj)(jnp.asarray(q))
        x_star, *_ = solver(
            jnp.zeros((n, n)), jnp.asarray(q), jnp.asarray(A_full),
            jnp.asarray(b_full), jnp.zeros(n), jnp.zeros(mm), jnp.zeros(mm),
        )
        np.testing.assert_allclose(np.asarray(g), np.asarray(x_star), atol=1e-5)


class TestIPM:
    def _solve_ipm(self, dims, n, P, q, A, b):
        from cvxpylayers_tpu.solver.ipm import make_ipm_solver

        f = jax.jit(make_ipm_solver(dims, n, SolverSettings(eps_abs=1e-9)))
        return f(
            jnp.asarray(P), jnp.asarray(q), jnp.asarray(A), jnp.asarray(b),
            jnp.zeros(n), jnp.zeros(dims.total), jnp.zeros(dims.total),
        )

    def test_matches_admm_on_qp(self):
        n, p = 6, 2
        L = rng.standard_normal((n, n))
        P = L @ L.T + np.eye(n)
        q = rng.standard_normal(n)
        G = rng.standard_normal((p, n))
        h = rng.standard_normal(p)
        dims = ConeDims(zero=p)
        r_ipm = self._solve_ipm(dims, n, P, q, G, h)
        r_admm = _solve(dims, n, P, q, G, h)
        assert int(r_ipm.status) == SOLVED
        assert int(r_ipm.iters) < 20  # superlinear convergence
        np.testing.assert_allclose(
            np.asarray(r_ipm.x), np.asarray(r_admm.x), atol=1e-7
        )
        np.testing.assert_allclose(
            np.asarray(r_ipm.y), np.asarray(r_admm.y), atol=1e-6
        )

    def test_socp(self):
        d = 5
        v = rng.standard_normal(d) * 2
        dims = ConeDims(soc=(d,))
        r = self._solve_ipm(dims, d, np.eye(d), -v, -np.eye(d), np.zeros(d))
        assert int(r.status) == SOLVED
        from cvxpylayers_tpu.cones.projections import project_soc

        np.testing.assert_allclose(
            np.asarray(r.x), np.asarray(project_soc(jnp.asarray(v))),
            atol=1e-7,
        )

    def test_exp_cone(self):
        # softmax via exp cones: min -v'x + sum(x log x) over the simplex
        # has the closed form x* = softmax(v). Canonical form: entropy
        # epigraph t_i >= x_i log x_i via exp cone (−t_i, x_i, 1).
        d = 4
        v = rng.standard_normal(d)
        # variables: [x (d), t (d)]; minimize -v'x + sum t
        n = 2 * d
        q = np.concatenate([-v, np.ones(d)])
        rows = []
        bvec = []
        # sum x = 1 (zero cone)
        rows.append(np.concatenate([np.ones(d), np.zeros(d)]))
        bvec.append(1.0)
        A = [np.asarray(rows[0])[None, :]]
        # exp cones: (x_i log x_i <= t_i) <=> (-t_i, x_i, 1) in Kexp
        # s = b - Ax with s in Kexp: rows for (u, w, r): u = -(-t_i) etc.
        Ae = np.zeros((3 * d, n))
        be = np.zeros(3 * d)
        for i in range(d):
            # u slot: s0 = -t_i  -> A row = +t_i coeff ... s = b - Ax
            Ae[3 * i, d + i] = 1.0        # b=0, A x = t_i -> s0 = -t_i
            Ae[3 * i + 1, i] = -1.0       # s1 = x_i
            be[3 * i + 2] = 1.0           # s2 = 1
        A_full = np.vstack([A[0], Ae])
        b_full = np.concatenate([[1.0], be])
        dims = ConeDims(zero=1, exp=d)
        r = self._solve_ipm(dims, n, np.zeros((n, n)), q, A_full, b_full)
        assert int(r.status) == SOLVED
        ev = np.exp(v - v.max())
        # raw IPM accuracy (the layer path adds the Newton polish on top)
        np.testing.assert_allclose(
            np.asarray(r.x[:d]), ev / ev.sum(), atol=5e-6
        )

    def test_psd_cone(self):
        # min tr(CX) s.t. tr(X) = 1, X >> 0 -> x* = outer(u, u) for the
        # min-eigenvector u of C
        s_dim = 3
        C = rng.standard_normal((s_dim, s_dim))
        C = (C + C.T) / 2
        from cvxpylayers_tpu.cones.projections import sym_to_svec

        D = s_dim * (s_dim + 1) // 2
        q = np.asarray(sym_to_svec(jnp.asarray(C)))
        # variable x = svec(X); tr(X) = sum of diagonal svec entries
        diag_mask = np.zeros(D)
        k = 0
        for j in range(s_dim):
            diag_mask[k] = 1.0
            k += s_dim - j
        A_eq = diag_mask[None, :]
        b_eq = np.array([1.0])
        # X >> 0: s = b - Ax = x in PSD cone -> A = -I, b = 0
        A_full = np.vstack([A_eq, -np.eye(D)])
        b_full = np.concatenate([b_eq, np.zeros(D)])
        dims = ConeDims(zero=1, psd=(s_dim,))
        r = self._solve_ipm(dims, D, np.zeros((D, D)), q, A_full, b_full)
        assert int(r.status) == SOLVED
        w = np.linalg.eigvalsh(C)
        obj = float(q @ np.asarray(r.x))
        np.testing.assert_allclose(obj, w[0], atol=1e-6)

    def test_ipm_primal_infeasible_certificate(self):
        # x >= 1 and x <= 0: infeasible -> PRIMAL_INFEASIBLE status
        dims = ConeDims(nonneg=2)
        A = np.array([[-1.0], [1.0]])
        b = np.array([-1.0, 0.0])
        r = self._solve_ipm(dims, 1, np.zeros((1, 1)), np.zeros(1), A, b)
        from cvxpylayers_tpu.solver.settings import PRIMAL_INFEASIBLE

        assert int(r.status) == PRIMAL_INFEASIBLE

    def test_ipm_dual_infeasible_certificate(self):
        # min -x s.t. x >= 0: unbounded -> DUAL_INFEASIBLE status
        dims = ConeDims(nonneg=1)
        A = np.array([[-1.0]])
        b = np.array([0.0])
        r = self._solve_ipm(dims, 1, np.zeros((1, 1)), np.array([-1.0]),
                            A, b)
        from cvxpylayers_tpu.solver.settings import DUAL_INFEASIBLE

        assert int(r.status) == DUAL_INFEASIBLE

    def test_layer_solve_method_ipm(self):
        import cvxpylayers_tpu as ct
        from cvxpylayers_tpu import CvxpyLayer

        n = 5
        x = ct.Variable(n)
        v = ct.Parameter(n)
        prob = ct.Problem(
            ct.Minimize(ct.sum_squares(x - v)), [ct.sum(x) == 1, x >= 0]
        )
        layer = CvxpyLayer(prob, parameters=[v], variables=[x])
        vv = jnp.asarray(rng.standard_normal(n))
        (x_ipm,) = layer(vv, solver_args={"solve_method": "IPM"})
        (x_admm,) = layer(vv)
        np.testing.assert_allclose(
            np.asarray(x_ipm), np.asarray(x_admm), atol=1e-7
        )
        g_ipm = jax.grad(
            lambda v_: jnp.sum(
                layer(v_, solver_args={"solve_method": "IPM"})[0] ** 2
            )
        )(vv)
        g_admm = jax.grad(lambda v_: jnp.sum(layer(v_)[0] ** 2))(vv)
        np.testing.assert_allclose(
            np.asarray(g_ipm), np.asarray(g_admm), atol=1e-6
        )

    def test_layer_ipm_exp_cone(self):
        # entropy-regularized layer through the full IPM+polish pipeline
        import cvxpylayers_tpu as ct
        from cvxpylayers_tpu import CvxpyLayer

        n = 4
        x = ct.Variable(n, nonneg=True)
        v = ct.Parameter(n)
        prob = ct.Problem(
            ct.Maximize(v @ x + ct.sum(ct.entr(x))), [ct.sum(x) == 1]
        )
        layer = CvxpyLayer(prob, parameters=[v], variables=[x])
        vv = jnp.asarray(rng.standard_normal(n))
        (x_ipm,) = layer(vv, solver_args={"solve_method": "ipm"})
        ev = np.exp(np.asarray(vv) - np.asarray(vv).max())
        np.testing.assert_allclose(
            np.asarray(x_ipm), ev / ev.sum(), atol=1e-8
        )
        g_ipm = jax.grad(
            lambda v_: jnp.sum(
                layer(v_, solver_args={"solve_method": "ipm"})[0] ** 2
            )
        )(vv)
        g_admm = jax.grad(lambda v_: jnp.sum(layer(v_)[0] ** 2))(vv)
        np.testing.assert_allclose(
            np.asarray(g_ipm), np.asarray(g_admm), atol=1e-6
        )

    def test_layer_ipm_sdp(self):
        # min-eigenvalue SDP through the layer with solve_method=ipm
        import cvxpylayers_tpu as ct
        from cvxpylayers_tpu import CvxpyLayer

        s = 3
        X = ct.Variable((s, s), symmetric=True)
        C = ct.Parameter((s, s))
        prob = ct.Problem(
            ct.Minimize(ct.trace(C @ X)),
            [ct.trace(X) == 1, ct.PSD(X)],
        )
        layer = CvxpyLayer(prob, parameters=[C], variables=[X])
        Cm = rng.standard_normal((s, s))
        Cm = (Cm + Cm.T) / 2
        (X_ipm,) = layer(jnp.asarray(Cm),
                         solver_args={"solve_method": "ipm"})
        w = np.linalg.eigvalsh(Cm)
        np.testing.assert_allclose(
            float(np.trace(Cm @ np.asarray(X_ipm))), w[0], atol=1e-7
        )


class TestPallasEpochKernel:
    def test_matches_xla_scan_interpret(self):
        # validate the (experimental) fused kernel against the reference
        # iteration in Pallas interpreter mode on CPU
        from cvxpylayers_tpu.solver.pallas_admm import polyhedral_inner_epoch
        from jax.experimental import pallas as pl
        from unittest import mock

        B, n, m = 8, 6, 10
        r = np.random.default_rng(0)
        minv = jnp.asarray(r.standard_normal((B, n, n)) * 0.05, jnp.float32)
        A = jnp.asarray(r.standard_normal((B, m, n)) * 0.1, jnp.float32)
        q = jnp.asarray(r.standard_normal((B, n)), jnp.float32)
        b = jnp.asarray(r.standard_normal((B, m)), jnp.float32)
        rho = jnp.full((B, m), 0.1, jnp.float32)
        x = jnp.zeros((B, n), jnp.float32)
        z = jnp.zeros((B, m), jnp.float32)
        y = jnp.zeros((B, m), jnp.float32)

        orig_call = pl.pallas_call

        def interp_call(*a, **k):
            k["interpret"] = True
            return orig_call(*a, **k)

        with mock.patch.object(pl, "pallas_call", interp_call):
            out = polyhedral_inner_epoch(
                minv, A, q, b, rho, x, z, y,
                n_zero=2, iters=10, sigma=1e-6, alpha=1.6, tile=4,
            )

        def body(c, _):
            x_, z_, y_ = c
            rhs = 1e-6 * x_ - q + jnp.einsum("bmn,bm->bn", A, rho * z_ - y_)
            xt = jnp.einsum("bnm,bm->bn", minv, rhs)
            zt = jnp.einsum("bmn,bn->bm", A, xt)
            xn = 1.6 * xt - 0.6 * x_
            w = 1.6 * zt - 0.6 * z_ + y_ / rho
            col = jnp.arange(m)[None, :]
            zn = jnp.where(col < 2, b, b - jnp.maximum(b - w, 0.0))
            yn = rho * (w - zn)
            return (xn, zn, yn), None

        (x2, z2, y2), _ = jax.lax.scan(body, (x, z, y), None, length=10)
        for got, want in zip(out, (x2, z2, y2)):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=1e-5
            )


class TestPolyhedralKKTFastPath:
    def test_matches_dense_lu_f32(self):
        # the f32 Schur fast path (kkt.make_kkt_solver polyhedral branch)
        # must reproduce the exact J/J' solves on nondegenerate systems
        from cvxpylayers_tpu.solver.kkt import make_kkt, make_kkt_solver

        rng_ = np.random.default_rng(3)
        checked = 0
        while checked < 8:
            n = int(rng_.integers(4, 12))
            nz = int(rng_.integers(0, 3))
            nn = int(rng_.integers(2, 10))
            dims = ConeDims(zero=nz, nonneg=nn)
            m = dims.total
            L = rng_.standard_normal((n, n))
            P = (L @ L.T + np.eye(n)).astype(np.float32)
            A = rng_.standard_normal((m, n)).astype(np.float32)
            b = rng_.standard_normal(m).astype(np.float32)
            q = rng_.standard_normal(n).astype(np.float32)
            x = rng_.standard_normal(n).astype(np.float32)
            w = rng_.standard_normal(m).astype(np.float32)
            rhs = rng_.standard_normal(n + m).astype(np.float32)
            _, jacobian, _ = make_kkt(dims, n)
            J = np.asarray(jacobian(*[
                jnp.asarray(a_, jnp.float64)
                for a_ in (x, w, P, q, A, b)
            ]))
            if np.linalg.cond(J) > 1e7:
                continue  # degenerate active set; damping owns these
            solver = make_kkt_solver(dims, n)
            for transpose in (False, True):
                got = np.asarray(solver(
                    jnp.asarray(x), jnp.asarray(w), jnp.asarray(P),
                    jnp.asarray(q), jnp.asarray(A), jnp.asarray(b),
                    jnp.asarray(rhs), transpose=transpose,
                ))
                M = J.T if transpose else J
                ref = np.linalg.solve(M, rhs.astype(np.float64))
                err = np.abs(got - ref).max() / (1 + np.abs(ref).max())
                assert err < 1e-4, (n, nz, nn, transpose, err)
            checked += 1


class TestDenseNormalKKTWindow:
    def test_mixed_cones_in_window_match_f64_lu(self):
        # ADVICE r2: the f32 dense-normal CG fast path (materialized
        # H = M'M inside the [DENSE_NORMAL_MIN, DENSE_NORMAL_MAX]
        # window) shipped untested with mixed cones. Assert both the
        # dense route ("auto") and the matvec-only route ("operator")
        # reproduce a well-conditioned f64 LU reference, J and J'.
        from cvxpylayers_tpu.solver.kkt import (
            DENSE_NORMAL_MAX,
            DENSE_NORMAL_MIN,
            make_kkt,
            make_kkt_solver,
        )

        import functools

        rng_ = np.random.default_rng(17)
        n = 20
        dims = ConeDims(zero=3, nonneg=10, soc=(5,), exp=3, pow3=(0.4, 0.6))
        m = dims.total
        assert DENSE_NORMAL_MIN <= n + m <= DENSE_NORMAL_MAX

        _, jacobian, _ = make_kkt(dims, n)
        solvers = {
            (mode, tr): jax.jit(functools.partial(
                make_kkt_solver(dims, n, cg_iters=150, kkt_mode=mode),
                transpose=tr,
            ))
            for mode in ("auto", "operator")
            for tr in (False, True)
        }

        checked = 0
        trials = 0
        while checked < 4:
            trials += 1
            assert trials < 60, "could not find well-conditioned instances"
            L = rng_.standard_normal((n, n))
            # near-identity P and small A keep cond(J) modest: CG on the
            # normal equations squares conditioning, so the f32 accuracy
            # floor is ~eps * cond(J)^2 — at cond 300 that is ~5e-3
            P = (np.eye(n) + 0.1 * (L @ L.T / n)).astype(np.float32)
            A = (rng_.standard_normal((m, n)) * 0.2).astype(np.float32)
            b = rng_.standard_normal(m).astype(np.float32)
            q = rng_.standard_normal(n).astype(np.float32)
            x = rng_.standard_normal(n).astype(np.float32)
            w = rng_.standard_normal(m).astype(np.float32)
            # keep exp/pow blocks away from their projection kinks
            w[dims.zero + dims.nonneg + 5:] *= 0.3
            rhs = rng_.standard_normal(n + m).astype(np.float32)
            J = np.asarray(jacobian(*[
                jnp.asarray(a_, jnp.float64)
                for a_ in (x, w, P, q, A, b)
            ]))
            if np.linalg.cond(J) > 300:
                continue  # see the floor comment above
            got = {}
            for (mode, transpose), solver in solvers.items():
                sol = np.asarray(solver(
                    jnp.asarray(x), jnp.asarray(w), jnp.asarray(P),
                    jnp.asarray(q), jnp.asarray(A), jnp.asarray(b),
                    jnp.asarray(rhs),
                ))
                got[(mode, transpose)] = sol
                M = J.T if transpose else J
                ref = np.linalg.solve(M, rhs.astype(np.float64))
                err = (np.abs(sol - ref).max()
                       / (1 + np.abs(ref).max()))
                assert err < 5e-2, (mode, transpose, err)
            # dense-H and operator share the factored cone-Jacobian
            # state, so the two routes must agree to f32 CG noise
            for transpose in (False, True):
                a_ = got[("auto", transpose)]
                o_ = got[("operator", transpose)]
                rel = np.abs(a_ - o_).max() / (1 + np.abs(o_).max())
                assert rel < 5e-3, (transpose, rel)
            checked += 1

    def test_polyhedral_p_diag_incomplete_stays_on_operator_path(self):
        # the LAD LP class (polyhedral cones, p_diag_full=False) must
        # keep its measured CG-on-normal-equations route even when its
        # KKT dimension falls inside the dense-normal window: solve a
        # window-sized LP layer and check the solution against f64
        import cvxpylayers_tpu as ct
        from cvxpylayers_tpu import CvxpyLayer

        n, m_rows = 12, 40  # n + (m_rows dual rows + n) lands in-window
        x = ct.Variable(n)
        Ap = ct.Parameter((m_rows, n))
        bp = ct.Parameter(m_rows)
        layer = CvxpyLayer(
            ct.Problem(ct.Minimize(ct.pnorm(Ap @ x - bp, 1)), [x >= 0]),
            parameters=[Ap, bp], variables=[x],
        )
        assert layer._p_diag_full is False
        rng_ = np.random.default_rng(5)
        Av = rng_.standard_normal((m_rows, n))
        bv = rng_.standard_normal(m_rows)
        # this LP class leans on the polish (ADMM alone stalls above
        # admm_eps here); window-sized instances need the bigger CG
        # budget to cross the f32 floor
        sargs = {"max_iters": 2000, "eps_abs": 1e-4, "eps_rel": 1e-4,
                 "cg_iters": 80, "refine_steps": 20}
        (outs32, st, _) = layer.solve_with_info(
            jnp.asarray(Av, jnp.float32), jnp.asarray(bv, jnp.float32),
            solver_args=sargs,
        )
        assert int(st) == 0
        (x64,) = layer(jnp.asarray(Av), jnp.asarray(bv))
        obj32 = np.abs(Av @ np.asarray(outs32[0]) - bv).sum()
        obj64 = np.abs(Av @ np.asarray(x64) - bv).sum()
        assert obj32 <= obj64 * (1 + 1e-3) + 1e-3


class TestPcgPolish:
    @staticmethod
    def _softmax_layer(n):
        import cvxpylayers_tpu as ct
        from cvxpylayers_tpu import CvxpyLayer

        y = ct.Variable(n, nonneg=True)
        c = ct.Parameter(n)
        layer = CvxpyLayer(
            ct.Problem(ct.Maximize(c @ y + ct.sum(ct.entr(y))),
                       [ct.sum(y) == 1]),
            parameters=[c], variables=[y],
        )
        return layer, c

    def test_softmax_f32_accuracy_at_least_cg(self):
        # kkt_mode='pcg': two-phase polish (CG kink-crossing, then ONE
        # Newton-Schulz-refined LU factor + stale-preconditioned CGNR).
        # Contract: at equal refine_steps it must solve at least as many
        # instances as plain CG on the curvature-deficient exp-cone
        # class, and its solutions must match the closed-form softmax.
        n = 16
        layer, _ = self._softmax_layer(n)
        rng_ = np.random.default_rng(2)
        B = 16
        cv = jnp.asarray(rng_.standard_normal((B, n)), jnp.float32)
        ref = np.exp(np.asarray(cv, np.float64))
        ref = ref / ref.sum(axis=1, keepdims=True)
        sargs = {"eps_abs": 1e-4, "eps_rel": 1e-4, "admm_eps_abs": 1e-3,
                 "admm_eps_rel": 1e-3, "max_iters": 300, "epoch": 100,
                 "refine_steps": 12}
        solved = {}
        for mode in ("auto", "pcg"):
            outs, st, _ = layer.solve_with_info(
                cv, solver_args={**sargs, "kkt_mode": mode}
            )
            stv = np.asarray(st)
            solved[mode] = int((stv == 0).sum())
            ys = np.asarray(outs[0], np.float64)
            err = np.abs(ys[stv == 0] - ref[stv == 0]).max()
            assert err < 5e-4, (mode, err)
        assert solved["pcg"] >= solved["auto"], solved

    def test_pcg_grads_match_f64(self):
        n = 6
        layer, _ = self._softmax_layer(n)
        rng_ = np.random.default_rng(3)
        cv64 = rng_.standard_normal(n)
        sargs = {"kkt_mode": "pcg", "max_iters": 2000,
                 "refine_steps": 12, "eps_abs": 1e-5, "eps_rel": 1e-5}

        def loss32(c_):
            return jnp.sum(layer(c_, solver_args=sargs)[0] ** 3)

        def loss64(c_):
            return jnp.sum(layer(c_)[0] ** 3)

        g32 = jax.grad(loss32)(jnp.asarray(cv64, jnp.float32))
        g64 = jax.grad(loss64)(jnp.asarray(cv64))
        np.testing.assert_allclose(np.asarray(g32, np.float64),
                                   np.asarray(g64), atol=2e-4, rtol=1e-3)


class TestPdhg:
    """Third algorithm (solve_method='pdhg'): matvec-only first-order
    conic-LP solver + the shared Newton polish. Oracles: linprog and
    the default ADMM path."""

    def test_lad_lp_matches_linprog(self):
        import cvxpylayers_tpu as ct
        from cvxpylayers_tpu import CvxpyLayer

        n_, m_ = 3, 7
        x = ct.Variable(n_, nonneg=True)
        A = ct.Parameter((m_, n_))
        b = ct.Parameter(m_)
        layer = CvxpyLayer(
            ct.Problem(ct.Minimize(ct.pnorm(A @ x - b, 1))),
            parameters=[A, b], variables=[x],
        )
        rng_ = np.random.default_rng(7)
        Av = rng_.standard_normal((m_, n_))
        bv = rng_.standard_normal(m_)
        sargs = {"solve_method": "pdhg", "max_iters": 4000}
        (xs,), st_, _ = layer.solve_with_info(
            jnp.asarray(Av), jnp.asarray(bv), solver_args=sargs
        )
        assert int(st_) == 0
        c = np.concatenate([np.zeros(n_), np.ones(m_)])
        A_ub = np.block(
            [[Av, -np.eye(m_)], [-Av, -np.eye(m_)],
             [-np.eye(n_), np.zeros((n_, m_))]]
        )
        b_ub = np.concatenate([bv, -bv, np.zeros(n_)])
        ref = scipy.optimize.linprog(c, A_ub=A_ub, b_ub=b_ub,
                                     bounds=(None, None), method="highs")
        np.testing.assert_allclose(np.asarray(xs), ref.x[:n_], atol=1e-6)

    def test_socp_grads_match_admm(self):
        import cvxpylayers_tpu as ct
        from cvxpylayers_tpu import CvxpyLayer

        n_ = 6
        w = ct.Variable(n_, nonneg=True)
        mu = ct.Parameter(n_)
        layer = CvxpyLayer(
            ct.Problem(ct.Maximize(mu @ w),
                       [ct.norm(w, 2) <= 1.0, ct.sum(w) == 1]),
            parameters=[mu], variables=[w],
        )
        rng_ = np.random.default_rng(8)
        muv = jnp.asarray(rng_.standard_normal(n_) * 0.3)

        def loss(mode):
            def f(m_):
                sargs = {"solve_method": mode, "max_iters": 4000}
                return jnp.sum(layer(m_, solver_args=sargs)[0] ** 2)
            return f

        g_admm = jax.grad(loss("admm"))(muv)
        g_pdhg = jax.grad(loss("pdhg"))(muv)
        np.testing.assert_allclose(np.asarray(g_pdhg),
                                   np.asarray(g_admm), atol=1e-5)

    def test_infeasible_status(self):
        import cvxpylayers_tpu as ct
        from cvxpylayers_tpu import CvxpyLayer

        x = ct.Variable(1)
        lo = ct.Parameter(1)
        layer = CvxpyLayer(
            ct.Problem(ct.Minimize(ct.sum(x)), [x >= lo, x <= -1.0]),
            parameters=[lo], variables=[x],
        )
        _, st_, _ = layer.solve_with_info(
            jnp.asarray([1.0]),
            solver_args={"solve_method": "pdhg", "max_iters": 4000},
        )
        assert int(st_) == PRIMAL_INFEASIBLE

    def test_quadratic_objective_raises(self):
        import cvxpylayers_tpu as ct
        from cvxpylayers_tpu import CvxpyLayer

        x = ct.Variable(2)
        t = ct.Parameter(2)
        layer = CvxpyLayer(
            ct.Problem(ct.Minimize(ct.sum_squares(x - t)), [x >= 0]),
            parameters=[t], variables=[x],
        )
        with pytest.raises(ValueError, match="pdhg"):
            layer(jnp.asarray([1.0, 2.0]),
                  solver_args={"solve_method": "pdhg"})


class TestIpmHsde:
    """Homogeneous self-dual embedding (ipm_mode): the BASELINE north
    star formulation, auto-selected for problems with no quadratic
    objective. Oracle: the primal-dual IPM and closed forms."""

    @staticmethod
    def _socp_layer(n=10, k=3):
        import cvxpylayers_tpu as ct
        from cvxpylayers_tpu import CvxpyLayer

        w = ct.Variable(n, nonneg=True)
        mu = ct.Parameter(n)
        F = ct.Parameter((k, n))
        prob = ct.Problem(ct.Maximize(mu @ w),
                          [ct.norm(F @ w, 2) <= 0.25, ct.sum(w) == 1])
        return CvxpyLayer(prob, parameters=[mu, F], variables=[w])

    def test_socp_matches_pd_f64(self):
        layer = self._socp_layer()
        rng_ = np.random.default_rng(4)
        muv = rng_.standard_normal(10) * 0.1
        Fv = rng_.standard_normal((3, 10)) / np.sqrt(10)
        outs = {}
        for mode in ("pd", "hsde"):
            o, st_, _ = layer.solve_with_info(
                jnp.asarray(muv), jnp.asarray(Fv),
                solver_args={"solve_method": "ipm", "ipm_mode": mode},
            )
            assert int(st_) == 0, mode
            outs[mode] = np.asarray(o[0])
        np.testing.assert_allclose(outs["hsde"], outs["pd"], atol=1e-6)

    def test_f32_objective_beats_pd_raw(self):
        # measured r3 motivation: raw f32 (refine_steps=0) objective
        # error vs the f64 solution — hsde ~6e-6 vs pd ~4e-4 on this
        # class (the embedding measures residuals against tau-scaled
        # data, so the floor is the homogeneous system's, not the
        # problem scaling's)
        layer = self._socp_layer()
        rng_ = np.random.default_rng(5)
        B = 8
        muv = rng_.standard_normal((B, 10)) * 0.1
        Fv = rng_.standard_normal((B, 3, 10)) / np.sqrt(10)
        (w64,), st64, _ = layer.solve_with_info(
            jnp.asarray(muv), jnp.asarray(Fv),
            solver_args={"solve_method": "ipm"},
        )
        obj64 = np.einsum("bi,bi->b", muv, np.asarray(w64))
        errs = {}
        for mode in ("pd", "hsde"):
            (w32,), _, _ = layer.solve_with_info(
                jnp.asarray(muv, jnp.float32), jnp.asarray(Fv, jnp.float32),
                solver_args={"solve_method": "ipm", "ipm_mode": mode,
                             "refine_steps": 0, "eps_abs": 1e-5},
            )
            o32 = np.einsum("bi,bi->b", muv, np.asarray(w32, np.float64))
            errs[mode] = np.median(np.abs(o32 - obj64))
        # per-instance noise swings either way; the batch median must be
        # comparable-or-better, and both raw floors well under the
        # polish basin
        assert errs["hsde"] <= max(1.5 * errs["pd"], 1e-4), errs
        assert errs["hsde"] < 5e-4, errs

    def test_infeasible_and_unbounded_certificates(self):
        import cvxpylayers_tpu as ct
        from cvxpylayers_tpu import CvxpyLayer

        x = ct.Variable(1)
        lo = ct.Parameter(1)
        li = CvxpyLayer(
            ct.Problem(ct.Minimize(ct.sum(x)), [x >= lo, x <= -1.0]),
            parameters=[lo], variables=[x],
        )
        _, st_, _ = li.solve_with_info(
            jnp.asarray([1.0]),
            solver_args={"solve_method": "ipm", "ipm_mode": "hsde",
                         "refine_steps": 0},
        )
        assert int(st_) == PRIMAL_INFEASIBLE
        cu = ct.Parameter(1)
        xu = ct.Variable(1)
        lu = CvxpyLayer(
            ct.Problem(ct.Minimize(cu @ xu), [xu <= 5.0]),
            parameters=[cu], variables=[xu],
        )
        _, st_, _ = lu.solve_with_info(
            jnp.asarray([1.0]),
            solver_args={"solve_method": "ipm", "ipm_mode": "hsde",
                         "refine_steps": 0},
        )
        assert int(st_) == DUAL_INFEASIBLE

    def test_hsde_forced_on_quadratic_raises(self):
        import cvxpylayers_tpu as ct
        from cvxpylayers_tpu import CvxpyLayer

        x = ct.Variable(3)
        t = ct.Parameter(3)
        layer = CvxpyLayer(
            ct.Problem(ct.Minimize(ct.sum_squares(x - t)), [x >= 0]),
            parameters=[t], variables=[x],
        )
        with pytest.raises(ValueError, match="hsde"):
            layer(jnp.asarray([1.0, 2.0, 3.0]),
                  solver_args={"solve_method": "ipm", "ipm_mode": "hsde"})

    def test_warm_start_iteration_drop(self):
        layer = self._socp_layer()
        rng_ = np.random.default_rng(6)
        muv = jnp.asarray(rng_.standard_normal((1, 10)) * 0.1)
        Fv = jnp.asarray(rng_.standard_normal((1, 3, 10)) / np.sqrt(10))
        sargs = {"solve_method": "ipm", "ipm_mode": "hsde"}
        outs, ws, st_, it0 = layer.solve_and_state(muv, Fv,
                                                   solver_args=sargs)
        assert int(np.asarray(st_)[0]) == 0
        outs2, _, st2, it1 = layer.solve_and_state(
            muv, Fv, warm_start=ws, solver_args=sargs
        )
        assert int(np.asarray(st2)[0]) == 0
        np.testing.assert_allclose(np.asarray(outs2[0]),
                                   np.asarray(outs[0]), atol=1e-6)


class TestIpmF32:
    def test_condensed_kkt_exp_cone_f32(self):
        # f32 IPM with the condensed-Cholesky KKT solves exp-cone
        # problems to ~1e-7 (TPU-representative precision path)
        import cvxpylayers_tpu as ct
        from cvxpylayers_tpu import CvxpyLayer

        n = 16
        y = ct.Variable(n, nonneg=True)
        c = ct.Parameter(n)
        sm = CvxpyLayer(
            ct.Problem(ct.Maximize(c @ y + ct.sum(ct.entr(y))),
                       [ct.sum(y) == 1]),
            parameters=[c], variables=[y],
        )
        cv = jnp.asarray(rng.standard_normal((4, n)), jnp.float32)
        outs, st, it = sm.solve_with_info(
            cv, solver_args={"solve_method": "ipm", "eps_abs": 1e-5,
                             "eps_rel": 1e-5, "refine_steps": 10},
        )
        assert (np.asarray(st) == 0).all()
        ref = np.exp(np.asarray(cv, np.float64))
        ref /= ref.sum(axis=1, keepdims=True)
        err = np.abs(np.asarray(outs[0], np.float64) - ref).max()
        assert err < 1e-5, err

    def test_box_qp_f32(self):
        import cvxpylayers_tpu as ct
        from cvxpylayers_tpu import CvxpyLayer

        n = 10
        x = ct.Variable(n)
        v = ct.Parameter(n)
        layer = CvxpyLayer(
            ct.Problem(ct.Minimize(ct.sum_squares(x - v)),
                       [x >= 0, x <= 1]),
            parameters=[v], variables=[x],
        )
        vv = jnp.asarray(rng.standard_normal(n) * 2, jnp.float32)
        outs, st, it = layer.solve_with_info(
            vv, solver_args={"solve_method": "ipm", "eps_abs": 1e-5,
                             "eps_rel": 1e-5},
        )
        assert int(st) == 0
        np.testing.assert_allclose(
            np.asarray(outs[0], np.float64),
            np.clip(np.asarray(vv, np.float64), 0, 1), atol=1e-5,
        )

    def test_socp_boundary_f32_regression(self):
        # regression (r2): f32 IPM on random inequality-form SOCPs used
        # to step OUTSIDE the cone near a weakly-active boundary (the
        # f32 ratio tests overshoot), wedging the NT scalings — iterates
        # diverged to ~1e10 at MAX_ITERS.  The fixes under test: strict-
        # interior step acceptance with backtracking, ds from the
        # third-row residual identity (not T @ dz), best-iterate
        # tracking, and the stall cutoff.  The polished f32 result must
        # track the polished f64 result and stop in far fewer than
        # ipm_max_iters iterations.
        from cvxpylayers_tpu.solver.ipm import make_ipm_solver

        n, msoc = 20, 6
        dims = ConeDims(zero=0, nonneg=0, soc=[msoc], exp=0, psd=[],
                        pow3=[])
        for trial in range(4):
            r = np.random.default_rng(trial)
            A = r.standard_normal((msoc, n))
            b = r.standard_normal(msoc)
            c = r.standard_normal(n) * 3.0
            P = np.eye(n)
            out = {}
            for dt, eps in ((jnp.float64, 1e-10), (jnp.float32, 1e-7)):
                st = SolverSettings(eps_abs=eps, solve_method="ipm")
                pol = make_polished_solver(
                    dims, n, st, base=make_ipm_solver(dims, n, st)
                )
                res = pol(jnp.asarray(P, dt), jnp.asarray(c, dt),
                          jnp.asarray(A, dt), jnp.asarray(b, dt),
                          None, None, None)
                out[dt] = (np.asarray(res.x, np.float64), int(res.iters))
            err = np.max(np.abs(out[jnp.float32][0] - out[jnp.float64][0]))
            assert err < 1e-4, (trial, err)
            assert out[jnp.float32][1] <= 40, (trial, out[jnp.float32][1])


class TestSpectralKktMode:
    def test_softmax_f32_solved_fraction(self):
        # kkt_mode="spectral": exact spectral-Schur Newton directions.
        # On the entropy/softmax class in f32 the default CG-on-normal-
        # equations path leaves ~30% of instances short of eps at this
        # budget (squared conditioning with P = 0); the spectral solve
        # reaches err ~1e-7 on every instance.
        import cvxpylayers_tpu as ct
        from cvxpylayers_tpu import CvxpyLayer

        n, B = 16, 32
        y = ct.Variable(n, nonneg=True)
        c = ct.Parameter(n)
        sm = CvxpyLayer(
            ct.Problem(ct.Maximize(c @ y + ct.sum(ct.entr(y))),
                       [ct.sum(y) == 1]),
            parameters=[c], variables=[y],
        )
        r = np.random.default_rng(0)
        cv = jnp.asarray(r.standard_normal((B, n)), jnp.float32)
        sa = {"eps_abs": 1e-4, "eps_rel": 1e-4, "admm_eps_abs": 1e-3,
              "admm_eps_rel": 1e-3, "epoch": 100, "max_iters": 300,
              "refine_steps": 20, "kkt_mode": "spectral"}
        outs, st, _ = sm.solve_with_info(cv, solver_args=sa)
        assert float((np.asarray(st) == 0).mean()) == 1.0
        ref = np.exp(np.asarray(cv, np.float64))
        ref /= ref.sum(axis=1, keepdims=True)
        err = np.abs(np.asarray(outs[0], np.float64) - ref).max()
        assert err < 1e-5, err

    def test_gradients_match_cg_path(self):
        # both KKT modes must deliver the same implicit gradients
        import cvxpylayers_tpu as ct
        from cvxpylayers_tpu import CvxpyLayer

        n = 6
        y = ct.Variable(n, nonneg=True)
        c = ct.Parameter(n)
        sm = CvxpyLayer(
            ct.Problem(ct.Maximize(c @ y + ct.sum(ct.entr(y))),
                       [ct.sum(y) == 1]),
            parameters=[c], variables=[y],
        )
        cv = jnp.asarray(np.random.default_rng(1).standard_normal(n),
                         jnp.float32)
        grads = {}
        for mode in ("auto", "spectral"):
            sa = {"eps_abs": 1e-5, "eps_rel": 1e-5, "refine_steps": 15,
                  "kkt_mode": mode}

            def loss(c_):
                (ys,) = sm(c_, solver_args=sa)
                return jnp.sum(ys ** 2)

            grads[mode] = np.asarray(jax.grad(loss)(cv), np.float64)
        np.testing.assert_allclose(grads["spectral"], grads["auto"],
                                   atol=2e-4)

    def test_invalid_mode_rejected(self):
        import cvxpylayers_tpu as ct
        from cvxpylayers_tpu import CvxpyLayer

        y = ct.Variable(2)
        c = ct.Parameter(2)
        layer = CvxpyLayer(
            ct.Problem(ct.Minimize(ct.sum_squares(y - c))),
            parameters=[c], variables=[y],
        )
        with pytest.raises(ValueError, match="kkt_mode"):
            layer(jnp.zeros(2), solver_args={"kkt_mode": "bogus"})


class TestIpmEps:
    """ipm_eps (internal IPM target, like admm_eps for ADMM): a tighter
    internal target than the final eps lands the polish INSIDE its basin
    on degenerate instances (the r3 Markowitz-bench fix). Contract: more
    central-path iterations, solution at least as accurate, and the
    solver_args alias `ipm_eps` maps to ipm_eps_abs."""

    def test_tighter_target_runs_longer_and_stays_correct(self):
        import cvxpylayers_tpu as ct
        from cvxpylayers_tpu import CvxpyLayer

        n_, k_ = 10, 3
        w = ct.Variable(n_, nonneg=True)
        mu = ct.Parameter(n_)
        F = ct.Parameter((k_, n_))
        layer = CvxpyLayer(
            ct.Problem(ct.Maximize(mu @ w),
                       [ct.norm(F @ w, 2) <= 0.25, ct.sum(w) == 1]),
            parameters=[mu, F], variables=[w],
        )
        rng_ = np.random.default_rng(13)
        muv = jnp.asarray(rng_.standard_normal(n_) * 0.1)
        Fv = jnp.asarray(rng_.standard_normal((k_, n_)) / np.sqrt(n_))
        base = {"solve_method": "ipm", "eps_abs": 1e-4, "eps_rel": 1e-4}
        (w_loose,), st_l, it_l = layer.solve_with_info(
            muv, Fv, solver_args=base)
        tight = dict(base, ipm_eps=1e-8)
        (w_tight,), st_t, it_t = layer.solve_with_info(
            muv, Fv, solver_args=tight)
        assert int(st_l) == 0 and int(st_t) == 0
        assert int(it_t) > int(it_l)
        # both polish to the same solution
        np.testing.assert_allclose(np.asarray(w_tight),
                                   np.asarray(w_loose), atol=1e-6)

    def test_zero_means_use_eps(self):
        from cvxpylayers_tpu.solver.settings import SolverSettings

        s = SolverSettings()
        assert s.ipm_eps_abs == 0.0  # default: track eps_abs


class TestAndersonAcceleration:
    """accel_lookback / acceleration_lookback (the SCS knob): type-II
    Anderson acceleration of the ADMM fixed-point map, off by default.
    Contract: same solutions, fewer iterations on iteration-hungry LPs
    (measured: LAD mean iterations 230 -> 94 at L=3 on CPU f32).
    NOT enabled in the TPU bench configs — under vmap the while_loop
    runs to the slowest lane, and on TPU f32 the mixing hurt the
    degenerate tail (measured solved 1.0 -> 0.98)."""

    def _lad(self):
        import cvxpylayers_tpu as ct

        n_, m_ = 2, 3
        x = ct.Variable(n_, nonneg=True)
        A = ct.Parameter((m_, n_))
        b = ct.Parameter(m_)
        return ct.CvxpyLayer(
            ct.Problem(ct.Minimize(0.5 * ct.pnorm(A @ x - b, 1))),
            parameters=[A, b], variables=[x],
        ), (n_, m_)

    def test_same_solution_fewer_iterations(self):
        layer, (n_, m_) = self._lad()
        rng_ = np.random.default_rng(29)
        B = 64
        Av = jnp.asarray(rng_.standard_normal((B, m_, n_)))
        bv = jnp.asarray(rng_.standard_normal((B, m_)))
        base = {"eps_abs": 1e-6, "eps_rel": 1e-6, "admm_eps_abs": 1e-6,
                "admm_eps_rel": 1e-6, "max_iters": 4000, "epoch": 50}
        (x0,), st0, it0 = layer.solve_with_info(Av, bv, solver_args=base)
        acc = dict(base, acceleration_lookback=3)
        (x1,), st1, it1 = layer.solve_with_info(Av, bv, solver_args=acc)
        assert np.asarray(st0).max() == 0 and np.asarray(st1).max() == 0
        np.testing.assert_allclose(np.asarray(x1), np.asarray(x0),
                                   atol=1e-5)
        # acceleration must cut the aggregate iteration count
        assert np.asarray(it1).mean() < 0.75 * np.asarray(it0).mean()

    def test_alias_and_gradients(self):
        layer, (n_, m_) = self._lad()
        rng_ = np.random.default_rng(31)
        Av = jnp.asarray(rng_.standard_normal((m_, n_)))
        bv = jnp.asarray(rng_.standard_normal(m_))

        def loss(sa):
            def f(A_):
                return jnp.sum(layer(A_, bv, solver_args=sa)[0] ** 2)
            return f

        g0 = jax.grad(loss({}))(Av)
        g1 = jax.grad(loss({"accel_lookback": 3}))(Av)
        g2 = jax.grad(loss({"acceleration_lookback": 3}))(Av)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                                   atol=0)
