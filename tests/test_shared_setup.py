"""Constant-P/A setup/solve split (solver/shared.py + layer routing).

Mirrors the reference's constant-data tests (the Moreau PA_is_constant
detection matrix, /root/reference/tests/test_moreau.py:1859-1891, and
setup-once-across-batch-sizes, :1731-1851): detection from the stuffed
program, route equivalence against the vmapped per-instance solver
(same solutions, statuses, gradients), warm starts, and the
explicit on/off/auto knob."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cvxpylayers_tpu as ct
from cvxpylayers_tpu import CvxpyLayer

rng = np.random.default_rng(3)

ARGS = {"eps_abs": 1e-7, "eps_rel": 1e-7, "admm_eps_abs": 1e-5,
        "admm_eps_rel": 1e-5, "max_iters": 2000, "epoch": 50,
        "refine_steps": 8}


def softmax_layer(n=6):
    """Linear objective (parametric q), constant A/b — the motivating
    class (bench softmax_duals: only the objective is parametric)."""
    y = ct.Variable(n, nonneg=True)
    c = ct.Parameter(n)
    con = ct.sum(y) == 1
    prob = ct.Problem(ct.Maximize(c @ y + ct.sum(ct.entr(y))), [con])
    return CvxpyLayer(prob, parameters=[c],
                      variables=[y, con.dual_variables[0]])


def qp_const_A_layer(n=5):
    """Quadratic objective with constant P AND constant A; parametric
    q only."""
    x = ct.Variable(n)
    v = ct.Parameter(n)
    prob = ct.Problem(ct.Minimize(ct.sum_squares(x) - 2.0 * (v @ x)),
                      [x >= 0, ct.sum(x) <= 2])
    return CvxpyLayer(prob, parameters=[v], variables=[x])


class TestDetection:
    """Detection matrix — parametric P/A/q/b combinations (reference
    tests/test_moreau.py:1859-1891)."""

    def _flags(self, layer):
        return (layer.prog.P_is_constant, layer.prog.A_is_constant,
                layer._pa_constant)

    def test_all_constant_but_q(self):
        layer = qp_const_A_layer()
        assert self._flags(layer) == (True, True, True)

    def test_parametric_A(self):
        n = 4
        x = ct.Variable(n)
        G = ct.Parameter((2, n))
        v = ct.Parameter(n)
        prob = ct.Problem(ct.Minimize(ct.sum_squares(x - v)),
                          [G @ x <= 1.0])
        layer = CvxpyLayer(prob, parameters=[G, v], variables=[x])
        assert layer.prog.P_is_constant
        assert not layer.prog.A_is_constant
        assert not layer._pa_constant

    def test_parametric_P(self):
        # quad_form with parametric PSD P -> P parametric, A constant
        n = 3
        x = ct.Variable(n)
        Psq = ct.Parameter((n, n), PSD=True)
        prob = ct.Problem(ct.Minimize(ct.quad_form(x, Psq)
                                      - 2.0 * ct.sum(x)), [x >= 0])
        layer = CvxpyLayer(prob, parameters=[Psq], variables=[x])
        assert not layer.prog.P_is_constant
        assert not layer._pa_constant

    def test_parametric_b_still_shared(self):
        # b parametric does NOT break the shared factor (only P/A do)
        n = 4
        x = ct.Variable(n)
        t = ct.Parameter(n)
        u = ct.Parameter()
        prob = ct.Problem(ct.Minimize(ct.sum_squares(x - t)),
                          [ct.sum(x) == u])
        layer = CvxpyLayer(prob, parameters=[t, u], variables=[x])
        assert layer.prog.A_is_constant
        assert layer.prog.P_is_constant
        assert layer._pa_constant

    def test_constant_matrices_match_assembly(self):
        layer = qp_const_A_layer()
        prog = layer.prog
        p_ext = jnp.asarray(
            np.concatenate([rng.standard_normal(prog.n_param), [1.0]])
        )
        P_ref, _q, A_ref, _b = layer._assemble(p_ext)[:4]
        np.testing.assert_allclose(prog.constant_P(), np.asarray(P_ref),
                                   atol=1e-12)
        np.testing.assert_allclose(prog.constant_A(), np.asarray(A_ref),
                                   atol=1e-12)


class TestRouteEquivalence:
    def _compare(self, layer, params, atol=1e-6):
        on = dict(ARGS, shared_setup="on")
        off = dict(ARGS, shared_setup="off")
        outs_s, st_s, _ = layer.solve_with_info(*params, solver_args=on)
        outs_v, st_v, _ = layer.solve_with_info(*params, solver_args=off)
        assert np.all(np.asarray(st_s) == 0), np.asarray(st_s)
        assert np.all(np.asarray(st_v) == 0)
        for a, b in zip(outs_s, outs_v):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=atol)
        return on, off

    def test_softmax_solutions_match(self):
        layer = softmax_layer()
        params = (jnp.asarray(rng.standard_normal((8, 6))),)
        self._compare(layer, params)

    def test_qp_solutions_match(self):
        layer = qp_const_A_layer()
        params = (jnp.asarray(rng.standard_normal((8, 5))),)
        self._compare(layer, params)

    def test_parametric_b_solutions_match(self):
        n = 4
        x = ct.Variable(n)
        t = ct.Parameter(n)
        u = ct.Parameter()
        prob = ct.Problem(ct.Minimize(ct.sum_squares(x - t)),
                          [ct.sum(x) == u])
        layer = CvxpyLayer(prob, parameters=[t, u], variables=[x])
        params = (jnp.asarray(rng.standard_normal((6, n))),
                  jnp.asarray(rng.uniform(0.5, 2.0, (6,))))
        self._compare(layer, params)

    def test_gradients_match(self):
        layer = qp_const_A_layer()
        params = (jnp.asarray(rng.standard_normal((6, 5))),)

        def loss(v, sargs):
            (x,) = layer(v, solver_args=sargs)
            return jnp.sum(x ** 2)

        g_s = jax.grad(lambda v: loss(v, dict(ARGS, shared_setup="on"))
                       )(*params)
        g_v = jax.grad(lambda v: loss(v, dict(ARGS, shared_setup="off"))
                       )(*params)
        np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_v),
                                   atol=1e-5)

    def test_gradcheck_fd(self):
        layer = softmax_layer(n=4)
        v = jnp.asarray(rng.standard_normal((2, 4)))

        def loss(v_):
            y, _nu = layer(v_, solver_args=dict(ARGS, shared_setup="on"))
            return jnp.sum(y ** 2)

        g = jax.grad(loss)(v)
        eps = 1e-5
        for idx in [(0, 0), (1, 2)]:
            e = np.zeros(v.shape)
            e[idx] = eps
            fd = (loss(v + e) - loss(v - e)) / (2 * eps)
            np.testing.assert_allclose(float(g[idx]), float(fd),
                                       atol=1e-3, rtol=1e-3)

    def test_under_jit_and_warmstart(self):
        layer = qp_const_A_layer()
        v = jnp.asarray(rng.standard_normal((4, 5)))
        on = dict(ARGS, shared_setup="on")

        @jax.jit
        def solve2(v_):
            outs, ws, st, it0 = layer.solve_and_state(
                v_, solver_args=on
            )
            outs2, _, st2, it1 = layer.solve_and_state(
                v_, warm_start=ws, solver_args=on
            )
            return outs[0], outs2[0], st, st2, it0, it1

        x1, x2, st, st2, it0, it1 = solve2(v)
        assert np.all(np.asarray(st) == 0)
        assert np.all(np.asarray(st2) == 0)
        np.testing.assert_allclose(np.asarray(x1), np.asarray(x2),
                                   atol=1e-6)
        # warm start drops iterations (reference warm-start contract)
        assert np.all(np.asarray(it1) <= np.asarray(it0))

    def test_infeasible_certified_by_shared_phase(self):
        n = 3
        x = ct.Variable(n, nonneg=True)
        t = ct.Parameter(n)
        # sum(x) <= -1 with x >= 0: primal infeasible
        prob = ct.Problem(ct.Minimize(t @ x), [ct.sum(x) <= -1.0])
        layer = CvxpyLayer(prob, parameters=[t], variables=[x])
        assert layer._pa_constant
        _, st, _ = layer.solve_with_info(
            jnp.asarray(np.ones((2, n))),
            solver_args=dict(ARGS, shared_setup="on"),
        )
        assert np.all(np.asarray(st) == 2)


class TestRescueOverShared:
    def test_rescue_composes_with_shared_route(self):
        # the softmax bench config's shape: fast solve through the
        # shared-factor route, failed lanes rescued by a deeper-polish
        # pass — both inside one trace (used by bench softmax_duals)
        from cvxpylayers_tpu import solve_with_rescue

        layer = softmax_layer()
        params = (jnp.asarray(rng.standard_normal((8, 6))),)
        starved = dict(ARGS, shared_setup="on", max_iters=1, epoch=1,
                       refine_steps=0)
        good = dict(ARGS, shared_setup="on")
        outs, st, _ = solve_with_rescue(
            layer, *params, solver_args=starved, rescue_args=good,
            capacity=8,
        )
        assert np.all(np.asarray(st) == 0)
        ref, st2, _ = layer.solve_with_info(*params, solver_args=good)
        np.testing.assert_allclose(np.asarray(outs[0]),
                                   np.asarray(ref[0]), atol=1e-6)

        def loss(v):
            o, _, _ = solve_with_rescue(
                layer, v, solver_args=starved, rescue_args=good,
                capacity=8,
            )
            return jnp.sum(o[0] ** 2)

        g = jax.grad(loss)(*params)
        g_ref = jax.grad(
            lambda v: jnp.sum(layer(v, solver_args=good)[0] ** 2)
        )(*params)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   atol=1e-5)


class TestKnob:
    def test_on_rejected_when_parametric_A(self):
        n = 4
        x = ct.Variable(n)
        G = ct.Parameter((2, n))
        v = ct.Parameter(n)
        prob = ct.Problem(ct.Minimize(ct.sum_squares(x - v)),
                          [G @ x <= 1.0])
        layer = CvxpyLayer(prob, parameters=[G, v], variables=[x])
        with pytest.raises(ValueError, match="shared_setup"):
            layer(jnp.asarray(rng.standard_normal((2, n)) * 0.1),
                  jnp.asarray(rng.standard_normal(n)),
                  solver_args=dict(ARGS, shared_setup="on"))

    def test_invalid_value_rejected(self):
        layer = qp_const_A_layer()
        with pytest.raises(ValueError, match="shared_setup"):
            layer(jnp.zeros(5),
                  solver_args=dict(ARGS, shared_setup="maybe"))

    def test_auto_routes_shared(self):
        layer = qp_const_A_layer()
        from cvxpylayers_tpu.layer.cvxpylayer import _settings_from_args

        st = _settings_from_args(layer._base_settings, ARGS)
        assert layer._use_shared(st)
        st_off = _settings_from_args(
            layer._base_settings, dict(ARGS, shared_setup="off")
        )
        assert not layer._use_shared(st_off)
