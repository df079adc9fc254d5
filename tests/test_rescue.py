"""solve_with_rescue: two-phase fast-route + accurate-rescue solves.

Oracle strategy (SURVEY section 4 style): the rescued output of a failed
lane must equal the accurate route's direct solve of that instance; the
statuses/iters bookkeeping and the capacity semantics are contracts;
gradients through the combined path must match the single-route
gradients lane by lane (both solves carry the same custom_vjp)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cvxpylayers_tpu as ct
from cvxpylayers_tpu import CvxpyLayer, solve_with_rescue

rng = np.random.default_rng(11)

GOOD = {"eps_abs": 1e-7, "eps_rel": 1e-7, "max_iters": 200, "epoch": 50,
        "refine_steps": 6}
# one ADMM iteration + no polish at a 1e-7 target: every instance fails
BAD = {"eps_abs": 1e-7, "eps_rel": 1e-7, "max_iters": 1, "epoch": 1,
       "refine_steps": 0}


def box_qp_layer(n=4, m_ineq=3):
    x = ct.Variable(n)
    v = ct.Parameter(n)
    G = ct.Parameter((m_ineq, n))
    h = ct.Parameter(m_ineq)
    prob = ct.Problem(
        ct.Minimize(ct.sum_squares(x - v)),
        [G @ x <= h, x >= 0, x <= 1],
    )
    return CvxpyLayer(prob, parameters=[v, G, h], variables=[x]), (n, m_ineq)


def qp_batch(B, n=4, m_ineq=3):
    return (
        jnp.asarray(rng.standard_normal((B, n))),
        jnp.asarray(rng.standard_normal((B, m_ineq, n)) * 0.3),
        jnp.asarray(np.abs(rng.standard_normal((B, m_ineq))) + 1.0),
    )


class TestRescueRouting:
    def test_noop_when_all_solved(self):
        layer, _ = box_qp_layer()
        params = qp_batch(6)
        outs, st, _ = solve_with_rescue(
            layer, *params, solver_args=GOOD, rescue_args=GOOD, capacity=4
        )
        (ref,) = layer(*params, solver_args=GOOD)
        assert np.all(np.asarray(st) == 0)
        np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(ref),
                                   atol=1e-9)

    def test_failed_lanes_match_accurate_route(self):
        layer, _ = box_qp_layer()
        B = 6
        params = qp_batch(B)
        # fast route fails everywhere; full capacity rescues every lane
        outs, st, it = solve_with_rescue(
            layer, *params, solver_args=BAD, rescue_args=GOOD, capacity=B
        )
        assert np.all(np.asarray(st) == 0)
        (ref,) = layer(*params, solver_args=GOOD)
        np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(ref),
                                   atol=1e-8)
        # iters carries fast + rescue counts
        _, _, it_bad = layer.solve_with_info(*params, solver_args=BAD)
        assert np.all(np.asarray(it) > np.asarray(it_bad))

    def test_capacity_bounds_the_rescue(self):
        layer, _ = box_qp_layer()
        B, cap = 8, 3
        params = qp_batch(B)
        _, st_bad, _ = layer.solve_with_info(*params, solver_args=BAD)
        n_failed = int((np.asarray(st_bad) != 0).sum())
        assert n_failed == B  # the crippled config fails every lane
        outs, st, _ = solve_with_rescue(
            layer, *params, solver_args=BAD, rescue_args=GOOD, capacity=cap
        )
        st = np.asarray(st)
        assert (st == 0).sum() == cap  # exactly `capacity` lanes rescued
        assert (st != 0).sum() == B - cap  # the rest keep honest failures

    def test_under_jit(self):
        layer, _ = box_qp_layer()
        B = 5
        params = qp_batch(B)

        @jax.jit
        def f(*ps):
            outs, st, _ = solve_with_rescue(
                layer, *ps, solver_args=BAD, rescue_args=GOOD, capacity=B
            )
            return outs[0], st

        x, st = f(*params)
        (ref,) = layer(*params, solver_args=GOOD)
        assert np.all(np.asarray(st) == 0)
        np.testing.assert_allclose(np.asarray(x), np.asarray(ref), atol=1e-8)

    def test_warm_start_rescue_smoke(self):
        layer, _ = box_qp_layer()
        B = 4
        params = qp_batch(B)
        outs, st, _ = solve_with_rescue(
            layer, *params, solver_args=BAD, rescue_args=GOOD, capacity=B,
            warm_start_rescue=True,
        )
        (ref,) = layer(*params, solver_args=GOOD)
        assert np.all(np.asarray(st) == 0)
        np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(ref),
                                   atol=1e-7)

    def test_warm_rescue_saves_iterations(self):
        # the warm-started rescue CONTINUES the fast route's ADMM from
        # its terminal iterates instead of redoing them cold — on
        # MAX_ITERS lanes (the rescuable kind) the rescue stage's added
        # iterations must be strictly fewer than the cold stage's (the
        # softmax bench lever, +6.3% measured on v5e)
        layer, _ = box_qp_layer()
        B = 4
        params = qp_batch(B)

        # fast route does real work (60 iters) but stops short of the
        # 1e-7 no-polish target; epoch 10 keeps the rescue's iteration
        # count finely quantized so the warm saving is visible
        fast = {"eps_abs": 1e-7, "eps_rel": 1e-7, "max_iters": 60,
                "epoch": 10, "refine_steps": 0}
        acc = {"eps_abs": 1e-7, "eps_rel": 1e-7, "max_iters": 2000,
               "epoch": 10, "refine_steps": 6}

        def total_iters(warm):
            _, st, it = solve_with_rescue(
                layer, *params, solver_args=fast, rescue_args=acc,
                capacity=B, warm_start_rescue=warm,
            )
            assert np.all(np.asarray(st) == 0)
            return int(np.asarray(it).sum())

        assert total_iters(True) < total_iters(False)

    def test_max_iters_ranked_above_infeasible(self):
        # when failures exceed capacity, the budget goes to MAX_ITERS
        # lanes (rescuable) before infeasible verdicts (which the
        # accurate route would only re-confirm) — ADVICE r3
        layer, (n, m_ineq) = box_qp_layer()
        B = 6
        vs = rng.standard_normal((B, n))
        Gs = rng.standard_normal((B, m_ineq, n)) * 0.3
        hs = np.abs(rng.standard_normal((B, m_ineq))) + 1.0
        Gs[1] = np.ones((m_ineq, n))
        hs[1] = -1.0  # lane 1: sum(x) <= -1 with x >= 0 is infeasible
        params = (jnp.asarray(vs), jnp.asarray(Gs), jnp.asarray(hs))
        fast = {"eps_abs": 1e-7, "eps_rel": 1e-7, "max_iters": 100,
                "epoch": 25, "refine_steps": 0}
        _, st_fast, _ = layer.solve_with_info(*params, solver_args=fast)
        st_fast = np.asarray(st_fast)
        assert st_fast[1] == 2  # primal-infeasible certificate fired
        n_maxit = int((st_fast == 1).sum())
        assert n_maxit >= 3  # enough MAX_ITERS lanes to exceed capacity
        cap = 2
        _, st, _ = solve_with_rescue(
            layer, *params, solver_args=fast, rescue_args=GOOD,
            capacity=cap,
        )
        st = np.asarray(st)
        assert st[1] == 2  # infeasible lane untouched (kept its verdict)
        # exactly `cap` former MAX_ITERS lanes were rescued to SOLVED
        assert int(((st_fast == 1) & (st == 0)).sum()) == cap

    def test_rescue_ladder_stages(self):
        # r5: rescue_args may be a LIST of stages; stage 2 re-solves
        # only what stage 1 left unsolved. Stage 1 here is as crippled
        # as the fast route, so only the stage-2 (GOOD) config can
        # rescue — every lane must still end SOLVED, proving the
        # second tier executes and combines correctly.
        layer, _ = box_qp_layer()
        B = 5
        params = qp_batch(B)
        outs, st, _ = solve_with_rescue(
            layer, *params, solver_args=BAD,
            rescue_args=[dict(BAD), GOOD], capacity=B,
        )
        assert np.all(np.asarray(st) == 0)
        (ref,) = layer(*params, solver_args=GOOD)
        np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(ref),
                                   atol=1e-8)

    def test_unbatched_call_rejected(self):
        layer, _ = box_qp_layer()
        params = tuple(p[0] for p in qp_batch(1))
        with pytest.raises(ValueError, match="batched"):
            solve_with_rescue(layer, *params, solver_args=GOOD,
                              rescue_args=GOOD)


class TestRescueGradients:
    def test_gradients_match_single_route(self):
        # all lanes rescued -> gradients must equal the accurate route's
        layer, _ = box_qp_layer()
        B = 4
        params = qp_batch(B)

        def loss_rescued(*ps):
            outs, _, _ = solve_with_rescue(
                layer, *ps, solver_args=BAD, rescue_args=GOOD, capacity=B
            )
            return jnp.sum(outs[0] ** 2)

        def loss_direct(*ps):
            (x,) = layer(*ps, solver_args=GOOD)
            return jnp.sum(x ** 2)

        g_r = jax.grad(loss_rescued, argnums=(0, 1, 2))(*params)
        g_d = jax.grad(loss_direct, argnums=(0, 1, 2))(*params)
        for a, b in zip(g_r, g_d):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)

    def test_partial_rescue_gradients_split_by_route(self):
        # capacity < failures: rescued lanes carry accurate-route grads,
        # unrescued lanes carry fast-route grads (per-lane separable loss)
        layer, _ = box_qp_layer()
        B, cap = 6, 2
        params = qp_batch(B)

        def loss_rescued(*ps):
            outs, st, _ = solve_with_rescue(
                layer, *ps, solver_args=BAD, rescue_args=GOOD, capacity=cap
            )
            return jnp.sum(outs[0] ** 2), st

        (_, st), g_r = jax.value_and_grad(
            loss_rescued, argnums=(0, 1, 2), has_aux=True
        )(*params)

        def loss_bad(*ps):
            outs, _, _ = layer.solve_with_info(*ps, solver_args=BAD)
            return jnp.sum(outs[0] ** 2)

        def loss_good(*ps):
            (x,) = layer(*ps, solver_args=GOOD)
            return jnp.sum(x ** 2)

        g_b = jax.grad(loss_bad, argnums=(0, 1, 2))(*params)
        g_g = jax.grad(loss_good, argnums=(0, 1, 2))(*params)
        rescued = np.asarray(st) == 0
        assert rescued.sum() == cap
        for a, gb, gg in zip(g_r, g_b, g_g):
            a, gb, gg = map(np.asarray, (a, gb, gg))
            np.testing.assert_allclose(a[rescued], gg[rescued], atol=1e-6)
            np.testing.assert_allclose(a[~rescued], gb[~rescued], atol=1e-6)
