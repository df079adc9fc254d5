"""Distributed runtime + heterogeneous bucketing (SURVEY sections 2.3 /
7.1.6): bucketed == unbucketed round trips, shared-executable reuse,
gradients through solve_bucketed, and the multi-process CPU scaling
harness (the same code path a real multi-host TPU pod runs)."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cvxpylayers_tpu as ct
from cvxpylayers_tpu import CvxpyLayer
from cvxpylayers_tpu.dist.bucketing import (
    _EXEC_CACHE,
    bucket_plan,
    solve_bucketed,
    structure_key,
)

rng = np.random.default_rng(11)


def _proj_layer(n):
    x = ct.Variable(n)
    v = ct.Parameter(n)
    prob = ct.Problem(
        ct.Minimize(ct.sum_squares(x - v)), [ct.sum(x) == 1, x >= 0]
    )
    return CvxpyLayer(prob, parameters=[v], variables=[x])


def _box_layer(n):
    # different parametrization but, for matching n, a DIFFERENT cone
    # pattern (no equality row) -> its own bucket
    x = ct.Variable(n)
    v = ct.Parameter(n)
    prob = ct.Problem(
        ct.Minimize(ct.sum_squares(x - v)), [x >= 0, x <= 1]
    )
    return CvxpyLayer(prob, parameters=[v], variables=[x])


class TestBucketing:
    def test_round_trip_matches_unbucketed(self):
        la = _proj_layer(5)
        lb = _box_layer(5)
        va = jnp.asarray(rng.standard_normal((3, 5)))
        vb = jnp.asarray(rng.standard_normal(5))
        res = solve_bucketed([(la, (va,)), (lb, (vb,))])
        (xa_ref,) = la(va)
        (xb_ref,) = lb(vb)
        np.testing.assert_allclose(
            np.asarray(res[0][0]), np.asarray(xa_ref), atol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(res[1][0]), np.asarray(xb_ref), atol=1e-9
        )
        # batchedness preserved
        assert res[0][0].shape == (3, 5)
        assert res[1][0].shape == (5,)

    def test_bucket_key_and_core_inherit_p_diag_only(self):
        # a sum_squares layer's direct call takes the elementwise
        # diagonal-P KKT route (p_diag_only); the bucketed solve must
        # inherit the same flag — and layers differing in it must not
        # share an executable (VERDICT r2 weak #6)
        from cvxpylayers_tpu.layer.cvxpylayer import _settings_from_args
        from cvxpylayers_tpu.solver.settings import SolverSettings

        la = _proj_layer(5)          # P = 2I: strictly diagonal
        assert la._p_diag_only is True
        settings = _settings_from_args(la._base_settings, None)
        key = structure_key(la, settings)
        assert key[-2] is True   # p_diag_only (key[-1] is p_zero)

        # quad-form layer: dense parametric P -> p_diag_only False,
        # different key even if cone pattern/n/settings matched
        n = 5
        x = ct.Variable(n)
        Ps = ct.Parameter((n, n), PSD=True)
        v = ct.Parameter(n)
        lq = CvxpyLayer(
            ct.Problem(ct.Minimize(ct.quad_form(x, Ps) - v @ x),
                       [ct.sum(x) == 1, x >= 0]),
            parameters=[Ps, v], variables=[x],
        )
        assert lq._p_diag_only is False
        kq = structure_key(lq, _settings_from_args(lq._base_settings, None))
        assert kq[-2] is False

        # route parity: the bucketed result matches the direct call,
        # which exercises the p_diag_only fast path end to end
        va = jnp.asarray(rng.standard_normal((4, 5)))
        res = solve_bucketed([(la, (va,))])
        (ref,) = la(va)
        np.testing.assert_allclose(
            np.asarray(res[0][0]), np.asarray(ref), atol=1e-9
        )

    def test_same_structure_layers_share_bucket_and_executable(self):
        # two distinct layers with identical (dims, n) solve through ONE
        # shared compiled executable
        n = 4
        x = ct.Variable(n)
        v = ct.Parameter(n)
        l1 = CvxpyLayer(
            ct.Problem(ct.Minimize(ct.sum_squares(x - v)),
                       [ct.sum(x) == 1, x >= 0]),
            parameters=[v], variables=[x],
        )
        x2 = ct.Variable(n)
        w = ct.Parameter(n)
        l2 = CvxpyLayer(
            ct.Problem(ct.Minimize(ct.sum_squares(x2 - 2.0 * w)),
                       [ct.sum(x2) == 1, x2 >= 0]),
            parameters=[w], variables=[x2],
        )
        from cvxpylayers_tpu.layer.cvxpylayer import _settings_from_args

        s1 = _settings_from_args(l1._base_settings, None)
        assert structure_key(l1, s1) == structure_key(l2, s1)
        plan = bucket_plan([(l1, (jnp.ones(n),)), (l2, (jnp.ones(n),))])
        assert len(plan) == 1  # one bucket
        n_exec_before = len(_EXEC_CACHE)
        vv = jnp.asarray(rng.standard_normal(n))
        res = solve_bucketed([(l1, (vv,)), (l2, (vv,))])
        assert len(_EXEC_CACHE) <= n_exec_before + 1
        (r1,) = l1(vv)
        (r2,) = l2(vv)
        np.testing.assert_allclose(np.asarray(res[0][0]), np.asarray(r1),
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(res[1][0]), np.asarray(r2),
                                   atol=1e-9)

    def test_padding_does_not_change_results(self):
        la = _proj_layer(4)
        va = jnp.asarray(rng.standard_normal((3, 4)))
        res_pad = solve_bucketed([(la, (va,))], pad_multiple=8)
        res_ref = solve_bucketed([(la, (va,))], pad_multiple=1)
        np.testing.assert_allclose(
            np.asarray(res_pad[0][0]), np.asarray(res_ref[0][0]),
            atol=1e-12,
        )
        plan = bucket_plan([(la, (va,))], pad_multiple=8)
        (count, padded), = plan.values()
        assert (count, padded) == (3, 8)

    def test_gradients_flow_through_buckets(self):
        la = _proj_layer(4)
        lb = _box_layer(4)
        va = jnp.asarray(rng.standard_normal(4))
        vb = jnp.asarray(rng.standard_normal(4))

        def loss(va_, vb_):
            res = solve_bucketed([(la, (va_,)), (lb, (vb_,))])
            return jnp.sum(res[0][0] ** 2) + jnp.sum(res[1][0] ** 2)

        ga, gb = jax.grad(loss, argnums=(0, 1))(va, vb)
        ga_ref = jax.grad(lambda v_: jnp.sum(la(v_)[0] ** 2))(va)
        gb_ref = jax.grad(lambda v_: jnp.sum(lb(v_)[0] ** 2))(vb)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(ga_ref),
                                   atol=1e-8)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(gb_ref),
                                   atol=1e-8)


@pytest.mark.integration
def test_multiprocess_scaling_harness():
    """2 processes x 2 virtual CPU devices: the full jax.distributed
    code path (coordinator, global mesh, cross-host batch assembly,
    collective loss reduction) on one machine."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    res = subprocess.run(
        [sys.executable, "-m", "cvxpylayers_tpu.dist.harness",
         "--procs", "2", "--devices-per-proc", "2", "--batch", "8",
         "--n", "6", "--steps", "2", "--port", "12399"],
        capture_output=True, text=True, timeout=1200, env=env,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    import json

    line = [l for l in res.stdout.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["n_hosts"] == 2
    assert out["n_local_devices"] == 2
    for k in ("solves_per_s_1dev", "solves_per_s_1host",
              "solves_per_s_Nhost"):
        assert out[k] > 0, out


class TestBucketedWarmStart:
    def test_state_roundtrip_cuts_iterations(self):
        la = _proj_layer(6)
        va = jnp.asarray(rng.standard_normal((3, 6)))
        res1, state = solve_bucketed([(la, (va,))], return_state=True)
        res2, state2 = solve_bucketed(
            [(la, (va,))], warm_start=state, return_state=True
        )
        np.testing.assert_allclose(
            np.asarray(res1[0][0]), np.asarray(res2[0][0]), atol=1e-9
        )
        # mismatched structure falls back to cold start cleanly
        lb = _box_layer(6)
        vb = jnp.asarray(rng.standard_normal(6))
        res3 = solve_bucketed([(lb, (vb,))], warm_start=state)
        assert res3[0][0].shape == (6,)


class TestBucketScheduler:
    def test_step_matches_direct(self):
        from cvxpylayers_tpu.dist import BucketScheduler

        la = _proj_layer(5)
        lb = _box_layer(5)
        va = jnp.asarray(rng.standard_normal((3, 5)))
        vb = jnp.asarray(rng.standard_normal(5))
        sched = BucketScheduler()
        res = sched.step([(la, (va,)), (lb, (vb,))])
        (xa_ref,) = la(va)
        (xb_ref,) = lb(vb)
        np.testing.assert_allclose(np.asarray(res[0][0]),
                                   np.asarray(xa_ref), atol=1e-8)
        np.testing.assert_allclose(np.asarray(res[1][0]),
                                   np.asarray(xb_ref), atol=1e-8)
        assert res[0][0].shape == (3, 5)
        assert res[1][0].shape == (5,)

    def test_capacity_classes_bound_recompiles(self):
        from cvxpylayers_tpu.dist import BucketScheduler

        la = _proj_layer(4)
        sched = BucketScheduler(pad_multiple=2)
        # batches 3 -> cap 4; 4 -> fits; 2 -> high-water keeps 4; 6 -> 8
        for B, want_cap in [(3, 4), (4, 4), (2, 4), (6, 8), (5, 8)]:
            v = jnp.asarray(rng.standard_normal((B, 4)))
            (out,) = sched.step([(la, (v,))])[0]
            assert out.shape == (B, 4)
            (st,) = sched.stats().values()
            assert st["capacity"] == want_cap, (B, st)
        (st,) = sched.stats().values()
        assert st["compiles"] == 2  # capacities {4, 8} only
        assert st["flushes"] == 5

    def test_warm_start_carries_across_steps(self):
        from cvxpylayers_tpu.dist import BucketScheduler

        la = _proj_layer(6)
        v = jnp.asarray(rng.standard_normal((4, 6)))
        sched = BucketScheduler()
        sched.step([(la, (v,))])
        (key, st1) = next(iter(sched._buckets.items()))
        it1 = int(np.max(np.asarray(st1.last_iters)))
        # same data again: warm start should cut iterations
        sched.step([(la, (v,))])
        it2 = int(np.max(np.asarray(st1.last_iters)))
        assert it2 < it1, (it1, it2)

    def test_warm_start_invalidated_on_composition_change(self):
        from cvxpylayers_tpu.dist import BucketScheduler

        la = _proj_layer(6)
        lb = _proj_layer(6)  # same structure, different layer object
        v = jnp.asarray(rng.standard_normal((4, 6)))
        w = jnp.asarray(rng.standard_normal((4, 6)))
        sched = BucketScheduler()
        r1 = sched.step([(la, (v,))])
        # different composition: (la, lb) share the bucket now; results
        # must still be correct (cold start, no stale-row reuse)
        r2 = sched.step([(la, (v,)), (lb, (w,))])
        np.testing.assert_allclose(np.asarray(r2[0][0]),
                                   np.asarray(r1[0][0]), atol=1e-8)
        (xb_ref,) = lb(w)
        np.testing.assert_allclose(np.asarray(r2[1][0]),
                                   np.asarray(xb_ref), atol=1e-8)

    def test_grad_through_scheduler(self):
        from cvxpylayers_tpu.dist import BucketScheduler

        la = _proj_layer(5)
        v = jnp.asarray(rng.standard_normal(5))
        sched = BucketScheduler(warm_start=False)

        def f(p):
            return (sched.step([(la, (p,))])[0][0] ** 2).sum()

        g = jax.grad(f)(v)
        eps = 1e-6
        for i in range(3):
            e = jnp.zeros(5).at[i].set(eps)
            fd = (f(v + e) - f(v - e)) / (2 * eps)
            assert abs(float(g[i]) - float(fd)) < 1e-4


class TestBucketedPZero:
    """Bucketed solves must thread p_zero into make_diff_solver: without
    it, solve_method='pdhg' (and ipm_mode='hsde') raised through
    solve_bucketed on pure conic LPs that the direct layer call accepts,
    and 'auto' silently used the primal-dual IPM instead of HSDE
    (r3 review finding)."""

    def test_pdhg_through_buckets_matches_direct(self):
        import cvxpylayers_tpu as ct

        n_, m_ = 3, 5
        x = ct.Variable(n_, nonneg=True)
        A = ct.Parameter((m_, n_))
        b = ct.Parameter(m_)
        layer = ct.CvxpyLayer(
            ct.Problem(ct.Minimize(ct.pnorm(A @ x - b, 1))),
            parameters=[A, b], variables=[x],
        )
        r = np.random.default_rng(23)
        Av = jnp.asarray(r.standard_normal((2, m_, n_)))
        bv = jnp.asarray(r.standard_normal((2, m_)))
        sa = {"solve_method": "pdhg", "max_iters": 4000}
        res = solve_bucketed([(layer, (Av, bv))], solver_args=sa)
        (ref,) = layer(Av, bv, solver_args=sa)
        np.testing.assert_allclose(np.asarray(res[0][0]),
                                   np.asarray(ref), atol=1e-7)

    def test_p_zero_in_structure_key(self):
        import cvxpylayers_tpu as ct
        from cvxpylayers_tpu.dist.bucketing import structure_key
        from cvxpylayers_tpu.solver.settings import SolverSettings

        x = ct.Variable(2, nonneg=True)
        c = ct.Parameter(2)
        lp = ct.CvxpyLayer(ct.Problem(ct.Minimize(c @ x), [ct.sum(x) == 1]),
                           parameters=[c], variables=[x])
        qp = ct.CvxpyLayer(
            ct.Problem(ct.Minimize(ct.sum_squares(x - c)),
                       [ct.sum(x) == 1]),
            parameters=[c], variables=[x],
        )
        s = SolverSettings()
        assert structure_key(lp, s)[-1] is True
        assert structure_key(qp, s)[-1] is False
