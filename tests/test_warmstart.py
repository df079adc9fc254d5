"""Warm-start contract (reference tests/test_moreau.py:1363-1723):
correctness, iteration count drops on a re-solve, batch-size-change
invalidation, and a training loop."""

import jax
import jax.numpy as jnp
import numpy as np

import cvxpylayers_tpu as ct
from cvxpylayers_tpu import CvxpyLayer

rng = np.random.default_rng(17)


def _proj_layer(n=8):
    x = ct.Variable(n)
    v = ct.Parameter(n)
    prob = ct.Problem(
        ct.Minimize(ct.sum_squares(x - v)), [ct.sum(x) == 1, x >= 0]
    )
    return CvxpyLayer(prob, parameters=[v], variables=[x]), v


class TestWarmStart:
    def test_iterations_drop_on_resolve(self):
        layer, _ = _proj_layer()
        vv = jnp.asarray(rng.standard_normal(8))
        _, st1, it1 = layer.solve_with_info(vv, warm_start=True)
        _, st2, it2 = layer.solve_with_info(vv, warm_start=True)
        assert int(st1) == 0 and int(st2) == 0
        assert int(it2) < int(it1), (int(it1), int(it2))

    def test_warm_start_correctness_after_perturbation(self):
        layer, _ = _proj_layer()
        vv = rng.standard_normal(8)
        (x1,) = layer(jnp.asarray(vv), warm_start=True)
        (x2_cold,) = layer(jnp.asarray(vv + 0.01))
        (x2_warm,) = layer(jnp.asarray(vv + 0.01), warm_start=True)
        np.testing.assert_allclose(
            np.asarray(x2_warm), np.asarray(x2_cold), atol=1e-7
        )

    def test_batch_size_change_invalidates(self):
        layer, _ = _proj_layer()
        v1 = jnp.asarray(rng.standard_normal((3, 8)))
        v2 = jnp.asarray(rng.standard_normal((5, 8)))
        layer(v1, warm_start=True)
        # different batch size: cache must be ignored, not crash
        (x2,) = layer(v2, warm_start=True)
        assert x2.shape == (5, 8)

    def test_training_loop_with_warm_start(self):
        # smooth (entropy-regularized) layer: the sparse simplex projection
        # has piecewise-constant active sets whose clipped coordinates get
        # exactly-zero gradients, so plain GD can stall at a kink there —
        # a real property of projection layers, not a defect.
        n = 4
        x = ct.Variable(n, nonneg=True)
        v = ct.Parameter(n)
        prob = ct.Problem(
            ct.Maximize(v @ x + ct.sum(ct.entr(x))), [ct.sum(x) == 1]
        )
        layer = CvxpyLayer(prob, parameters=[v], variables=[x])
        vv = jnp.asarray(rng.standard_normal(4))
        target = jnp.asarray([0.4, 0.3, 0.2, 0.1])

        def loss(v_):
            return jnp.sum((layer(v_)[0] - target) ** 2)

        l0 = float(loss(vv))
        for _ in range(60):
            # eager loop: warm start reuses the previous solution
            (xs,) = layer(vv, warm_start=True)
            g = jax.grad(loss)(vv)
            vv = vv - 2.0 * g
        l1 = float(loss(vv))
        assert l1 < 1e-4 and l1 < l0 * 1e-2, (l0, l1)

    def test_jitted_warm_start_via_state(self):
        # warm starts as traced values survive jit (reference jax layer's
        # function-argument warm starts, jax/cvxpylayer.py:328-337)
        layer, _ = _proj_layer()
        vv = jnp.asarray(rng.standard_normal((1, 8)))

        @jax.jit
        def step(v_, ws):
            (xs,), ws2, st, it = layer.solve_and_state(v_, warm_start=ws)
            return xs, ws2, st, it

        _, ws, st1, it1 = step(vv, None)
        _, _, st2, it2 = step(vv, ws)
        assert int(st1.max()) == 0 and int(st2.max()) == 0
        assert int(it2.max()) < int(it1.max()), (it1, it2)

    def test_jitted_training_loop_with_state(self):
        n = 4
        x = ct.Variable(n, nonneg=True)
        v = ct.Parameter(n)
        prob = ct.Problem(
            ct.Maximize(v @ x + ct.sum(ct.entr(x))), [ct.sum(x) == 1]
        )
        layer = CvxpyLayer(prob, parameters=[v], variables=[x])
        target = jnp.asarray([[0.4, 0.3, 0.2, 0.1]])

        @jax.jit
        def train_step(v_, ws):
            def loss(v__):
                (xs,), ws2, _, it = layer.solve_and_state(
                    v__, warm_start=ws
                )
                return jnp.sum((xs - target) ** 2), (ws2, it)

            (l_, (ws2, it)), g = jax.value_and_grad(loss, has_aux=True)(v_)
            return v_ - 2.0 * g, ws2, l_, it

        vv = jnp.asarray(rng.standard_normal((1, 4)))
        ws = None
        iters = []
        for i in range(30):
            vv, ws_new, l_, it = train_step(vv, ws)
            ws = ws_new
            iters.append(int(it.max()))
        assert float(l_) < 1e-3
        # warm starts visibly cut iteration counts inside the jitted loop
        assert min(iters[1:]) < iters[0], iters

    def test_varying_batch_sizes_one_layer(self):
        # one compiled layer serves several batch sizes (reference
        # tests/test_moreau.py:1825-1851)
        layer, _ = _proj_layer(5)
        for B in (1, 3, 7):
            vv = jnp.asarray(rng.standard_normal((B, 5)))
            (xs,) = layer(vv)
            assert xs.shape == (B, 5)
            np.testing.assert_allclose(
                np.asarray(xs.sum(axis=1)), 1.0, atol=1e-7
            )


class TestIpmWarmStart:
    def test_iteration_drop(self):
        # IPM path honors warm starts since late r2: a nonzero previous
        # solution replaces the least-squares init (slacks/duals shifted
        # back into the strict interior with a fixed centering mix)
        n = 12
        x = ct.Variable(n)
        v = ct.Parameter(n)
        layer = CvxpyLayer(
            ct.Problem(ct.Minimize(ct.sum_squares(x - v)),
                       [ct.sum(x) == 1, x >= 0]),
            parameters=[v], variables=[x],
            solver_args={"solve_method": "ipm"},
        )
        vv = jnp.asarray(rng.standard_normal((1, n)))
        _, ws, st1, it1 = layer.solve_and_state(vv)
        outs_w, _, st2, it2 = layer.solve_and_state(
            vv + 1e-3, warm_start=ws
        )
        outs_c, _, st3, it3 = layer.solve_and_state(vv + 1e-3)
        assert int(st1.max()) == 0 and int(st2.max()) == 0
        assert int(it2.max()) < int(it3.max()), (it2, it3)
        np.testing.assert_allclose(
            np.asarray(outs_w[0]), np.asarray(outs_c[0]), atol=1e-8
        )
