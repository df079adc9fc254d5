"""PyTorch frontend: forward values, gradcheck, batching (reference
tests/test_torch.py patterns on the README LAD problem and a QP)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import cvxpylayers_tpu as ct
from cvxpylayers_tpu.torch import CvxpyLayer as TorchLayer

rng = np.random.default_rng(23)


def _lad():
    n, m = 2, 3
    x = ct.Variable(n)
    A = ct.Parameter((m, n))
    b = ct.Parameter(m)
    prob = ct.Problem(ct.Minimize(0.5 * ct.pnorm(A @ x - b, p=1)), [x >= 0])
    return TorchLayer(prob, parameters=[A, b], variables=[x]), (n, m)


class TestTorchFrontend:
    def test_infeasible_raises(self):
        # reference contract: solver failure surfaces as an exception
        # through the torch layer (cvxpylayers tests/test_torch.py:299-316)
        from cvxpylayers_tpu.layer.cvxpylayer import SolverError

        x = ct.Variable(1)
        p = ct.Parameter(1)
        prob = ct.Problem(ct.Minimize(ct.sum(x)), [x >= 1, x <= p - 2])
        layer = TorchLayer(prob, parameters=[p], variables=[x])
        with pytest.raises(SolverError, match="infeasible"):
            layer(torch.zeros(1, dtype=torch.float64))
        # opt-out: statuses stay data, nothing raises
        (out,) = layer(torch.zeros(1, dtype=torch.float64),
                       check_status=False)
        assert out.shape == (1,)

    def test_readme_flow(self):
        layer, (n, m) = _lad()
        A_t = torch.randn(m, n, dtype=torch.float64, requires_grad=True)
        b_t = torch.randn(m, dtype=torch.float64, requires_grad=True)
        (sol,) = layer(A_t, b_t)
        assert sol.shape == (n,)
        sol.sum().backward()
        assert A_t.grad is not None and b_t.grad is not None
        assert torch.isfinite(A_t.grad).all()

    def test_values_match_jax_layer(self):
        n = 5
        x = ct.Variable(n)
        v = ct.Parameter(n)
        prob = ct.Problem(
            ct.Minimize(ct.sum_squares(x - v)), [ct.sum(x) == 1, x >= 0]
        )
        tlayer = TorchLayer(prob, parameters=[v], variables=[x])
        import jax.numpy as jnp

        vv = rng.standard_normal(n)
        (xt,) = tlayer(torch.as_tensor(vv))
        (xj,) = tlayer._layer(jnp.asarray(vv))
        np.testing.assert_allclose(
            xt.detach().numpy(), np.asarray(xj), atol=1e-9
        )

    def test_gradcheck(self):
        n = 3
        x = ct.Variable(n)
        v = ct.Parameter(n)
        prob = ct.Problem(
            ct.Minimize(ct.sum_squares(x - v)), [ct.sum(x) == 1]
        )
        layer = TorchLayer(prob, parameters=[v], variables=[x])
        v_t = torch.randn(n, dtype=torch.float64, requires_grad=True)

        def f(v_):
            (xs,) = layer(v_)
            return xs.sum() + (xs**2).sum()

        torch.autograd.gradcheck(f, (v_t,), atol=1e-5, eps=1e-6)

    def test_batched(self):
        layer, (n, m) = _lad()
        B = 4
        A_t = torch.randn(B, m, n, dtype=torch.float64)
        b_t = torch.randn(B, m, dtype=torch.float64)
        (sol,) = layer(A_t, b_t)
        assert sol.shape == (B, n)
        for i in range(B):
            (si,) = layer(A_t[i], b_t[i])
            np.testing.assert_allclose(
                sol[i].numpy(), si.numpy(), atol=1e-7
            )


class TestTorchWarmStart:
    def test_warm_start_correctness_and_cache(self):
        n = 6
        x = ct.Variable(n)
        v = ct.Parameter(n)
        prob = ct.Problem(
            ct.Minimize(ct.sum_squares(x - v)), [ct.sum(x) == 1, x >= 0]
        )
        layer = TorchLayer(prob, parameters=[v], variables=[x])
        vt = torch.randn(n, dtype=torch.float64)
        (x1,) = layer(vt, warm_start=True)
        assert layer._warm is not None
        (x2_cold,) = layer(vt + 0.01)
        (x2_warm,) = layer(vt + 0.01, warm_start=True)
        np.testing.assert_allclose(
            x2_warm.numpy(), x2_cold.numpy(), atol=1e-7
        )

    def test_warm_start_gradients_flow(self):
        n = 4
        x = ct.Variable(n)
        v = ct.Parameter(n)
        prob = ct.Problem(
            ct.Minimize(ct.sum_squares(x - v)), [ct.sum(x) == 1, x >= 0]
        )
        layer = TorchLayer(prob, parameters=[v], variables=[x])
        vt = torch.randn(n, dtype=torch.float64, requires_grad=True)
        layer(vt.detach(), warm_start=True)
        (xs,) = layer(vt, warm_start=True)
        xs.sum().backward()
        assert vt.grad is not None and torch.isfinite(vt.grad).all()

    def test_batch_shape_change_invalidates(self):
        n = 4
        x = ct.Variable(n)
        v = ct.Parameter(n)
        prob = ct.Problem(
            ct.Minimize(ct.sum_squares(x - v)), [ct.sum(x) == 1, x >= 0]
        )
        layer = TorchLayer(prob, parameters=[v], variables=[x])
        layer(torch.randn(3, n, dtype=torch.float64), warm_start=True)
        (xs,) = layer(torch.randn(5, n, dtype=torch.float64),
                      warm_start=True)
        assert xs.shape == (5, n)


class TestTorchTransforms:
    """The perspective / suppfunc / partial_optimize transforms are
    canon-level, so the torch frontend gets them for free — prove it."""

    def test_perspective_quad_over_lin(self):
        x = ct.Variable(3)
        s = ct.Variable()
        p = ct.Parameter(3)
        q = ct.Parameter()
        t = ct.Variable()
        prob = ct.Problem(
            ct.Minimize(t),
            [t >= ct.perspective(ct.sum_squares(x), s), x == p, s == q],
        )
        layer = TorchLayer(prob, parameters=[p, q], variables=[t])
        pv = torch.tensor([1.0, -2.0, 0.5], dtype=torch.float64,
                          requires_grad=True)
        qv = torch.tensor(2.0, dtype=torch.float64, requires_grad=True)
        (tv,) = layer(pv, qv)
        want = float((pv ** 2).sum() / qv)
        assert abs(float(tv) - want) < 1e-6
        tv.backward()
        np.testing.assert_allclose(
            pv.grad.numpy(), 2 * pv.detach().numpy() / float(qv),
            atol=1e-5,
        )

    def test_suppfunc_box(self):
        y = ct.Variable(4)
        f = ct.suppfunc(y, [y <= 1, y >= -1])
        x = ct.Variable(4)
        p = ct.Parameter(4)
        t = ct.Variable()
        prob = ct.Problem(ct.Minimize(t), [x == p, f(x) <= t])
        layer = TorchLayer(prob, parameters=[p], variables=[t])
        pv = torch.randn(4, dtype=torch.float64)
        (tv,) = layer(pv)
        assert abs(float(tv) - float(pv.abs().sum())) < 1e-6


class TestTorchCompile:
    def test_compiled_module_with_layer(self):
        # reference contract (tests/test_moreau.py:1074-1193): the layer
        # keeps working inside a torch.compile-d module.  The JAX-backed
        # autograd.Function is an opaque call to dynamo, so it graph-
        # breaks (allowed: fullgraph=False) but values and gradients
        # must match the eager module exactly.
        if not hasattr(torch, "compile"):
            pytest.skip("torch.compile unavailable")
        layer, (n, m) = _lad()

        class Model(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.lin = torch.nn.Linear(m * n + m, m * n + m,
                                           dtype=torch.float64)

            def forward(self, theta):
                theta = self.lin(theta)
                A = theta[: m * n].reshape(m, n)
                b = theta[m * n:]
                (sol,) = layer(A, b)
                return sol.square().sum() + theta.square().sum() * 0.01

        torch.manual_seed(0)
        model = Model()
        theta = torch.randn(m * n + m, dtype=torch.float64,
                            requires_grad=True)
        out_eager = model(theta)
        (g_eager,) = torch.autograd.grad(out_eager, theta)

        try:
            compiled = torch.compile(model, fullgraph=False)
            out_c = compiled(theta)
        except Exception as e:  # pragma: no cover - backend-specific
            pytest.skip(f"torch.compile backend unavailable: {e}")
        (g_c,) = torch.autograd.grad(out_c, theta)
        assert torch.allclose(out_c, out_eager, atol=1e-8)
        assert torch.allclose(g_c, g_eager, atol=1e-7)
