"""Entropic-regularized optimal transport as a differentiable layer.

The OT plan P solves min <P, C> - eps H(P) over the transport polytope;
differentiating the plan w.r.t. the point locations (through the cost
matrix C) gives transport-aware gradients — the reference's
optimal_transport notebook
(/root/reference/examples/torch/optimal_transport.ipynb), TPU-native.
"""

import jax
import jax.numpy as jnp
import numpy as np

import cvxpylayers_tpu as ct


def main():
    n, m = 3, 3
    eps = 0.5  # entropic regularization; keep cost/eps O(1) so the
    # plan has no vanishing entries (entropic OT is exp(-C/eps))
    C = ct.Parameter((n, m))
    P = ct.Variable((n, m), nonneg=True)
    # objective <P,C> - eps*(H(P) + sum P)
    obj = ct.sum(ct.multiply(C, P)) - eps * (
        ct.sum(ct.entr(P)) + ct.sum(P)
    )
    ones_m = np.ones(m)
    ones_n = np.ones(n)
    prob = ct.Problem(
        ct.Minimize(obj),
        [P @ ct.Constant(ones_m) == ct.Constant(ones_n / n),
         P.T @ ct.Constant(ones_n) == ct.Constant(ones_m / m)],
    )
    layer = ct.CvxpyLayer(prob, parameters=[C], variables=[P])

    rng = np.random.default_rng(6)
    x = jnp.asarray(0.5 * rng.standard_normal(n))
    y = jnp.asarray(0.5 * rng.standard_normal(m))

    def ot_cost(x_, y_):
        C_ = (x_[:, None] - y_[None, :]) ** 2
        (plan,) = layer(C_)
        return jnp.sum(plan * C_)

    w2 = float(ot_cost(x, y))
    gx, gy = jax.grad(ot_cost, argnums=(0, 1))(x, y)
    # gradient flow moves the points together
    x2 = x - 0.5 * gx
    y2 = y - 0.5 * gy
    w2_after = float(ot_cost(x2, y2))
    print(f"ot cost: {w2:.4f} -> {w2_after:.4f} after one gradient step")
    assert w2_after < w2


if __name__ == "__main__":
    main()
