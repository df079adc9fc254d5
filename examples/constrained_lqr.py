"""Constrained LQR via an approximate-dynamic-programming control layer.

The policy u(x) = argmin_u ||u||^2 + ||P^{1/2}(Ax + Bu)||^2 subject to
||u||_inf <= u_max is a differentiable layer. DPP requires parameters to
enter affinely, so the value function enters through the precomputed
parameters z = P^{1/2} A x and M = P^{1/2} B (parameter @ variable is
DPP-legal); gradient descent on closed-loop cost tunes P^{1/2} — the
reference's constrained_lqr notebook
(/root/reference/examples/torch/constrained_lqr.ipynb) rebuilt on the
native layer.
"""

import jax
import jax.numpy as jnp
import numpy as np

import cvxpylayers_tpu as ct


def main():
    rng = np.random.default_rng(1)
    n, m = 4, 2
    u_max = 0.5
    A_np = rng.standard_normal((n, n))
    A_np /= np.max(np.abs(np.linalg.eigvals(A_np))) * 1.05
    B_np = rng.standard_normal((n, m))

    u = ct.Variable(m)
    z = ct.Parameter(n)        # P^{1/2} A x, computed outside
    M = ct.Parameter((n, m))   # P^{1/2} B, computed outside
    prob = ct.Problem(
        ct.Minimize(ct.sum_squares(u) + ct.sum_squares(z + M @ u)),
        [ct.norm(u, "inf") <= u_max],
    )
    policy = ct.CvxpyLayer(prob, parameters=[z, M], variables=[u])

    A_j = jnp.asarray(A_np)
    B_j = jnp.asarray(B_np)

    def closed_loop_cost(P_sqrt, x0, steps=5):
        x = x0
        cost = 0.0
        for _ in range(steps):
            (u_,) = policy(P_sqrt @ (A_j @ x), P_sqrt @ B_j)
            x = A_j @ x + B_j @ u_
            cost = cost + jnp.sum(x ** 2) + jnp.sum(u_ ** 2)
        return cost

    x0 = jnp.asarray(rng.standard_normal(n))
    P_sqrt = jnp.eye(n)
    c0 = float(closed_loop_cost(P_sqrt, x0))
    for _ in range(3):
        g = jax.grad(closed_loop_cost)(P_sqrt, x0)
        P_sqrt = P_sqrt - 0.05 * g / (jnp.linalg.norm(g) + 1e-9)
    c1 = float(closed_loop_cost(P_sqrt, x0))
    print(f"lqr closed-loop cost: {c0:.4f} -> {c1:.4f} after tuning P")
    assert np.isfinite(c1)


if __name__ == "__main__":
    main()
