"""Constrained model-predictive control as a differentiable layer.

A T-step MPC problem (linear dynamics, quadratic stage cost, inf-norm
control cap) is compiled once into a layer mapping the current state to
the optimal first control. Differentiating through it tunes the cost
weights so the closed-loop trajectory tracks a reference — the pattern
of the reference's constrained_mpc notebook
(/root/reference/examples/torch/constrained_mpc.ipynb), rebuilt on the
native TPU layer.
"""

import jax
import jax.numpy as jnp
import numpy as np

import cvxpylayers_tpu as ct


def main():
    rng = np.random.default_rng(0)
    n, m, T = 4, 2, 3
    beta = 0.5  # control cap
    A_np = rng.standard_normal((n, n))
    A_np /= np.max(np.abs(np.linalg.eigvals(A_np)))
    B_np = rng.standard_normal((n, m))

    x0 = ct.Parameter(n)
    w = ct.Parameter(n, nonneg=True)  # tunable state-cost weights
    states = [ct.Variable(n) for _ in range(T)]
    controls = [ct.Variable(m) for _ in range(T)]
    constraints = [states[0] == x0, ct.norm(controls[0], "inf") <= beta]
    objective = ct.sum(ct.multiply(w, ct.square(states[0]))) + \
        ct.sum_squares(controls[0])
    for t in range(1, T):
        objective = objective + ct.sum(
            ct.multiply(w, ct.square(states[t]))
        ) + ct.sum_squares(controls[t])
        constraints += [
            states[t] == ct.Constant(A_np) @ states[t - 1]
            + ct.Constant(B_np) @ controls[t - 1],
            ct.norm(controls[t], "inf") <= beta,
        ]
    prob = ct.Problem(ct.Minimize(objective), constraints)
    layer = ct.CvxpyLayer(prob, parameters=[x0, w],
                          variables=[controls[0]])

    A_j = jnp.asarray(A_np)
    B_j = jnp.asarray(B_np)

    def rollout_cost(w_, x_init, steps=5):
        x = x_init
        cost = 0.0
        for _ in range(steps):
            (u,) = layer(x, w_)
            x = A_j @ x + B_j @ u
            cost = cost + jnp.sum(x ** 2) + jnp.sum(u ** 2)
        return cost

    w_v = jnp.ones(n)
    x_init = jnp.asarray(rng.standard_normal(n))
    c0 = float(rollout_cost(w_v, x_init))
    g = jax.grad(rollout_cost)(w_v, x_init)
    w_v = jnp.maximum(w_v - 0.5 * g, 0.0)
    c1 = float(rollout_cost(w_v, x_init))
    print(f"mpc closed-loop cost: {c0:.4f} -> {c1:.4f} after one "
          f"weight-tuning step")
    assert np.isfinite(c1)


if __name__ == "__main__":
    main()
