"""Optimizing spring stiffness constants through an equilibrium layer.

n blocks of width w sit between walls at 0 and l, joined to the walls
and to each other by n+1 springs with stiffnesses k. The equilibrium
block positions minimize the stored elastic energy subject to
non-overlap, which is a QP layer in k:

    x(k) = argmin  sum_i k_i * 0.5 * diff(x)_i^2
           s.t.    x_0 = 0, x_{n+1} = l, diff(x) >= w

We tune the stiffnesses by gradient descent so the equilibrium matches
target positions — the reference's optimizing_stiffness_constants.ipynb
workload (reference examples/torch/optimizing_stiffness_constants.ipynb),
rebuilt on the JAX layer.
"""

import jax
import jax.numpy as jnp
import numpy as np

import cvxpylayers_tpu as ct


def main():
    n, l, w = 5, 1.0, 0.05

    k = ct.Parameter(n + 1, nonneg=True)
    x = ct.Variable(n + 2)
    objective = ct.sum(ct.multiply(k, 0.5 * ct.square(ct.diff(x))))
    prob = ct.Problem(
        ct.Minimize(objective),
        [x[0] == 0, x[n + 1] == l, ct.diff(x) >= w],
    )
    layer = ct.CvxpyLayer(prob, parameters=[k], variables=[x])
    sargs = {"eps_abs": 1e-7, "eps_rel": 1e-7, "refine_steps": 8}

    # sanity: uniform stiffness -> evenly spread blocks
    k0 = jnp.ones(n + 1)
    (x0,) = layer(k0, solver_args=sargs)
    even = np.linspace(0, l, n + 2)
    assert np.abs(np.asarray(x0) - even).max() < 1e-5, x0

    # tune k so the equilibrium hits an uneven (but reachable: gaps > w)
    # target layout
    rng = np.random.default_rng(0)
    target = jnp.asarray(
        even[1:-1] + rng.uniform(-0.04, 0.04, n)
    )

    def loss(log_k):
        (xs,) = layer(jnp.exp(log_k), solver_args=sargs)
        return jnp.sum((xs[1:-1] - target) ** 2)

    step = jax.jit(jax.value_and_grad(loss))
    log_k = jnp.zeros(n + 1)
    lr = 0.5
    for it in range(120):
        val, g = step(log_k)
        log_k = log_k - lr * g
    final = float(step(log_k)[0])
    print(f"stiffness tuning: loss {float(val):.3e} -> {final:.3e}")
    assert final < 1e-4, final

    (xf,) = layer(jnp.exp(log_k), solver_args=sargs)
    print("equilibrium:", np.round(np.asarray(xf)[1:-1], 4),
          "target:", np.round(np.asarray(target), 4))


if __name__ == "__main__":
    main()
