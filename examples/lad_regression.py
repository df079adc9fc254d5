"""Least-absolute-deviations regression layer (the README flagship).

Trains the data matrix of a LAD problem by gradient descent so the argmin
matches a target — the canonical "differentiate through an LP" demo.
"""

import jax
import jax.numpy as jnp
import numpy as np

import cvxpylayers_tpu as ct


def main():
    n, m = 2, 3
    x = ct.Variable(n)
    A = ct.Parameter((m, n))
    b = ct.Parameter(m)
    prob = ct.Problem(ct.Minimize(0.5 * ct.pnorm(A @ x - b, p=1)), [x >= 0])
    layer = ct.CvxpyLayer(prob, parameters=[A, b], variables=[x])

    key = jax.random.PRNGKey(0)
    kA, kb = jax.random.split(key)
    A_v = jax.random.normal(kA, (m, n))
    b_v = jax.random.normal(kb, (m,))
    target = jnp.array([0.2, 0.8])

    @jax.jit
    def loss_fn(A_, b_):
        (xs,) = layer(A_, b_)
        return jnp.sum((xs - target) ** 2)

    grad_fn = jax.jit(jax.grad(loss_fn, argnums=(0, 1)))
    for it in range(60):
        gA, gb = grad_fn(A_v, b_v)
        A_v = A_v - 0.5 * gA
        b_v = b_v - 0.5 * gb
        if it % 10 == 0:
            print(f"iter {it:3d}  loss {float(loss_fn(A_v, b_v)):.6f}")
    (xs,) = layer(A_v, b_v)
    print("final argmin:", np.asarray(xs), "target:", np.asarray(target))


if __name__ == "__main__":
    main()
