"""Learning demand parameters of a budget-allocation layer (exp cones).

A budget B is split across m channels; channel i converts y_i dollars
into an expected success probability 1 - exp(-alpha_i * y_i / p_i)
(diminishing returns). The allocation layer solves
    maximize sum(t)
    s.t.     sum(y) == B,  y >= 0,
             -exp(-alpha .* units) >= alpha .* t,  units == y .* inv_p,
which puts t_i = -(1/alpha_i) exp(-alpha_i units_i): maximizing sum(t)
maximizes total expected conversions — the reference's
resource_allocation.ipynb workload (reference
examples/torch/resource_allocation.ipynb). The channel efficiency
parameters alpha are then fit by gradient descent so the layer's
allocation matches an observed target allocation.
"""

import jax
import jax.numpy as jnp
import numpy as np

import cvxpylayers_tpu as ct

M = 5


def make_layer():
    y = ct.Variable(M)
    units = ct.Variable(M)
    t = ct.Variable(M)
    alpha = ct.Parameter(M, pos=True)
    inv_p = ct.Parameter(M, pos=True)
    B = ct.Parameter(())
    prob = ct.Problem(
        ct.Maximize(ct.sum(t)),
        [
            ct.sum(y) == B,
            y >= 0,
            -ct.exp(-ct.multiply(alpha, units))
            >= ct.multiply(alpha, t),
            units == ct.multiply(y, inv_p),
        ],
    )
    return ct.CvxpyLayer(prob, parameters=[B, inv_p, alpha],
                         variables=[y])


def main():
    rng = np.random.default_rng(0)
    layer = make_layer()
    B = jnp.asarray(1.0)
    inv_p = jnp.asarray(rng.uniform(0.5, 2.0, M))
    alpha_true = jnp.asarray(rng.uniform(0.5, 3.0, M))
    sargs = {"max_iters": 600, "refine_steps": 20}

    (y_target,) = layer(B, inv_p, alpha_true, solver_args=sargs)
    print("target allocation:", np.round(np.asarray(y_target), 3))

    # recover alpha from the observed allocation
    log_alpha = jnp.zeros(M)

    @jax.jit
    def loss_fn(la):
        (ys,) = layer(B, inv_p, jnp.exp(la), solver_args=sargs)
        return jnp.sum((ys - y_target) ** 2)

    g = jax.jit(jax.grad(loss_fn))
    for it in range(40):
        log_alpha = log_alpha - 1.0 * g(log_alpha)
    print(f"resource allocation: final fit loss "
          f"{float(loss_fn(log_alpha)):.6f}")


if __name__ == "__main__":
    main()
