"""Supply-chain control policy tuned by differentiating through a QP.

A network holds inventory h at n nodes; goods flow over directed links u
(k supplier links with prices p, retail links selling at price r,
internode shipments with cost tau). The one-step policy solves

    min  stage_cost(u) + ||P_sqrt h_next||^2 + q' h_next
    s.t. h_next = h + (A_in - A_out) u,  0 <= h_next <= h_max,
         0 <= u <= u_max,  A_out u <= h,  u_retail <= d

and the quadratic value-function surrogate (P_sqrt, q) is trained by
backpropagating realized multi-step cost through the layer — the
reference's supply_chain.ipynb workload (reference
examples/torch/supply_chain.ipynb), rebuilt on the JAX layer with a
chain topology.
"""

import jax
import jax.numpy as jnp
import numpy as np

import cvxpylayers_tpu as ct


def main():
    rng = np.random.default_rng(0)
    # chain: supplier -> node0 -> node1 -> node2 -> retail
    n = 3                     # storage nodes
    links = [("S", 0), (0, 1), (1, 2), (2, "R")]
    n_u = len(links)
    A_in = np.zeros((n, n_u))
    A_out = np.zeros((n, n_u))
    for j, (src, dst) in enumerate(links):
        if isinstance(dst, int):
            A_in[dst, j] = 1.0
        if isinstance(src, int):
            A_out[src, j] = 1.0
    supplier_links = [0]
    retail_links = [3]
    price = 1.0               # supplier price
    r_sell = 3.0              # retail revenue
    tau = 0.05                # shipment cost
    h_max, u_max = 3.0, 2.0

    cost_vec = np.full(n_u, tau)
    cost_vec[supplier_links] = price
    cost_vec[retail_links] = -r_sell

    P_sqrt = ct.Parameter((n, n))
    q = ct.Parameter(n)
    h = ct.Parameter(n)
    d = ct.Parameter(1)       # retail demand
    u = ct.Variable(n_u, nonneg=True)
    h_next = ct.Variable(n)
    prob = ct.Problem(
        ct.Minimize(
            ct.Constant(cost_vec) @ u
            + ct.sum_squares(P_sqrt @ h_next) + q @ h_next
        ),
        [
            h_next == h + ct.Constant(A_in - A_out) @ u,
            h_next >= 0, h_next <= h_max,
            u <= u_max,
            ct.Constant(A_out) @ u <= h,
            u[3] <= d[0],
        ],
    )
    policy = ct.CvxpyLayer(prob, parameters=[P_sqrt, q, h, d],
                           variables=[u, h_next])
    sargs = {"eps_abs": 1e-6, "eps_rel": 1e-6, "refine_steps": 6}

    T = 8                     # rollout horizon
    demands = jnp.asarray(rng.uniform(0.5, 1.5, T))

    def rollout_cost(theta):
        Ps, qs = theta
        hcur = jnp.full(n, 1.0)
        total = 0.0
        for t in range(T):
            us, hnext = policy(Ps, qs, hcur, demands[t:t + 1],
                               solver_args=sargs)
            total = total + cost_vec @ us
            hcur = hnext
        return total / T

    theta = (jnp.eye(n) * 0.3, jnp.zeros(n))
    step = jax.jit(jax.value_and_grad(rollout_cost))
    v0, _ = step(theta)
    lr = 0.1
    for it in range(25):
        v, g = step(theta)
        theta = jax.tree_util.tree_map(lambda a, b: a - lr * b, theta, g)
    v1, _ = step(theta)
    print(f"supply chain: avg stage cost {float(v0):.4f} -> {float(v1):.4f}")
    assert float(v1) < float(v0) - 0.05, (v0, v1)


if __name__ == "__main__":
    main()
