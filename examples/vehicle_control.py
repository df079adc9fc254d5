"""Vehicle path tracking with an approximate-dynamic-programming layer.

Linearized lateral vehicle dynamics (state y = [lateral error, heading
error, their rates]); the per-step policy minimizes a control penalty
plus a quadratic value-function surrogate over the next state:

    min  lam_a a^2 + lam_z z^2 + ||P_sqrt y+||^2 + q' y+
    s.t. y+ = fx + B u,  |a| <= 2,  |z + L*curv| <= 0.68

with u = (a, z) acceleration and steering. (P_sqrt, q) start from the
discrete Riccati solution and are fine-tuned by backpropagating the
realized trajectory cost through the layer — the reference's
vehicle.ipynb ADP workload (reference examples/torch/vehicle.ipynb),
rebuilt on the JAX layer with a double-integrator lateral model.
"""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.linalg import solve_discrete_are

import cvxpylayers_tpu as ct


def main():
    rng = np.random.default_rng(0)
    dt, L = 0.2, 2.8
    # lateral double integrator: [e, edot] per axis (position + heading)
    Ad = np.array([[1.0, dt, 0.0, 0.0],
                   [0.0, 1.0, 0.0, 0.0],
                   [0.0, 0.0, 1.0, dt],
                   [0.0, 0.0, 0.0, 1.0]])
    Bd = np.array([[0.0, 0.0],
                   [dt, 0.0],
                   [0.0, 0.0],
                   [0.0, dt]])
    Qc = np.diag([1.0, 0.1, 1.0, 0.1])
    Rc = np.diag([0.1, 0.1])
    Pric = solve_discrete_are(Ad, Bd, Qc, Rc)
    P_half = np.linalg.cholesky(Pric).T

    lam_a, lam_z = 0.1, 0.1
    P_sqrt = ct.Parameter((4, 4))
    q = ct.Parameter(4)
    fx = ct.Parameter(4)
    Bp = ct.Parameter((4, 2))
    curv = ct.Parameter(1)
    u = ct.Variable(2)
    y = ct.Variable(4)
    a, z = u[0], u[1]
    prob = ct.Problem(
        ct.Minimize(
            lam_a * ct.square(a) + lam_z * ct.square(z)
            + ct.sum_squares(P_sqrt @ y) + q @ y
        ),
        [y == fx + Bp @ u,
         ct.abs(a) <= 2.0,
         ct.abs(z + L * curv[0]) <= 0.68],
    )
    policy = ct.CvxpyLayer(prob, parameters=[P_sqrt, q, fx, Bp, curv],
                           variables=[u, y])
    sargs = {"eps_abs": 1e-6, "eps_rel": 1e-6, "refine_steps": 6}

    T = 15
    curvatures = jnp.asarray(0.12 * np.sin(0.5 * np.arange(T)))
    Adj = jnp.asarray(Ad)
    Bdj = jnp.asarray(Bd)
    Qj = jnp.asarray(Qc)

    def rollout(theta, x0):
        Ps, qs = theta
        x = x0
        cost = 0.0
        for t in range(T):
            us, _ = policy(Ps, qs, Adj @ x, Bdj,
                           curvatures[t:t + 1], solver_args=sargs)
            x = Adj @ x + Bdj @ us
            cost = cost + x @ (Qj @ x) + lam_a * us[0] ** 2 \
                + lam_z * us[1] ** 2
        return cost / T

    x0 = jnp.asarray(rng.standard_normal(4) * 0.5)
    theta = (jnp.asarray(P_half), jnp.zeros(4))
    step = jax.jit(jax.value_and_grad(rollout))
    v0, _ = step(theta, x0)
    lr = 0.05
    for it in range(20):
        v, g = step(theta, x0)
        theta = jax.tree_util.tree_map(lambda p_, g_: p_ - lr * g_,
                                       theta, g)
    v1, _ = step(theta, x0)
    print(f"vehicle ADP: avg trajectory cost {float(v0):.4f} -> "
          f"{float(v1):.4f}")
    assert float(v1) <= float(v0) + 1e-9, (v0, v1)
    # the tuned controller must actually track: terminal error small
    Ps, qs = theta
    x = x0
    for t in range(T):
        us, _ = policy(Ps, qs, Adj @ x, Bdj, curvatures[t:t + 1],
                       solver_args=sargs)
        x = Adj @ x + Bdj @ us
    print("terminal state:", np.round(np.asarray(x), 4))
    assert float(jnp.abs(x[0])) < 0.2 and float(jnp.abs(x[2])) < 0.2


if __name__ == "__main__":
    main()
