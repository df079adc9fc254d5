"""Differentiable SDP layer: spectahedron projection (minimum-eigenvector
extraction) trained end to end.

The layer solves  min_X tr(C X)  s.t. X >> 0, tr(X) = 1  — the reference
corpus's SDP trace-minimization problem (cvxpylayers
tests/test_torch.py:233-248) — whose solution is the rank-1 projector
onto C's minimum eigenvector. Gradient descent on C through the layer
steers that eigenvector toward a target direction: a tiny "learn a
metric whose smallest mode points somewhere useful" demo, the pattern
behind SDP-based metric-learning layers. The 16x16-block bench twin of
this layer runs at ~423 fwd+bwd solves/s on one v5e chip (bench.py
`sdp_trace`: Newton-Schulz inner-loop PSD projections on the MXU,
exact-eigh statuses and polish).
"""

import jax
import jax.numpy as jnp
import numpy as np

import cvxpylayers_tpu as ct


def main():
    s = 5
    X = ct.Variable((s, s), PSD=True)
    C = ct.Parameter((s, s))
    prob = ct.Problem(ct.Minimize(ct.trace(C @ X)),
                      [ct.trace(X) == 1])
    layer = ct.CvxpyLayer(prob, parameters=[C], variables=[X])

    rng = np.random.default_rng(0)
    C0 = rng.standard_normal((s, s))
    C_v = jnp.asarray(0.5 * (C0 + C0.T))
    target = jnp.asarray(np.eye(s)[0])  # want v_min ~ e_0

    args = {"eps_abs": 1e-6, "eps_rel": 1e-6, "max_iters": 2000}

    @jax.jit
    def loss_fn(C_):
        C_sym = 0.5 * (C_ + C_.T)
        (Xs,) = layer(C_sym, solver_args=args)
        # X* = v v' at the optimum: reward mass on the target direction
        return 1.0 - target @ (Xs @ target)

    grad_fn = jax.jit(jax.grad(loss_fn))
    for it in range(120):
        g = grad_fn(C_v)
        C_v = C_v - 2.0 * g
        if it % 30 == 0:
            print(f"iter {it:3d}  1 - v'Xv = {float(loss_fn(C_v)):.6f}")

    (Xs,) = layer(0.5 * (C_v + C_v.T), solver_args=args)
    w, U = np.linalg.eigh(np.asarray(0.5 * (C_v + C_v.T)))
    v_min = U[:, 0]
    align = abs(float(v_min @ np.asarray(target)))
    print(f"final alignment |<v_min, target>| = {align:.4f}")
    assert float(loss_fn(C_v)) < 0.05
    assert align > 0.97


if __name__ == "__main__":
    main()
