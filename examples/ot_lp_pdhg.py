"""Large sparse LP through the matrix-free PDHG route.

Unregularized optimal transport — min <P, C> over the transport
polytope — is a pure LP with n*m variables and only 3 nonzeros per
column of A: exactly the class where PDHG's matvec-only iterations win
(measured on v5e at 64x64: 10.8-12.7 fwd+bwd solves/s vs the
operator-ADMM route's 2.6 at identical eps). This is the MPAX-raPDHG
role from the reference stack (interfaces/mpax_if.py:149-163), with a
working backward pass (the reference's MPAX adapter raises
NotImplementedError on gradients, mpax_if.py:114-122).
"""

import jax
import jax.numpy as jnp
import numpy as np

import cvxpylayers_tpu as ct


def main():
    n_s, n_d = 12, 10
    C = ct.Parameter((n_s, n_d))
    P = ct.Variable((n_s, n_d), nonneg=True)
    a = np.full(n_s, 1.0 / n_s)
    b = np.full(n_d, 1.0 / n_d)
    prob = ct.Problem(
        ct.Minimize(ct.sum(ct.multiply(C, P))),
        [P @ ct.Constant(np.ones(n_d)) == ct.Constant(a),
         P.T @ ct.Constant(np.ones(n_s)) == ct.Constant(b)],
    )
    layer = ct.CvxpyLayer(prob, parameters=[C], variables=[P])

    pdhg = {"assembly": "sparse", "solve_method": "pdhg",
            "eps_abs": 1e-6, "eps_rel": 1e-6,
            "admm_eps_abs": 1e-4, "admm_eps_rel": 1e-4,
            "max_iters": 40000, "epoch": 500, "refine_steps": 10}

    rng = np.random.default_rng(3)
    x = rng.standard_normal(n_s)
    y = rng.standard_normal(n_d)
    Cv = jnp.asarray((x[:, None] - y[None, :]) ** 2)

    (plan,), status, iters = layer.solve_with_info(Cv, solver_args=pdhg)
    assert int(np.asarray(status)) == 0
    # marginals hold
    np.testing.assert_allclose(np.asarray(plan).sum(1), a, atol=1e-5)
    np.testing.assert_allclose(np.asarray(plan).sum(0), b, atol=1e-5)

    # gradients flow through the LP (entropic-free!): move the points
    def ot_cost(x_, y_):
        C_ = (x_[:, None] - y_[None, :]) ** 2
        (pl,) = layer(C_, solver_args=pdhg)
        return jnp.sum(pl * C_)

    w0 = float(ot_cost(jnp.asarray(x), jnp.asarray(y)))
    gx, gy = jax.grad(ot_cost, argnums=(0, 1))(
        jnp.asarray(x), jnp.asarray(y)
    )
    x2 = jnp.asarray(x) - 0.2 * gx
    y2 = jnp.asarray(y) - 0.2 * gy
    w1 = float(ot_cost(x2, y2))
    print(f"W2 cost {w0:.5f} -> {w1:.5f} after one gradient step "
          f"({int(np.asarray(iters))} pdhg iters)")
    assert w1 < w0


if __name__ == "__main__":
    main()
