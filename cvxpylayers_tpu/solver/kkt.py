"""KKT residual map and its generalized Jacobian.

The solution of  min (1/2)x'Px + q'x  s.t. Ax + s = b, s in K  is
characterized (via the Moreau decomposition w = s - y, s = Pi_K(w),
y = Pi_K(w) - w in K*) by F(x, w) = 0 with

    F1 = P x + q + A' y(w)
    F2 = A x + Pi_K(w) - b

This single residual map powers both the semismooth-Newton polish
(solver/refine.py) and the implicit-function-theorem backward pass
(diff/derivative.py) — the same mathematical object diffcp's C++ adjoint
and the QCP derivative papers use (arXiv 1904.09043, 2508.17522), minus
the homogeneous embedding, evaluated directly at the primal-dual solution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..cones.dims import ConeDims
from ..cones.jacobians import make_cone_dproj_dense
from ..cones.projections import make_cone_projector


def make_kkt(dims: ConeDims, n: int):
    m = dims.total
    proj = make_cone_projector(dims)
    dproj = make_cone_dproj_dense(dims)

    def residual(x, w, P, q, A, b):
        Pi = proj(w)
        y = Pi - w
        F1 = P @ x + q + (A.T @ y if m else jnp.zeros(n, x.dtype))
        F2 = A @ x + Pi - b
        return jnp.concatenate([F1, F2])

    def jacobian(x, w, P, q, A, b):
        """Generalized Jacobian of F wrt (x, w): (n+m, n+m) dense."""
        D = dproj(w)  # (m, m)
        I_m = jnp.eye(m, dtype=x.dtype)
        J = jnp.zeros((n + m, n + m), dtype=x.dtype)
        J = J.at[:n, :n].set(P)
        J = J.at[:n, n:].set(A.T @ (D - I_m))
        J = J.at[n:, :n].set(A)
        J = J.at[n:, n:].set(D)
        return J

    def split(w):
        Pi = proj(w)
        return Pi, Pi - w  # (s, y)

    return residual, jacobian, split
