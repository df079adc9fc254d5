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


def make_kkt_solver(dims: ConeDims, n: int, cg_iters: int = 40):
    """Solve J(x,w) delta = rhs (or J' delta = rhs).

    f64: dense J + exact LU. f32 (TPU): matvec-only CG on the normal
    equations using the block structure — D Pi is symmetric block-diagonal,
    so both J and J' matvecs cost O(mn + sum block^2) and the (n+m)^2
    Jacobian is never materialized (solver/linsolve.py has the measured
    motivation)."""
    from ..cones.jacobians import make_cone_dproj_apply
    from .linsolve import _cg_normal

    m = dims.total
    _, jacobian, _ = make_kkt(dims, n)
    dapply = make_cone_dproj_apply(dims)

    def solve(x, w, P, q, A, b, rhs, transpose=False,
              regularized=False):
        if rhs.dtype == jnp.float64:
            J = jacobian(x, w, P, q, A, b)
            M = J.T if transpose else J
            if regularized:
                # Tikhonov-regularized least squares: robust when strict
                # complementarity fails and J is numerically singular
                # (weakly active constraints make the generalized Jacobian
                # rank-deficient)
                MtM = M.T @ M
                dim = MtM.shape[0]
                eps_r = 1e-12 * (jnp.trace(MtM) / dim + 1.0)
                L = jnp.linalg.cholesky(
                    MtM + eps_r * jnp.eye(dim, dtype=rhs.dtype)
                )
                rhs2 = M.T @ rhs
                z_ = jax.scipy.linalg.solve_triangular(L, rhs2, lower=True)
                return jax.scipy.linalg.solve_triangular(
                    L, z_, lower=True, trans=1
                )
            return jnp.linalg.solve(M, rhs)

        def mv(v):
            v1, v2 = v[:n], v[n:]
            Dv2 = dapply(w, v2)
            return jnp.concatenate(
                [P @ v1 + A.T @ (Dv2 - v2), A @ v1 + Dv2]
            )

        def mvT(u):
            u1, u2 = u[:n], u[n:]
            Au1 = A @ u1
            return jnp.concatenate(
                [P @ u1 + A.T @ u2, dapply(w, Au1 + u2) - Au1]
            )

        a, aT = (mvT, mv) if transpose else (mv, mvT)
        return _cg_normal(a, aT, rhs, cg_iters)

    return solve
