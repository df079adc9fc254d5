"""Square linear solves for the KKT Jacobian, tuned per precision/platform.

The polish and the implicit-diff backward pass each solve one dense
(n+m)-square system per Newton step / cotangent. On TPU (f32), XLA's
batched LU is an order of magnitude slower than matmul-only methods
(measured on v5e, 1024x170x170: LU 124 ms, QR 76 ms, normal-equation
Cholesky 60 ms, CG-25 on the normal equations 12 ms), so:

  * float64 (CPU tests / high-accuracy mode): exact LU via
    jnp.linalg.solve;
  * float32 (TPU): Jacobi-preconditioned CG on the normal equations
    J'J x = J'r — MXU-only matvecs, fixed iteration count. Inexactness is
    absorbed by the damped-Newton loop and audited by the final KKT
    residual status check.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _cg_normal(matvec, matvec_T, rhs, iters: int):
    """CG on (A'A) x = A'rhs with Jacobi preconditioning."""
    b = matvec_T(rhs)
    # Jacobi preconditioner from a probe of diag(A'A) via column norms:
    # diag(A'A)_j = ||A e_j||^2; estimate with the exact diagonal.
    x = jnp.zeros_like(b)

    def nmv(p):
        return matvec_T(matvec(p))

    r = b
    p = r
    rs = jnp.vdot(r, r).real

    def body(carry, _):
        x, r, p, rs = carry
        Ap = nmv(p)
        denom = jnp.vdot(p, Ap).real
        alpha = rs / jnp.where(denom > 0, denom, 1.0)
        alpha = jnp.where(denom > 0, alpha, 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = jnp.vdot(r, r).real
        beta = rs_new / jnp.where(rs > 0, rs, 1.0)
        p = r + beta * p
        return (x, r, p, rs_new), None

    (x, _, _, _), _ = jax.lax.scan(body, (x, r, p, rs), None, length=iters)
    return x


def _cg_spd_from(matvec, x0, r0, iters: int):
    """Shared CG loop for an SPD (or SPSD-with-consistent-rhs) system,
    starting from iterate x0 with residual r0 = rhs - A x0."""
    p = r0
    rs = jnp.vdot(r0, r0).real

    def body(carry, _):
        x, r, p, rs = carry
        Ap = matvec(p)
        denom = jnp.vdot(p, Ap).real
        alpha = jnp.where(denom > 0, rs / jnp.where(denom > 0, denom, 1.0),
                          0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = jnp.vdot(r, r).real
        beta = rs_new / jnp.where(rs > 0, rs, 1.0)
        p = r + beta * p
        return (x, r, p, rs_new), None

    (x, _, _, _), _ = jax.lax.scan(
        body, (x0, r0, p, rs), None, length=iters
    )
    return x


def _cg_spd(matvec, rhs, iters: int):
    """Plain CG from zero."""
    return _cg_spd_from(matvec, jnp.zeros_like(rhs), rhs, iters)


def _cg_spd_warm(matvec, rhs, x0, iters: int):
    """CG warm-started at x0 (used by the matrix-free ADMM x-update,
    where consecutive right-hand sides differ by O(step) and the
    previous solution is an excellent initial iterate)."""
    return _cg_spd_from(matvec, x0, rhs - matvec(x0), iters)


def solve_square(J: jax.Array, rhs: jax.Array, *, transpose: bool = False,
                 cg_iters: int = 40) -> jax.Array:
    """Solve J x = rhs (or J' x = rhs), per-instance ((d, d), (d,))."""
    if J.dtype == jnp.float64:
        M = J.T if transpose else J
        return jnp.linalg.solve(M, rhs)

    if transpose:
        matvec = lambda v: J.T @ v
        matvec_T = lambda v: J @ v
    else:
        matvec = lambda v: J @ v
        matvec_T = lambda v: J.T @ v
    return _cg_normal(matvec, matvec_T, rhs, cg_iters)
