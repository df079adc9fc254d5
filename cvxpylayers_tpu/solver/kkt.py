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
        # F is a catastrophic cancellation (O(1) operands, near-zero
        # result); TPU's default bf16 matmul inputs floor it at ~1e-3,
        # which silently caps the whole polish. Force full f32 here —
        # residual evals are a tiny fraction of polish matvecs.
        with jax.default_matmul_precision("highest"):
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


def make_kkt_solver(dims: ConeDims, n: int, cg_iters: int = 40,
                    schur_iters=None, p_diag_full: bool = True):
    """Solve J(x,w) delta = rhs (or J' delta = rhs).

    f64: dense J + exact LU.

    f32 (TPU), polyhedral cones: the generalized Jacobian's D block is a
    0/1 diagonal (zero rows: 0; nonneg rows: 1[w>0]), so the system
    reduces EXACTLY to a saddle problem on (v1, v2_inactive):

        [[P, -+A_0'], [A_0, 0]] — A_0 the inactive (d=0) rows —

    solved by a range-space Schur split: one small (n x n) Cholesky
    explicit inverse of P + sigma I (MXU-friendly, same trick as the
    ADMM factor) plus CG on S = A_0 Pinv A_0' (dimension m, condition
    number of A Pinv A' — NOT squared like the normal equations), with
    masked rows identity-padded to keep shapes static. This replaces
    ~40 normal-equation CG iterations of 5 einsums each with ~18
    iterations of 3, and it is exact rather than least-squares.

    f32, general cones: matvec-only CG on the normal equations — D is
    symmetric block-diagonal, so J/J' matvecs cost O(mn + sum block^2)
    and the (n+m)^2 Jacobian is never materialized (solver/linsolve.py
    has the measured motivation)."""
    from ..cones.jacobians import make_cone_dproj_factored
    from .linsolve import _cg_normal, _cg_spd

    m = dims.total
    _, jacobian, _ = make_kkt(dims, n)
    dfactor, dapply_f = make_cone_dproj_factored(dims)
    # The Schur split regularizes P with sigma ~ 1e-6 and computes
    # v1 = (P + sigma I)^{-1}(r1 + A0'u); along null(P) that is a 1/sigma
    # amplification of f32 cancellation noise (~1e-7 -> ~1e-1 relative
    # direction error), which stalls the polish on LPs and on problems
    # whose epigraph aux columns carry no curvature. Callers pass
    # p_diag_full=False when P's diagonal is structurally incomplete
    # (static info from the stuffer) to route those to the implicitly
    # regularized CG-on-normal-equations path instead — measured on the
    # LAD LP bench: solved fraction 0.12 -> 0.97 at equal throughput.
    polyhedral = dims.is_polyhedral() and p_diag_full
    n_zero = dims.zero
    if not schur_iters:
        # auto: CG on the unsquared Schur system converges in about the
        # active-set size worth of iterations; measured to hit the f32
        # floor by ~8 on bench-shaped QPs — 15 leaves margin
        schur_iters = max(10, min(25, n // 4 + 8))

    def solve_polyhedral(x, w, P, q, A, b, rhs, transpose):
        dtype = rhs.dtype
        r1 = rhs[:n]
        r2 = rhs[n:]
        # active mask d (rows where the projection derivative is 1)
        row = jnp.arange(m)
        d = jnp.where(row < n_zero, 0.0, (w > 0).astype(dtype))
        inact = 1.0 - d  # rows entering the saddle system
        # Pinv via Cholesky explicit inverse (n x n, cheap on MXU)
        sig = 1e-6 * (jnp.trace(P) / n + 1.0)
        L = jnp.linalg.cholesky(P + sig * jnp.eye(n, dtype=dtype))
        eye = jnp.eye(n, dtype=dtype)
        Li = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
        Pinv = Li.T @ Li

        def S_mv(v):
            # masked Schur matvec, identity on active rows
            av = A.T @ (inact * v)
            return inact * (A @ (Pinv @ av)) + d * v

        if not transpose:
            # [[P, -A_0'], [A_0, 0]] [v1; u] = [r1; r2_0]
            # -> S u = r2_0 - A_0 Pinv r1,  v1 = Pinv (r1 + A_0' u)
            rhs_u = inact * r2 - inact * (A @ (Pinv @ r1))
            u = _cg_spd(S_mv, rhs_u, schur_iters)
            v1 = Pinv @ (r1 + A.T @ (inact * u))
            # active rows: v2 = r2 - A v1; inactive rows: v2 = u
            v2 = d * (r2 - A @ v1) + inact * u
            return jnp.concatenate([v1, v2])

        # J' [v1; v2] = r: active rows give v2 = r2 directly; the
        # saddle is [[P, A_0'], [A_0, 0]] [v1; u] = [r1 - A_1' r2_1;
        # -r2_0]  ->  S u = A_0 Pinv rhs1 + r2_0, v1 = Pinv(rhs1-A_0'u)
        rhs1 = r1 - A.T @ (d * r2)
        rhs_u = inact * (A @ (Pinv @ rhs1)) + inact * r2
        u = _cg_spd(S_mv, rhs_u, schur_iters)
        v1 = Pinv @ (rhs1 - A.T @ (inact * u))
        v2 = d * r2 + inact * u
        return jnp.concatenate([v1, v2])

    def solve(x, w, P, q, A, b, rhs, transpose=False,
              regularized=False, iter_refine=False):
        if rhs.dtype == jnp.float64:
            J = jacobian(x, w, P, q, A, b)
            M = J.T if transpose else J

            def _reg_lstsq(_=None):
                # Tikhonov-regularized least squares: robust when strict
                # complementarity fails and J is numerically singular
                # (weakly active constraints, or degenerate epigraph aux
                # like sum_largest's t-interval, make the generalized
                # Jacobian rank-deficient) — the same convention as
                # diffcp's LSQR adjoint for non-invertible KKT systems
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

            if regularized:
                return _reg_lstsq()
            sol = jnp.linalg.solve(M, rhs)
            # singular J -> LU yields NaN/garbage; detect via finiteness +
            # true residual and fall back to the damped least squares
            sol_ok = jnp.where(jnp.isfinite(sol), sol, 0.0)
            resid = jnp.linalg.norm(M @ sol_ok - rhs)
            good = jnp.all(jnp.isfinite(sol)) & (
                resid <= 1e-6 * (jnp.linalg.norm(rhs) + 1.0)
            )
            return jax.lax.cond(good, lambda _: sol_ok, _reg_lstsq, None)

        # factor the projection Jacobian ONCE per solve: w is fixed for
        # every CG matvec, and the exp/pow root-finds + PSD eigh hidden
        # in an unfactored dapply dominated polish latency when recomputed
        # per matvec (XLA does not hoist them out of the CG scan)
        dstate = dfactor(w)

        def mv(v):
            v1, v2 = v[:n], v[n:]
            Dv2 = dapply_f(dstate, v2)
            return jnp.concatenate(
                [P @ v1 + A.T @ (Dv2 - v2), A @ v1 + Dv2]
            )

        def mvT(u):
            u1, u2 = u[:n], u[n:]
            Au1 = A @ u1
            return jnp.concatenate(
                [P @ u1 + A.T @ u2, dapply_f(dstate, Au1 + u2) - Au1]
            )

        def solve_once(r):
            if polyhedral:
                return solve_polyhedral(x, w, P, q, A, b, r, transpose)
            # general cones: run the CG matvecs at full f32 — the
            # normal equations square the conditioning, and bf16
            # matvec noise was observed to pin exp-cone polishes at
            # ~1e-3 on TPU; these problems are matvec-latency-bound,
            # so the 3-pass f32 matmul costs little
            a, aT = (mvT, mv) if transpose else (mv, mvT)
            with jax.default_matmul_precision("highest"):
                return _cg_normal(a, aT, r, cg_iters)

        sol = solve_once(rhs)
        if iter_refine:
            # one step of iterative refinement with the true-precision
            # residual: directions from bf16 matvecs carry ~1e-3 relative
            # error, which squares away after one correction — used by
            # the backward pass, where the solve accuracy IS the
            # gradient accuracy
            with jax.default_matmul_precision("highest"):
                resid = rhs - (mvT(sol) if transpose else mv(sol))
            sol = sol + solve_once(resid)
        return sol

    return solve
