"""Implicit differentiation of the cone program solution map.

custom_vjp around the (ADMM + Newton-polish) solve: the backward pass
applies the implicit function theorem to the KKT residual map F(x, w) = 0
(solver/kkt.py), solving one transposed linear system per cotangent and
assembling gradients w.r.t. the dense problem data (P, q, A, b):

    [u; v] = -J^{-T} [g_x ; (D-I)' g_y + D' g_s]
    dq = u,  db = -v,  dP = u x',  dA = y u' + v x'

This is the role of diffcp's C++ adjoint / diffqcp's DeviceQCP.vjp in the
reference stack (cvxpylayers interfaces/diffcp_if.py:73-96,
cuclarabel_if.py:340-403; papers arXiv 1904.09043 and 2508.17522), computed
at the primal-dual solution directly rather than through the homogeneous
self-dual embedding, and reusing the forward polish Jacobian.

Everything downstream of the dense (P, q, A, b) — the scatter from
parameter-affine value vectors, batching, variable recovery — is plain
differentiable JAX, so this is the only custom rule in the framework.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..cones.dims import ConeDims
from ..solver.kkt import make_kkt, make_kkt_solver
from ..solver.refine import make_polished_solver
from ..solver.settings import SolverSettings


def make_diff_solver(dims: ConeDims, n: int, settings: SolverSettings,
                     p_diag_full: bool = True, p_diag_only: bool = False,
                     p_zero: bool = False):
    """Returns solve(P, q, A, b, x0, y0, s0) -> (x, y, s, status, iters)
    with implicit-diff gradients w.r.t. (P, q, A, b).

    p_diag_full: static flag — True iff P's diagonal is structurally
    complete (every variable column carries curvature); routes the f32
    KKT solves between the exact Schur split and CG-normal (kkt.py).
    p_zero: static flag — True iff P is structurally zero (no quadratic
    objective); lets the IPM take the homogeneous self-dual embedding
    (settings.ipm_mode)."""
    m = dims.total
    if settings.solve_method == "ipm":
        from ..solver.ipm import make_ipm_solver

        if settings.ipm_mode == "hsde" and not p_zero:
            raise ValueError(
                "ipm_mode='hsde' requires a problem with no quadratic "
                "objective (the homogeneous self-dual embedding is a "
                "conic-LP formulation); drop ipm_mode or the quadratic."
            )
        # auto: the embedding is the default only for SYMMETRIC cone
        # problems (nonneg/SOC/PSD — exact NT scalings); for exp/pow the
        # primal-dual form measured more robust in f32 (one of four
        # softmax instances regressed under hsde), so nonsymmetric
        # problems keep it unless hsde is forced
        symmetric = dims.exp == 0 and not dims.pow3
        hsde = p_zero and (
            settings.ipm_mode == "hsde"
            or (settings.ipm_mode == "auto" and symmetric)
        )
        # full polish budget: in f32 the IPM can stall ~1e-5 short near
        # active SOC boundaries (NT scalings lose precision); the
        # kink-escaping semismooth Newton finishes the job
        base = make_polished_solver(
            dims, n, settings,
            base=make_ipm_solver(dims, n, settings, hsde=hsde),
            p_diag_full=p_diag_full, p_diag_only=p_diag_only,
        )
    elif settings.solve_method == "pdhg":
        from ..solver.pdhg import make_pdhg_solver

        if not p_zero:
            raise ValueError(
                "solve_method='pdhg' requires a problem with no "
                "quadratic objective (PDHG's x-update is a gradient "
                "step); use 'admm' (default) or 'ipm'."
            )
        base = make_polished_solver(
            dims, n, settings,
            base=make_pdhg_solver(dims, n, settings),
            p_diag_full=p_diag_full, p_diag_only=p_diag_only,
        )
    else:
        base = make_polished_solver(dims, n, settings,
                                    p_diag_full=p_diag_full,
                                    p_diag_only=p_diag_only,
                                    # structural curvature flag from
                                    # the stuffer, NOT the routing
                                    # default — see refine.py
                                    masked_factor=p_diag_full)
    _, jacobian, _ = make_kkt(dims, n)
    kkt_solve = make_kkt_solver(dims, n, cg_iters=settings.cg_iters,
                                schur_iters=settings.schur_iters,
                                p_diag_full=p_diag_full,
                                p_diag_only=p_diag_only,
                                kkt_mode=settings.kkt_mode)

    def _forward(P, q, A, b, x0, y0, s0):
        res = base(P, q, A, b, x0, y0, s0)
        return res.x, res.y, res.s, res.status, res.iters

    @jax.custom_vjp
    def solve(P, q, A, b, x0, y0, s0):
        return _forward(P, q, A, b, x0, y0, s0)

    def solve_fwd(P, q, A, b, x0, y0, s0):
        out = _forward(P, q, A, b, x0, y0, s0)
        x, y, s = out[0], out[1], out[2]
        return out, (x, y, s, P, q, A, b)

    def solve_bwd(saved, cotangents):
        x, y, s, P, q, A, b = saved
        dx, dy, ds = cotangents[0], cotangents[1], cotangents[2]
        # status/iters cotangents are symbolic zeros (int outputs)
        w = s - y
        from ..cones.jacobians import make_cone_dproj_apply

        dapply = make_cone_dproj_apply(dims)
        g_x = dx
        # (D - I)' dy + D' ds with D symmetric block-diagonal
        g_w = dapply(w, dy + ds) - dy
        rhs = jnp.concatenate([g_x, g_w])
        # iter_refine: the solve accuracy IS the gradient accuracy — one
        # refinement step lifts f32/TPU-bf16 directions to ~1e-6 relative
        uv = -kkt_solve(x, w, P, q, A, b, rhs, transpose=True,
                        iter_refine=rhs.dtype != jnp.float64)
        uv = jnp.where(jnp.all(jnp.isfinite(uv)), uv, 0.0)
        u = uv[:n]
        v = uv[n:]
        dq = u
        db = -v
        # dP is the VJP of the *literal* residual map F1 = P x + ... (no
        # symmetrization: P-as-symmetric parametrizations chain through the
        # caller's own construction of P from its storage)
        dP = jnp.outer(u, x)
        dA = jnp.outer(y, u) + jnp.outer(v, x)
        zeros = (jnp.zeros_like(x), jnp.zeros_like(y), jnp.zeros_like(s))
        return (dP, dq, dA, db) + zeros

    solve.defvjp(solve_fwd, solve_bwd)
    if settings.derivative != "forward":
        return solve

    # ---- forward-mode (JVP) variant: diffcp's `derivative` direction
    # (reference interfaces/diffcp_if.py solve_and_derivative returns BOTH
    # a forward derivative and the adjoint; the adjoint is the custom_vjp
    # above). The IFT on the same residual map gives, for data tangents
    # (dP, dq, dA, db):
    #     J [dx_t; dw_t] = -[dP x + dq + dA' y ; dA x - db]
    # then ds_t = D dw_t and dy_t = (D - I) dw_t. Enables jax.jvp /
    # jax.jacfwd through the layer (per-instance solution Jacobians).
    import numpy as _np

    from ..cones.jacobians import make_cone_dproj_apply

    dapply_j = make_cone_dproj_apply(dims)

    @jax.custom_jvp
    def solve_j(P, q, A, b, x0, y0, s0):
        return _forward(P, q, A, b, x0, y0, s0)

    @solve_j.defjvp
    def solve_j_jvp(primals, tangents):
        P, q, A, b, x0, y0, s0 = primals
        dP, dq, dA, db = tangents[0], tangents[1], tangents[2], tangents[3]
        # warm-start tangents are ignored: the solution map does not
        # depend on the initialization
        out = _forward(P, q, A, b, x0, y0, s0)
        x, y, s, status, iters = out

        def _mat(t, like):
            return (jnp.zeros_like(like)
                    if isinstance(t, jax.custom_derivatives.SymbolicZero)
                    else t)

        dP = _mat(dP, P)
        dq = _mat(dq, q)
        dA = _mat(dA, A)
        db = _mat(db, b)
        w = s - y
        dF1 = dP @ x + dq + (dA.T @ y if m else jnp.zeros(n, x.dtype))
        dF2 = (dA @ x - db) if m else jnp.zeros(0, x.dtype)
        rhs = jnp.concatenate([dF1, dF2])
        duv = -kkt_solve(x, w, P, q, A, b, rhs, transpose=False,
                         iter_refine=rhs.dtype != jnp.float64)
        duv = jnp.where(jnp.all(jnp.isfinite(duv)), duv, 0.0)
        dx = duv[:n]
        dw = duv[n:]
        Ddw = dapply_j(w, dw)
        ds = Ddw
        dy = Ddw - dw
        f0 = jax.dtypes.float0
        dstatus = _np.zeros(status.shape, f0)
        diters = _np.zeros(iters.shape, f0)
        return out, (dx, dy, ds, dstatus, diters)

    return solve_j
