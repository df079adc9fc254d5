"""Batched conic-QP ADMM solver (dense, TPU-first).

Solves   minimize    (1/2) x'Px + q'x
         subject to  Ax + s = b,  s in K

via OSQP-style operator splitting generalized to arbitrary cones: the
constraint is Ax in C with C = {v : b - v in K} and Pi_C(u) = b - Pi_K(b-u).
Replaces the role of SCS/Moreau's native batched solvers in the reference
stack (cvxpylayers SURVEY sections 2.2/3.4) with a design chosen for TPU:

  * all linear algebra is dense and batched — one (n, n) Cholesky
    factorization per rho update feeds the MXU, and every per-iteration
    operation is a matmul or a cone projection (VPU);
  * the iteration runs under lax.while_loop over "epochs" (factor once,
    run `epoch` inner steps, check residuals / adapt rho), so the whole
    solve jits once and vmaps over instance batches — vmap's while_loop
    batching rule provides per-instance convergence masking for free;
  * statuses are returned as codes (with Banjac-et-al-style infeasibility
    certificates from the iterate differences), never raised — required
    for vmap (reference analogue: diffcp.SolverError raised eagerly,
    tests/test_torch.py:299-316; the layer wraps codes into exceptions).

The dual iterate satisfies y in N_C(z) exactly at every iteration (it is a
scaled projection residual), hence y in K* and y's = 0 hold by construction
and only primal/dual residuals drive termination.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..cones.dims import ConeDims
from ..cones.projections import make_cone_projector
from .batched_linalg import spd_inv_via_chol
from .settings import (
    DUAL_INFEASIBLE,
    MAX_ITERS,
    PRIMAL_INFEASIBLE,
    SOLVED,
    SolverSettings,
)


class SolveResult(NamedTuple):
    x: jax.Array        # primal (n,)
    y: jax.Array        # dual, in K* (m,)
    s: jax.Array        # slack, in K (m,)
    status: jax.Array   # int32 status code
    iters: jax.Array    # int32 iteration count
    pobj: jax.Array     # primal objective value (excluding constant offset)


def _cone_row_groups(dims: ConeDims):
    """Row-index -> cone-block id, for pooled (per-block uniform) scaling."""
    import numpy as np

    gid = np.zeros(dims.total, dtype=np.int64)
    g = 0
    off = 0
    for _ in range(dims.zero):
        gid[off] = g
        off += 1
        g += 1
    for _ in range(dims.nonneg):
        gid[off] = g
        off += 1
        g += 1
    for d in dims.soc:
        gid[off:off + d] = g
        off += d
        g += 1
    for _ in range(dims.exp):
        gid[off:off + 3] = g
        off += 3
        g += 1
    for sdim in dims.psd:
        d = sdim * (sdim + 1) // 2
        gid[off:off + d] = g
        off += d
        g += 1
    for _ in dims.pow3:
        gid[off:off + 3] = g
        off += 3
        g += 1
    # numpy, not jnp: this array is captured in the solver closure,
    # which may be built during a jit trace (lazy construction) — a
    # jnp constant created there leaks as a tracer into later traces
    return gid, g


def _ruiz_equilibrate(P, A, q, b, group_ids, n_groups, iters: int):
    """Modified Ruiz equilibration of [[P, A'], [A, 0]] with per-cone-block
    pooling of the row scalings (so scaled slacks stay in K)."""
    n = q.shape[0]
    m = b.shape[0]
    dtype = q.dtype

    def body(_, state):
        P_, A_, q_, b_, D, E, c = state
        # column norms over the stacked [P; A] (x-side)
        col = jnp.maximum(
            jnp.max(jnp.abs(P_), axis=0) if n else jnp.zeros(0, dtype),
            jnp.max(jnp.abs(A_), axis=0) if m else jnp.zeros(n, dtype),
        )
        dx = 1.0 / jnp.sqrt(jnp.where(col > 1e-12, col, 1.0))
        # row norms of [A, 0] (y-side), pooled per cone block via max
        row = jnp.max(jnp.abs(A_), axis=1) if n else jnp.zeros(m, dtype)
        pooled = jax.ops.segment_max(row, group_ids, num_segments=n_groups)
        row = pooled[group_ids] if m else row
        de = 1.0 / jnp.sqrt(jnp.where(row > 1e-12, row, 1.0))
        P_ = dx[:, None] * P_ * dx[None, :]
        A_ = de[:, None] * A_ * dx[None, :]
        q_ = dx * q_
        b_ = de * b_
        # cost scaling: normalize mean column norm of the scaled objective
        pcol = jnp.max(jnp.abs(P_), axis=0) if n else jnp.zeros(0, dtype)
        gamma_den = jnp.maximum(jnp.mean(pcol), jnp.max(jnp.abs(q_)))
        gamma = 1.0 / jnp.where(gamma_den > 1e-12, gamma_den, 1.0)
        P_ = P_ * gamma
        q_ = q_ * gamma
        return P_, A_, q_, b_, D * dx, E * de, c * gamma

    state = (P, A, q, b, jnp.ones(n, dtype), jnp.ones(m, dtype),
             jnp.asarray(1.0, dtype))
    if iters > 0:
        state = jax.lax.fori_loop(0, iters, body, state)
    return state


def make_admm_solver(dims: ConeDims, n: int, settings: SolverSettings,
                     masked_factor: bool = False):
    """Build solve(P, q, A, b, x0, y0, s0) -> SolveResult for fixed
    (dims, n) structure. Fully jit/vmap-compatible.

    masked_factor: replace the per-epoch cholesky + triangular-solve
    custom-calls with the masked matmul-only inverse. Only safe when P
    carries full diagonal curvature (callers pass p_diag_full): with
    P = 0 the Ruiz-scaled M's conditioning (~5e7 on the Markowitz
    class) makes BOTH masked variants produce error structures the
    ADMM iteration cannot absorb (solved 0.09-0.12 measured, Jacobi
    scaling included, while the LAPACK custom-call's error is
    tolerated). On the curvature-complete headline class the masked
    factor removes 5.5 of 27 ms device time per fwd+bwd call
    (box-QP B=1024: 31.7k -> 35.9k solves/s, r5-profiled)."""
    m = dims.total
    proj_K = make_cone_projector(dims)
    # inner-loop fast path: PSD blocks project via the matmul-only NS
    # sign approximation (psd_proj='auto'); statuses, certificates and
    # the polish stay on exact eigh (cones/projections.py r5 note)
    _fast_psd = ("ns" if settings.psd_proj in ("auto", "ns")
                 and dims.psd else "exact")
    proj_K_fast = make_cone_projector(dims, psd_mode=_fast_psd)
    group_ids, n_groups = _cone_row_groups(dims)
    st = settings

    import numpy as _np
    is_eq_row = _np.arange(m) < dims.zero

    def _proj_C_with(pk, u, b):
        return b - pk(b - u)

    def factor(P, A, rho):
        """Explicit inverse of M = P + sigma I + A'RA via Cholesky.

        Computing M^{-1} once per epoch turns every inner-iteration solve
        into a single MXU matmul — on TPU, batched triangular solves are
        LAPACK-shaped and slow, while n x n matmuls are the fast path. M is
        SPD and Ruiz-equilibrated, and ADMM tolerates the slight extra
        rounding (the Newton polish owns final accuracy).

        f32 at masked sizes uses the masked-loop inverse instead of the
        cholesky + 2 triangular-solve custom-calls: the r5 headline
        profile showed those custom-calls at 5.5 of the 27 ms/call
        device time (box-QP B=1024 — ONE epoch means the factor is a
        fifth of the whole fwd+bwd solve)."""
        M = P + st.sigma * jnp.eye(n, dtype=P.dtype) + (A.T * rho) @ A
        if masked_factor and M.dtype != jnp.float64:
            from .batched_linalg import spd_inv_via_chol, use_masked

            if use_masked(n):
                # full-f32 pin (bf16 trap #5, r5): the masked loop's
                # matmuls take bf16 MXU inputs by default, flooring the
                # inverse at ~1e-3 relative — warm-started ADMM then
                # never meets admm_eps internally (mean iters 18 -> 50,
                # the cap). The LAPACK custom-call it replaces is
                # internally full-f32; one pinned (n, n) inverse per
                # epoch costs noise.
                with jax.default_matmul_precision("highest"):
                    return spd_inv_via_chol(M)
        L = jnp.linalg.cholesky(M)
        eye = jnp.eye(n, dtype=P.dtype)
        z_ = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
        return jax.scipy.linalg.solve_triangular(L, z_, lower=True, trans=1)

    def chol_solve(Minv, rhs):
        return Minv @ rhs

    def solve(P, q, A, b, x0, y0, s0):
        dtype = q.dtype
        # f64 (the accuracy route) keeps exact eigh even in the inner
        # loop: the NS soft-threshold band (~1e-3 of ||M||) would cap
        # active-face identification exactly where deep admm_eps
        # targets are used (r5 review) — the same dtype gate as the
        # masked factor
        pk_fast = proj_K if dtype == jnp.float64 else proj_K_fast

        def proj_C(u, b_):
            return _proj_C_with(pk_fast, u, b_)

        P0, A0, q0, b0 = P, A, q, b

        Ps, As, qs, bs, D, E, c = _ruiz_equilibrate(
            P, A, q, b, group_ids, n_groups, st.scaling_iters
        )

        # scaled warm start: x̄ = x/D, z̄ = E (b0 - s), ȳ = c y / E
        x = x0 / D
        z = E * (b0 - s0)
        y = c * y0 / E

        rho0 = jnp.where(
            is_eq_row,
            jnp.asarray(st.rho * st.rho_eq_scale, dtype),
            jnp.asarray(st.rho, dtype),
        )

        def unscaled(xb, zb, yb):
            xu = D * xb
            s_u = (bs - zb) / E
            y_u = (E * yb) / c
            return xu, s_u, y_u

        def residuals(xb, zb, yb):
            xu, s_u, y_u = unscaled(xb, zb, yb)
            Ax = A0 @ xu
            r_p = jnp.max(jnp.abs(Ax + s_u - b0)) if m else jnp.asarray(0.0, dtype)
            p_sc = jnp.maximum(
                jnp.max(jnp.abs(Ax)) if m else 0.0,
                jnp.maximum(
                    jnp.max(jnp.abs(s_u)) if m else 0.0,
                    jnp.max(jnp.abs(b0)) if m else 0.0,
                ),
            )
            Px = P0 @ xu
            Aty = A0.T @ y_u if m else jnp.zeros(n, dtype)
            r_d = jnp.max(jnp.abs(Px + q0 + Aty))
            d_sc = jnp.maximum(
                jnp.max(jnp.abs(Px)),
                jnp.maximum(jnp.max(jnp.abs(Aty)), jnp.max(jnp.abs(q0))),
            )
            # duality gap (r5): infinity-norm residuals alone pass
            # far-from-optimal points on large problems (gap = F1'x -
            # y'F2 scales with |x|_1 |y|_1); convergence requires the
            # gap at admm_eps too, matching the post-polish
            # certificate. The P @ xu matmul must be full-f32 (bf16
            # trap #6, see refine.py): a bf16 xPx reads as a fake
            # ~1e-3-relative gap that keeps converged loops running to
            # the iteration cap on TPU. Px above (for r_d/d_sc) can
            # stay at the default — it feeds scales and an inf-norm,
            # not a cancellation.
            with jax.default_matmul_precision("highest"):
                xPx = xu @ (P0 @ xu)
            pobj = 0.5 * xPx + q0 @ xu
            dobj = -0.5 * xPx - (b0 @ y_u if m
                                 else jnp.asarray(0.0, dtype))
            gap = jnp.abs(pobj - dobj)
            g_sc = jnp.maximum(jnp.abs(pobj), jnp.abs(dobj))
            return r_p, p_sc, r_d, d_sc, gap, g_sc

        def inner(carry, _):
            x_, z_, y_, chol, rho = carry
            rhs = st.sigma * x_ - qs + As.T @ (rho * z_ - y_)
            x_t = chol_solve(chol, rhs)
            z_t = As @ x_t
            x_new = st.alpha * x_t + (1 - st.alpha) * x_
            w = st.alpha * z_t + (1 - st.alpha) * z_ + y_ / rho
            z_new = proj_C(w, bs)
            y_new = rho * (w - z_new)
            return (x_new, z_new, y_new, chol, rho), None

        def run_epoch_plain(x_, z_, y_, chol, rho):
            (x_, z_, y_, _, _), _ = jax.lax.scan(
                inner, (x_, z_, y_, chol, rho), None, length=st.epoch
            )
            return x_, z_, y_

        def run_epoch_aa(x_, z_, y_, chol, rho):
            """Type-II Anderson acceleration on the pre-projection state
            v = [x; w] (w = z + y/rho): (z, y) are always RE-DERIVED from
            w by projection, so the y-in-K* invariant the residuals rely
            on survives the mixing. History is epoch-local (rho changes
            the fixed-point map at epoch boundaries) and restarts
            whenever the residual norm grows — the standard safeguard
            that keeps AA from diverging on the nonsmooth DR map
            (reference analogue: SCS's acceleration_lookback knob,
            cvxpylayers README.md:229-236 pass-through)."""
            L = st.accel_lookback
            d = n + m

            def T(xv, wv):
                zv = proj_C(wv, bs)
                yv = rho * (wv - zv)
                rhs = st.sigma * xv - qs + As.T @ (rho * zv - yv)
                x_t = chol_solve(chol, rhs)
                z_t = As @ x_t
                x_n = st.alpha * x_t + (1 - st.alpha) * xv
                w_n = st.alpha * z_t + (1 - st.alpha) * zv + yv / rho
                return x_n, w_n

            def step(carry, _):
                xv, wv, S, Yb, v_prev, g_prev, gn_prev, k = carry
                x_t, w_t = T(xv, wv)
                v = jnp.concatenate([xv, wv])
                vT = jnp.concatenate([x_t, w_t])
                g = vT - v
                gn = g @ g
                grew = gn > gn_prev
                # history restart on residual growth (safeguard)
                S = jnp.where(grew, 0.0, S)
                Yb = jnp.where(grew, 0.0, Yb)
                # record the (v, g) differences of the last step
                ptr = jnp.mod(k - 1, L)
                has_hist = (k > 0) & ~grew
                S = jnp.where(
                    has_hist, S.at[ptr].set(v - v_prev), S
                )
                Yb = jnp.where(
                    has_hist, Yb.at[ptr].set(g - g_prev), Yb
                )
                # gamma from the Tikhonov-regularized normal equations
                # (zero history rows are inert: reg*gamma_i = 0).
                # L is tiny (5-15): the masked-loop inverse stays
                # custom-call-free inside the scan.
                Gram = Yb @ Yb.T
                reg = 1e-8 * (jnp.trace(Gram) / L) + 1e-30
                Ginv = spd_inv_via_chol(
                    Gram + reg * jnp.eye(L, dtype=dtype)
                )
                gamma = Ginv @ (Yb @ g)
                # second safeguard: a huge mixing vector means the
                # least-squares system is near-singular (history nearly
                # linearly dependent) — the extrapolation is then
                # unreliable; fall back to the plain step
                wild = gamma @ gamma > 100.0
                v_acc = vT - (S + Yb).T @ gamma
                v_next = jnp.where(grew | wild, vT, v_acc)
                gn_track = jnp.where(grew, jnp.asarray(jnp.inf, dtype),
                                     gn.astype(dtype))
                return (v_next[:n], v_next[n:], S, Yb, v, g,
                        gn_track, k + 1), None

            w0 = z_ + y_ / rho
            S0 = jnp.zeros((L, d), dtype)
            Y0 = jnp.zeros((L, d), dtype)
            init = (x_, w0, S0, Y0, jnp.zeros(d, dtype),
                    jnp.zeros(d, dtype), jnp.asarray(jnp.inf, dtype),
                    jnp.asarray(0, jnp.int32))
            (xe, we, *_), _ = jax.lax.scan(
                step, init, None, length=st.epoch
            )
            ze = proj_C(we, bs)
            ye = rho * (we - ze)
            return xe, ze, ye

        def epoch_body(state):
            x_, z_, y_, rho, it, status, _rp, _rd = state
            chol = factor(Ps, As, rho)
            x_prev, y_prev = x_, y_
            x_, z_, y_ = (run_epoch_aa if st.accel_lookback > 0
                          else run_epoch_plain)(x_, z_, y_, chol, rho)
            it = it + st.epoch

            r_p, p_sc, r_d, d_sc, gap, g_sc = residuals(x_, z_, y_)
            eps_p = st.admm_eps_abs + st.admm_eps_rel * p_sc
            eps_d = st.admm_eps_abs + st.admm_eps_rel * d_sc
            eps_g = st.eps_gap_scale * (
                st.admm_eps_abs + st.admm_eps_rel * g_sc
            )
            converged = (r_p <= eps_p) & (r_d <= eps_d) & (gap <= eps_g)

            # ---- infeasibility certificates (unscaled deltas) -------------
            dxu = D * (x_ - x_prev)
            dyu = (E * (y_ - y_prev)) / c
            ny = jnp.max(jnp.abs(dyu)) if m else jnp.asarray(0.0, dtype)
            nx = jnp.max(jnp.abs(dxu))
            safe_ny = jnp.where(ny > 0, ny, 1.0)
            safe_nx = jnp.where(nx > 0, nx, 1.0)
            # primal infeasible: A'dy ~ 0, dy in K*, b'dy < 0
            Atdy = A0.T @ dyu if m else jnp.zeros(n, dtype)
            proj_dual_dy = dyu + proj_K(-dyu)  # Pi_{K*}(dy) via Moreau
            dual_dist = jnp.max(jnp.abs(proj_dual_dy - dyu)) if m else jnp.asarray(0.0, dtype)
            pinf = (
                (ny > 10 * st.eps_infeas)
                & (jnp.max(jnp.abs(Atdy)) <= st.eps_infeas * safe_ny)
                & (dual_dist <= st.eps_infeas * safe_ny)
                & ((b0 @ dyu if m else jnp.asarray(0.0, dtype)) < -st.eps_infeas * safe_ny)
            )
            # dual infeasible: P dx ~ 0, q'dx < 0, A dx in rec(C) = -K
            Adx = A0 @ dxu if m else jnp.zeros(0, dtype)
            rec_dist = (
                jnp.max(jnp.abs(-proj_K(-Adx) - Adx)) if m else jnp.asarray(0.0, dtype)
            )
            dinf = (
                (nx > 10 * st.eps_infeas)
                & (jnp.max(jnp.abs(P0 @ dxu)) <= st.eps_infeas * safe_nx)
                & (rec_dist <= st.eps_infeas * safe_nx)
                & ((q0 @ dxu) < -st.eps_infeas * safe_nx)
            )

            status = jnp.where(
                converged,
                SOLVED,
                jnp.where(pinf, PRIMAL_INFEASIBLE,
                          jnp.where(dinf, DUAL_INFEASIBLE, MAX_ITERS)),
            ).astype(jnp.int32)

            # ---- adaptive rho --------------------------------------------
            if st.adaptive_rho:
                ratio = jnp.sqrt(
                    jnp.maximum(r_p / jnp.where(p_sc > 1e-12, p_sc, 1.0), 1e-10)
                    / jnp.maximum(r_d / jnp.where(d_sc > 1e-12, d_sc, 1.0), 1e-10)
                )
                ratio = jnp.clip(
                    ratio, 1.0 / st.adaptive_rho_clamp, st.adaptive_rho_clamp
                )
                update = (ratio > st.adaptive_rho_tol) | (
                    ratio < 1.0 / st.adaptive_rho_tol
                )
                rho = jnp.where(
                    update,
                    jnp.clip(rho * ratio, st.rho_min, st.rho_max),
                    rho,
                )

            return x_, z_, y_, rho, it, status, r_p, r_d

        def cond(state):
            _x, _z, _y, _rho, it, status, _rp, _rd = state
            return (status == MAX_ITERS) & (it < st.max_iters)

        init = (
            x, z, y,
            rho0, jnp.asarray(0, jnp.int32),
            jnp.asarray(MAX_ITERS, jnp.int32),
            jnp.asarray(jnp.inf, dtype), jnp.asarray(jnp.inf, dtype),
        )
        x_, z_, y_, rho, it, status, r_p, r_d = jax.lax.while_loop(
            cond, lambda s_: epoch_body(s_), init
        )

        xu, s_u, y_u = unscaled(x_, z_, y_)
        pobj = 0.5 * xu @ (P0 @ xu) + q0 @ xu
        return SolveResult(
            x=xu, y=y_u, s=s_u, status=status, iters=it, pobj=pobj
        )

    return solve
