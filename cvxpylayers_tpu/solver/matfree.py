"""Matrix-free (static-pattern sparse) large-instance solver route.

The dense route (solver/admm.py + kkt.py) scatters each instance's data
into dense (n, n) P and (m, n) A and factorizes per epoch — the right
call at bench sizes (n ~ 50-150), where batched matmuls own the MXU. At
reference scale (n ~ 10^3..10^5 — the problems diffcp hands to
SCS/Clarabel as scipy CSC per instance, cvxpylayers
interfaces/diffcp_if.py:46-70) the dense assembly alone is O(mn) per
instance and every factorization is a giant batched linalg custom-call
(measured 100-1000x off matmul speed-of-light on this TPU backend).

This module keeps the problem data in its canonical fixed-sparsity form
(the stuffer's A_rows/A_cols/P_rows/P_cols patterns + per-instance value
vectors) and replaces every factorization with warm-started CG:

  * SpMV/SpMV' as gather + sorted segment-sum over static index arrays —
    O(nnz) HBM traffic, fully batchable under vmap, and (unlike dense
    matmuls) immune to the TPU bf16-input precision trap because the
    products are elementwise;
  * the ADMM x-update solves (P + sigma I + A' diag(rho) A) x = rhs by
    CG warm-started at the previous iterate (SCS's "indirect" mode,
    re-designed around lax.scan);
  * the semismooth-Newton polish and the implicit-diff backward pass
    share the generic loop in solver/refine.py, with KKT solves running
    CG on the normal equations through operator matvecs (for problems
    with structurally diagonal P — the sum_squares class — the exact
    polyhedral Schur split survives matrix-free, since (P + sig I)^{-1}
    is elementwise);
  * the backward pass assembles gradients at the nnz positions only:
    dA_data[k] = y[r_k] u[c_k] + v[r_k] x[c_k] — never an (m, n) outer
    product.

Everything upstream (parameter -> data value vectors) and downstream
(variable recovery) is unchanged; the layer picks this route when the
dense per-instance footprint m*n crosses _DENSE_ASSEMBLY_LIMIT (or
explicitly via solver_args={"assembly": "sparse"}).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..cones.dims import ConeDims
from ..cones.jacobians import make_cone_dproj_apply, make_cone_dproj_factored
from ..cones.projections import make_cone_projector
from .admm import SolveResult, _cone_row_groups
from .linsolve import _cg_normal, _cg_spd, _cg_spd_warm
from .settings import (
    DUAL_INFEASIBLE,
    MAX_ITERS,
    PRIMAL_INFEASIBLE,
    SOLVED,
    SolverSettings,
)

# dense per-instance assembly above this m*n footprint switches the layer
# to this route (~(256)^2; at bench sizes the dense route measures faster)
_DENSE_ASSEMBLY_LIMIT = 1 << 16


class SparseOps:
    """Static-pattern sparse matvec operators for A (m, n) and P (n, n).

    All index arrays are host numpy computed once at layer build; the
    jitted closures capture them as constants. A's pattern arrives in CSR
    order from the stuffer (sorted by (row, col)), so the forward SpMV's
    segment-sum is sorted; the transpose uses a precomputed stable
    argsort by column so its segment-sum is sorted too. P is stored with
    both symmetric halves (stuffer convention), so P_mv is symmetric by
    construction.
    """

    def __init__(self, A_rows, A_cols, m: int, n: int, P_rows, P_cols):
        self.m = int(m)
        self.n = int(n)
        self.nnz_A = int(len(A_rows))
        self.nnz_P = int(len(P_rows))
        # NUMPY constants, never jnp: the layer builds this object
        # lazily, possibly inside an outer jit trace (e.g. a user's
        # jitted training step) — a jnp array created there is a tracer
        # of THAT trace and poisons every later one ("No constant
        # handler for DynamicJaxprTracer"). numpy operands embed as
        # fresh XLA constants per trace.
        self._ar = np.asarray(A_rows, np.int32)
        self._ac = np.asarray(A_cols, np.int32)
        perm = np.argsort(np.asarray(A_cols), kind="stable")
        self._a_perm = perm.astype(np.int32)
        self._ar_t = np.asarray(A_rows)[perm].astype(np.int32)
        self._ac_t = np.asarray(A_cols)[perm].astype(np.int32)
        self._pr = np.asarray(P_rows, np.int32)
        self._pc = np.asarray(P_cols, np.int32)
        # diagonal mask for P_diag/P_trace. NOTE: the layer's
        # _p_diag_only (FULL diagonal present and nothing else) is the
        # flag that picks the polyhedral KKT fast path — an
        # all-diagonal-but-incomplete P deliberately does NOT qualify
        # (its missing entries would invert to 1/sigma), so no
        # per-object p_diag_only is derived here.
        diag_mask = np.asarray(P_rows) == np.asarray(P_cols)
        self._p_diag_mask = diag_mask.astype(np.float64)

    # ---------------------------------------------------------- A matvecs

    def A_mv(self, A_data, x):
        if self.m == 0 or self.nnz_A == 0:
            return jnp.zeros(self.m, x.dtype)
        return jax.ops.segment_sum(
            A_data * x[self._ac], self._ar, num_segments=self.m,
            indices_are_sorted=True,
        )

    def A_rmv(self, A_data, y):
        if self.nnz_A == 0:
            return jnp.zeros(self.n, y.dtype)
        dp = A_data[self._a_perm]
        return jax.ops.segment_sum(
            dp * y[self._ar_t], self._ac_t, num_segments=self.n,
            indices_are_sorted=True,
        )

    # ---------------------------------------------------------- P matvecs

    def P_mv(self, P_data, x):
        if self.nnz_P == 0:
            return jnp.zeros(self.n, x.dtype)
        return jax.ops.segment_sum(
            P_data * x[self._pc], self._pr, num_segments=self.n,
            indices_are_sorted=True,
        )

    def P_diag(self, P_data):
        """Structural diagonal of P as an (n,) vector (zeros where the
        pattern has no diagonal entry)."""
        if self.nnz_P == 0:
            return jnp.zeros(self.n, P_data.dtype)
        mask = self._p_diag_mask.astype(P_data.dtype)
        return jax.ops.segment_sum(
            P_data * mask, self._pr, num_segments=self.n,
            indices_are_sorted=True,
        )

    def P_trace(self, P_data):
        if self.nnz_P == 0:
            return jnp.asarray(0.0, P_data.dtype)
        return jnp.sum(P_data * self._p_diag_mask.astype(P_data.dtype))

    # ----------------------------------------------------- Ruiz reductions

    def A_col_max(self, absdata):
        if self.nnz_A == 0:
            return jnp.zeros(self.n, absdata.dtype)
        return jnp.maximum(
            jax.ops.segment_max(absdata, self._ac, num_segments=self.n),
            0.0,
        )

    def A_row_max(self, absdata):
        if self.m == 0 or self.nnz_A == 0:
            return jnp.zeros(self.m, absdata.dtype)
        return jnp.maximum(
            jax.ops.segment_max(absdata, self._ar, num_segments=self.m,
                                indices_are_sorted=True),
            0.0,
        )

    def P_col_max(self, absdata):
        if self.nnz_P == 0:
            return jnp.zeros(self.n, absdata.dtype)
        return jnp.maximum(
            jax.ops.segment_max(absdata, self._pc, num_segments=self.n),
            0.0,
        )

    # ---------------------------------------------------------- scalings

    def scale_A(self, A_data, de, dx):
        if self.nnz_A == 0:
            return A_data
        return A_data * de[self._ar] * dx[self._ac]

    def scale_P(self, P_data, dx):
        if self.nnz_P == 0:
            return P_data
        return P_data * dx[self._pr] * dx[self._pc]

    # ------------------------------------------------------ backward VJPs

    def A_data_grad(self, y, u, v, x):
        """VJP into A_data of F1 = ... + A'y (cotangent u) and F2 = Ax
        (cotangent v): dA[i, j] = y_i u_j + v_i x_j at nnz only."""
        if self.nnz_A == 0:
            return jnp.zeros(0, x.dtype)
        return y[self._ar] * u[self._ac] + v[self._ar] * x[self._ac]

    def P_data_grad(self, u, x):
        """VJP into P_data of F1 = Px (cotangent u): dP[i, j] = u_i x_j
        at nnz only (pattern stores both symmetric halves)."""
        if self.nnz_P == 0:
            return jnp.zeros(0, x.dtype)
        return u[self._pr] * x[self._pc]


# ------------------------------------------------------------------- ADMM


def _ruiz_equilibrate_matfree(ops: SparseOps, P_data, A_data, q, b,
                              group_ids, n_groups, iters: int):
    """Modified Ruiz equilibration on the data vectors (same algorithm as
    admm._ruiz_equilibrate, with max-reductions via segment ops)."""
    n, m = ops.n, ops.m
    dtype = q.dtype

    def body(_, state):
        Pd, Ad, q_, b_, D, E, c = state
        col = jnp.maximum(ops.P_col_max(jnp.abs(Pd)),
                          ops.A_col_max(jnp.abs(Ad)))
        dx = 1.0 / jnp.sqrt(jnp.where(col > 1e-12, col, 1.0))
        row = ops.A_row_max(jnp.abs(Ad))
        if m:
            pooled = jax.ops.segment_max(row, group_ids,
                                         num_segments=n_groups)
            row = jnp.maximum(pooled[group_ids], 0.0)
        de = 1.0 / jnp.sqrt(jnp.where(row > 1e-12, row, 1.0))
        Pd = ops.scale_P(Pd, dx)
        Ad = ops.scale_A(Ad, de, dx)
        q_ = dx * q_
        b_ = de * b_
        pcol = ops.P_col_max(jnp.abs(Pd))
        gamma_den = jnp.maximum(jnp.mean(pcol), jnp.max(jnp.abs(q_)))
        gamma = 1.0 / jnp.where(gamma_den > 1e-12, gamma_den, 1.0)
        Pd = Pd * gamma
        q_ = q_ * gamma
        return Pd, Ad, q_, b_, D * dx, E * de, c * gamma

    state = (P_data, A_data, q, b, jnp.ones(n, dtype), jnp.ones(m, dtype),
             jnp.asarray(1.0, dtype))
    if iters > 0:
        state = jax.lax.fori_loop(0, iters, body, state)
    return state


def make_matfree_admm_solver(ops: SparseOps, dims: ConeDims, n: int,
                             settings: SolverSettings):
    """solve(P_data, q, A_data, b, x0, y0, s0) -> SolveResult, never
    materializing (m, n) or (n, n) matrices and never factorizing: the
    x-update runs `linsys_iters` warm-started CG steps on
    M = P + sigma I + A' diag(rho) A (matvec-only)."""
    m = dims.total
    proj_K = make_cone_projector(dims)
    # inner-loop fast PSD path — see solver/admm.py (residual checks
    # and certificates keep exact eigh)
    _fast_psd = ("ns" if settings.psd_proj in ("auto", "ns")
                 and dims.psd else "exact")
    proj_K_fast = make_cone_projector(dims, psd_mode=_fast_psd)
    # numpy, not jnp: this solver is built lazily, possibly inside a jit
    # trace (see SparseOps) — jnp constants created here would leak
    group_ids, n_groups = _cone_row_groups(dims)
    st = settings

    is_eq_row = np.arange(m) < dims.zero

    def _proj_C_with(pk, u, b):
        return b - pk(b - u)

    def solve(P_data, q, A_data, b, x0, y0, s0):
        dtype = q.dtype
        # f64 keeps exact eigh in the inner loop (see solver/admm.py)
        pk_fast = proj_K if dtype == jnp.float64 else proj_K_fast

        def proj_C(u, b_):
            return _proj_C_with(pk_fast, u, b_)

        Pd0, Ad0, q0, b0 = P_data, A_data, q, b

        Pds, Ads, qs, bs, D, E, c = _ruiz_equilibrate_matfree(
            ops, P_data, A_data, q, b, group_ids, n_groups,
            st.scaling_iters,
        )

        x = x0 / D
        z = E * (b0 - s0)
        y = c * y0 / E

        rho0 = jnp.where(
            jnp.asarray(is_eq_row),
            jnp.asarray(st.rho * st.rho_eq_scale, dtype),
            jnp.asarray(st.rho, dtype),
        ) if m else jnp.zeros(0, dtype)

        def unscaled(xb, zb, yb):
            xu = D * xb
            s_u = (bs - zb) / E
            y_u = (E * yb) / c
            return xu, s_u, y_u

        def residuals(xb, zb, yb):
            xu, s_u, y_u = unscaled(xb, zb, yb)
            Ax = ops.A_mv(Ad0, xu)
            r_p = (jnp.max(jnp.abs(Ax + s_u - b0)) if m
                   else jnp.asarray(0.0, dtype))
            p_sc = jnp.maximum(
                jnp.max(jnp.abs(Ax)) if m else 0.0,
                jnp.maximum(
                    jnp.max(jnp.abs(s_u)) if m else 0.0,
                    jnp.max(jnp.abs(b0)) if m else 0.0,
                ),
            )
            Px = ops.P_mv(Pd0, xu)
            Aty = ops.A_rmv(Ad0, y_u) if m else jnp.zeros(n, dtype)
            r_d = jnp.max(jnp.abs(Px + q0 + Aty))
            d_sc = jnp.maximum(
                jnp.max(jnp.abs(Px)),
                jnp.maximum(jnp.max(jnp.abs(Aty)), jnp.max(jnp.abs(q0))),
            )
            # duality gap (r5) — see solver/admm.py residuals: required
            # for convergence at matfree scale, where infinity-norm
            # residuals bound nothing
            xPx = xu @ Px
            pobj = 0.5 * xPx + q0 @ xu
            dobj = -0.5 * xPx - (b0 @ y_u if m
                                 else jnp.asarray(0.0, dtype))
            gap = jnp.abs(pobj - dobj)
            g_sc = jnp.maximum(jnp.abs(pobj), jnp.abs(dobj))
            return r_p, p_sc, r_d, d_sc, gap, g_sc

        def M_mv(v, rho):
            Av = ops.A_mv(Ads, v)
            return (ops.P_mv(Pds, v) + st.sigma * v
                    + (ops.A_rmv(Ads, rho * Av) if m
                       else jnp.zeros(n, dtype)))

        def inner(carry, _):
            x_, z_, y_, xt, rho = carry
            rhs = st.sigma * x_ - qs + (
                ops.A_rmv(Ads, rho * z_ - y_) if m else jnp.zeros(n, dtype)
            )
            x_t = _cg_spd_warm(lambda v: M_mv(v, rho), rhs, xt,
                               st.linsys_iters)
            z_t = ops.A_mv(Ads, x_t)
            x_new = st.alpha * x_t + (1 - st.alpha) * x_
            w = st.alpha * z_t + (1 - st.alpha) * z_ + (
                y_ / rho if m else jnp.zeros(0, dtype)
            )
            z_new = proj_C(w, bs)
            y_new = rho * (w - z_new)
            return (x_new, z_new, y_new, x_t, rho), None

        def epoch_body(state):
            x_, z_, y_, xt, rho, it, status, _rp, _rd = state
            x_prev, y_prev = x_, y_
            (x_, z_, y_, xt, _), _ = jax.lax.scan(
                inner, (x_, z_, y_, xt, rho), None, length=st.epoch
            )
            it = it + st.epoch

            r_p, p_sc, r_d, d_sc, gap, g_sc = residuals(x_, z_, y_)
            eps_p = st.admm_eps_abs + st.admm_eps_rel * p_sc
            eps_d = st.admm_eps_abs + st.admm_eps_rel * d_sc
            eps_g = st.eps_gap_scale * (
                st.admm_eps_abs + st.admm_eps_rel * g_sc
            )
            converged = (r_p <= eps_p) & (r_d <= eps_d) & (gap <= eps_g)

            # infeasibility certificates (unscaled deltas), exactly the
            # dense admm's Banjac-et-al tests through SpMVs
            dxu = D * (x_ - x_prev)
            dyu = (E * (y_ - y_prev)) / c
            ny = jnp.max(jnp.abs(dyu)) if m else jnp.asarray(0.0, dtype)
            nx = jnp.max(jnp.abs(dxu))
            safe_ny = jnp.where(ny > 0, ny, 1.0)
            safe_nx = jnp.where(nx > 0, nx, 1.0)
            Atdy = ops.A_rmv(Ad0, dyu) if m else jnp.zeros(n, dtype)
            proj_dual_dy = dyu + proj_K(-dyu)
            dual_dist = (jnp.max(jnp.abs(proj_dual_dy - dyu)) if m
                         else jnp.asarray(0.0, dtype))
            pinf = (
                (ny > 10 * st.eps_infeas)
                & (jnp.max(jnp.abs(Atdy)) <= st.eps_infeas * safe_ny)
                & (dual_dist <= st.eps_infeas * safe_ny)
                & ((b0 @ dyu if m else jnp.asarray(0.0, dtype))
                   < -st.eps_infeas * safe_ny)
            )
            Adx = ops.A_mv(Ad0, dxu) if m else jnp.zeros(0, dtype)
            rec_dist = (jnp.max(jnp.abs(-proj_K(-Adx) - Adx)) if m
                        else jnp.asarray(0.0, dtype))
            dinf = (
                (nx > 10 * st.eps_infeas)
                & (jnp.max(jnp.abs(ops.P_mv(Pd0, dxu)))
                   <= st.eps_infeas * safe_nx)
                & (rec_dist <= st.eps_infeas * safe_nx)
                & ((q0 @ dxu) < -st.eps_infeas * safe_nx)
            )

            status = jnp.where(
                converged,
                SOLVED,
                jnp.where(pinf, PRIMAL_INFEASIBLE,
                          jnp.where(dinf, DUAL_INFEASIBLE, MAX_ITERS)),
            ).astype(jnp.int32)

            if st.adaptive_rho and m:
                ratio = jnp.sqrt(
                    jnp.maximum(r_p / jnp.where(p_sc > 1e-12, p_sc, 1.0),
                                1e-10)
                    / jnp.maximum(r_d / jnp.where(d_sc > 1e-12, d_sc, 1.0),
                                  1e-10)
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

            return x_, z_, y_, xt, rho, it, status, r_p, r_d

        def cond(state):
            *_, it, status, _rp, _rd = state
            return (status == MAX_ITERS) & (it < st.max_iters)

        init = (
            x, z, y, x,
            rho0, jnp.asarray(0, jnp.int32),
            jnp.asarray(MAX_ITERS, jnp.int32),
            jnp.asarray(jnp.inf, dtype), jnp.asarray(jnp.inf, dtype),
        )
        x_, z_, y_, _xt, rho, it, status, r_p, r_d = jax.lax.while_loop(
            cond, lambda s_: epoch_body(s_), init
        )

        xu, s_u, y_u = unscaled(x_, z_, y_)
        pobj = 0.5 * xu @ ops.P_mv(Pd0, xu) + q0 @ xu
        return SolveResult(
            x=xu, y=y_u, s=s_u, status=status, iters=it, pobj=pobj
        )

    return solve


# ------------------------------------------------------------------- PDHG


def make_matfree_pdhg_solver(ops: SparseOps, dims: ConeDims, n: int,
                             settings: SolverSettings):
    """Matrix-free restarted-averaged PDHG: solver/pdhg.py's algorithm
    (Chambolle-Pock + Halpern averaging + restart-to-best, Banjac
    certificates) with every dense matmul replaced by an O(nnz) SpMV.
    This is PDHG's natural home — huge sparse conic LPs where even the
    ADMM x-update CG is the bottleneck (reference analogue: MPAX's
    raPDHG on BCSR data, /root/reference/src/cvxpylayers/interfaces/
    mpax_if.py:149-163,390-416). P must be structurally zero (the layer
    enforces this before routing here)."""
    m = dims.total
    proj_K = make_cone_projector(dims)
    # inner-loop fast PSD path — see solver/admm.py
    _fast_psd = ("ns" if settings.psd_proj in ("auto", "ns")
                 and dims.psd else "exact")
    proj_K_fast = make_cone_projector(dims, psd_mode=_fast_psd)
    group_ids, n_groups = _cone_row_groups(dims)
    st = settings

    def proj_dual(u):
        return u + proj_K(-u)

    def proj_dual_fast(u):
        return u + proj_K_fast(-u)

    def solve(P_data, q, A_data, b, x0, y0, s0):
        dtype = q.dtype
        # f64 keeps exact eigh in the inner loop (see solver/admm.py)
        pd_fast = (proj_dual if dtype == jnp.float64
                   else proj_dual_fast)
        del s0  # PDHG tracks (x, y); s is recovered at the end
        Ad0, q0, b0 = A_data, q, b

        _, Ads, qs, bs, D, E, c = _ruiz_equilibrate_matfree(
            ops, P_data, A_data, q, b, group_ids, n_groups,
            st.scaling_iters,
        )

        # ||A||_2 by power iteration (converges from below; 1.1 safety
        # factor keeps tau*sigma*||A||^2 < 1 — see solver/pdhg.py)
        def pow_body(_, v):
            w = ops.A_rmv(Ads, ops.A_mv(Ads, v))
            return w / jnp.maximum(jnp.linalg.norm(w), 1e-30)

        v0 = jnp.ones(n, dtype) / jnp.sqrt(jnp.asarray(float(n), dtype))
        v = jax.lax.fori_loop(0, 12, pow_body, v0)
        a_norm = 1.1 * jnp.maximum(
            jnp.linalg.norm(ops.A_mv(Ads, v)), 1e-12
        )
        step = 0.9 / a_norm

        x = x0 / D
        y = c * y0 / E

        def unscaled(xb, yb):
            return D * xb, (E * yb) / c

        def residuals(xb, yb):
            xu, yu = unscaled(xb, yb)
            Ax = ops.A_mv(Ad0, xu)
            s_u = proj_K(b0 - Ax)
            r_p = (jnp.max(jnp.abs(Ax + s_u - b0)) if m
                   else jnp.asarray(0.0, dtype))
            p_sc = jnp.maximum(
                jnp.max(jnp.abs(Ax)) if m else 0.0,
                jnp.maximum(jnp.max(jnp.abs(s_u)) if m else 0.0,
                            jnp.max(jnp.abs(b0)) if m else 0.0),
            )
            Aty = ops.A_rmv(Ad0, yu) if m else jnp.zeros(n, dtype)
            r_d = jnp.max(jnp.abs(q0 + Aty))
            d_sc = jnp.maximum(jnp.max(jnp.abs(Aty)),
                               jnp.max(jnp.abs(q0)))
            # duality gap (r5, P = 0) — see solver/pdhg.py
            pobj = q0 @ xu
            dobj = -(b0 @ yu) if m else jnp.asarray(0.0, dtype)
            gap = jnp.abs(pobj - dobj)
            g_sc = jnp.maximum(jnp.abs(pobj), jnp.abs(dobj))
            return r_p, p_sc, r_d, d_sc, gap, g_sc

        def inner(carry, _):
            x_, y_, xa, ya, k = carry
            x_n = x_ - step * (
                qs + (ops.A_rmv(Ads, y_) if m else 0.0)
            )
            xbar = 2.0 * x_n - x_
            y_n = (pd_fast(y_ + step * (ops.A_mv(Ads, xbar) - bs))
                   if m else jnp.zeros(0, dtype))
            kf = k.astype(dtype)
            xa = (kf * xa + x_n) / (kf + 1.0)
            ya = (kf * ya + y_n) / (kf + 1.0)
            return (x_n, y_n, xa, ya, k + 1), None

        def epoch_body(state):
            x_, y_, it, status, _rp, _rd = state
            x_prev, y_prev = x_, y_
            (x_c, y_c, xa, ya, _), _ = jax.lax.scan(
                inner, (x_, y_, x_, y_, jnp.asarray(0, jnp.int32)),
                None, length=st.epoch,
            )
            it = it + st.epoch
            r_pl, p_sl, r_dl, d_sl, gl, g_sl = residuals(x_c, y_c)
            r_pa, p_sa, r_da, d_sa, ga, g_sa = residuals(xa, ya)
            # gap scale floored by the residual scales (see
            # solver/pdhg.py — zero-objective noise guard)
            g_fl = jnp.maximum(g_sl, jnp.maximum(p_sl, d_sl))
            g_fa = jnp.maximum(g_sa, jnp.maximum(p_sa, d_sa))
            last_merit = (r_pl / jnp.maximum(p_sl, 1e-12)
                          + r_dl / jnp.maximum(d_sl, 1e-12)
                          + gl / jnp.maximum(g_fl, 1e-12))
            avg_merit = (r_pa / jnp.maximum(p_sa, 1e-12)
                         + r_da / jnp.maximum(d_sa, 1e-12)
                         + ga / jnp.maximum(g_fa, 1e-12))
            use_avg = avg_merit < last_merit
            x_ = jnp.where(use_avg, xa, x_c)
            y_ = jnp.where(use_avg, ya, y_c)
            r_p = jnp.where(use_avg, r_pa, r_pl)
            p_sc = jnp.where(use_avg, p_sa, p_sl)
            r_d = jnp.where(use_avg, r_da, r_dl)
            d_sc = jnp.where(use_avg, d_sa, d_sl)
            gap = jnp.where(use_avg, ga, gl)
            g_sc = jnp.where(use_avg, g_sa, g_sl)

            eps_p = st.admm_eps_abs + st.admm_eps_rel * p_sc
            eps_d = st.admm_eps_abs + st.admm_eps_rel * d_sc
            eps_g = st.eps_gap_scale * (
                st.admm_eps_abs + st.admm_eps_rel * g_sc
            )
            converged = (r_p <= eps_p) & (r_d <= eps_d) & (gap <= eps_g)

            dxu = D * (x_ - x_prev)
            dyu = (E * (y_ - y_prev)) / c
            ny = jnp.max(jnp.abs(dyu)) if m else jnp.asarray(0.0, dtype)
            nx = jnp.max(jnp.abs(dxu))
            safe_ny = jnp.where(ny > 0, ny, 1.0)
            safe_nx = jnp.where(nx > 0, nx, 1.0)
            Atdy = ops.A_rmv(Ad0, dyu) if m else jnp.zeros(n, dtype)
            proj_dual_dy = proj_dual(dyu)
            dual_dist = (jnp.max(jnp.abs(proj_dual_dy - dyu)) if m
                         else jnp.asarray(0.0, dtype))
            pinf = (
                (ny > 10 * st.eps_infeas)
                & (jnp.max(jnp.abs(Atdy)) <= st.eps_infeas * safe_ny)
                & (dual_dist <= st.eps_infeas * safe_ny)
                & ((b0 @ dyu if m else jnp.asarray(0.0, dtype))
                   < -st.eps_infeas * safe_ny)
            )
            Adx = ops.A_mv(Ad0, dxu) if m else jnp.zeros(0, dtype)
            rec_dist = (jnp.max(jnp.abs(-proj_K(-Adx) - Adx)) if m
                        else jnp.asarray(0.0, dtype))
            dinf = (
                (nx > 10 * st.eps_infeas)
                & (rec_dist <= st.eps_infeas * safe_nx)
                & ((q0 @ dxu) < -st.eps_infeas * safe_nx)
            )
            status = jnp.where(
                converged, SOLVED,
                jnp.where(pinf, PRIMAL_INFEASIBLE,
                          jnp.where(dinf, DUAL_INFEASIBLE, MAX_ITERS)),
            ).astype(jnp.int32)
            return x_, y_, it, status, r_p, r_d

        def cond(state):
            _x, _y, it, status, _rp, _rd = state
            return (status == MAX_ITERS) & (it < st.max_iters)

        init = (x, y, jnp.asarray(0, jnp.int32),
                jnp.asarray(MAX_ITERS, jnp.int32),
                jnp.asarray(jnp.inf, dtype), jnp.asarray(jnp.inf, dtype))
        x, y, it, status, r_p, r_d = jax.lax.while_loop(
            cond, epoch_body, init
        )

        xu, yu = unscaled(x, y)
        s_u = (proj_K(b0 - ops.A_mv(Ad0, xu)) if m
               else jnp.zeros(0, dtype))
        pobj = q0 @ xu
        return SolveResult(
            x=xu, y=yu, s=s_u, status=status, iters=it, pobj=pobj
        )

    return solve


# -------------------------------------------------------------------- KKT


def make_matfree_kkt(ops: SparseOps, dims: ConeDims, n: int):
    """Residual map F(x, w, P_data, q, A_data, b) — the same mathematical
    object as kkt.make_kkt's, through SpMVs (elementwise products carry
    full f32 precision; no bf16 matmul trap on this route)."""
    m = dims.total
    proj = make_cone_projector(dims)

    def residual(x, w, P_data, q, A_data, b):
        Pi = proj(w)
        y = Pi - w
        F1 = ops.P_mv(P_data, x) + q + (
            ops.A_rmv(A_data, y) if m else jnp.zeros(n, x.dtype)
        )
        F2 = ops.A_mv(A_data, x) + Pi - b
        return jnp.concatenate([F1, F2])

    def split(w):
        Pi = proj(w)
        return Pi, Pi - w

    return residual, split


def make_matfree_kkt_solver(ops: SparseOps, dims: ConeDims, n: int,
                            cg_iters: int = 40, schur_iters=None,
                            p_diag_only: bool = False):
    """Solve J(x, w) delta = rhs (or J') without materializing J.

    Structurally diagonal P + polyhedral cones: the exact range-space
    Schur split of kkt.solve_polyhedral survives matrix-free, because
    (P + sig I)^{-1} is elementwise and S matvecs are two SpMVs.
    Everything else: CG on the normal equations with operator matvecs
    (implicitly regularized — this route also owns the `regularized`
    least-squares flavor the f64 polish requests).
    """
    m = dims.total
    dfactor, dapply_f = make_cone_dproj_factored(dims)
    polyhedral = dims.is_polyhedral() and p_diag_only
    n_zero = dims.zero
    if not schur_iters:
        schur_iters = max(10, min(25, n // 4 + 8))

    def solve_polyhedral_diag(w, P_data, A_data, rhs, transpose):
        dtype = rhs.dtype
        r1 = rhs[:n]
        r2 = rhs[n:]
        row = jnp.arange(m)
        d = jnp.where(row < n_zero, 0.0, (w > 0).astype(dtype))
        inact = 1.0 - d
        sig = 1e-6 * (ops.P_trace(P_data) / n + 1.0)
        pd = 1.0 / (ops.P_diag(P_data) + sig)

        def S_mv(v):
            av = ops.A_rmv(A_data, inact * v)
            return inact * ops.A_mv(A_data, pd * av) + d * v

        if not transpose:
            rhs_u = inact * r2 - inact * ops.A_mv(A_data, pd * r1)
            u = _cg_spd(S_mv, rhs_u, schur_iters)
            v1 = pd * (r1 + ops.A_rmv(A_data, inact * u))
            v2 = d * (r2 - ops.A_mv(A_data, v1)) + inact * u
            return jnp.concatenate([v1, v2])

        rhs1 = r1 - ops.A_rmv(A_data, d * r2)
        rhs_u = inact * ops.A_mv(A_data, pd * rhs1) + inact * r2
        u = _cg_spd(S_mv, rhs_u, schur_iters)
        v1 = pd * (rhs1 - ops.A_rmv(A_data, inact * u))
        v2 = d * r2 + inact * u
        return jnp.concatenate([v1, v2])

    def solve(x, w, P_data, q, A_data, b, rhs, transpose=False,
              regularized=False, iter_refine=False):
        del regularized  # CG on the normal equations is the regularized
        # least-squares direction already (implicit regularization by
        # early termination)
        if m == 0:
            # unconstrained: J = P; CG on P + tiny ridge
            sig = 1e-10 * (ops.P_trace(P_data) / max(n, 1) + 1.0)
            return _cg_spd(
                lambda v: ops.P_mv(P_data, v) + sig * v, rhs, cg_iters
            )

        if polyhedral:
            return solve_polyhedral_diag(w, P_data, A_data, rhs, transpose)

        dstate = dfactor(w)

        def mv(v):
            v1, v2 = v[:n], v[n:]
            Dv2 = dapply_f(dstate, v2)
            return jnp.concatenate([
                ops.P_mv(P_data, v1) + ops.A_rmv(A_data, Dv2 - v2),
                ops.A_mv(A_data, v1) + Dv2,
            ])

        def mvT(u):
            u1, u2 = u[:n], u[n:]
            Au1 = ops.A_mv(A_data, u1)
            return jnp.concatenate([
                ops.P_mv(P_data, u1) + ops.A_rmv(A_data, u2),
                dapply_f(dstate, Au1 + u2) - Au1,
            ])

        def solve_once(r):
            a, aT = (mvT, mv) if transpose else (mv, mvT)
            return _cg_normal(a, aT, r, cg_iters)

        sol = solve_once(rhs)
        if iter_refine:
            resid = rhs - (mvT(sol) if transpose else mv(sol))
            sol = sol + solve_once(resid)
        return sol

    return solve


# ------------------------------------------------------------------ polish


def make_matfree_polished_solver(ops: SparseOps, dims: ConeDims, n: int,
                                 settings: SolverSettings,
                                 p_diag_only: bool = False,
                                 base=None):
    """Matrix-free (ADMM-or-PDHG) + semismooth-Newton polish, statuses
    decided by the post-polish unscaled KKT residual (the same two-stage
    accuracy contract as refine.make_polished_solver)."""
    from .refine import _ESCAPE_STEP, _newton_polish_loop

    m = dims.total
    if base is None:
        base = make_matfree_admm_solver(ops, dims, n, settings)
    residual, split = make_matfree_kkt(ops, dims, n)
    kkt_solve = make_matfree_kkt_solver(
        ops, dims, n, cg_iters=settings.cg_iters,
        schur_iters=settings.schur_iters, p_diag_only=p_diag_only,
    )
    refine_xw = _newton_polish_loop(
        residual, kkt_solve, n, settings.refine_steps,
        escape=_ESCAPE_STEP, stall_factor=1.0,
        # the f64 "regularized" extra direction is the dense LU path's
        # rescue for singular J; matfree CG-normal is implicitly
        # regularized already, so one direction per step suffices
        f64_extra_reg_dir=False,
    )

    def solve(P_data, q, A_data, b, x0, y0, s0):
        res = base(P_data, q, A_data, b, x0, y0, s0)
        x, y, s = res.x, res.y, res.s
        if settings.refine_steps > 0 and m > 0:
            w = s - y
            x, w = refine_xw(x, w, P_data, q, A_data, b)
            s, y = split(w)

        Px = ops.P_mv(P_data, x)
        xPx = x @ Px
        pobj = 0.5 * xPx + q @ x

        F = residual(x, s - y, P_data, q, A_data, b)
        F1 = F[:n]
        F2 = F[n:]
        Aty = ops.A_rmv(A_data, y) if m else jnp.zeros(n, x.dtype)
        Ax = ops.A_mv(A_data, x)
        d_sc = jnp.maximum(
            jnp.max(jnp.abs(Px)),
            jnp.maximum(
                jnp.max(jnp.abs(Aty)) if m else 0.0,
                jnp.max(jnp.abs(q)),
            ),
        )
        p_sc = jnp.maximum(
            jnp.max(jnp.abs(Ax)) if m else 0.0,
            jnp.maximum(
                jnp.max(jnp.abs(s)) if m else 0.0,
                jnp.max(jnp.abs(b)) if m else 0.0,
            ),
        )
        # duality-gap certificate (r5) — see refine.make_polished_solver:
        # at 10^3-10^5 variables the infinity-norm residual checks bound
        # nothing (gap = F1'x - y'F2 scales with |x|_1, |y|_1); SOLVED
        # requires the gap at eps too
        dobj = -0.5 * xPx - (b @ y if m else jnp.asarray(0.0, x.dtype))
        gap = jnp.abs(pobj - dobj)
        g_sc = jnp.maximum(jnp.abs(pobj), jnp.abs(dobj))
        ok = (
            jnp.max(jnp.abs(F1))
            <= settings.eps_abs + settings.eps_rel * d_sc
        ) & (
            (jnp.max(jnp.abs(F2)) if m else jnp.asarray(0.0, x.dtype))
            <= settings.eps_abs + settings.eps_rel * p_sc
        ) & (gap <= settings.eps_gap_scale
             * (settings.eps_abs + settings.eps_rel * g_sc))
        status = jnp.where(
            (res.status == SOLVED) | (res.status == MAX_ITERS),
            jnp.where(ok, SOLVED, MAX_ITERS),
            res.status,
        ).astype(jnp.int32)
        return SolveResult(
            x=x, y=y, s=s, status=status, iters=res.iters, pobj=pobj
        )

    return solve


# -------------------------------------------------------------- derivative


def make_matfree_diff_solver(ops: SparseOps, dims: ConeDims, n: int,
                             settings: SolverSettings,
                             p_diag_only: bool = False):
    """solve(P_data, q, A_data, b, x0, y0, s0) -> (x, y, s, status, iters)
    with implicit-diff gradients w.r.t. the DATA VECTORS (P_data, q,
    A_data, b) — diff/derivative.py's rules restricted to the static nnz
    pattern, so the backward cost is O(nnz), never O(mn).
    """
    m = dims.total
    if settings.solve_method == "ipm":
        raise ValueError(
            "solve_method='ipm' requires the dense assembly route; the "
            "sparse large-instance path supports 'admm' and 'pdhg' "
            "(pass solver_args={'assembly': 'dense'} to force dense, "
            "or drop solve_method)."
        )
    first_order = None
    if settings.solve_method == "pdhg":
        if ops.nnz_P:
            raise ValueError(
                "solve_method='pdhg' requires a problem with no "
                "quadratic objective (PDHG's x-update is a gradient "
                "step); use 'admm' (default)."
            )
        first_order = make_matfree_pdhg_solver(ops, dims, n, settings)
    base = make_matfree_polished_solver(
        ops, dims, n, settings, p_diag_only=p_diag_only,
        base=first_order,
    )
    kkt_solve = make_matfree_kkt_solver(
        ops, dims, n, cg_iters=settings.cg_iters,
        schur_iters=settings.schur_iters, p_diag_only=p_diag_only,
    )
    dapply = make_cone_dproj_apply(dims)

    def _forward(P_data, q, A_data, b, x0, y0, s0):
        res = base(P_data, q, A_data, b, x0, y0, s0)
        return res.x, res.y, res.s, res.status, res.iters

    @jax.custom_vjp
    def solve(P_data, q, A_data, b, x0, y0, s0):
        return _forward(P_data, q, A_data, b, x0, y0, s0)

    def solve_fwd(P_data, q, A_data, b, x0, y0, s0):
        out = _forward(P_data, q, A_data, b, x0, y0, s0)
        x, y, s = out[0], out[1], out[2]
        return out, (x, y, s, P_data, q, A_data, b)

    def solve_bwd(saved, cotangents):
        x, y, s, P_data, q, A_data, b = saved
        dx, dy, ds = cotangents[0], cotangents[1], cotangents[2]
        w = s - y
        g_x = dx
        g_w = (dapply(w, dy + ds) - dy) if m else jnp.zeros(0, x.dtype)
        rhs = jnp.concatenate([g_x, g_w])
        uv = -kkt_solve(x, w, P_data, q, A_data, b, rhs, transpose=True,
                        iter_refine=rhs.dtype != jnp.float64)
        uv = jnp.where(jnp.all(jnp.isfinite(uv)), uv, 0.0)
        u = uv[:n]
        v = uv[n:]
        dq = u
        db = -v
        dP_data = ops.P_data_grad(u, x)
        dA_data = ops.A_data_grad(y, u, v, x)
        zeros = (jnp.zeros_like(x), jnp.zeros_like(y), jnp.zeros_like(s))
        return (dP_data, dq, dA_data, db) + zeros

    solve.defvjp(solve_fwd, solve_bwd)
    if settings.derivative != "forward":
        return solve

    # forward-mode variant (diffcp's `derivative` direction), mirroring
    # diff/derivative.py's custom_jvp on the data-vector signature
    import numpy as _np

    @jax.custom_jvp
    def solve_j(P_data, q, A_data, b, x0, y0, s0):
        return _forward(P_data, q, A_data, b, x0, y0, s0)

    @solve_j.defjvp
    def solve_j_jvp(primals, tangents):
        P_data, q, A_data, b, x0, y0, s0 = primals
        dPd, dq, dAd, db = tangents[0], tangents[1], tangents[2], tangents[3]
        out = _forward(P_data, q, A_data, b, x0, y0, s0)
        x, y, s, status, iters = out

        def _mat(t, like):
            return (jnp.zeros_like(like)
                    if isinstance(t, jax.custom_derivatives.SymbolicZero)
                    else t)

        dPd = _mat(dPd, P_data)
        dq = _mat(dq, q)
        dAd = _mat(dAd, A_data)
        db = _mat(db, b)
        w = s - y
        dF1 = ops.P_mv(dPd, x) + dq + (
            ops.A_rmv(dAd, y) if m else jnp.zeros(n, x.dtype)
        )
        dF2 = (ops.A_mv(dAd, x) - db) if m else jnp.zeros(0, x.dtype)
        rhs = jnp.concatenate([dF1, dF2])
        duv = -kkt_solve(x, w, P_data, q, A_data, b, rhs, transpose=False,
                         iter_refine=rhs.dtype != jnp.float64)
        duv = jnp.where(jnp.all(jnp.isfinite(duv)), duv, 0.0)
        dx = duv[:n]
        dw = duv[n:]
        Ddw = dapply(w, dw) if m else jnp.zeros(0, x.dtype)
        ds = Ddw
        dy = Ddw - dw
        f0 = jax.dtypes.float0
        dstatus = _np.zeros(status.shape, f0)
        diters = _np.zeros(iters.shape, f0)
        return out, (dx, dy, ds, dstatus, diters)

    return solve_j
