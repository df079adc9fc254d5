"""Primal-dual hybrid gradient (PDHG / Chambolle-Pock) for conic LPs.

The framework's third algorithm (SURVEY section 2.2: the reference's
MPAX adapter wraps a restarted-averaged PDHG LP solver, mpax_if.py) —
first-order like ADMM but with NO linear solves at all: every iteration
is two SpMV-shaped matvecs plus one cone projection, which makes it the
cheapest possible iteration on accelerators and the natural choice when
even the ADMM x-update CG is too expensive (huge, well-conditioned LPs).

    minimize    q'x
    subject to  A x + s = b,  s in K          (P must be structurally 0)

Chambolle-Pock on the saddle  min_x max_{y in K*}  q'x + y'(Ax - b):

    x+ = x - tau (q + A'y)
    y+ = Pi_{K*}( y + sigma (A (2x+ - x) - b) )

with tau = sigma = 0.9 / ||A||_2 (power-iteration estimate) and
Halpern-style iterate averaging inside each epoch (the restarted-
averaging that makes raPDHG competitive — averages enjoy O(1/k) ergodic
convergence where the last iterate oscillates). Epoch structure,
residual checks, Banjac-style infeasibility certificates and statuses
mirror solver/admm.py; the semismooth-Newton polish owns final accuracy
exactly as it does for ADMM.

Reference analogue: /root/reference/src/cvxpylayers/interfaces/mpax_if.py
(MPAX's raPDHG, forward-only there — here the standard custom_vjp
derivative applies unchanged, closing the backward gap the reference
notes at mpax_if.py:114-122).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..cones.dims import ConeDims
from ..cones.projections import make_cone_projector
from .admm import SolveResult, _ruiz_equilibrate, _cone_row_groups
from .settings import (
    DUAL_INFEASIBLE,
    MAX_ITERS,
    PRIMAL_INFEASIBLE,
    SOLVED,
    SolverSettings,
)


def make_pdhg_solver(dims: ConeDims, n: int, settings: SolverSettings):
    """Build solve(P, q, A, b, x0, y0, s0) -> SolveResult. P is accepted
    for signature parity and must be structurally zero (the layer
    enforces this; PDHG's x-prox is a gradient step)."""
    m = dims.total
    proj_K = make_cone_projector(dims)
    # inner-loop fast PSD path — see solver/admm.py (residual checks,
    # certificates and the final slack recovery keep exact eigh)
    _fast_psd = ("ns" if settings.psd_proj in ("auto", "ns")
                 and dims.psd else "exact")
    proj_K_fast = make_cone_projector(dims, psd_mode=_fast_psd)
    group_ids, n_groups = _cone_row_groups(dims)
    st = settings

    def proj_dual(u):
        # Pi_{K*}(u) = u + Pi_K(-u) (Moreau)
        return u + proj_K(-u)

    def proj_dual_fast(u):
        return u + proj_K_fast(-u)

    def solve(P, q, A, b, x0, y0, s0):
        dtype = q.dtype
        # f64 keeps exact eigh in the inner loop (see solver/admm.py)
        pd_fast = (proj_dual if dtype == jnp.float64
                   else proj_dual_fast)
        del s0  # PDHG tracks (x, y); s is recovered at the end
        P0, A0, q0, b0 = P, A, q, b

        _, As, qs, bs, D, E, c = _ruiz_equilibrate(
            P, A, q, b, group_ids, n_groups, st.scaling_iters
        )

        # ||A||_2 estimate by power iteration. The estimate converges
        # FROM BELOW, and tau*sigma*||A||^2 < 1 is the convergence
        # condition — an underestimate breaks it. 12 rounds plus a 1.1
        # safety factor keep tau*sigma*||A||^2 <= 0.81/1.21 even with a
        # ~10% residual underestimate (clustered top singular values /
        # unlucky start); the extra margin costs a few percent of
        # iterations, never correctness.
        def pow_body(_, v):
            w = As.T @ (As @ v)
            return w / jnp.maximum(jnp.linalg.norm(w), 1e-30)

        v0 = jnp.ones(n, dtype) / jnp.sqrt(jnp.asarray(float(n), dtype))
        v = jax.lax.fori_loop(0, 12, pow_body, v0)
        a_norm = 1.1 * jnp.maximum(jnp.linalg.norm(As @ v), 1e-12)
        step = 0.9 / a_norm

        x = x0 / D
        y = c * y0 / E

        def unscaled(xb, yb):
            return D * xb, (E * yb) / c

        def residuals(xb, yb):
            xu, yu = unscaled(xb, yb)
            Ax = A0 @ xu
            s_u = proj_K(b0 - Ax)
            r_p = (jnp.max(jnp.abs(Ax + s_u - b0)) if m
                   else jnp.asarray(0.0, dtype))
            p_sc = jnp.maximum(
                jnp.max(jnp.abs(Ax)) if m else 0.0,
                jnp.maximum(jnp.max(jnp.abs(s_u)) if m else 0.0,
                            jnp.max(jnp.abs(b0)) if m else 0.0),
            )
            Aty = A0.T @ yu if m else jnp.zeros(n, dtype)
            r_d = jnp.max(jnp.abs(q0 + Aty))
            d_sc = jnp.maximum(jnp.max(jnp.abs(Aty)),
                               jnp.max(jnp.abs(q0)))
            # duality gap (r5, P = 0): see admm.residuals — required for
            # convergence so large-LP iterates can't pass on residuals
            # alone while far from optimal
            pobj = q0 @ xu
            dobj = -(b0 @ yu) if m else jnp.asarray(0.0, dtype)
            gap = jnp.abs(pobj - dobj)
            g_sc = jnp.maximum(jnp.abs(pobj), jnp.abs(dobj))
            return r_p, p_sc, r_d, d_sc, gap, g_sc

        def inner(carry, _):
            x_, y_, xa, ya, k = carry
            x_n = x_ - step * (qs + (As.T @ y_ if m else 0.0))
            xbar = 2.0 * x_n - x_
            y_n = (pd_fast(y_ + step * (As @ xbar - bs)) if m
                   else jnp.zeros(0, dtype))
            # running (Halpern) average: restarted each epoch
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
            # restart-to-average: keep whichever of {last, average} has
            # the smaller combined residual (raPDHG's restart criterion,
            # evaluated at the epoch boundary)
            r_pl, p_sl, r_dl, d_sl, gl, g_sl = residuals(x_c, y_c)
            r_pa, p_sa, r_da, d_sa, ga, g_sa = residuals(xa, ya)
            # gap scale floored by the residual scales: on ~zero-
            # objective problems g_sc -> 0 and a bare 1e-12 floor
            # would let objective NOISE dominate the restart choice
            # (r5 review)
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

            # infeasibility certificates from the iterate differences
            dxu = D * (x_ - x_prev)
            dyu = (E * (y_ - y_prev)) / c
            ny = jnp.max(jnp.abs(dyu)) if m else jnp.asarray(0.0, dtype)
            nx = jnp.max(jnp.abs(dxu))
            safe_ny = jnp.where(ny > 0, ny, 1.0)
            safe_nx = jnp.where(nx > 0, nx, 1.0)
            Atdy = A0.T @ dyu if m else jnp.zeros(n, dtype)
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
            Adx = A0 @ dxu if m else jnp.zeros(0, dtype)
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
        # recover s from the constraint, projected into K; the dual from
        # the projection residual so y in K* exactly (Moreau split of
        # b - Ax, like the ADMM slack recovery)
        s_u = proj_K(b0 - A0 @ xu) if m else jnp.zeros(0, dtype)
        pobj = q0 @ xu
        return SolveResult(
            x=xu, y=yu, s=s_u, status=status, iters=it, pobj=pobj
        )

    return solve
