"""Primal-dual interior-point solver (Mehrotra predictor-corrector with
Nesterov-Todd scalings) for symmetric cones: Zero, NonNeg, SOC.

This is the framework's high-accuracy second algorithm — the Clarabel-style
IPM the build plan names as the north star (cvxpylayers SURVEY section 7.1
item 3; reference analogues: ECOS/Clarabel reached through diffcp,
docs/guide/solvers.md:9-10). Non-symmetric cones (Exp, PSD, Pow) route to
the ADMM+polish path instead; `solve_method="IPM"` in solver_args selects
this solver when the cone pattern allows it.

Problem form:  min (1/2)x'Px + q'x  s.t.  A x + s = b, s in K,
with K = {0}^p x R+^l x SOC(d_1) x ... The zero block carries a free dual;
NonNeg/SOC blocks get NT-scaled Newton steps.

Design notes (TPU-first, jit/vmap-compatible):
  * fixed maximum iterations under lax.while_loop (vmap batches per
    instance convergence as usual);
  * one dense symmetric KKT matrix per iteration, solved with LU in f64
    and CG-on-normal-equations in f32 (same dispatch as the polish);
  * SOC NT scalings in closed form (arrow-matrix algebra, no eigendecomp).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..cones.dims import ConeDims
from .admm import SolveResult
from .settings import MAX_ITERS, SOLVED, SolverSettings


def ipm_supports(dims: ConeDims) -> bool:
    return dims.exp == 0 and not dims.psd and not dims.pow3


# ---------------------------------------------------------------------------
# Jordan / NT algebra per cone block family
# ---------------------------------------------------------------------------


def _soc_blocks(dims: ConeDims):
    """(offsets, sizes) of SOC blocks within the inequality segment
    (which excludes the zero rows)."""
    offs = []
    off = dims.nonneg
    for d in dims.soc:
        offs.append((off, d))
        off += d
    return offs


def make_ipm_solver(dims: ConeDims, n: int, settings: SolverSettings):
    if not ipm_supports(dims):
        raise ValueError(
            "IPM supports Zero/NonNeg/SOC cones only; use the ADMM solver "
            "for Exp/PSD/Pow problems"
        )
    p_eq = dims.zero
    l = dims.nonneg
    socs = _soc_blocks(dims)
    mi = l + sum(d for d in dims.soc)  # inequality rows
    m = dims.total
    st = settings
    max_it = st.ipm_max_iters
    # degree of the cone (barrier parameter normalization)
    degree = max(l + len(dims.soc), 1)

    def jprod_inv_soc(u, v):
        """Jordan-inverse product for SOC: solve u o w = v (arrow solve)."""
        u0 = u[0]
        u1 = u[1:]
        det = u0 * u0 - u1 @ u1
        det = jnp.where(jnp.abs(det) > 1e-30, det, 1e-30)
        w0 = (u0 * v[0] - u1 @ v[1:]) / det
        w1 = (v[1:] - u1 * w0) / u0 + 0.0
        # standard arrow inverse: w1 = (det^{-1})((-v0 u1) + ...)
        # derived directly: [u0, u1'; u1, u0 I] w = v (arrow matrix)
        # solve: w1 = (v1 - w0 u1)/u0
        w1 = (v[1:] - w0 * u1) / jnp.where(jnp.abs(u0) > 1e-30, u0, 1e-30)
        return jnp.concatenate([w0[None], w1])

    def soc_step_len(s, ds):
        """max alpha in [0,1] with s + alpha ds in SOC (conservative)."""
        # solve for boundary: ||s1+a ds1||^2 = (s0 + a ds0)^2
        a_ = ds[0] ** 2 - ds[1:] @ ds[1:]
        b_ = 2 * (s[0] * ds[0] - s[1:] @ ds[1:])
        c_ = s[0] ** 2 - s[1:] @ s[1:]
        # smallest positive root of a_ t^2 + b_ t + c_ = 0
        disc = b_ * b_ - 4 * a_ * c_
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        r1 = jnp.where(
            jnp.abs(a_) > 1e-30, (-b_ - sq) / (2 * jnp.where(jnp.abs(a_) > 1e-30, a_, 1.0)), -c_ / jnp.where(jnp.abs(b_) > 1e-30, b_, 1e-30)
        )
        r2 = jnp.where(
            jnp.abs(a_) > 1e-30, (-b_ + sq) / (2 * jnp.where(jnp.abs(a_) > 1e-30, a_, 1.0)), r1
        )
        roots = jnp.stack([r1, r2])
        pos = jnp.where(roots > 1e-12, roots, jnp.inf)
        amax = jnp.min(pos)
        amax = jnp.where(disc < 0, jnp.inf, amax)
        # apex bound: the head coordinate must stay nonnegative
        head = jnp.where(ds[0] < 0, -s[0] / jnp.where(ds[0] < 0, ds[0], -1.0),
                         jnp.inf)
        amax = jnp.minimum(amax, head)
        return jnp.clip(amax, 0.0, 1.0)

    def step_len(s, ds):
        """max step in [0, 1] keeping s + alpha ds in the inequality cone."""
        alphas = [jnp.asarray(1.0, s.dtype)]
        if l:
            sn = s[:l]
            dn = ds[:l]
            neg = dn < 0
            cand = jnp.where(neg, -sn / jnp.where(neg, dn, -1.0), jnp.inf)
            alphas.append(jnp.clip(jnp.min(cand), 0.0, 1.0))
        for off, d in socs:
            alphas.append(soc_step_len(s[off:off + d], ds[off:off + d]))
        return jnp.min(jnp.stack(alphas))

    def nt_scaling(s, z):
        """NT scaling W (as a dense mi x mi for simplicity at these sizes)
        with lambda = W^{-1} s = W z."""
        dtype = s.dtype
        W = jnp.zeros((mi, mi), dtype)
        lam = jnp.zeros(mi, dtype)
        if l:
            w = jnp.sqrt(s[:l] / z[:l])
            idx = jnp.arange(l)
            W = W.at[idx, idx].set(w)
            lam = lam.at[:l].set(jnp.sqrt(s[:l] * z[:l]))
        for off, d in socs:
            sb = s[off:off + d]
            zb = z[off:off + d]
            # standard SOC NT scaling (Vandenberghe's coneprog notes)
            Jm = jnp.concatenate(
                [jnp.ones(1, dtype), -jnp.ones(d - 1, dtype)]
            )
            sbar = sb / jnp.sqrt(jnp.maximum(sb[0] ** 2 - sb[1:] @ sb[1:],
                                             1e-30))
            zbar = zb / jnp.sqrt(jnp.maximum(zb[0] ** 2 - zb[1:] @ zb[1:],
                                             1e-30))
            # gamma^2 = (1 + sbar'zbar)/2 (plain inner product), and the
            # scaling *point* wbar = (sbar + J zbar)/(2 gamma) satisfies
            # wbar' J wbar = 1. The NT matrix is the square root of the
            # quadratic representation Q_wbar, given in Householder form by
            # v = (wbar + e)/sqrt(2 (wbar_0 + 1)):  W = eta (2 v v' - J).
            gamma = jnp.sqrt(jnp.maximum((1 + sbar @ zbar) / 2, 1e-30))
            wb = (sbar + Jm * zbar) / (2 * gamma)
            vvec = wb.at[0].add(1.0) / jnp.sqrt(
                jnp.maximum(2.0 * (wb[0] + 1.0), 1e-30)
            )
            eta = (
                jnp.maximum(sb[0] ** 2 - sb[1:] @ sb[1:], 1e-30)
                / jnp.maximum(zb[0] ** 2 - zb[1:] @ zb[1:], 1e-30)
            ) ** 0.25
            Wb = eta * (2.0 * jnp.outer(vvec, vvec) - jnp.diag(Jm))
            W = jax.lax.dynamic_update_slice(W, Wb, (off, off))
            # lambda_b = W^{-1} s = W z
            lam_b = Wb @ zb
            lam = jax.lax.dynamic_update_slice(lam, lam_b, (off,))
        return W, lam

    def jprod_inv(lam, v):
        """Solve lam o w = v blockwise (Jordan inverse product)."""
        dtype = lam.dtype
        w = jnp.zeros(mi, dtype)
        if l:
            w = w.at[:l].set(v[:l] / jnp.maximum(lam[:l], 1e-30))
        for off, d in socs:
            w = jax.lax.dynamic_update_slice(
                w, jprod_inv_soc(lam[off:off + d], v[off:off + d]), (off,)
            )
        return w

    def jprod(a, b):
        """Jordan product a o b blockwise."""
        dtype = a.dtype
        w = jnp.zeros(mi, dtype)
        if l:
            w = w.at[:l].set(a[:l] * b[:l])
        for off, d in socs:
            ab = a[off:off + d]
            bb = b[off:off + d]
            head = ab @ bb
            tail = ab[0] * bb[1:] + bb[0] * ab[1:]
            w = jax.lax.dynamic_update_slice(
                w, jnp.concatenate([head[None], tail]), (off,)
            )
        return w

    _e_np = np.zeros(mi)
    if l:
        _e_np[:l] = 1.0
    for off, d in socs:
        _e_np[off] = 1.0

    def solve(P, q, A, b, x0, y0, s0):
        del x0, y0, s0  # IPM uses its own initialization
        dtype = q.dtype
        e = jnp.asarray(_e_np, dtype)
        A_eq = A[:p_eq]
        b_eq = b[:p_eq]
        A_in = A[p_eq:]
        b_in = b[p_eq:]

        def residuals(x, y, z, s):
            rx = P @ x + q + (A_eq.T @ y if p_eq else 0.0) + (
                A_in.T @ z if mi else jnp.zeros(n, dtype)
            )
            ry = (A_eq @ x - b_eq) if p_eq else jnp.zeros(0, dtype)
            rz = (A_in @ x + s - b_in) if mi else jnp.zeros(0, dtype)
            return rx, ry, rz

        def kkt_solve(W2, rx, ry, rz_mod):
            """Solve [[P, Aeq', Ain'], [Aeq, 0, 0], [Ain, 0, -W2]] d = -r."""
            dim = n + p_eq + mi
            K = jnp.zeros((dim, dim), dtype)
            K = K.at[:n, :n].set(
                P + st.sigma * jnp.eye(n, dtype=dtype)
            )
            if p_eq:
                K = K.at[n:n + p_eq, :n].set(A_eq)
                K = K.at[:n, n:n + p_eq].set(A_eq.T)
                K = K.at[n:n + p_eq, n:n + p_eq].set(
                    -st.sigma * jnp.eye(p_eq, dtype=dtype)
                )
            if mi:
                K = K.at[n + p_eq:, :n].set(A_in)
                K = K.at[:n, n + p_eq:].set(A_in.T)
                K = K.at[n + p_eq:, n + p_eq:].set(-W2)
            rhs = jnp.concatenate([-rx, -ry, -rz_mod])
            sol = jnp.linalg.solve(K, rhs)
            return sol[:n], sol[n:n + p_eq], sol[n + p_eq:]

        # ---- initial point (CVXOPT-style): one least-squares KKT solve with
        # identity scaling, then shift s and z into the cone interior
        def _cone_violation(v):
            """max over blocks of how far v is from the cone interior."""
            viol = jnp.asarray(-jnp.inf, dtype)
            if l:
                viol = jnp.maximum(viol, jnp.max(-v[:l]))
            for off, d in socs:
                viol = jnp.maximum(
                    viol,
                    jnp.linalg.norm(v[off + 1:off + d]) - v[off],
                )
            return viol

        def _shift_into_cone(v):
            a = _cone_violation(v)
            return jnp.where(a >= -1e-3, v + (1.0 + a) * e, v)

        I_mi = jnp.eye(mi, dtype=dtype)
        x, y, z_hat = kkt_solve(I_mi, q, -b_eq, -b_in)
        s = _shift_into_cone(-z_hat)
        z = _shift_into_cone(z_hat)

        def body(state):
            x, y, z, s, it, status = state
            W, lam = nt_scaling(s, z)
            W2 = W @ W
            rx, ry, rz = residuals(x, y, z, s)
            mu = jnp.maximum(s @ z / degree, 1e-30)

            # ---- affine (predictor) step
            # scaled complementarity Newton: lam o (W^{-1}ds + W dz) =
            # -lam o lam, so the eliminated third-row correction is
            # d_aff = lam (since lam o^{-1} (lam o lam) = lam)
            rz_mod = rz - W @ lam
            dx_a, dy_a, dz_a = kkt_solve(W2, rx, ry, rz_mod)
            ds_a = -W @ (lam + W @ dz_a)
            alpha_aff = jnp.minimum(step_len(s, ds_a), step_len(z, dz_a))
            mu_aff = (
                (s + alpha_aff * ds_a) @ (z + alpha_aff * dz_a) / degree
            )
            sigma_c = jnp.clip((mu_aff / mu) ** 3, 0.0, 1.0)

            # ---- corrector (Mehrotra second-order + centering)
            # W^{-1} ds_a = -(lam + W dz_a) in closed form
            eta = jprod(-(lam + W @ dz_a), W @ dz_a)
            comp = jprod(lam, lam) + eta - sigma_c * mu * e
            d_cor = jprod_inv(lam, comp)
            rz_mod2 = rz - W @ d_cor
            dx, dy, dz = kkt_solve(W2, rx, ry, rz_mod2)
            ds = -W @ (d_cor + W @ dz)

            a_p = step_len(s, ds)
            a_d = step_len(z, dz)
            alpha = 0.99 * jnp.minimum(a_p, a_d)

            x = x + alpha * dx
            y = y + alpha * dy
            z = z + alpha * dz
            s = s + alpha * ds
            it = it + 1

            rx2, ry2, rz2 = residuals(x, y, z, s)
            mu2 = s @ z / degree
            p_res = jnp.maximum(
                jnp.max(jnp.abs(ry2)) if p_eq else 0.0,
                jnp.max(jnp.abs(rz2)) if mi else 0.0,
            )
            d_res = jnp.max(jnp.abs(rx2))
            scale = 1.0 + jnp.maximum(jnp.max(jnp.abs(q)),
                                      jnp.max(jnp.abs(b)) if m else 0.0)
            done = (
                (p_res <= st.eps_abs * scale)
                & (d_res <= st.eps_abs * scale)
                & (mu2 <= st.eps_abs * scale)
            )
            status = jnp.where(done, SOLVED, status).astype(jnp.int32)
            return x, y, z, s, it, status

        def cond(state):
            *_, it, status = state
            return (status != SOLVED) & (it < max_it)

        init = (x, y, z, s, jnp.asarray(0, jnp.int32),
                jnp.asarray(MAX_ITERS, jnp.int32))
        x, y, z, s, it, status = jax.lax.while_loop(cond, body, init)

        y_full = jnp.concatenate([y, z]) if p_eq else z
        s_full = jnp.concatenate([jnp.zeros(p_eq, dtype), s])
        pobj = 0.5 * x @ (P @ x) + q @ x
        return SolveResult(
            x=x, y=y_full, s=s_full, status=status, iters=it, pobj=pobj
        )

    return solve
