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

# f32 general-cone dense-normal CG window (see the comment inside
# make_kkt_solver for the v5e measurements that set these bounds).
# Escape hatch: solver_args={"kkt_mode": "operator"} disables the dense
# route entirely for problems sitting near the cliff edges.
DENSE_NORMAL_MIN = 48
DENSE_NORMAL_MAX = 144


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


def make_kkt_precond(dims: ConeDims, n: int):
    """build(x, w, P, q, A, b) -> W, an explicit approximate inverse of
    the KKT Jacobian for the stale-factor PCG polish (kkt_mode='pcg').

    ONE batched f32 LU solve per polish (the 124 ms/1024-batch linalg
    custom-call the per-step spectral mode could not afford, amortized
    over every Newton step), followed by one Newton-Schulz refinement
    W <- W(2I - J W) — pure matmuls — which SQUARES the factorization
    residual eps*kappa(J): this is the 'doubled-precision stale factor'
    STATUS r2 scoped as the missing piece (the LM-damped sigma=1e-3
    spectral factor distorted the singular subspace; raw f32 quality is
    recovered here by refinement instead of damping). A probe-vector
    check keeps whichever of {W, refined W} actually has the smaller
    residual, so a diverging refinement (kappa >~ 1e7) can never make
    the preconditioner worse."""
    _, jacobian, _ = make_kkt(dims, n)
    m = dims.total
    dim = n + m

    def build(x, w, P, q, A, b):
        with jax.default_matmul_precision("highest"):
            J = jacobian(x, w, P, q, A, b)
            scale = jnp.mean(jnp.abs(jnp.diagonal(J))) + 1.0
            eye = jnp.eye(dim, dtype=J.dtype)
            Jr = J + (1e-6 * scale) * eye
            W = jnp.linalg.solve(Jr, eye)
            W = jnp.where(jnp.isfinite(W), W, 0.0)
            W2 = W @ (2.0 * eye - J @ W)
            # fixed probe: pick the candidate with the smaller true
            # residual ||(I - J W) v|| (refinement squares the residual
            # when ||I - J W|| < 1, diverges otherwise)
            v = jnp.sin(jnp.arange(dim, dtype=J.dtype))
            r1 = jnp.linalg.norm(v - J @ (W @ v))
            r2 = jnp.linalg.norm(v - J @ (W2 @ v))
            r2 = jnp.where(jnp.isfinite(r2), r2, jnp.inf)
            return jnp.where(r2 < r1, W2, W)

    return build


def make_kkt_solver(dims: ConeDims, n: int, cg_iters: int = 40,
                    schur_iters=None, p_diag_full: bool = True,
                    p_diag_only: bool = False, kkt_mode: str = "auto"):
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
    has the measured motivation).

    solve_spectral (kkt_mode="spectral", default off) is the exact
    generalization of the polyhedral split to every cone family via
    D = Q diag(lam) Q' (cones/jacobians.make_cone_dproj_spectral):
    measured err 1e-7 at solved=1.0 on the softmax polish — numerically
    strictly better directions than CG (Markowitz-class SOCP solved
    fraction 0.95 -> 1.0) — but each Newton step pays 25-30 ms of
    batched cholesky/triangular custom-calls on this TPU backend
    (profiled), 5x slower end-to-end, so it stays opt-in until the
    factorization is amortized (r3). Newton-Schulz all-matmul inverses
    were tried and are NOT safe at the Schur systems' conditioning
    (kappa ~ 1e6-1e8 when P is curvature-deficient)."""
    from ..cones.jacobians import (
        make_cone_dproj_factored,
        make_cone_dproj_spectral,
    )
    from .linsolve import _cg_normal, _cg_spd

    m = dims.total
    _, jacobian, _ = make_kkt(dims, n)
    dfactor, dapply_f = make_cone_dproj_factored(dims)
    spectral = make_cone_dproj_spectral(dims) if m else None
    # General-cone f32 CG: inside this KKT-dimension window the (n+m)^2
    # Jacobian is materialized once per Newton solve and the normal
    # matrix H = M'M formed explicitly, so every CG iteration is ONE
    # batched matvec instead of the ~30-HLO operator chain (P@, A@,
    # A'@, block-diagonal cone-Jacobian apply, concats) — measured
    # markowitz SOCP 9.3k -> 10.5k solves/s at unchanged solved
    # fraction. The window is narrow because BOTH alternatives were
    # measured worse outside it (v5e, batch 512):
    #   * below: the operator chain is already as small as the dense
    #     build (GP-sized systems saw no gain);
    #   * above: per-CG-iteration HBM reads of the (n+m)^2 H and the
    #     (n+m)^3 highest-precision J'J build dominate (softmax m=129:
    #     157 -> 196 ms/step), and H's f32 entries carry eps*kappa^2
    #     which measurably dropped the exp-cone solved fraction;
    #   * CGNR on an explicit J (two matvecs, no H) doubles the HBM
    #     traffic per iteration and lost everywhere it was tried.
    # The justifying measurements cover markowitz/GP/softmax shapes only;
    # polyhedral problems (even those routed here by p_diag_full=False,
    # the LAD LP class) stay on the measured operator path until the
    # dense route is benchmarked on that dispatch-bound class.
    dense_normal_min = DENSE_NORMAL_MIN
    dense_normal_max = DENSE_NORMAL_MAX
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
        sig = 1e-6 * (jnp.trace(P) / n + 1.0)
        if p_diag_only:
            # P is STRUCTURALLY diagonal (e.g. sum_squares objectives:
            # P = c I): (P + sig I)^{-1} is elementwise — skips the
            # batched cholesky + triangular-solve custom-calls, which
            # cost ~3.5 ms each per (512, 64)^2 batch on this TPU
            # backend (profiled) and dominated the polish Newton step
            pd = 1.0 / (jnp.diagonal(P) + sig)

            def pinv_mv(v):
                return pd * v
        else:
            # Pinv via Cholesky explicit inverse (n x n, cheap on MXU)
            L = jnp.linalg.cholesky(P + sig * jnp.eye(n, dtype=dtype))
            eye = jnp.eye(n, dtype=dtype)
            Li = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
            Pinv = Li.T @ Li

            def pinv_mv(v):
                return Pinv @ v

        def S_mv(v):
            # masked Schur matvec, identity on active rows
            av = A.T @ (inact * v)
            return inact * (A @ pinv_mv(av)) + d * v

        if not transpose:
            # [[P, -A_0'], [A_0, 0]] [v1; u] = [r1; r2_0]
            # -> S u = r2_0 - A_0 Pinv r1,  v1 = Pinv (r1 + A_0' u)
            rhs_u = inact * r2 - inact * (A @ pinv_mv(r1))
            u = _cg_spd(S_mv, rhs_u, schur_iters)
            v1 = pinv_mv(r1 + A.T @ (inact * u))
            # active rows: v2 = r2 - A v1; inactive rows: v2 = u
            v2 = d * (r2 - A @ v1) + inact * u
            return jnp.concatenate([v1, v2])

        # J' [v1; v2] = r: active rows give v2 = r2 directly; the
        # saddle is [[P, A_0'], [A_0, 0]] [v1; u] = [r1 - A_1' r2_1;
        # -r2_0]  ->  S u = A_0 Pinv rhs1 + r2_0, v1 = Pinv(rhs1-A_0'u)
        rhs1 = r1 - A.T @ (d * r2)
        rhs_u = inact * (A @ pinv_mv(rhs1)) + inact * r2
        u = _cg_spd(S_mv, rhs_u, schur_iters)
        v1 = pinv_mv(rhs1 - A.T @ (inact * u))
        v2 = d * r2 + inact * u
        return jnp.concatenate([v1, v2])

    def _ns_spd_inv(S, iters):
        """Explicit SPD inverse by Jacobi-scaled Newton-Schulz iteration.

        X <- 2X - X S X is pure batched matmul — MXU-native. The
        alternative (cholesky + triangular solves) lowers to linalg
        custom-calls that cost 3.5-15 ms per batched (512, 64..128)^2
        call on this TPU backend (profiled: they were ~30 ms of every
        35 ms polish Newton step), while one 512x64^3 matmul is ~10 us.
        Jacobi pre-scaling clusters the spectrum so the quadratic
        convergence budget depends on the problem's intrinsic
        conditioning, not its row scaling. Residual error ~eps*kappa is
        absorbed by the solve-level refinement pass, exactly like the
        Cholesky explicit inverse it replaces."""
        dtype = S.dtype
        dim = S.shape[0]
        dj = 1.0 / jnp.sqrt(jnp.clip(jnp.diagonal(S), 1e-30, None))
        Ss = S * dj[:, None] * dj[None, :]
        eye = jnp.eye(dim, dtype=dtype)
        a = 1.0 / jnp.max(jnp.sum(jnp.abs(Ss), axis=0))
        X = a * eye
        for _ in range(iters):
            X = 2.0 * X - X @ (Ss @ X)
        return X * dj[:, None] * dj[None, :]

    def solve_spectral(w, P, A, rhs, transpose):
        """Exact spectral-Schur solve of J d = rhs (or J' d = rhs).

        Rotated system (v2 = Q z, G = Q'A, s2 = Q'r2, D = Q diag(lam) Q'):
          row1:  P v1 + G'(lam - 1) z = r1        (J)
                 P v1 + G' z        = r1          (J')
          row2:  G v1 + lam z = s2                (J)
                 (lam - 1) G v1 + lam z = s2      (J')

        Split at lam = 1/2 — NOT at a small truncation threshold. Rows
        with lam >= 1/2 eliminate z exactly via C = (1-lam)/lam <= 1
        into M = P + sigma I + (sqrt(C)G)'(sqrt(C)G) (Gram form, PSD to
        rounding; one n x n Cholesky). Rows with lam < 1/2 keep their
        EXACT lam through the saddle: both J and J' reduce to the SAME
        SPD system  (H + diag(lam/(1-lam))) with H = G_N Minv G_N',
        factorized by one batched m x m Cholesky. Every derived diagonal
        (C, lam/(1-lam), 1/(1-lam)) is bounded by ~1, so no conditioning
        is created beyond the problem's own — the earlier small-tau
        variant pushed C to 1/tau and NaN'd the f32 Cholesky whenever
        P ~ 0 (cond(M) ~ C/sigma ~ 1e11 on the softmax polish).
        The decomposition is EXACT: no truncation error anywhere."""
        dtype = rhs.dtype
        r1 = rhs[:n]
        with jax.default_matmul_precision("highest"):
            # Q's construction (Householder outer products, PSD svec
            # rotations) must run at full f32 too: bf16 default matmul
            # inputs on TPU degrade Q's orthogonality to ~1e-2, which
            # wrecked every downstream direction (solved fraction 0)
            Q, lam = spectral(w)
            G = Q.T @ A
            s2 = Q.T @ rhs[n:]
            el = lam >= 0.5
            msk_el = el.astype(dtype)
            msk_n = 1.0 - msk_el
            lam_e = jnp.where(el, lam, 1.0)       # for E-row divisions
            one_m = jnp.where(el, 1.0, 1.0 - lam)  # (1-lam) on N rows
            C = msk_el * (1.0 - lam) / lam_e       # in [0, 1]
            Dp = msk_n * lam / one_m               # lam/(1-lam) in [0, 1)
            sig = 1e-3 * (jnp.trace(P) / n + 1.0)
            Gc = jnp.sqrt(C)[:, None] * G
            M = P + sig * jnp.eye(n, dtype=dtype) + Gc.T @ Gc
            from .batched_linalg import (
                spd_inv_via_chol,
                tri_inv_blocked,
                use_masked,
            )

            if dtype == jnp.float64:
                L = jnp.linalg.cholesky(M)
                Li = jax.scipy.linalg.solve_triangular(
                    L, jnp.eye(n, dtype=dtype), lower=True
                )
                Minv = Li.T @ Li
            elif not use_masked(n):
                # large n: chol custom-call is bandwidth-bound and fine
                # (0.3 ms at (128,500,500), r4-measured) but the
                # triangular-solve-on-identity is not — the blocked
                # inverse wins (14.8 vs 16.7 ms)
                L = jnp.linalg.cholesky(M)
                Li = tri_inv_blocked(L, panel=128, lower=True)
                Minv = Li.T @ Li
            else:
                # masked-loop chol+inverse, not the LAPACK custom-calls:
                # these two factorizations were 94 ms of the 534 ms
                # Markowitz-IPM device profile (batched_linalg docstring)
                Minv = spd_inv_via_chol(M)

            GM = G @ Minv  # (m, n)
            H = msk_n[:, None] * (GM @ G.T) * msk_n[None, :]
            # saddle diagonal floor scaled to H: the Gram product's f32
            # rounding is ~eps*||H|| (H carries 1/sigma when P lacks
            # curvature), and a fixed 1e-7 floor left S numerically
            # indefinite -> NaN cholesky on SOC portfolio instances
            s_floor = 1e-6 * (jnp.trace(H) / m) + 1e-7
            S = H + jnp.diag(Dp + msk_el + s_floor * msk_n)
            if dtype == jnp.float64 or not use_masked(m):
                Ls = jnp.linalg.cholesky(S)

                def S_solve(r):
                    t1 = jax.scipy.linalg.solve_triangular(
                        Ls, r, lower=True
                    )
                    return jax.scipy.linalg.solve_triangular(
                        Ls, t1, lower=True, trans=1
                    )
            else:
                Sinv_sp = spd_inv_via_chol(S)

                def S_solve(r):
                    return Sinv_sp @ r

            if not transpose:
                # M v1 - G_N' z'_N = rhat,  (H + Dp) z' = s2_N - G_N Minv rhat
                # with z'_N = (1-lam) z_N
                rhat = r1 + G.T @ (C * s2)
                rhs_u = msk_n * (s2 - GM @ rhat)
                zp = S_solve(rhs_u)
                v1 = Minv @ (rhat + G.T @ (msk_n * zp))
                z = (msk_el * (s2 - G @ v1) / lam_e
                     + msk_n * zp / one_m)
            else:
                # M v1 + G_N' z_N = rhat,
                # (H + Dp) z_N = (1-lam)^{-1} s2_N + G_N Minv rhat
                rhat = r1 - G.T @ (msk_el * s2 / lam_e)
                rhs_u = msk_n * (s2 / one_m + GM @ rhat)
                zn = S_solve(rhs_u)
                v1 = Minv @ (rhat - G.T @ (msk_n * zn))
                z = (msk_el * (s2 / lam_e + C * (G @ v1))
                     + msk_n * zn)
            return jnp.concatenate([v1, Q @ z])

    def solve(x, w, P, q, A, b, rhs, transpose=False,
              regularized=False, iter_refine=False, precond=None):
        """precond: optional (n+m, n+m) approximate inverse of J —
        the stale-factor PCG route (see make_kkt_pcg): when given, the
        f32 general-cone branch runs LEFT-preconditioned CGNR on
        (W J) d = W r instead of plain CG on J'J, whose squared
        conditioning is the measured accuracy floor on curvature-
        deficient polishes (STATUS r2: CG-40 floors at 4e-2 where a
        4-iteration stale-W PCG reaches 1e-6..1e-15)."""
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

        dense_normal = (
            precond is None
            and not dims.is_polyhedral()
            and kkt_mode not in ("spectral", "operator")
            and 0 < m and dense_normal_min <= (n + m) <= dense_normal_max
        )
        if dense_normal:
            # materialize J from the factored cone-Jacobian state (the
            # root-finds/eigh in dfactor are NOT recomputed: dapply_f is
            # masks/einsums, vmapped over the identity). Full f32 —
            # same precision contract as the operator CG.
            with jax.default_matmul_precision("highest"):
                eye_m = jnp.eye(m, dtype=rhs.dtype)
                D = jax.vmap(lambda e: dapply_f(dstate, e))(eye_m).T
                Jd = jnp.concatenate(
                    [
                        jnp.concatenate([P, A.T @ (D - eye_m)], axis=1),
                        jnp.concatenate([A, D], axis=1),
                    ],
                    axis=0,
                )
                Md = Jd.T if transpose else Jd
                Hd = Md.T @ Md

        def solve_once(r):
            if polyhedral:
                return solve_polyhedral(x, w, P, q, A, b, r, transpose)
            if kkt_mode == "spectral":
                return solve_spectral(w, P, A, r, transpose)
            if precond is not None:
                # left-preconditioned CGNR: with W ~ J0^{-1} (stale by a
                # few Newton steps), WJ = I + O(step), so ~4-6
                # iterations reach the f32 floor regardless of kappa(J)
                with jax.default_matmul_precision("highest"):
                    W = precond
                    if transpose:
                        # J' d = r  ->  (W'J') d = W'r
                        a = lambda v_: W.T @ mvT(v_)
                        aT = lambda u_: mv(W @ u_)
                        pr = W.T @ r
                    else:
                        # J d = r  ->  (WJ) d = Wr
                        a = lambda v_: W @ mv(v_)
                        aT = lambda u_: mvT(W.T @ u_)
                        pr = W @ r
                    return _cg_normal(a, aT, pr, 6)
            # general cones default: CG on the normal equations at full
            # f32 (squared conditioning, but monotone and robust;
            # bf16 matvec noise was observed to pin exp-cone polishes
            # at ~1e-3 on TPU)
            with jax.default_matmul_precision("highest"):
                if dense_normal:
                    return _cg_spd(lambda v: Hd @ v, Md.T @ r, cg_iters)
                a, aT = (mvT, mv) if transpose else (mv, mvT)
                return _cg_normal(a, aT, r, cg_iters)

        sol = solve_once(rhs)
        if not polyhedral and kkt_mode == "spectral":
            # one refinement pass against the TRUE Jacobian absorbs the
            # spectral solve's LM-regularization bias; the w-dependent
            # factorization is CSE'd between the two calls
            with jax.default_matmul_precision("highest"):
                resid0 = rhs - (mvT(sol) if transpose else mv(sol))
            sol = sol + solve_once(resid0)
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
