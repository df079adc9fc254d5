"""Primal-dual interior-point solver for the full cone family:
Zero, NonNeg, SOC, PSD (symmetric — Nesterov-Todd scalings) and
Exp, Pow3 (nonsymmetric — primal barrier-Hessian scalings).

This is the framework's high-accuracy second algorithm — the Clarabel-
style IPM the build plan names as the north star (cvxpylayers SURVEY
section 7.1 item 3; reference analogues: ECOS/Clarabel reached through
diffcp, docs/guide/solvers.md:9-10, including their exp-cone support).
`solve_method="ipm"` in solver_args selects it.

Problem form:  min (1/2)x'Px + q'x  s.t.  A x + s = b, s in K.

Algorithm (Mehrotra predictor-corrector, cf. CVXOPT coneprog / ECOS):
every Newton system uses a block-diagonal scaling matrix T with
T z ~= s on the central path:

  * NonNeg:  T = diag(s/z)                      (NT, closed form)
  * SOC:     T = W^2, W the NT Householder form (closed form)
  * PSD:     T = W (x)_s W with W Z W = S       (NT via two eigh)
  * Exp/Pow: T = (1/mu) H_f(s)^{-1}             (primal barrier Hessian,
             3x3; barriers in cones/barriers.py)

and eliminates ds via  ds = -(rc + T dz), giving the symmetric
quasidefinite KKT system  [[P, Aeq', Ain'], [Aeq, 0, 0], [Ain, 0, -T]].
The complementarity right-hand side rc is, per block,

  affine step:    rc = s (sym)             /  T z (nonsym)
  combined step:  rc = s - sigma*mu*jinv(z) + corr (sym; corr is the
                  Mehrotra term for NonNeg/SOC, skipped for PSD)
                  /  T (z + sigma*mu*g(s)) (nonsym)

Design notes (TPU-first, jit/vmap-compatible):
  * fixed maximum iterations under lax.while_loop (vmap batches per
    instance convergence as usual);
  * the KKT system is solved with exact dense LU in f64 (CPU tests);
    in f32 (TPU) it is condensed exactly — dz eliminated via the
    blockwise T inverse, one n x n Cholesky explicit inverse of
    S = P + sigma I + Ain' Tinv Ain, and a p x p equality Schur — all
    MXU-shaped matmuls (XLA's batched LU is the measured slow path,
    solver/linsolve.py);
  * step lengths: exact ratio tests for NonNeg/SOC, eigenvalue bound
    for PSD, and a fine geometric grid search on strict cone interior
    membership for Exp/Pow (branchless masked max);
  * infeasibility certificates: normalized-iterate checks (Clarabel-
    style almost-certificate detection) promote diverging iterates to
    PRIMAL_INFEASIBLE / DUAL_INFEASIBLE statuses.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..cones.barriers import (
    EXP_DUAL_INTERIOR,
    EXP_PRIMAL_INTERIOR,
    POW_INTERIOR,
    exp_grad,
    exp_hess,
    pow_grad,
    pow_hess,
)
from ..cones.dims import ConeDims
from ..cones.projections import (
    make_cone_projector,
    svec_to_sym,
    sym_to_svec,
)
from .admm import SolveResult
from .settings import (
    DUAL_INFEASIBLE,
    MAX_ITERS,
    PRIMAL_INFEASIBLE,
    SOLVED,
    SolverSettings,
)

_TINY = 1e-30


def ipm_supports(dims: ConeDims) -> bool:
    """All cone families are supported since round 2."""
    del dims
    return True


def _block_layout(dims: ConeDims):
    """Static (family, offset-within-inequality-segment, meta) blocks."""
    blocks = []
    off = dims.nonneg
    for d in dims.soc:
        blocks.append(("soc", off, d))
        off += d
    for _ in range(dims.exp):
        blocks.append(("exp", off, None))
        off += 3
    for s in dims.psd:
        blocks.append(("psd", off, s))
        off += s * (s + 1) // 2
    for a in dims.pow3:
        blocks.append(("pow", off, float(a)))
        off += 3
    return blocks, off  # off == total inequality rows


# geometric step-length grid for the nonsymmetric ratio test: 192 points
# from 1.0 down to ~1e-6 (ratio ~0.93 — at most ~7% step loss/iteration;
# the deep tail matters near convergence, where an exp/pow block hugging
# its boundary otherwise reports NO feasible step and freezes the
# iteration several digits short of the dtype's reachable accuracy)
_GRID = 0.930572 ** np.arange(192)


def _grid_max_step(feasible_at, dtype):
    """Largest grid alpha whose endpoint stays strictly interior.

    feasible_at: callable alpha -> bool array; evaluated on the whole
    grid at once (vmapped), masked max. Convexity makes the feasible
    alphas an interval, so endpoint checks suffice. The grid is cast to
    the iterate dtype (an f64 grid would silently promote the whole
    IPM state under jax_enable_x64).
    """
    grid = jnp.asarray(_GRID, dtype)
    ok = jax.vmap(feasible_at)(grid)
    return jnp.max(jnp.where(ok, grid, jnp.zeros((), dtype)))


def _exp_interior(v):
    x, y, z = v[0], v[1], v[2]
    ypos = y > _TINY
    zpos = z > _TINY
    psi = jnp.where(ypos & zpos, y * jnp.log(
        jnp.where(zpos, z, 1.0) / jnp.where(ypos, y, 1.0)) - x, -1.0)
    return ypos & zpos & (psi > _TINY)


def _exp_dual_interior(v):
    # K* = cl{(u,v,w): u < 0, -u e^{v/u} <= e w}; strict interior
    u, vv, w = v[0], v[1], v[2]
    uneg = u < -_TINY
    wpos = w > _TINY
    # log form: log(-u) + v/u < 1 + log(w)
    val = jnp.where(
        uneg & wpos,
        jnp.log(jnp.where(uneg, -u, 1.0)) + vv / jnp.where(uneg, u, -1.0)
        - 1.0 - jnp.log(jnp.where(wpos, w, 1.0)),
        1.0,
    )
    return uneg & wpos & (val < 0.0)


def _pow_interior(v, alpha):
    x, y, z = v[0], v[1], v[2]
    xpos = x > _TINY
    ypos = y > _TINY
    val = jnp.where(
        xpos & ypos,
        jnp.exp(2 * alpha * jnp.log(jnp.where(xpos, x, 1.0))
                + 2 * (1 - alpha) * jnp.log(jnp.where(ypos, y, 1.0)))
        - z * z,
        -1.0,
    )
    return xpos & ypos & (val > _TINY)


def _pow_dual_interior(v, alpha):
    # K*(a) = {(u,v,w): (u/a)^a (v/(1-a))^(1-a) >= |w|, u,v >= 0}
    scaled = jnp.stack([v[0] / alpha, v[1] / (1.0 - alpha), v[2]])
    return _pow_interior(scaled, alpha)


def _soc_nt_w(sb, zb):
    """NT scaling matrix W for one SOC block (Householder form)."""
    return _soc_nt_w_wi(sb, zb)[0]


def _soc_nt_w_wi(sb, zb):
    """(W, W^{-1}) for one SOC block, both in closed form.

    With H = 2vv' - J and v'Jv = 1 (which the NT construction
    guarantees), H J H = J exactly, so W = eta H has
    W^{-1} = (1/eta) J H J = (1/eta) (2 (Jv)(Jv)' - J) — no LU
    custom-call (jnp.linalg.inv on the (B, d, d) blocks was 64 ms of
    the 534 ms Markowitz-IPM device profile), and exact instead of
    factorization roundoff."""
    d = sb.shape[0]
    dtype = sb.dtype
    Jm = jnp.concatenate([jnp.ones(1, dtype), -jnp.ones(d - 1, dtype)])
    dets = jnp.maximum(sb[0] ** 2 - sb[1:] @ sb[1:], _TINY)
    detz = jnp.maximum(zb[0] ** 2 - zb[1:] @ zb[1:], _TINY)
    sbar = sb / jnp.sqrt(dets)
    zbar = zb / jnp.sqrt(detz)
    gamma = jnp.sqrt(jnp.maximum((1 + sbar @ zbar) / 2, _TINY))
    wb = (sbar + Jm * zbar) / (2 * gamma)
    vvec = wb.at[0].add(1.0) / jnp.sqrt(jnp.maximum(2.0 * (wb[0] + 1.0),
                                                    _TINY))
    eta = (dets / detz) ** 0.25
    W = eta * (2.0 * jnp.outer(vvec, vvec) - jnp.diag(Jm))
    jv = Jm * vvec
    Wi = (2.0 * jnp.outer(jv, jv) - jnp.diag(Jm)) / eta
    return W, Wi


def _psd_nt_w(sb, zb, side):
    """NT scaling matrix W (W Z W = S) for one PSD block, via two eigh."""
    S = svec_to_sym(sb, side)
    Z = svec_to_sym(zb, side)
    lz, Uz = jnp.linalg.eigh(Z)
    sq = jnp.sqrt(jnp.maximum(lz, _TINY))
    Zh = (Uz * sq) @ Uz.T
    Zih = (Uz / sq) @ Uz.T
    B = Zh @ S @ Zh
    lb, Ub = jnp.linalg.eigh(B)
    Bh = (Ub * jnp.sqrt(jnp.maximum(lb, _TINY))) @ Ub.T
    return Zih @ Bh @ Zih


def _psd_step_len(sb, dsb, side):
    """max alpha in [0,1] with S + alpha dS psd (eigenvalue ratio bound)."""
    S = svec_to_sym(sb, side)
    dS = svec_to_sym(dsb, side)
    ls, Us = jnp.linalg.eigh(S)
    Sih = (Us / jnp.sqrt(jnp.maximum(ls, _TINY))) @ Us.T
    lm = jnp.min(jnp.linalg.eigvalsh(Sih @ dS @ Sih))
    return jnp.where(lm < 0, jnp.minimum(1.0, -1.0 / lm), 1.0)


def _nonneg_step_len(sb, dsb):
    neg = dsb < 0
    cand = jnp.where(neg, -sb / jnp.where(neg, dsb, -1.0), jnp.inf)
    return jnp.clip(jnp.min(cand), 0.0, 1.0)


def _soc_step_len(s, ds):
    """max alpha in [0,1] with s + alpha ds in SOC."""
    a_ = ds[0] ** 2 - ds[1:] @ ds[1:]
    b_ = 2 * (s[0] * ds[0] - s[1:] @ ds[1:])
    c_ = s[0] ** 2 - s[1:] @ s[1:]
    disc = b_ * b_ - 4 * a_ * c_
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    safe_a = jnp.where(jnp.abs(a_) > _TINY, a_, 1.0)
    safe_b = jnp.where(jnp.abs(b_) > _TINY, b_, _TINY)
    r1 = jnp.where(jnp.abs(a_) > _TINY, (-b_ - sq) / (2 * safe_a),
                   -c_ / safe_b)
    r2 = jnp.where(jnp.abs(a_) > _TINY, (-b_ + sq) / (2 * safe_a), r1)
    roots = jnp.stack([r1, r2])
    pos = jnp.where(roots > 1e-12, roots, jnp.inf)
    amax = jnp.where(disc < 0, jnp.inf, jnp.min(pos))
    head = jnp.where(ds[0] < 0, -s[0] / jnp.where(ds[0] < 0, ds[0], -1.0),
                     jnp.inf)
    return jnp.clip(jnp.minimum(amax, head), 0.0, 1.0)


def make_ipm_solver(dims: ConeDims, n: int, settings: SolverSettings,
                    hsde: bool = False):
    """hsde=True (requires a structurally zero P): solve the homogeneous
    self-dual embedding instead of the primal-dual form — the BASELINE
    north-star formulation (SCS/diffcp's embedding, arXiv 1904.09043;
    reference SURVEY 0/2.2). The embedding adds one homogenizing pair
    (tau, kappa): infeasibility becomes an INTRINSIC verdict (tau -> 0,
    kappa > 0 with an exact certificate in the iterate itself, replacing
    the primal-dual form's almost-certificate heuristics), and because
    every residual is measured against tau-scaled data, the f32 floor is
    set by the HOMOGENEOUS system's conditioning, not the problem
    scaling. Costs one extra KKT solve per iteration (the shared
    tau-column solve d2) against the same cached factorization."""
    p_eq = dims.zero
    l = dims.nonneg
    blocks, mi = _block_layout(dims)
    m = dims.total
    st = settings
    max_it = st.ipm_max_iters
    # internal IPM convergence target. Like admm_eps for ADMM, this can
    # be TIGHTER than the final (post-polish) eps: on doubly degenerate
    # instances (SOC boundary active AND the optimum at a vertex) an IPM
    # that quits exactly at eps hands the polish a point on the EDGE of
    # its basin — the semismooth Newton then stalls at a Gauss-Newton
    # stationary point and the final check fails. Two more central-path
    # steps (eps/10) land inside the basin (measured: the two Markowitz
    # bench instances unsolved at ipm_eps=1e-4 polish to 1e-8 at 1e-5).
    ipm_eps = st.ipm_eps_abs if st.ipm_eps_abs > 0 else st.eps_abs
    # cone degree (barrier parameter normalization; CVXOPT convention:
    # 1 per nonneg row, 1 per SOC block, matrix side per PSD block,
    # 3 per exp/pow block)
    degree = max(
        l + len(dims.soc) + sum(dims.psd) + 3 * (dims.exp + len(dims.pow3)),
        1,
    )
    # projector onto the inequality cone (certificate distance checks)
    ineq_dims = ConeDims(zero=0, nonneg=dims.nonneg, soc=dims.soc,
                         exp=dims.exp, psd=dims.psd, pow3=dims.pow3)
    proj_ineq = make_cone_projector(ineq_dims)

    # identity / interior-point templates (numpy: captured in the closure,
    # safe to build during a jit trace)
    _e_np = np.zeros(mi)
    _e_np[:l] = 1.0
    _zint_np = np.zeros(mi)
    _zint_np[:l] = 1.0
    for fam, off, meta in blocks:
        if fam == "soc":
            _e_np[off] = 1.0
            _zint_np[off] = 1.0
        elif fam == "exp":
            _e_np[off:off + 3] = EXP_PRIMAL_INTERIOR
            _zint_np[off:off + 3] = EXP_DUAL_INTERIOR
        elif fam == "pow":
            _e_np[off:off + 3] = POW_INTERIOR
            _zint_np[off:off + 3] = POW_INTERIOR
        elif fam == "psd":
            side = meta
            k = off
            for j in range(side):
                _e_np[k] = 1.0  # svec(I): diagonal entries first per column
                _zint_np[k] = 1.0
                k += side - j

    def soc_jinv(zb):
        det = zb[0] ** 2 - zb[1:] @ zb[1:]
        det = jnp.where(jnp.abs(det) > _TINY, det, _TINY)
        return jnp.concatenate([zb[:1], -zb[1:]]) / det

    def soc_jprod(a, b):
        return jnp.concatenate(
            [(a @ b)[None], a[0] * b[1:] + b[0] * a[1:]]
        )

    def soc_jprod_inv(u, v):
        """Solve u o w = v (arrow solve)."""
        u0, u1 = u[0], u[1:]
        det = u0 * u0 - u1 @ u1
        det = jnp.where(jnp.abs(det) > _TINY, det, _TINY)
        w0 = (u0 * v[0] - u1 @ v[1:]) / det
        w1 = (v[1:] - w0 * u1) / jnp.where(jnp.abs(u0) > _TINY, u0, _TINY)
        return jnp.concatenate([w0[None], w1])

    # block widths derived from the layout's OWN offsets (not a second
    # per-family width mapping that could drift from _block_layout)
    _bd_widths = [
        (blocks[i + 1][1] if i + 1 < len(blocks) else mi) - off
        for i, (_f, off, _m) in enumerate(blocks)
    ]
    # structural-apply gate: unrolling a dynamic_slice/matmul/update
    # triple PER BLOCK into the Mehrotra loop regresses many-small-
    # block problems (+17% warm runtime at 80 exp cones, r5 review-
    # measured) while the dense product is cheap there; the structural
    # path only makes sense when the dense (mi, mi) product is large
    # and the blocks few (the n=500 class: one SOC block + a big
    # nonneg diagonal)
    _bd_structural = mi >= 512 and len(blocks) <= 8

    def bd_mv(Mden, v):
        """Matvec with the block-diagonal scaling matrix: structural
        blocks only when the gate says the dense (mi, mi) product is
        the expensive side — O(l + sum d^2) work instead of mi^2 HBM
        reads per application (measured end-to-end NEUTRAL at the
        n=500 shapes, kept for HBM hygiene; see STATUS r5)."""
        if mi == 0:
            return v
        if not _bd_structural:
            return Mden @ v
        out = jnp.zeros_like(v)
        diag = jnp.diagonal(Mden)
        if l:
            out = out.at[:l].set(diag[:l] * v[:l])
        for (fam, off, meta), d in zip(blocks, _bd_widths):
            blk = jax.lax.dynamic_slice(Mden, (off, off), (d, d))
            seg = jax.lax.dynamic_slice(v, (off,), (d,))
            out = jax.lax.dynamic_update_slice(out, blk @ seg, (off,))
        return out

    def bd_mm(Mden, X):
        """Block-diagonal @ (mi, k) matrix — see bd_mv."""
        if not _bd_structural:
            return Mden @ X
        out = jnp.zeros_like(X)
        diag = jnp.diagonal(Mden)
        if l:
            out = out.at[:l].set(diag[:l, None] * X[:l])
        for (fam, off, meta), d in zip(blocks, _bd_widths):
            blk = jax.lax.dynamic_slice(Mden, (off, off), (d, d))
            seg = jax.lax.dynamic_slice(X, (off, 0), (d, X.shape[1]))
            out = jax.lax.dynamic_update_slice(out, blk @ seg, (off, 0))
        return out

    def build_T(s, z, mu):
        """Block-diagonal scaling T (mi x mi) with T z ~= s on the path,
        its blockwise inverse, and a blockwise inverse square-root factor
        B with B' B = T^{-1} (the f32 KKT path QR-factorizes [Lp'; B A]
        instead of Cholesky-factorizing P + A' T^{-1} A, halving the
        exponent on cond(T) in the direction error)."""
        dtype = s.dtype
        T = jnp.zeros((mi, mi), dtype)
        Tinv = jnp.zeros((mi, mi), dtype)
        B = jnp.zeros((mi, mi), dtype)
        if l:
            idx = jnp.arange(l)
            ratio = s[:l] / jnp.maximum(z[:l], _TINY)
            T = T.at[idx, idx].set(ratio)
            inv = 1.0 / jnp.maximum(ratio, _TINY)
            Tinv = Tinv.at[idx, idx].set(inv)
            B = B.at[idx, idx].set(jnp.sqrt(inv))
        for fam, off, meta in blocks:
            if fam == "soc":
                d = meta
                W, Wi = _soc_nt_w_wi(s[off:off + d], z[off:off + d])
                T = jax.lax.dynamic_update_slice(T, W @ W, (off, off))
                Tinv = jax.lax.dynamic_update_slice(
                    Tinv, Wi @ Wi, (off, off)
                )
                # W is SPD, so Wi' Wi = Wi^2 = T^{-1}: B block is Wi
                B = jax.lax.dynamic_update_slice(B, Wi, (off, off))
            elif fam == "psd":
                side = meta
                D = side * (side + 1) // 2
                W = _psd_nt_w(s[off:off + D], z[off:off + D], side)
                lw, Uw = jnp.linalg.eigh(W)
                lw = jnp.maximum(lw, _TINY)
                Wi = (Uw / lw) @ Uw.T
                Wih = (Uw / jnp.sqrt(lw)) @ Uw.T
                basis = jnp.eye(D, dtype=dtype)
                Tb = jax.vmap(
                    lambda e: sym_to_svec(W @ svec_to_sym(e, side) @ W)
                )(basis).T
                Tbi = jax.vmap(
                    lambda e: sym_to_svec(Wi @ svec_to_sym(e, side) @ Wi)
                )(basis).T
                # symmetric-kron of the SPD Wi^{1/2}: B' B = kron_s(Wi,Wi)
                Bb = jax.vmap(
                    lambda e: sym_to_svec(Wih @ svec_to_sym(e, side) @ Wih)
                )(basis).T
                T = jax.lax.dynamic_update_slice(T, Tb, (off, off))
                Tinv = jax.lax.dynamic_update_slice(Tinv, Tbi, (off, off))
                B = jax.lax.dynamic_update_slice(B, Bb, (off, off))
            elif fam in ("exp", "pow"):
                H = (exp_hess(s[off:off + 3]) if fam == "exp"
                     else pow_hess(s[off:off + 3], meta))
                mu_s = jnp.maximum(mu, _TINY)
                # eigh with a RELATIVE eigenvalue floor instead of
                # inv/cholesky: near convergence the barrier Hessian's
                # condition passes 1/eps and a plain inv returns Inf/NaN,
                # which poisoned every subsequent direction (observed as
                # an f64 freeze at mu ~ 2e-7). The floor caps cond(H) at
                # ~1/floor with a mildly damped scaling — the IPM
                # tolerates inexact T, not non-finite T.
                floor = 1e-14 if dtype == jnp.float64 else 1e-6
                lh, Uh = jnp.linalg.eigh(H)
                lh = jnp.maximum(lh, jnp.max(jnp.abs(lh)) * floor + _TINY)
                Tb = (Uh / lh) @ Uh.T / mu_s
                T = jax.lax.dynamic_update_slice(T, Tb, (off, off))
                Tinv = jax.lax.dynamic_update_slice(
                    Tinv, mu_s * (Uh * lh) @ Uh.T, (off, off)
                )
                # T^{-1} = B'B with B = sqrt(mu) diag(sqrt(lh)) Uh'
                Bb = jnp.sqrt(mu_s) * (
                    jnp.sqrt(lh)[:, None] * Uh.T
                )
                B = jax.lax.dynamic_update_slice(B, Bb, (off, off))
        return T, Tinv, B

    def rc_affine(s, z, T):
        """Affine-step complementarity RHS: s (sym) / T z (nonsym)."""
        rc = s
        for fam, off, meta in blocks:
            if fam in ("exp", "pow"):
                Tb = jax.lax.dynamic_slice(T, (off, off), (3, 3))
                rc = jax.lax.dynamic_update_slice(
                    rc, Tb @ z[off:off + 3], (off,)
                )
        return rc

    def rc_combined(s, z, T, mu, sigma, ds_a, dz_a):
        """Combined-step RHS: centering + Mehrotra correction."""
        dtype = s.dtype
        rc = jnp.zeros(mi, dtype)
        smu = sigma * mu
        if l:
            zs = jnp.maximum(z[:l], _TINY)
            rc = rc.at[:l].set(
                s[:l] - smu / zs + ds_a[:l] * dz_a[:l] / zs
            )
        for fam, off, meta in blocks:
            if fam == "soc":
                d = meta
                sb, zb = s[off:off + d], z[off:off + d]
                zinv = soc_jinv(zb)
                # exact scaled-space Mehrotra term: with W the NT matrix,
                # W^{-1} ds_a = -(lam + W dz_a) in closed form, so
                # corr = W [lam^{-1} o ((W^{-1}ds_a) o (W dz_a))]
                W = _soc_nt_w(sb, zb)
                lam = W @ zb
                Wdz = W @ dz_a[off:off + d]
                eta = soc_jprod(-(lam + Wdz), Wdz)
                corr = W @ soc_jprod_inv(lam, eta)
                rc = jax.lax.dynamic_update_slice(
                    rc, sb - smu * zinv + corr, (off,)
                )
            elif fam == "psd":
                side = meta
                D = side * (side + 1) // 2
                Z = svec_to_sym(z[off:off + D], side)
                lz, Uz = jnp.linalg.eigh(Z)
                Zinv = (Uz / jnp.maximum(lz, _TINY)) @ Uz.T
                rc = jax.lax.dynamic_update_slice(
                    rc, s[off:off + D] - smu * sym_to_svec(Zinv), (off,)
                )
            elif fam == "exp":
                sb = s[off:off + 3]
                Tb = jax.lax.dynamic_slice(T, (off, off), (3, 3))
                rc = jax.lax.dynamic_update_slice(
                    rc, Tb @ (z[off:off + 3] + smu * exp_grad(sb)), (off,)
                )
            elif fam == "pow":
                sb = s[off:off + 3]
                Tb = jax.lax.dynamic_slice(T, (off, off), (3, 3))
                rc = jax.lax.dynamic_update_slice(
                    rc,
                    Tb @ (z[off:off + 3] + smu * pow_grad(sb, meta)),
                    (off,),
                )
        return rc

    def strict_interior(v, dual):
        """All-blocks strict cone membership (f32 step-acceptance check).

        The exact ratio tests in step_len are themselves computed in the
        iterate dtype; in f32 their roots can overshoot the boundary, in
        which case s'z goes negative and the NT scalings are garbage from
        then on (observed: one bad SOC step at mu~4e-4 threw the iterate
        to 1e7 and wedged the solver). Candidate steps are therefore
        verified with a direct membership check and backtracked if needed.
        """
        oks = [jnp.asarray(True)]
        if l:
            oks.append(jnp.min(v[:l]) > 0)
        for fam, off, meta in blocks:
            if fam == "soc":
                d = meta
                vb = v[off:off + d]
                oks.append(vb[0] - jnp.linalg.norm(vb[1:]) > 0)
            elif fam == "psd":
                side = meta
                D = side * (side + 1) // 2
                vb = v[off:off + D]
                oks.append(
                    jnp.min(jnp.linalg.eigvalsh(svec_to_sym(vb, side))) > 0
                )
            elif fam == "exp":
                vb = v[off:off + 3]
                oks.append((_exp_dual_interior if dual
                            else _exp_interior)(vb))
            elif fam == "pow":
                vb = v[off:off + 3]
                oks.append((_pow_dual_interior if dual
                            else _pow_interior)(vb, meta))
        return jnp.all(jnp.stack(oks))

    def step_len(v, dv, dual):
        """max alpha in [0,1] keeping v + alpha dv in K (dual=False) or
        K* (dual=True); zero for the nonsym grid when already infeasible."""
        alphas = [jnp.asarray(1.0, v.dtype)]
        if l:
            alphas.append(_nonneg_step_len(v[:l], dv[:l]))
        for fam, off, meta in blocks:
            if fam == "soc":
                d = meta
                alphas.append(_soc_step_len(v[off:off + d],
                                            dv[off:off + d]))
            elif fam == "psd":
                side = meta
                D = side * (side + 1) // 2
                alphas.append(_psd_step_len(v[off:off + D],
                                            dv[off:off + D], side))
            elif fam == "exp":
                vb, db = v[off:off + 3], dv[off:off + 3]
                member = _exp_dual_interior if dual else _exp_interior
                alphas.append(
                    _grid_max_step(lambda a: member(vb + a * db),
                                   v.dtype)
                )
            elif fam == "pow":
                vb, db = v[off:off + 3], dv[off:off + 3]
                member = _pow_dual_interior if dual else _pow_interior
                alphas.append(
                    _grid_max_step(lambda a: member(vb + a * db, meta),
                                   v.dtype)
                )
        return jnp.min(jnp.stack(alphas))

    def _make_kkt_solve(P, A_eq, A_in, dtype):
        """Build the per-data KKT FACTOR closure (shared by the
        primal-dual and HSDE paths — same scaled system, same
        condensation): kkt_factor(T, Tinv, B) factors ONCE and returns
        a solve(rx, ry, rz) closure. One IPM iteration solves against
        the same scaling three times (tau-column / predictor /
        corrector) — the r3 code re-derived the factorization inside
        every call and leaned on XLA CSE to dedupe it; the explicit
        split guarantees one factorization per iteration."""
        dim = n + p_eq + mi

        def kkt_factor(T, Tinv, B):
            """Factor [[P, Aeq', Ain'], [Aeq, 0, 0], [Ain, 0, -T]].

            f64: exact dense LU (factored once, lu_solve per rhs).
            f32 (TPU): exact condensation — eliminate dz via Tinv, then
            solve the n x n SPD S = P + sigma I + Ain' Tinv Ain by QR
            of the stacked factor M = [Lp'; B Ain] (S = M'M,
            semi-normal equations): computed R is backward-stable in M
            whose condition is sqrt(cond(S)), so with the trailing
            iterative-refinement pass the direction error scales with
            eps*cond(T)^(1/2) instead of eps*cond(T) — the f32 wall
            moves from cond(T)~1e7 to ~1e14. The full-f32 matmul
            precision matters here: bf16 default inputs would re-floor
            the condensation. Above MASKED_MAX_DIM the QR and the
            triangular inverse use the blocked (MXU-panel) kernels
            (measured at (128,1002,500) on v5e: QR 46.5 ms blocked vs
            81.3 custom-call; tri-inverse 14.8 vs 16.7)."""
            if dtype == jnp.float64:
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
                    K = K.at[n + p_eq:, n + p_eq:].set(-T)
                lu = jax.scipy.linalg.lu_factor(K)

                def solve_f64(rx, ry, rz_mod):
                    rhs = jnp.concatenate([-rx, -ry, -rz_mod])
                    sol = jax.scipy.linalg.lu_solve(lu, rhs)
                    return sol[:n], sol[n:n + p_eq], sol[n + p_eq:]

                return solve_f64

            with jax.default_matmul_precision("highest"):
                eye_n = jnp.eye(n, dtype=dtype)
                Lp = jnp.linalg.cholesky(P + st.sigma * eye_n)
                from .batched_linalg import (
                    house_qr_r,
                    qr_r,
                    tri_inv_blocked,
                    use_masked,
                )

                if mi:
                    M = jnp.concatenate([Lp.T, bd_mm(B, A_in)], axis=0)
                    # masked Householder at small sizes: the QR
                    # custom-call was 313 ms of the 534 ms
                    # Markowitz-IPM device profile (6.8 ms per batched
                    # (512,113,51) call, one per iteration); the
                    # masked loop is the same algorithm without the
                    # custom-call (R used only via R'R). Above the
                    # gate the per-column loop loses (HBM-bound, n=501
                    # 16x slower) and the blocked-WY panels win over
                    # the custom-call (46.5 vs 81.3 ms at
                    # (128,1002,500), r4-measured). At small sizes the
                    # blocked-WY measured slower than the per-column
                    # loop (3.8k vs 4.1k markowitz) — XLA fuses the
                    # simple loop better there.
                    # panel 64 below n=256: qr_r falls back to the
                    # per-column loop when n < 2*panel, which is the
                    # measured-slow choice above MASKED_MAX_DIM
                    if use_masked(n):
                        Rm = house_qr_r(M)
                    elif st.ipm_kkt in ("auto", "chol"):
                        # r5 (VERDICT r4 #1): at blocked sizes, skip
                        # the O(m n^2)-FLOP-but-sequential QR entirely.
                        # The QR's R satisfies R'R = M'M = S, so
                        # chol(M'M).T is the SAME mathematical factor
                        # at the cost of ONE MXU matmul + a bandwidth-
                        # bound (n, n) Cholesky (the chol custom-call
                        # measured fine at (128,500,500), STATUS r4) —
                        # blocked-QR was 47 ms x 26 iters = half the
                        # n500 device time. The f32 conditioning loss
                        # (eps*cond(S) vs the QR's eps*sqrt(cond(S)))
                        # is contained by (a) Jacobi pre-scaling of S
                        # before the factorization (the ill-conditioning
                        # of A'T^{-1}A near convergence is mostly
                        # row/col scale, which Jacobi removes), and
                        # (b) the existing iterative-refinement pass in
                        # solve_f32. Measured at (128, 1002, 500), v5e:
                        # n500 bench 31.9 -> 60+ solves/s at solved 1.0
                        # (see bench.py config note); ipm_kkt='qr'
                        # restores the semi-normal route.
                        S_ = M.T @ M
                        dj = jax.lax.rsqrt(jnp.maximum(
                            jnp.diagonal(S_), 1e-30))
                        # breakdown guard (r5 review): chol error grows
                        # as eps*cond(S) vs the QR's eps*sqrt — near an
                        # active SOC boundary cond(T) can push the
                        # scaled S past f32 chol breakdown (NaN
                        # factor), and an unguarded NaN poisons every
                        # later iterate. Guard = select the identity
                        # factor on a non-finite chol: the direction
                        # degrades to a Jacobi-preconditioned residual
                        # step for THAT iteration, which the IPM's
                        # strict-interior acceptance and stall cutoff
                        # handle benignly. Measured-zero cost; the two
                        # alternatives both lost real throughput
                        # (lax.cond retry: vmap runs both branches,
                        # 48.8 -> 38.6; an always-on 1e-6 diagonal
                        # floor: biased directions cost iterations,
                        # 48.8 -> 36.7). ipm_kkt='qr' remains the
                        # deep escape hatch.
                        Ss_ = S_ * dj[:, None] * dj[None, :]
                        Lc = jnp.linalg.cholesky(Ss_)
                        ok_ = jnp.all(jnp.isfinite(Lc))
                        Lc = jnp.where(ok_, jnp.where(
                            jnp.isfinite(Lc), Lc, 0.0),
                            jnp.eye(n, dtype=dtype))
                        Rm = (Lc / dj[:, None]).T
                    else:
                        Rm = qr_r(M, panel=(64 if n < 256 else 128))
                else:
                    Rm = Lp.T
                if use_masked(n):
                    Rmi = jax.scipy.linalg.solve_triangular(
                        Rm, eye_n, lower=False
                    )
                else:
                    Rmi = tri_inv_blocked(Rm, panel=128, lower=False)
                Sinv = Rmi @ Rmi.T
                if p_eq:
                    E = (A_eq @ (Sinv @ A_eq.T)
                         + st.sigma * jnp.eye(p_eq, dtype=dtype))
                    Le = jnp.linalg.cholesky(E)
                else:
                    Le = None

            def solve_cond(rx_, ry_, rz_):
                """One condensed solve of K d = [-rx_, -ry_, -rz_]."""
                g = -rx_ - (A_in.T @ bd_mv(Tinv, rz_)
                            if mi else 0.0)
                if p_eq:
                    rhs_y = A_eq @ (Sinv @ g) + ry_
                    z1 = jax.scipy.linalg.solve_triangular(
                        Le, rhs_y, lower=True
                    )
                    dy_ = jax.scipy.linalg.solve_triangular(
                        Le, z1, lower=True, trans=1
                    )
                    dx_ = Sinv @ (g - A_eq.T @ dy_)
                else:
                    dy_ = jnp.zeros(0, dtype)
                    dx_ = Sinv @ g
                dz_ = (bd_mv(Tinv, A_in @ dx_ + rz_) if mi
                       else jnp.zeros(0, dtype))
                return dx_, dy_, dz_

            def solve_f32(rx, ry, rz_mod):
                with jax.default_matmul_precision("highest"):
                    dx, dy, dz = solve_cond(rx, ry, rz_mod)
                    # one iterative-refinement pass with the cached
                    # factors: near an active SOC boundary T spans
                    # mu..1/mu and a single f32 condensation stalls
                    # ~1e-5 short; the correction squares the
                    # effective precision
                    res_x = rx \
                        + (P + st.sigma * jnp.eye(n, dtype=dtype)) @ dx \
                        + (A_eq.T @ dy if p_eq else 0.0) \
                        + (A_in.T @ dz if mi else 0.0)
                    res_y = (ry + A_eq @ dx - st.sigma * dy
                             if p_eq else jnp.zeros(0, dtype))
                    res_z = (rz_mod + A_in @ dx - bd_mv(T, dz)
                             if mi else jnp.zeros(0, dtype))
                    cx, cy, cz = solve_cond(res_x, res_y, res_z)
                    return dx + cx, dy + cy, dz + cz

            return solve_f32

        return kkt_factor

    def solve(P, q, A, b, x0, y0, s0):
        dtype = q.dtype
        e = jnp.asarray(_e_np, dtype)
        zint = jnp.asarray(_zint_np, dtype)
        A_eq = A[:p_eq]
        b_eq = b[:p_eq]
        A_in = A[p_eq:]
        b_in = b[p_eq:]
        kkt_factor = _make_kkt_solve(P, A_eq, A_in, dtype)

        def residuals(x, y, z, s):
            rx = P @ x + q + (A_eq.T @ y if p_eq else 0.0) + (
                A_in.T @ z if mi else jnp.zeros(n, dtype)
            )
            ry = (A_eq @ x - b_eq) if p_eq else jnp.zeros(0, dtype)
            rz = (A_in @ x + s - b_in) if mi else jnp.zeros(0, dtype)
            return rx, ry, rz

        # ---- initial point: least-squares KKT solve with identity
        # scaling, then per-block shift into the cone interior
        def _shift_into_cone(v, interior_pt):
            out = v
            if l:
                a = jnp.max(-v[:l]) if l else jnp.asarray(-jnp.inf, dtype)
                out = out.at[:l].set(
                    jnp.where(a >= -1e-3, v[:l] + (1.0 + a), v[:l])
                )
            for fam, off, meta in blocks:
                if fam == "soc":
                    d = meta
                    vb = v[off:off + d]
                    a = jnp.linalg.norm(vb[1:]) - vb[0]
                    eb = jnp.zeros(d, dtype).at[0].set(1.0)
                    out = jax.lax.dynamic_update_slice(
                        out,
                        jnp.where(a >= -1e-3, vb + (1.0 + a) * eb, vb),
                        (off,),
                    )
                elif fam == "psd":
                    side = meta
                    D = side * (side + 1) // 2
                    vb = v[off:off + D]
                    lmin = jnp.min(
                        jnp.linalg.eigvalsh(svec_to_sym(vb, side))
                    )
                    eb = interior_pt[off:off + D]
                    out = jax.lax.dynamic_update_slice(
                        out,
                        jnp.where(-lmin >= -1e-3, vb + (1.0 - lmin) * eb,
                                  vb),
                        (off,),
                    )
                else:  # exp/pow: reset to a canonical interior point at
                    # the least-squares magnitude (robust, scale-aware)
                    vb = v[off:off + 3]
                    scale = jnp.maximum(jnp.max(jnp.abs(vb)), 1.0)
                    out = jax.lax.dynamic_update_slice(
                        out, scale * interior_pt[off:off + 3], (off,)
                    )
            return out

        I_mi = jnp.eye(mi, dtype=dtype)
        x, y, z_hat = kkt_factor(I_mi, I_mi, I_mi)(q, -b_eq, -b_in)
        s = _shift_into_cone(-z_hat, e)
        z = _shift_into_cone(z_hat, zint)
        # warm start (data-dependent select, jit/vmap-safe): a nonzero
        # (x0, y0, s0) from a previous solve replaces the least-squares
        # initialization, with slacks/duals pushed back into the strict
        # interior by the same per-block shift — IPMs warm-start poorly
        # from ON the boundary, so the shift also mixes in a fixed
        # centering step toward the canonical interior point (the
        # standard Mehrotra-style warm-start correction)
        if x0 is not None:
            ws_norm = (jnp.max(jnp.abs(x0))
                       + (jnp.max(jnp.abs(s0)) if m else 0.0)
                       + (jnp.max(jnp.abs(y0)) if m else 0.0))
            have_ws = ws_norm > 0
            s_ws = s0[p_eq:] if mi else jnp.zeros(0, dtype)
            z_ws = y0[p_eq:] if mi else jnp.zeros(0, dtype)
            y_ws = y0[:p_eq]
            mix = 0.1
            s_ws = _shift_into_cone((1 - mix) * s_ws + mix * e, e)
            z_ws = _shift_into_cone((1 - mix) * z_ws + mix * zint, zint)
            x = jnp.where(have_ws, x0, x)
            y = jnp.where(have_ws, y_ws, y)
            s = jnp.where(have_ws, s_ws, s)
            z = jnp.where(have_ws, z_ws, z)

        b_norm = jnp.max(jnp.abs(b)) if m else jnp.asarray(0.0, dtype)
        q_norm = jnp.max(jnp.abs(q))

        def certificates(x, y, z):
            """Clarabel-style almost-certificate detection on normalized
            iterates (the analogue of the HSDE tau/kappa verdicts)."""
            u = jnp.concatenate([y, z]) if p_eq else z
            nu_ = jnp.max(jnp.abs(u)) if m else jnp.asarray(0.0, dtype)
            safe_nu = jnp.maximum(nu_, _TINY)
            uh = u / safe_nu
            Atu = A.T @ uh if m else jnp.zeros(n, dtype)
            btu = b @ uh if m else jnp.asarray(0.0, dtype)
            pinf = (
                (nu_ > 1e3)
                & (jnp.max(jnp.abs(Atu)) <= 1e-7 * (1.0 + q_norm))
                & (btu < -1e-5)
            )
            nx = jnp.max(jnp.abs(x))
            safe_nx = jnp.maximum(nx, _TINY)
            xh = x / safe_nx
            Axh = A_in @ xh if mi else jnp.zeros(0, dtype)
            rec_dist = (
                jnp.max(jnp.abs(-proj_ineq(-Axh) - Axh))
                if mi else jnp.asarray(0.0, dtype)
            )
            eq_dist = (
                jnp.max(jnp.abs(A_eq @ xh)) if p_eq
                else jnp.asarray(0.0, dtype)
            )
            dinf = (
                (nx > 1e3)
                & (jnp.max(jnp.abs(P @ xh)) <= 1e-7)
                & (eq_dist <= 1e-7 * (1.0 + b_norm))
                & (rec_dist <= 1e-7 * (1.0 + b_norm))
                & (q @ xh < -1e-5)
            )
            return pinf, dinf

        def body(state):
            x, y, z, s, it, status, stall, best = state
            mu = jnp.maximum(s @ z / degree, _TINY)
            T, Tinv, B = build_T(s, z, mu)
            ksolve = kkt_factor(T, Tinv, B)  # ONE factorization per
            # iteration, shared by predictor and corrector
            rx, ry, rz = residuals(x, y, z, s)

            # ---- affine (predictor) step
            rc_a = rc_affine(s, z, T)
            dx_a, dy_a, dz_a = ksolve(rx, ry, rz - rc_a)
            # ds from the third-row residual identity, NOT ds=-(rc+T dz):
            # multiplying dz's f32 error by the ill-conditioned T (norm
            # ~1/mu near an active SOC boundary) threw the primal
            # residual from 1e-4 to O(1) in one accepted step; this form
            # keeps A dx + ds = -rz exact to well-scaled f32 rounding
            ds_a = -(rz + A_in @ dx_a) if mi else jnp.zeros(0, dtype)
            alpha_aff = jnp.minimum(step_len(s, ds_a, False),
                                    step_len(z, dz_a, True))
            mu_aff = (
                (s + alpha_aff * ds_a) @ (z + alpha_aff * dz_a) / degree
            )
            sigma_c = jnp.clip((mu_aff / mu) ** 3, 0.0, 1.0)

            # ---- corrector (centering + Mehrotra second order)
            rc_c = rc_combined(s, z, T, mu, sigma_c, ds_a, dz_a)
            dx, dy, dz = ksolve(rx, ry, rz - rc_c)
            ds = -(rz + A_in @ dx) if mi else jnp.zeros(0, dtype)

            a_p = step_len(s, ds, False)
            a_d = step_len(z, dz, True)
            alpha = 0.99 * jnp.minimum(a_p, a_d)

            # step acceptance with backtracking: the largest alpha in
            # {alpha, alpha/2, alpha/4, alpha/8, 0} whose endpoint is
            # finite AND strictly interior on both sides with s'z > 0
            # (the f32 ratio tests can overshoot the boundary; a single
            # exterior step wedges the NT scalings permanently)
            def _ok_at(a):
                s_c = s + a * ds
                z_c = z + a * dz
                fin = (
                    jnp.all(jnp.isfinite(x + a * dx))
                    & jnp.all(jnp.isfinite(y + a * dy))
                    & jnp.all(jnp.isfinite(s_c))
                    & jnp.all(jnp.isfinite(z_c))
                )
                gap_ok = (s_c @ z_c > 0) if mi else jnp.asarray(True)
                return (fin & strict_interior(s_c, False)
                        & strict_interior(z_c, True) & gap_ok)

            alpha_eff = jnp.zeros((), dtype)
            for k in (0.125, 0.25, 0.5, 1.0):
                cand = alpha * k
                alpha_eff = jnp.where(_ok_at(cand), cand, alpha_eff)

            # guard the zero-step case with where: alpha_eff == 0 happens
            # exactly when every candidate was rejected, typically because
            # the direction is NaN/Inf (blown-up KKT solve) — and
            # 0 * NaN would still poison the iterate
            take = alpha_eff > 0
            x = jnp.where(take, x + alpha_eff * dx, x)
            y = jnp.where(take, y + alpha_eff * dy, y)
            z = jnp.where(take, z + alpha_eff * dz, z)
            s = jnp.where(take, s + alpha_eff * ds, s)
            it = it + 1
            # stall counter: consecutive rejected/zero steps mean the
            # dtype's KKT-direction precision floor is reached (f32 wall
            # at cond(T) ~ 1e7) — stop burning iterations, return best
            stall = jnp.where(alpha_eff > 1e-6, 0, stall + 1)

            rx2, ry2, rz2 = residuals(x, y, z, s)
            mu2 = s @ z / degree
            p_res = jnp.maximum(
                jnp.max(jnp.abs(ry2)) if p_eq else 0.0,
                jnp.max(jnp.abs(rz2)) if mi else 0.0,
            )
            d_res = jnp.max(jnp.abs(rx2))
            scale = 1.0 + jnp.maximum(q_norm, b_norm)
            done = (
                (p_res <= ipm_eps * scale)
                & (d_res <= ipm_eps * scale)
                & (mu2 <= ipm_eps * scale)
            )
            # best-iterate tracking: return the lowest-merit iterate, not
            # the last (an f32 run that stalls near its precision floor
            # should hand back its best point, as the polish refiner does)
            bx, by, bz, bs, bm = best
            merit = jnp.maximum(jnp.maximum(p_res, d_res), jnp.abs(mu2))
            better = merit < bm
            best = (
                jnp.where(better, x, bx), jnp.where(better, y, by),
                jnp.where(better, z, bz), jnp.where(better, s, bs),
                jnp.where(better, merit, bm),
            )
            pinf, dinf = certificates(x, y, z)
            status = jnp.where(
                done, SOLVED,
                jnp.where(pinf, PRIMAL_INFEASIBLE,
                          jnp.where(dinf, DUAL_INFEASIBLE, status)),
            ).astype(jnp.int32)
            return x, y, z, s, it, status, stall, best

        def cond(state):
            _, _, _, _, it, status, stall, _ = state
            return (status == MAX_ITERS) & (it < max_it) & (stall < 3)

        inf0 = jnp.asarray(jnp.inf, dtype)
        init = (x, y, z, s, jnp.asarray(0, jnp.int32),
                jnp.asarray(MAX_ITERS, jnp.int32),
                jnp.asarray(0, jnp.int32),
                (x, y, z, s, inf0))
        x, y, z, s, it, status, _, best = jax.lax.while_loop(
            cond, body, init
        )
        x, y, z, s, _ = best

        y_full = jnp.concatenate([y, z]) if p_eq else z
        s_full = jnp.concatenate([jnp.zeros(p_eq, dtype), s])
        pobj = 0.5 * x @ (P @ x) + q @ x
        return SolveResult(
            x=x, y=y_full, s=s_full, status=status, iters=it, pobj=pobj
        )

    # ------------------------------------------------------------- HSDE
    def solve_hsde(P, q, A, b, x0, y0, s0):
        """Mehrotra IPM on the homogeneous self-dual embedding (P = 0):

            rx = Aeq'y + Ain'z + q*tau        -> 0
            ry = Aeq x - beq*tau              -> 0
            rz = Ain x + s - bin*tau          -> 0
            rt = kappa + q'x + beq'y + bin'z  -> 0
            s in K, z in K*, tau, kappa >= 0; s'z = 0, tau*kappa = 0.

        Newton directions come from TWO solves against the same scaled
        KKT factorization (the iterate-residual solve d1 and the
        tau-column solve d2, shared by predictor and corrector), with
        dtau recovered from the gap row after eliminating dkappa."""
        dtype = q.dtype
        e = jnp.asarray(_e_np, dtype)
        zint = jnp.asarray(_zint_np, dtype)
        A_eq = A[:p_eq]
        b_eq = b[:p_eq]
        A_in = A[p_eq:]
        b_in = b[p_eq:]
        kkt_factor = _make_kkt_solve(P, A_eq, A_in, dtype)
        deg1 = degree + 1

        def g_of(dx, dy, dz):
            return (q @ dx + (b_eq @ dy if p_eq else 0.0)
                    + (b_in @ dz if mi else 0.0))

        def embed_residuals(x, y, z, s, tau):
            rx = q * tau + (A_eq.T @ y if p_eq else 0.0) + (
                A_in.T @ z if mi else jnp.zeros(n, dtype)
            )
            ry = (A_eq @ x - b_eq * tau) if p_eq else jnp.zeros(0, dtype)
            rz = ((A_in @ x + s - b_in * tau) if mi
                  else jnp.zeros(0, dtype))
            return rx, ry, rz

        def _ratio(v, dv):
            # max step in [0, 1] keeping v + a*dv >= 0 (scalar)
            return jnp.where(dv < 0, jnp.minimum(1.0, -v / dv), 1.0)

        # initial embedding point: canonical interior, tau = kappa = 1
        x = jnp.zeros(n, dtype)
        y = jnp.zeros(p_eq, dtype)
        s = e
        z = zint
        tau = jnp.asarray(1.0, dtype)
        kap = jnp.asarray(1.0, dtype)
        if x0 is not None:
            ws_norm = (jnp.max(jnp.abs(x0))
                       + (jnp.max(jnp.abs(s0)) if m else 0.0)
                       + (jnp.max(jnp.abs(y0)) if m else 0.0))
            have_ws = ws_norm > 0
            s_ws = s0[p_eq:] if mi else jnp.zeros(0, dtype)
            z_ws = y0[p_eq:] if mi else jnp.zeros(0, dtype)
            mix = 0.1
            s_ws = _shift_hsde(s_ws, e, mix)
            z_ws = _shift_hsde(z_ws, zint, mix)
            x = jnp.where(have_ws, x0, x)
            y = jnp.where(have_ws, y0[:p_eq], y)
            s = jnp.where(have_ws, s_ws, s)
            z = jnp.where(have_ws, z_ws, z)

        b_norm = jnp.max(jnp.abs(b)) if m else jnp.asarray(0.0, dtype)
        q_norm = jnp.max(jnp.abs(q))
        scale = 1.0 + jnp.maximum(q_norm, b_norm)

        def body(state):
            x, y, z, s, tau, kap, it, status, stall, best = state
            mu = jnp.maximum(
                ((s @ z if mi else 0.0) + tau * kap) / deg1, _TINY
            )
            T, Tinv, B = build_T(s, z, mu)
            ksolve = kkt_factor(T, Tinv, B)  # ONE factorization per
            # iteration, shared by the tau-column / predictor /
            # corrector solves
            rx, ry, rz = embed_residuals(x, y, z, s, tau)
            rt = kap + g_of(x, y, z)
            safe_tau = jnp.maximum(tau, _TINY)

            # shared tau-column solve: K d2 = [-q; beq; bin]
            dx2, dy2, dz2 = ksolve(q, -b_eq, -b_in)
            denom = g_of(dx2, dy2, dz2) - kap / safe_tau
            denom = jnp.where(jnp.abs(denom) > _TINY, denom, -_TINY)

            def directions(rc, rct):
                dx1, dy1, dz1 = ksolve(rx, ry, rz - rc)
                dtau = (-rt - g_of(dx1, dy1, dz1) + rct / safe_tau) / denom
                dx = dx1 + dtau * dx2
                dy = dy1 + dtau * dy2
                dz = dz1 + dtau * dz2
                ds = (-(rz + A_in @ dx - b_in * dtau) if mi
                      else jnp.zeros(0, dtype))
                dkap = -(rct + kap * dtau) / safe_tau
                return dx, dy, dz, ds, dtau, dkap

            # ---- predictor
            rc_a = rc_affine(s, z, T)
            dxa, dya, dza, dsa, dta, dka = directions(rc_a, tau * kap)
            alpha_aff = jnp.minimum(
                jnp.minimum(step_len(s, dsa, False),
                            step_len(z, dza, True)),
                jnp.minimum(_ratio(tau, dta), _ratio(kap, dka)),
            )
            mu_aff = (
                ((s + alpha_aff * dsa) @ (z + alpha_aff * dza)
                 if mi else 0.0)
                + (tau + alpha_aff * dta) * (kap + alpha_aff * dka)
            ) / deg1
            sigma_c = jnp.clip((mu_aff / mu) ** 3, 0.0, 1.0)

            # ---- corrector
            rc_c = rc_combined(s, z, T, mu, sigma_c, dsa, dza)
            rct_c = tau * kap - sigma_c * mu + dta * dka
            dx, dy, dz, ds, dtau, dkap = directions(rc_c, rct_c)

            alpha = 0.99 * jnp.minimum(
                jnp.minimum(step_len(s, ds, False),
                            step_len(z, dz, True)),
                jnp.minimum(_ratio(tau, dtau), _ratio(kap, dkap)),
            )

            def _ok_at(a):
                s_c = s + a * ds
                z_c = z + a * dz
                t_c = tau + a * dtau
                k_c = kap + a * dkap
                fin = (
                    jnp.all(jnp.isfinite(x + a * dx))
                    & jnp.all(jnp.isfinite(y + a * dy))
                    & jnp.all(jnp.isfinite(s_c))
                    & jnp.all(jnp.isfinite(z_c))
                    & jnp.isfinite(t_c) & jnp.isfinite(k_c)
                )
                gap_ok = ((s_c @ z_c if mi else 0.0) + t_c * k_c) > 0
                return (fin & strict_interior(s_c, False)
                        & strict_interior(z_c, True)
                        & (t_c > 0) & (k_c > 0) & gap_ok)

            alpha_eff = jnp.zeros((), dtype)
            for k_ in (0.125, 0.25, 0.5, 1.0):
                cand = alpha * k_
                alpha_eff = jnp.where(_ok_at(cand), cand, alpha_eff)

            take = alpha_eff > 0
            x = jnp.where(take, x + alpha_eff * dx, x)
            y = jnp.where(take, y + alpha_eff * dy, y)
            z = jnp.where(take, z + alpha_eff * dz, z)
            s = jnp.where(take, s + alpha_eff * ds, s)
            tau = jnp.where(take, tau + alpha_eff * dtau, tau)
            kap = jnp.where(take, kap + alpha_eff * dkap, kap)
            it = it + 1
            stall = jnp.where(alpha_eff > 1e-6, 0, stall + 1)

            # ---- normalized convergence / intrinsic certificates
            st_ = jnp.maximum(tau, _TINY)
            xh, yh, zh, sh = x / st_, y / st_, z / st_, s / st_
            rxh, ryh, rzh = embed_residuals(xh, yh, zh, sh, 1.0)
            p_res = jnp.maximum(
                jnp.max(jnp.abs(ryh)) if p_eq else 0.0,
                jnp.max(jnp.abs(rzh)) if mi else 0.0,
            )
            d_res = jnp.max(jnp.abs(rxh))
            gap = ((sh @ zh if mi else 0.0)) / degree
            done = (
                (p_res <= ipm_eps * scale)
                & (d_res <= ipm_eps * scale)
                & (gap <= ipm_eps * scale)
            )
            # tau -> 0: the iterate IS the certificate (exact, not an
            # almost-certificate heuristic)
            bty = g_of(jnp.zeros(n, dtype), y, z)
            qtx = q @ x
            Atu = (A.T @ jnp.concatenate([y, z]) if p_eq else
                   (A.T @ z if m else jnp.zeros(n, dtype)))
            inf_regime = kap > 1e3 * tau
            pinf = (
                inf_regime & (bty < -_TINY)
                & (jnp.max(jnp.abs(Atu)) <= 1e-6 * scale * (-bty))
            )
            Axs = ((A_in @ x + s) if mi else jnp.zeros(0, dtype))
            eqx = (A_eq @ x) if p_eq else jnp.zeros(0, dtype)
            dinf = (
                inf_regime & (qtx < -_TINY)
                & ((jnp.max(jnp.abs(eqx)) if p_eq else 0.0)
                   <= 1e-6 * scale * (-qtx))
                & ((jnp.max(jnp.abs(Axs)) if mi else 0.0)
                   <= 1e-6 * scale * (-qtx))
            )
            status = jnp.where(
                done, SOLVED,
                jnp.where(pinf, PRIMAL_INFEASIBLE,
                          jnp.where(dinf, DUAL_INFEASIBLE, status)),
            ).astype(jnp.int32)

            bx, by, bz, bs, btau, bm = best
            merit = jnp.maximum(jnp.maximum(p_res, d_res), jnp.abs(gap))
            better = merit < bm
            best = (
                jnp.where(better, x, bx), jnp.where(better, y, by),
                jnp.where(better, z, bz), jnp.where(better, s, bs),
                jnp.where(better, tau, btau), jnp.where(better, merit, bm),
            )
            return x, y, z, s, tau, kap, it, status, stall, best

        def cond(state):
            *_, it, status, stall, _ = state
            return (status == MAX_ITERS) & (it < max_it) & (stall < 3)

        inf0 = jnp.asarray(jnp.inf, dtype)
        init = (x, y, z, s, tau, kap, jnp.asarray(0, jnp.int32),
                jnp.asarray(MAX_ITERS, jnp.int32), jnp.asarray(0, jnp.int32),
                (x, y, z, s, tau, inf0))
        x, y, z, s, tau, kap, it, status, _, best = jax.lax.while_loop(
            cond, body, init
        )
        bx, by, bz, bs, btau, _ = best
        infeasible = (status == PRIMAL_INFEASIBLE) | (
            status == DUAL_INFEASIBLE
        )
        # solved path: return the tau-normalized best iterate; on an
        # infeasibility verdict return the LAST iterate unscaled — it is
        # the certificate itself
        st_ = jnp.maximum(btau, _TINY)
        xr = jnp.where(infeasible, x, bx / st_)
        yr = jnp.where(infeasible, y, by / st_)
        zr = jnp.where(infeasible, z, bz / st_)
        sr = jnp.where(infeasible, s, bs / st_)
        y_full = jnp.concatenate([yr, zr]) if p_eq else zr
        s_full = jnp.concatenate([jnp.zeros(p_eq, dtype), sr])
        pobj = q @ xr
        return SolveResult(
            x=xr, y=y_full, s=s_full, status=status, iters=it, pobj=pobj
        )

    def _shift_hsde(v, interior_pt, mix):
        # interior shift used by the HSDE warm start (defined after
        # solve's _shift_into_cone is out of scope here): convex-mix
        # toward the canonical interior point, then per-family repair
        vv = (1 - mix) * v + mix * interior_pt
        out = vv
        if l:
            out = out.at[:l].set(jnp.maximum(vv[:l], 1e-3))
        for fam, off, meta in blocks:
            if fam == "soc":
                d = meta
                vb = vv[off:off + d]
                a = jnp.linalg.norm(vb[1:]) - vb[0]
                eb = jnp.zeros(mi, vv.dtype).at[off].set(1.0)[off:off + d]
                out = jax.lax.dynamic_update_slice(
                    out,
                    jnp.where(a >= -1e-3, vb + (1.0 + a) * eb, vb),
                    (off,),
                )
            elif fam in ("exp", "pow", "psd"):
                blk = (meta * (meta + 1) // 2 if fam == "psd" else 3)
                out = jax.lax.dynamic_update_slice(
                    out, interior_pt[off:off + blk], (off,)
                )
        return out

    return solve_hsde if hsde else solve
