"""Euclidean projections onto the supported cones, in pure JAX.

These are the atoms of both the forward ADMM solver and the implicit
differentiation engine (the role played by diffcp's C++ `cones.cpp` /
SCS's `exp_cone.c`/`pow_cone.c` in the reference stack; see
cvxpylayers SURVEY section 2.2). Everything here is:

  * jit/vmap-compatible: static shapes, fixed iteration counts,
    branchless `jnp.where` case selection with NaN-safe guards;
  * differentiable: the iterative projections (exp, pow) run a
    non-differentiable bisection to locate the root, then apply two
    *symbolic* Newton steps from the stop-gradient'd root, so JAX
    autodiff (fwd and rev) recovers the exact implicit-function
    derivative of the projection;
  * f32/f64 polymorphic.

Layout convention for the product cone (matches ConeDims):
  [zero | nonneg | soc blocks | exp triples | psd svec blocks | pow triples]
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp

from .dims import ConeDims

# Iteration counts for the 1-D root finds inside the exp and power cone
# projections, per dtype. These scans are SEQUENTIAL on TPU (each step is a
# tiny batched VPU op), so their length is pure latency in every residual
# eval of the polish — size them to land inside the basin of the two
# trailing symbolic-Newton refinements (quadratic), not to machine eps.
# Bracket ends are clipped to the dtype cap (30 / 300), so expansion
# saturates after ~10 doublings; f32 bisection of a <=60-wide bracket
# reaches ~6e-8 in 30 halvings before Newton. f64 (CPU test oracles at
# 1e-10..1e-12) keeps a generous budget.


def _root_iters(dtype):
    """(expand, bisect) scan lengths for the given dtype, sized to land
    the bracket inside the trailing symbolic-Newton basin (not at
    machine eps): caps bound the bracket width by ~60 (f32) / ~600
    (f64), so 30 / 60 halvings reach ~6e-8 / ~5e-16."""
    if dtype == jnp.float32:
        return 8, 30
    return 12, 60


def _pow_root_iters(dtype):
    """Safeguarded-Newton budget for the power-cone root (its residual is
    algebraic, so Newton converges in a handful of steps; measured Moreau
    orthogonality 2e-16 f64 / 9e-8 f32 at these budgets)."""
    return 10 if dtype == jnp.float32 else 18


def _newton_bisect(h_fn, lo, hi, iters):
    """Root of the increasing function h on [lo, hi] by safeguarded
    Newton: each step takes the Newton iterate when it stays strictly
    inside the current bracket, a bisection midpoint otherwise. One
    h-and-derivative evaluation per iteration (sequential VPU latency is
    what these scans cost on TPU — see _root_iters)."""
    import jax as _jax

    h_and_dh = _jax.value_and_grad(h_fn)
    x0 = 0.5 * (lo + hi)

    def body(state, _):
        lo_, hi_, x_ = state
        hx, dhx = h_and_dh(x_)
        hx = jnp.where(jnp.isfinite(hx), hx, jnp.inf)
        # h increasing: h(x) > 0 -> root left of x
        lo_n = jnp.where(hx > 0, lo_, x_)
        hi_n = jnp.where(hx > 0, x_, hi_)
        newton = jnp.where(
            jnp.abs(dhx) > 1e-300, x_ - hx / dhx, lo_n - 1.0
        )
        inside = (newton > lo_n) & (newton < hi_n) & jnp.isfinite(newton)
        xn = jnp.where(inside, newton, 0.5 * (lo_n + hi_n))
        return (lo_n, hi_n, xn), None

    (_, _, x), _ = jax.lax.scan(body, (lo, hi, x0), None, length=iters)
    return x


# ---------------------------------------------------------------------------
# Simple cones
# ---------------------------------------------------------------------------


def project_zero(v: jax.Array) -> jax.Array:
    """Projection onto {0}. (Dual variable of equalities is free.)"""
    return jnp.zeros_like(v)


def project_nonneg(v: jax.Array) -> jax.Array:
    return jnp.maximum(v, 0.0)


def project_soc(v: jax.Array) -> jax.Array:
    """Project a single (t, x) block onto the second-order cone ||x|| <= t.

    v has shape (d,) with v[0] = t, v[1:] = x. Differentiable everywhere the
    projection is (i.e. away from the nonsmooth boundary ||x|| = -t).
    """
    t = v[0]
    x = v[1:]
    nx = jnp.linalg.norm(x)
    # Case 1: inside the cone -> identity.
    # Case 2: inside the polar -K* -> 0.
    # Case 3: scale onto the boundary.
    safe_nx = jnp.where(nx > 0, nx, 1.0)
    coef = (t + nx) / 2.0
    boundary = jnp.concatenate([coef[None], (coef / safe_nx) * x])
    inside = nx <= t
    polar = nx <= -t
    out = jnp.where(inside, v, jnp.where(polar, jnp.zeros_like(v), boundary))
    return out


def _soc_many(v_flat: jax.Array, d: int, n_blocks: int) -> jax.Array:
    """vmapped projection of n_blocks SOC blocks of identical size d."""
    blocks = v_flat.reshape(n_blocks, d)
    return jax.vmap(project_soc)(blocks).reshape(-1)


# ---------------------------------------------------------------------------
# Exponential cone
#   Kexp = cl{(x, y, z) : y > 0, y * exp(x / y) <= z}
# Projection via Friberg-style univariate root find: the boundary projection
# is p = y_a * (a, 1, e^a) with
#   y_a    = ((a - 1) r0 + s0) / (a^2 - a + 1)
#   h(a)   = ((a - 1) r0 + s0) e^a - (r0 - a s0) e^{-a} - (a^2 - a + 1) t0
# and a* the root of h. (Same 1-D system SCS's exp_cone.c solves.)
# ---------------------------------------------------------------------------


def _exp_h(a, r0, s0, t0):
    quad = a * (a - 1.0) + 1.0
    return ((a - 1.0) * r0 + s0) * jnp.exp(a) - (r0 - a * s0) * jnp.exp(-a) - quad * t0


def _exp_boundary_point(a, r0, s0, t0):
    quad = a * (a - 1.0) + 1.0
    y = ((a - 1.0) * r0 + s0) / quad
    y = jnp.maximum(y, 0.0)
    return jnp.stack([a * y, y, y * jnp.exp(a)])


def _in_exp_cone(r, s, t):
    """Membership in cl(Kexp) (exact, no tolerance)."""
    s_pos = s > 0
    safe_s = jnp.where(s_pos, s, 1.0)
    interior = s_pos & (s * jnp.exp(r / safe_s) <= t)
    ray = (~s_pos) & (s >= 0) & (r <= 0) & (t >= 0)
    return interior | ray


def _in_exp_dual(u, v, w):
    """Membership in Kexp* = cl{(u,v,w): u<0, -u e^{v/u} <= e w} ∪ {0}xR+xR+."""
    u_neg = u < 0
    safe_u = jnp.where(u_neg, u, -1.0)
    interior = u_neg & (w >= 0) & (-u * jnp.exp(v / safe_u) <= jnp.e * w)
    ray = (~u_neg) & (u <= 0) & (v >= 0) & (w >= 0)
    return interior | ray


def _exp_solve_root(r0, s0, t0):
    """Locate the root a* of h(a) by bracket expansion + bisection.

    Valid bracket: y_a >= 0 requires (a-1) r0 + s0 >= 0, mu >= 0 requires
    r0 - a s0 >= 0; h is strictly increasing between those limits.
    Runs under stop_gradient — derivative comes from symbolic Newton after.

    The bracket is capped dtype-dependently: e^|a| must stay finite (f32
    overflows at a ~ 88 and the resulting inf arithmetic produced NaN
    projections), and roots beyond the cap are indistinguishable from the
    degenerate faces at that precision anyway.
    """
    cap = 30.0 if r0.dtype == jnp.float32 else 300.0
    big = jnp.asarray(cap, r0.dtype)
    # Finite ends of the validity interval where they exist.
    lo = jnp.where(r0 > 0, 1.0 - s0 / jnp.where(r0 > 0, r0, 1.0), -big)
    hi = jnp.where(s0 > 0, r0 / jnp.where(s0 > 0, s0, 1.0), big)
    lo = jnp.clip(lo, -big, big)
    hi = jnp.clip(hi, -big, big)
    lo = jnp.minimum(lo, hi)  # guard degenerate ordering

    h_lo = _exp_h(lo, r0, s0, t0)
    h_hi = _exp_h(hi, r0, s0, t0)

    # Expand an end if both endpoint values share a sign (can happen with the
    # +-big caps); double the interval away from the fixed end.
    def expand(state, _):
        lo_, hi_, hlo_, hhi_ = state
        # Sign comparison, not a product: h values can be +-1e200 and their
        # product overflows (to inf in f64, but to NaN-prone inf arithmetic
        # in f32 on TPU).
        no_bracket = (hlo_ > 0) == (hhi_ > 0)
        width = jnp.maximum(hi_ - lo_, 1.0)
        # Move the end whose sign matches "the wrong way": if both positive,
        # extend lo downward; if both negative, extend hi upward.
        both_pos = no_bracket & (hlo_ > 0)
        both_neg = no_bracket & (hlo_ <= 0)
        new_lo = jnp.maximum(jnp.where(both_pos, lo_ - width, lo_), -big)
        new_hi = jnp.minimum(jnp.where(both_neg, hi_ + width, hi_), big)
        new_hlo = jnp.where(both_pos, _exp_h(new_lo, r0, s0, t0), hlo_)
        new_hhi = jnp.where(both_neg, _exp_h(new_hi, r0, s0, t0), hhi_)
        return (new_lo, new_hi, new_hlo, new_hhi), None

    n_expand, n_bisect = _root_iters(r0.dtype)
    (lo, hi, h_lo, h_hi), _ = jax.lax.scan(
        expand, (lo, hi, h_lo, h_hi), None, length=n_expand
    )

    # pure bisection: Newton on h crawls (h ~ +-e^{|a|} far from the
    # root makes Newton steps O(1) long), while halvings are guaranteed
    def bisect(state, _):
        lo_, hi_, hlo_ = state
        mid = 0.5 * (lo_ + hi_)
        hmid = _exp_h(mid, r0, s0, t0)
        same = (hmid > 0) == (hlo_ > 0)
        new_lo = jnp.where(same, mid, lo_)
        new_hlo = jnp.where(same, hmid, hlo_)
        new_hi = jnp.where(same, hi_, mid)
        return (new_lo, new_hi, new_hlo), None

    (lo, hi, _), _ = jax.lax.scan(bisect, (lo, hi, h_lo), None,
                                  length=n_bisect)
    return 0.5 * (lo + hi)


def project_exp(v: jax.Array) -> jax.Array:
    """Project one (x, y, z) triple onto the primal exponential cone.

    Differentiable via two symbolic Newton refinements of the bisection root.
    """
    r0, s0, t0 = v[0], v[1], v[2]

    in_cone = _in_exp_cone(r0, s0, t0)
    # Polar cone K° = -K*: v in K° iff -v in K*.
    in_polar = _in_exp_dual(-r0, -s0, -t0)
    # Degenerate quadrant: r0 <= 0, s0 <= 0 projects onto the ray face.
    degenerate = (r0 <= 0) & (s0 <= 0)

    a0 = jax.lax.stop_gradient(_exp_solve_root(r0, s0, t0))
    # Symbolic Newton steps: differentiable in (r0, s0, t0), so autodiff
    # yields the implicit-function derivative of the root a*(v0).
    for _ in range(3):
        h = _exp_h(a0, r0, s0, t0)
        dh = jax.grad(_exp_h, argnums=0)(a0, r0, s0, t0)
        a0 = a0 - h / jnp.where(jnp.abs(dh) > 1e-12, dh, 1.0)
    boundary = _exp_boundary_point(a0, r0, s0, t0)

    # Safety net for the exponential cliff: when the root a* is large,
    # y* ~ t0 e^{-a} is unrepresentable next to the cancellation error of
    # (a-1) r0 + s0 and the parametrized boundary point explodes (z = y
    # e^a picks up e^{a} times that error). The y = 0 face point
    # (min(r0,0), 0, t0+) is always in cl(Kexp) and IS the limit of the
    # boundary there — take whichever candidate is closer to v.
    face = jnp.stack(
        [jnp.minimum(r0, 0.0), jnp.zeros_like(s0), jnp.maximum(t0, 0.0)]
    )
    b_ok = jnp.all(jnp.isfinite(boundary))
    d_b = jnp.where(b_ok, jnp.sum((v - boundary) ** 2), jnp.inf)
    d_f = jnp.sum((v - face) ** 2)
    boundary = jnp.where(b_ok & (d_b <= d_f), boundary, face)

    degenerate_proj = jnp.stack([r0, jnp.zeros_like(s0), jnp.maximum(t0, 0.0)])

    out = jnp.where(
        in_cone,
        v,
        jnp.where(
            in_polar,
            jnp.zeros_like(v),
            jnp.where(degenerate, degenerate_proj, boundary),
        ),
    )
    return out


# ---------------------------------------------------------------------------
# 3-D power cone
#   Kpow(a) = {(x, y, z) : x^a y^(1-a) >= |z|, x >= 0, y >= 0}
# Dual: Kpow(a)* = {(u, v, w) : (u/a)^a (v/(1-a))^(1-a) >= |w|, u, v >= 0}.
# Projection via a 1-D root find on the dual residual r in (0, |z0|)
# (same scheme as SCS pow_cone.c): the projection of v0=(x0,y0,z0) with
# z0 != 0 onto the boundary satisfies
#   x = 0.5 (x0 + sqrt(x0^2 + 4 a r (|z0| - r)))
#   y = 0.5 (y0 + sqrt(y0^2 + 4 (1-a) r (|z0| - r)))
#   z = sign(z0) * r ... with r the root of g(r) = x^a y^(1-a) - r.
# ---------------------------------------------------------------------------


def _pow_xy(r, x0, y0, az, alpha):
    """Candidate boundary (x, y) for multiplier-parametrized projection."""
    xx = 0.5 * (x0 + jnp.sqrt(x0 * x0 + 4.0 * alpha * r * (az - r)))
    yy = 0.5 * (y0 + jnp.sqrt(y0 * y0 + 4.0 * (1.0 - alpha) * r * (az - r)))
    return xx, yy


def _pow_g(r, x0, y0, az, alpha):
    xx, yy = _pow_xy(r, x0, y0, az, alpha)
    xx = jnp.maximum(xx, 1e-300)
    yy = jnp.maximum(yy, 1e-300)
    return jnp.exp(alpha * jnp.log(xx) + (1.0 - alpha) * jnp.log(yy)) - r


def _in_pow_cone(x, y, z, alpha):
    ok = (x >= 0) & (y >= 0)
    sx = jnp.maximum(x, 0.0)
    sy = jnp.maximum(y, 0.0)
    # x^a y^(1-a) >= |z| with 0^anything handled by where.
    val = jnp.where(
        (sx > 0) & (sy > 0),
        jnp.exp(
            alpha * jnp.log(jnp.where(sx > 0, sx, 1.0))
            + (1.0 - alpha) * jnp.log(jnp.where(sy > 0, sy, 1.0))
        ),
        0.0,
    )
    return ok & (val >= jnp.abs(z))


def _in_pow_polar(x, y, z, alpha):
    # v in K° iff -v in K*: (u,v,w)=(-x,-y,-z); need u,v >= 0 and
    # (u/a)^a (v/(1-a))^(1-a) >= |w|.
    u = -x
    v_ = -y
    return _in_pow_cone(u / alpha, v_ / (1.0 - alpha), z, alpha)


def project_pow3(v: jax.Array, alpha) -> jax.Array:
    """Project one (x, y, z) triple onto the 3-D power cone with power alpha."""
    x0, y0, z0 = v[0], v[1], v[2]
    alpha = jnp.asarray(alpha, v.dtype)

    in_cone = _in_pow_cone(x0, y0, z0, alpha)
    in_polar = _in_pow_polar(x0, y0, z0, alpha)

    az = jnp.abs(z0)
    # Nontrivial case: z0 != 0 handled by root find on (0, az); the az == 0
    # limit degenerates to clamping x, y at 0, which the closed form below
    # reproduces as r -> 0, so we use a floor on the bracket instead of a
    # separate branch.
    az_safe = jnp.maximum(az, 1e-30)

    # g(0+) >= 0, g(az) <= 0 (g decreasing): run safeguarded Newton on
    # the increasing -g over (0, az)
    r = jax.lax.stop_gradient(
        _newton_bisect(
            lambda rr: -_pow_g(rr, x0, y0, az_safe, alpha),
            jnp.zeros_like(az_safe), az_safe, _pow_root_iters(v.dtype),
        )
    )
    # Symbolic Newton refinement for implicit differentiation.
    for _ in range(2):
        g = _pow_g(r, x0, y0, az_safe, alpha)
        dg = jax.grad(_pow_g, argnums=0)(r, x0, y0, az_safe, alpha)
        r = r - g / jnp.where(jnp.abs(dg) > 1e-12, dg, 1.0)
    r = jnp.clip(r, 0.0, az_safe)

    xx, yy = _pow_xy(r, x0, y0, az_safe, alpha)
    zz = jnp.sign(z0) * r
    boundary = jnp.stack([xx, yy, zz])

    out = jnp.where(
        in_cone,
        v,
        jnp.where(in_polar, jnp.zeros_like(v), boundary),
    )
    return out


# ---------------------------------------------------------------------------
# PSD cone in svec coordinates
# ---------------------------------------------------------------------------


def svec_indices(s: int):
    """Row/col index arrays for the scaled lower-triangular vectorization.

    svec ordering is column-major lower triangle: (0,0), (1,0), ..., (s-1,0),
    (1,1), ..., matching the reference's packing (cvxpylayers
    torch/cvxpylayer.py:144-222 semantics).
    """
    rows = []
    cols = []
    for j in range(s):
        for i in range(j, s):
            rows.append(i)
            cols.append(j)
    return jnp.array(rows), jnp.array(cols)


def svec_to_sym(v: jax.Array, s: int) -> jax.Array:
    """Unpack svec (length s(s+1)/2, off-diag scaled by sqrt(2)) to (s, s)."""
    rows, cols = svec_indices(s)
    scale = jnp.where(rows == cols, 1.0, 1.0 / math.sqrt(2.0)).astype(v.dtype)
    M = jnp.zeros((s, s), v.dtype)
    M = M.at[rows, cols].set(v * scale)
    M = M.at[cols, rows].set(v * scale)
    return M


def sym_to_svec(M: jax.Array) -> jax.Array:
    """Pack a symmetric (s, s) matrix into svec with sqrt(2)-scaled off-diag."""
    s = M.shape[0]
    rows, cols = svec_indices(s)
    scale = jnp.where(rows == cols, 1.0, math.sqrt(2.0)).astype(M.dtype)
    return M[rows, cols] * scale


def project_psd_svec(v: jax.Array, s: int) -> jax.Array:
    """Project an svec-packed block onto the PSD cone (eigenvalue clamping)."""
    M = svec_to_sym(v, s)
    w, U = jnp.linalg.eigh(M)
    w = jnp.maximum(w, 0.0)
    P = (U * w[None, :]) @ U.T
    return sym_to_svec(P)


_NS_SIGN_ITERS = 18


def project_psd_svec_ns(v: jax.Array, s: int) -> jax.Array:
    """Matmul-only approximate PSD projection via the Newton-Schulz
    matrix-sign iteration: Pi(M) = (M + M sign(M)) / 2 with sign(M)
    approximated by 18 rounds of Y <- 1.5 Y - 0.5 Y^3 on the
    Frobenius-normalized block.

    ~36 (s, s) matmuls replace one batched eigh LAPACK custom-call —
    the eigh custom-call inside the ADMM scan dominates everything
    else on the 16x16-block SDP bench class (v5e, r5-measured): the
    shipped config (NS inner loop + exact-eigh statuses/polish at
    refine_steps 5) measures 423 fwd+bwd solves/s vs 36 for
    eigh-everywhere — 11.7x. (An NS-everywhere prototype read 540
    but certified against the smoothed cone — rejected; the exact
    polish costs the difference and owns the accuracy contract.) The approximation is a SMOOTHED projection (eigenvalues
    within ~1e-3 of zero relative to ||M|| are soft-thresholded;
    max abs error ~8e-3 on O(1)-spectrum blocks), which first-order
    ADMM iterations absorb — but statuses, certificates and the
    semismooth-Newton polish must keep the exact eigh projector
    (make_cone_projector(..., psd_mode='exact')), or the accuracy
    contract would be certified against the smoothed cone."""
    M = svec_to_sym(v, s)
    c = jnp.sqrt(jnp.sum(M * M)) + 1e-30
    Y = M / c
    for _ in range(_NS_SIGN_ITERS):
        Y = 1.5 * Y - 0.5 * (Y @ (Y @ Y))
    P = 0.5 * (M + (M @ Y))
    P = 0.5 * (P + P.T)
    return sym_to_svec(P)


# ---------------------------------------------------------------------------
# Product cone
# ---------------------------------------------------------------------------


def _group_runs(sizes):
    """Group a sequence of block sizes into runs of equal size for batching."""
    runs = []
    for d in sizes:
        if runs and runs[-1][0] == d:
            runs[-1][1] += 1
        else:
            runs.append([d, 1])
    return runs


def make_cone_projector(
    dims: ConeDims, psd_mode: str = "exact"
) -> Callable[[jax.Array], jax.Array]:
    """Build Pi_K for the product cone described by `dims`.

    Returns a function v (m,) -> Pi_K(v) (m,), fully traceable and
    differentiable; all block structure is baked in statically.

    psd_mode: "exact" (batched eigh — the default; required wherever
    the result feeds an accuracy decision) or "ns" (matmul-only
    Newton-Schulz sign approximation — the first-order inner-loop
    fast path; see project_psd_svec_ns)."""
    soc_runs = _group_runs(dims.soc)
    psd_runs = _group_runs(dims.psd)
    psd_proj = (project_psd_svec_ns if psd_mode == "ns"
                else project_psd_svec)
    import numpy as _np
    pow_alphas = _np.array(dims.pow3) if dims.pow3 else None

    def project(v: jax.Array) -> jax.Array:
        parts = []
        off = 0
        if dims.zero:
            parts.append(jnp.zeros_like(v[:dims.zero]))
            off += dims.zero
        if dims.nonneg:
            parts.append(jnp.maximum(v[off:off + dims.nonneg], 0.0))
            off += dims.nonneg
        for d, n in soc_runs:
            seg = v[off:off + d * n]
            parts.append(_soc_many(seg, d, n))
            off += d * n
        if dims.exp:
            seg = v[off:off + 3 * dims.exp].reshape(dims.exp, 3)
            parts.append(jax.vmap(project_exp)(seg).reshape(-1))
            off += 3 * dims.exp
        for s, n in psd_runs:
            d = s * (s + 1) // 2
            seg = v[off:off + d * n].reshape(n, d)
            parts.append(
                jax.vmap(lambda b: psd_proj(b, s))(seg).reshape(-1)
            )
            off += d * n
        if dims.pow3:
            seg = v[off:off + 3 * len(dims.pow3)].reshape(len(dims.pow3), 3)
            parts.append(jax.vmap(project_pow3)(seg, pow_alphas).reshape(-1))
            off += 3 * len(dims.pow3)
        if not parts:
            return v[:0]
        return jnp.concatenate(parts)

    return project


def make_dual_cone_projector(dims: ConeDims) -> Callable[[jax.Array], jax.Array]:
    """Pi_{K*} via the Moreau decomposition: Pi_{K*}(v) = v + Pi_K(-v)."""
    proj = make_cone_projector(dims)

    def project_dual(v: jax.Array) -> jax.Array:
        return v + proj(-v)

    return project_dual


def make_cone_dproj(dims: ConeDims) -> Callable[[jax.Array], jax.Array]:
    """Dense Jacobian D Pi_K(v) as an (m, m) matrix (block diagonal).

    Used by the semismooth-Newton refinement and the implicit-diff backward
    pass. Computed with jacfwd over the traceable projector; the projector's
    symbolic-Newton construction makes this the exact implicit derivative.
    """
    proj = make_cone_projector(dims)
    return jax.jacfwd(proj)
