"""Closed-form dense Jacobians D Pi_K(v) of the cone projections.

These feed the semismooth-Newton polish and the implicit-diff backward pass
(solver/kkt.py): both assemble the (m, m) block-diagonal generalized
Jacobian every step, so closed forms matter — jacfwd over the full product
projector costs m JVP columns (and eigh-JVPs for PSD blocks), while these
cost one pass per block.

Blocks:
  zero:   0
  nonneg: diag(v > 0)
  soc:    0.5 * [[1, xhat'], [xhat, (1 + t/r) I - (t/r) xhat xhat']]
          on the projection region (identity inside, 0 in the polar)
  exp/pow: 3x3 via jacfwd of the scalar-triple projection (3 JVPs, exact
          implicit derivative thanks to the symbolic-Newton construction)
  psd:    Loewner operator U (B ∘ (U' H U)) U' applied to the svec basis,
          B_ij = (li+ - lj+)/(li - lj) with the diagonal limit 1[li > 0]
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .dims import ConeDims
from .projections import _group_runs, project_exp, project_pow3


def dproj_nonneg(v: jax.Array) -> jax.Array:
    return jnp.diag((v > 0).astype(v.dtype))


def dproj_soc(v: jax.Array) -> jax.Array:
    d = v.shape[0]
    t = v[0]
    x = v[1:]
    r = jnp.linalg.norm(x)
    safe_r = jnp.where(r > 0, r, 1.0)
    xh = x / safe_r
    I = jnp.eye(d, dtype=v.dtype)
    J = jnp.zeros((d, d), v.dtype)
    J = J.at[0, 0].set(0.5)
    J = J.at[0, 1:].set(0.5 * xh)
    J = J.at[1:, 0].set(0.5 * xh)
    J = J.at[1:, 1:].set(
        0.5 * ((1.0 + t / safe_r) * jnp.eye(d - 1, dtype=v.dtype)
               - (t / safe_r) * jnp.outer(xh, xh))
    )
    inside = r <= t
    polar = r <= -t
    return jnp.where(inside, I, jnp.where(polar, jnp.zeros_like(J), J))


def dproj_psd_svec(v: jax.Array, s: int) -> jax.Array:
    """Jacobian of the svec-coordinates PSD projection: (d, d), d=s(s+1)/2.

    svec is an isometry, so the Loewner-operator form of the matrix-space
    derivative transfers directly to svec coordinates.
    """
    from .projections import svec_to_sym, sym_to_svec

    d = s * (s + 1) // 2
    M = svec_to_sym(v, s)
    lam, U = jnp.linalg.eigh(M)
    lp = jnp.maximum(lam, 0.0)
    dl = lam[:, None] - lam[None, :]
    num = lp[:, None] - lp[None, :]
    B = jnp.where(
        jnp.abs(dl) > 1e-12 * (1 + jnp.abs(lam).max()),
        num / jnp.where(jnp.abs(dl) > 0, dl, 1.0),
        (lam[:, None] > 0).astype(v.dtype),
    )

    basis = jnp.eye(d, dtype=v.dtype)

    def apply(col):
        H = svec_to_sym(col, s)
        out = U @ (B * (U.T @ H @ U)) @ U.T
        return sym_to_svec(out)

    return jax.vmap(apply, out_axes=1)(basis)


def _soc_dapply(wb: jax.Array, vb: jax.Array) -> jax.Array:
    """D Pi_soc(wb) @ vb for one block, O(d) (no d x d materialization)."""
    t = wb[0]
    x = wb[1:]
    r = jnp.linalg.norm(x)
    safe_r = jnp.where(r > 0, r, 1.0)
    xh = x / safe_r
    vt = vb[0]
    vx = vb[1:]
    xv = xh @ vx
    top = 0.5 * (vt + xv)
    bottom = 0.5 * (
        vt * xh + (1.0 + t / safe_r) * vx - (t / safe_r) * xv * xh
    )
    out = jnp.concatenate([top[None], bottom])
    inside = r <= t
    polar = r <= -t
    return jnp.where(inside, vb, jnp.where(polar, jnp.zeros_like(vb), out))


def make_cone_dproj_factored(dims: ConeDims):
    """(factor, apply) pair for repeated D Pi_K(w) matvecs at FIXED w.

    factor(w) performs all the w-dependent heavy lifting once — the
    exp/pow 3x3 Jacobians (each hides a bracketed root-find inside
    project_*) and the PSD eigendecompositions — and returns a state
    pytree; apply(state, v) is then masks/einsums only. CG-based KKT
    solves evaluate the Jacobian at one w for the whole solve, and
    recomputing the root-finds inside every matvec dominated exp-cone
    polish time on TPU (latency-bound sequential scans)."""
    soc_runs = _group_runs(dims.soc)
    psd_runs = _group_runs(dims.psd)
    pow_alphas = np.array(dims.pow3) if dims.pow3 else None
    dproj_exp3 = jax.jacfwd(project_exp)
    dproj_pow3 = jax.jacfwd(project_pow3, argnums=0)

    def factor(w: jax.Array):
        from .projections import svec_to_sym

        st = []
        off = dims.zero
        if dims.nonneg:
            st.append(w[off:off + dims.nonneg] > 0)
            off += dims.nonneg
        for d, nblk in soc_runs:
            # SOC applies are O(d) from raw w; nothing to precompute
            st.append(w[off:off + d * nblk])
            off += d * nblk
        if dims.exp:
            ws = w[off:off + 3 * dims.exp].reshape(dims.exp, 3)
            st.append(jax.vmap(dproj_exp3)(ws))
            off += 3 * dims.exp
        for s, nblk in psd_runs:
            d = s * (s + 1) // 2
            ws = w[off:off + d * nblk].reshape(nblk, d)

            def psd_factor(wb, s=s):
                M = svec_to_sym(wb, s)
                lam, U = jnp.linalg.eigh(M)
                lp = jnp.maximum(lam, 0.0)
                dl = lam[:, None] - lam[None, :]
                num = lp[:, None] - lp[None, :]
                B = jnp.where(
                    jnp.abs(dl) > 1e-12 * (1 + jnp.abs(lam).max()),
                    num / jnp.where(jnp.abs(dl) > 0, dl, 1.0),
                    (lam[:, None] > 0).astype(wb.dtype),
                )
                return U, B
            st.append(jax.vmap(psd_factor)(ws))
            off += d * nblk
        if dims.pow3:
            npw = len(dims.pow3)
            ws = w[off:off + 3 * npw].reshape(npw, 3)
            st.append(
                jax.vmap(dproj_pow3)(ws, jnp.asarray(pow_alphas, w.dtype))
            )
            off += 3 * npw
        return tuple(st)

    def apply(state, v: jax.Array) -> jax.Array:
        from .projections import svec_to_sym, sym_to_svec

        parts = []
        it = iter(state)
        off = 0
        if dims.zero:
            parts.append(jnp.zeros(dims.zero, v.dtype))
            off += dims.zero
        if dims.nonneg:
            mask = next(it)
            parts.append(mask.astype(v.dtype) * v[off:off + dims.nonneg])
            off += dims.nonneg
        for d, nblk in soc_runs:
            ws = next(it).reshape(nblk, d)
            vs = v[off:off + d * nblk].reshape(nblk, d)
            parts.append(jax.vmap(_soc_dapply)(ws, vs).reshape(-1))
            off += d * nblk
        if dims.exp:
            blocks = next(it)
            vs = v[off:off + 3 * dims.exp].reshape(dims.exp, 3)
            parts.append(jnp.einsum("kij,kj->ki", blocks, vs).reshape(-1))
            off += 3 * dims.exp
        for s, nblk in psd_runs:
            d = s * (s + 1) // 2
            U, B = next(it)
            vs = v[off:off + d * nblk].reshape(nblk, d)

            def psd_apply(Ub, Bb, vb, s=s):
                H = svec_to_sym(vb, s)
                return sym_to_svec(Ub @ (Bb * (Ub.T @ H @ Ub)) @ Ub.T)

            parts.append(jax.vmap(psd_apply)(U, B, vs).reshape(-1))
            off += d * nblk
        if dims.pow3:
            blocks = next(it)
            npw = len(dims.pow3)
            vs = v[off:off + 3 * npw].reshape(npw, 3)
            parts.append(jnp.einsum("kij,kj->ki", blocks, vs).reshape(-1))
            off += 3 * npw
        if not parts:
            return v[:0]
        return jnp.concatenate(parts)

    return factor, apply


def make_cone_dproj_apply(dims: ConeDims):
    """fn(w, v) -> D Pi_K(w) @ v without materializing the (m, m) matrix.

    One-shot convenience over make_cone_dproj_factored — callers doing
    repeated matvecs at fixed w should factor once instead."""
    factor, apply = make_cone_dproj_factored(dims)

    def apply_once(w: jax.Array, v: jax.Array) -> jax.Array:
        return apply(factor(w), v)

    return apply_once


def make_cone_dproj_dense(dims: ConeDims):
    """fn(v) -> dense (m, m) generalized Jacobian of Pi_K at v."""
    m = dims.total
    soc_runs = _group_runs(dims.soc)
    psd_runs = _group_runs(dims.psd)
    pow_alphas = np.array(dims.pow3) if dims.pow3 else None
    dproj_exp3 = jax.jacfwd(project_exp)
    dproj_pow3 = jax.jacfwd(project_pow3, argnums=0)

    def dproj(v: jax.Array) -> jax.Array:
        dtype = v.dtype
        J = jnp.zeros((m, m), dtype)
        off = dims.zero  # zero-cone block stays 0
        if dims.nonneg:
            seg = v[off:off + dims.nonneg]
            idx = off + jnp.arange(dims.nonneg)
            J = J.at[idx, idx].set((seg > 0).astype(dtype))
            off += dims.nonneg
        for d, nblk in soc_runs:
            seg = v[off:off + d * nblk].reshape(nblk, d)
            blocks = jax.vmap(dproj_soc)(seg)  # (nblk, d, d)
            for k in range(nblk):
                J = jax.lax.dynamic_update_slice(
                    J, blocks[k], (off + k * d, off + k * d)
                )
            off += d * nblk
        if dims.exp:
            seg = v[off:off + 3 * dims.exp].reshape(dims.exp, 3)
            blocks = jax.vmap(dproj_exp3)(seg)
            for k in range(dims.exp):
                J = jax.lax.dynamic_update_slice(
                    J, blocks[k], (off + 3 * k, off + 3 * k)
                )
            off += 3 * dims.exp
        for s, nblk in psd_runs:
            d = s * (s + 1) // 2
            seg = v[off:off + d * nblk].reshape(nblk, d)
            blocks = jax.vmap(lambda b: dproj_psd_svec(b, s))(seg)
            for k in range(nblk):
                J = jax.lax.dynamic_update_slice(
                    J, blocks[k], (off + k * d, off + k * d)
                )
            off += d * nblk
        if dims.pow3:
            npw = len(dims.pow3)
            seg = v[off:off + 3 * npw].reshape(npw, 3)
            blocks = jax.vmap(dproj_pow3)(seg, jnp.asarray(pow_alphas, dtype))
            for k in range(npw):
                J = jax.lax.dynamic_update_slice(
                    J, blocks[k], (off + 3 * k, off + 3 * k)
                )
            off += 3 * npw
        return J

    return dproj


def _soc_spectral(wb: jax.Array):
    """Closed-form eigendecomposition (Q, lam) of the SOC projection
    Jacobian at one block (Q orthogonal (d, d), lam in [0, 1]^d).

    On the projection region the Jacobian's eigenstructure is exact:
    eigenvalue 1 on (1, xhat)/sqrt2, 0 on (1, -xhat)/sqrt2, and
    (1 + t/r)/2 on the tangent space (0, u), u orthogonal to xhat — the
    tangent basis comes from the sign-robust Householder reflection
    mapping e1 to xhat. Inside/polar regions fall back to Q = I with
    lam = 1 / 0."""
    d = wb.shape[0]
    dtype = wb.dtype
    t = wb[0]
    x = wb[1:]
    r = jnp.linalg.norm(x)
    safe_r = jnp.where(r > 0, r, 1.0)
    xh = jnp.where(r > 0, x / safe_r,
                   jnp.zeros(d - 1, dtype).at[0].set(1.0))
    # Householder v = xh + sign(xh_0) e1 (never degenerate); H = I - 2vv'
    # has first column -sign(xh_0) xh and remaining columns an
    # orthonormal basis of xh's orthogonal complement
    sgn = jnp.where(xh[0] >= 0, 1.0, -1.0).astype(dtype)
    hv = xh.at[0].add(sgn)
    hv = hv / jnp.linalg.norm(hv)
    H = jnp.eye(d - 1, dtype=dtype) - 2.0 * jnp.outer(hv, hv)
    inv_sqrt2 = (0.5) ** 0.5
    q1 = jnp.concatenate([jnp.ones(1, dtype), xh]) * inv_sqrt2
    q2 = jnp.concatenate([jnp.ones(1, dtype), -xh]) * inv_sqrt2
    T = jnp.concatenate([jnp.zeros((1, d - 1), dtype), H], axis=0)
    # columns: [q1 | q2 | tangent basis (drop H's first column = +-xh)]
    Qb = jnp.concatenate([q1[:, None], q2[:, None], T[:, 1:]], axis=1)
    lam_t = jnp.clip(0.5 * (1.0 + t / safe_r), 0.0, 1.0)
    lamb = jnp.concatenate([
        jnp.ones(1, dtype), jnp.zeros(1, dtype),
        jnp.full((d - 2,), lam_t, dtype),
    ])
    inside = r <= t
    polar = r <= -t
    eye = jnp.eye(d, dtype=dtype)
    Qb = jnp.where(inside | polar, eye, Qb)
    lamb = jnp.where(inside, jnp.ones(d, dtype),
                     jnp.where(polar, jnp.zeros(d, dtype), lamb))
    return Qb, lamb


def _sym_eig3(Db: jax.Array):
    """Closed-form eigendecomposition of a symmetric 3x3 block.

    jnp.linalg.eigh lowers to a sequential QR iteration that is very
    slow for large batches of tiny matrices on TPU (it dominated the
    spectral-KKT Newton step: thousands of 3x3 blocks per batch).
    This uses the trigonometric (Smith) eigenvalue formula plus
    cross-product eigenvectors with degeneracy-safe fallbacks — pure
    elementwise VPU arithmetic, exactly orthogonal Q by construction
    (v2 = v3 x v1 after Gram-Schmidt)."""
    A = 0.5 * (Db + Db.T)
    dtype = A.dtype
    q = jnp.trace(A) / 3.0
    Aq = A - q * jnp.eye(3, dtype=dtype)
    p2 = jnp.sum(Aq * Aq) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-30))
    B = Aq / p
    # explicit 3x3 determinant: jnp.linalg.det lowers to a batched LU,
    # the documented slow path on TPU (solver/linsolve.py) — for tens of
    # thousands of tiny blocks per Newton step it dominated the solve
    detB = (
        B[0, 0] * (B[1, 1] * B[2, 2] - B[1, 2] * B[2, 1])
        - B[0, 1] * (B[1, 0] * B[2, 2] - B[1, 2] * B[2, 0])
        + B[0, 2] * (B[1, 0] * B[2, 1] - B[1, 1] * B[2, 0])
    )
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    two_pi_3 = 2.0943951023931953
    e1 = q + 2.0 * p * jnp.cos(phi)               # largest
    e3 = q + 2.0 * p * jnp.cos(phi + two_pi_3)    # smallest
    e2 = 3.0 * q - e1 - e3
    iso = p2 <= 1e-14 * (1.0 + q * q)  # A ~ q I: any basis works

    def eigvec(lam_val, fallback):
        M = A - lam_val * jnp.eye(3, dtype=dtype)
        c0 = jnp.cross(M[0], M[1])
        c1 = jnp.cross(M[0], M[2])
        c2 = jnp.cross(M[1], M[2])
        ns = jnp.stack([c0 @ c0, c1 @ c1, c2 @ c2])
        cands = jnp.stack([c0, c1, c2])
        v = cands[jnp.argmax(ns)]
        nv = jnp.sqrt(jnp.maximum(jnp.max(ns), 1e-30))
        ok = jnp.max(ns) > 1e-24 * (1.0 + lam_val * lam_val) ** 2
        return jnp.where(ok, v / nv, fallback)

    ex = jnp.zeros(3, dtype).at[0].set(1.0)
    ey = jnp.zeros(3, dtype).at[1].set(1.0)
    v1 = eigvec(e1, ex)
    v3 = eigvec(e3, ey)
    # Gram-Schmidt v3 against v1, with an axis fallback if parallel
    v3 = v3 - (v1 @ v3) * v1
    n3 = jnp.linalg.norm(v3)
    alt = ey - (v1 @ ey) * v1
    alt2 = ex - (v1 @ ex) * v1
    alt = jnp.where(jnp.linalg.norm(alt) > 0.1, alt, alt2)
    v3 = jnp.where(n3 > 1e-6, v3 / jnp.maximum(n3, 1e-30),
                   alt / jnp.linalg.norm(alt))
    v2 = jnp.cross(v3, v1)
    Qb = jnp.stack([v1, v2, v3], axis=1)
    eye3 = jnp.eye(3, dtype=dtype)
    Qb = jnp.where(iso, eye3, Qb)
    lam = jnp.where(iso, jnp.full(3, q, dtype), jnp.stack([e1, e2, e3]))
    return lam, Qb


def make_cone_dproj_spectral(dims: ConeDims):
    """fn(w) -> (Q, lam): the full (m, m) orthogonal eigenbasis and
    eigenvalues of the generalized projection Jacobian D Pi_K(w).

    D = Q diag(lam) Q' with lam in [0, 1]^m. This powers the exact
    spectral-Schur KKT solve (solver/kkt.py): rotating the Newton system
    by Q turns D into a diagonal, so the polyhedral 0/1 elimination
    generalizes to every cone family. Closed forms everywhere except
    exp/pow (3x3 eigh per block):

      zero:   Q = I, lam = 0
      nonneg: Q = I, lam = 1[w > 0]
      soc:    exact eigenstructure of the projection Jacobian
      psd:    the Loewner operator diagonalizes in the svec rotation by
              its eigenvector matrix: Q-block = symkron(U), lam = B_ij
      exp/pow: 3x3 eigh of the implicit-differentiation Jacobian
    """
    from .projections import svec_indices, svec_to_sym, sym_to_svec

    m = dims.total
    soc_runs = _group_runs(dims.soc)
    psd_runs = _group_runs(dims.psd)
    pow_alphas = np.array(dims.pow3) if dims.pow3 else None
    dproj_exp3 = jax.jacfwd(project_exp)
    dproj_pow3 = jax.jacfwd(project_pow3, argnums=0)

    def _block_scatter_idx(off, d, nblk):
        """Static index arrays placing (nblk, d, d) blocks on Q's
        diagonal in ONE scatter — a python loop of dynamic_update_slice
        materialized nblk sequential full-(m, m) copies per Newton step
        and dominated the spectral solve on TPU."""
        base = off + np.arange(nblk)[:, None, None] * d
        ri = (base + np.arange(d)[None, :, None]
              + np.zeros((1, 1, d), np.int64)).reshape(-1)
        ci = (base + np.zeros((1, d, 1), np.int64)
              + np.arange(d)[None, None, :]).reshape(-1)
        return ri, ci

    def spectral(w: jax.Array):
        dtype = w.dtype
        Q = jnp.eye(m, dtype=dtype)
        lam = jnp.zeros(m, dtype)
        off = dims.zero  # zero rows keep Q = I, lam = 0
        if dims.nonneg:
            seg = w[off:off + dims.nonneg]
            lam = jax.lax.dynamic_update_slice(
                lam, (seg > 0).astype(dtype), (off,)
            )
            off += dims.nonneg
        for d, nblk in soc_runs:
            seg = w[off:off + d * nblk].reshape(nblk, d)
            Qb, lamb = jax.vmap(_soc_spectral)(seg)
            ri, ci = _block_scatter_idx(off, d, nblk)
            Q = Q.at[ri, ci].set(Qb.reshape(-1))
            lam = jax.lax.dynamic_update_slice(
                lam, lamb.reshape(-1), (off,)
            )
            off += d * nblk
        if dims.exp:
            seg = w[off:off + 3 * dims.exp].reshape(dims.exp, 3)
            blocks = jax.vmap(dproj_exp3)(seg)
            lamb, Qb = jax.vmap(_sym_eig3)(blocks)
            lamb = jnp.clip(lamb, 0.0, 1.0)
            ri, ci = _block_scatter_idx(off, 3, dims.exp)
            Q = Q.at[ri, ci].set(Qb.reshape(-1))
            lam = jax.lax.dynamic_update_slice(
                lam, lamb.reshape(-1), (off,)
            )
            off += 3 * dims.exp
        for s, nblk in psd_runs:
            d = s * (s + 1) // 2
            seg = w[off:off + d * nblk].reshape(nblk, d)
            rows, cols = svec_indices(s)
            basis = jnp.eye(d, dtype=dtype)

            def psd_spectral(wb, s=s, rows=rows, cols=cols, basis=basis):
                M = svec_to_sym(wb, s)
                lame, U = jnp.linalg.eigh(M)
                lp = jnp.maximum(lame, 0.0)
                dl = lame[:, None] - lame[None, :]
                num = lp[:, None] - lp[None, :]
                B = jnp.where(
                    jnp.abs(dl) > 1e-12 * (1 + jnp.abs(lame).max()),
                    num / jnp.where(jnp.abs(dl) > 0, dl, 1.0),
                    (lame[:, None] > 0).astype(wb.dtype),
                )
                # svec rotation by U: col_j = svec(U sym(e_j) U')
                Qb = jax.vmap(
                    lambda e: sym_to_svec(U @ svec_to_sym(e, s) @ U.T)
                )(basis).T
                return Qb, B[rows, cols]

            Qb, lamb = jax.vmap(psd_spectral)(seg)
            ri, ci = _block_scatter_idx(off, d, nblk)
            Q = Q.at[ri, ci].set(Qb.reshape(-1))
            lam = jax.lax.dynamic_update_slice(
                lam, jnp.clip(lamb, 0.0, 1.0).reshape(-1), (off,)
            )
            off += d * nblk
        if dims.pow3:
            npw = len(dims.pow3)
            seg = w[off:off + 3 * npw].reshape(npw, 3)
            blocks = jax.vmap(dproj_pow3)(seg, jnp.asarray(pow_alphas,
                                                           dtype))
            lamb, Qb = jax.vmap(_sym_eig3)(blocks)
            lamb = jnp.clip(lamb, 0.0, 1.0)
            ri, ci = _block_scatter_idx(off, 3, npw)
            Q = Q.at[ri, ci].set(Qb.reshape(-1))
            lam = jax.lax.dynamic_update_slice(
                lam, lamb.reshape(-1), (off,)
            )
            off += 3 * npw
        return Q, lam

    return spectral
