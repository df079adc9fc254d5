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
