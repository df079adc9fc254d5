"""Hand-rolled batched dense linear algebra for the f32 TPU path.

Why this module exists (profiled on v5e, r3): XLA lowers
jnp.linalg.{cholesky,qr,inv} to LAPACK-style custom-calls that cost
3.5-15 ms per batched (512, 50..128)^2 call on this backend — 100-1000x
off speed-of-light, and 92% of the whole Markowitz-IPM solve (the
(512,113,51) QR alone was 313 ms of a 534 ms device profile; reference
role: the dense factorizations inside diffcp's solvers, e.g. SCS's
direct linear system, /root/reference/SURVEY.md section 2.2).

The replacements below are plain-JAX masked fori_loops written
PER-INSTANCE (vmap batches them): every iteration updates the full
matrix under a static mask, so XLA fuses each step into a handful of
elementwise/matvec kernels with no custom-call. Measured at the bench
shapes: masked Cholesky 1.54 ms vs 4.88 ms custom-call at (512,64,64).
They are numerically the SAME algorithms (right-looking Cholesky,
Householder QR without pivoting), not approximations.

Use for f32 on TPU; f64 CPU keeps the LAPACK custom-calls (faster
there, and the f64 solver paths early-return before reaching these).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_TINY = 1e-30

# Size gate: each masked loop runs n sequential full-matrix updates, so
# its HBM traffic is ~n * n^2 * B — the same asymptotics as the
# factorization flops but paid in bandwidth. Measured crossover vs the
# custom-calls sits between n=113 (masked 2.8x faster) and n=501
# (masked ~16x SLOWER: 48 s vs 3 s on the n=500 Markowitz config).
# Callers should keep the custom-call above this.
MASKED_MAX_DIM = 160


def use_masked(*dims) -> bool:
    """True when the masked-loop implementations win at these
    (static) dimensions."""
    return max(dims) <= MASKED_MAX_DIM


def chol_masked(A):
    """Right-looking Cholesky of one SPD (n, n) matrix -> lower L.

    Identical recurrence to LAPACK potrf; each step divides column j by
    sqrt(A[j,j]) and applies the masked rank-1 update to the trailing
    block. vmap for batches.
    """
    n = A.shape[0]
    dtype = A.dtype
    idx = jnp.arange(n)

    def body(j, A_):
        d = jnp.sqrt(jnp.maximum(A_[j, j], _TINY))
        col = jnp.where(idx >= j, A_[:, j] / d, 0.0)
        u = jnp.where(idx > j, col, 0.0).astype(dtype)
        A_ = A_ - u[:, None] * u[None, :]
        return A_.at[:, j].set(col)

    L = jax.lax.fori_loop(0, n, body, A)
    return jnp.tril(L)


def house_qr_r(M):
    """R factor of the QR of one (m, n) matrix (m >= n), Householder,
    no pivoting — the masked-loop replacement for
    jnp.linalg.qr(M, mode='r').

    Row signs of R may differ from LAPACK's convention; every caller
    here uses R only through R'R = M'M (semi-normal equations), which
    is sign-invariant.
    """
    m, n = M.shape
    dtype = M.dtype
    ridx = jnp.arange(m)

    def body(j, M_):
        x = jnp.where(ridx >= j, M_[:, j], 0.0)
        xj = M_[j, j]
        nx = jnp.sqrt(jnp.maximum(x @ x, _TINY))
        alpha = -jnp.sign(jnp.where(xj == 0, 1.0, xj)) * nx
        u = x.at[j].add(-alpha)
        nu = jnp.sqrt(jnp.maximum(u @ u, _TINY))
        u = (u / nu).astype(dtype)
        # apply the reflector H = I - 2uu' to the whole matrix (columns
        # < j have zero masked rows, so they are untouched)
        M_ = M_ - 2.0 * jnp.outer(u, u @ M_)
        # pin column j exactly: zeros below the diagonal, alpha on it
        col = jnp.where(ridx == j, alpha, 0.0) + jnp.where(
            ridx < j, M_[:, j], 0.0
        )
        return M_.at[:, j].set(col.astype(dtype))

    R = jax.lax.fori_loop(0, n, body, M)
    return jnp.triu(R[:n, :n])


def house_qr_r_blocked(M, panel: int = 8):
    """R factor of the QR of one (m, n) matrix via blocked Householder
    (compact WY): panels of `panel` reflectors are formed with the
    masked per-column recurrence, then applied to the trailing block as
    TWO matmuls (I - V T V')' M — MXU work instead of n sequential
    HBM passes. Same algorithm as LAPACK geqrt; row signs of R may
    differ (callers use R'R only).

    MEASURED NEGATIVE at bench shapes (kept for larger problems /
    reference): end-to-end on v5e the per-column house_qr_r beats this
    (markowitz 4.1k vs 3.8k, box_qp_ipm 8.7k vs 7.8k solves/s) — XLA
    fuses the simple masked loop better than the panel matmul chain at
    (113, 51). Correct to f32 rounding under matmul_precision=highest
    (rel err 4e-7); bf16 default matmuls degrade it to ~4e-3, so only
    use inside a highest-precision scope.

    Requires n % panel == 0 (callers pad or pick a divisor).
    """
    m, n = M.shape
    assert n % panel == 0, (m, n, panel)
    dtype = M.dtype
    ridx = jnp.arange(m)
    n_panels = n // panel

    def panel_body(p, M_):
        base = p * panel
        # working copy of the panel columns
        P_ = jax.lax.dynamic_slice(M_, (0, base), (m, panel))
        V = jnp.zeros((m, panel), dtype)
        taus = jnp.zeros(panel, dtype)

        def col_body(jj, carry):
            P_c, V_c, taus_c = carry
            j = base + jj
            x = jnp.where(ridx >= j, P_c[:, jj], 0.0)
            xj = jnp.take(x, j)
            xx = x @ x
            nx = jnp.sqrt(jnp.maximum(xx, _TINY))
            alpha = -jnp.sign(jnp.where(xj == 0, 1.0, xj)) * nx
            u = x.at[j].add(-alpha)
            # LAPACK normalization: v[j] = 1, tau = 2 / (v'v)
            uj = jnp.take(u, j)
            safe_uj = jnp.where(jnp.abs(uj) > _TINY, uj, _TINY)
            v = (u / safe_uj).astype(dtype)
            tau = (2.0 * safe_uj * safe_uj
                   / jnp.maximum(u @ u, _TINY)).astype(dtype)
            # degenerate column (exactly zero below the diagonal, e.g.
            # qr_r's zero padding): zero reflector. Compare x'x, not the
            # _TINY-floored norm — nx >= sqrt(_TINY) is never <= _TINY.
            degen = xx <= _TINY
            v = jnp.where(degen, 0.0, v)
            tau = jnp.where(degen, 0.0, tau)
            # apply H = I - tau v v' to the remaining panel columns
            w = tau * (v @ P_c)
            P_c = P_c - jnp.outer(v, w)
            # pin column jj: R rows above j survive, alpha on the diag
            col = jnp.where(ridx == j, jnp.where(degen, xj, alpha), 0.0) \
                + jnp.where(ridx < j, P_c[:, jj], 0.0)
            P_c = P_c.at[:, jj].set(col.astype(dtype))
            V_c = V_c.at[:, jj].set(v)
            taus_c = taus_c.at[jj].set(tau)
            return P_c, V_c, taus_c

        P_, V, taus = jax.lax.fori_loop(
            0, panel, col_body, (P_, V, taus)
        )
        M_ = jax.lax.dynamic_update_slice(M_, P_, (0, base))

        # compact WY: T upper-triangular with T[jj,jj] = tau_jj,
        # T[:jj, jj] = -tau_jj T[:jj, :jj] (V' v_jj)[:jj]
        G = V.T @ V  # (panel, panel)

        def t_body(jj, T_):
            tcol = -taus[jj] * (T_ @ G[:, jj])
            tcol = jnp.where(jnp.arange(panel) < jj, tcol, 0.0)
            tcol = tcol.at[jj].set(taus[jj])
            return T_.at[:, jj].set(tcol.astype(dtype))

        T = jax.lax.fori_loop(
            0, panel, t_body, jnp.zeros((panel, panel), dtype)
        )

        # trailing update: M_trail -= V T' (V' M_trail), done on the
        # FULL column range with the processed columns masked static-
        # shape-safe (their masked rows are already zero, and columns
        # < base have zero V rows overlap — V is zero above row base)
        cidx = jnp.arange(n)
        trail_mask = (cidx >= base + panel).astype(dtype)
        Mt = M_ * trail_mask[None, :]
        upd = V @ (T.T @ (V.T @ Mt))
        M_ = M_ - upd * trail_mask[None, :]
        return M_

    R = jax.lax.fori_loop(0, n_panels, panel_body, M)
    return jnp.triu(R[:n, :n])


def qr_r(M, panel: int = 8):
    """R of the QR of one (m, n) matrix via the blocked Householder,
    zero-padding the columns to a multiple of `panel` (zero columns
    produce zero reflectors via the degenerate guard and zero R
    columns, so R[:n, :n] is unchanged)."""
    m, n = M.shape
    if n < 2 * panel:
        return house_qr_r(M)
    pad = (-n) % panel
    if pad:
        M = jnp.concatenate(
            [M, jnp.zeros((m, pad), M.dtype)], axis=1
        )
    R = house_qr_r_blocked(M, panel=panel)
    return R[:n, :n]


def chol_blocked(A, panel: int = 64):
    """Right-looking BLOCKED Cholesky of one SPD (n, n) matrix -> lower
    L — UNWIRED (measured-neutral, kept for reference like the pallas
    kernels): at the n=500 bench shapes the batched cholesky
    custom-call turned out bandwidth-bound and fine (0.3 ms at
    (128,500,500), r4-measured — unlike QR/triangular-solve, which DID
    lose to their blocked replacements and are wired in ipm.py/kkt.py),
    so no solver path needs this. The blocked form keeps the
    sequential part at panel size (masked loop on (r, r) diagonal
    blocks) and does the FLOPs-dominant trailing updates as big MXU
    matmuls:

        L11 = chol_masked(A11)           (r sequential steps, r x r)
        L21 = A21 @ inv(L11)'            ((n-k) x r matmul)
        A22 -= L21 @ L21'                ((n-k) x (n-k) matmul)

    Matmuls are pinned to full-f32 internally: a bf16 trailing update
    would floor the factor at ~1e-3 (the r2 precision trap). The
    static python loop unrolls n/panel block steps; shapes shrink per
    step so every op stays static. vmap for batches."""
    n = A.shape[0]
    if n <= panel:
        return chol_masked(A)
    with jax.default_matmul_precision("highest"):
        L = jnp.zeros_like(A)
        Aw = A
        for k0 in range(0, n, panel):
            r = min(panel, n - k0)
            A11 = Aw[:r, :r]
            L11 = chol_masked(A11)
            L = L.at[k0:k0 + r, k0:k0 + r].set(L11)
            if k0 + r < n:
                Li = tri_inv_masked(L11, lower=True)
                L21 = Aw[r:, :r] @ Li.T
                L = L.at[k0 + r:, k0:k0 + r].set(L21)
                Aw = Aw[r:, r:] - L21 @ L21.T
        return L


def tri_inv_blocked(L, panel: int = 64, lower: bool = True):
    """Explicit inverse of one triangular (n, n) matrix by block
    forward substitution — the large-n replacement for the
    solve_triangular(L, eye) custom-call (2x2 block recurrence:
    X22 = inv(L22), X21 = -X22 L21 X11, applied panel-wise). The
    off-diagonal work is all matmul (MXU); only the (r, r) diagonal
    blocks run the masked sequential loop."""
    n = L.shape[0]
    if not lower:
        return tri_inv_blocked(L.T, panel=panel, lower=True).T
    if n <= panel:
        return tri_inv_masked(L, lower=True)
    with jax.default_matmul_precision("highest"):
        X = jnp.zeros_like(L)
        blocks = []
        for k0 in range(0, n, panel):
            r = min(panel, n - k0)
            blocks.append((k0, r))
            X = X.at[k0:k0 + r, k0:k0 + r].set(
                tri_inv_masked(L[k0:k0 + r, k0:k0 + r], lower=True)
            )
        # column sweep: X[i, j] = -Xii @ (sum_k L[i, k] X[k, j]) for
        # i > j, built panel-row by panel-row (each step two matmuls)
        for bi, (i0, ri) in enumerate(blocks):
            for bj in range(bi):
                j0, rj = blocks[bj]
                acc = jnp.zeros((ri, rj), L.dtype)
                for bk in range(bj, bi):
                    k0, rk = blocks[bk]
                    acc = acc + L[i0:i0 + ri, k0:k0 + rk] @ X[
                        k0:k0 + rk, j0:j0 + rj
                    ]
                X = X.at[i0:i0 + ri, j0:j0 + rj].set(
                    -X[i0:i0 + ri, i0:i0 + ri] @ acc
                )
        return X


def tri_inv_masked(L, lower: bool = True):
    """Explicit inverse of one triangular (n, n) matrix by masked
    forward substitution on the identity (column-wise recurrence).
    Replacement for solve_triangular(L, eye)."""
    n = L.shape[0]
    if not lower:
        return tri_inv_masked(L.T, lower=True).T
    dtype = L.dtype
    idx = jnp.arange(n)
    d = jnp.diagonal(L)
    dinv = 1.0 / jnp.where(jnp.abs(d) > _TINY, d, _TINY)

    def body(j, X):
        # column j of L^{-1}: x_j = (e_j - L_strict x) / diag, built
        # row-by-row is sequential; instead use the row recurrence:
        # X[j, :] = (I[j, :] - L[j, :j] @ X[:j, :]) / L[j, j]
        lrow = jnp.where(idx < j, L[j, :], 0.0).astype(dtype)
        xrow = (jnp.where(idx == j, 1.0, 0.0) - lrow @ X) * dinv[j]
        return X.at[j, :].set(xrow.astype(dtype))

    X0 = jnp.zeros((n, n), dtype)
    return jax.lax.fori_loop(0, n, body, X0)


def spd_inv_via_chol(A):
    """Inverse of one SPD matrix: chol + triangular inverse, masked —
    all matmul/elementwise ops, no custom-calls. A^{-1} = Li' Li."""
    L = chol_masked(A)
    Li = tri_inv_masked(L, lower=True)
    return Li.T @ Li
