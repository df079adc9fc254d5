"""Pallas TPU kernels for the batched small dense factorizations.

The motivating profile (r3, v5e, Markowitz-IPM): after replacing the
LAPACK custom-calls with masked plain-JAX loops (batched_linalg), the
masked Householder QR dominates the remaining solve time — its n
sequential full-matrix passes each round-trip the (B, m, n) iterate
through HBM (~1.2 GB per QR at (512, 113, 51)). This kernel keeps the
panel resident in VMEM for all n reflector steps: HBM traffic drops to
one read + one write of the block, and the per-step work runs on the
VPU with the BATCH on the 128-wide lane dimension.

Layout: the (B, m, n) input is transposed to (m, n, B) so batch rides
the lanes; the grid splits B into 128-lane blocks, each handled by one
kernel instance working IN PLACE on a VMEM scratch copy (loop-carried
block values tripled the scoped-VMEM footprint and OOM'd: 17.2M > 16M).

Same algorithm as batched_linalg.house_qr_r (Householder, no pivoting,
R used via R'R). Requires the TPU backend.

MEASURED NEGATIVE (r3, v5e, kept unwired as the third Pallas data
point): 2.08 ms vs the plain-JAX masked loop's 1.76 ms and the
custom-call's 8.0 ms at (512, 113, 51), correctness 5.7e-7 rel. The
working theory (masked loop HBM-bound at ~1.2 GB/QR) was wrong — the
in-VMEM kernel still pays 2x block VMEM traffic per step for the
full-width masked update plus the mask/reduction VPU work, and XLA's
fusion of the simple loop was already compute-bound. Consistent with
the two r2 Pallas negatives (pallas_admm.py, exp projection): at these
problem sizes the compiler wins; hand kernels would pay only at much
larger m*n per instance.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_LANES = 128


def _qr_kernel(m_ref, r_ref, s_ref, *, mm: int, nn: int):
    from jax.experimental import pallas as pl

    s_ref[:] = m_ref[:]
    ridx = jax.lax.broadcasted_iota(jnp.int32, (mm, 1, 1), 0)

    def body(j, carry):
        col = s_ref[:, pl.ds(j, 1), :]                       # (mm, 1, B)
        col_m = jnp.where(ridx >= j, col, 0.0)
        rowj = ridx == j
        xj = jnp.sum(jnp.where(rowj, col_m, 0.0), axis=0,
                     keepdims=True)                          # (1, 1, B)
        nx2 = jnp.sum(col_m * col_m, axis=0, keepdims=True)
        nx = jnp.sqrt(jnp.maximum(nx2, 1e-30))
        sgn = jnp.where(xj < 0, -1.0, 1.0)
        alpha = -sgn * nx
        # u = col - alpha e_j ; LAPACK form v = u / u_j
        u = col_m - jnp.where(rowj, alpha, 0.0)
        uj = xj - alpha
        safe_uj = jnp.where(jnp.abs(uj) > 1e-30, uj, 1e-30)
        v = u / safe_uj                                      # (mm, 1, B)
        uu = jnp.sum(u * u, axis=0, keepdims=True)
        tau = 2.0 * safe_uj * safe_uj / jnp.maximum(uu, 1e-30)
        degen = nx2 <= 1e-30
        v = jnp.where(degen, 0.0, v)
        tau = jnp.where(degen, 0.0, tau)
        # apply H = I - tau v v' in place:
        # w[c, b] = tau * sum_r v[r, b] S[r, c, b]
        w = tau * jnp.sum(v * s_ref[:], axis=0, keepdims=True)
        s_ref[:] = s_ref[:] - v * w
        # pin column j: R above the diagonal (rows < j are untouched by
        # the reflector — v is zero there — so the pre-update col
        # serves), alpha on it, zeros below
        pinned = jnp.where(
            rowj, jnp.where(degen, xj, alpha),
            jnp.where(ridx < j, col, 0.0),
        )
        s_ref[:, pl.ds(j, 1), :] = pinned
        return carry

    jax.lax.fori_loop(0, nn, body, 0)
    r_ref[:] = s_ref[0:nn]


def qr_r_pallas(M, interpret: bool = False):
    """R factors of a batch of (m, n) matrices, M: (B, m, n), f32,
    B a multiple of 128 (callers pad). Returns (B, n, n) upper R.
    interpret=True runs the kernel through the Pallas interpreter
    (CPU-testable)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, mm, nn = M.shape
    assert B % _LANES == 0, B
    Mt = jnp.transpose(M, (1, 2, 0))  # (m, n, B)
    grid = (B // _LANES,)
    out = pl.pallas_call(
        functools.partial(_qr_kernel, mm=mm, nn=nn),
        out_shape=jax.ShapeDtypeStruct((nn, nn, B), M.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((mm, nn, _LANES),
                               lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((nn, nn, _LANES),
                               lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((mm, nn, _LANES), M.dtype)],
        interpret=interpret,
    )(Mt)
    R = jnp.transpose(out, (2, 0, 1))  # (B, n, n)
    return jnp.triu(R)
