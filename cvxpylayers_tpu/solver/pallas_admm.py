"""Pallas TPU kernel: fused ADMM inner epoch for polyhedral cones.

Runs `iters` ADMM iterations for a tile of instances entirely out of VMEM.

STATUS: measured SLOWER than the XLA scan on v5e at the benchmark shape
(0.12 ms vs 0.05 ms for a 75-iteration epoch at batch 1024, n=50, m=120):
XLA keeps the loop-invariant operators resident and runs the batched
matvecs at near peak, so there is nothing left for a hand-written kernel
to win at these sizes. Kept as a validated reference implementation for
larger per-instance shapes where XLA's batched-GEMV lowering may degrade;
NOT wired into the default solve path (solver/admm.py uses the scan).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(n_zero: int, iters: int, sigma: float, alpha: float,
            minv_ref, at_ref, a_ref, q_ref, b_ref, rho_ref,
            x_ref, z_ref, y_ref,
            x_out, z_out, y_out):
    # refs are (TILE, n, n), (TILE, n, m), (TILE, m, n), (TILE, n), (TILE, m)...
    x = x_ref[:]
    z = z_ref[:]
    y = y_ref[:]
    minv = minv_ref[:]
    at = at_ref[:]          # (TILE, n, m) = A^T per instance
    a = a_ref[:]            # (TILE, m, n)
    q = q_ref[:]
    b = b_ref[:]
    rho = rho_ref[:]

    def body(_, carry):
        x_, z_, y_ = carry
        t = rho * z_ - y_
        rhs = sigma * x_ - q + jnp.einsum(
            "tnm,tm->tn", at, t, preferred_element_type=jnp.float32
        )
        xt = jnp.einsum(
            "tnm,tm->tn", minv, rhs, preferred_element_type=jnp.float32
        )
        zt = jnp.einsum(
            "tmn,tn->tm", a, xt, preferred_element_type=jnp.float32
        )
        xn = alpha * xt + (1.0 - alpha) * x_
        w = alpha * zt + (1.0 - alpha) * z_ + y_ / rho
        # Pi_C(w) = b - Pi_K(b - w); K = {0}^z x R+^l per-row:
        # zero rows: z = w is projected to... s=0 -> z = b on zero rows
        col = jax.lax.broadcasted_iota(jnp.int32, w.shape, 1)
        is_zero_row = col < n_zero
        zn = jnp.where(is_zero_row, b, b - jnp.maximum(b - w, 0.0))
        yn = rho * (w - zn)
        return xn, zn, yn

    x, z, y = jax.lax.fori_loop(0, iters, body, (x, z, y))
    x_out[:] = x
    z_out[:] = z
    y_out[:] = y


def polyhedral_inner_epoch(minv, A, q, b, rho, x, z, y, *, n_zero: int,
                           iters: int, sigma: float, alpha: float,
                           tile: int = 8):
    """Batched fused inner epoch: all arrays lead with the batch axis."""
    B, n = q.shape
    m = b.shape[1]
    at = jnp.swapaxes(A, 1, 2)
    grid = (B // tile,)

    def spec3(d1, d2):
        return pl.BlockSpec((tile, d1, d2), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def spec2(d1):
        return pl.BlockSpec((tile, d1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    kern = functools.partial(_kernel, n_zero, iters, sigma, alpha)
    x2, z2, y2 = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[spec3(n, n), spec3(n, m), spec3(m, n), spec2(n), spec2(m),
                  spec2(m), spec2(n), spec2(m), spec2(m)],
        out_specs=(spec2(n), spec2(m), spec2(m)),
        out_shape=(
            jax.ShapeDtypeStruct((B, n), q.dtype),
            jax.ShapeDtypeStruct((B, m), b.dtype),
            jax.ShapeDtypeStruct((B, m), b.dtype),
        ),
    )(minv, at, A, q, b, rho, x, z, y)
    return x2, z2, y2
