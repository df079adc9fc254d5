"""Heterogeneous problem bucketing: one compiled executable per
(cone pattern, n, settings) bucket.

The scale problem (SURVEY section 7.4.7): a workload mixing problem
structures would naively compile one solver per layer and recompile per
batch size. Here instances are grouped by the *solver-relevant*
structure — the cone dims, variable count and solver settings — so that
every instance in a bucket runs through ONE shared jitted vmapped
solve, no matter which layer (i.e. which parameter-affine maps) it came
from. Layers only contribute their cheap per-layer assemble (parameter
vector -> dense (P, q, A, b)) and recover stages; the heavy solve
executable is shared and cached process-wide.

Padding: each bucket's batch is padded up to `pad_multiple` (e.g. the
mesh size) by repeating the last instance — a feasible dummy, so the
padded solve behaves identically — and padded rows are dropped before
results are returned, which keeps downstream reductions mask-free.

Differentiability: everything here is plain traced JAX (the only
custom_vjp is inside the shared solver), so `jax.grad` through
`solve_bucketed` works, including under `jax.jit`.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..diff.derivative import make_diff_solver
from ..layer.cvxpylayer import CvxpyLayer, _settings_from_args
from ..solver.settings import SolverSettings

# process-wide executable cache: one entry per bucket structure
_EXEC_CACHE: Dict[Tuple, object] = {}


def _shared_core(dims, n, settings: SolverSettings, p_diag_full=True,
                 p_diag_only=False, p_zero=False):
    key = (dims, n, settings, p_diag_full, p_diag_only, p_zero)
    if key not in _EXEC_CACHE:
        solver = make_diff_solver(dims, n, settings,
                                  p_diag_full=p_diag_full,
                                  p_diag_only=p_diag_only,
                                  p_zero=p_zero)
        _EXEC_CACHE[key] = jax.jit(
            jax.vmap(lambda P_, q_, A_, b_, x0, y0, s0:
                     solver(P_, q_, A_, b_, x0, y0, s0))
        )
    return _EXEC_CACHE[key]


def structure_key(layer: CvxpyLayer, settings: SolverSettings):
    """The bucket key: everything the compiled solve specializes on
    (incl. the static P-diagonal flags that pick the f32 KKT route —
    p_diag_only additionally selects the elementwise P-inverse fast
    path, and p_zero gates the pdhg/hsde routes, so layers differing in
    them must not share an executable)."""
    return (layer.prog.dims, layer.prog.n, settings,
            layer._p_diag_full, layer._p_diag_only,
            layer.prog.P_rows.size == 0)


def _assemble_batch(layer: CvxpyLayer, params):
    """(B, n, n), (B, n), (B, m, n), (B, m) assembled problem data for
    one item (B = 1 for unbatched items), plus the item's batch info."""
    batch, flags = layer._parse_batch(params)
    p_ext = layer._stack_params(params, batch, flags)
    P, q, A, b, _ = jax.vmap(layer._assemble)(p_ext)
    return P, q, A, b, batch


def bucket_plan(items: Sequence[Tuple[CvxpyLayer, tuple]],
                solver_args: Optional[dict] = None,
                pad_multiple: int = 1):
    """Diagnostics: bucket keys -> (instance count, padded size)."""
    plan = {}
    for layer, params in items:
        settings = _settings_from_args(layer._base_settings, solver_args)
        key = structure_key(layer, settings)
        batch, _ = layer._parse_batch(params)
        plan[key] = plan.get(key, 0) + (batch or 1)
    return {
        k: (c, -(-c // pad_multiple) * pad_multiple)
        for k, c in plan.items()
    }


def solve_bucketed(items: Sequence[Tuple[CvxpyLayer, tuple]],
                   solver_args: Optional[dict] = None,
                   mesh: Optional[Mesh] = None,
                   axis_name: str = "data",
                   pad_multiple: Optional[int] = None,
                   warm_start: Optional[dict] = None,
                   return_state: bool = False):
    """Solve a heterogeneous list of (layer, params) items.

    Each item is one layer plus its parameter tensors (unbatched, or
    batched with a leading dim). Instances are grouped into buckets by
    `structure_key`, solved with one shared executable per bucket
    (batch padded to `pad_multiple`, default the mesh size), and
    returned as a list of per-item output tuples in input order,
    with each item's own batchedness preserved.

    Warm starts: pass `return_state=True` to also receive a per-bucket
    state dict (a pytree of traced arrays — jit-safe), and feed it back
    via `warm_start=` on the next call with the same bucket structure;
    mismatched buckets fall back to cold starts.
    """
    if pad_multiple is None:
        pad_multiple = int(np.prod(mesh.devices.shape)) if mesh else 1

    # ---- group items by bucket key, assembling each item's data
    buckets: Dict[Tuple, List] = {}
    for idx, (layer, params) in enumerate(items):
        settings = _settings_from_args(layer._base_settings, solver_args)
        key = structure_key(layer, settings)
        P, q, A, b, batch = _assemble_batch(layer, params)
        buckets.setdefault(key, []).append((idx, layer, batch, P, q, A, b))

    results: List[Optional[tuple]] = [None] * len(items)
    states: Dict[Tuple, tuple] = {}
    for key, entries in buckets.items():
        dims, n, settings, p_diag_full, p_diag_only, p_zero = key
        m = dims.total
        P = jnp.concatenate([e[3] for e in entries])
        q = jnp.concatenate([e[4] for e in entries])
        A = jnp.concatenate([e[5] for e in entries])
        b = jnp.concatenate([e[6] for e in entries])
        B = q.shape[0]
        Bp = -(-B // pad_multiple) * pad_multiple
        if Bp != B:
            # feasible dummy padding: repeat the last real instance
            reps = Bp - B
            P = jnp.concatenate([P, jnp.repeat(P[-1:], reps, axis=0)])
            q = jnp.concatenate([q, jnp.repeat(q[-1:], reps, axis=0)])
            A = jnp.concatenate([A, jnp.repeat(A[-1:], reps, axis=0)])
            b = jnp.concatenate([b, jnp.repeat(b[-1:], reps, axis=0)])
        if mesh is not None:
            def cons(a_):
                spec = PartitionSpec(axis_name, *([None] * (a_.ndim - 1)))
                return jax.lax.with_sharding_constraint(
                    a_, NamedSharding(mesh, spec)
                )

            P, q, A, b = cons(P), cons(q), cons(A), cons(b)
        dtype = q.dtype
        init = (
            jnp.zeros((Bp, n), dtype),
            jnp.zeros((Bp, m), dtype),
            jnp.zeros((Bp, m), dtype),
        )
        if warm_start is not None and key in warm_start:
            wx, wy, wsl = warm_start[key]
            if tuple(wx.shape) == (Bp, n):
                init = (
                    jnp.asarray(wx, dtype),
                    jnp.asarray(wy, dtype),
                    jnp.asarray(wsl, dtype),
                )
        x, y, s, status, iters = _shared_core(
            dims, n, settings, p_diag_full, p_diag_only, p_zero
        )(P, q, A, b, *init)
        if return_state:
            states[key] = (
                jax.lax.stop_gradient(x),
                jax.lax.stop_gradient(y),
                jax.lax.stop_gradient(s),
            )
        # scatter back per item, dropping padding
        off = 0
        for idx, layer, batch, *_ in entries:
            Bi = batch or 1
            outs = jax.vmap(layer._recover)(
                x[off:off + Bi], y[off:off + Bi]
            )
            if batch is None:
                outs = tuple(o[0] for o in outs)
            results[idx] = outs
            off += Bi
    if return_state:
        return results, states
    return results
