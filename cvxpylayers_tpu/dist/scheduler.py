"""Persistent bucket scheduler: a queue over heterogeneous layer solves
with capacity rounding, so a long-running job (training loop, serving
process) amortizes compilation and carries warm-start state across steps.

`solve_bucketed` (bucketing.py) groups one call's items into
structure buckets; every distinct batch size still compiles its own
executable (jit caches on shapes). The scheduler adds the process-level
policy on top (SURVEY section 7.4.7's "persistent bucket scheduler"):

  * capacity classes — each bucket's padded batch is rounded up to
    pad_multiple * 2^k and kept at its high-water mark, so a bucket
    compiled once serves every later step whose batch fits (bounded
    recompiles: at most log2(B_max) capacities per bucket, one in
    steady state);
  * warm-start carry — each bucket's (x, y, s) state persists across
    flushes and is reused whenever the bucket's item composition is
    unchanged (the training-loop case), cutting ADMM iterations;
  * stats — compiles, flushes, occupancy per bucket, for capacity
    tuning and regression tracking.

Differentiable like solve_bucketed: results are traced JAX values,
`jax.grad` through `step()` works.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..layer.cvxpylayer import CvxpyLayer, _settings_from_args
from .bucketing import _assemble_batch, _shared_core, structure_key


def _round_capacity(B: int, pad_multiple: int) -> int:
    """pad_multiple * next_pow2(ceil(B / pad_multiple))."""
    units = -(-B // pad_multiple)
    p = 1
    while p < units:
        p <<= 1
    return pad_multiple * p


@dataclass
class _Ticket:
    """A submitted item; `result` is set by flush()."""

    layer: CvxpyLayer
    params: tuple
    key: tuple
    batch: Optional[int]
    result: Optional[tuple] = None


@dataclass
class _BucketState:
    capacity: int = 0
    signature: tuple = ()
    warm: Optional[Tuple[jax.Array, jax.Array, jax.Array]] = None
    compiles: int = 0
    flushes: int = 0
    solved_rows: int = 0
    padded_rows: int = 0
    last_iters: Optional[jax.Array] = None


class BucketScheduler:
    def __init__(
        self,
        mesh: Optional[Mesh] = None,
        axis_name: str = "data",
        solver_args: Optional[dict] = None,
        pad_multiple: Optional[int] = None,
        warm_start: bool = True,
    ):
        self.mesh = mesh
        self.axis_name = axis_name
        self.solver_args = solver_args
        if pad_multiple is None:
            pad_multiple = (
                int(np.prod(mesh.devices.shape)) if mesh is not None else 1
            )
        self.pad_multiple = int(pad_multiple)
        self.warm_start = bool(warm_start)
        self._queue: List[_Ticket] = []
        self._buckets: Dict[tuple, _BucketState] = {}

    # ------------------------------------------------------------- queueing

    def submit(self, layer: CvxpyLayer, params: tuple) -> _Ticket:
        """Enqueue one item (a layer plus its parameter tensors, batched
        or not); returns a ticket whose .result is filled by flush()."""
        settings = _settings_from_args(layer._base_settings, self.solver_args)
        key = structure_key(layer, settings)
        batch, _ = layer._parse_batch(params)
        t = _Ticket(layer, params, key, batch)
        self._queue.append(t)
        return t

    def step(self, items: Sequence[Tuple[CvxpyLayer, tuple]]) -> List[tuple]:
        """submit() all items, flush(), and return results in order —
        the drop-in persistent replacement for solve_bucketed."""
        tickets = [self.submit(layer, params) for layer, params in items]
        self.flush()
        return [t.result for t in tickets]

    # -------------------------------------------------------------- solving

    def _shard(self, a: jax.Array) -> jax.Array:
        if self.mesh is None:
            return a
        spec = PartitionSpec(self.axis_name, *([None] * (a.ndim - 1)))
        return jax.lax.with_sharding_constraint(
            a, NamedSharding(self.mesh, spec)
        )

    def flush(self) -> None:
        """Solve everything queued, bucket by bucket, and fulfill the
        tickets. Padded batch per bucket = its capacity class."""
        by_key: Dict[tuple, List[_Ticket]] = {}
        for t in self._queue:
            by_key.setdefault(t.key, []).append(t)
        self._queue = []

        for key, tickets in by_key.items():
            dims, n, settings, p_diag_full, p_diag_only, p_zero = key
            m = dims.total
            st = self._buckets.setdefault(key, _BucketState())

            assembled = [
                _assemble_batch(t.layer, t.params) for t in tickets
            ]
            P = jnp.concatenate([a[0] for a in assembled])
            q = jnp.concatenate([a[1] for a in assembled])
            A = jnp.concatenate([a[2] for a in assembled])
            b = jnp.concatenate([a[3] for a in assembled])
            B = q.shape[0]
            cap = _round_capacity(B, self.pad_multiple)
            if cap > st.capacity:
                st.capacity = cap
                st.compiles += 1  # new shape => new executable
            cap = st.capacity  # high-water mark: stable shape when B dips
            if cap != B:
                reps = cap - B
                P = jnp.concatenate([P, jnp.repeat(P[-1:], reps, axis=0)])
                q = jnp.concatenate([q, jnp.repeat(q[-1:], reps, axis=0)])
                A = jnp.concatenate([A, jnp.repeat(A[-1:], reps, axis=0)])
                b = jnp.concatenate([b, jnp.repeat(b[-1:], reps, axis=0)])
            P, q, A, b = (self._shard(P), self._shard(q),
                          self._shard(A), self._shard(b))

            dtype = q.dtype
            signature = tuple(
                (id(t.layer), t.batch or 1) for t in tickets
            )
            init = (
                jnp.zeros((cap, n), dtype),
                jnp.zeros((cap, m), dtype),
                jnp.zeros((cap, m), dtype),
            )
            if (
                self.warm_start
                and st.warm is not None
                and st.signature == signature
                and tuple(st.warm[0].shape) == (cap, n)
            ):
                init = tuple(jnp.asarray(wv, dtype) for wv in st.warm)

            x, y, s, status, iters = _shared_core(
                dims, n, settings, p_diag_full, p_diag_only, p_zero
            )(P, q, A, b, *init)
            if self.warm_start:
                st.warm = (
                    jax.lax.stop_gradient(x),
                    jax.lax.stop_gradient(y),
                    jax.lax.stop_gradient(s),
                )
                st.signature = signature
            st.flushes += 1
            st.solved_rows += B
            st.padded_rows += cap - B
            st.last_iters = iters

            off = 0
            for t in tickets:
                Bi = t.batch or 1
                outs = jax.vmap(t.layer._recover)(
                    x[off:off + Bi], y[off:off + Bi]
                )
                if t.batch is None:
                    outs = tuple(o[0] for o in outs)
                t.result = outs
                off += Bi

    # ---------------------------------------------------------------- stats

    def stats(self) -> Dict[tuple, dict]:
        """Per-bucket counters: capacity, compiles, flushes, occupancy."""
        out = {}
        for key, st in self._buckets.items():
            total = st.solved_rows + st.padded_rows
            out[key] = {
                "capacity": st.capacity,
                "compiles": st.compiles,
                "flushes": st.flushes,
                "occupancy": (st.solved_rows / total) if total else 1.0,
            }
        return out
