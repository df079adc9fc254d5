"""Multi-chip batch sharding for layer solves.

The reference's only parallelism axis is the in-process batch (cvxpylayers
SURVEY section 2.3); this module adds what it lacks: data-parallel instance
batches sharded over a `jax.sharding.Mesh` of TPU chips with pjit. Each
instance's ADMM+Newton solve is embarrassingly parallel, so the layout is
batch-sharded everything and XLA inserts collectives (psum) only where a
reduction crosses the mesh (e.g. the training loss) — communication rides
ICI, never the per-instance solve path.

TP/PP/SP/EP have no counterpart in a cone-program layer library (no
sequence or expert structure; SURVEY section 2.3 table); the scale axes are
batch size (sharded here) and per-instance n/m (dense MXU kernels).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_data_mesh(devices: Optional[Sequence] = None,
                   axis_name: str = "data") -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devs), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_layer_call(layer, mesh: Mesh, axis_name: str = "data"):
    """Wrap `layer` so batched parameter arrays are sharded over the mesh
    before the (jitted) solve; outputs come back batch-sharded.

    Batch sizes should be divisible by the mesh size; use `pad_batch` if not.
    """
    shard = batch_sharding(mesh, axis_name)

    def call(*params, **kw):
        placed = tuple(jax.device_put(p, shard) for p in params)
        return layer(*placed, **kw)

    return call


def pad_batch(arrs, multiple: int):
    """Pad the leading dim of each array up to a multiple (repeat-edge
    padding keeps the padded instances feasible), returning (padded, B)."""
    import jax.numpy as jnp

    B = arrs[0].shape[0]
    Bp = ((B + multiple - 1) // multiple) * multiple
    if Bp == B:
        return arrs, B
    out = []
    for a in arrs:
        pad = jnp.repeat(a[-1:], Bp - B, axis=0)
        out.append(jnp.concatenate([a, pad], axis=0))
    return tuple(out), B
