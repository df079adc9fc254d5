"""Multi-host runtime: jax.distributed init + mesh + sharding helpers.

Design (SURVEY sections 2.3 / 7.1.6): the only communication a batched
cone-program workload needs is (a) scattering per-host instance batches
into one global batch-sharded array and (b) reducing losses/metrics.
Per-instance solves never communicate. So the layout is a 1-D ``data``
mesh over every chip of every host — XLA routes the loss psum over ICI
within a host and DCN across hosts — plus an optional 2-D
(host, chip) mesh for workloads that want host-local reductions first.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids: Optional[Sequence[int]] = None) -> bool:
    """Initialize the multi-host runtime (idempotent).

    On managed TPU pods every argument is auto-detected and this is a
    plain `jax.distributed.initialize()`. For manual clusters (and the
    multi-process CPU harness) pass coordinator_address
    ("host:port"), num_processes and process_id explicitly. Returns
    True if a multi-process runtime was started, False for the
    single-process no-op.
    """
    global _initialized
    if _initialized:
        return True
    if (coordinator_address is None and num_processes in (None, 1)
            and process_id is None):
        try:
            # auto-detectable environment (TPU pod)?
            if jax.process_count() > 1:
                _initialized = True
                return True
        except RuntimeError:
            pass
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _initialized = True
    return True


def make_global_mesh(axis_name: str = "data") -> Mesh:
    """1-D mesh over every device of every host — the DP layout."""
    return Mesh(np.array(jax.devices()), (axis_name,))


def make_host_mesh(axis_names=("host", "chip")) -> Mesh:
    """2-D (host, chip) mesh: shard batches across hosts on the first
    axis (DCN) and across a host's chips on the second (ICI)."""
    devs = np.array(jax.devices()).reshape(jax.process_count(), -1)
    return Mesh(devs, axis_names)


def global_batch(local_arr, mesh: Mesh, axis_name: str = "data"):
    """Assemble per-host local batch shards into one global batch-sharded
    array (each host contributes its own instances; the global leading
    dim is the sum over hosts). Single-process: a plain device_put."""
    if jax.process_count() == 1:
        return jax.device_put(
            local_arr, NamedSharding(mesh, P(axis_name))
        )
    from jax.experimental import multihost_utils

    return multihost_utils.host_local_array_to_global_array(
        np.asarray(local_arr), mesh, P(axis_name)
    )


def host_local_results(global_arr):
    """This host's shard of a batch-sharded result, as one numpy array
    (concatenated over this process's addressable devices, in order)."""
    shards = sorted(
        global_arr.addressable_shards, key=lambda s_: s_.index[0].start or 0
    )
    return np.concatenate([np.asarray(s_.data) for s_ in shards], axis=0)
