"""Multi-host distributed runtime for batched layer solves.

The reference has no distributed story at all (single process, batch
threadpool — cvxpylayers SURVEY section 2.3); this package is the
framework's headline new component:

  runtime.py   — jax.distributed initialization, global/host meshes,
                 per-host batch sharding helpers (DCN between hosts,
                 ICI within a host; XLA inserts the collectives)
  bucketing.py — heterogeneous problem bucketing: instances are grouped
                 by (cone pattern, n, solver settings) and each bucket
                 runs ONE shared compiled executable, with feasible
                 repeat-edge padding up to the mesh multiple
  harness.py   — scaling measurement harness, runnable in multi-process
                 CPU mode on one machine (N processes x K virtual
                 devices) and on real multi-host TPU pods unchanged
  scheduler.py — persistent bucket scheduler: queue + capacity-class
                 rounding (pad_multiple * 2^k, high-water mark) +
                 cross-step warm-start carry + occupancy stats
"""

from .runtime import (  # noqa: F401
    global_batch,
    host_local_results,
    initialize,
    make_global_mesh,
    make_host_mesh,
)
from .bucketing import bucket_plan, solve_bucketed  # noqa: F401
from .scheduler import BucketScheduler  # noqa: F401
