"""Multi-host initialization (the jax.distributed analog of NCCL setup).

One call per host before any device use:

    from foundationstereo_tpu.parallel.distributed import initialize
    initialize()                      # TPU pods: auto-discovery
    initialize(coordinator, n, pid)   # explicit (CPU/GPU clusters, tests)

After initialization, `jax.devices()` spans the whole slice and
`parallel.make_mesh()` builds a global mesh — the `data` axis should cross
hosts (DCN) while `spatial` stays within a host's ICI domain; `make_mesh`'s
default device order already satisfies this because `jax.devices()` is
host-major.

Checkpointing with orbax and the sharded train step work unchanged:
each host feeds its local batch shard via `jax.make_array_from_process_local_data`.
"""

from __future__ import annotations

import jax
import numpy as np


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None):
    """Initialize jax.distributed (no-op if already initialized/single host)."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        if "already initialized" not in str(e):
            raise


def host_local_batch_to_global(batch: dict, mesh) -> dict:
    """Assemble per-host batch shards into globally-sharded arrays."""
    from foundationstereo_tpu.parallel.sharding import batch_sharding, replicate

    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        if v.ndim >= 1 and (v.shape[0] * jax.process_count()) % mesh.shape["data"] == 0:
            out[k] = jax.make_array_from_process_local_data(
                batch_sharding(mesh, v.ndim), v)
        else:
            out[k] = jax.device_put(v, replicate(mesh))
    return out
