"""Multi-host (multi-process) SPMD setup.

The reference has no distributed layer at all (SURVEY.md §2.3); this is the
greenfield TPU design: one process per host, `jax.distributed.initialize` to
form the global runtime (DCN between hosts, ICI inside a slice), a global
Mesh over all devices, and host-local input feeding where every process loads
only its shard of the global batch and assembles a `jax.Array` via
`make_array_from_process_local_data`.

Single-process runs (the common case on one chip/slice) work unchanged —
`initialize()` is a no-op unless a coordinator is configured.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from maavss_tpu.parallel.mesh import DATA_AXIS, make_mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join the multi-host runtime. Args default from the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or cloud
    TPU metadata when none are set). No-op for single-process runs."""
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None and num_processes is None:
        return  # single process
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)


def global_mesh(data: int = -1, model: int = 1) -> Mesh:
    """Mesh over every device in the job (all hosts)."""
    return make_mesh(data=data, model=model, devices=jax.devices())


def process_batch_slice(global_batch: int) -> slice:
    """This host's contiguous slice of the global batch (host-local input
    pipelines read only their part)."""
    per = global_batch // jax.process_count()
    start = per * jax.process_index()
    return slice(start, start + per)


def host_local_to_global(mesh: Mesh, batch: Any) -> Any:
    """Assemble per-host numpy batch shards into global jax.Arrays sharded on
    the data axis. Each process passes only its local rows."""

    def put(x):
        x = np.asarray(x)
        spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
        sharding = NamedSharding(mesh, spec)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(put, batch)
