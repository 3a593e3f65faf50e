"""Device mesh & sharding setup.

The reference is single-process / single-device (SURVEY.md §2.3: no
torch.distributed anywhere), so parallelism here is greenfield TPU design:

- one `jax.sharding.Mesh` over all chips with a `data` axis (batch-sharded)
  and a `model` axis (reserved for tensor sharding of the big FC layers),
- the train step is a single `jax.jit` with NamedShardings: batch inputs
  `P('data')`, state replicated (or sharded on 'model' where annotated) —
  GSPMD inserts the gradient all-reduce over ICI,
- BatchNorm statistics are computed on the *global* batch automatically
  under GSPMD (the mean/var reductions become cross-device collectives),
  matching the reference's single-device semantics at global-batch level,
- multi-host: `jax.distributed.initialize()` + per-host input feeding via
  `make_array_from_process_local_data` (DCN between hosts, ICI inside).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: int = -1,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh. `data=-1` uses all devices / `model`.

    Contiguous device order keeps the data axis on ICI neighbors so the
    gradient all-reduce rides the torus, not DCN.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs {data * model} devices, have {n}")
    arr = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over the data mesh axis."""
    spec = P(DATA_AXIS, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """device_put every leaf with its batch axis sharded on `data`.

    Leaves whose batch dim doesn't divide the data axis are replicated.
    """
    n_data = mesh.shape[DATA_AXIS]

    def put(x):
        x = np.asarray(x) if not isinstance(x, jax.Array) else x
        if x.ndim >= 1 and x.shape[0] % n_data == 0:
            return jax.device_put(x, batch_sharding(mesh, x.ndim))
        return jax.device_put(x, replicated_sharding(mesh))

    return jax.tree_util.tree_map(put, batch)
