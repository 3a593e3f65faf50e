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


def _leaf_model_sharding(mesh: Mesh, x: Any) -> NamedSharding:
    """Tensor-parallel placement rule for one state leaf: wide 2D kernels
    (Dense / LSTM input+recurrent projections — fc1/fc2/a_fc1/v_fc1, w_i/w_h)
    split their output axis over 'model'; everything else (biases, conv
    kernels, BatchNorm stats, scalars) is replicated.

    The rule is shape-based so it applies unchanged to the optimizer state
    (adam's mu/nu mirror the param shapes) — a model-sharded param always has
    model-sharded Adam moments, keeping the update fully local to each shard.
    """
    n_model = mesh.shape[MODEL_AXIS]
    ndim = getattr(x, "ndim", 0)
    shape = getattr(x, "shape", ())
    if (n_model > 1 and ndim == 2 and shape[-1] % n_model == 0
            and shape[-1] >= 128):
        return NamedSharding(mesh, P(None, MODEL_AXIS))
    return NamedSharding(mesh, P())


def state_shardings(mesh: Mesh, state: Any) -> Any:
    """State-shaped pytree of NamedShardings implementing --mesh_model."""
    return jax.tree_util.tree_map(lambda x: _leaf_model_sharding(mesh, x), state)


def shard_state(mesh: Mesh, state: Any):
    """device_put a TrainState per the --mesh_model rules; returns
    (placed_state, shardings) — pass the shardings into the step factories so
    the compiled step keeps the wide kernels on 'model' instead of forcing
    everything replicated."""
    sh = state_shardings(mesh, state)
    placed = jax.tree_util.tree_map(jax.device_put, state, sh)
    return placed, sh


def shard_batch(mesh: Mesh, batch: Any, stacked: bool = False) -> Any:
    """device_put every leaf with its batch axis sharded on `data`.

    `stacked` marks multi-step batches [K, B, ...] (steps_per_dispatch): the
    stack axis K stays unsharded, the batch axis (axis 1) shards on 'data'.
    Leaves whose batch dim doesn't divide the data axis are replicated.
    """
    n_data = mesh.shape[DATA_AXIS]
    b_axis = 1 if stacked else 0

    def put(x):
        x = np.asarray(x) if not isinstance(x, jax.Array) else x
        if x.ndim > b_axis and x.shape[b_axis] % n_data == 0:
            spec = [None] * x.ndim
            spec[b_axis] = DATA_AXIS
            return jax.device_put(x, NamedSharding(mesh, P(*spec)))
        return jax.device_put(x, replicated_sharding(mesh))

    return jax.tree_util.tree_map(put, batch)
