"""Checkpointing with the reference's resume semantics, dual backend.

Capability parity with utilities.py:165-204:
- `save_checkpoint(cp_dir, name, state, epoch, loss)` — writes
  {epoch, loss, step, params, batch_stats, opt_state} (the reference's
  {epoch, model_state_dict, optimizer_state_dict, loss}), overwriting the
  run's previous checkpoint like the reference's single `<name>.pt`,
- `load_checkpoint(..., auto=True)` — `-c` auto-resume: newest checkpoint in
  `cp_dir` by mtime (utilities.py:199-204 latest_file),
- `load_opt` gate on optimizer-state restore (utilities.py:193-197),
- `save_model` / `load_model` — whole-model params only (utilities.py:165-169).

Backends:
- **orbax** (default): async-friendly directory checkpoints; sharded arrays
  restore onto their meshes.
- **pkl** fallback: host-side pickle of the (device_get) pytree. Selected
  automatically on experimental remote backends (axon tunnels), where merely
  importing orbax wedges subsequent XLA dispatch, or via
  MAAVSS_CKPT_BACKEND=pkl. Orbax is imported lazily so the selection happens
  before any orbax side effects.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Optional, Tuple

import jax
import numpy as np

PKL_SUFFIX = ".ckpt.pkl"


def _backend() -> str:
    forced = os.environ.get("MAAVSS_CKPT_BACKEND")
    if forced in ("pkl", "orbax"):
        return forced
    if os.environ.get("PALLAS_AXON_REMOTE_COMPILE") == "1":
        return "pkl"  # orbax import deadlocks the axon relay (observed)
    return "orbax"


def _payload(state: Any, epoch: int, loss: float) -> Any:
    return {
        "epoch": np.int64(epoch),
        "loss": np.float64(loss),
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }


def save_checkpoint(cp_dir: str, name: str, state: Any,
                    epoch: int = 0, loss: float = 0.0) -> str:
    payload = _payload(state, epoch, loss)
    if _backend() == "pkl":
        os.makedirs(cp_dir, exist_ok=True)
        path = os.path.join(cp_dir, name + PKL_SUFFIX)
        host = jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)),
                                      payload)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(host, f)
        os.replace(tmp, path)
        return path
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(cp_dir, name))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    ocp.PyTreeCheckpointer().save(path, payload, force=True)
    return path


def latest_checkpoint(cp_dir: str) -> Optional[str]:
    """Newest checkpoint (orbax dir or .ckpt.pkl) by mtime
    (utilities.py:199-204)."""
    if not os.path.isdir(cp_dir):
        return None
    candidates = []
    for d in os.listdir(cp_dir):
        full = os.path.join(cp_dir, d)
        if d.endswith(PKL_SUFFIX) and os.path.isfile(full):
            candidates.append(full)
        elif (os.path.isdir(full)
              and os.path.exists(os.path.join(full, "_CHECKPOINT_METADATA"))):
            candidates.append(full)
    if not candidates:
        return None
    return max(candidates, key=os.path.getmtime)


def load_checkpoint(cp_dir: str, state: Any, auto: bool = True,
                    path: Optional[str] = None, load_opt: bool = False,
                    ) -> Tuple[Any, int]:
    """Restore (state, epoch); returns input unchanged if nothing found."""
    target = latest_checkpoint(cp_dir) if auto else path
    if target is None:
        print("checkpoint not found, aborting cp load")  # utilities.py:183
        return state, 0
    print(f"loading model checkpoint from {target}")
    if target.endswith(PKL_SUFFIX):
        with open(target, "rb") as f:
            restored = pickle.load(f)
    else:
        import orbax.checkpoint as ocp

        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                          _payload(state, 0, 0.0))
        restored = ocp.PyTreeCheckpointer().restore(os.path.abspath(target),
                                                    item=abstract)
    new_state = state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        step=restored["step"],
        opt_state=restored["opt_state"] if load_opt else state.opt_state,
    )
    return new_state, int(restored["epoch"])


def save_model(path: str, params: Any) -> str:
    """Whole-model save (params only), reference save_model parity."""
    if _backend() == "pkl":
        path = path if path.endswith(".pkl") else path + ".params.pkl"
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        host = jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)),
                                      params)
        with open(path, "wb") as f:
            pickle.dump(host, f)
        return path
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    ocp.PyTreeCheckpointer().save(path, {"params": params}, force=True)
    return path


def load_model(path: str, params_template: Any) -> Any:
    if path.endswith(".pkl"):
        with open(path, "rb") as f:
            return pickle.load(f)
    import orbax.checkpoint as ocp

    abstract = {"params": jax.tree_util.tree_map(
        ocp.utils.to_shape_dtype_struct, params_template)}
    return ocp.PyTreeCheckpointer().restore(os.path.abspath(path),
                                            item=abstract)["params"]
