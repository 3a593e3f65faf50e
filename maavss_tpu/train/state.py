"""Train state and optimizer construction.

One `TrainState` (params + BatchNorm batch_stats + optax state + step) replaces
the reference's (model, optimizer) pair. The reference's per-subnet gradient
toggles (`toggle_av_grads` etc., avse_model.py:630-656) become an
`optax.masked` trainable-prefix filter — stage-wise training (pretrain AEs,
then train fusion with frozen AEs, train_av_net.py:73-75) is an optimizer
config instead of mutable module state.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import optax
from flax import core
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: core.FrozenDict[str, Any]
    batch_stats: core.FrozenDict[str, Any]
    opt_state: optax.OptState
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, batch_stats=None) -> "TrainState":
        fused = getattr(self.tx, "fused_apply", None)
        if fused is not None:
            # --opt_kernel pallas (train/fused_adam.py): moments AND the
            # parameter add in one kernel pass per leaf, skipping
            # optax.apply_updates' separate materialize-the-update pass
            new_params, new_opt_state = fused(grads, self.opt_state, self.params)
        else:
            updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
            new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=self.batch_stats if batch_stats is None else batch_stats,
            opt_state=new_opt_state,
        )


def trainable_labels(params: Any, trainable_prefixes: Sequence[str]) -> Any:
    """Pytree of 'train'/'freeze' labels by top-level module name.

    Mirrors the reference's grad toggles, which flip requires_grad per
    submodule (avse_model.py:630-656). Frozen leaves get set_to_zero updates
    (optax.masked would pass raw gradients through unmodified)."""

    def mark(path_name: str) -> str:
        hit = any(path_name == p or path_name.startswith(p) for p in trainable_prefixes)
        return "train" if hit else "freeze"

    return {k: jax.tree_util.tree_map(lambda _: mark(k), v) for k, v in params.items()}


def make_optimizer(
    learning_rate,  # float, or an optax schedule (step -> lr)
    name: str = "adam",
    trainable: Optional[Sequence[str]] = None,
    params: Optional[Any] = None,
    flat: bool = False,
    kernel: str = "xla",
) -> optax.GradientTransformation:
    """Adam (reference default, train.py:55) or SGD (main.py:61); optional
    trainable-prefix mask for staged training. `flat=True` selects the
    flat-buffer fused variants (train/flat_opt.py) — same math, moments in
    one contiguous buffer so the update runs as a few full-width kernels
    instead of ~50 per-leaf ones; incompatible with the trainable mask.
    `kernel='pallas'` selects the per-leaf fused-kernel Adam
    (train/fused_adam.py): one VMEM pass per leaf including the parameter
    add; incompatible with the trainable mask and with `flat`."""
    if kernel not in ("xla", "pallas"):
        raise ValueError(f"unknown optimizer kernel {kernel}")
    scheduled = callable(learning_rate)
    if scheduled and (flat or kernel == "pallas"):
        raise ValueError("--lr_schedule != constant needs the standard optax "
                         "path (the fused flat/pallas kernels bake a scalar "
                         "LR); drop --fused_opt / --opt_kernel pallas")
    if kernel == "pallas":
        if name != "adam":
            raise ValueError("--opt_kernel pallas supports adam only")
        if trainable is not None:
            raise ValueError("--opt_kernel pallas is incompatible with staged "
                             "trainable-prefix training (the mask wraps "
                             "update(), not the fused apply)")
        if flat:
            raise ValueError("--opt_kernel pallas and --fused_opt are "
                             "mutually exclusive")
        from maavss_tpu.train.fused_adam import pallas_adam

        return pallas_adam(learning_rate)
    if flat:
        if trainable is not None:
            raise ValueError("--fused_opt is incompatible with staged "
                             "trainable-prefix training (per-leaf masking "
                             "needs per-leaf optimizer state)")
        from maavss_tpu.train.flat_opt import flat_adam, flat_sgd

        if name == "adam":
            return flat_adam(learning_rate)
        if name == "sgd":
            return flat_sgd(learning_rate)
        raise ValueError(f"--fused_opt supports adam|sgd, not {name}")
    if name == "adam":
        tx = optax.adam(learning_rate)
    elif name == "sgd":
        tx = optax.sgd(learning_rate)
    elif name == "adamw":
        tx = optax.adamw(learning_rate)
    else:
        raise ValueError(f"unknown optimizer {name}")
    if trainable is not None:
        if params is None:
            raise ValueError("trainable mask requires params")
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            trainable_labels(params, trainable),
        )
    return tx


def create_train_state(variables: Any, tx: optax.GradientTransformation) -> TrainState:
    import jax.numpy as jnp

    params = variables["params"]
    batch_stats = variables.get("batch_stats", core.FrozenDict())
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
    )
