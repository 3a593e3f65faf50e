"""Per-leaf fused-kernel Adam (`--opt_kernel pallas`).

optax.adam semantics with the update executed by ops/pallas_adam.py's fused
kernel: one VMEM pass per leaf doing moment updates AND the parameter add,
instead of XLA's several elementwise kernels plus `optax.apply_updates`'
separate pass (module docstring there has the traffic math; BASELINE.md's
optimizer floor is the motivating measurement).

Exposed as a `FusedGradientTransformation`: a drop-in optax
GradientTransformation (init/update keep working and use the identical
formula, for callers that want plain updates) plus a `fused_apply` method
that TrainState.apply_gradients prefers — returning (new_params, new_state)
directly so the parameter add happens inside the kernel.

Constraints (enforced in make_optimizer): fp32 params; not composable with
the staged trainable-prefix mask (optax.multi_transform wraps update(), not
fused_apply) or with --mesh_model tensor sharding (a pallas_call on a
'model'-sharded leaf would force a gather under GSPMD).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from maavss_tpu.ops.pallas_adam import adam_leaf_update


class FusedGradientTransformation(NamedTuple):
    init: Callable[[Any], Any]
    update: Callable[..., Any]
    fused_apply: Callable[[Any, Any, Any], Any]


class FusedAdamState(NamedTuple):
    count: jnp.ndarray  # int32 scalar
    m: Any              # param-shaped trees
    v: Any


def pallas_adam(learning_rate: float, b1: float = 0.9, b2: float = 0.999,
                eps: float = 1e-8) -> FusedGradientTransformation:
    def init(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return FusedAdamState(count=jnp.zeros((), jnp.int32),
                              m=zeros,
                              v=jax.tree_util.tree_map(jnp.copy, zeros))

    def _bias_corrections(count):
        c = count.astype(jnp.float32)
        return 1.0 - b1 ** c, 1.0 - b2 ** c

    def update(grads, state, params=None):
        """Plain-optax-style path (returns an updates tree); same math as
        fused_apply, used when something other than TrainState drives the
        transformation."""
        del params
        count = optax.safe_int32_increment(state.count)
        c1, c2 = _bias_corrections(count)

        def leaf(g, m, v):
            m2 = b1 * m + (1.0 - b1) * g
            v2 = b2 * v + (1.0 - b2) * jnp.square(g)
            return m2, v2, -learning_rate * (m2 / c1) / (jnp.sqrt(v2 / c2) + eps)

        out = jax.tree_util.tree_map(leaf, grads, state.m, state.v)
        is_triple = lambda t: isinstance(t, tuple) and len(t) == 3  # noqa: E731
        m = jax.tree_util.tree_map(lambda t: t[0], out, is_leaf=is_triple)
        v = jax.tree_util.tree_map(lambda t: t[1], out, is_leaf=is_triple)
        u = jax.tree_util.tree_map(lambda t: t[2], out, is_leaf=is_triple)
        return u, FusedAdamState(count=count, m=m, v=v)

    def fused_apply(grads, state, params):
        count = optax.safe_int32_increment(state.count)
        c1, c2 = _bias_corrections(count)

        def leaf(g, m, v, p):
            return adam_leaf_update(g, m, v, p, c1, c2, lr=learning_rate,
                                    b1=b1, b2=b2, eps=eps)

        out = jax.tree_util.tree_map(leaf, grads, state.m, state.v, params)
        is_triple = lambda t: isinstance(t, tuple) and len(t) == 3  # noqa: E731
        m = jax.tree_util.tree_map(lambda t: t[0], out, is_leaf=is_triple)
        v = jax.tree_util.tree_map(lambda t: t[1], out, is_leaf=is_triple)
        p = jax.tree_util.tree_map(lambda t: t[2], out, is_leaf=is_triple)
        return p, FusedAdamState(count=count, m=m, v=v)

    return FusedGradientTransformation(init, update, fused_apply)
