"""Flat fused optimizers: moments as ONE contiguous buffer per moment.

Why: the per-step parameter-side cost is batch-independent and bounded by HBM
traffic (BASELINE.md "optimizer floor": a 36.7 M-param Adam update costs a
fixed 2.71 ms on device vs 1.26 ms speed-of-light; the 2.2x gap is per-leaf
kernel overhead across the ~50-leaf tree — dozens of small elementwise
kernels, each paying launch + tiling overhead on tails far below the VPU's
lane width). The reference has no analogue: torch Adam loops leaves in
Python (the same overhead, worse).

`flat_adam` is an optax-compatible `GradientTransformation` whose state is
two flat fp32 buffers (m, v) over the concatenated param vector. The update
flattens the grad tree once (`ravel_pytree`, one fused concatenate pass),
runs the entire Adam math as a handful of full-width elementwise kernels on
the flat vector, and unravels the update tree (slices that fuse into
`apply_updates`' add). The math is exactly `optax.adam`'s (scale_by_adam
with bias correction, then -lr) — parity tested to fp tolerance in
tests/test_flat_opt.py.

MEASURED OUTCOME (v5e, fetch-closed, BASELINE.md round 3b): the flat update
is SLOWER than per-leaf optax — 4.11 ms vs 2.59 ms device cost on the 36.7M
param fusion tree (SOL 1.26 ms), 13% slower end-to-end at b256. XLA already
fuses each leaf's Adam chain into one elementwise kernel, so the per-leaf
"overhead" this was built to remove is mostly gone, and the extra
flatten/unflatten passes over the 147 MB grad/update vectors cost more HBM
traffic than they save. The flag therefore defaults OFF and exists as a
measured negative result (and for hosts where kernel-launch count, not HBM,
is the binding constraint).

Not composable with `optax.multi_transform` trainable masks (staged
training, train_av_net.py regime) or with `--mesh_model` tensor sharding
(moments must shard per-leaf like their params, parallel/mesh.shard_state) —
`make_optimizer` raises on those combinations rather than silently
de-optimizing.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree


class FlatMomentState(NamedTuple):
    count: jnp.ndarray  # int32 scalar
    m: jnp.ndarray      # [N] flat first moment
    v: jnp.ndarray      # [N] flat second moment


def flat_adam(learning_rate: float, b1: float = 0.9, b2: float = 0.999,
              eps: float = 1e-8) -> optax.GradientTransformation:
    """optax.adam semantics with flat-buffer moments (module docstring)."""

    def init(params):
        flat, _ = ravel_pytree(params)
        return FlatMomentState(
            count=jnp.zeros((), jnp.int32),
            m=jnp.zeros_like(flat),
            v=jnp.zeros_like(flat),
        )

    def update(grads, state, params=None):
        del params
        g, unravel = ravel_pytree(grads)
        count = optax.safe_int32_increment(state.count)
        m = b1 * state.m + (1.0 - b1) * g
        v = b2 * state.v + (1.0 - b2) * jnp.square(g)
        # bias correction exactly as optax.scale_by_adam
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)
        u = -learning_rate * (m / c1) / (jnp.sqrt(v / c2) + eps)
        return unravel(u), FlatMomentState(count=count, m=m, v=v)

    return optax.GradientTransformation(init, update)


def flat_sgd(learning_rate: float, momentum: float = 0.0
             ) -> optax.GradientTransformation:
    """optax.sgd semantics; with momentum the buffer is flat (trace form:
    t = momentum * t + g, update = -lr * t, matching optax.trace)."""

    def init(params):
        if momentum == 0.0:
            return optax.EmptyState()
        flat, _ = ravel_pytree(params)
        return FlatMomentState(count=jnp.zeros((), jnp.int32),
                               m=jnp.zeros_like(flat),
                               v=jnp.zeros((0,), flat.dtype))

    def update(grads, state, params=None):
        del params
        g, unravel = ravel_pytree(grads)
        if momentum == 0.0:
            return unravel(-learning_rate * g), state
        t = momentum * state.m + g
        new_state = FlatMomentState(
            count=optax.safe_int32_increment(state.count), m=t, v=state.v)
        return unravel(-learning_rate * t), new_state

    return optax.GradientTransformation(init, update)
