"""Fused Pallas Adam leaf update: one VMEM pass per parameter tensor.

Why: the parameter-side HBM floor. BASELINE.md's optimizer-floor bench puts
the per-leaf optax Adam update at 2.71 ms on the 36.7 M-param fusion tree vs
a 1.26 ms speed-of-light (read g,m,v,p + write m,v,p = 7 fp32 passes). The
2.2x gap is structural in how XLA schedules the optax chain: the m-, v- and
p-updates land in separate fused kernels that each re-read the gradient, and
`optax.apply_updates` adds a separate materialize-the-update pass. This
kernel computes

    m' = b1*m + (1-b1)*g
    v' = b2*v + (1-b2)*g^2
    p' = p - lr * (m'/c1) / (sqrt(v'/c2) + eps)      c_k = 1 - b_k^count

for a whole leaf in ONE grid pass: 4 reads + 3 writes, the HBM minimum. The
math is exactly `optax.adam`'s (scale_by_adam bias correction then -lr;
parity-tested in tests/test_pallas_adam.py). The reference has no analogue
(torch Adam loops leaves in Python); the flat-buffer variant
(train/flat_opt.py) attacked the same floor and measured SLOWER because
flattening adds traffic — this one keeps leaves in place.

Leaves where the kernel does not apply (size not lane-aligned, tiny, or
non-fp32) fall back to the identical jnp formula — XLA fuses those fine; the
win is on the handful of multi-MB FC kernels holding ~95% of the bytes.

Off-TPU the kernel runs in interpreter mode so CPU tests exercise the same
code path.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_ROWS_PER_BLOCK = 1024  # (1024, 128) fp32 blocks: 0.5 MiB/operand, 7 operands
_MIN_ELEMS = 16384  # below this the launch isn't worth it; jnp path fuses


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _adam_kernel(lr: float, b1: float, b2: float, eps: float,
                 c_ref, g_ref, m_ref, v_ref, p_ref,
                 mo_ref, vo_ref, po_ref):
    c1, c2 = c_ref[0, 0], c_ref[0, 1]
    g = g_ref[:]
    m = b1 * m_ref[:] + (1.0 - b1) * g
    v = b2 * v_ref[:] + (1.0 - b2) * (g * g)
    mo_ref[:] = m
    vo_ref[:] = v
    po_ref[:] = p_ref[:] - lr * (m / c1) / (jnp.sqrt(v / c2) + eps)


def pallas_leaf_eligible(leaf: jnp.ndarray) -> bool:
    return (leaf.dtype == jnp.float32 and leaf.size >= _MIN_ELEMS
            and leaf.size % _LANES == 0)


def adam_leaf_update(
    g: jnp.ndarray, m: jnp.ndarray, v: jnp.ndarray, p: jnp.ndarray,
    c1: jnp.ndarray, c2: jnp.ndarray,
    *, lr: float, b1: float, b2: float, eps: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(g, m, v, p) -> (m', v', p') for one leaf; fused kernel when eligible,
    bit-identical jnp formula otherwise.

    Dtype discipline: outputs keep EXACTLY (m.dtype, v.dtype, p.dtype), like
    optax (bias corrections are cast to the moment dtype, the update to the
    param dtype). The fusion tree has bf16 LSTM leaves (models/layers.py
    inits w_i/w_h in the compute dtype); an earlier version let the fp32
    c1/c2 arrays promote those leaves to fp32 on the first step, after which
    the now-fp32 param hit the kernel path with a still-bf16 moment and the
    input_output_aliases dtype check failed on chip (runs/probe_r3c).
    """
    if not (pallas_leaf_eligible(p) and m.dtype == v.dtype == jnp.float32):
        gd = g.astype(m.dtype)
        m2 = b1 * m + (1.0 - b1) * gd
        v2 = b2 * v + (1.0 - b2) * jnp.square(gd)
        mh = m2 / c1.astype(m2.dtype)
        vh = v2 / c2.astype(v2.dtype)
        u = lr * mh / (jnp.sqrt(vh) + eps)
        return m2, v2, p - u.astype(p.dtype)

    shape = p.shape
    rows = p.size // _LANES
    blk = min(_ROWS_PER_BLOCK, rows)
    flat = lambda x: x.reshape(rows, _LANES)  # noqa: E731
    spec = pl.BlockSpec((blk, _LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    scal = pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM)
    out = jax.ShapeDtypeStruct((rows, _LANES), p.dtype)
    c = jnp.stack([c1, c2]).astype(jnp.float32).reshape(1, 2)
    m2, v2, p2 = pl.pallas_call(
        partial(_adam_kernel, lr, b1, b2, eps),
        grid=(pl.cdiv(rows, blk),),
        in_specs=[scal, spec, spec, spec, spec],
        out_specs=[spec, spec, spec],
        out_shape=[out, out, out],
        # m/v/p are dead after the update (the train state is donated):
        # write the outputs into the input buffers
        input_output_aliases={2: 0, 3: 1, 4: 2},
        interpret=_interpret(),
    )(c, flat(g.astype(p.dtype)), flat(m), flat(v), flat(p))
    return m2.reshape(shape), v2.reshape(shape), p2.reshape(shape)
