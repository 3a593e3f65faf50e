"""Fused Pallas LSTM recurrence with a hand-written BPTT backward.

The bi-LSTM recurrence is the fusion step's latency bound (SURVEY.md §7.3):
under lax.scan every timestep issues a separate small [B,H]x[H,4H] matmul
plus elementwise ops. This kernel runs the ENTIRE recurrence inside one
Pallas program — the recurrent weights and the input-projected sequence stay
resident in VMEM across all T steps, gates fuse with the cell update, and
only two kernels run per training step (forward + backward) instead of ~4T
XLA ops.

Default: AUTO — on TPU the fused kernel is the default at any batch: the
batch axis is embarrassingly parallel in a recurrence, so the kernel runs a
1-D grid over batch blocks sized to a VMEM budget (`_batch_block`),
each block sweeping the full T recurrence independently; the backward
accumulates dW_h across blocks in an fp32 VMEM scratch (TPU grid iterations
are sequential). Before blocking, the whole [T,B,*] residency had to fit at
once, which silently flipped b512-vectorized runs back to scan — the ~6.5%
per-clip regression BASELINE.md's b512 row measured. MAAVSS_LSTM=scan|pallas
still forces a backend. The round-1 A/B that favored scan was measured with
an unfaithful timing protocol and is void (BASELINE.md
"measurement-integrity"); the honest fetch-closed comparison shows the kernel
+2.3% end-to-end under vectorized windows (BASELINE.md round-3 table), which
earned it the default.

Contract (matches models/layers.LSTM's scan exactly, incl. torch gate order):
    ys = pallas_lstm(xw, w_h)
      xw  [T, B, 4H]  input projection x @ W_i (+ bias), time-major
      w_h [H, 4H]     recurrent weights
      ys  [T, B, H]   hidden states (h_0 = c_0 = 0)

The backward recomputes gate activations from (xw, saved h/c sequences) —
storing only ys/cs, not the gate tensor — and accumulates dW_h in a VMEM
scratch across the reverse sweep.

Off-TPU the kernels run in interpreter mode, so the same code path is
CI-tested for value/grad parity against the lax.scan reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# Per-grid-step VMEM budget. The backward is the hungriest pass: xw+dxw
# [T,blk,4H] + ys/cs/dys [T,blk,H] ≈ T*blk*11H elements, plus the fp32
# carry/scratch. The binding limit is NOT the v5e's 128 MiB physical VMEM
# but Mosaic's ~16 MiB scoped-vmem allocation cap (measured on chip: a
# B=512 whole-batch forward wants 16.71M and is rejected), and blocked
# grid inputs/outputs are double-buffered — so the budget must leave room
# for 2x the blocked tensors plus fp32 loop temporaries. 6 MiB keeps the
# worst pass ≈12 MiB + temps under the cap.
_VMEM_CAP_BYTES = 6 * 1024 * 1024


def _batch_block(t_len: int, b: int, h_dim: int, itemsize: int):
    """Largest batch block (halving while even, floor 8) whose residency fits
    the VMEM budget; None when even a minimal block cannot fit (fall back to
    the lax.scan path)."""
    def bytes_for(blk):
        return t_len * blk * 11 * h_dim * itemsize

    blk = b
    while blk > 8 and blk % 2 == 0 and bytes_for(blk) > _VMEM_CAP_BYTES:
        blk //= 2
    return blk if bytes_for(blk) <= _VMEM_CAP_BYTES else None


def pallas_fits(t_len: int, b: int, h_dim: int, itemsize: int) -> bool:
    """Can the fused kernel run at this geometry (possibly batch-blocked)?"""
    return _batch_block(t_len, b, h_dim, itemsize) is not None


def _fwd_kernel(xw_ref, wh_ref, ys_ref, cs_ref):
    t_len, b, four_h = xw_ref.shape
    h_dim = four_h // 4
    out_dtype = ys_ref.dtype
    wh = wh_ref[:].astype(jnp.float32)

    def body(t, carry):
        h, c = carry  # fp32 cell state regardless of the IO dtype
        gates = xw_ref[t].astype(jnp.float32) + jnp.dot(
            h, wh, preferred_element_type=jnp.float32)
        i = jax.nn.sigmoid(gates[:, :h_dim])
        f = jax.nn.sigmoid(gates[:, h_dim:2 * h_dim])
        g = jnp.tanh(gates[:, 2 * h_dim:3 * h_dim])
        o = jax.nn.sigmoid(gates[:, 3 * h_dim:])
        c = f * c + i * g
        h = o * jnp.tanh(c)
        ys_ref[t] = h.astype(out_dtype)
        cs_ref[t] = c.astype(out_dtype)
        return (h, c)

    init = (jnp.zeros((b, h_dim), jnp.float32),
            jnp.zeros((b, h_dim), jnp.float32))
    jax.lax.fori_loop(0, t_len, body, init)


def _bwd_kernel(xw_ref, wh_ref, ys_ref, cs_ref, dys_ref,
                dxw_ref, dwh_ref, acc_ref):
    t_len, b, four_h = xw_ref.shape
    h_dim = four_h // 4

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    wh = wh_ref[:].astype(jnp.float32)

    def body(k, carry):
        t = t_len - 1 - k
        dh_next, dc_next = carry
        h_prev = jnp.where(t > 0,
                           ys_ref[jnp.maximum(t - 1, 0)], 0.0).astype(jnp.float32)
        c_prev = jnp.where(t > 0,
                           cs_ref[jnp.maximum(t - 1, 0)], 0.0).astype(jnp.float32)
        gates = xw_ref[t].astype(jnp.float32) + jnp.dot(
            h_prev, wh, preferred_element_type=jnp.float32)
        i = jax.nn.sigmoid(gates[:, :h_dim])
        f = jax.nn.sigmoid(gates[:, h_dim:2 * h_dim])
        g = jnp.tanh(gates[:, 2 * h_dim:3 * h_dim])
        o = jax.nn.sigmoid(gates[:, 3 * h_dim:])
        c = cs_ref[t].astype(jnp.float32)
        tanh_c = jnp.tanh(c)

        dh = dys_ref[t].astype(jnp.float32) + dh_next
        do = dh * tanh_c
        dc = dh * o * (1.0 - tanh_c * tanh_c) + dc_next
        di = dc * g
        dg = dc * i
        df = dc * c_prev
        dgates = jnp.concatenate([
            di * i * (1.0 - i),
            df * f * (1.0 - f),
            dg * (1.0 - g * g),
            do * o * (1.0 - o),
        ], axis=-1)
        dxw_ref[t] = dgates.astype(dxw_ref.dtype)
        acc_ref[:] += jnp.dot(h_prev.T, dgates,
                              preferred_element_type=jnp.float32)
        dh_prev = jnp.dot(dgates, wh.T, preferred_element_type=jnp.float32)
        return (dh_prev, dc * f)

    init = (jnp.zeros((b, h_dim), jnp.float32),
            jnp.zeros((b, h_dim), jnp.float32))
    jax.lax.fori_loop(0, t_len, body, init)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _write():
        dwh_ref[:] = acc_ref[:].astype(dwh_ref.dtype)


def _specs(t_len: int, blk: int, h_dim: int):
    """Batch-blocked BlockSpecs: sequence tensors split on axis 1, recurrent
    weights replicated to every grid step."""
    seq4 = pl.BlockSpec((t_len, blk, 4 * h_dim), lambda i: (0, i, 0))
    seq1 = pl.BlockSpec((t_len, blk, h_dim), lambda i: (0, i, 0))
    wh = pl.BlockSpec((h_dim, 4 * h_dim), lambda i: (0, 0))
    return seq4, seq1, wh


def _forward(xw: jnp.ndarray, w_h: jnp.ndarray):
    t_len, b, four_h = xw.shape
    h_dim = four_h // 4
    blk = _batch_block(t_len, b, h_dim, xw.dtype.itemsize)
    if blk is None:  # guarded by pallas_fits at the auto gate; explicit
        raise ValueError(f"pallas_lstm: no batch block fits VMEM for "
                         f"T={t_len} B={b} H={h_dim}")
    seq4, seq1, wh = _specs(t_len, blk, h_dim)
    ys, cs = pl.pallas_call(
        _fwd_kernel,
        grid=(b // blk,),
        in_specs=[seq4, wh],
        out_specs=[seq1, seq1],
        out_shape=[jax.ShapeDtypeStruct((t_len, b, h_dim), xw.dtype),
                   jax.ShapeDtypeStruct((t_len, b, h_dim), xw.dtype)],
        interpret=_interpret(),
    )(xw, w_h)
    return ys, cs


@jax.custom_vjp
def pallas_lstm(xw: jnp.ndarray, w_h: jnp.ndarray) -> jnp.ndarray:
    """LSTM over the full sequence in one fused kernel: [T,B,4H] -> [T,B,H]."""
    ys, _ = _forward(xw, w_h)
    return ys


def _vjp_fwd(xw, w_h):
    ys, cs = _forward(xw, w_h)
    return ys, (xw, w_h, ys, cs)


def _vjp_bwd(res, dys):
    xw, w_h, ys, cs = res
    t_len, b, four_h = xw.shape
    h_dim = four_h // 4
    blk = _batch_block(t_len, b, h_dim, xw.dtype.itemsize)
    seq4, seq1, wh = _specs(t_len, blk, h_dim)
    dxw, dwh = pl.pallas_call(
        _bwd_kernel,
        grid=(b // blk,),
        in_specs=[seq4, wh, seq1, seq1, seq1],
        # dwh revisits the same block every grid step; the fp32 scratch
        # accumulates across the (sequential) steps and the final step
        # writes it out
        out_specs=[seq4, wh],
        out_shape=[jax.ShapeDtypeStruct(xw.shape, xw.dtype),
                   jax.ShapeDtypeStruct(w_h.shape, w_h.dtype)],
        scratch_shapes=[pltpu.VMEM((h_dim, 4 * h_dim), jnp.float32)],
        interpret=_interpret(),
    )(xw, w_h, ys, cs, dys)
    return dxw, dwh


pallas_lstm.defvjp(_vjp_fwd, _vjp_bwd)
