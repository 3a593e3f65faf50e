"""Fused (1,9)-stride-2 conv + BatchNorm(train) + tanh — the phasegram
encoder's layer — as Pallas TPU kernels with a hand-written VJP.

Why: the fusion step at b256 runs AT the HBM roofline (BASELINE.md round-3b:
102% of speed-of-light bytes/s), so the per-chip lever left is traffic
reduction. The phasegram encoder is ten conv(1,9)/s(1,2)/p(0,4) + BN + tanh
layers (models/shape_plan.py:plan_phasegram_encoder, mirroring
avse_model.py:427-446). XLA executes each layer as conv -> write -> stats
read -> normalize read -> write, and autodiff stores the conv output AND the
normalized output as residuals. This kernel:

  forward (train):  2 reads of x + 1 write of y   (two-pass grid: pass 0
                    accumulates per-channel sum/sumsq in a revisited output
                    block, pass 1 recomputes the conv and writes
                    tanh(gamma*(yc-mu)*rsqrt(var+eps)+beta))
  backward:         2 reads of (x, dy) + 1 write of dx, with dW/dgamma/dbeta
                    accumulated across sequential grid steps; NO forward
                    residual tensors are stored (recompute from x).

Dataflow is channel-first [C, R, S] (R = B*T rows, S on lanes): the 9 taps
are static lane shifts of a zero-padded block, the channel contraction is ONE
MXU matmul W2 [Co, 9C] @ taps [9C, R*S], and stride 2 is a single lane
subsample of the full-width result (`tap_mode="dense"`, the default — no
strided lane reads, 2x conv FLOPs which are free at ~5% MXU) or strided tap
slices (`tap_mode="strided"`, gated on benchmarks/mosaic_probe.py's on-chip
answer about Mosaic's lane-stride lowering). The backward needs no strided
ops in either mode (upsample dyc by interleaving zeros via stack+reshape,
then stride-1 taps).

Semantics match flax nn.BatchNorm (momentum handled by the caller; biased
variance; eps 1e-5; fp32 statistics) — the repo's TorchBatchNorm. The conv
bias gradient is returned as exact zeros: under train-mode batch norm the
bias cancels in (yc - mu), so its true gradient is identically 0 (flax
autodiff returns fp-noise ~1e-8 instead; tests/test_pallas_pgenc.py).
Running-stat updates consume (mu, var) outside the differentiated graph, so
their cotangents are zero by construction and the VJP ignores them (same
non-differentiability as flax's variable update).

VALIDATION STATUS: interpret-mode parity is CI-tested; the on-chip
compile/latency question (Mosaic lowering of the in-kernel pad, concat,
subsample and small-contraction dots) is exactly what
benchmarks/mosaic_probe.py measures — run it in the next relay window before
flipping --pgenc_kernel to default (the magphase/atan2 lesson: interpret
mode proves nothing about the chip).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TAPS = 9
PAD = 4
STRIDE = 2
EPS = 1e-5

# Per-grid-step VMEM budget (same rationale as ops/pallas_lstm.py: Mosaic's
# ~16 MiB scoped-vmem cap, measured on chip, minus double-buffered blocked IO
# and fp32 loop temporaries).
_VMEM_CAP_BYTES = 6 * 1024 * 1024


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _row_block(c_in: int, c_out: int, s: int, itemsize: int, r_total: int,
               backward: bool) -> int:
    """Largest row block (halving from 256, floor 1) that divides R and whose
    per-step residency fits the VMEM budget."""
    def bytes_per_row():
        io = itemsize
        b = c_in * (s + 2 * PAD) * io * 2        # x block (double-buffered)
        b += TAPS * c_in * s * io                # tap stack
        b += c_out * s * 4                       # fp32 conv result
        b += c_out * (s // STRIDE) * io * 2      # y / dx-side block
        if backward:
            b += c_out * (s // STRIDE) * io * 2  # dy block
            b += c_out * s * 4                   # upsampled dyc (fp32)
            b += TAPS * c_in * s * 4             # dtaps (fp32)
            b += c_in * (s + 2 * PAD) * 4        # dxp accumulator (fp32)
        return b

    blk = min(r_total, 256)
    while blk > 1 and (r_total % blk or blk * bytes_per_row() > _VMEM_CAP_BYTES):
        blk //= 2
    return max(blk, 1)


def pgenc_fits(c_in: int, s: int) -> bool:
    """Geometry gate: the kernel needs an even lane width (stride-2 subsample
    and So = S // 2) and the planned (1,9)/s2/p4 shape."""
    del c_in
    return s % 2 == 0 and s >= 2


def _subsample2(y):
    """Even-lane subsample [*, r, s] -> [*, r, s//2] WITHOUT a strided slice:
    Mosaic lowers `y[..., ::2]` through gather, which rejects 3D operands
    ("Only 2D gather is supported") and mis-shapes 2D ones ("Shape mismatch
    in input, indices and output") — both measured on chip
    (runs/probe_r3c/{validate_pgenc,mosaic_probe}) and reproduced by
    cross-lowering (tests/test_mosaic_lowering.py). The minormost reshape
    split + static slice lowers cleanly."""
    c, r, s = y.shape
    return y.reshape(c, r, s // STRIDE, STRIDE)[:, :, :, 0]


def _conv_block(xv, w2v, bias, tap_mode: str, s_out: int):
    """One block's conv: xv [C, r, S] -> fp32 [Co, r, s_out or S].

    dense: full-width stride-1 result (caller subsamples); strided: taps are
    even-lane subsamples of shifted windows and the result is already at
    s_out.
    """
    c, r, s = xv.shape
    xp = jnp.pad(xv, ((0, 0), (0, 0), (PAD, PAD)))
    if tap_mode == "strided":
        taps = [_subsample2(xp[:, :, k:k + STRIDE * s_out]) for k in range(TAPS)]
        w = s_out
    else:
        taps = [xp[:, :, k:k + s] for k in range(TAPS)]
        w = s
    t2 = jnp.concatenate(taps, axis=0).reshape(TAPS * c, r * w)
    yf = jax.lax.dot_general(
        w2v, t2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(w2v.shape[0], r, w)
    return yf + bias, t2


def _fwd_kernel(tap_mode, s_out, n_total, nblk,
                x_ref, w2_ref, aff_ref, y_ref, stats_ref):
    p = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when((p == 0) & (i == 0))
    def _zero():
        stats_ref[:] = jnp.zeros_like(stats_ref)

    bias = aff_ref[:, 0:1][:, :, None]
    yc, _ = _conv_block(x_ref[:], w2_ref[:], bias, tap_mode, s_out)
    if tap_mode == "dense":
        yc = _subsample2(yc)

    @pl.when(p == 0)
    def _acc():
        stats_ref[:, 0:1] += jnp.sum(yc, axis=(1, 2), keepdims=True)[:, :, 0]
        stats_ref[:, 1:2] += jnp.sum(yc * yc, axis=(1, 2), keepdims=True)[:, :, 0]

    @pl.when((p == 0) & (i == nblk - 1))
    def _finalize():
        mu = stats_ref[:, 0:1] / n_total
        stats_ref[:, 1:2] = stats_ref[:, 1:2] / n_total - mu * mu
        stats_ref[:, 0:1] = mu

    @pl.when(p == 1)
    def _norm():
        mu = stats_ref[:, 0:1][:, :, None]
        inv = jax.lax.rsqrt(stats_ref[:, 1:2][:, :, None] + EPS)
        gamma = aff_ref[:, 1:2][:, :, None]
        beta = aff_ref[:, 2:3][:, :, None]
        y_ref[:] = jnp.tanh(gamma * (yc - mu) * inv + beta).astype(y_ref.dtype)


def _eval_kernel(tap_mode, s_out,
                 x_ref, w2_ref, aff_ref, stats_ref, y_ref):
    bias = aff_ref[:, 0:1][:, :, None]
    yc, _ = _conv_block(x_ref[:], w2_ref[:], bias, tap_mode, s_out)
    if tap_mode == "dense":
        yc = _subsample2(yc)
    mu = stats_ref[:, 0:1][:, :, None]
    inv = jax.lax.rsqrt(stats_ref[:, 1:2][:, :, None] + EPS)
    gamma = aff_ref[:, 1:2][:, :, None]
    beta = aff_ref[:, 2:3][:, :, None]
    y_ref[:] = jnp.tanh(gamma * (yc - mu) * inv + beta).astype(y_ref.dtype)


def _bwd_kernel(s_out, n_total, nblk,
                x_ref, w2_ref, aff_ref, stats_ref, dy_ref,
                dx_ref, dw2_ref, dgb_ref, dw_acc):
    """Two-pass backward. The forward chain is recomputed from x per block
    (dense taps always — the backward needs full-width taps for dW anyway).
    Pass 0 accumulates dgamma = sum(dq*z), dbeta = sum(dq) into dgb_ref;
    pass 1 computes dyc via the batch-stat BN backward, then dx (untap of
    W2^T @ upsample(dyc)) and dW2 (upsample(dyc) @ taps^T, fp32 scratch)."""
    p = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when((p == 0) & (i == 0))
    def _zero():
        dgb_ref[:] = jnp.zeros_like(dgb_ref)
        dw_acc[:] = jnp.zeros_like(dw_acc)

    c_in, r, s = x_ref.shape
    bias = aff_ref[:, 0:1][:, :, None]
    yf, t2 = _conv_block(x_ref[:], w2_ref[:], bias, "dense", s_out)
    yc = _subsample2(yf)
    mu = stats_ref[:, 0:1][:, :, None]
    inv = jax.lax.rsqrt(stats_ref[:, 1:2][:, :, None] + EPS)
    gamma = aff_ref[:, 1:2][:, :, None]
    beta = aff_ref[:, 2:3][:, :, None]
    z = (yc - mu) * inv
    out = jnp.tanh(gamma * z + beta)
    dq = dy_ref[:].astype(jnp.float32) * (1.0 - out * out)

    @pl.when(p == 0)
    def _acc():
        dgb_ref[:, 0:1] += jnp.sum(dq * z, axis=(1, 2), keepdims=True)[:, :, 0]
        dgb_ref[:, 1:2] += jnp.sum(dq, axis=(1, 2), keepdims=True)[:, :, 0]

    @pl.when(p == 1)
    def _grads():
        s_dg = dgb_ref[:, 0:1][:, :, None]
        s_db = dgb_ref[:, 1:2][:, :, None]
        dyc = (gamma * inv) * (dq - s_db / n_total - z * (s_dg / n_total))
        # upsample by 2 (zeros at odd lanes) via interleave, no strided ops
        co = dyc.shape[0]
        u = jnp.stack([dyc, jnp.zeros_like(dyc)], axis=-1).reshape(co, r, s)
        u2 = u.reshape(co, r * s)
        dw_acc[:] += jax.lax.dot_general(
            u2, t2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dtaps = jax.lax.dot_general(
            w2_ref[:], u2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(TAPS, c_in, r, s)
        # untap: dx[j] = sum_k dtaps[k][j + PAD - k]. Written as 9 static
        # pad+slice lane shifts — `.at[...].add` is a scatter-add, which
        # Mosaic does not lower (tests/test_mosaic_lowering.py).
        dx = jnp.zeros((c_in, r, s), jnp.float32)
        for k in range(TAPS):
            off = PAD - k
            t = dtaps[k]
            if off > 0:
                t = jnp.pad(t, ((0, 0), (0, 0), (0, off)))[:, :, off:]
            elif off < 0:
                t = jnp.pad(t, ((0, 0), (0, 0), (-off, 0)))[:, :, :s]
            dx = dx + t
        dx_ref[:] = dx.astype(dx_ref.dtype)

    @pl.when((p == 1) & (i == nblk - 1))
    def _write():
        dw2_ref[:] = dw_acc[:].astype(dw2_ref.dtype)


def _pack_aff(cbias, gamma, beta):
    return jnp.stack([cbias, gamma, beta], axis=1).astype(jnp.float32)


def _shapes(x, w2):
    c_in, r_total, s = x.shape
    c_out = w2.shape[0]
    if not pgenc_fits(c_in, s):
        raise ValueError(f"pgenc kernel needs even lane width, got S={s}")
    return c_in, r_total, s, c_out, s // STRIDE


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_conv_bn_tanh_train(tap_mode: str, x: jnp.ndarray, w2: jnp.ndarray,
                             cbias: jnp.ndarray, gamma: jnp.ndarray,
                             beta: jnp.ndarray
                             ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Train-mode fused layer.

    x [C, R, S] (R rows = batch*time, S lanes), w2 [Co, 9C] with column
    k*C+ci = kernel[0, k, ci, co], cbias/gamma/beta [Co].
    Returns (y [Co, R, S//2], batch mean [Co], biased batch var [Co]);
    (mu, var) are for the caller's running-stat update and carry no gradient.
    """
    y, mu, var = _train_fwd(tap_mode, x, w2, cbias, gamma, beta)
    return y, mu, var


def _train_fwd(tap_mode, x, w2, cbias, gamma, beta):
    c_in, r_total, s, c_out, s_out = _shapes(x, w2)
    blk = _row_block(c_in, c_out, s, x.dtype.itemsize, r_total, backward=False)
    nblk = r_total // blk
    n_total = r_total * s_out
    aff = _pack_aff(cbias, gamma, beta)
    kern = functools.partial(_fwd_kernel, tap_mode, s_out, float(n_total), nblk)
    y, stats = pl.pallas_call(
        kern,
        grid=(2, nblk),
        in_specs=[
            pl.BlockSpec((c_in, blk, s), lambda p, i: (0, i, 0)),
            pl.BlockSpec((c_out, TAPS * c_in), lambda p, i: (0, 0)),
            pl.BlockSpec((c_out, 3), lambda p, i: (0, 0)),
        ],
        out_specs=[
            # pass 0 parks every step on block 0 (stays VMEM-resident across
            # the revisits, so the stats pass pays no output bandwidth);
            # pass 1 writes the real blocks
            pl.BlockSpec((c_out, blk, s_out), lambda p, i: (0, i * p, 0)),
            pl.BlockSpec((c_out, 2), lambda p, i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c_out, r_total, s_out), x.dtype),
            jax.ShapeDtypeStruct((c_out, 2), jnp.float32),
        ],
        interpret=_interpret(),
    )(x, w2, aff)
    return y, stats[:, 0], stats[:, 1]


def _train_vjp_fwd(tap_mode, x, w2, cbias, gamma, beta):
    y, mu, var = _train_fwd(tap_mode, x, w2, cbias, gamma, beta)
    return (y, mu, var), (x, w2, cbias, gamma, beta, mu, var)


def _train_vjp_bwd(tap_mode, res, cots):
    # (dmu, dvar) cotangents are zero by construction (running-stat updates
    # sit outside the differentiated graph) — ignored, see module docstring.
    dy, _, _ = cots
    x, w2, cbias, gamma, beta, mu, var = res
    c_in, r_total, s, c_out, s_out = _shapes(x, w2)
    blk = _row_block(c_in, c_out, s, x.dtype.itemsize, r_total, backward=True)
    nblk = r_total // blk
    n_total = r_total * s_out
    aff = _pack_aff(cbias, gamma, beta)
    stats = jnp.stack([mu, var], axis=1).astype(jnp.float32)
    kern = functools.partial(_bwd_kernel, s_out, float(n_total), nblk)
    dx, dw2, dgb = pl.pallas_call(
        kern,
        grid=(2, nblk),
        in_specs=[
            pl.BlockSpec((c_in, blk, s), lambda p, i: (0, i, 0)),
            pl.BlockSpec((c_out, TAPS * c_in), lambda p, i: (0, 0)),
            pl.BlockSpec((c_out, 3), lambda p, i: (0, 0)),
            pl.BlockSpec((c_out, 2), lambda p, i: (0, 0)),
            pl.BlockSpec((c_out, blk, s_out), lambda p, i: (0, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((c_in, blk, s), lambda p, i: (0, i * p, 0)),
            pl.BlockSpec((c_out, TAPS * c_in), lambda p, i: (0, 0)),
            pl.BlockSpec((c_out, 2), lambda p, i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c_in, r_total, s), x.dtype),
            jax.ShapeDtypeStruct(w2.shape, w2.dtype),
            jax.ShapeDtypeStruct((c_out, 2), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((c_out, TAPS * c_in), jnp.float32)],
        interpret=_interpret(),
    )(x, w2, aff, stats, dy)
    dgamma = dgb[:, 0].astype(gamma.dtype)
    dbeta = dgb[:, 1].astype(beta.dtype)
    # conv bias cancels in (yc - mu): gradient is identically zero
    return dx, dw2, jnp.zeros_like(cbias), dgamma, dbeta


fused_conv_bn_tanh_train.defvjp(_train_vjp_fwd, _train_vjp_bwd)


def fused_conv_bn_tanh_eval(tap_mode: str, x: jnp.ndarray, w2: jnp.ndarray,
                            cbias: jnp.ndarray, gamma: jnp.ndarray,
                            beta: jnp.ndarray, ra_mean: jnp.ndarray,
                            ra_var: jnp.ndarray) -> jnp.ndarray:
    """Inference-mode fused layer: normalize with running statistics, one
    grid pass (1 read of x + 1 write of y). Not differentiable (eval paths
    never backprop)."""
    c_in, r_total, s, c_out, s_out = _shapes(x, w2)
    blk = _row_block(c_in, c_out, s, x.dtype.itemsize, r_total, backward=False)
    aff = _pack_aff(cbias, gamma, beta)
    stats = jnp.stack([ra_mean, ra_var], axis=1).astype(jnp.float32)
    kern = functools.partial(_eval_kernel, tap_mode, s_out)
    return pl.pallas_call(
        kern,
        grid=(r_total // blk,),
        in_specs=[
            pl.BlockSpec((c_in, blk, s), lambda i: (0, i, 0)),
            pl.BlockSpec((c_out, TAPS * c_in), lambda i: (0, 0)),
            pl.BlockSpec((c_out, 3), lambda i: (0, 0)),
            pl.BlockSpec((c_out, 2), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((c_out, blk, s_out), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((c_out, r_total, s_out), x.dtype),
        interpret=_interpret(),
    )(x, w2, aff, stats)
