"""Lane-folded execution of the phasegram encoder's k(1,9)/s(1,2) conv
layers — exact math, fatter lanes.

Why: the enc_v stack (shape_plan.plan_phasegram_encoder, reference
avse_model.py:427-446) spends its first half at 1..32 channels, and TPU
tiles pad the minormost (feature) dim to 128 lanes — a C=2 activation can
occupy up to 64x its logical bytes, and enc_v is the fusion step's dominant
stage at 64% HBM / 9% MXU (BASELINE.md round 3c). Folding W-positions into
the channel dim makes every tensor lane-dense:

  x [.., W, C]  -> fold f ->  x_f [.., W/f, f*C]      (free reshape:
                                                       position-major lanes)

and the stride-2 9-tap conv becomes a SHORT stride-1 conv over folded
blocks. Derivation: output w = f_out*w' + s (s in 0..f_out-1, f_out=f_in/2)
reads x[2w + j - 4] = x[f_in*w' + (2s + j - 4)], i.e. folded block w' + d,
lane slot q with f_in*d + q = 2s + j - 4. The folded kernel therefore has
width 3 for f_in >= 4 (d in -1..1) or 5 for f_in == 2 (d in -2..2), input
lanes f_in*C_in, output lanes f_out*C_out, stride 1, zero-padding |d0|
blocks per side (padded blocks are all-zero, matching the original conv's
zero padding exactly).

The folded kernel is a gather of the original [1,9,Cin,Cout] parameter
(plus a zero slot for (d,q,s) combinations that fall outside the 9 taps),
built at trace time — same param tree, gradients flow through the gather's
transpose, checkpoints interchange. FLOP cost vs the original conv is
KW*f_in/9 per layer (1.33x at f_in=4, 42x at f_in=128) — cheap next to the
padding tax while the stack sits at ~9% MXU.

Used by layers.FoldedConvStack1x9 (--pgenc_kernel fold).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def fold_lanes(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """[..., W, C] -> [..., W/f, f*C] (position-major lanes; free reshape)."""
    if f == 1:
        return x
    *lead, w, c = x.shape
    assert w % f == 0, (w, f)
    return x.reshape(*lead, w // f, f * c)


def unfold_lanes(x: jnp.ndarray, f: int, c: int) -> jnp.ndarray:
    """[..., W/f, f*C] -> [..., W, C] (inverse of fold_lanes; free)."""
    if f == 1:
        return x
    *lead, wf, fc = x.shape
    assert fc == f * c, (fc, f, c)
    return x.reshape(*lead, wf * f, c)


def _fold_geometry(f_in: int) -> Tuple[int, int]:
    """(kernel width, leftmost block offset d0) for an input fold f_in."""
    assert f_in >= 2 and f_in % 2 == 0, f_in
    return (5, -2) if f_in == 2 else (3, -1)


def fold_kernel_1x9_s2(kernel: jnp.ndarray, f_in: int) -> jnp.ndarray:
    """[1, 9, Cin, Cout] -> [1, KW, f_in*Cin, f_out*Cout] folded kernel.

    Entry (d, q, s) carries original tap j = f_in*d + q - 2s + 4 when
    0 <= j <= 8, else zero (the gather's slot 9)."""
    _, k, cin, cout = kernel.shape
    assert k == 9, kernel.shape
    kw, d0 = _fold_geometry(f_in)
    f_out = f_in // 2
    d = np.arange(kw)[:, None, None] + d0
    q = np.arange(f_in)[None, :, None]
    s = np.arange(f_out)[None, None, :]
    j = f_in * d + q - 2 * s + 4
    j = np.where((j >= 0) & (j <= 8), j, 9)  # 9 = zero slot
    k_ext = jnp.concatenate(
        [kernel[0], jnp.zeros((1, cin, cout), kernel.dtype)], axis=0)
    kf = jnp.take(k_ext, jnp.asarray(j), axis=0)  # [KW, f_in, f_out, Ci, Co]
    kf = jnp.transpose(kf, (0, 1, 3, 2, 4))       # [KW, q, Ci, s, Co]
    return kf.reshape(1, kw, f_in * cin, f_out * cout)


def folded_conv_1x9_s2(
    h: jnp.ndarray, kernel: jnp.ndarray, f_in: int
) -> jnp.ndarray:
    """Folded conv on h [B, T, W/f_in, f_in*Cin] with the ORIGINAL
    [1, 9, Cin, Cout] kernel; returns [B, T, W/f_in, (f_in/2)*Cout] ==
    fold_lanes(conv_1x9_s2(unfold(h)), f_in/2). Same block count in and out:
    the stride-2 halving is absorbed by the halved output fold."""
    kw, d0 = _fold_geometry(f_in)
    kf = fold_kernel_1x9_s2(kernel, f_in)
    return jax.lax.conv_general_dilated(
        h, kf, window_strides=(1, 1),
        padding=((0, 0), (-d0, kw - 1 + d0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def fold_geometry_minor(f_in: int, k: int, stride: int,
                        pad: int) -> Tuple[int, int]:
    """(d_min, d_max) folded-block tap offsets for a width-k stride-`stride`
    conv with symmetric zero padding `pad`, folding the minormost axis by
    f_in (output fold f_in/stride). Generalizes _fold_geometry (k=9, s=2,
    p=4): output w = f_out*w' + s reads input x[stride*w + j - pad], i.e.
    folded block w' + d, lane slot q with f_in*d + q = stride*s + j - pad."""
    assert f_in >= stride and f_in % stride == 0, (f_in, stride)
    f_out = f_in // stride
    d_min = -((pad + f_in - 1) // f_in)
    d_max = (stride * (f_out - 1) + k - 1 - pad) // f_in
    return d_min, d_max


def fold_kernel_minor(kernel: jnp.ndarray, f_in: int,
                      stride: int) -> jnp.ndarray:
    """[KH, KW, Cin, Cout] -> [KH, KWF, f_in*Cin, (f_in/stride)*Cout] folded
    kernel for the minormost (W) axis, torch symmetric padding (KW-1)//2.
    Entry (d, q, s) carries original tap j = f_in*d + q - stride*s + pad
    when 0 <= j < KW, else zero (slot KW of the extended gather)."""
    kh, kw, cin, cout = kernel.shape
    pad = (kw - 1) // 2
    f_out = f_in // stride
    d_min, d_max = fold_geometry_minor(f_in, kw, stride, pad)
    kwf = d_max - d_min + 1
    d = np.arange(kwf)[:, None, None] + d_min
    q = np.arange(f_in)[None, :, None]
    s = np.arange(f_out)[None, None, :]
    j = f_in * d + q - stride * s + pad
    j = np.where((j >= 0) & (j < kw), j, kw)  # kw = zero slot
    k_ext = jnp.concatenate(
        [kernel, jnp.zeros((kh, 1, cin, cout), kernel.dtype)], axis=1)
    kf = jnp.take(k_ext, jnp.asarray(j), axis=1)  # [KH,KWF,f_in,f_out,Ci,Co]
    kf = jnp.transpose(kf, (0, 1, 2, 4, 3, 5))    # [KH,KWF,q,Ci,s,Co]
    return kf.reshape(kh, kwf, f_in * cin, f_out * cout)


def folded_conv2d_minor(
    h: jnp.ndarray, kernel: jnp.ndarray, f_in: int,
    stride_hw: Tuple[int, int]
) -> jnp.ndarray:
    """Folded 2D conv on h [B, H, W/f_in, f_in*Cin] with the ORIGINAL
    [KH, KW, Cin, Cout] kernel (torch symmetric padding on both axes);
    returns [B, H', W/f_in, (f_in/stride_w)*Cout] ==
    fold_lanes(conv(unfold(h)), f_in/stride_w). Only the minormost axis is
    folded; H convolves normally (stride_hw[0], pad (KH-1)//2)."""
    kh, kw = kernel.shape[:2]
    st, sw = stride_hw
    pad_h = (kh - 1) // 2
    d_min, d_max = fold_geometry_minor(f_in, kw, sw, (kw - 1) // 2)
    kf = fold_kernel_minor(kernel, f_in, sw)
    return jax.lax.conv_general_dilated(
        h, kf, window_strides=(st, 1),
        padding=((pad_h, pad_h), (-d_min, d_max)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def plan_folds_minor(channel_seq: Sequence[int], widths: Sequence[int],
                     strides: Sequence[int],
                     lane_target: int = 128) -> List[int]:
    """Per-layer input folds for a general minormost-folded stack: the
    largest power-of-two f with f*C <= lane_target that divides the layer's
    input width and is a multiple of its stride (1 = no fold)."""
    folds = []
    for c, w, s in zip(channel_seq, widths, strides):
        f = max(1, lane_target // c)
        f = 1 << (f.bit_length() - 1)  # pow2 floor
        while f > 1 and (w % f or f % s or f > w):
            f //= 2
        if f % s:
            f = 1  # cannot fold below the stride
        folds.append(f)
    return folds


def plan_folds(channel_seq: Sequence[int], s0: int,
               lane_target: int = 128) -> List[int]:
    """Per-layer input folds f_i for a k(1,9)/s(1,2) stack with input widths
    s0, s0/2, ... and input channels channel_seq: the largest power-of-two
    fold with f*C <= lane_target (>= 2, and never wider than the layer's
    input)."""
    folds = []
    s = s0
    for c in channel_seq:
        f = lane_target // c
        f = 1 << max(1, (f.bit_length() - 1))  # pow2, >= 2
        while f > 2 and (s % f or f > s):
            f //= 2
        assert s % f == 0, (s, f)
        folds.append(f)
        s //= 2
    return folds
