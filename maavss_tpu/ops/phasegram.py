"""Phasegram: compact spectral-phase motion representation.

Per attention frame: 2D FFT -> fftshift -> phase angle -> flatten spatial ->
cumulative-sum normalize -> temporal difference -> global max-abs normalize,
emitting `[B, 1, T, p_size*p_size]` (reference: utilities.py:206-228). This is
the motion feature consumed by AV_Fusion_Model's visual branch.

TPU-first: fully batched jnp (one fused fft2 over [B*T] frames — the reference
computes this inside the Python train loop per window, train.py:139).

Documented deviation: the reference calls `torch.fft.fftshift(fft)` with no
dim argument, which circularly rolls *every* axis — including batch and time —
silently pairing each item's phasegram with another item's audio. Since the
shift of the phase *angle* grid is the intended op, we shift only the spatial
axes. (fftshift of batch/time axes carries no information; it only permutes
examples.)
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from maavss_tpu.ops.image import resize_bilinear


@partial(jax.jit, static_argnames=("resize", "cumulative"))
def phasegram_cumsum(
    frames: jnp.ndarray,
    resize: Optional[Tuple[int, int]] = None,
    cumulative: bool = True,
) -> jnp.ndarray:
    """Per-frame half of the phasegram: frames `[B, T, H, W]` ->
    cumsum-normalized phase rows `[B, T, H*W]`.

    This is everything in `video_phasegram` up to (and excluding) the
    temporal diff — purely per-frame, so sliding windows can share it: the
    train step computes it ONCE for the whole `num_frames + num_seq` clip and
    each window applies only diff + max-norm (`phasegram_window`), instead of
    re-running fft2 on the ~num_frames/1 overlapping frames of every window
    (the reference recomputes from scratch per window, train.py:139).
    """
    if frames.ndim == 5:
        frames = jnp.squeeze(frames, 1)
    if resize is not None:
        frames = resize_bilinear(frames, resize)
    fft = jnp.fft.fft2(frames)
    fft = jnp.fft.fftshift(fft, axes=(-2, -1))
    p = jnp.angle(fft)
    p_flat = p.reshape(p.shape[:-2] + (-1,))
    if cumulative:
        p_flat = jnp.cumsum(p_flat, axis=-1)
        p_flat = p_flat / (2.0 * jnp.pi * p_flat.shape[-1])
    else:
        p_flat = (p_flat + jnp.pi) / (2.0 * jnp.pi)
    return p_flat


def phasegram_window(p_flat: jnp.ndarray, diff: bool = True,
                     normalize: bool = True) -> jnp.ndarray:
    """Finish a phasegram from cumsum rows `[B, T, S]` -> `[B, 1, T, S]`:
    temporal diff (zero-padded first frame) + global max-abs normalization.
    `video_phasegram(w) == phasegram_window(phasegram_cumsum(w))` exactly."""
    if diff:
        p_diff = jnp.diff(p_flat, axis=-2)
        pad = jnp.zeros_like(p_diff[..., 0:1, :])
        pg = jnp.concatenate([pad, p_diff], axis=-2)
    else:
        pg = p_flat
    pg = pg[..., None, :, :]
    if normalize:
        # eps guard: constant (e.g. all-zero) frames have a zero phasegram and
        # the reference's unguarded `p / torch.max(torch.abs(p))`
        # (utilities.py:227) would emit NaN; documented deviation
        pg = pg * (1.0 / jnp.maximum(jnp.max(jnp.abs(pg)), 1e-12))
    return pg


@partial(jax.jit, static_argnames=("resize", "diff", "cumulative", "normalize"))
def video_phasegram(
    frames: jnp.ndarray,
    resize: Optional[Tuple[int, int]] = None,
    diff: bool = True,
    cumulative: bool = True,
    normalize: bool = True,
) -> jnp.ndarray:
    """frames `[B, 1, T, H, W]` (or `[B, T, H, W]`) -> `[B, 1, T, H*W]`.

    Parity: utilities.py:206-228 (squeeze, resize, fft2, fftshift, angle,
    flatten, cumsum/2πN or affine [0,1], temporal diff with zero pad, global
    max-abs normalization).
    """
    if frames.ndim == 5:
        frames = jnp.squeeze(frames, 1)
    if resize is not None:
        frames = resize_bilinear(frames, resize)
    fft = jnp.fft.fft2(frames)
    fft = jnp.fft.fftshift(fft, axes=(-2, -1))
    p = jnp.angle(fft)
    p_flat = p.reshape(p.shape[:-2] + (-1,))
    if cumulative:
        p_flat = jnp.cumsum(p_flat, axis=-1)
        p_flat = p_flat / (2.0 * jnp.pi * p_flat.shape[-1])
    else:
        p_flat = (p_flat + jnp.pi) / (2.0 * jnp.pi)
    if diff:
        p_diff = jnp.diff(p_flat, axis=-2)
        pad = jnp.zeros_like(p_diff[..., 0:1, :])
        phasegram = jnp.concatenate([pad, p_diff], axis=-2)
    else:
        phasegram = p_flat
    phasegram = phasegram[..., None, :, :]  # channel dim -> [B, 1, T, HW]
    if normalize:
        # eps guard for constant frames (see phasegram_window)
        phasegram = phasegram * (1.0 / jnp.maximum(jnp.max(jnp.abs(phasegram)), 1e-12))
    return phasegram
