"""On-device optical flow (dense Lucas-Kanade).

The reference's `flow.py` is an OpenCV sparse LK demo on the CPU (flow.py:
10-50, not wired into training); the north star moves motion-frame compute
on-device. This is a batched dense LK: Sobel-style spatial gradients and the
temporal difference feed per-pixel 2x2 normal equations accumulated over a
box window — all convolutions, so XLA fuses the whole thing; usable inside
the jit input pipeline as an alternative motion feature to DINO attention
(`flow_magnitude` mirrors the attention-map / phasegram roles).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def _conv2d_same(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 'same' 2D convolution of [..., H, W] with kernel [kh, kw]."""
    batch_shape = x.shape[:-2]
    h, w = x.shape[-2:]
    xx = x.reshape((-1, 1, h, w))
    kk = k[None, None].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        xx, kk, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y.reshape(batch_shape + (h, w))


SCHARR_X = jnp.array([[-3.0, 0, 3], [-10, 0, 10], [-3, 0, 3]]) / 32.0
SCHARR_Y = SCHARR_X.T


@partial(jax.jit, static_argnames=("window", "eps"))
def lucas_kanade_dense(prev: jnp.ndarray, nxt: jnp.ndarray, window: int = 15,
                       eps: float = 1e-4) -> jnp.ndarray:
    """Dense LK flow between frame pairs.

    prev/nxt [..., H, W] grayscale in [0,1] -> flow [..., 2, H, W] (dy, dx).
    Solves the windowed least-squares system [Ixx Ixy; Ixy Iyy] u = -[Ixt; Iyt]
    per pixel with Tikhonov damping `eps`.
    """
    ix = _conv2d_same(prev, SCHARR_X)
    iy = _conv2d_same(prev, SCHARR_Y)
    it = nxt - prev
    box = jnp.ones((window, window)) / (window * window)
    sxx = _conv2d_same(ix * ix, box) + eps
    syy = _conv2d_same(iy * iy, box) + eps
    sxy = _conv2d_same(ix * iy, box)
    sxt = _conv2d_same(ix * it, box)
    syt = _conv2d_same(iy * it, box)
    det = sxx * syy - sxy * sxy
    u = (-syy * sxt + sxy * syt) / det  # dx
    v = (sxy * sxt - sxx * syt) / det  # dy
    return jnp.stack([v, u], axis=-3)


@partial(jax.jit, static_argnames=("window",))
def clip_flow(frames: jnp.ndarray, window: int = 15) -> jnp.ndarray:
    """Per-clip flow: frames [..., T, H, W] -> [..., T, 2, H, W] (first frame
    zero, like the phasegram's zero-padded temporal diff, utilities.py:221)."""
    prev = frames[..., :-1, :, :]
    nxt = frames[..., 1:, :, :]
    flow = lucas_kanade_dense(prev, nxt, window=window)
    pad = jnp.zeros_like(flow[..., :1, :, :, :])
    return jnp.concatenate([pad, flow], axis=-4)


def flow_magnitude(frames: jnp.ndarray, window: int = 15,
                   normalize: bool = True) -> jnp.ndarray:
    """Motion-energy frames [..., T, H, W]: |flow| per pixel, optionally
    max-normalized per clip — a drop-in alternative to DINO attention maps."""
    fl = clip_flow(frames, window=window)
    mag = jnp.sqrt(jnp.sum(fl * fl, axis=-3) + 1e-12)
    if normalize:
        m = jnp.max(mag, axis=(-3, -2, -1), keepdims=True)
        mag = mag / jnp.maximum(m, 1e-8)
    return mag
