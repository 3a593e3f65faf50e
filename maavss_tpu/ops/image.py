"""Batched, PRNG-explicit image transforms for the video pipeline.

Replaces the per-item torchvision transform stack (av_dataset.py:108-112:
RandomResizedCrop(framesize, scale=(0.6,1.0)) + ImageNet Normalize, plus
optional autocontrast and grayscale) with jit-compiled whole-clip ops. The
crop is sampled once per clip and applied to every frame, matching
torchvision's behavior on a [T,C,H,W] tensor.

All ops run on device and fuse under jit — no PIL/opencv in the hot path.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

# ITU-R 601 luma weights, torchvision rgb_to_grayscale parity
GRAY_WEIGHTS = (0.2989, 0.587, 0.114)


def _bilinear_gather(x: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Sample `x[..., H, W]` at fractional row coords `ys` / col coords `xs`
    (separable grid), edge-clamped. Plain bilinear — NO antialiasing — which is
    what torch `interpolate(mode='bilinear', align_corners=False)` computes.
    (jax.image.resize antialiases on downscale, so it cannot be used for torch
    parity.)"""
    h_in, w_in = x.shape[-2], x.shape[-1]
    y0 = jnp.clip(jnp.floor(ys), 0, h_in - 1)
    x0 = jnp.clip(jnp.floor(xs), 0, w_in - 1)
    y1 = jnp.clip(y0 + 1, 0, h_in - 1)
    x1 = jnp.clip(x0 + 1, 0, w_in - 1)
    wy = jnp.clip(ys - y0, 0.0, 1.0).astype(x.dtype)
    wx = jnp.clip(xs - x0, 0.0, 1.0).astype(x.dtype)
    y0i, y1i = y0.astype(jnp.int32), y1.astype(jnp.int32)
    x0i, x1i = x0.astype(jnp.int32), x1.astype(jnp.int32)

    def gather(yi, xi):
        return x[..., yi, :][..., :, xi]

    top = gather(y0i, x0i) * (1 - wx) + gather(y0i, x1i) * wx
    bot = gather(y1i, x0i) * (1 - wx) + gather(y1i, x1i) * wx
    return top * (1 - wy[:, None]) + bot * wy[:, None]


@partial(jax.jit, static_argnames=("size",))
def resize_bilinear(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize of the trailing two spatial dims (half-pixel centers,
    torch `interpolate(align_corners=False)` convention, no antialias)."""
    h_out, w_out = size
    h_in, w_in = x.shape[-2], x.shape[-1]
    ys = (jnp.arange(h_out) + 0.5) * (h_in / h_out) - 0.5
    xs = (jnp.arange(w_out) + 0.5) * (w_in / w_out) - 0.5
    return _bilinear_gather(x, ys, xs)


def resize_nearest(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    out_shape = x.shape[:-2] + tuple(size)
    return jax.image.resize(x, out_shape, method="nearest")


def normalize_imagenet(x: jnp.ndarray) -> jnp.ndarray:
    """Channel-wise ImageNet normalization; channels on axis -3 ([..., C, H, W])."""
    mean = jnp.asarray(IMAGENET_MEAN, dtype=x.dtype).reshape(-1, 1, 1)
    std = jnp.asarray(IMAGENET_STD, dtype=x.dtype).reshape(-1, 1, 1)
    return (x - mean) / std


def grayscale(x: jnp.ndarray) -> jnp.ndarray:
    """RGB [..., 3, H, W] -> [..., 1, H, W] (torchvision Grayscale parity)."""
    w = jnp.asarray(GRAY_WEIGHTS, dtype=x.dtype)
    return jnp.tensordot(jnp.moveaxis(x, -3, -1), w, axes=1)[..., None, :, :]


def autocontrast(x: jnp.ndarray) -> jnp.ndarray:
    """Per-channel min/max remap to the full [0,1] range
    (torchvision.transforms.functional.autocontrast semantics)."""
    lo = jnp.min(x, axis=(-2, -1), keepdims=True)
    hi = jnp.max(x, axis=(-2, -1), keepdims=True)
    scale = jnp.where(hi > lo, 1.0 / (hi - lo), jnp.ones_like(hi))
    return jnp.where(hi > lo, (x - lo) * scale, x)


def sample_resized_crop(
    key: jax.Array,
    in_hw: Tuple[int, int],
    scale: Tuple[float, float] = (0.6, 1.0),
    ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
):
    """Sample (top, left, h, w) like torchvision RandomResizedCrop.get_params.

    torchvision retries up to 10 attempts and falls back to a center crop;
    with scale_max=1.0 and these ratios a single rejection-free draw computed
    by clamping h/w to bounds is statistically equivalent for our use, and —
    crucially for XLA — has static control flow.
    """
    h_in, w_in = in_hw
    area = h_in * w_in
    k1, k2 = jax.random.split(key)
    target_area = area * jax.random.uniform(k1, minval=scale[0], maxval=scale[1])
    log_ratio = jax.random.uniform(
        k2, minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1])
    )
    aspect = jnp.exp(log_ratio)
    w = jnp.sqrt(target_area * aspect)
    h = jnp.sqrt(target_area / aspect)
    w = jnp.clip(jnp.round(w), 1, w_in).astype(jnp.int32)
    h = jnp.clip(jnp.round(h), 1, h_in).astype(jnp.int32)
    k3, k4 = jax.random.split(k1)
    top = jax.random.randint(k3, (), 0, h_in + 1 - h)
    left = jax.random.randint(k4, (), 0, w_in + 1 - w)
    return top, left, h, w


@partial(jax.jit, static_argnames=("size", "scale"))
def random_resized_crop(
    key: jax.Array,
    clip: jnp.ndarray,
    size: int,
    scale: Tuple[float, float] = (0.6, 1.0),
) -> jnp.ndarray:
    """Clip `[..., H, W]` -> `[..., size, size]`, one crop for the whole clip.

    Dynamic crop rectangles have data-dependent shapes, which XLA cannot
    compile; instead we resize the *coordinate grid*: build the bilinear
    sample grid for the crop rectangle and gather-interpolate. Equivalent to
    crop-then-resize with half-pixel centers.
    """
    h_in, w_in = clip.shape[-2], clip.shape[-1]
    top, left, h, w = sample_resized_crop(key, (h_in, w_in), scale)
    # half-pixel-center sample positions inside the crop rectangle
    ys = (jnp.arange(size) + 0.5) * (h.astype(jnp.float32) / size) - 0.5 + top
    xs = (jnp.arange(size) + 0.5) * (w.astype(jnp.float32) / size) - 0.5 + left
    return _bilinear_gather(clip, ys, xs)
