"""DINO ViT motion-attention extractor (flax, batched, jit-compiled).

Capability parity with video_attention.py: a frozen DINO ViT-S/8 whose
last-block CLS->patch self-attention maps become the visual motion feature.
The reference runs a Python loop, one frame at a time, through torch
(`_inference`, video_attention.py:38-103 — HOT LOOP #1 in SURVEY.md §3.1);
here the whole clip is one batched forward, so every frame's ViT runs as one
big MXU matmul program.

Faithfulness notes:
- `attention_maps` reproduces the reference's *actual* output: last-block
  CLS->patch attention, nearest-upsampled by the patch size, summed over
  heads, max-normalized (video_attention.py:56,70-93).
- the reference also computes a top-`threshold` attention-mass mask and then
  discards it (video_attention.py:59-78 — dead code); `threshold_masks`
  implements it as a usable feature.
- weights: `convert_torch_checkpoint` maps the official DINO
  `dino_deitsmall8_pretrain.pth` ("teacher" key, video_attention.py:28,131)
  onto this module; positional embeddings at non-native sizes are resized
  with a TORCH-EXACT bicubic matrix (`_torch_bicubic_matrix`): the official
  interpolate_pos_encoding (dino/vision_transformer.py, imported by
  video_attention.py:18) calls F.interpolate(mode='bicubic',
  scale_factor=(hp+0.1)/grid) — cubic kernel a=-0.75, source index
  (i+0.5)*grid/(hp+0.1)-0.5, replicate-clamped taps. jax.image.resize uses
  the Keys a=-0.5 kernel and drifted ~10% on CLS features after 12 blocks
  (round-4 golden-fixture check), so the interpolation is built as a static
  [hp, grid] matrix applied as two matmuls — exact AND MXU-shaped.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

VIT_CONFIGS = {
    "vit_tiny": dict(embed_dim=192, depth=12, num_heads=3),
    "vit_small": dict(embed_dim=384, depth=12, num_heads=6),
    "vit_base": dict(embed_dim=768, depth=12, num_heads=12),
}


def _torch_bicubic_matrix(n_in: int, n_out: int) -> "np.ndarray":
    """[n_out, n_in] matrix reproducing torch F.interpolate(mode='bicubic',
    align_corners=False, scale_factor=(n_out+0.1)/n_in) exactly — DINO's
    interpolate_pos_encoding call, including its +0.1 fudge (which makes the
    source-coordinate scale 1/scale_factor = n_in/(n_out+0.1), NOT
    n_in/n_out: torch uses the *given* scale_factor in the coordinate map).
    Cubic convolution kernel a=-0.75, taps replicate-clamped at the border.
    Built once per static (hp, wp) at trace time; applied as matmuls."""

    def cubic(x: float, a: float = -0.75) -> float:
        x = abs(x)
        if x <= 1.0:
            return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0
        if x < 2.0:
            return (((x - 5.0) * x + 8.0) * x - 4.0) * a
        return 0.0

    scale = n_in / (n_out + 0.1)
    m = np.zeros((n_out, n_in), np.float64)
    for i in range(n_out):
        src = (i + 0.5) * scale - 0.5
        i0 = int(np.floor(src))
        t = src - i0
        for k, wgt in enumerate((cubic(t + 1.0), cubic(t), cubic(1.0 - t),
                                 cubic(2.0 - t))):
            m[i, min(max(i0 - 1 + k, 0), n_in - 1)] += wgt
    return m.astype(np.float32)


class Attention(nn.Module):
    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_attn: bool = False):
        b, n, d = x.shape
        h = self.num_heads
        head_dim = d // h
        qkv = nn.Dense(3 * d, use_bias=True, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, h, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ jnp.swapaxes(k, -2, -1)) * (head_dim**-0.5)
        attn = jax.nn.softmax(attn, axis=-1)  # [B, h, N, N]
        if return_attn:
            return attn
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(b, n, d)
        return nn.Dense(d, dtype=self.dtype, name="proj")(out)


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_attn: bool = False):
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        if return_attn:
            return Attention(self.dim, self.num_heads, self.dtype, name="attn")(
                y, return_attn=True)
        x = x + Attention(self.dim, self.num_heads, self.dtype, name="attn")(y)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(self.dim * self.mlp_ratio, dtype=self.dtype, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)
        return x + y


class VisionTransformer(nn.Module):
    """DINO ViT; `get_last_selfattention` returns the final block's softmax
    attention (dino vision_transformer.py semantics)."""

    patch_size: int = 8
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    pos_grid: int = 28  # pretrain grid (224/8); resized for other inputs
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.patch_embed = nn.Conv(
            self.embed_dim, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size), padding="VALID",
            dtype=self.dtype, name="patch_embed")
        self.cls_token = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, self.embed_dim))
        self.pos_embed = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, 1 + self.pos_grid**2, self.embed_dim))
        self.blocks = [
            Block(self.embed_dim, self.num_heads, dtype=self.dtype,
                  name=f"block{i}") for i in range(self.depth)
        ]
        self.norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")

    def _pos_embed_for(self, hp: int, wp: int) -> jnp.ndarray:
        """Pos-embed interpolation, bit-matching DINO's
        interpolate_pos_encoding (torch bicubic a=-0.75 with the +0.1 scale
        fudge) via static interpolation matrices — see module docstring."""
        cls_pe = self.pos_embed[:, :1]
        patch_pe = self.pos_embed[:, 1:].reshape(
            1, self.pos_grid, self.pos_grid, self.embed_dim)
        if (hp, wp) != (self.pos_grid, self.pos_grid):
            mh = jnp.asarray(_torch_bicubic_matrix(self.pos_grid, hp))
            mw = jnp.asarray(_torch_bicubic_matrix(self.pos_grid, wp))
            patch_pe = jnp.einsum("oh,bhwd->bowd", mh, patch_pe)
            patch_pe = jnp.einsum("ow,bhwd->bhod", mw, patch_pe)
        return jnp.concatenate([cls_pe, patch_pe.reshape(1, hp * wp, -1)], axis=1)

    def _prepare(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: [B, C, H, W] (torch layout) -> tokens [B, 1+N, D]
        x = jnp.moveaxis(x, 1, -1)
        hp, wp = x.shape[1] // self.patch_size, x.shape[2] // self.patch_size
        x = self.patch_embed(x).reshape(x.shape[0], hp * wp, self.embed_dim)
        cls = jnp.broadcast_to(self.cls_token, (x.shape[0], 1, self.embed_dim))
        x = jnp.concatenate([cls, x], axis=1)
        return x + self._pos_embed_for(hp, wp)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = self._prepare(x)
        for blk in self.blocks:
            x = blk(x)
        return self.norm(x)[:, 0]  # CLS feature

    def get_last_selfattention(self, x: jnp.ndarray) -> jnp.ndarray:
        x = self._prepare(x)
        for blk in self.blocks[:-1]:
            x = blk(x)
        return self.blocks[-1](x, return_attn=True)  # [B, h, 1+N, 1+N]


def cls_attention_maps(attn: jnp.ndarray, hp: int, wp: int, patch_size: int,
                       ) -> jnp.ndarray:
    """[B, h, 1+N, 1+N] -> head-summed, max-normalized CLS->patch maps
    [B, hp*ps, wp*ps] (video_attention.py:56,70-93)."""
    a = attn[:, :, 0, 1:]  # CLS -> patches, [B, h, N]
    a = a.reshape(a.shape[0], a.shape[1], hp, wp)
    a = jnp.repeat(jnp.repeat(a, patch_size, axis=-2), patch_size, axis=-1)
    out = jnp.sum(a, axis=1)
    return out / jnp.max(out, axis=(-2, -1), keepdims=True)


def threshold_masks(attn: jnp.ndarray, hp: int, wp: int, patch_size: int,
                    threshold: float = 0.6) -> jnp.ndarray:
    """Top-`threshold` attention-mass masks [B, h, hp*ps, wp*ps]
    (video_attention.py:59-78; computed-then-discarded in the reference)."""
    a = attn[:, :, 0, 1:]
    val = jnp.sort(a, axis=-1)
    val = val / jnp.sum(val, axis=-1, keepdims=True)
    cum = jnp.cumsum(val, axis=-1)
    th_sorted = cum > (1 - threshold)
    order = jnp.argsort(a, axis=-1)
    inv = jnp.argsort(order, axis=-1)
    th = jnp.take_along_axis(th_sorted, inv, axis=-1).astype(a.dtype)
    th = th.reshape(a.shape[0], a.shape[1], hp, wp)
    return jnp.repeat(jnp.repeat(th, patch_size, axis=-2), patch_size, axis=-1)


class VideoAttention:
    """Batched replacement for the reference's VideoAttention class."""

    def __init__(self, params: Optional[Any] = None, patch_size: int = 8,
                 threshold: float = 0.6, architecture: str = "vit_small",
                 rng_seed: int = 0, image_size: int = 256):
        cfg = VIT_CONFIGS[architecture]
        self.patch_size = patch_size
        self.threshold = threshold
        self.model = VisionTransformer(patch_size=patch_size, **cfg)
        if params is None:
            # random frozen features (weights file not bundled); converted
            # pretrained weights via load_torch_weights() for real runs
            dummy = jnp.zeros((1, 3, image_size, image_size))
            params = self.model.init(jax.random.PRNGKey(rng_seed), dummy)["params"]
        self.params = params

        def _attention(params, frames):
            ps = self.patch_size
            h = frames.shape[-2] - frames.shape[-2] % ps
            w = frames.shape[-1] - frames.shape[-1] % ps
            # crop to a patch multiple (video_attention.py:41-46)
            frames = frames[..., :h, :w]
            attn = self.model.apply({"params": params}, frames,
                                    method=self.model.get_last_selfattention)
            return cls_attention_maps(attn, h // ps, w // ps, ps)

        self._attention = jax.jit(_attention)

    def __call__(self, frames: jnp.ndarray) -> jnp.ndarray:
        """frames [T, 3, H, W] (or [B*T, 3, H, W]) -> attention [T, 1, H', W']."""
        return self._attention(self.params, frames)[:, None]

    _inference = __call__  # reference method-name parity


# ---------------------------------------------------------------------------
# torch checkpoint conversion
# ---------------------------------------------------------------------------

def convert_torch_checkpoint(state_dict: Dict[str, "np.ndarray"],
                             depth: int = 12) -> Dict[str, Any]:
    """Map a DINO torch state_dict (teacher backbone, torch tensor or ndarray
    values) onto VisionTransformer params."""

    def arr(key):
        v = state_dict[key]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    p: Dict[str, Any] = {
        "cls_token": arr("cls_token"),
        "pos_embed": arr("pos_embed"),
        "patch_embed": {
            # torch conv [out, in, kh, kw] -> flax [kh, kw, in, out]
            "kernel": arr("patch_embed.proj.weight").transpose(2, 3, 1, 0),
            "bias": arr("patch_embed.proj.bias"),
        },
        "norm": {"scale": arr("norm.weight"), "bias": arr("norm.bias")},
    }
    for i in range(depth):
        t = f"blocks.{i}."
        p[f"block{i}"] = {
            "norm1": {"scale": arr(t + "norm1.weight"), "bias": arr(t + "norm1.bias")},
            "norm2": {"scale": arr(t + "norm2.weight"), "bias": arr(t + "norm2.bias")},
            "attn": {
                "qkv": {"kernel": arr(t + "attn.qkv.weight").T,
                        "bias": arr(t + "attn.qkv.bias")},
                "proj": {"kernel": arr(t + "attn.proj.weight").T,
                         "bias": arr(t + "attn.proj.bias")},
            },
            "mlp_fc1": {"kernel": arr(t + "mlp.fc1.weight").T,
                        "bias": arr(t + "mlp.fc1.bias")},
            "mlp_fc2": {"kernel": arr(t + "mlp.fc2.weight").T,
                        "bias": arr(t + "mlp.fc2.bias")},
        }
    return p


def load_torch_weights(path: str, checkpoint_key: str = "teacher") -> Dict[str, Any]:
    """Load dino_deitsmall8_pretrain.pth-style weights (video_attention.py:
    106-160) and convert. Requires torch for unpickling only."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    if checkpoint_key in ckpt:
        ckpt = ckpt[checkpoint_key]
    ckpt = {k.replace("module.", "").replace("backbone.", ""): v
            for k, v in ckpt.items()}
    return convert_torch_checkpoint(ckpt)
