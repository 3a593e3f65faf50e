"""DINO ViT port tests: value parity of the attention path against an
independent functional torch oracle consuming the same (torch-format)
state_dict, plus the attention-map/threshold extraction semantics
(video_attention.py:38-103)."""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from maavss_tpu.ops.dino import (
    VideoAttention,
    VisionTransformer,
    cls_attention_maps,
    convert_torch_checkpoint,
    threshold_masks,
)

DIM, HEADS, DEPTH, PATCH, GRID = 32, 4, 3, 4, 4  # input 16x16 -> 4x4 patches


def random_state_dict(seed=0):
    rng = np.random.default_rng(seed)

    def t(*shape):
        return torch.as_tensor(rng.standard_normal(shape).astype(np.float32) * 0.05)

    sd = {
        "cls_token": t(1, 1, DIM),
        "pos_embed": t(1, 1 + GRID * GRID, DIM),
        "patch_embed.proj.weight": t(DIM, 3, PATCH, PATCH),
        "patch_embed.proj.bias": t(DIM),
        "norm.weight": torch.ones(DIM), "norm.bias": torch.zeros(DIM),
    }
    for i in range(DEPTH):
        p = f"blocks.{i}."
        sd[p + "norm1.weight"] = torch.ones(DIM)
        sd[p + "norm1.bias"] = torch.zeros(DIM)
        sd[p + "norm2.weight"] = torch.ones(DIM)
        sd[p + "norm2.bias"] = torch.zeros(DIM)
        sd[p + "attn.qkv.weight"] = t(3 * DIM, DIM)
        sd[p + "attn.qkv.bias"] = t(3 * DIM)
        sd[p + "attn.proj.weight"] = t(DIM, DIM)
        sd[p + "attn.proj.bias"] = t(DIM)
        sd[p + "mlp.fc1.weight"] = t(4 * DIM, DIM)
        sd[p + "mlp.fc1.bias"] = t(4 * DIM)
        sd[p + "mlp.fc2.weight"] = t(DIM, 4 * DIM)
        sd[p + "mlp.fc2.bias"] = t(DIM)
    return sd


def torch_last_selfattention(sd, x):
    """Functional DINO-ViT forward (independent oracle)."""
    with torch.no_grad():
        x = F.conv2d(x, sd["patch_embed.proj.weight"],
                     sd["patch_embed.proj.bias"], stride=PATCH)
        b, d, hp, wp = x.shape
        x = x.flatten(2).transpose(1, 2)  # [B, N, D]
        cls = sd["cls_token"].expand(b, -1, -1)
        x = torch.cat([cls, x], dim=1) + sd["pos_embed"]
        for i in range(DEPTH):
            p = f"blocks.{i}."
            y = F.layer_norm(x, (DIM,), sd[p + "norm1.weight"],
                             sd[p + "norm1.bias"], eps=1e-6)
            qkv = F.linear(y, sd[p + "attn.qkv.weight"], sd[p + "attn.qkv.bias"])
            n = y.shape[1]
            qkv = qkv.reshape(b, n, 3, HEADS, DIM // HEADS).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = (q @ k.transpose(-2, -1)) / math.sqrt(DIM // HEADS)
            attn = attn.softmax(dim=-1)
            if i == DEPTH - 1:
                return attn
            out = (attn @ v).transpose(1, 2).reshape(b, n, d)
            x = x + F.linear(out, sd[p + "attn.proj.weight"], sd[p + "attn.proj.bias"])
            y = F.layer_norm(x, (DIM,), sd[p + "norm2.weight"],
                             sd[p + "norm2.bias"], eps=1e-6)
            y = F.linear(y, sd[p + "mlp.fc1.weight"], sd[p + "mlp.fc1.bias"])
            y = F.gelu(y)
            x = x + F.linear(y, sd[p + "mlp.fc2.weight"], sd[p + "mlp.fc2.bias"])


@pytest.fixture(scope="module")
def converted():
    sd = random_state_dict()
    params = convert_torch_checkpoint(sd, depth=DEPTH)
    model = VisionTransformer(patch_size=PATCH, embed_dim=DIM, depth=DEPTH,
                              num_heads=HEADS, pos_grid=GRID)
    return sd, params, model


def test_last_selfattention_matches_torch(converted):
    sd, params, model = converted
    x = np.random.default_rng(1).standard_normal((2, 3, 16, 16)).astype(np.float32)
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(x),
                                  method=model.get_last_selfattention))
    ref = torch_last_selfattention(sd, torch.as_tensor(x)).numpy()
    assert ours.shape == ref.shape == (2, HEADS, 17, 17)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_cls_feature_runs(converted):
    _, params, model = converted
    x = jnp.zeros((2, 3, 16, 16))
    feats = model.apply({"params": params}, x)
    assert feats.shape == (2, DIM)


def test_attention_maps_semantics(converted):
    sd, params, model = converted
    x = np.random.default_rng(2).standard_normal((3, 3, 16, 16)).astype(np.float32)
    attn = model.apply({"params": params}, jnp.asarray(x),
                       method=model.get_last_selfattention)
    maps = np.asarray(cls_attention_maps(attn, GRID, GRID, PATCH))
    assert maps.shape == (3, 16, 16)
    # max-normalized per frame (video_attention.py:92-93)
    np.testing.assert_allclose(maps.max(axis=(-2, -1)), 1.0, rtol=1e-6)
    # nearest upsample: constant within each patch cell
    cell = maps[:, :PATCH, :PATCH]
    assert np.allclose(cell, cell[:, :1, :1])


def test_threshold_masks_mass(converted):
    sd, params, model = converted
    x = np.random.default_rng(3).standard_normal((1, 3, 16, 16)).astype(np.float32)
    attn = model.apply({"params": params}, jnp.asarray(x),
                       method=model.get_last_selfattention)
    th = np.asarray(threshold_masks(attn, GRID, GRID, PATCH, threshold=0.6))
    assert th.shape == (1, HEADS, 16, 16)
    a = np.asarray(attn[:, :, 0, 1:])  # CLS->patch
    a = a / a.sum(-1, keepdims=True)
    mask_patch = th[:, :, ::PATCH, ::PATCH].reshape(1, HEADS, -1)
    kept_mass = (a * mask_patch).sum(-1)
    # kept mass >= threshold, and minimal (dropping any kept patch goes under)
    assert np.all(kept_mass >= 0.6 - 1e-5)


def test_video_attention_batched_interface():
    va = VideoAttention(patch_size=PATCH, architecture="vit_tiny", image_size=16)
    frames = jnp.asarray(
        np.random.default_rng(4).standard_normal((5, 3, 18, 18)).astype(np.float32))
    out = va(frames)  # crops 18 -> 16 (patch multiple), video_attention.py:41-46
    assert out.shape == (5, 1, 16, 16)
    assert np.allclose(np.asarray(out).max(axis=(-2, -1)), 1.0, rtol=1e-5)
