"""DINO real-weights hardening (round-3 VERDICT missing-item #1).

Two gates, neither needing network egress:

1. `test_golden_activations` — a committed fixture
   (tests/fixtures/dino_golden.npz) freezes the flax ViT-S/8 + converter
   outputs at the REAL architecture geometry (dim 384, 6 heads, 12 blocks,
   patch 8, pos-grid 28) on pinned-seed synthetic weights and a 64x64 input
   (which exercises the torch-exact bicubic pos-embed interpolation — the
   path where jax.image.resize had silently drifted ~10% before round 4).
   The fixture was verified at generation time against an independent torch
   oracle running DINO's exact interpolate_pos_encoding (the +0.1-fudge
   F.interpolate call of dino/vision_transformer.py, imported by the
   reference at video_attention.py:18); this test catches any converter /
   ViT / interpolation regression without the pretrained checkpoint.

2. `test_pretrained_checkpoint_parity` — SKIPPED until the environment ever
   provides `dino_deitsmall8_pretrain.pth` (path via $MAAVSS_DINO_WEIGHTS,
   default ./dino_deitsmall8_pretrain.pth; the official file, reference
   video_attention.py:106-160). When present: optional sha256 enforcement
   via $MAAVSS_DINO_SHA256, load through the product loader, and parity of
   the last-block self-attention against a torch-side forward of the same
   state_dict.
"""

import hashlib
import os

import numpy as np
import pytest

import jax.numpy as jnp

from maavss_tpu.ops.dino import (
    VisionTransformer,
    convert_torch_checkpoint,
    load_torch_weights,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "dino_golden.npz")
WEIGHTS = os.environ.get("MAAVSS_DINO_WEIGHTS", "dino_deitsmall8_pretrain.pth")


def _vit_s8_state_dict(seed=20260819):
    """The fixture's pinned-seed synthetic ViT-S/8 state_dict (torch-format
    tensors). MUST stay byte-identical to the generator — weight_probe in
    the fixture asserts it."""
    import torch

    DIM, DEPTH, PATCH, GRID = 384, 12, 8, 28
    rng = np.random.default_rng(seed)

    def t(*shape, scale=0.02):
        return torch.as_tensor(
            rng.standard_normal(shape).astype(np.float32) * scale)

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
    return sd, (DIM, 6, DEPTH, PATCH, GRID)


def test_golden_activations():
    fix = np.load(FIXTURE)
    sd, (dim, heads, depth, patch, grid) = _vit_s8_state_dict()
    assert list(fix["meta"]) == [dim, heads, depth, patch, grid]
    probe = np.concatenate([v.numpy().ravel()[:16] for v in sd.values()])
    np.testing.assert_array_equal(probe, fix["weight_probe"],
                                  err_msg="pinned-seed weights drifted — "
                                  "regenerate or fix the seed path")
    params = convert_torch_checkpoint(sd, depth=depth)
    model = VisionTransformer(patch_size=patch, embed_dim=dim, depth=depth,
                              num_heads=heads, pos_grid=grid)
    x = jnp.asarray(fix["x"])
    attn = np.asarray(model.apply({"params": params}, x,
                                  method=model.get_last_selfattention))
    feats = np.asarray(model.apply({"params": params}, x))
    np.testing.assert_allclose(attn, fix["attn"], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(feats, fix["feats"], rtol=1e-3, atol=1e-4)


@pytest.mark.skipif(not os.path.exists(WEIGHTS), reason=(
    f"pretrained DINO checkpoint not present at {WEIGHTS!r} (set "
    "$MAAVSS_DINO_WEIGHTS). Wanted: the official dino_deitsmall8_pretrain"
    ".pth (facebookresearch/dino; reference video_attention.py:106-160). "
    "Environment has zero egress — this test self-activates the moment the "
    "file ever appears."))
def test_pretrained_checkpoint_parity():
    import math

    import torch
    import torch.nn.functional as F

    want_sha = os.environ.get("MAAVSS_DINO_SHA256")
    got_sha = hashlib.sha256(open(WEIGHTS, "rb").read()).hexdigest()
    print(f"dino checkpoint sha256 = {got_sha}")
    if want_sha:
        assert got_sha == want_sha, (got_sha, want_sha)

    params = load_torch_weights(WEIGHTS)  # the product loader
    ckpt = torch.load(WEIGHTS, map_location="cpu", weights_only=True)
    if "teacher" in ckpt:
        ckpt = ckpt["teacher"]
    sd = {k.replace("module.", "").replace("backbone.", ""): v
          for k, v in ckpt.items()}
    dim = sd["cls_token"].shape[-1]
    heads, depth, patch = 6, 12, 8
    grid = int(math.isqrt(sd["pos_embed"].shape[1] - 1))

    model = VisionTransformer(patch_size=patch, embed_dim=dim, depth=depth,
                              num_heads=heads, pos_grid=grid)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32) * 0.5
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(x),
                                  method=model.get_last_selfattention))

    # independent torch-side forward of the same state_dict (the oracle from
    # tests/test_dino.py, generalized dims + DINO-exact pos interpolation)
    with torch.no_grad():
        h = F.conv2d(torch.as_tensor(x), sd["patch_embed.proj.weight"],
                     sd["patch_embed.proj.bias"], stride=patch)
        b, d, hp, wp = h.shape
        h = h.flatten(2).transpose(1, 2)
        h = torch.cat([sd["cls_token"].expand(b, -1, -1), h], dim=1)
        pe = sd["pos_embed"]
        ppe = pe[:, 1:].reshape(1, grid, grid, dim).permute(0, 3, 1, 2)
        ppe = F.interpolate(ppe, scale_factor=((hp + 0.1) / grid,
                                               (wp + 0.1) / grid),
                            mode="bicubic")
        ppe = ppe.permute(0, 2, 3, 1).reshape(1, hp * wp, dim)
        h = h + torch.cat([pe[:, :1], ppe], dim=1)
        ref = None
        for i in range(depth):
            p = f"blocks.{i}."
            y = F.layer_norm(h, (dim,), sd[p + "norm1.weight"],
                             sd[p + "norm1.bias"], eps=1e-6)
            qkv = F.linear(y, sd[p + "attn.qkv.weight"],
                           sd[p + "attn.qkv.bias"])
            n = y.shape[1]
            qkv = qkv.reshape(b, n, 3, heads, dim // heads).permute(
                2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            a = ((q @ k.transpose(-2, -1)) / math.sqrt(dim // heads)
                 ).softmax(dim=-1)
            ref = a
            out = (a @ v).transpose(1, 2).reshape(b, n, d)
            h = h + F.linear(out, sd[p + "attn.proj.weight"],
                             sd[p + "attn.proj.bias"])
            y = F.layer_norm(h, (dim,), sd[p + "norm2.weight"],
                             sd[p + "norm2.bias"], eps=1e-6)
            y = F.gelu(F.linear(y, sd[p + "mlp.fc1.weight"],
                                sd[p + "mlp.fc1.bias"]))
            h = h + F.linear(y, sd[p + "mlp.fc2.weight"],
                             sd[p + "mlp.fc2.bias"])
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-4, atol=1e-5)
