#!/usr/bin/env python
"""Precompute DINO attention frames for every ingested video.

Entry-point parity with the reference's `save_attn_videos.py` (:37-91): runs
the frozen ViT over each video's frames and caches the attention maps —
uint8 frame shards under `<out>/attn` (replacing the per-clip JPEG cache,
av_dataset.py:251-278) so the frames-model regime (train_avse_frames.py)
trains from pure array reads.

Frames are batched through one jit-compiled ViT forward per chunk (the
reference loops frame-by-frame in Python — SURVEY.md §3.1 HOT LOOP #1).
Pass --weights dino_deitsmall8_pretrain.pth for pretrained attention;
without weights a random frozen ViT is used (announced loudly) so the
pipeline stays runnable offline.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from maavss_tpu.data.frame_shards import FrameShardStore, write_frame_shard
from maavss_tpu.ops.dino import VideoAttention, load_torch_weights
from maavss_tpu.ops.image import IMAGENET_MEAN, IMAGENET_STD


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", default="data/processed")
    p.add_argument("--out_path", default=None, help="default <data_path>/attn")
    p.add_argument("--weights", default=None,
                   help="path to dino_deitsmall8_pretrain.pth")
    p.add_argument("--chunk", type=int, default=64, help="frames per ViT batch")
    p.add_argument("--patch_size", type=int, default=8)
    p.add_argument("--autocontrast", action="store_true",
                   help="per-channel min/max contrast remap before the ViT "
                        "(reference --autocontrast, av_dataset.py:318-319; "
                        "the reference applies it AFTER ImageNet Normalize — "
                        "order preserved)")
    args = p.parse_args()

    store = FrameShardStore(os.path.join(args.data_path, "frames"))
    out = args.out_path or os.path.join(args.data_path, "attn")
    params = load_torch_weights(args.weights) if args.weights else None
    if params is None:
        print("WARNING: no --weights given; using a random frozen ViT "
              "(pipeline smoke mode, not pretrained DINO attention)")
    probe = store.read(0, np.arange(1))
    va = VideoAttention(params=params, patch_size=args.patch_size,
                        image_size=probe.shape[-1])

    import jax.numpy as jnp

    mean = np.asarray(IMAGENET_MEAN, np.float32)[:, None, None]
    std = np.asarray(IMAGENET_STD, np.float32)[:, None, None]
    for v in range(len(store)):
        vid = store.video_ids[v]
        n = store.num_frames(v)
        maps = []
        for s in range(0, n, args.chunk):
            fr = store.read(v, np.arange(s, min(s + args.chunk, n)))
            fr = fr.astype(np.float32) / 255.0
            if fr.ndim == 3:  # grayscale shard -> 3-channel ViT input
                fr = np.repeat(fr[:, None], 3, axis=1)
            else:
                fr = fr.transpose(0, 3, 1, 2)
            fr = (fr - mean) / std  # av_dataset.py:108-112 Normalize
            if args.autocontrast:
                from maavss_tpu.ops.image import autocontrast

                fr = np.asarray(autocontrast(jnp.asarray(fr)))
            maps.append(np.asarray(va(jnp.asarray(fr)))[:, 0])
        attn = np.concatenate(maps, axis=0)
        write_frame_shard(out, vid, (np.clip(attn, 0, 1) * 255).astype(np.uint8),
                          store.fps(v), source=f"attn:{vid}")
        print(f"{vid}: {attn.shape[0]} attention frames")


if __name__ == "__main__":
    main()
