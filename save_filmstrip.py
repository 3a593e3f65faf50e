#!/usr/bin/env python
"""Render attention/video filmstrips and motion-diff overlays to images.

Entry-point parity with the reference's `save_filmstrip.py` (:44-121), over
ingested frame shards instead of live decode.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from maavss_tpu.data.frame_shards import FrameShardStore
from maavss_tpu.exp.viz import filmstrip, save_image


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", default="data/processed")
    p.add_argument("--shard", default="frames", help="frames | attn")
    p.add_argument("--num_frames", type=int, default=16)
    p.add_argument("--out", default="filmstrips")
    p.add_argument("--diff", action="store_true",
                   help="render frame-difference motion overlay")
    args = p.parse_args()
    store = FrameShardStore(os.path.join(args.data_path, args.shard))
    rng = np.random.default_rng()
    for v in range(len(store)):
        n = min(args.num_frames, store.num_frames(v))
        start = int(rng.integers(0, max(1, store.num_frames(v) - n + 1)))
        fr = store.read(v, np.arange(start, start + n)).astype(np.float32) / 255.0
        img = filmstrip(np.abs(np.diff(fr, axis=0)) if args.diff else fr)
        path = save_image(
            os.path.join(args.out, f"{store.video_ids[v]}_{args.shard}.png"),
            img, cmap="viridis")
        print(path)


if __name__ == "__main__":
    main()
