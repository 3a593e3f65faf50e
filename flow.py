#!/usr/bin/env python
"""Optical-flow demo over an ingested video's frames.

Entry-point parity with the reference's `flow.py` (OpenCV Lucas-Kanade sparse
flow visualizer, :10-50) — redesigned on-device: dense LK computed by XLA
(maavss_tpu/ops/flow.py), rendering flow-magnitude frames to PNGs.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from maavss_tpu.data.frame_shards import FrameShardStore
from maavss_tpu.ops.flow import flow_magnitude


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", default="data/processed")
    p.add_argument("--video", type=int, default=None, help="video index (random)")
    p.add_argument("--num_frames", type=int, default=16)
    p.add_argument("--out", default="flow_frames")
    args = p.parse_args()
    store = FrameShardStore(os.path.join(args.data_path, "frames"))
    rng = np.random.default_rng()
    v = args.video if args.video is not None else int(rng.integers(0, len(store)))
    n = min(args.num_frames, store.num_frames(v))
    start = int(rng.integers(0, max(1, store.num_frames(v) - n + 1)))
    frames = store.read(v, np.arange(start, start + n)).astype(np.float32) / 255.0

    import jax.numpy as jnp

    mag = np.asarray(flow_magnitude(jnp.asarray(frames)))
    os.makedirs(args.out, exist_ok=True)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    for t in range(n):
        plt.imsave(os.path.join(args.out, f"flow_{t:03d}.png"), mag[t], cmap="inferno")
    print(f"wrote {n} flow-magnitude frames for video {v} to {args.out}/")


if __name__ == "__main__":
    main()
