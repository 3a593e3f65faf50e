#!/usr/bin/env python
"""Manual probe: AV alignment sanity — write aligned clip examples to disk.

Parity with the reference's scratch `video_loader_pts.py` (:33-63, which
muxed sanity clips to test_vids/ to verify audio/video alignment by eye/ear).
Writes each sampled clip's audio as wav + frames as a filmstrip PNG so
alignment can be inspected without a video muxer.
"""

from __future__ import annotations

import os

import numpy as np

from maavss_tpu.config import model_args
from maavss_tpu.data.dataset import AVDataset
from maavss_tpu.exp.viz import filmstrip, save_audio, save_image
from maavss_tpu.train.setup import load_stores


def main() -> None:
    cfg = model_args()
    frames, audio = load_stores(cfg)
    ds = AVDataset(cfg, frames, audio, cfg.num_frames + cfg.num_seq)
    os.makedirs("test_vids", exist_ok=True)
    rng = np.random.default_rng(cfg.seed)
    for k in range(3):
        i = int(rng.integers(0, len(ds)))
        ex = ds[i]
        save_audio(f"test_vids/example_{i}.wav", ex["audio"], cfg.samplerate)
        save_image(f"test_vids/example_{i}.png", filmstrip(ex["frames"]),
                   cmap="viridis")
        print(f"clip {i}: test_vids/example_{i}.{{wav,png}}")


if __name__ == "__main__":
    main()
