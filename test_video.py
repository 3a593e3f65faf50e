#!/usr/bin/env python
"""Manual probe: print clip-index geometry over the ingested stores.

Parity with the reference's scratch `test_video.py` (:17-35, VideoClips shape
prints). Automated coverage of the same math lives in tests/test_data.py.
"""

from __future__ import annotations

import argparse

from maavss_tpu.config import model_args
from maavss_tpu.data.dataset import AVDataset
from maavss_tpu.train.setup import load_stores


def main() -> None:
    cfg = model_args()
    frames, audio = load_stores(cfg)
    ds = AVDataset(cfg, frames, audio, cfg.num_frames + cfg.num_seq)
    print(f"videos: {len(frames)}  clips: {len(ds)}")
    for i in (0, len(ds) // 2, len(ds) - 1):
        v, fidx = ds.index.clip_frame_indices(i)
        ex = ds[i]
        print(f"clip {i}: video {v} frames {fidx[0]}..{fidx[-1]} "
              f"audio {ex['audio'].shape} frames {ex['frames'].shape}")


if __name__ == "__main__":
    main()
