#!/usr/bin/env python
"""Manual probe: iterate the batch pipeline and print shapes + throughput.

Parity with the reference's scratch `video_loader_test.py` (:41-59, timestamp
reader loop). Exercises the prefetch pipeline end to end.
"""

from __future__ import annotations

import time

from maavss_tpu.config import model_args
from maavss_tpu.data.dataset import AVDataset, batches, prefetch
from maavss_tpu.train.setup import load_stores


def main() -> None:
    cfg = model_args()
    frames, audio = load_stores(cfg)
    ds = AVDataset(cfg, frames, audio, cfg.num_frames + cfg.num_seq)
    it = prefetch(batches(ds, cfg.batch_size), size=2)
    t0 = time.perf_counter()
    n = 20
    for i in range(n):
        b = next(it)
    dt = time.perf_counter() - t0
    print(f"{n} batches of {cfg.batch_size}: "
          f"{n * cfg.batch_size / dt:.1f} clips/s host pipeline; "
          f"shapes audio={b['audio'].shape} frames={b['frames'].shape}")


if __name__ == "__main__":
    main()
