#!/usr/bin/env python
"""Preallocate + fill a flat attention-frame memmap over the whole dataset.

Entry-point parity with the reference's `preprocess_frames.py` — which
allocates a (2000000, 256, 256) float32 memmap and never implements the write
loop (:7-25, a stub). This version is complete: it sizes the memmap from the
actual shard metadata and fills it video by video, with a JSON index mapping
video id -> [start_frame, end_frame] (same contract shape as the audio
memmap, save_memmap.py:44-45).

Note: frame shards (save_attn_videos.py output) already serve training well;
this flat memmap is for workloads that want one contiguous mapping.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from maavss_tpu.data.frame_shards import FrameShardStore


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", default="data/processed")
    p.add_argument("--shard", default="attn", help="attn | frames")
    p.add_argument("--out", default=None, help="default <data_path>/attn_memmap")
    args = p.parse_args()
    store = FrameShardStore(os.path.join(args.data_path, args.shard))
    out = args.out or os.path.join(args.data_path, "attn_memmap")
    os.makedirs(out, exist_ok=True)

    shape0 = store.meta[store.video_ids[0]]["shape"]
    total = sum(store.num_frames(v) for v in range(len(store)))
    mm_path = os.path.join(out, "attn_memmap.memmap")
    mm = np.memmap(mm_path, dtype=np.uint8, mode="w+",
                   shape=(total, shape0[0], shape0[1]))
    index = {}
    pos = 0
    for v in range(len(store)):
        n = store.num_frames(v)
        mm[pos:pos + n] = store.read(v, np.arange(n))
        index[store.video_ids[v]] = [pos, pos + n]
        pos += n
    mm.flush()
    with open(os.path.join(out, "attn_index_map.json"), "w") as f:
        json.dump({"shape": [total, shape0[0], shape0[1]], "index": index}, f)
    print(f"wrote {mm_path}: {total} frames of {shape0}")


if __name__ == "__main__":
    main()
