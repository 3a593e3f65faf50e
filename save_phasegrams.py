#!/usr/bin/env python
"""Ingest-time phasegram precompute: frame shards -> cumsum-row shards.

The phasegram's per-frame half (2D FFT -> fftshift -> angle -> flatten ->
cumsum-normalize, ops/phasegram.phasegram_cumsum) is a deterministic function
of each attention frame, yet the reference recomputes it inside the training
loop for every window (reference train.py:139) and round 2's step computed it
once per step. This tool hoists it all the way to ingest — the same pattern
as the attention-frame cache (save_attn_videos.py ≅ reference
av_dataset.py:251-278) — writing float16 `[T, p_size^2]` rows per video into
`<data_path>/pgrams-p<p_size>/`. Train with `--pgram_cache`; the fusion step
then skips its fft2/angle/cumsum chain entirely (per-window diff + max-norm
stay on device — they are window-dependent).

Usage:
  python save_phasegrams.py --data_path data/processed --p_size 64
  python save_phasegrams.py --data_path synthetic          # fixture store
"""

from __future__ import annotations

import os

import numpy as np

from maavss_tpu.config import model_args


def build_pgram_store(data_root: str, p_size: int, batch_frames: int = 256) -> str:
    import jax.numpy as jnp

    from maavss_tpu.data.frame_shards import FrameShardStore, write_pgram_shard
    from maavss_tpu.ops.phasegram import phasegram_cumsum

    frames = FrameShardStore(os.path.join(data_root, "frames"))
    out_dir = os.path.join(data_root, f"pgrams-p{p_size}")
    for v in range(len(frames)):
        vid = frames.video_ids[v]
        t_total = frames.num_frames(v)
        rows = np.empty((t_total, p_size * p_size), np.float16)
        for lo in range(0, t_total, batch_frames):
            idx = np.arange(lo, min(lo + batch_frames, t_total))
            fr = frames.read(v, idx).astype(np.float32) / 255.0  # [t,H,W]
            resize = None if fr.shape[-1] == p_size else (p_size, p_size)
            r = phasegram_cumsum(jnp.asarray(fr)[None], resize=resize)[0]
            rows[idx] = np.asarray(r, np.float16)
        write_pgram_shard(out_dir, vid, rows, fps=frames.fps(v), p_size=p_size,
                          source=os.path.join(data_root, "frames", f"{vid}.npy"))
        print(f"pgram shard: {vid} ({t_total} frames)")
    return out_dir


def main() -> None:
    cfg = model_args()
    from maavss_tpu.train.setup import init_runtime, load_stores, resolve_data_root

    init_runtime()
    load_stores(cfg)  # builds the synthetic fixture store if requested
    out = build_pgram_store(resolve_data_root(cfg), cfg.p_size)
    print(f"pgram store ready: {out}")


if __name__ == "__main__":
    main()
