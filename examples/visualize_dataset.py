#!/usr/bin/env python
"""Dataset inspection: render one clip's frames, phasegram, and STFT panels.

Script equivalent of the reference's `visualize_dataset.ipynb` (manual
DataGenerator inspection with fft round-trip plots), over the ingested (or
synthetic) stores. Writes PNGs + wavs under --out.

Usage: python examples/visualize_dataset.py --data_path synthetic
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from maavss_tpu.config import model_args  # noqa: E402
from maavss_tpu.data.dataset import AVDataset  # noqa: E402
from maavss_tpu.exp.viz import (  # noqa: E402
    filmstrip, phasegram_image, save_audio, save_image, stft_pair_image,
)
from maavss_tpu.ops.phasegram import video_phasegram  # noqa: E402
from maavss_tpu.ops.stft import istft_features, stft_features  # noqa: E402
from maavss_tpu.train.setup import load_stores  # noqa: E402


def main() -> None:
    cfg = model_args()
    out = os.path.join(cfg.log_dir, "dataset_viz")
    frames, audio = load_stores(cfg)
    ds = AVDataset(cfg, frames, audio, cfg.num_frames + cfg.num_seq)
    ex = ds[int(np.random.default_rng(cfg.seed).integers(0, len(ds)))]

    save_image(os.path.join(out, "frames.png"), filmstrip(ex["frames"]),
               cmap="viridis")
    pg = video_phasegram(jnp.asarray(ex["frames"][None], jnp.float32) / 255.0,
                         resize=(cfg.p_size, cfg.p_size))
    save_image(os.path.join(out, "phasegram.png"),
               phasegram_image(np.asarray(pg[0]), np.asarray(pg[0])))

    feats = stft_features(jnp.asarray(ex["audio"][None]), cfg.fft_len, cfg.hop)
    recon = istft_features(feats, cfg.fft_len, cfg.hop,
                           length=ex["audio"].shape[0])
    save_image(os.path.join(out, "stft_roundtrip.png"),
               stft_pair_image(np.asarray(feats[0]), np.asarray(feats[0])))
    save_audio(os.path.join(out, "clip.wav"), ex["audio"], cfg.samplerate)
    save_audio(os.path.join(out, "clip_roundtrip.wav"), np.asarray(recon[0]),
               cfg.samplerate)
    err = float(np.mean((np.asarray(recon[0]) - ex["audio"]) ** 2))
    print(f"wrote {out}/ (roundtrip mse {err:.3e})")


if __name__ == "__main__":
    main()
