#!/usr/bin/env python
"""Probe the legacy DataGenerator: batch shapes + raw-FFT round trip.

Script equivalent of the reference's `datagen_test.ipynb` (next(gen) prints +
fft round-trip checks).

Usage: python examples/datagen_test.py --data_path synthetic
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from generator import DataGenerator, inference_to_audio  # noqa: E402
from maavss_tpu.config import model_args  # noqa: E402
from maavss_tpu.train.setup import load_stores  # noqa: E402


def main() -> None:
    cfg = model_args()
    frames, audio = load_stores(cfg)
    gen = DataGenerator(cfg, frames, audio, seed=cfg.seed).generator()
    x_fft, y_fft, fr, au = next(gen)
    print(f"x_fft {x_fft.shape}  y_fft {y_fft.shape}  "
          f"frames {fr.shape}  audio {au.shape}")
    recon = np.asarray(inference_to_audio(jnp.asarray(y_fft),
                                          normalize=cfg.normalize_fft,
                                          polar=cfg.use_polar))
    # zero-mirror ifft halves non-DC bins; compare spectra of 2*recon
    corr = np.corrcoef((2 * recon).ravel(), au.ravel())[0, 1]
    print(f"fft round-trip waveform correlation: {corr:.4f}")


if __name__ == "__main__":
    main()
