#!/usr/bin/env python
"""Legacy data generator: random AV windows with a full-clip FFT frontend.

Entry-point parity with the reference's `generator.py` (`DataGenerator`,
:12-336): an infinite batch generator drawing random `num_frames` windows from
random videos, pairing them with the aligned audio span, and exposing the
raw-FFT feature pipeline (fft/ifft with mirrored-half drop, real/imag or polar
channels, optional center_fft bin interleave, inference_to_audio resynthesis).

Redesigned for the TPU data plane: videos come from ingested frame shards +
the audio memmap (no per-item libav decode, no infinite retry loop on corrupt
files — ingest already quarantined those), and the FFT math is batched jnp
(maavss_tpu/ops/fft_legacy.py) usable inside jit. Used by `main.py`.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np

from maavss_tpu.config import RunConfig
from maavss_tpu.data.audio_memmap import AudioMemmap
from maavss_tpu.data.frame_shards import FrameShardStore
from maavss_tpu.ops.fft_legacy import (  # noqa: F401  (public API parity)
    center_fft_bins,
    complex_to_ri,
    decenter_fft_bins,
    fft_half,
    ifft_half,
    inference_to_audio,
    polar_to_cartesian,
    process_fft,
    ri_to_complex,
)


class DataGenerator:
    def __init__(self, cfg: RunConfig, frames: FrameShardStore, audio: AudioMemmap,
                 seed: int = 0):
        self.cfg = cfg
        self.frames = frames
        self.audio = audio
        self._rng = np.random.default_rng(seed)
        self.samples_per_window = cfg.hop * cfg.hops_per_frame * cfg.num_frames

    def _example(self) -> Tuple[np.ndarray, np.ndarray]:
        """(frames [T,H,W] float32, audio [S] float32), randomly windowed
        (generator.py:296-316 semantics, decode-free)."""
        cfg = self.cfg
        v = int(self._rng.integers(0, len(self.frames)))
        n = self.frames.num_frames(v)
        if n < cfg.num_frames:
            raise ValueError(f"video {v} shorter than num_frames")
        start = int(self._rng.integers(0, n - cfg.num_frames + 1))
        fr = self.frames.read(v, np.arange(start, start + cfg.num_frames))
        fr = fr.astype(np.float32) / 255.0
        a_start = int(round(start * cfg.samplerate / cfg.framerate))
        au = self.audio.read(v, a_start, self.samples_per_window)
        return fr, au

    def generator(self) -> Iterator:
        """Infinite batches: (x_fft, y_fft, frames, audio) with
        x = y + noise in feature space (generator.py:287-336).

        FFT features are [B, 2, S/2] (real/imag, or mag/phase when
        cfg.use_polar; center_fft interleave when requested via attribute).
        """
        import jax.numpy as jnp

        cfg = self.cfg
        while True:
            frs, aus = zip(*(self._example() for _ in range(cfg.batch_size)))
            frames = np.stack(frs)[:, None]  # [B,1,T,H,W]
            audio = np.stack(aus)
            y_fft = np.asarray(process_fft(jnp.asarray(audio),
                                           normalize=cfg.normalize_fft,
                                           polar=cfg.use_polar))
            noise = self._rng.normal(0, cfg.noise_scalar, y_fft.shape).astype(np.float32)
            x_fft = y_fft + noise
            yield x_fft, y_fft, frames, audio
