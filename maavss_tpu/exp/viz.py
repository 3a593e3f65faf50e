"""Visual/audio callback rendering.

Parity with the reference's wandb media callbacks (utilities.py:230-416:
filmstrips, STFT reconstruction panels, phasegram panels, latent grids,
waveform spectrograms, resynthesized audio). Renders to numpy arrays / PNG
files / wav files; the MetricsLogger mirrors them to wandb when enabled.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np


def _to_unit(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, np.float32)  # uint8 inputs would wrap under subtraction
    lo, hi = float(x.min()), float(x.max())
    return (x - lo) / (hi - lo) if hi > lo else np.zeros_like(x)


def filmstrip(frames: np.ndarray, max_frames: int = 16) -> np.ndarray:
    """frames [T, H, W] -> one [H, T*W] strip (utilities.py:248-286)."""
    f = np.asarray(frames)[:max_frames]
    return np.concatenate(list(_to_unit(f)), axis=-1)


def stft_pair_image(y: np.ndarray, yh: np.ndarray) -> np.ndarray:
    """Target/output STFT panels stacked vertically, log magnitude
    (utilities.py:328-356). Inputs [2, T, F] (real/imag channels)."""

    def mag(s):
        m = np.sqrt(s[0] ** 2 + s[1] ** 2)
        return _to_unit(np.log1p(100.0 * m)).T[::-1]  # freq up, time right

    return np.concatenate([mag(np.asarray(y)), mag(np.asarray(yh))], axis=0)


def phasegram_image(y_pg: np.ndarray, yh_pg: np.ndarray) -> np.ndarray:
    """Phasegram target/output panels [1, T, S] -> [2T, S] image
    (utilities.py:288-326)."""
    a = _to_unit(np.asarray(y_pg)[0])
    b = _to_unit(np.asarray(yh_pg)[0])
    return np.concatenate([a, b], axis=0)


def latent_grid(latent: np.ndarray, cols: int = 16) -> np.ndarray:
    """Flat latent [D] -> [D/cols, cols] heat grid (utilities.py:359-380)."""
    v = np.asarray(latent).reshape(-1)
    rows = int(np.ceil(len(v) / cols))
    out = np.zeros(rows * cols, v.dtype)
    out[: len(v)] = v
    return _to_unit(out.reshape(rows, cols))


def save_image(path: str, img: np.ndarray, cmap: str = "magma") -> str:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.imsave(path, np.asarray(img), cmap=cmap)
    return path


def save_audio(path: str, wav: np.ndarray, sr: int = 16000) -> str:
    from maavss_tpu.data.wavio import write_wav

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    write_wav(path, np.asarray(wav, np.float32), sr)
    return path


def reconstruction_callback(out_dir: str, step: int, y_stft: np.ndarray,
                            yh_stft: np.ndarray, audio_fn=None,
                            y_pgram: Optional[np.ndarray] = None,
                            yh_pgram: Optional[np.ndarray] = None,
                            frames: Optional[np.ndarray] = None,
                            sr: int = 16000) -> Sequence[str]:
    """Render the reference's per-cb_freq media set (train.py:170-178) to
    files under out_dir; returns written paths."""
    paths = [save_image(os.path.join(out_dir, f"stft_{step:07d}.png"),
                        stft_pair_image(y_stft, yh_stft))]
    if y_pgram is not None and yh_pgram is not None:
        paths.append(save_image(os.path.join(out_dir, f"pgram_{step:07d}.png"),
                                phasegram_image(y_pgram, yh_pgram)))
    if frames is not None:
        paths.append(save_image(os.path.join(out_dir, f"frames_{step:07d}.png"),
                                filmstrip(frames), cmap="viridis"))
    if audio_fn is not None:
        paths.append(save_audio(os.path.join(out_dir, f"audio_in_{step:07d}.wav"),
                                audio_fn(y_stft), sr))
        paths.append(save_audio(os.path.join(out_dir, f"audio_out_{step:07d}.wav"),
                                audio_fn(yh_stft), sr))
    return paths
