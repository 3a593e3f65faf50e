"""Waveform-domain ops: mono mix, resampling, compression.

Replaces the torchaudio transforms used at av_dataset.py:203-215 with pure
jnp. Resampling is a windowed-sinc polyphase filter realized as a strided
conv — it lowers to the MXU instead of torchaudio's C++ kernel.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def mono_mix(audio: jnp.ndarray) -> jnp.ndarray:
    """Multi-channel `[C, N]` -> mono `[N]` by mean (av_dataset.py:204-207:
    the reference divides by the channel count then sums)."""
    if audio.ndim > 1:
        return jnp.mean(audio, axis=0)
    return audio


def peak_normalize(audio: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """Divide by peak absolute value.

    The reference's `normalize=True` branch *multiplies* by the max
    (av_dataset.py:208-209) — a defect it never exercises (always called with
    normalize=False); we implement the intended op.
    """
    return audio / (jnp.max(jnp.abs(audio)) + eps)


def contrast(audio: jnp.ndarray, enhancement_amount: float = 75.0) -> jnp.ndarray:
    """torchaudio.functional.contrast parity (SoX contrast effect), used when
    `--compress_audio` is set (av_dataset.py:213-214)."""
    c = enhancement_amount / 750.0
    return jnp.sin(audio * (math.pi / 2.0) + c * jnp.sin(audio * 4.0 * math.pi))


def _resample_kernel(orig_freq: int, new_freq: int, lowpass_filter_width: int = 6,
                     rolloff: float = 0.99) -> np.ndarray:
    """Windowed-sinc polyphase kernel bank `[new, width]` (host-side, cached
    by jit constants). Matches torchaudio's sinc_interp_hann design."""
    gcd = math.gcd(orig_freq, new_freq)
    orig, new = orig_freq // gcd, new_freq // gcd
    base_freq = min(orig, new) * rolloff
    width = int(math.ceil(lowpass_filter_width * orig / base_freq))
    idx = np.arange(-width, width + orig, dtype=np.float64)[None, :] / orig
    t = np.arange(0, -new, -1, dtype=np.float64)[:, None] / new + idx
    t = t * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)
    window = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
    t = t * np.pi
    kernel = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t))
    kernel = kernel * window * (base_freq / orig)
    return kernel.astype(np.float32), width, orig, new


@partial(jax.jit, static_argnames=("orig_freq", "new_freq"))
def resample(audio: jnp.ndarray, orig_freq: int, new_freq: int) -> jnp.ndarray:
    """Polyphase resample `[..., N] -> [..., ceil(N*new/orig)]`.

    torchaudio.transforms.Resample equivalent (av_dataset.py:210-212), as a
    strided conv_general_dilated so XLA maps it onto the MXU.
    """
    if orig_freq == new_freq:
        return audio
    kernel, width, orig, new = _resample_kernel(orig_freq, new_freq)
    batch_shape = audio.shape[:-1]
    n = audio.shape[-1]
    x = audio.reshape((-1, 1, n))
    x = jnp.pad(x, ((0, 0), (0, 0), (width, width + orig)))
    k = jnp.asarray(kernel)[:, None, :]  # [new(out_ch), 1(in_ch), W]
    y = jax.lax.conv_general_dilated(
        x, k, window_strides=(orig,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )  # [B, new, frames]
    y = jnp.swapaxes(y, -2, -1).reshape(x.shape[0], -1)
    target_len = int(math.ceil(new * n / orig))
    return y[..., :target_len].reshape(batch_shape + (target_len,))


def audio_transforms(audio: jnp.ndarray, sr: int, target_sr: int,
                     normalize: bool = False, compress: bool = False) -> jnp.ndarray:
    """Mono mix -> optional peak normalize -> resample -> optional compression
    (pipeline parity: av_dataset.py:203-215)."""
    audio = mono_mix(audio)
    if normalize:
        audio = peak_normalize(audio)
    if sr != target_sr:
        audio = resample(audio, sr, target_sr)
    if compress:
        audio = contrast(audio)
    return audio
