"""STFT / iSTFT frontend, jit-compiled and batched.

Capability parity with the reference's torchaudio frontend
(av_dataset.py:157-201):

- hamming window, `n_fft = fft_len`, `hop = (sr/fps)/hops_per_frame`,
  center=True with reflect padding, onesided, complex output,
- "window" normalization: spectrum divided by sqrt(sum(window^2))
  (torchaudio.functional.spectrogram `normalized=True` semantics),
- feature layout `[2, T, F]` (real/imag or mag/phase channels), with the last
  time frame always dropped and the last freq bin optionally dropped
  (`trim_stft_end`, av_dataset.py:171-174),
- inverse re-pads the trimmed bin with zeros (av_dataset.py:183-184).

Deviations from the reference (documented):
- `istft` here is the *exact* inverse of `stft` (overlap-add with
  window-envelope division). The reference pairs a window-normalized forward
  with `torch.istft(normalized=True)` (1/sqrt(n_fft)), leaving a constant
  gain error of sqrt(n_fft)/||w||_2 in its round trip; we do not reproduce
  that. SI-SDR is scale-invariant so separation metrics are unaffected.
- the reference's polar iSTFT path crashes (`mag(...)` called as a function,
  av_dataset.py:190); ours implements it correctly.

Everything is pure jnp: batched over arbitrary leading dims, differentiable,
and fuses under jit. Two mathematically identical forward executions
(MAAVSS_STFT_IMPL=gather|conv|auto):

- 'gather': framing as a strided gather + XLA's FFT (the original form). The
  gather materializes a ~7.8x-expanded framed copy of the audio
  (fft_len/hop overlap) and its backward is a scatter-add.
- 'conv': ONE strided convolution on the MXU — the window and the real-DFT
  basis are baked into a [fft_len, 1, 2F] filter bank, stride = hop, audio
  reflect-padded like torch.stft. No framed copy, no scatter in the
  backward (conv dgrad), and the 512-deep contraction is systolic-array
  food instead of HBM traffic. Same values up to fp32 summation order
  (precision=HIGHEST).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from maavss_tpu.ops.windows import hamming_window


def _pallas_polar() -> bool:
    """Route the INVERSE polar conversion (polar_to_rect: cos/sin) through the
    fused Pallas kernel. Default: on for TPU backends, off elsewhere; override
    with MAAVSS_PALLAS_POLAR=0/1. Evaluated at trace time.

    The FORWARD conversion (magphase) never auto-routes to Pallas: Mosaic has
    no atan2 lowering (measured on a v5e this round — pallas_call fails with
    "Unimplemented primitive ... atan2"), so auto mode keeps the forward in
    XLA, which fuses the elementwise abs/angle into the surrounding ops
    anyway. An explicit `pallas=True` still forces the kernel (interpret mode
    / future jax versions)."""
    import os

    v = os.environ.get("MAAVSS_PALLAS_POLAR", "auto")
    if v in ("0", "1"):
        return v == "1"
    return jax.default_backend() == "tpu"


def num_stft_frames(num_samples: int, hop: int) -> int:
    """Frame count for center=True framing (torch.stft parity)."""
    return 1 + num_samples // hop


def _stft_impl() -> str:
    """Forward STFT execution: 'gather' (strided gather + XLA FFT) or 'conv'
    (one strided MXU convolution, window+DFT baked into the filters —
    identical math, see module docstring). 'auto' resolves per backend to
    the measured winner; trace-time env override MAAVSS_STFT_IMPL."""
    import os

    v = os.environ.get("MAAVSS_STFT_IMPL", "auto")
    if v in ("gather", "conv"):
        return v
    if v != "auto":
        raise ValueError(f"MAAVSS_STFT_IMPL={v!r} (auto|gather|conv)")
    # Measured on a v5e (BASELINE.md round 4f): conv-STFT lifts the fusion
    # step end-to-end 14,452 -> 14,670 clips/s/chip (+1.5%, spread 0.5%),
    # so TPU resolves to 'conv'. CPU keeps 'gather' (the rfft beats a dense
    # 512x514 matmul without an MXU to feed).
    return "conv" if jax.default_backend() == "tpu" else "gather"


def _dft_filters(window: jnp.ndarray, fft_len: int) -> jnp.ndarray:
    """[fft_len, 1, 2F] real-DFT filter bank (rfft convention:
    X[k] = sum_n x[n] exp(-2*pi*i*n*k/N)), window pre-multiplied, so
    conv(audio, filters, stride=hop) == rfft(frames * window) stacked as
    (re | im) along the feature axis."""
    import numpy as np

    f = fft_len // 2 + 1
    n = np.arange(fft_len, dtype=np.float64)[:, None]
    k = np.arange(f, dtype=np.float64)[None, :]
    ang = -2.0 * np.pi * n * k / fft_len
    basis = np.concatenate([np.cos(ang), np.sin(ang)], axis=1)  # [N, 2F]
    filt = jnp.asarray(basis, jnp.float32) * window.astype(jnp.float32)[:, None]
    return filt[:, None, :]  # [W, I=1, O=2F]


def _stft_conv(audio: jnp.ndarray, fft_len: int, hop: int,
               window: jnp.ndarray, center: bool) -> jnp.ndarray:
    """Complex STFT [..., T, F] via one strided conv (math == gather+rfft)."""
    lead = audio.shape[:-1]
    x = audio.astype(jnp.float32).reshape(-1, audio.shape[-1], 1)
    if center:
        pad = fft_len // 2
        x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
    y = jax.lax.conv_general_dilated(
        x, _dft_filters(window, fft_len), window_strides=(hop,),
        padding="VALID", dimension_numbers=("NWC", "WIO", "NWC"),
        precision=jax.lax.Precision.HIGHEST)  # [B, T, 2F]
    f = fft_len // 2 + 1
    spec = jax.lax.complex(y[..., :f], y[..., f:])
    return spec.reshape(lead + spec.shape[1:])


def frame_signal(audio: jnp.ndarray, frame_len: int, hop: int, center: bool = True) -> jnp.ndarray:
    """Slice `audio[..., samples]` into overlapping frames `[..., T, frame_len]`.

    With center=True the signal is reflect-padded by frame_len//2 on both
    sides (torch.stft default pad_mode='reflect').
    """
    if center:
        pad = frame_len // 2
        pad_width = [(0, 0)] * (audio.ndim - 1) + [(pad, pad)]
        audio = jnp.pad(audio, pad_width, mode="reflect")
        n_frames = 1 + (audio.shape[-1] - 2 * pad) // hop
    else:
        n_frames = 1 + (audio.shape[-1] - frame_len) // hop
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(frame_len)[None, :]
    return audio[..., idx]


@partial(jax.jit, static_argnames=("fft_len", "hop", "normalized", "center"))
def stft(
    audio: jnp.ndarray,
    fft_len: int,
    hop: int,
    window: Optional[jnp.ndarray] = None,
    normalized: bool = True,
    center: bool = True,
) -> jnp.ndarray:
    """Complex STFT `[..., T, F]` with F = fft_len//2 + 1 (time-major for TPU).

    `normalized=True` divides by sqrt(sum(window^2)) — torchaudio
    `spectrogram(normalized=True)` semantics used by av_dataset.py:160-168.
    """
    if window is None:
        window = hamming_window(fft_len, dtype=audio.dtype)
    if _stft_impl() == "conv":
        spec = _stft_conv(audio, fft_len, hop, window, center)
    else:
        frames = frame_signal(audio, fft_len, hop, center=center)
        frames = frames * window
        spec = jnp.fft.rfft(frames, n=fft_len, axis=-1)
    if normalized:
        spec = spec / jnp.sqrt(jnp.sum(window.astype(jnp.float32) ** 2))
    return spec


@partial(jax.jit, static_argnames=("fft_len", "hop", "normalized", "center", "length"))
def istft(
    spec: jnp.ndarray,
    fft_len: int,
    hop: int,
    window: Optional[jnp.ndarray] = None,
    normalized: bool = True,
    center: bool = True,
    length: Optional[int] = None,
) -> jnp.ndarray:
    """Exact inverse of `stft`: `[..., T, F]` complex -> `[..., samples]`.

    Overlap-add with division by the summed squared-window envelope; eps-guarded
    where the envelope vanishes. Default output length is T*hop (the full
    aligned window), so a `[2, a*num_frames, F]` feature slice resynthesizes to
    `audio_sample_len` samples.
    """
    if window is None:
        window = hamming_window(fft_len, dtype=jnp.float32)
    n_frames = spec.shape[-2]
    if normalized:
        spec = spec * jnp.sqrt(jnp.sum(window.astype(jnp.float32) ** 2))
    frames = jnp.fft.irfft(spec, n=fft_len, axis=-1)
    frames = frames * window

    out_len = (n_frames - 1) * hop + fft_len
    pos = jnp.arange(n_frames)[:, None] * hop + jnp.arange(fft_len)[None, :]  # [T, L]
    flat_pos = pos.reshape(-1)

    batch_shape = frames.shape[:-2]
    flat_frames = frames.reshape(batch_shape + (-1,))
    sig = jnp.zeros(batch_shape + (out_len,), dtype=frames.dtype)
    sig = sig.at[..., flat_pos].add(flat_frames)

    env = jnp.zeros((out_len,), dtype=jnp.float32)
    env = env.at[flat_pos].add(jnp.broadcast_to((window ** 2).astype(jnp.float32)[None, :], pos.shape).reshape(-1))
    sig = sig / jnp.maximum(env, 1e-11)

    if center:
        pad = fft_len // 2
        sig = sig[..., pad : out_len - pad]
    if length is None:
        length = n_frames * hop
    if sig.shape[-1] < length:
        pad_width = [(0, 0)] * (sig.ndim - 1) + [(0, length - sig.shape[-1])]
        sig = jnp.pad(sig, pad_width)
    return sig[..., :length]


@partial(jax.jit, static_argnames=("fft_len", "hop", "normalized", "trim_end",
                                   "polar", "pallas"))
def stft_features(
    audio: jnp.ndarray,
    fft_len: int,
    hop: int,
    normalized: bool = True,
    trim_end: bool = True,
    polar: bool = False,
    pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Audio `[..., samples]` -> features `[..., 2, T, F]`.

    Matches AV_Dataset.stft + the permute at av_dataset.py:338: the last time
    frame is always dropped; the last (Nyquist) freq bin is dropped when
    `trim_end` (av_dataset.py:171-174); channels are (real, imag), or
    (magnitude, phase) when `polar` (av_dataset.py:176-178). `pallas=True`
    forces the fused magphase kernel (a static jit arg); the default keeps
    the forward in XLA because Mosaic cannot lower atan2 (see _pallas_polar).
    """
    spec = stft(audio, fft_len, hop, normalized=normalized)  # [..., T, F+1]
    spec = spec[..., :-1, :]  # drop last time frame
    if trim_end:
        spec = spec[..., :, :-1]  # drop Nyquist bin
    if polar:
        if pallas:  # explicit opt-in only: Mosaic lacks atan2 (_pallas_polar)
            from maavss_tpu.ops.pallas_kernels import magphase

            ri = jnp.stack([jnp.real(spec), jnp.imag(spec)], axis=-3)
            return magphase(ri)
        c0, c1 = jnp.abs(spec), jnp.angle(spec)
    else:
        c0, c1 = jnp.real(spec), jnp.imag(spec)
    return jnp.stack([c0, c1], axis=-3)  # [..., 2, T, F]


@partial(jax.jit, static_argnames=("fft_len", "hop", "normalized", "trim_end",
                                   "polar", "length", "pallas"))
def istft_features(
    feats: jnp.ndarray,
    fft_len: int,
    hop: int,
    normalized: bool = True,
    trim_end: bool = True,
    polar: bool = False,
    length: Optional[int] = None,
    pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Features `[..., 2, T, F]` -> audio `[..., samples]`.

    Re-pads the trimmed Nyquist bin with zeros (av_dataset.py:183-184); polar
    features are converted via mag*exp(i*phase) (fixing the reference's broken
    polar path, av_dataset.py:190), through the fused Pallas kernel when
    `pallas` (None = auto, like stft_features).
    """
    if polar and (pallas if pallas is not None else _pallas_polar()):
        feats = polar_to_rect_features(feats)
        polar = False
    c0 = feats[..., 0, :, :]
    c1 = feats[..., 1, :, :]
    if polar:
        spec = c0.astype(jnp.complex64) * jnp.exp(1j * c1.astype(jnp.complex64))
    else:
        spec = c0 + 1j * c1
    if trim_end:
        pad_width = [(0, 0)] * (spec.ndim - 1) + [(0, 1)]
        spec = jnp.pad(spec, pad_width)
    return istft(spec, fft_len, hop, normalized=normalized, length=length)


def polar_to_rect_features(feats: jnp.ndarray) -> jnp.ndarray:
    """(mag, phase) channels -> (re, im), via the fused Pallas kernel."""
    from maavss_tpu.ops.pallas_kernels import polar_to_rect

    return polar_to_rect(feats)


def normalize_stft(feats: jnp.ndarray) -> jnp.ndarray:
    """Global max-abs normalization of an STFT feature tensor.

    Parity: `y_stft *= 1/torch.max(torch.abs(y_stft) + 1e-7)`
    (av_dataset.py:339-340) — note the epsilon sits *inside* the max.
    """
    return feats * (1.0 / jnp.max(jnp.abs(feats) + 1e-7))


def add_noise(key: jax.Array, x: jnp.ndarray, noise_std: float) -> jnp.ndarray:
    """Denoising objective input: x + N(0, std^2) (av_dataset.py:217-220).

    The reference mutates global torch RNG; here the PRNG key is explicit.
    """
    return x + jax.random.normal(key, x.shape, dtype=x.dtype) * noise_std
