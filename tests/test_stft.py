"""Golden-parity tests for the STFT frontend against torch CPU.

The reference frontend is torchaudio.functional.spectrogram
(av_dataset.py:157-179) == torch.stft(center=True, reflect, onesided) followed
by division by sqrt(sum(window^2)) when normalized.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from maavss_tpu.ops.windows import hamming_window
from maavss_tpu.ops.stft import (
    add_noise,
    istft,
    istft_features,
    normalize_stft,
    num_stft_frames,
    stft,
    stft_features,
    normalize_stft,
)
from maavss_tpu.utils.hop import calc_hop_size

SR = 16000


def _torch_ref_spectrogram(audio: np.ndarray, fft_len: int, hop: int, normalized: bool):
    """torchaudio.functional.spectrogram semantics via plain torch."""
    window = torch.hamming_window(fft_len, dtype=torch.float64)
    spec = torch.stft(
        torch.as_tensor(audio, dtype=torch.float64),
        n_fft=fft_len,
        hop_length=hop,
        win_length=fft_len,
        window=window,
        center=True,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
        return_complex=True,
    )
    if normalized:
        spec = spec / window.pow(2.0).sum().sqrt()
    return spec.numpy()  # [F, T]


def _sig(n, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / SR
    x = np.sin(2 * np.pi * 440 * t) + 0.5 * np.sin(2 * np.pi * 1330.7 * t)
    return (x + 0.1 * rng.standard_normal(n)).astype(np.float32)


@pytest.mark.parametrize("fft_len,hop", [(256, 66), (512, 66), (256, 128)])
@pytest.mark.parametrize("normalized", [True, False])
def test_stft_matches_torch(fft_len, hop, normalized):
    audio = _sig(4224)
    ref = _torch_ref_spectrogram(audio, fft_len, hop, normalized)  # [F, T]
    ours = np.asarray(stft(jnp.asarray(audio), fft_len, hop, normalized=normalized))  # [T, F]
    assert ours.shape == (ref.shape[1], ref.shape[0])
    np.testing.assert_allclose(ours.T, ref, rtol=1e-4, atol=1e-5)


def test_feature_shapes_default_config():
    # defaults: num_frames=8, a=8 -> T=64; fft 256 -> F=128 trimmed / 129 untrimmed
    hop, audio_len, n_fft_frames = calc_hop_size(8, 8, 30, 16000)
    audio = _sig(audio_len)
    f = stft_features(jnp.asarray(audio), 256, hop, trim_end=True)
    assert f.shape == (2, 64, 128)  # train.py:66 stft_shape
    f2 = stft_features(jnp.asarray(audio), 256, hop, trim_end=False)
    assert f2.shape == (2, 64, 129)  # train_avse_frames.py:67


def test_stft_batched():
    audio = np.stack([_sig(4224, s) for s in range(3)])
    batched = np.asarray(stft_features(jnp.asarray(audio), 256, 66))
    singles = np.stack([np.asarray(stft_features(jnp.asarray(a), 256, 66)) for a in audio])
    np.testing.assert_allclose(batched, singles, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("trim_end", [True, False])
@pytest.mark.parametrize("polar", [True, False])
def test_roundtrip_features(trim_end, polar):
    hop = 66
    audio = _sig(4224)
    f = stft_features(jnp.asarray(audio), 256, hop, trim_end=trim_end, polar=polar)
    rec = np.asarray(
        istft_features(f, 256, hop, trim_end=trim_end, polar=polar, length=4224)
    )
    assert rec.shape == (4224,)
    # trimmed last frame => final hop of samples is unreconstructable; compare the rest.
    # trimming the Nyquist bin also discards real signal energy at fs/2 (the test
    # signal has white noise), so the trimmed round trip is lossy by design.
    n_ok = 4224 - hop * 2
    err = np.abs(rec[:n_ok] - audio[:n_ok])
    if trim_end:
        assert err.max() < 2e-2
    else:
        assert err.max() < 1e-5


def test_exact_roundtrip_untrimmed():
    """istft is the exact inverse of stft (no trims)."""
    hop = 66
    audio = _sig(4224)
    spec = stft(jnp.asarray(audio), 256, hop)
    rec = np.asarray(istft(spec, 256, hop, length=4224))
    np.testing.assert_allclose(rec, audio, rtol=1e-4, atol=1e-5)


def test_num_frames():
    assert num_stft_frames(4224, 66) == 65


def test_normalize_and_noise():
    import jax

    f = jnp.asarray(_sig(4224))
    feats = stft_features(f, 256, 66)
    n = normalize_stft(feats)
    assert float(jnp.max(jnp.abs(n))) <= 1.0 + 1e-5
    noisy = add_noise(jax.random.PRNGKey(0), feats, 0.1)
    assert noisy.shape == feats.shape
    assert float(jnp.std(noisy - feats)) == pytest.approx(0.1, rel=0.05)
