"""The conv-STFT execution (ops/stft.py _stft_conv, MAAVSS_STFT_IMPL=conv)
must equal the gather+rfft form: one strided MXU convolution with the
window and real-DFT basis baked into the filters — identical math up to
fp32 summation order. Covers values, torch-style center padding, frame
counts, batching, and the audio gradient (conv dgrad vs gather scatter-add).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maavss_tpu.ops.stft import (
    _stft_conv,
    frame_signal,
    hamming_window,
    num_stft_frames,
    stft,
    stft_features,
)


def _gather_spec(audio, fft_len, hop, center=True):
    w = hamming_window(fft_len, dtype=jnp.float32)
    frames = frame_signal(audio.astype(jnp.float32), fft_len, hop,
                          center=center)
    return jnp.fft.rfft(frames * w, n=fft_len, axis=-1)


@pytest.mark.parametrize("shape,fft_len,hop", [
    ((2, 4224), 512, 66),     # the product geometry (hop 66, fft 512)
    ((3, 2, 1024), 256, 64),  # extra leading dim
    ((1, 777), 128, 32),      # ragged length
])
def test_conv_stft_matches_gather(shape, fft_len, hop):
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    w = hamming_window(fft_len, dtype=jnp.float32)
    ref = _gather_spec(audio, fft_len, hop)
    got = _stft_conv(audio, fft_len, hop, w, center=True)
    assert got.shape == ref.shape
    assert got.shape[-2] == num_stft_frames(shape[-1], hop)
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4 * scale, rtol=0)


def test_conv_stft_no_center():
    rng = np.random.default_rng(1)
    audio = jnp.asarray(rng.standard_normal((2, 1024)), jnp.float32)
    w = hamming_window(256, dtype=jnp.float32)
    ref = _gather_spec(audio, 256, 64, center=False)
    got = _stft_conv(audio, 256, 64, w, center=False)
    assert got.shape == ref.shape
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4 * scale, rtol=0)


def test_env_switch_through_stft(monkeypatch):
    rng = np.random.default_rng(2)
    audio = jnp.asarray(rng.standard_normal((2, 2112)), jnp.float32)
    ref = np.asarray(stft(audio, 512, 66))
    monkeypatch.setenv("MAAVSS_STFT_IMPL", "conv")
    stft._clear_cache()  # env is read at trace time
    try:
        got = np.asarray(stft(audio, 512, 66))
    finally:
        monkeypatch.delenv("MAAVSS_STFT_IMPL")
        stft._clear_cache()
    scale = np.max(np.abs(ref))
    np.testing.assert_allclose(got, ref, atol=2e-4 * scale, rtol=0)


def test_features_and_grad_match(monkeypatch):
    """stft_features values AND d(loss)/d(audio) agree across impls — the
    training step differentiates through the STFT."""
    rng = np.random.default_rng(3)
    audio = jnp.asarray(rng.standard_normal((2, 2112)), jnp.float32)

    def loss(a):
        y = stft_features(a, 512, 66)
        return jnp.sum(y * y)

    ref_v, ref_g = jax.value_and_grad(loss)(audio)
    monkeypatch.setenv("MAAVSS_STFT_IMPL", "conv")
    stft._clear_cache()
    stft_features._clear_cache()
    try:
        got_v, got_g = jax.value_and_grad(loss)(audio)
    finally:
        monkeypatch.delenv("MAAVSS_STFT_IMPL")
        stft._clear_cache()
        stft_features._clear_cache()
    np.testing.assert_allclose(float(got_v), float(ref_v), rtol=1e-4)
    scale = float(jnp.max(jnp.abs(ref_g)))
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(ref_g),
                               atol=3e-4 * scale, rtol=0)
