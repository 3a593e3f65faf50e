"""Legacy raw-FFT frontend tests: round trips + torch-oracle parity for the
fft/center_fft math (generator.py:60-133)."""

import numpy as np
import torch

import jax.numpy as jnp

from maavss_tpu.ops.fft_legacy import (
    center_fft_bins,
    complex_to_ri,
    decenter_fft_bins,
    fft_half,
    ifft_half,
    inference_to_audio,
    process_fft,
    ri_to_complex,
)


def test_fft_half_matches_torch():
    x = np.random.default_rng(0).standard_normal((2, 256)).astype(np.float32)
    ours = np.asarray(fft_half(jnp.asarray(x), normalize=True))
    ref = torch.fft.fft(torch.as_tensor(x), dim=-1, norm="forward")
    ref = ref[:, : ref.shape[-1] // 2].numpy()  # generator.py:66-68
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)


def test_ifft_zero_mirror_matches_torch():
    x = np.random.default_rng(1).standard_normal((2, 128)).astype(np.float32)
    f = fft_half(jnp.asarray(x), normalize=True)
    ours = np.asarray(ifft_half(f, normalize=True))
    tf = torch.as_tensor(np.asarray(f))
    full = torch.cat([tf, torch.zeros_like(tf)], -1)  # generator.py:70-75
    ref = torch.real(torch.fft.ifft(full, dim=-1, norm="forward")).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)


def test_center_fft_roundtrip_and_torch_oracle():
    ri = np.random.default_rng(2).standard_normal((2, 2, 64)).astype(np.float32)
    centered = np.asarray(center_fft_bins(jnp.asarray(ri)))
    # torch oracle (generator.py:117-124)
    t = torch.as_tensor(ri)
    left = torch.flip(t[:, :, ::2], [-1])
    right = t[:, :, 1::2]
    ref = torch.cat([left, right], -1).numpy()
    np.testing.assert_allclose(centered, ref)
    back = np.asarray(decenter_fft_bins(jnp.asarray(centered)))
    np.testing.assert_allclose(back, ri)


def test_process_inference_roundtrip():
    x = np.random.default_rng(3).standard_normal((3, 256)).astype(np.float32)
    for polar in (False, True):
        feats = process_fft(jnp.asarray(x), normalize=True, polar=polar, center=True)
        assert feats.shape == (3, 2, 128)
        y = np.asarray(inference_to_audio(feats, normalize=True, polar=polar,
                                          center=True))
        # mirror half dropped to zeros -> reconstruction is low-passed, not
        # exact; verify the retained half of the spectrum survives intact
        f_orig = np.asarray(fft_half(jnp.asarray(x)))
        f_rec = np.asarray(fft_half(jnp.asarray(2.0 * y)))
        # skip DC: real(y) halves every bin except k=0, where the conjugate
        # of the zeroed mirror does not cancel (factor-2 at DC is inherent to
        # the reference's zero-mirror ifft, generator.py:70-75)
        np.testing.assert_allclose(f_rec.real[..., 1:], f_orig.real[..., 1:], atol=2e-3)


def test_ri_complex_roundtrip():
    c = (np.random.default_rng(4).standard_normal((2, 32))
         + 1j * np.random.default_rng(5).standard_normal((2, 32))).astype(np.complex64)
    ri = complex_to_ri(jnp.asarray(c))
    back = np.asarray(ri_to_complex(ri))
    np.testing.assert_allclose(back, c, rtol=1e-6)
