"""Phasegram parity vs a torch oracle of utilities.py:206-228 (with the
documented spatial-only fftshift fix)."""

import numpy as np
import torch

import jax.numpy as jnp

from maavss_tpu.ops.phasegram import video_phasegram


def _torch_phasegram(frames: torch.Tensor, diff=True, cumulative=True, normalize=True):
    # oracle port of utilities.video_phasegram with fftshift restricted to the
    # spatial dims (see maavss_tpu.ops.phasegram docstring)
    frames = torch.squeeze(frames, 1)
    fft = torch.fft.fftshift(torch.fft.fft2(frames), dim=(-2, -1))
    p = torch.angle(fft)
    p_flat = torch.flatten(p, start_dim=-2, end_dim=-1)
    if cumulative:
        p_flat = torch.cumsum(p_flat, dim=-1)
        p_flat = p_flat / (2.0 * np.pi * p_flat.shape[-1])
    else:
        p_flat = (p_flat + np.pi) / (np.pi * 2.0)
    if diff:
        p_diff = torch.diff(p_flat, dim=-2)
        pad = torch.zeros_like(p_diff[:, 0:1, :])
        phasegram = torch.cat((pad, p_diff), dim=1)
    else:
        phasegram = p_flat
    phasegram = torch.unsqueeze(phasegram, 1)
    if normalize:
        phasegram = phasegram * (1 / torch.max(torch.abs(phasegram)))
    return phasegram


def _frames(b=2, t=8, h=16, w=16, seed=0):
    rng = np.random.default_rng(seed)
    # moving blob so the temporal diff is non-trivial
    y, x = np.mgrid[0:h, 0:w]
    out = np.zeros((b, 1, t, h, w), np.float32)
    for bi in range(b):
        for ti in range(t):
            cx, cy = 4 + ti + bi, 6 + ti
            out[bi, 0, ti] = np.exp(-((x - cx) ** 2 + (y - cy) ** 2) / 8.0)
    return out + 0.01 * rng.standard_normal(out.shape).astype(np.float32)


def test_phasegram_matches_torch_oracle():
    f = _frames()
    ours = np.asarray(video_phasegram(jnp.asarray(f)))
    ref = _torch_phasegram(torch.as_tensor(f)).numpy()
    assert ours.shape == ref.shape == (2, 1, 8, 256)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_phasegram_modes():
    f = jnp.asarray(_frames())
    nd = video_phasegram(f, diff=False, cumulative=False, normalize=False)
    assert nd.shape == (2, 1, 8, 256)
    # non-cumulative affine mode maps angles into [0, 1]
    assert float(jnp.min(nd)) >= 0.0 and float(jnp.max(nd)) <= 1.0


def test_phasegram_resize_shape():
    f = jnp.asarray(_frames(h=64, w=64))
    pg = video_phasegram(f, resize=(16, 16))
    assert pg.shape == (2, 1, 8, 256)


def test_phasegram_first_frame_zero():
    pg = np.asarray(video_phasegram(jnp.asarray(_frames())))
    assert np.all(pg[:, :, 0, :] == 0.0)


def test_windowed_equals_per_window():
    """phasegram_window(phasegram_cumsum(clip)[:, j:j+nf]) must equal
    video_phasegram(clip[:, j:j+nf]) exactly — the train-step hoist that
    shares overlapping windows' fft2 is a pure refactor."""
    import numpy as np
    import jax.numpy as jnp
    from maavss_tpu.ops.phasegram import (
        phasegram_cumsum, phasegram_window, video_phasegram)

    frames = jnp.asarray(
        np.random.default_rng(0).random((2, 8, 16, 16)).astype(np.float32))
    p_flat = phasegram_cumsum(frames)
    for j in range(4):
        hoisted = phasegram_window(p_flat[:, j:j + 4])
        direct = video_phasegram(frames[:, j:j + 4])
        np.testing.assert_allclose(np.asarray(hoisted), np.asarray(direct),
                                   rtol=1e-6, atol=1e-7)
