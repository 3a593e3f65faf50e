"""Planner tests: closed-form layer plans must match the reference's
trial-forward construction (oracle: torch layers built from the same rules)."""

import numpy as np
import torch

from maavss_tpu.models.shape_plan import (
    ConvSpec,
    frames_visual_encoder_out_hw,
    plan_phasegram_decoder,
    plan_phasegram_encoder,
    plan_stft_decoder_frames,
    plan_stft_encoder_frames,
    plan_stft_decoder_fusion,
    plan_stft_encoder_fusion,
)


def _run_torch(specs, in_ch, in_hw):
    """Execute a spec list with torch convs; return the final (C, H, W)."""
    x = torch.zeros((1, in_ch) + tuple(in_hw))
    for s in specs:
        if s.transpose:
            layer = torch.nn.ConvTranspose2d(
                s.in_ch, s.out_ch, kernel_size=s.kernel, stride=s.stride,
                padding=s.padding, output_padding=s.output_padding)
        else:
            layer = torch.nn.Conv2d(
                s.in_ch, s.out_ch, kernel_size=s.kernel, stride=s.stride,
                padding=s.padding)
        x = layer(x)
    return tuple(x.shape[1:])


def test_phasegram_encoder_default_geometry():
    # AV_Fusion_Model defaults: pgram [B,1,8,4096], latent 64, fc 4096
    specs, hw = plan_phasegram_encoder([4, 1, 8, 4096], 64, 4096)
    assert len(specs) == 10
    assert hw == (8, 4)
    assert [s.out_ch for s in specs] == [2, 4, 8, 16, 32, 64, 64, 64, 64, 64]
    assert _run_torch(specs, 1, (8, 4096)) == (64, 8, 4)
    # loop invariant from avse_model.py:432: stop when T*S*latent <= fc//2
    assert hw[0] * hw[1] * 64 <= 4096 // 2


def test_phasegram_decoder_default_geometry():
    specs, hw = plan_phasegram_decoder((8, 4), [4, 1, 8, 4096], 64)
    assert hw == (8, 4096)
    assert _run_torch(specs, 64, (8, 4)) == (1, 8, 4096)
    # output layer has no norm/activation (avse_model.py:459-461)
    assert specs[-1].norm is False and specs[-1].act is None
    assert all(s.norm for s in specs[:-1])


def test_stft_encoder_fusion_default_geometry():
    specs, hw = plan_stft_encoder_fusion([4, 2, 64, 128], (8, 4), 64)
    assert hw == (8, 4)
    assert len(specs) == 5
    assert _run_torch(specs, 2, (64, 128)) == (64, 8, 4)
    assert [s.stride for s in specs] == [(2, 2), (2, 2), (2, 2), (1, 2), (1, 2)]


def test_stft_decoder_fusion_default_geometry():
    specs, hw = plan_stft_decoder_fusion((8, 4), [4, 2, 64, 128], 64)
    assert hw == (64, 128)
    assert _run_torch(specs, 64, (8, 4)) == (2, 64, 128)


def test_frames_visual_geometry():
    # conv3d/maxpool stack: 256 -> 4 (avse_model_final.py:33-59)
    assert frames_visual_encoder_out_hw(256) == 4


def test_stft_encoder_frames_untrimmed_129():
    # frames model: untrimmed F=129 halves to 64 via first-layer padding 3
    specs, hw = plan_stft_encoder_frames([4, 2, 64, 129], (8, 16), 16)
    assert hw == (8, 16)
    assert len(specs) == 3
    assert specs[0].padding == (1, 3) and specs[1].padding == (1, 4)
    assert _run_torch(specs, 2, (64, 129)) == (16, 8, 16)


def test_stft_decoder_frames_kernel_fixup():
    # decoder reaches the odd 129 via the kernel-width-10 fix-up
    specs, hw = plan_stft_decoder_frames((8, 16), [4, 2, 64, 129], 16)
    assert hw == (64, 129)
    assert specs[-1].kernel == (3, 10)
    assert _run_torch(specs, 16, (8, 16)) == (2, 64, 129)


def test_plans_for_other_geometries():
    # fft_len=512 (F=256), num_frames=4 -> stft T=32, pgram 1024
    specs, hw = plan_phasegram_encoder([1, 1, 4, 1024], 32, 2048)
    assert _run_torch(specs, 1, (4, 1024)) == (32,) + hw
    aenc, ahw = plan_stft_encoder_fusion([1, 2, 32, 256], hw, 32)
    assert _run_torch(aenc, 2, (32, 256)) == (32,) + ahw
    adec, back = plan_stft_decoder_fusion(ahw, [1, 2, 32, 256], 32)
    assert back == (32, 256)
    assert _run_torch(adec, 32, ahw) == (2, 32, 256)
