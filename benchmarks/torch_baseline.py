"""Reference-equivalent PyTorch CPU baseline for the benchmark harness.

The reference publishes no numbers (BASELINE.md), so the baseline is measured:
a PyTorch implementation of the same fusion training regime — per-window
host phasegram + torch.stft preprocessing, `num_seq` sliding-window
forwards/backwards with one optimizer step (train.py:112-181 semantics) — at
the reference's default batch size, on CPU (the reference hard-pins CUDA and
cannot run its published config elsewhere; CPU is the common denominator we
can measure here).

This is an independent implementation driven by the same closed-form layer
plans (models/shape_plan.py) that our flax models use; it is NOT copied from
the reference.
"""

from __future__ import annotations

import time
from typing import Tuple

import numpy as np


def _build_torch_fusion(cfg):
    import torch
    from torch import nn

    from maavss_tpu.models.shape_plan import (
        plan_phasegram_decoder,
        plan_phasegram_encoder,
        plan_stft_decoder_fusion,
        plan_stft_encoder_fusion,
    )

    t_stft = cfg.hops_per_frame * cfg.num_frames
    stft_shape = (cfg.batch_size, 2, t_stft, cfg.fft_len // 2)
    pgram_shape = (cfg.batch_size, 1, cfg.num_frames, cfg.p_size**2)

    def stack(specs):
        layers = []
        for s in specs:
            if s.transpose:
                layers.append(nn.ConvTranspose2d(
                    s.in_ch, s.out_ch, s.kernel, stride=s.stride,
                    padding=s.padding, output_padding=s.output_padding))
            else:
                layers.append(nn.Conv2d(s.in_ch, s.out_ch, s.kernel,
                                        stride=s.stride, padding=s.padding))
            if s.norm:
                layers.append(nn.BatchNorm2d(s.out_ch))
            if s.act == "tanh":
                layers.append(nn.Tanh())
            elif s.act == "leaky_relu":
                layers.append(nn.LeakyReLU(0.3))
        return nn.Sequential(*layers)

    pg_enc, pg_hw = plan_phasegram_encoder(pgram_shape, cfg.latent_chan, cfg.fc_size)
    a_enc, a_hw = plan_stft_encoder_fusion(stft_shape, pg_hw, cfg.latent_chan)

    class Fusion(nn.Module):
        def __init__(self):
            super().__init__()
            self.stft_encoder = stack(a_enc)
            self.pg_encoder = stack(pg_enc)
            feat = 2 * cfg.latent_chan * pg_hw[1]
            self.lstm = nn.LSTM(feat, 256, bias=False, batch_first=True,
                                bidirectional=True)
            self.fc1 = nn.Linear(pg_hw[0] * 512, cfg.fc_size // 2)
            self.fc2 = nn.Linear(cfg.fc_size // 2, 512)
            self.a_fc1 = nn.Linear(512, 2 * t_stft * (cfg.fft_len // 2))
            self.v_fc1 = nn.Linear(512, cfg.num_frames * cfg.p_size**2)
            self.act = nn.LeakyReLU(0.3)

        def forward(self, x_a, x_v):
            import torch
            ea = self.stft_encoder(x_a).permute(0, 2, 1, 3)
            ev = self.pg_encoder(x_v).permute(0, 2, 1, 3)
            cat = torch.cat([ev, ea], dim=2).flatten(2)
            av, _ = self.lstm(cat)
            av = self.act(self.fc1(av.flatten(1)))
            av = self.act(self.fc2(av))
            ya = self.act(self.a_fc1(av)).reshape(x_a.shape)
            yv = self.act(self.v_fc1(av)).reshape(x_v.shape)
            return ya, yv, av

    return Fusion(), stft_shape, pgram_shape


def load_flax_fusion_params(torch_model, params, batch_stats=None) -> None:
    """Copy flax AVFusionModel weights into the torch twin, so the two start
    from IDENTICAL initialization (the head-to-head parity experiment,
    tests/test_parity_training.py).

    Layout mapping: flax conv kernels [kh,kw,in,out] -> torch [out,in,kh,kw];
    Dense kernels [in,out] -> torch [out,in]; LSTM w_i/w_h [D,4H] -> torch
    weight_ih/hh [4H,D] (gate order already torch's, models/layers.py).
    BatchNorm scale/bias/mean/var map 1:1. Known semantic deviation: flax
    updates running_var with the biased batch variance, torch with the
    unbiased one — training-mode math is identical, eval-mode differs by
    ~1/(N-1) per BN layer.
    """
    import torch
    from torch import nn

    def t(x):
        return torch.as_tensor(np.asarray(x).copy())

    def load_stack(seq, p, bs):
        ci = cti = bi = 0
        for mod in seq:
            if isinstance(mod, (nn.Conv2d, nn.ConvTranspose2d)):
                # flax auto-names per class with separate counters
                if isinstance(mod, nn.Conv2d):
                    key, ci = f"Conv_{ci}", ci + 1
                else:
                    key, cti = f"ConvTranspose_{cti}", cti + 1
                k = np.asarray(p[key]["kernel"])
                if isinstance(mod, nn.Conv2d):
                    mod.weight.copy_(t(k.transpose(3, 2, 0, 1)))
                else:  # flax ConvTranspose kernel is unflipped [kh,kw,in,out]
                    mod.weight.copy_(t(k[::-1, ::-1].transpose(2, 3, 0, 1)))
                if mod.bias is not None:
                    mod.bias.copy_(t(p[key]["bias"]))
            elif isinstance(mod, nn.BatchNorm2d):
                bn = p[f"TorchBatchNorm_{bi}"]["BatchNorm_0"]
                mod.weight.copy_(t(bn["scale"]))
                mod.bias.copy_(t(bn["bias"]))
                if bs is not None:
                    st = bs[f"TorchBatchNorm_{bi}"]["BatchNorm_0"]
                    mod.running_mean.copy_(t(st["mean"]))
                    mod.running_var.copy_(t(st["var"]))
                bi += 1

    bs = batch_stats or {}
    with torch.no_grad():
        load_stack(torch_model.stft_encoder, params["stft_encoder"],
                   bs.get("stft_encoder"))
        load_stack(torch_model.pg_encoder, params["phasegram_encoder"],
                   bs.get("phasegram_encoder"))
        lstm = params["lstm"]
        torch_model.lstm.weight_ih_l0.copy_(t(np.asarray(lstm["fwd"]["w_i"]).T))
        torch_model.lstm.weight_hh_l0.copy_(t(np.asarray(lstm["fwd"]["w_h"]).T))
        torch_model.lstm.weight_ih_l0_reverse.copy_(t(np.asarray(lstm["bwd"]["w_i"]).T))
        torch_model.lstm.weight_hh_l0_reverse.copy_(t(np.asarray(lstm["bwd"]["w_h"]).T))
        for name in ("fc1", "fc2", "a_fc1", "v_fc1"):
            lin = getattr(torch_model, name)
            lin.weight.copy_(t(np.asarray(params[name]["kernel"]).T))
            lin.bias.copy_(t(params[name]["bias"]))


def _torch_phasegram(frames):
    """frames [B,T,p,p] -> [B,1,T,p*p] (utilities.py:206-228 semantics)."""
    import torch

    fft = torch.fft.fft2(frames)
    fft = torch.fft.fftshift(fft, dim=(-2, -1))
    p = torch.angle(fft).flatten(2)
    p = torch.cumsum(p, dim=-1) / (2 * np.pi * p.shape[-1])
    d = torch.diff(p, dim=1)
    d = torch.cat([torch.zeros_like(d[:, :1]), d], dim=1)
    d = d / torch.max(torch.abs(d))
    return d.unsqueeze(1)


def measure_torch_cpu_clips_per_sec(cfg, steps: int = 3, warmup: int = 1) -> Tuple[float, int]:
    """Returns (clips/sec, batch) for the reference-equivalent fusion regime."""
    import torch

    torch.manual_seed(0)
    torch.set_num_threads(max(1, torch.get_num_threads()))
    model, stft_shape, _ = _build_torch_fusion(cfg)
    opt = torch.optim.Adam(model.parameters(), lr=cfg.learning_rate)
    mse = torch.nn.functional.mse_loss

    b = cfg.batch_size
    t_total = cfg.num_frames + cfg.num_seq
    s_total = cfg.hop * cfg.hops_per_frame * t_total
    audio = torch.randn(b, s_total)
    frames = torch.rand(b, t_total, cfg.p_size, cfg.p_size)
    window = torch.hamming_window(cfg.fft_len, periodic=False)
    a, nf, ns = cfg.hops_per_frame, cfg.num_frames, cfg.num_seq

    def one_step():
        # preprocess: STFT on host like av_dataset.stft (av_dataset.py:157-179)
        spec = torch.stft(audio, cfg.fft_len, hop_length=cfg.hop, window=window,
                          normalized=True, onesided=True, return_complex=True)
        spec = spec[:, :-1, :-1]  # trim nyquist bin + last frame
        y = torch.stack([spec.real, spec.imag], dim=1).permute(0, 1, 3, 2)
        x = y + torch.randn_like(y) * cfg.noise_scalar
        opt.zero_grad()
        for j in range(ns):
            pg = _torch_phasegram(frames[:, j:j + nf])
            xa = x[:, :, j * a:(j + nf) * a, :]
            ya = y[:, :, j * a:(j + nf) * a, :]
            yh_a, yh_v, _ = model(xa, pg)
            loss = (mse(yh_a, ya) + cfg.loss_coeff * mse(yh_v, pg)) / ns
            loss.backward()
        opt.step()

    for _ in range(warmup):
        one_step()
    t0 = time.perf_counter()
    for _ in range(steps):
        one_step()
    dt = time.perf_counter() - t0
    return b * steps / dt, b
