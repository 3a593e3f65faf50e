"""AVFusionModelConv — the conv-experiment snapshot variant.

Capability parity with `avse_model_conv.py` (same classes as avse_model.py
with: bias-free convs, (3,9)/(1,9) kernels with (1,4)/(0,4) padding, the
fusion FC sized to `latent_channels * t * s` so the fused vector reshapes
directly into the latent grids, and a forward that routes the fused latent
through BOTH AE *decoders* instead of linear heads
(avse_model_conv.py:436,495-498,515-517,551-554,584-588,621-629,700-717).
The reference file is not imported by any train script — an experiment
snapshot — but it is part of the capability surface (SURVEY.md §2.1).

The (3,9)p(1,4) / (5,5)p(2,2) kernel families are shape-equivalent, so the
closed-form planners are reused with per-spec kernel rewrites.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from maavss_tpu.models.layers import BiLSTM, ConvStack
from maavss_tpu.models.shape_plan import (
    ConvSpec,
    plan_phasegram_decoder,
    plan_phasegram_encoder,
    plan_stft_decoder_fusion,
    plan_stft_encoder_fusion,
)


def _conv_kernels(specs, kernel, padding):
    return tuple(
        dataclasses.replace(s, kernel=kernel, padding=padding) for s in specs
    )


class AVFusionModelConv(nn.Module):
    stft_shape: Sequence[int]  # [B, 2, T_stft, F]
    pgram_shape: Sequence[int]  # [B, 1, T_frames, p_size^2]
    latent_channels: int = 64
    fc_size: int = 4096
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        pg_enc, pg_hw = plan_phasegram_encoder(
            self.pgram_shape, self.latent_channels, self.fc_size)
        pg_dec, _ = plan_phasegram_decoder(pg_hw, self.pgram_shape,
                                           self.latent_channels)
        a_enc, a_hw = plan_stft_encoder_fusion(self.stft_shape, pg_hw,
                                               self.latent_channels)
        a_dec, _ = plan_stft_decoder_fusion(a_hw, self.stft_shape,
                                            self.latent_channels)
        self.latent_hw = pg_hw

        # conv-variant kernels; geometry is identical (see module docstring)
        a_enc = _conv_kernels(a_enc, (3, 9), (1, 4))
        a_dec = _conv_kernels(a_dec, (3, 9), (1, 4))

        self.phasegram_encoder = ConvStack(tuple(pg_enc), dtype=self.dtype,
                                           use_bias=False)
        self.phasegram_decoder = ConvStack(tuple(pg_dec), dtype=self.dtype,
                                           use_bias=False)
        self.stft_encoder = ConvStack(a_enc, dtype=self.dtype, use_bias=False)
        self.stft_decoder = ConvStack(a_dec, dtype=self.dtype, use_bias=False)

        self.lstm = BiLSTM(256, use_bias=False, dtype=self.dtype)
        t, s = pg_hw
        fc2_out = self.latent_channels * t * s  # avse_model_conv.py:515-517
        self.fc1 = nn.Dense(self.fc_size // 2, dtype=self.dtype)
        self.fc2 = nn.Dense(fc2_out, dtype=self.dtype)

    def init_all(self, x_a: jnp.ndarray, x_v: jnp.ndarray):
        return self(x_a, x_v)

    def audio_ae_forward(self, x_a: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return self.stft_decoder(self.stft_encoder(x_a, train), train)

    def visual_ae_forward(self, x_v: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return self.phasegram_decoder(self.phasegram_encoder(x_v, train), train)

    def __call__(self, x_a: jnp.ndarray, x_v: jnp.ndarray, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Fused latent reshaped into both latent grids and decoded through
        the AE decoders (avse_model_conv.py:700-717)."""
        x_a_enc = self.stft_encoder(x_a, train)
        x_v_enc = self.phasegram_encoder(x_v, train)
        xv = jnp.transpose(x_v_enc, (0, 2, 1, 3))
        xa = jnp.transpose(x_a_enc, (0, 2, 1, 3))
        cat = jnp.concatenate([xv, xa], axis=2)
        cat = cat.reshape(cat.shape[0], cat.shape[1], -1)
        av = self.lstm(cat)
        av = av.reshape(av.shape[0], -1)
        av = nn.leaky_relu(self.fc1(av), negative_slope=0.3)
        fused = nn.leaky_relu(self.fc2(av), negative_slope=0.3)
        x_a_out = self.stft_decoder(fused.reshape(x_a_enc.shape), train)
        x_v_out = self.phasegram_decoder(fused.reshape(x_v_enc.shape), train)
        return x_a_out, x_v_out, fused
