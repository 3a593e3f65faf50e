"""AVFusionModel — the main phasegram-fusion separation model.

Capability parity with `AV_Fusion_Model` (avse_model.py:410-711): an STFT
conv2d autoencoder and a phasegram conv2d autoencoder whose latents are
concatenated time-major, fused by a bidirectional LSTM(256) and two FC layers
into a 512-d latent, from which per-modality linear heads reconstruct the
input-shaped STFT and phasegram.

Differences from the reference (all deliberate, TPU-first):
- layer stacks are planned closed-form (models/shape_plan.py) instead of
  trial-forwarding dummy CUDA tensors in __init__,
- FC input sizes are inferred by flax, so non-default geometries that crash
  the reference (hard-coded nn.Linear(fc_size, ...)) simply work,
- runs on any backend; no hard-coded device placement (the reference pins
  submodules to "cuda" at construction, avse_model.py:446,464,502).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from maavss_tpu.models.layers import (
    ConvStack,
    FoldedConvStack1x9,
    FoldedConvStack5x5,
    PallasConvStack1x9,
    make_birnn,
)
from maavss_tpu.ops.pallas_kernels import complex_mask_apply
from maavss_tpu.models.shape_plan import (
    plan_phasegram_decoder,
    plan_phasegram_encoder,
    plan_stft_decoder_fusion,
    plan_stft_encoder_fusion,
)


class AVFusionModel(nn.Module):
    stft_shape: Sequence[int]  # [B, 2, T_stft, F]
    pgram_shape: Sequence[int]  # [B, 1, T_frames, p_size^2]
    latent_channels: int = 64
    fc_size: int = 4096
    dtype: jnp.dtype = jnp.float32
    # fusion recurrence: 'lstm' (reference parity) or 'gru' (north-star
    # option — 3 gates instead of 4, fewer sequential matmuls on the MXU)
    rnn_cell: str = "lstm"
    rnn_unroll: int = 1
    # complex-ratio-mask head (north star "complex-mask application"): the
    # audio head predicts a complex mask applied to the noisy input STFT via
    # the fused Pallas kernel instead of regressing the clean STFT directly.
    # Requires rectangular (re,im) features — incompatible with use_polar.
    # Note: in the visual-only curriculum mode the audio input is zeroed, so a
    # multiplicative head necessarily outputs zeros there; use mask_head for
    # separation-focused training (mode 0/2).
    mask_head: bool = False
    # phasegram-encoder compute path: 'auto' (per-backend measured winner),
    # 'xla' (ConvStack), 'fold' (lane-folded exact execution,
    # ops/pgenc_fold.py — same param tree, +10.7% end-to-end on TPU,
    # BASELINE.md round 4c), or 'pallas' (fused conv+BN+tanh kernels,
    # ops/pallas_pgenc.py). 'pallas' is a MEASURED DEAD END ON TPU (round
    # 3d): the Mosaic compiler rejects every in-kernel stride-2 subsample
    # formulation (strided slices 2D/3D, minormost reshape-split at any
    # width, sublane stride — runs/probe_r3d/mosaic_probe2.json), so it
    # raises on TPU (documented gate, not a crash deep in Mosaic) and stays
    # available off-TPU where interpret mode serves the parity tests.
    pgenc_kernel: str = "auto"
    # STFT-encoder execution: 'auto' | 'fold' | 'xla'. 'fold' runs the
    # k(5,5) stack with its minormost (frequency) axis lane-folded
    # (layers.FoldedConvStack5x5) — exact math, identical param tree; the
    # same padding-tax fix as pgenc fold applied to enc_a (1.2 GB at 29%
    # HBM / 11% MXU, BASELINE.md round 3c). 'auto' resolves per backend to
    # the measured winner.
    stft_fold: str = "auto"

    def setup(self):
        pg_enc, pg_hw = plan_phasegram_encoder(
            self.pgram_shape, self.latent_channels, self.fc_size
        )
        pg_dec, _ = plan_phasegram_decoder(pg_hw, self.pgram_shape, self.latent_channels)
        a_enc, a_hw = plan_stft_encoder_fusion(self.stft_shape, pg_hw, self.latent_channels)
        a_dec, _ = plan_stft_decoder_fusion(a_hw, self.stft_shape, self.latent_channels)
        self.latent_hw = pg_hw

        pgenc_kernel = self.pgenc_kernel
        if pgenc_kernel == "auto":
            # measured per-backend winner: the lane-folded exact form wins
            # +10.7% end-to-end on TPU (BASELINE.md round 4c: 14,495 vs
            # 13,089 clips/s/chip; the 1..32-channel first half stops paying
            # the 128-lane padding tax); off-TPU the folded gather/transpose
            # costs more than plain convs save
            import jax

            pgenc_kernel = "fold" if jax.default_backend() == "tpu" else "xla"
        if pgenc_kernel == "pallas":
            import os

            import jax

            if jax.default_backend() == "tpu":
                raise ValueError(
                    "--pgenc_kernel pallas does not compile on current "
                    "Mosaic: the backend rejects every stride-2 subsample "
                    "formulation (unsupported shape cast / gather; "
                    "BASELINE.md round 3d, runs/probe_r3d/mosaic_probe2). "
                    "Use the default XLA path on TPU — the step already "
                    "runs at the HBM roofline there.")
            self.phasegram_encoder = PallasConvStack1x9(
                tuple(pg_enc), dtype=self.dtype,
                tap_mode=os.environ.get("MAAVSS_PGENC_TAPS", "dense"))
        elif pgenc_kernel == "fold":
            # lane-folded exact execution (ops/pgenc_fold.py): same param
            # tree, W-positions folded into channels so the 1..32-channel
            # first half stops paying the 128-lane padding tax
            self.phasegram_encoder = FoldedConvStack1x9(
                tuple(pg_enc), dtype=self.dtype)
        elif pgenc_kernel == "xla":
            self.phasegram_encoder = ConvStack(tuple(pg_enc), dtype=self.dtype)
        else:
            raise ValueError(
                f"unknown pgenc_kernel {self.pgenc_kernel!r} "
                "(auto|xla|pallas|fold)")
        self.phasegram_decoder = ConvStack(tuple(pg_dec), dtype=self.dtype)
        stft_fold = self.stft_fold
        if stft_fold == "auto":
            # Measured on a v5e (BASELINE.md round 4e/4f): fold LOSES here —
            # 13,178 vs 14,452 clips/s/chip end-to-end (and 13,364 when
            # combined with conv-STFT). Unlike the 1..32-channel phasegram
            # encoder, enc_a's k(5,5) stacks start at 64 channels where the
            # lane padding tax fold removes is already small, and the fold's
            # halo arithmetic costs more than it saves. auto = xla everywhere;
            # --stft_fold fold remains available (exact same math).
            stft_fold = "xla"
        if stft_fold == "fold":
            self.stft_encoder = FoldedConvStack5x5(
                tuple(a_enc), dtype=self.dtype)
        elif stft_fold == "xla":
            self.stft_encoder = ConvStack(tuple(a_enc), dtype=self.dtype)
        else:
            raise ValueError(
                f"unknown stft_fold {self.stft_fold!r} (auto|xla|fold)")
        self.stft_decoder = ConvStack(tuple(a_dec), dtype=self.dtype)

        self.lstm = make_birnn(self.rnn_cell, 256, use_bias=False,
                               dtype=self.dtype, unroll=self.rnn_unroll)
        self.fc1 = nn.Dense(self.fc_size // 2, dtype=self.dtype)
        self.fc2 = nn.Dense(512, dtype=self.dtype)
        t_stft, f_stft = self.stft_shape[-2], self.stft_shape[-1]
        self.a_fc1 = nn.Dense(2 * t_stft * f_stft, dtype=self.dtype)
        self.v_fc1 = nn.Dense(self.pgram_shape[-2] * self.pgram_shape[-1], dtype=self.dtype)

    def init_all(self, x_a: jnp.ndarray, x_v: jnp.ndarray):
        """Touch every submodule so `init` creates all params (the fused
        forward alone never reaches the decoders, mirroring the reference
        where decoders exist but only the AE paths use them)."""
        out = self(x_a, x_v)
        _ = self.audio_ae_forward(x_a)
        _ = self.visual_ae_forward(x_v)
        return out

    def av_fusion_forward(self, x_a_enc: jnp.ndarray, x_v_enc: jnp.ndarray) -> jnp.ndarray:
        """Latents [B,C,t,s] -> fused [B,512] (avse_model.py:658-670)."""
        x_v = jnp.transpose(x_v_enc, (0, 2, 1, 3))  # time-major [B,t,C,s]
        x_a = jnp.transpose(x_a_enc, (0, 2, 1, 3))
        cat = jnp.concatenate([x_v, x_a], axis=2)  # [B,t,2C,s]
        cat = cat.reshape(cat.shape[0], cat.shape[1], -1)
        av = self.lstm(cat)  # [B,t,512]
        av = av.reshape(av.shape[0], -1)
        av = nn.leaky_relu(self.fc1(av), negative_slope=0.3)
        av = nn.leaky_relu(self.fc2(av), negative_slope=0.3)
        return av

    def audio_ae_forward(self, x_a: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """STFT autoencoder path (avse_model.py:676-678)."""
        return self.stft_decoder(self.stft_encoder(x_a, train), train)

    def visual_ae_forward(self, x_v: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """Phasegram autoencoder path (avse_model.py:672-674)."""
        return self.phasegram_decoder(self.phasegram_encoder(x_v, train), train)

    def encode_both(
        self, x_a: jnp.ndarray, x_v: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Run both conv encoders — shape-polymorphic in time, so
        `--fusion_encode full` can feed the WHOLE (num_frames+num_seq-1)-frame
        sequence once and slice latent windows (train/steps.py) instead of
        re-encoding num_seq overlapping windows."""
        return self.stft_encoder(x_a, train), self.phasegram_encoder(x_v, train)

    def heads_from_latents(
        self, x_a_enc: jnp.ndarray, x_v_enc: jnp.ndarray, x_a: jnp.ndarray,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Window-shaped latents [B,C,t,s] + the window's (noisy) STFT input
        -> (ŷ_stft, ŷ_pgram, fused). The head math of __call__, split out so
        the full-encode step can batch all windows through it at once."""
        fused = self.av_fusion_forward(x_a_enc, x_v_enc)
        x_a_head = self.a_fc1(fused)
        if self.mask_head:
            # predicted complex ratio mask * noisy input, one fused VMEM pass
            mask = x_a_head.reshape(x_a.shape).astype(x_a.dtype)
            x_a_out = complex_mask_apply(x_a, mask)
        else:
            x_a_out = nn.leaky_relu(x_a_head, negative_slope=0.3).reshape(x_a.shape)
        x_v_out = nn.leaky_relu(self.v_fc1(fused), negative_slope=0.3)
        x_v_out = x_v_out.reshape((-1,) + tuple(self.pgram_shape[1:]))
        return x_a_out, x_v_out, fused

    def __call__(
        self, x_a: jnp.ndarray, x_v: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """(stft [B,2,T,F], pgram [B,1,Tf,p^2]) -> (ŷ_stft, ŷ_pgram, fused[B,512]).

        Parity: avse_model.py:680-711 — heads are linear + LeakyReLU(0.3),
        reshaped to the input shapes.
        """
        x_a_enc, x_v_enc = self.encode_both(x_a, x_v, train)
        return self.heads_from_latents(x_a_enc, x_v_enc, x_a, train)
