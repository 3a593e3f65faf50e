"""AVFusionFramesModel — the reference's "final" model.

Capability parity with `AV_Fusion_Model_Frames` (avse_model_final.py:14-274):
raw attention frames through a fixed 5-stage 3D-conv encoder; an STFT conv2d
autoencoder over the *untrimmed* (F = fft_len//2 + 1) spectrogram; fusion by
concatenating the two latents along their 3rd axis, scanning a bi-LSTM over
the *channel* axis (the reference never permutes time forward here —
avse_model_final.py:124-128 — we reproduce that dataflow exactly), two
bias-free FC layers with tanh, and linear heads emitting only the middle
frame: `hops_per_frame` STFT columns (tanh) and one attention frame (sigmoid).

Deviation: the reference train script passes latent_chan=64 which makes its
`torch.cat` crash (channel mismatch 64 vs 16); the class default 16 is the
only working setting. Our latent concat is planned so both branches always
meet at the same channel count, so any latent_channels works.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from maavss_tpu.models.layers import (
    Conv3dDepthTaps,
    ConvStack,
    TorchBatchNorm,
    make_birnn,
    max_pool_reshape,
)
from maavss_tpu.ops.pallas_kernels import complex_mask_apply
from maavss_tpu.models.shape_plan import (
    frames_visual_encoder_out_hw,
    plan_stft_decoder_frames,
    plan_stft_encoder_frames,
)


class FramesVisualEncoder(nn.Module):
    """Fixed 5-stage conv3d/BN/maxpool/LeakyReLU stack + spatial flatten
    (avse_model_final.py:33-59). Input [B,1,T,H,W] -> [B,C,T,hw*hw].

    `conv_impl` / `pool_impl` select mathematically-identical executions of
    the same ops (layers.Conv3dDepthTaps / layers.max_pool_reshape): the
    frames step measured only ~8% of its HBM speed-of-light with XLA's
    direct conv3d + reduce_window lowering (BASELINE.md round 3b roofline),
    so the hot stack ships with the fast forms selectable. 'auto' resolves
    from $MAAVSS_CONV3D / $MAAVSS_POOL, defaulting to the measured winner
    per backend. Param trees are identical across impls (module names and
    'kernel' shapes match), so checkpoints interchange."""

    latent_channels: int = 16
    dtype: jnp.dtype = jnp.float32
    conv_impl: str = "auto"  # auto | direct | taps
    pool_impl: str = "auto"  # auto | window | reshape
    epilogue: str = "auto"  # auto | fused | xla ($MAAVSS_EPILOGUE)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        import os

        conv_impl = self.conv_impl
        if conv_impl == "auto":
            # measured winner per backend (BASELINE.md round 3g/3h): on TPU
            # the exact space-to-depth stages are +11.3% end-to-end at the
            # production geometry (window encode; +4.9% under full encode);
            # off-TPU the fold's layout juggling is pure overhead.
            default = "s2d" if jax.default_backend() == "tpu" else "direct"
            conv_impl = os.environ.get("MAAVSS_CONV3D", default)
        pool_impl = self.pool_impl
        if pool_impl == "auto":
            pool_impl = os.environ.get("MAAVSS_POOL", "window")
        epilogue = self.epilogue
        if epilogue == "auto":
            epilogue = os.environ.get("MAAVSS_EPILOGUE", "auto")
        if epilogue == "auto":
            # fused Pallas BN+phase-max+leaky epilogue on the s2d stages
            # (ops/pallas_epilogue.py). Three designs measured on a v5e, all
            # LOSE to XLA's epilogue (BASELINE.md rounds 4b/4c/4e): v3's
            # native-layout lane shifts still run the phase max at VPU
            # sub-lane speed (stage-2 fwd+bwd 60.3 vs 52.9 ms; stage-1 fwd
            # 50.9 vs 11.3 ms) and the end-to-end frames step OOMs HBM at
            # b256 (the kernel's saved residuals defeat XLA's rematerializer).
            # auto = xla; 'fused' stays available for future Mosaic releases.
            epilogue = "xla"
        if conv_impl not in ("direct", "taps", "s2d", "tfold"):
            raise ValueError(f"unknown conv3d impl {conv_impl}")
        if pool_impl not in ("window", "reshape"):
            raise ValueError(f"unknown pool impl {pool_impl}")
        if epilogue not in ("fused", "lean", "xla"):
            raise ValueError(f"unknown epilogue impl {epilogue}")

        # NCDHW -> NDHWC
        x = jnp.moveaxis(x, 1, -1)
        stages = [
            (16, (2, 2), 2),
            (32, (2, 2), 2),
            (64, (2, 2), 2),
            (64, (2, 2), 3),
            (self.latent_channels, (3, 3), 3),
        ]
        # s2d pays only while the spatial extent is large (channel-starved
        # stages); at 64x64 the folded stage measured 33% SLOWER on chip
        # (runs/probe_r3g stage bisection: s1 -26%, s2 -6%, s3 +33%)
        s2d_min_hw = int(os.environ.get("MAAVSS_S2D_MIN_HW", "128"))
        for i, (out_ch, pad, pool) in enumerate(stages):
            if conv_impl == "taps":
                x = Conv3dDepthTaps(
                    out_ch, kernel_size=(3, 5, 5),
                    padding=((1, 1), pad, pad), use_bias=False,
                    dtype=self.dtype, name=f"Conv_{i}",
                )(x)
                x = TorchBatchNorm(dtype=self.dtype,
                                   name=f"TorchBatchNorm_{i}")(x, train)
                if pool_impl == "reshape":
                    x = max_pool_reshape(x, pool)
                else:
                    x = nn.max_pool(x, window_shape=(1, pool, pool),
                                    strides=(1, pool, pool))
                x = nn.leaky_relu(x, negative_slope=0.01)
                continue
            # direct / s2d / tfold share one stage executor (layers.py
            # frames_conv3d_stage — exact reformulations, parity tested in
            # tests/test_frames_s2d.py + tests/test_frames_tfold.py). The
            # kernel param is declared here so the tree is identical across
            # impls (same names/shapes as nn.Conv — checkpoints interchange).
            from maavss_tpu.models.layers import (
                _BNHolder, _ConvParams, frames_conv3d_stage, s2d_fold_eligible,
            )

            kernel, _ = _ConvParams(out_ch, x.shape[-1], (3, 5, 5),
                                    False, name=f"Conv_{i}")()
            # fused Pallas epilogue (ops/pallas_epilogue.py): replaces the
            # whole BN+phase-max+leaky tail of an s2d stage in ONE stats
            # pass + ONE apply pass (and a 2-pass backward). Train-mode
            # only; BN params/stats declared via _BNHolder at the exact
            # TorchBatchNorm_i/BatchNorm_0 paths so checkpoints and the
            # eval path (flax BatchNorm reading the same tree) interchange.
            # 'lean' (ops/lean_epilogue.py) is the round-5 pure-XLA
            # restructure of the same tail: pool-before-normalize by the
            # sign(gamma) select + a custom VJP whose BN-backward global
            # terms collapse to pooled-domain sums — one fused dy pass
            # instead of XLA autodiff's ~5 over the conv output.
            fused_ok = (epilogue in ("fused", "lean") and train
                        and conv_impl == "s2d"
                        and s2d_fold_eligible(x.shape, pad, pool, s2d_min_hw))
            if fused_ok and epilogue == "lean":
                # Per-stage gate, kept for study. History: the r5b SOL
                # tables showed lean winning stage i=1 (61.5 vs 76.2 ms
                # fwd+bwd) — but that variant's custom_vjp residuals OOM'd
                # every end-to-end product config, and the memory-honest
                # rewrite (optimization_barrier'd backward recompute,
                # BASELINE.md round 5e) flips the isolated wins negative
                # (stage i=1: 83.2 vs 76.2). lean is a closed negative;
                # 'auto' never resolves to it. Override with a comma list
                # or 'all' ($MAAVSS_LEAN_STAGES).
                lean_stages = os.environ.get("MAAVSS_LEAN_STAGES", "1")
                if lean_stages != "all":
                    fused_ok = i in {int(s) for s in lean_stages.split(",")
                                     if s.strip()}
            if fused_ok:
                if epilogue == "lean":
                    from maavss_tpu.ops.lean_epilogue import (
                        lean_bn_phasemax_leaky as fused_bn_phasemax_leaky,
                    )
                else:
                    from maavss_tpu.ops.pallas_epilogue import (
                        fused_bn_phasemax_leaky,
                    )

                scale, bias, ra_mean, ra_var = _BNHolder(
                    out_ch, name=f"TorchBatchNorm_{i}")()

                def fused_tail(y, _s=scale, _b=bias, _rm=ra_mean, _rv=ra_var):
                    out, mu, var = fused_bn_phasemax_leaky(y, _s, _b)
                    if not self.is_initializing():
                        # flax BatchNorm running update (momentum 0.9,
                        # biased batch var — same rule as nn.BatchNorm)
                        _rm.value = 0.9 * _rm.value + 0.1 * mu
                        _rv.value = 0.9 * _rv.value + 0.1 * var
                    return out

                x = frames_conv3d_stage(
                    x, kernel, pad, pool, conv_impl=conv_impl,
                    dtype=self.dtype, fused_tail=fused_tail,
                    pool_impl=pool_impl, s2d_min_hw=s2d_min_hw)
                continue
            bn = TorchBatchNorm(dtype=self.dtype, name=f"TorchBatchNorm_{i}")
            x = frames_conv3d_stage(
                x, kernel, pad, pool, conv_impl=conv_impl, dtype=self.dtype,
                bn_apply=lambda y, _bn=bn: _bn(y, train),
                pool_impl=pool_impl, s2d_min_hw=s2d_min_hw)
            # torch LeakyReLU default slope 0.01 applied inside the stage
        x = jnp.moveaxis(x, -1, 1)  # -> NCDHW
        b, c, t = x.shape[0], x.shape[1], x.shape[2]
        return x.reshape(b, c, t, -1)


class AVFusionFramesModel(nn.Module):
    stft_shape: Sequence[int]  # [B, 2, T_stft, F] with F = fft_len//2 + 1
    frame_shape: Sequence[int]  # [B, 1, T_frames, H, W]
    hops_per_frame: int = 8
    latent_channels: int = 16
    fc_size: int = 4096  # reference overwrites this with the LSTM output size
    dtype: jnp.dtype = jnp.float32
    rnn_cell: str = "lstm"  # 'lstm' (reference parity) | 'gru' (north-star option)
    rnn_unroll: int = 1
    # complex-ratio-mask audio head (--mask_head, mirroring fusion.py): the
    # head predicts a complex mask applied — via the fused Pallas kernel —
    # to the MIDDLE frame's hops_per_frame columns of the input mixture
    # window (the columns this model family's objective predicts,
    # avse_model_final.py:203-213). `mask_mid_frame` is that frame's index
    # within the nf-frame input window ((num_seq-1)//2 in the train regime).
    # Requires rectangular (re,im) features — incompatible with use_polar.
    mask_head: bool = False
    mask_mid_frame: int = 0

    def setup(self):
        hw = frames_visual_encoder_out_hw(self.frame_shape[-1])
        target = (self.frame_shape[2], hw * hw)  # visual latent (T, S)
        a_enc, a_hw = plan_stft_encoder_frames(self.stft_shape, target, self.latent_channels)
        a_dec, _ = plan_stft_decoder_frames(a_hw, self.stft_shape, self.latent_channels)
        self.latent_hw = a_hw

        self.visual_encoder = FramesVisualEncoder(self.latent_channels, dtype=self.dtype)
        self.stft_encoder = ConvStack(tuple(a_enc), dtype=self.dtype, use_bias=False)
        self.stft_decoder = ConvStack(tuple(a_dec), dtype=self.dtype, use_bias=False)

        self.lstm = make_birnn(self.rnn_cell, 256, use_bias=False,
                               dtype=self.dtype, unroll=self.rnn_unroll)
        # fc sizes depend on the LSTM-flattened width; flax infers inputs
        lstm_seq = 2 * self.latent_channels  # channels of the latent concat
        flat = lstm_seq * 512
        self.fc1 = nn.Dense(flat // 2, use_bias=False, dtype=self.dtype)
        self.fc2 = nn.Dense(512, use_bias=False, dtype=self.dtype)
        f_stft = self.stft_shape[-1]
        self.a_fc1 = nn.Dense(2 * self.hops_per_frame * f_stft, use_bias=False, dtype=self.dtype)
        self.v_fc1 = nn.Dense(
            self.frame_shape[1] * self.frame_shape[-2] * self.frame_shape[-1],
            use_bias=False, dtype=self.dtype,
        )

    def init_all(self, x_a: jnp.ndarray, x_v: jnp.ndarray):
        """Touch every submodule so `init` creates all params."""
        out = self(x_a, x_v)
        _ = self.audio_ae_forward(x_a)
        return out

    def av_fusion_forward(self, x_a_enc: jnp.ndarray, x_v_enc: jnp.ndarray) -> jnp.ndarray:
        """Latents [B,C,T,S] -> fused [B,512] (avse_model_final.py:235-251).

        The concat is along axis 2 and the LSTM scans axis 1 (channels) — the
        reference's exact dataflow, permute intentionally absent."""
        cat = jnp.concatenate([x_v_enc, x_a_enc], axis=2)  # [B,C,2T,S]
        cat = cat.reshape(cat.shape[0], cat.shape[1], -1)  # [B,C,2T*S]
        av = self.lstm(cat)  # [B,C,512]
        av = av.reshape(av.shape[0], -1)
        av = jnp.tanh(self.fc1(av))
        av = jnp.tanh(self.fc2(av))
        return av

    def audio_ae_forward(self, x_a: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return self.stft_decoder(self.stft_encoder(x_a, train), train)

    def forward_with_visual_latent(
        self, x_a: jnp.ndarray, x_v_enc: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Heads path given a precomputed visual latent [B,C,T,S] — the
        entry the `--frames_encode full` step uses after encoding the whole
        frame sequence once and slicing latent windows (train/steps.py); the
        windowed `__call__` routes through it too so there is one head
        implementation."""
        x_a_enc = self.stft_encoder(x_a, train)
        fused = self.av_fusion_forward(x_a_enc, x_v_enc)
        a_shape = (x_a.shape[0], 2, self.hops_per_frame, self.stft_shape[-1])
        if self.mask_head:
            # predicted complex ratio mask * the mixture's middle-frame
            # columns, one fused VMEM pass (mirrors fusion.py mask_head)
            lo = self.mask_mid_frame * self.hops_per_frame
            x_mid = jax.lax.slice_in_dim(x_a, lo, lo + self.hops_per_frame,
                                         axis=2)
            mask = self.a_fc1(fused).reshape(a_shape).astype(x_a.dtype)
            x_a_out = complex_mask_apply(x_mid, mask)
        else:
            x_a_out = jnp.tanh(self.a_fc1(fused)).reshape(a_shape)
        x_v_out = nn.sigmoid(self.v_fc1(fused))
        x_v_out = x_v_out.reshape(
            x_a.shape[0], self.frame_shape[1], self.frame_shape[-2], self.frame_shape[-1]
        )
        return x_a_out, x_v_out, fused

    def encode_frames(self, x_v: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """Visual trunk only: [B,1,T,H,W] -> latent [B,C,T,S]."""
        return self.visual_encoder(x_v, train)

    def __call__(
        self, x_a: jnp.ndarray, x_v: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """(stft [B,2,T,F], frames [B,1,Tf,H,W]) ->
        (ŷ_stft [B,2,hops_per_frame,F], ŷ_frame [B,1,H,W], fused [B,512]).

        Middle-frame objective heads: tanh on audio, sigmoid on the single
        reconstructed attention frame (avse_model_final.py:258-273).
        """
        x_v_enc = self.visual_encoder(x_v, train)
        return self.forward_with_visual_latent(x_a, x_v_enc, train)
