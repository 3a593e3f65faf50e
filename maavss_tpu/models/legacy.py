"""Legacy model family: AVSEModel (Hou et al. style) and AVModelSTFT.

Capability parity with avse_model.py:11-83 (`AVSE_Model`, used by main.py's
raw-FFT path) and avse_model.py:85-405 (`AV_Model_STFT`, used by
train_autoencoder.py's STFT-AE path). Layer geometry is derived closed-form;
torch's `output_size=`-style transposed convs are reproduced by an explicit
crop/zero-pad to the requested size.

Guarded deviation: the reference's visual-encoder sizing loop
(avse_model.py:128-135) never terminates when the audio latent width is 1
(spatial_dim > 0 forever); we stop once the spatial size can no longer halve.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from maavss_tpu.models.layers import TorchBatchNorm


class ConvTranspose2dTorch(nn.Module):
    """flax ConvTranspose with torch crop semantics and explicit output size.

    torch's `output_size=` picks output_padding so that
    out = (i-1)*s - 2p + k + op; values beyond the scatter support are zeros.
    """

    features: int
    kernel: Tuple[int, int]
    stride: Tuple[int, int]
    padding: Tuple[int, int]
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
        # x: NCHW
        x = jnp.moveaxis(x, 1, -1)
        y = nn.ConvTranspose(
            self.features, self.kernel, strides=self.stride, padding="VALID",
            use_bias=self.use_bias, dtype=self.dtype,
        )(x)
        ph, pw = self.padding
        th, tw = out_hw
        h, w = y.shape[1], y.shape[2]
        # crop `padding`, then zero-pad the far side up to the requested size
        y = y[:, ph : min(h, ph + th), pw : min(w, pw + tw), :]
        y = jnp.pad(y, ((0, 0), (0, th - y.shape[1]), (0, tw - y.shape[2]), (0, 0)))
        return jnp.moveaxis(y, -1, 1)


class ConvTranspose3dTorch(nn.Module):
    """3D variant of ConvTranspose2dTorch (NCDHW boundary)."""

    features: int
    kernel: Tuple[int, int, int]
    stride: Tuple[int, int, int]
    padding: Tuple[int, int, int]
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, out_dhw: Tuple[int, int, int]) -> jnp.ndarray:
        x = jnp.moveaxis(x, 1, -1)
        y = nn.ConvTranspose(
            self.features, self.kernel, strides=self.stride, padding="VALID",
            use_bias=self.use_bias, dtype=self.dtype,
        )(x)
        slices = [slice(None)]
        for ax, (p, t) in enumerate(zip(self.padding, out_dhw)):
            cur = y.shape[1 + ax]
            slices.append(slice(p, min(cur, p + t)))
        slices.append(slice(None))
        y = y[tuple(slices)]
        pad_cfg = [(0, 0)] + [(0, t - y.shape[1 + ax]) for ax, t in enumerate(out_dhw)] + [(0, 0)]
        y = jnp.pad(y, pad_cfg)
        return jnp.moveaxis(y, -1, 1)


class AVSEModel(nn.Module):
    """Hou-et-al-style conv1d/conv3d encoder + FC fusion (avse_model.py:11-83).

    a_shape: [B, 2, L] raw-FFT channels; v_shape: [B, 1, T, H, W].
    """

    a_shape: Sequence[int]
    v_shape: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_a: jnp.ndarray, x_v: jnp.ndarray, train: bool = False):
        # ---- audio encoder (conv1d over NCL; run as NLC) ----
        a = jnp.moveaxis(x_a, 1, -1)  # [B, L, 2]
        a = jnp.tanh(nn.Conv(10, (3,), padding="VALID", dtype=self.dtype)(a))
        a = nn.avg_pool(a, (2,), (2,))
        a = nn.relu(nn.Conv(4, (5,), padding="VALID", dtype=self.dtype)(a))
        a = nn.avg_pool(a, (2,), (2,))
        a = nn.relu(nn.Conv(2, (5,), padding="VALID", dtype=self.dtype)(a))
        a = nn.avg_pool(a, (2,), (2,))
        y_a = jnp.moveaxis(a, -1, 1)  # [B, 2, La]
        y_a = y_a.reshape(y_a.shape[0], -1)

        # ---- visual encoder (conv3d over NCDHW; run as NDHWC) ----
        v = jnp.moveaxis(x_v, 1, -1)
        v = nn.relu(nn.Conv(12, (3, 3, 3), strides=(1, 2, 2), padding="VALID", dtype=self.dtype)(v))
        v = nn.relu(nn.Conv(6, (1, 3, 3), strides=(1, 2, 2), padding="VALID", dtype=self.dtype)(v))
        v = nn.relu(nn.Conv(2, (1, 3, 3), strides=(2, 2, 2), padding="VALID", dtype=self.dtype)(v))
        y_v = jnp.moveaxis(v, -1, 1).reshape(v.shape[0], -1)

        av = jnp.concatenate([y_a, y_v], axis=-1)
        av = nn.Dense(512, use_bias=False, dtype=self.dtype)(av)
        av = nn.LayerNorm(dtype=self.dtype)(av)
        av = nn.leaky_relu(av, negative_slope=0.3)

        a_out = jnp.tanh(nn.Dense(self.a_shape[1] * self.a_shape[2], dtype=self.dtype)(av))
        a_out = a_out.reshape((-1,) + tuple(self.a_shape[1:]))
        v_feats = 1
        for d in self.v_shape[1:]:
            v_feats *= d
        v_out = nn.leaky_relu(nn.Dense(v_feats, dtype=self.dtype)(av), negative_slope=0.3)
        v_out = v_out.reshape((-1,) + tuple(self.v_shape[1:]))
        return a_out, v_out


def _plan_legacy_audio(stft_shape, v_frames, alpha):
    """(per-layer (in_ch, out_ch, stride), final (ch, t, s)) for the
    alpha-layer asymmetric-pad audio encoder (avse_model.py:92-115)."""
    time_dim = float(stft_shape[2])
    n_div = 0
    while time_dim > v_frames:
        time_dim /= 2
        n_div += 1
    layers = []
    in_ch = stft_shape[1]
    t, s = stft_shape[2], stft_shape[3]
    for i in range(alpha):
        out_ch = in_ch * 2
        stride = (2, 2) if i < n_div else (1, 2)
        t = (t + 4 - 5) // stride[0] + 1
        s = (s + 4 - 5) // stride[1] + 1
        layers.append((in_ch, out_ch, stride))
        in_ch = out_ch
    return layers, (in_ch, t, s)


class AVModelSTFT(nn.Module):
    """Shape-adaptive STFT conv2d AE + conv3d visual AE + 1x3-conv fusion
    (avse_model.py:85-405). train_autoencoder.py uses audio_ae_forward.
    """

    stft_shape: Sequence[int]  # [B, 2, T, F]
    v_shape: Sequence[int]  # [B, 1, T_frames, H, W]
    alpha: int = 8
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        audio_plan, (a_ch, a_t, a_s) = _plan_legacy_audio(
            self.stft_shape, self.v_shape[2], self.alpha
        )
        self.audio_plan = tuple(audio_plan)
        self.a_latent = (a_ch, a_t, a_s)
        self.audio_enc_convs = [
            nn.Conv(out_ch, (5, 5), strides=stride, padding="VALID", dtype=self.dtype)
            for (_, out_ch, stride) in audio_plan
        ]
        self.audio_enc_bns = [TorchBatchNorm(dtype=self.dtype) for _ in audio_plan]

        # visual encoder: conv3d(k3,p1)+BN+relu+maxpool(1,2,2) doubling channels
        # while spatial > max(a_s // 2, 1) (guarded, see module docstring)
        vis_layers = []
        in_ch, spatial = 1, self.v_shape[3]
        target = max(a_s // 2, 1)
        while spatial > target and spatial >= 2:
            vis_layers.append(in_ch * 2)
            in_ch *= 2
            spatial //= 2
        self.visual_enc_convs = [
            nn.Conv(out_ch, (3, 3, 3), padding=((1, 1), (1, 1), (1, 1)), dtype=self.dtype)
            for out_ch in vis_layers
        ]
        self.visual_enc_bns = [TorchBatchNorm(dtype=self.dtype) for _ in vis_layers]
        self.v_latent = (in_ch, self.v_shape[2], spatial)

        v_flat_full = spatial * spatial
        if v_flat_full > a_s:
            self.pool_v = True
            self.pool_div = max(int(v_flat_full / a_s), 1)
        else:
            self.pool_v = False
            self.pool_div = max(int(a_s / max(v_flat_full, 1)), 1)

        # featureNet: 1x3 convs halving channels down to 1 (avse_model.py:171-183)
        cat_ch = a_ch + in_ch
        feat = []
        c = cat_ch
        while c // 2 >= 1:
            feat.append(c // 2)
            c = c // 2
            if c == 1:
                break
        self.feature_convs = [
            nn.Conv(out_c, (1, 3), padding="VALID", dtype=self.dtype) for out_c in feat
        ]

        self.fc = nn.Dense(512, use_bias=False, dtype=self.dtype)
        self.fc_ln = nn.LayerNorm(dtype=self.dtype)
        self.a_fc_out = nn.Dense(a_ch * a_t * a_s, dtype=self.dtype)
        self.v_fc_out = nn.Dense(in_ch * self.v_shape[2] * v_flat_full, dtype=self.dtype)

        # audio decoder (avse_model.py:227-256)
        self.audio_up1 = ConvTranspose2dTorch(max(a_ch // 2, 1), (5, 5), (2, 2), (2, 2), dtype=self.dtype)
        self.audio_up2 = ConvTranspose2dTorch(max(a_ch // 4, 1), (5, 5), (2, 2), (2, 2), dtype=self.dtype)
        self.audio_up3 = ConvTranspose2dTorch(max(a_ch // 8, 1), (5, 5), (1, 2), (2, 2), dtype=self.dtype)
        self.audio_up4 = ConvTranspose2dTorch(2, (3, 3), (1, 2), (1, 1), dtype=self.dtype)
        self.audio_dec_bns = [TorchBatchNorm(dtype=self.dtype) for _ in range(3)]

        # video decoder (avse_model.py:260-271)
        v_ch = in_ch
        self.video_up1 = ConvTranspose3dTorch(max(v_ch // 2, 1), (3, 3, 3), (1, 4, 4), (1, 1, 1), dtype=self.dtype)
        self.video_up2 = ConvTranspose3dTorch(max(v_ch // 4, 1), (3, 3, 3), (1, 4, 4), (1, 1, 1), dtype=self.dtype)
        self.video_up3 = ConvTranspose3dTorch(max(v_ch // 8, 1), (3, 3, 3), (1, 2, 2), (1, 1, 1), dtype=self.dtype)
        self.video_up4 = ConvTranspose3dTorch(1, (3, 3, 3), (1, 2, 2), (1, 1, 1), dtype=self.dtype)
        self.video_dec_bns = [TorchBatchNorm(dtype=self.dtype) for _ in range(3)]

    # ---- encoders ----
    def audio_encode(self, x_a: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = jnp.moveaxis(x_a, 1, -1)
        for conv, bn in zip(self.audio_enc_convs, self.audio_enc_bns):
            # ZeroPad2d((2,2,3,1)): W left/right 2, H top 3 / bottom 1
            x = jnp.pad(x, ((0, 0), (3, 1), (2, 2), (0, 0)))
            x = jnp.tanh(bn(conv(x), train))
        return jnp.moveaxis(x, -1, 1)

    def visual_encode(self, x_v: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = jnp.moveaxis(x_v, 1, -1)
        for conv, bn in zip(self.visual_enc_convs, self.visual_enc_bns):
            x = nn.relu(bn(conv(x), train))
            x = nn.max_pool(x, (1, 2, 2), (1, 2, 2))
        return jnp.moveaxis(x, -1, 1)

    # ---- decoders ----
    def audio_decode(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h, w = x.shape[2], x.shape[3]
        x = self.audio_up1(x, (h * 2, w * 2))
        x = jnp.moveaxis(jnp.tanh(self.audio_dec_bns[0](jnp.moveaxis(x, 1, -1), train)), -1, 1)
        x = self.audio_up2(x, (h * 4, w * 4))
        x = jnp.moveaxis(jnp.tanh(self.audio_dec_bns[1](jnp.moveaxis(x, 1, -1), train)), -1, 1)
        x = self.audio_up3(x, (h * 4, w * 8))
        x = jnp.moveaxis(jnp.tanh(self.audio_dec_bns[2](jnp.moveaxis(x, 1, -1), train)), -1, 1)
        x = self.audio_up4(x, (h * 4, w * 16))
        return x

    def visual_decode(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        t, h, w = x.shape[2], x.shape[3], x.shape[4]
        x = self.video_up1(x, (t, h * 4, w * 4))
        x = jnp.moveaxis(nn.relu(self.video_dec_bns[0](jnp.moveaxis(x, 1, -1), train)), -1, 1)
        x = self.video_up2(x, (t, h * 16, w * 16))
        x = jnp.moveaxis(nn.relu(self.video_dec_bns[1](jnp.moveaxis(x, 1, -1), train)), -1, 1)
        x = self.video_up3(x, (t, h * 32, w * 32))
        x = jnp.moveaxis(nn.relu(self.video_dec_bns[2](jnp.moveaxis(x, 1, -1), train)), -1, 1)
        x = self.video_up4(x, (t, h * 64, w * 64))
        return nn.sigmoid(x)

    def audio_ae_forward(self, x_a: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """STFT autoencoder path (avse_model.py:304-318) — the
        train_autoencoder.py objective."""
        return self.audio_decode(self.audio_encode(x_a, train), train)

    def visual_ae_forward(self, x_v: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return self.visual_decode(self.visual_encode(x_v, train), train)

    def __call__(self, x_a: jnp.ndarray, x_v: jnp.ndarray, train: bool = False,
                 train_ae: bool = False):
        x_a_enc = self.audio_encode(x_a, train)
        x_v_enc = self.visual_encode(x_v, train)

        if not train_ae:
            v_flat = x_v_enc.reshape(x_v_enc.shape[:3] + (-1,))
            a_enc = x_a_enc
            if self.pool_v and self.pool_div > 1:
                v_flat = jnp.moveaxis(
                    nn.max_pool(jnp.moveaxis(v_flat, 1, -1), (1, self.pool_div),
                                (1, self.pool_div)), -1, 1)
            elif not self.pool_v and self.pool_div > 1:
                a_enc = jnp.moveaxis(
                    nn.max_pool(jnp.moveaxis(a_enc, 1, -1), (1, self.pool_div),
                                (1, self.pool_div)), -1, 1)
            cat = jnp.concatenate([a_enc, v_flat], axis=1)
            x = jnp.moveaxis(cat, 1, -1)
            for conv in self.feature_convs:
                x = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
                x = nn.relu(conv(x))
            feats = jnp.moveaxis(x, -1, 1).reshape(x.shape[0], -1)
            av = nn.relu(self.fc_ln(self.fc(feats)))
            a_head = nn.relu(self.a_fc_out(av)).reshape(x_a_enc.shape)
            v_head = nn.relu(self.v_fc_out(av)).reshape(x_v_enc.shape)
        else:
            a_head, v_head = x_a_enc, x_v_enc

        return self.audio_decode(a_head, train), self.visual_decode(v_head, train)
