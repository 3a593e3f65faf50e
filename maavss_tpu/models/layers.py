"""Shared flax building blocks.

- `ConvStack`: executes a planned `ConvSpec` sequence. Public API is NCHW (the
  reference's torch layout, e.g. stft features [B,2,T,F]); internally tensors
  are NHWC so XLA:TPU convolutions hit their native layout. Transposed convs
  reproduce torch's ConvTranspose2d geometry (crop `padding`, extend by
  `output_padding`) on top of flax's VALID transpose.
- `BiLSTM`: bidirectional LSTM via `jax.lax.scan`. The input projection
  `x @ W_i` for all timesteps is hoisted out of the scan into one large MXU
  matmul; only the small `h @ W_h` recurrence stays sequential. Gate order is
  torch's (i, f, g, o) so torch checkpoints convert 1:1
  (reference: avse_model.py:542-546, bias=False).
- `BatchNorm` wrapper: torch-default momentum/eps. Under jit over a sharded
  mesh the batch statistics are global-batch automatically (GSPMD inserts the
  cross-device reductions), matching the reference's single-device semantics.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from maavss_tpu.models.shape_plan import ConvSpec


def activate(x: jnp.ndarray, act: Optional[str]) -> jnp.ndarray:
    if act is None:
        return x
    if act == "tanh":
        return jnp.tanh(x)
    if act == "relu":
        return nn.relu(x)
    if act == "leaky_relu":
        return nn.leaky_relu(x, negative_slope=0.3)  # reference slope (avse_model.py:71)
    if act == "sigmoid":
        return nn.sigmoid(x)
    raise ValueError(f"unknown activation {act}")


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch defaults (momentum 0.1 torch == 0.9 flax, eps 1e-5)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype,
        )(x)


class ConvStack(nn.Module):
    """Sequential 2D conv / transposed-conv stack from planned specs.

    Input/output are NCHW; `use_bias` follows the spec (`bias=False` for the
    frames-model stacks, avse_model_final.py:98-102).
    """

    specs: Tuple[ConvSpec, ...]
    dtype: jnp.dtype = jnp.float32
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = jnp.moveaxis(x, 1, -1)  # NCHW -> NHWC
        for spec in self.specs:
            ph, pw = spec.padding
            if spec.transpose:
                y = nn.ConvTranspose(
                    features=spec.out_ch,
                    kernel_size=spec.kernel,
                    strides=spec.stride,
                    padding="VALID",
                    use_bias=self.use_bias,
                    dtype=self.dtype,
                )(x)
                # torch ConvTranspose2d geometry: crop `padding` from both
                # sides, keep `output_padding` extra elements on the far side
                oph, opw = spec.output_padding
                h, w = y.shape[1], y.shape[2]
                y = y[:, ph : h - ph + oph, pw : w - pw + opw, :]
                x = y
            else:
                x = nn.Conv(
                    features=spec.out_ch,
                    kernel_size=spec.kernel,
                    strides=spec.stride,
                    padding=((ph, ph), (pw, pw)),
                    use_bias=self.use_bias,
                    dtype=self.dtype,
                )(x)
            if spec.norm:
                x = TorchBatchNorm(dtype=self.dtype)(x, train)
            x = activate(x, spec.act)
        return jnp.moveaxis(x, -1, 1)  # NHWC -> NCHW


class _ConvParams(nn.Module):
    """Parameter holder matching nn.Conv's tree ({kernel, bias}, same shapes,
    same initializers, same rng fold by path) without running its compute."""

    features: int
    in_ch: int
    kernel: Tuple[int, int]
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            self.kernel + (self.in_ch, self.features))
        b = (self.param("bias", nn.initializers.zeros, (self.features,))
             if self.use_bias else None)
        return k, b


class _BNParams(nn.Module):
    """Parameter/stats holder matching nn.BatchNorm's tree."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((self.features,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((self.features,), jnp.float32))
        return scale, bias, mean, var


class _BNHolder(nn.Module):
    """Nests _BNParams under 'BatchNorm_0' so the param path equals
    TorchBatchNorm's (TorchBatchNorm_i/BatchNorm_0/...)."""

    features: int

    @nn.compact
    def __call__(self):
        return _BNParams(self.features, name="BatchNorm_0")()


class PallasConvStack1x9(nn.Module):
    """Drop-in replacement for ConvStack on the planned phasegram-encoder
    stacks — every layer must be conv(1,9)/stride(1,2)/pad(0,4) + BN + tanh
    (plan_phasegram_encoder's shape, avse_model.py:427-446) — executing each
    layer as ONE fused Pallas program (ops/pallas_pgenc.py) instead of
    XLA's conv/stats/normalize kernel chain.

    The parameter and batch_stats trees are IDENTICAL to ConvStack's (names,
    shapes, initializers, rng folds), so checkpoints interchange freely and
    --pgenc_kernel is a pure compute-path switch.

    Dataflow stays channel-first [C, B*T, S] across the whole stack: the
    public NCHW boundary costs one free reshape on entry (C=1) and one small
    transpose on exit (the [latent, B*T, s] latent).
    """

    specs: Tuple[ConvSpec, ...]
    dtype: jnp.dtype = jnp.float32
    use_bias: bool = True
    tap_mode: str = "dense"  # dense | strided (see ops/pallas_pgenc.py)

    def _check(self):
        for spec in self.specs:
            ok = (not spec.transpose and spec.kernel == (1, 9)
                  and spec.stride == (1, 2) and spec.padding == (0, 4)
                  and spec.norm and spec.act == "tanh")
            if not ok:
                raise ValueError(
                    f"PallasConvStack1x9 supports only the planned "
                    f"(1,9)/s(1,2)/p(0,4)+BN+tanh layers, got {spec}")

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from maavss_tpu.ops.pallas_pgenc import (
            fused_conv_bn_tanh_eval,
            fused_conv_bn_tanh_train,
            pgenc_fits,
        )

        self._check()
        b, c, t, s = x.shape
        if c != self.specs[0].in_ch:
            raise ValueError(f"input has {c} channels, specs expect "
                             f"{self.specs[0].in_ch}")
        # NCHW -> channel-first rows [C, B*T, S]
        h = jnp.transpose(x.astype(self.dtype), (1, 0, 2, 3)).reshape(c, b * t, s)
        for i, spec in enumerate(self.specs):
            if not pgenc_fits(spec.in_ch, h.shape[-1]):
                raise ValueError(
                    f"layer {i}: lane width {h.shape[-1]} unsupported")
            kernel, cbias = _ConvParams(
                spec.out_ch, spec.in_ch, spec.kernel, self.use_bias,
                name=f"Conv_{i}")()
            if cbias is None:
                cbias = jnp.zeros((spec.out_ch,), jnp.float32)
            scale, bias, ra_mean, ra_var = _BNHolder(
                spec.out_ch, name=f"TorchBatchNorm_{i}")()
            # [1,9,Cin,Cout] -> [Cout, 9*Cin] with column k*Cin+ci
            w2 = kernel[0].reshape(9 * spec.in_ch, spec.out_ch).T
            w2 = w2.astype(self.dtype)
            cbias = cbias.astype(jnp.float32)
            scale = scale.astype(jnp.float32)
            bias = bias.astype(jnp.float32)
            if train:
                h, mu, var = fused_conv_bn_tanh_train(
                    self.tap_mode, h, w2, cbias, scale, bias)
                if not self.is_initializing():
                    # flax BatchNorm running update (momentum 0.9, biased var)
                    ra_mean.value = 0.9 * ra_mean.value + 0.1 * mu
                    ra_var.value = 0.9 * ra_var.value + 0.1 * var
            else:
                h = fused_conv_bn_tanh_eval(
                    self.tap_mode, h, w2, cbias, scale, bias,
                    ra_mean.value, ra_var.value)
        co = self.specs[-1].out_ch
        h = h.reshape(co, b, t, h.shape[-1])
        return jnp.transpose(h, (1, 0, 2, 3))  # -> NCHW


class FoldedConvStack1x9(nn.Module):
    """Drop-in replacement for ConvStack on the planned phasegram-encoder
    stacks (conv(1,9)/s(1,2)/p(0,4) + BN + tanh, avse_model.py:427-446),
    executing every conv LANE-FOLDED (ops/pgenc_fold.py): W-positions fold
    into the channel dim so tensors stay 128-lane dense — the direct stack
    runs its first half at 1..32 channels, each padded to 128 lanes by the
    TPU tile, and enc_v is the fusion step's dominant HBM mover (6.6 GB,
    64% HBM / 9% MXU; BASELINE.md round 3c).

    Exact math (the folded kernel is a gather of the original parameter;
    tests/test_pgenc_fold.py), and the parameter/batch_stats trees are
    IDENTICAL to ConvStack's, so checkpoints interchange and
    --pgenc_kernel fold is a pure compute-path switch.
    """

    specs: Tuple[ConvSpec, ...]
    dtype: jnp.dtype = jnp.float32
    use_bias: bool = True
    lane_target: int = 128

    def _check(self):
        for spec in self.specs:
            ok = (not spec.transpose and spec.kernel == (1, 9)
                  and spec.stride == (1, 2) and spec.padding == (0, 4)
                  and spec.norm and spec.act == "tanh")
            if not ok:
                raise ValueError(
                    f"FoldedConvStack1x9 supports only the planned "
                    f"(1,9)/s(1,2)/p(0,4)+BN+tanh layers, got {spec}")

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from maavss_tpu.ops.pgenc_fold import (
            fold_lanes,
            folded_conv_1x9_s2,
            plan_folds,
            unfold_lanes,
        )

        self._check()
        b, c, t, s = x.shape
        folds = plan_folds([sp.in_ch for sp in self.specs], s,
                           self.lane_target)
        h = jnp.moveaxis(x, 1, -1).astype(self.dtype)  # NCHW -> NHWC
        for i, (spec, f) in enumerate(zip(self.specs, folds)):
            kernel, cbias = _ConvParams(
                spec.out_ch, spec.in_ch, spec.kernel, self.use_bias,
                name=f"Conv_{i}")()
            scale, bias, ra_mean, ra_var = _BNHolder(
                spec.out_ch, name=f"TorchBatchNorm_{i}")()
            y = folded_conv_1x9_s2(fold_lanes(h, f),
                                   kernel.astype(self.dtype), f)
            f_out = f // 2
            if cbias is not None:
                y = y + jnp.tile(cbias, f_out).astype(y.dtype)
            # BN(train/eval) + tanh in the folded view: per-channel over the
            # f_out lane groups (stats in fp32, flax convention)
            *lead, wf, _ = y.shape
            yv = y.reshape(*lead, wf, f_out, spec.out_ch)
            if train:
                yf = yv.astype(jnp.float32)
                axes = tuple(range(yf.ndim - 1))
                mu = jnp.mean(yf, axis=axes)
                var = jnp.mean(jnp.square(yf), axis=axes) - jnp.square(mu)
                if not self.is_initializing():
                    # flax BatchNorm running update (momentum 0.9, biased var)
                    ra_mean.value = 0.9 * ra_mean.value + 0.1 * mu
                    ra_var.value = 0.9 * ra_var.value + 0.1 * var
            else:
                mu, var = ra_mean.value, ra_var.value
            yn = (yv - mu.astype(yv.dtype)) * jax.lax.rsqrt(
                var + 1e-5).astype(yv.dtype)
            yn = yn * scale.astype(yv.dtype) + bias.astype(yv.dtype)
            yn = jnp.tanh(yn)
            h = unfold_lanes(yn.reshape(*lead, wf, f_out * spec.out_ch),
                             f_out, spec.out_ch)
        return jnp.moveaxis(h, -1, 1)  # NHWC -> NCHW


class FoldedConvStack5x5(nn.Module):
    """Drop-in replacement for ConvStack on the planned STFT-encoder stacks
    (conv(5,5)/stride{1,2}x{1,2}/pad(2,2) + BN + tanh, avse_model.py:474-502),
    executing every conv with its minormost (frequency) axis LANE-FOLDED
    (ops/pgenc_fold.py fold_kernel_minor): S-positions fold into the channel
    dim so tensors stay 128-lane dense. The direct stack runs at 2/8/32
    channels — each tile padded to 128 lanes — and enc_a moves 1.2 GB at
    29% HBM / 11% MXU in the fusion step (BASELINE.md round 3c); this is
    the same padding-tax fix that won +10.7% end-to-end on the phasegram
    encoder (round 4c).

    Exact math (the folded kernel is a gather of the original parameter;
    tests/test_stft_fold.py), and the parameter/batch_stats trees are
    IDENTICAL to ConvStack's, so checkpoints interchange and --stft_fold is
    a pure compute-path switch. Unlike the (1,9) stack, strides vary per
    layer and per axis (the plan halves T and S independently toward the
    phasegram latent); only the minormost S axis folds — T convolves
    normally."""

    specs: Tuple[ConvSpec, ...]
    dtype: jnp.dtype = jnp.float32
    use_bias: bool = True
    lane_target: int = 128

    def _check(self):
        for spec in self.specs:
            ok = (not spec.transpose and spec.kernel == (5, 5)
                  and spec.padding == (2, 2)
                  and spec.stride[0] in (1, 2) and spec.stride[1] in (1, 2)
                  and spec.norm and spec.act == "tanh")
            if not ok:
                raise ValueError(
                    f"FoldedConvStack5x5 supports only the planned "
                    f"(5,5)/p(2,2)+BN+tanh layers, got {spec}")

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from maavss_tpu.ops.pgenc_fold import (
            fold_lanes,
            folded_conv2d_minor,
            plan_folds_minor,
            unfold_lanes,
        )

        self._check()
        b, c, t, s = x.shape
        widths, strides = [], []
        w = s
        for sp in self.specs:
            widths.append(w)
            strides.append(sp.stride[1])
            w //= sp.stride[1]
        folds = plan_folds_minor([sp.in_ch for sp in self.specs], widths,
                                 strides, self.lane_target)
        h = jnp.moveaxis(x, 1, -1).astype(self.dtype)  # NCHW -> NHWC
        for i, (spec, f) in enumerate(zip(self.specs, folds)):
            kernel, cbias = _ConvParams(
                spec.out_ch, spec.in_ch, spec.kernel, self.use_bias,
                name=f"Conv_{i}")()
            scale, bias, ra_mean, ra_var = _BNHolder(
                spec.out_ch, name=f"TorchBatchNorm_{i}")()
            if f > 1:
                y = folded_conv2d_minor(fold_lanes(h, f),
                                        kernel.astype(self.dtype), f,
                                        spec.stride)
                f_out = f // spec.stride[1]
            else:
                y = jax.lax.conv_general_dilated(
                    h, kernel.astype(self.dtype),
                    window_strides=spec.stride,
                    padding=((2, 2), (2, 2)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                f_out = 1
            if cbias is not None:
                y = y + jnp.tile(cbias, f_out).astype(y.dtype)
            # BN(train/eval) + tanh in the folded view: per-channel over the
            # f_out lane groups (stats in fp32, flax convention)
            *lead, wf, _ = y.shape
            yv = y.reshape(*lead, wf, f_out, spec.out_ch)
            if train:
                yf = yv.astype(jnp.float32)
                axes = tuple(range(yf.ndim - 1))
                mu = jnp.mean(yf, axis=axes)
                var = jnp.mean(jnp.square(yf), axis=axes) - jnp.square(mu)
                if not self.is_initializing():
                    ra_mean.value = 0.9 * ra_mean.value + 0.1 * mu
                    ra_var.value = 0.9 * ra_var.value + 0.1 * var
            else:
                mu, var = ra_mean.value, ra_var.value
            yn = (yv - mu.astype(yv.dtype)) * jax.lax.rsqrt(
                var + 1e-5).astype(yv.dtype)
            yn = yn * scale.astype(yv.dtype) + bias.astype(yv.dtype)
            yn = jnp.tanh(yn)
            h = unfold_lanes(yn.reshape(*lead, wf, f_out * spec.out_ch),
                             f_out, spec.out_ch)
        return jnp.moveaxis(h, -1, 1)  # NHWC -> NCHW


class Conv3dDepthTaps(nn.Module):
    """Exact replacement for `nn.Conv` with a (KD, KH, KW) kernel at stride 1
    on NDHWC input, computed as KD shifted 2-D convolutions summed over the
    depth taps, each running on the depth-folded batch [B*D, H, W, C].

    Same math, same param ('kernel', shape (KD,KH,KW,Cin,Cout), same default
    init), so checkpoints interchange with the direct module when the module
    `name` matches. Built to test whether XLA:TPU's true-3D conv lowering
    caused the frames step's ~8%-of-HBM-roofline gap (BASELINE.md round 3b);
    MEASURED 2.5x SLOWER end-to-end than the direct form (63.5 vs 156.2
    clips/s at b128) — XLA's conv3d path is NOT the bottleneck, and the
    extra slicing/summing traffic of this form costs more than it saves.
    Kept as the measured negative result and for the stage-bisection probe
    (benchmarks/frames_probe.py)."""

    features: int
    kernel_size: Tuple[int, int, int] = (3, 5, 5)
    padding: Tuple[Tuple[int, int], ...] = ((1, 1), (2, 2), (2, 2))
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kd, kh, kw = self.kernel_size
        (pd0, pd1), ph, pw = self.padding
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kd, kh, kw, cin, self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)

        b, d, h, w, _ = x.shape
        xp = jnp.pad(x, ((0, 0), (pd0, pd1), (0, 0), (0, 0), (0, 0)))
        d_out = d + pd0 + pd1 - kd + 1
        y = None
        for t in range(kd):
            xs = jax.lax.slice_in_dim(xp, t, t + d_out, axis=1)
            xs2 = xs.reshape((b * d_out,) + xs.shape[2:])
            yt = jax.lax.conv_general_dilated(
                xs2, kernel[t],
                window_strides=(1, 1),
                padding=(ph, pw),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            y = yt if y is None else y + yt
        y = y.reshape((b, d_out) + y.shape[1:])
        if bias is not None:
            y = y + bias
        return y


def space_to_depth_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """NDHWC [B,T,H,W,C] -> [B,T,H/2,W/2,4C], channel index ph*C + c with
    phase ph = 2*py + px (py/px = the pixel's parity within its 2x2 block)."""
    b, d, h, w, c = x.shape
    x = x.reshape(b, d, h // 2, 2, w // 2, 2, c)
    x = jnp.transpose(x, (0, 1, 2, 4, 3, 5, 6))
    return x.reshape(b, d, h // 2, w // 2, 4 * c)


def fold_conv3d_kernel_2x2(kernel: jnp.ndarray) -> jnp.ndarray:
    """EXACT reformulation of a stride-1 (KD,5,5) conv (pad (·,2,2)) as a
    (KD,3,3) conv (pad (·,1,1)) over 2x2 space-to-depth phase channels:
    [KD,5,5,C,Co] -> [KD,3,3,4C,4Co].

    Why: the frames trunk's first stages are channel-starved for the MXU
    (C_in=1 gives a 75-deep contraction with 16 active output rows on a
    128x128 systolic array — the measured ~11% MXU, BASELINE.md round 3f).
    Folding quadruples both contraction depth and output rows without
    changing the math: output phase q at folded position m reads original
    positions u = q + k - 2 (k the original tap), i.e. folded tap
    d = floor(u/2) in {-1,0,1} of input phase r = u mod 2. Channel layout
    matches space_to_depth_2x2 (ph*C + c in, qph*Co + co out)."""
    kd, kh, kw, c, co = kernel.shape
    assert (kh, kw) == (5, 5), (kh, kw)
    out = jnp.zeros((kd, 3, 3, 4 * c, 4 * co), kernel.dtype)
    for qy in range(2):
        for ky in range(5):
            uy = qy + ky - 2
            dy, ry = uy // 2, uy % 2
            for qx in range(2):
                for kx in range(5):
                    ux = qx + kx - 2
                    dx, rx = ux // 2, ux % 2
                    ph_in = 2 * ry + rx
                    ph_out = 2 * qy + qx
                    out = out.at[:, 1 + dy, 1 + dx,
                                 ph_in * c:(ph_in + 1) * c,
                                 ph_out * co:(ph_out + 1) * co].set(
                        kernel[:, ky, kx])
    return out


def phase_max_2x2(y: jnp.ndarray) -> jnp.ndarray:
    """[B,T,H',W',4Co] (phase-major channels) -> [B,T,H',W',Co]: max over
    the 4 phase channels per original channel — EXACTLY a (2,2)/s2 spatial
    max pool of the unfolded tensor (the pool blocks are the fold blocks)."""
    b, d, h, w, c4 = y.shape
    return jnp.max(y.reshape(b, d, h, w, 4, c4 // 4), axis=4)


def phase_channels_to_batchnorm_view(y: jnp.ndarray) -> jnp.ndarray:
    """[B,T,H',W',4Co] -> [B,T,H',4W',Co]: moves the phase factor into a
    spatial axis so a per-Co BatchNorm sees the identical value multiset as
    on the unfolded tensor (BN only needs the per-channel reduction; spatial
    adjacency is irrelevant to it)."""
    b, d, h, w, c4 = y.shape
    return y.reshape(b, d, h, w * 4, c4 // 4)


def batchnorm_view_to_phase_channels(y: jnp.ndarray) -> jnp.ndarray:
    b, d, h, w4, c = y.shape
    return y.reshape(b, d, h, w4 // 4, 4 * c)


def time_fold_3taps(x: jnp.ndarray) -> jnp.ndarray:
    """NDHWC [B,T,H,W,C] -> [B,T,H,W,3C]: the t-1/t/t+1 frames concatenated
    along channels (zero-padded at the sequence ends — the conv3d's temporal
    pad (1,1)), channel index kt*C + c for temporal tap kt."""
    t = x.shape[1]
    xp = jnp.pad(x, ((0, 0), (1, 1)) + ((0, 0),) * (x.ndim - 2))
    return jnp.concatenate(
        [jax.lax.slice_in_dim(xp, k, k + t, axis=1) for k in range(3)],
        axis=-1)


def fold_conv3d_kernel_time(kernel: jnp.ndarray) -> jnp.ndarray:
    """[KD,KH,KW,C,Co] -> [KH,KW,KD*C,Co] matching time_fold_3taps's channel
    layout (kt*C + c), so a 2D conv over the folded channels equals the
    stride-1 3D conv with temporal pad (1,1)."""
    kd, kh, kw, c, co = kernel.shape
    return jnp.moveaxis(kernel, 0, 2).reshape(kh, kw, kd * c, co)


def conv2d_timefold(x: jnp.ndarray, kernel: jnp.ndarray,
                    pad_hw: Tuple[Tuple[int, int], Tuple[int, int]]) -> jnp.ndarray:
    """EXACT stride-1 conv3d (temporal pad (1,1)) as ONE 2D convolution:
    fold the KD=3 temporal taps into channels (time_fold_3taps) and run a
    single [B*T, H, W, 3C] conv2d with a 3x-deeper contraction.

    Why: the frames trunk's first stages are channel-starved on the MXU
    (BASELINE.md round 3f: ~11% MXU); XLA:TPU's 2D conv path with KD*C input
    channels feeds the systolic array a deeper contraction per pass than its
    direct conv3d schedule. Costs one materialized 3x-channel copy of the
    stage input (HBM write+read) — whether the deeper MXU pass pays for that
    traffic is measured on chip (benchmarks/frames_probe.py, MAAVSS_CONV3D=
    tfold)."""
    xt = time_fold_3taps(x)
    b, t = xt.shape[0], xt.shape[1]
    y = jax.lax.conv_general_dilated(
        xt.reshape((b * t,) + xt.shape[2:]),
        fold_conv3d_kernel_time(kernel),
        window_strides=(1, 1), padding=pad_hw,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y.reshape((b, t) + y.shape[1:])


def s2d_fold_eligible(x_shape, pad, pool: int, s2d_min_hw: int) -> bool:
    """Can this stage run as 2x2 space-to-depth phase channels? (pool==2 so
    the pool is exactly the phase max; pad (2,2) so the fold's (3,3)/p1 conv
    is exact; spatial even and large enough that folding measured a win —
    runs/probe_r3g.) Shared by frames_conv3d_stage and the owning module's
    fused-epilogue gate so the two can never disagree."""
    return (pool == 2 and tuple(pad) == (2, 2)
            and x_shape[2] % 2 == 0 and x_shape[3] % 2 == 0
            and min(x_shape[2], x_shape[3]) >= s2d_min_hw)


def frames_conv3d_stage(x: jnp.ndarray, kernel: jnp.ndarray,
                        pad: Tuple[int, int], pool: int, *,
                        conv_impl: str, dtype: jnp.dtype,
                        bn_apply=None, pool_impl: str = "window",
                        s2d_min_hw: int = 128, fused_tail=None) -> jnp.ndarray:
    """One frames-trunk stage — conv3d(3,5,5)/s1 + BatchNorm + (pool,pool)
    max pool + LeakyReLU(0.01) (avse_model_final.py:33-59) — with selectable
    mathematically-identical executions:

    - 'direct': XLA's native conv3d.
    - 's2d':    2x2 space-to-depth phase fold where eligible (pool==2,
                pad==(2,2), even spatial >= s2d_min_hw) — conv (·,3,3)/p1
                over 4x channels, BN through the phase view, pool as a free
                phase max (BASELINE.md round 3g/3h: +11.3% end-to-end).
    - 'tfold':  temporal-tap fold on top: every stage runs as ONE 2D conv
                with 3x the input channels (conv2d_timefold), composed with
                the s2d fold on eligible stages.

    `bn_apply` is a callable(y)->y supplied by the owning flax module (so
    this helper stays parameter-free); None skips BN (probe ablations).
    `fused_tail`, when not None and the s2d fold is taken, replaces the
    whole BN + phase-max + leaky tail with one callable(y_phase_major)->out
    (the fused Pallas epilogue, ops/pallas_epilogue.py — the BN+pool
    epilogue is 42 of stage 1's 63 ms under XLA, BASELINE.md round 3j).
    The caller declares `kernel` via _ConvParams so the param tree is
    identical across impls and checkpoints interchange."""
    x = x.astype(dtype)
    kernel = kernel.astype(dtype)
    s2d_ok = s2d_fold_eligible(x.shape, pad, pool, s2d_min_hw)
    if conv_impl in ("s2d", "tfold") and s2d_ok:
        xf = space_to_depth_2x2(x)
        kf = fold_conv3d_kernel_2x2(kernel)
        if conv_impl == "tfold":
            y = conv2d_timefold(xf, kf, ((1, 1), (1, 1)))
        else:
            y = jax.lax.conv_general_dilated(
                xf, kf, window_strides=(1, 1, 1),
                padding=((1, 1), (1, 1), (1, 1)),
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        if fused_tail is not None:
            return fused_tail(y)
        if bn_apply is not None:
            y = phase_channels_to_batchnorm_view(y)
            y = bn_apply(y)
            y = batchnorm_view_to_phase_channels(y)
        return nn.leaky_relu(phase_max_2x2(y), negative_slope=0.01)
    if conv_impl == "tfold":
        y = conv2d_timefold(x, kernel,
                            ((pad[0], pad[0]), (pad[1], pad[1])))
    elif conv_impl in ("direct", "s2d"):  # s2d falls back where ineligible
        y = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1, 1, 1),
            padding=((1, 1), pad, pad),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    else:
        raise ValueError(f"unknown conv3d impl {conv_impl}")
    if bn_apply is not None:
        y = bn_apply(y)
    if pool_impl == "reshape":
        y = max_pool_reshape(y, pool)
    else:
        y = nn.max_pool(y, window_shape=(1, pool, pool),
                        strides=(1, pool, pool))
    return nn.leaky_relu(y, negative_slope=0.01)


def max_pool_reshape(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """Non-overlapping (1, p, p) max pool on NDHWC via crop+reshape+max —
    identical values to `nn.max_pool(window=(1,p,p), strides=(1,p,p))`
    (VALID drops the remainder, so crop first). Why: reduce_window's
    backward lowers to SelectAndScatter, a notoriously slow TPU path; the
    reshape form's backward is a plain compare+mask. Tie-breaking gradients
    differ from reduce_window on exactly-equal window entries (measure-zero
    with real activations); forward is bitwise identical."""
    b, d, h, w, c = x.shape
    hq, wq = h // p, w // p
    x = x[:, :, : hq * p, : wq * p, :]
    x = x.reshape(b, d, hq, p, wq, p, c)
    return jnp.max(x, axis=(3, 5))


class LSTM(nn.Module):
    """Unidirectional LSTM over [B, T, D] -> [B, T, H] via lax.scan.

    `unroll` is a tuning knob (--rnn_unroll). Fetch-closed v5e numbers
    (BASELINE.md, bf16/b128 fusion step): unroll 8 is ~5% faster than 1;
    combined with vectorized windows it gave the best measured step. The
    default stays 1 (geometry-dependent; see the BASELINE table)."""

    hidden: int
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32
    reverse: bool = False
    unroll: int = 1
    backend: Optional[str] = None  # scan | pallas | auto ($MAAVSS_LSTM; auto)

    # 'auto' picks the fused Pallas recurrence (ops/pallas_lstm.py) on TPU.
    # The kernel batch-blocks itself to a VMEM budget (its _batch_block), so
    # it fits at any power-of-two-divisible batch; pallas_fits is False only
    # for odd/tiny geometries the blocker cannot split. Measured end-to-end:
    # +2.3% at the bench geometry (BASELINE.md round-3 kernel table).

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import os

        backend = self.backend or os.environ.get("MAAVSS_LSTM", "auto")
        if backend == "auto":
            from maavss_tpu.ops.pallas_lstm import pallas_fits

            fit = pallas_fits(x.shape[1], x.shape[0], self.hidden,
                              jnp.dtype(x.dtype).itemsize)
            backend = "pallas" if (
                jax.default_backend() == "tpu" and fit) else "scan"
        d = x.shape[-1]
        h = self.hidden
        scale = 1.0 / jnp.sqrt(h)

        def uniform_init(key, shape, dtype=self.dtype):
            return jax.random.uniform(key, shape, dtype, -scale, scale)

        w_i = self.param("w_i", uniform_init, (d, 4 * h))
        w_h = self.param("w_h", uniform_init, (h, 4 * h))
        b = self.param("b", uniform_init, (4 * h,)) if self.use_bias else None

        # hoist the big matmul out of the recurrence: one [B*T, D]x[D, 4H]
        xw = jnp.einsum("btd,dh->bth", x, w_i)
        if b is not None:
            xw = xw + b
        if self.reverse:
            xw = jnp.flip(xw, axis=1)

        bsz = x.shape[0]
        init = (
            jnp.zeros((bsz, h), self.dtype),
            jnp.zeros((bsz, h), self.dtype),
        )

        if backend == "pallas":
            # whole recurrence in one fused kernel (ops/pallas_lstm.py)
            from maavss_tpu.ops.pallas_lstm import pallas_lstm

            ys = jnp.swapaxes(pallas_lstm(jnp.swapaxes(xw, 0, 1), w_h), 0, 1)
            if self.reverse:
                ys = jnp.flip(ys, axis=1)
            return ys

        def step(carry, xt):
            hs, cs = carry
            gates = xt + hs @ w_h
            i, f, g, o = jnp.split(gates, 4, axis=-1)  # torch gate order
            i, f, o = nn.sigmoid(i), nn.sigmoid(f), nn.sigmoid(o)
            g = jnp.tanh(g)
            cs = f * cs + i * g
            hs = o * jnp.tanh(cs)
            return (hs, cs), hs

        _, ys = jax.lax.scan(step, init, jnp.swapaxes(xw, 0, 1),
                             unroll=self.unroll)
        ys = jnp.swapaxes(ys, 0, 1)
        if self.reverse:
            ys = jnp.flip(ys, axis=1)
        return ys


class GRU(nn.Module):
    """Unidirectional GRU over [B, T, D] -> [B, T, H] via lax.scan.

    The north star allows swapping the fusion recurrence for a GRU (fewer
    sequential matmuls: 3H vs 4H gates and no cell state). Gate order and
    semantics are torch's nn.GRU (r, z, n; the reset gate multiplies the
    *recurrent* candidate term, h @ W_hn, before the tanh), so torch
    checkpoints convert 1:1. Like LSTM above, the input projection is hoisted
    out of the scan into one big MXU matmul."""

    hidden: int
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32
    reverse: bool = False
    unroll: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = x.shape[-1]
        h = self.hidden
        scale = 1.0 / jnp.sqrt(h)

        def uniform_init(key, shape, dtype=self.dtype):
            return jax.random.uniform(key, shape, dtype, -scale, scale)

        w_i = self.param("w_i", uniform_init, (d, 3 * h))
        w_h = self.param("w_h", uniform_init, (h, 3 * h))
        b_i = self.param("b_i", uniform_init, (3 * h,)) if self.use_bias else None
        b_h = self.param("b_h", uniform_init, (3 * h,)) if self.use_bias else None

        xw = jnp.einsum("btd,dh->bth", x, w_i)
        if b_i is not None:
            xw = xw + b_i
        if self.reverse:
            xw = jnp.flip(xw, axis=1)

        init = jnp.zeros((x.shape[0], h), self.dtype)

        def step(hs, xt):
            hg = hs @ w_h
            if b_h is not None:
                hg = hg + b_h
            xr, xz, xn = jnp.split(xt, 3, axis=-1)  # torch gate order (r, z, n)
            hr, hz, hn = jnp.split(hg, 3, axis=-1)
            r = nn.sigmoid(xr + hr)
            z = nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            hs = (1.0 - z) * n + z * hs
            return hs, hs

        _, ys = jax.lax.scan(step, init, jnp.swapaxes(xw, 0, 1),
                             unroll=self.unroll)
        ys = jnp.swapaxes(ys, 0, 1)
        if self.reverse:
            ys = jnp.flip(ys, axis=1)
        return ys


class BiLSTM(nn.Module):
    """Bidirectional LSTM: concat of forward and reverse passes -> [B, T, 2H].

    Parity: nn.LSTM(hidden_size=256, bias=False, bidirectional=True)
    (avse_model.py:542-546, avse_model_final.py:132-133).
    """

    hidden: int
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32
    unroll: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        fwd = LSTM(self.hidden, self.use_bias, self.dtype, reverse=False,
                   unroll=self.unroll, name="fwd")(x)
        bwd = LSTM(self.hidden, self.use_bias, self.dtype, reverse=True,
                   unroll=self.unroll, name="bwd")(x)
        return jnp.concatenate([fwd, bwd], axis=-1)


class BiGRU(nn.Module):
    """Bidirectional GRU: concat of forward and reverse passes -> [B, T, 2H].

    Optional fusion recurrence (--rnn_cell gru); the reference only has the
    bi-LSTM, this is the north-star-sanctioned faster variant."""

    hidden: int
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32
    unroll: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        fwd = GRU(self.hidden, self.use_bias, self.dtype, reverse=False,
                  unroll=self.unroll, name="fwd")(x)
        bwd = GRU(self.hidden, self.use_bias, self.dtype, reverse=True,
                  unroll=self.unroll, name="bwd")(x)
        return jnp.concatenate([fwd, bwd], axis=-1)


class ParallelMixer(nn.Module):
    """Recurrence-free stand-in for the fusion Bi-RNN: one Dense projection
    to the same [B, T, 2H] output shape, fully parallel on the MXU.

    Product option (`--rnn_cell none`) and the decisive ceiling ablation: the
    sequential scan is the fusion step's residual iff replacing it with this
    collapses the step time (see BASELINE.md). No temporal mixing — the
    downstream flatten+FC layers still see all timesteps."""

    hidden: int
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(2 * self.hidden, use_bias=self.use_bias,
                        dtype=self.dtype)(x)


def make_birnn(cell: str, hidden: int, use_bias: bool = False,
               dtype: jnp.dtype = jnp.float32, unroll: int = 1, name: str = "lstm"):
    """Bidirectional recurrence factory for the fusion cores: 'lstm'
    (reference parity), 'gru' (north-star option, fewer sequential matmuls),
    or 'none' (recurrence-free Dense mixer). The flax module name stays
    'lstm' either way so checkpoints keep one param-tree layout per cell
    choice."""
    if cell == "lstm":
        return BiLSTM(hidden, use_bias=use_bias, dtype=dtype, unroll=unroll,
                      name=name)
    if cell == "gru":
        return BiGRU(hidden, use_bias=use_bias, dtype=dtype, unroll=unroll,
                     name=name)
    if cell == "none":
        return ParallelMixer(hidden, use_bias=use_bias, dtype=dtype, name=name)
    raise ValueError(f"unknown rnn cell {cell!r} (lstm|gru|none)")
