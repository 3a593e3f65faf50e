"""Model forward/AE shape tests + ConvStack torch-geometry cross-checks."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from maavss_tpu.models.fusion import AVFusionModel
from maavss_tpu.models.fusion_frames import AVFusionFramesModel
from maavss_tpu.models.layers import BiLSTM, ConvStack
from maavss_tpu.models.legacy import AVModelSTFT, AVSEModel
from maavss_tpu.models.shape_plan import ConvSpec


# ---------------------------------------------------------------------------
# ConvStack vs torch: value-level check of transposed-conv crop semantics
# ---------------------------------------------------------------------------

def test_convtranspose_matches_torch_values():
    spec = ConvSpec(3, 2, (3, 9), (2, 2), (1, 4), transpose=True,
                    output_padding=(1, 1), norm=False, act=None)
    stack = ConvStack((spec,), use_bias=False)
    x = np.random.default_rng(0).standard_normal((1, 3, 5, 7)).astype(np.float32)
    vs = stack.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = np.asarray(stack.apply(vs, jnp.asarray(x)))

    # same kernel in torch layout: flax ConvTranspose kernel is [kh, kw, in, out]
    k = np.asarray(vs["params"]["ConvTranspose_0"]["kernel"])  # [3,9,3,2]
    tlayer = torch.nn.ConvTranspose2d(3, 2, (3, 9), stride=(2, 2), padding=(1, 4),
                                      output_padding=(1, 1), bias=False)
    # torch convT weight: [in, out, kh, kw]; flax conv_transpose applies the
    # kernel unflipped, torch flips — map accordingly
    w = np.flip(k, axis=(0, 1)).transpose(2, 3, 0, 1).copy()
    with torch.no_grad():
        tlayer.weight.copy_(torch.as_tensor(w))
        ref = tlayer(torch.as_tensor(x)).numpy()
    assert y.shape == ref.shape
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-5)


def test_conv_stack_forward_matches_torch_values():
    spec = ConvSpec(2, 4, (5, 5), (2, 2), (2, 2), norm=False, act="tanh")
    stack = ConvStack((spec,), use_bias=False)
    x = np.random.default_rng(1).standard_normal((2, 2, 16, 12)).astype(np.float32)
    vs = stack.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = np.asarray(stack.apply(vs, jnp.asarray(x)))
    k = np.asarray(vs["params"]["Conv_0"]["kernel"])  # [kh, kw, in, out]
    tlayer = torch.nn.Conv2d(2, 4, (5, 5), stride=(2, 2), padding=(2, 2), bias=False)
    with torch.no_grad():
        tlayer.weight.copy_(torch.as_tensor(k.transpose(3, 2, 0, 1).copy()))
        ref = torch.tanh(tlayer(torch.as_tensor(x))).numpy()
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-5)


def test_bilstm_matches_torch():
    b, t, d, h = 2, 6, 8, 5
    x = np.random.default_rng(2).standard_normal((b, t, d)).astype(np.float32)
    m = BiLSTM(h, use_bias=False)
    vs = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = np.asarray(m.apply(vs, jnp.asarray(x)))
    assert y.shape == (b, t, 2 * h)

    ref = torch.nn.LSTM(d, h, num_layers=1, bias=False, batch_first=True,
                        bidirectional=True)
    p = vs["params"]
    with torch.no_grad():
        ref.weight_ih_l0.copy_(torch.as_tensor(np.asarray(p["fwd"]["w_i"]).T.copy()))
        ref.weight_hh_l0.copy_(torch.as_tensor(np.asarray(p["fwd"]["w_h"]).T.copy()))
        ref.weight_ih_l0_reverse.copy_(torch.as_tensor(np.asarray(p["bwd"]["w_i"]).T.copy()))
        ref.weight_hh_l0_reverse.copy_(torch.as_tensor(np.asarray(p["bwd"]["w_h"]).T.copy()))
        out, _ = ref(torch.as_tensor(x))
    np.testing.assert_allclose(y, out.numpy(), rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# Model-level shape parity
# ---------------------------------------------------------------------------

def test_avfusion_model_shapes():
    b = 2
    m = AVFusionModel(stft_shape=(b, 2, 64, 128), pgram_shape=(b, 1, 8, 4096))
    xa = jnp.zeros((b, 2, 64, 128))
    xv = jnp.zeros((b, 1, 8, 4096))
    vs = m.init(jax.random.PRNGKey(0), xa, xv, method="init_all")
    ya, yv, fused = m.apply(vs, xa, xv)
    assert ya.shape == xa.shape  # avse_model.py:709
    assert yv.shape == xv.shape  # avse_model.py:708
    assert fused.shape == (b, 512)  # avse_model.py:553-555
    assert m.apply(vs, xa, method="audio_ae_forward").shape == xa.shape
    assert m.apply(vs, xv, method="visual_ae_forward").shape == xv.shape


def test_avfusion_frames_model_shapes():
    b = 2
    m = AVFusionFramesModel(stft_shape=(b, 2, 64, 129), frame_shape=(b, 1, 8, 64, 64),
                            hops_per_frame=8, latent_channels=16)
    xa = jnp.zeros((b, 2, 64, 129))
    xv = jnp.zeros((b, 1, 8, 64, 64))
    vs = m.init(jax.random.PRNGKey(0), xa, xv, method="init_all")
    ya, yv, fused = m.apply(vs, xa, xv)
    assert ya.shape == (b, 2, 8, 129)  # middle-frame head, avse_model_final.py:272
    assert yv.shape == (b, 1, 64, 64)  # one attention frame, avse_model_final.py:271
    assert fused.shape == (b, 512)
    assert m.apply(vs, xa, method="audio_ae_forward").shape == xa.shape


def test_avfusion_frames_any_latent_channels():
    # the reference crashes for latent_chan != 16 (torch.cat channel mismatch);
    # our planner always meets in the middle (documented deviation)
    b = 1
    m = AVFusionFramesModel(stft_shape=(b, 2, 64, 129), frame_shape=(b, 1, 8, 64, 64),
                            hops_per_frame=8, latent_channels=8)
    xa = jnp.zeros((b, 2, 64, 129))
    xv = jnp.zeros((b, 1, 8, 64, 64))
    vs = m.init(jax.random.PRNGKey(0), xa, xv, method="init_all")
    ya, yv, _ = m.apply(vs, xa, xv)
    assert ya.shape == (b, 2, 8, 129)


def test_avse_model_shapes():
    b = 2
    m = AVSEModel(a_shape=(b, 2, 256), v_shape=(b, 1, 8, 64, 64))
    xa = jnp.zeros((b, 2, 256))
    xv = jnp.zeros((b, 1, 8, 64, 64))
    vs = m.init(jax.random.PRNGKey(0), xa, xv)
    ya, yv = m.apply(vs, xa, xv)
    assert ya.shape == xa.shape and yv.shape == xv.shape


def test_avmodel_stft_ae_shapes():
    b = 2
    m = AVModelSTFT(stft_shape=(b, 2, 48, 128), v_shape=(b, 1, 6, 64, 64), alpha=4)
    xa = jnp.zeros((b, 2, 48, 128))
    xv = jnp.zeros((b, 1, 6, 64, 64))
    vs = m.init(jax.random.PRNGKey(0), xa, xv)
    ya, yv = m.apply(vs, xa, xv)
    # the reference decoder emits (t_latent*4, s_latent*16) — a geometry quirk
    # reproduced faithfully (avse_model.py:253-256)
    assert ya.shape == (b, 2, 24, 128)
    ae = m.apply(vs, xa, method="audio_ae_forward")
    assert ae.shape == (b, 2, 24, 128)


def test_fusion_model_train_mode_updates_batch_stats():
    b = 2
    m = AVFusionModel(stft_shape=(b, 2, 64, 128), pgram_shape=(b, 1, 8, 4096))
    xa = jnp.ones((b, 2, 64, 128))
    xv = jnp.ones((b, 1, 8, 4096))
    vs = m.init(jax.random.PRNGKey(0), xa, xv, method="init_all")
    _, mutated = m.apply(vs, xa, xv, train=True, mutable=["batch_stats"])
    before = jax.tree.leaves(vs["batch_stats"])
    after = jax.tree.leaves(mutated["batch_stats"])
    assert any(not np.allclose(np.asarray(a), np.asarray(bf)) for a, bf in zip(after, before))
