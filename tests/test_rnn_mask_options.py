"""GRU recurrence option + complex-ratio-mask head + Pallas polar wiring.

Round-2 additions: the north star allows a GRU fusion cell (fewer sequential
matmuls than the reference's bi-LSTM, avse_model.py:542-546) and asks for the
complex-mask application to run through the fused Pallas kernel on a product
path. These tests pin torch parity for the GRU, multiplicative-head semantics
for the mask head, and jnp-parity for the Pallas polar feature conversions.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from maavss_tpu.config import RunConfig
from maavss_tpu.models.fusion import AVFusionModel
from maavss_tpu.models.layers import BiGRU, make_birnn


def test_bigru_matches_torch():
    b, t, d, h = 2, 6, 8, 5
    x = np.random.default_rng(3).standard_normal((b, t, d)).astype(np.float32)
    m = BiGRU(h, use_bias=False)
    vs = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = np.asarray(m.apply(vs, jnp.asarray(x)))
    assert y.shape == (b, t, 2 * h)

    ref = torch.nn.GRU(d, h, num_layers=1, bias=False, batch_first=True,
                       bidirectional=True)
    p = vs["params"]
    with torch.no_grad():
        ref.weight_ih_l0.copy_(torch.as_tensor(np.asarray(p["fwd"]["w_i"]).T.copy()))
        ref.weight_hh_l0.copy_(torch.as_tensor(np.asarray(p["fwd"]["w_h"]).T.copy()))
        ref.weight_ih_l0_reverse.copy_(torch.as_tensor(np.asarray(p["bwd"]["w_i"]).T.copy()))
        ref.weight_hh_l0_reverse.copy_(torch.as_tensor(np.asarray(p["bwd"]["w_h"]).T.copy()))
        out, _ = ref(torch.as_tensor(x))
    np.testing.assert_allclose(y, out.numpy(), rtol=1e-4, atol=1e-5)


def test_make_birnn_rejects_unknown_cell():
    with pytest.raises(ValueError):
        make_birnn("elman", 8)


def _tiny_fusion(**kw):
    cfg = RunConfig(num_frames=4, num_seq=4, hops_per_frame=4, fft_len=64,
                    p_size=16, latent_chan=8, fc_size=256)
    t_stft = cfg.hops_per_frame * cfg.num_frames
    model = AVFusionModel(
        stft_shape=(2, 2, t_stft, cfg.fft_len // 2),
        pgram_shape=(2, 1, cfg.num_frames, cfg.p_size**2),
        latent_channels=cfg.latent_chan, fc_size=cfg.fc_size, **kw)
    x_a = jnp.asarray(np.random.default_rng(0).standard_normal(model.stft_shape),
                      jnp.float32)
    x_v = jnp.asarray(np.random.default_rng(1).standard_normal(model.pgram_shape),
                      jnp.float32)
    vs = model.init(jax.random.PRNGKey(0), x_a, x_v, method=model.init_all)
    return cfg, model, vs, x_a, x_v


def test_fusion_gru_forward_and_grad():
    _, model, vs, x_a, x_v = _tiny_fusion(rnn_cell="gru")
    assert "w_i" in vs["params"]["lstm"]["fwd"]
    # GRU gates are 3H wide (LSTM would be 4H)
    assert vs["params"]["lstm"]["fwd"]["w_i"].shape[-1] == 3 * 256

    def loss(params):
        ya, yv, _ = model.apply({"params": params, "batch_stats": vs["batch_stats"]},
                                x_a, x_v)
        return jnp.mean(ya**2) + jnp.mean(yv**2)

    l, g = jax.value_and_grad(loss)(vs["params"])
    assert np.isfinite(float(l))
    gnorm = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0


def test_mask_head_is_multiplicative_and_trains():
    _, model, vs, x_a, x_v = _tiny_fusion(mask_head=True)
    apply = lambda xa: model.apply(  # noqa: E731
        {"params": vs["params"], "batch_stats": vs["batch_stats"]}, xa, x_v)
    ya, _, _ = apply(x_a)
    assert ya.shape == x_a.shape
    # multiplicative head: zero audio input => zero separated output
    ya0, _, _ = apply(jnp.zeros_like(x_a))
    np.testing.assert_allclose(np.asarray(ya0), 0.0, atol=1e-6)
    # gradients flow through the custom-VJP kernel into the head weights
    def loss(params):
        ya, _, _ = model.apply({"params": params, "batch_stats": vs["batch_stats"]},
                               x_a, x_v)
        return jnp.mean((ya - x_a) ** 2)

    g = jax.grad(loss)(vs["params"])
    gn = float(jnp.sum(jnp.abs(g["a_fc1"]["kernel"])))
    assert np.isfinite(gn) and gn > 0


def test_mask_head_matches_manual_complex_product():
    """The masked output must equal (re,im) complex multiply of input and the
    head's mask prediction — recompute the mask by running the non-mask model
    with identical params (leaky_relu removed => the raw head IS the mask)."""
    _, model, vs, x_a, x_v = _tiny_fusion(mask_head=True)
    ya, _, _ = model.apply({"params": vs["params"], "batch_stats": vs["batch_stats"]},
                           x_a, x_v)
    # recompute the mask via the module interface: bind and call the pieces
    bound = model.bind({"params": vs["params"], "batch_stats": vs["batch_stats"]})
    fused = bound.av_fusion_forward(bound.stft_encoder(x_a, False),
                                    bound.phasegram_encoder(x_v, False))
    mask = bound.a_fc1(fused).reshape(x_a.shape)
    sre, sim = x_a[:, 0], x_a[:, 1]
    mre, mim = mask[:, 0], mask[:, 1]
    want = jnp.stack([sre * mre - sim * mim, sre * mim + sim * mre], axis=1)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_fusion_step_gru_mask_head_loss_decreases():
    from maavss_tpu.data.synthetic import synthetic_av_batch
    from maavss_tpu.train.state import create_train_state, make_optimizer
    from maavss_tpu.train.steps import make_fusion_step

    cfg = RunConfig(num_frames=4, num_seq=4, hops_per_frame=4, fft_len=64,
                    p_size=16, latent_chan=8, fc_size=256, learning_rate=1e-3,
                    rnn_cell="gru", mask_head=True, batch_size=2)
    t_stft = cfg.hops_per_frame * cfg.num_frames
    model = AVFusionModel(
        stft_shape=(2, 2, t_stft, cfg.fft_len // 2),
        pgram_shape=(2, 1, cfg.num_frames, cfg.p_size**2),
        latent_channels=cfg.latent_chan, fc_size=cfg.fc_size,
        rnn_cell="gru", mask_head=True)
    x_a = jnp.zeros(model.stft_shape, jnp.float32)
    x_v = jnp.zeros(model.pgram_shape, jnp.float32)
    vs = model.init(jax.random.PRNGKey(0), x_a, x_v, method=model.init_all)
    state = create_train_state(vs, make_optimizer(cfg.learning_rate, "adam"))
    step = make_fusion_step(model, cfg)
    batch = synthetic_av_batch(cfg, 2, seed=0)
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    losses = []
    rng = jax.random.PRNGKey(0)
    for i in range(8):
        state, metrics = step(state, batch, rng, jnp.int32(2))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_pallas_polar_features_match_jnp():
    from maavss_tpu.ops.stft import istft_features, stft_features

    audio = np.random.default_rng(0).standard_normal((2, 1024)).astype(np.float32)
    ref = np.asarray(stft_features(jnp.asarray(audio), 64, 16,
                                            polar=True, pallas=False))
    # interpret-mode Pallas on CPU exercises the same kernel code as TPU
    got = np.asarray(stft_features(jnp.asarray(audio), 64, 16,
                                            polar=True, pallas=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    # inverse: polar features -> audio, pallas vs jnp path
    inv_plain = np.asarray(istft_features(jnp.asarray(ref), 64, 16,
                                                   polar=True, pallas=False))
    inv_pallas = np.asarray(istft_features(jnp.asarray(ref), 64, 16,
                                                    polar=True, pallas=True))
    np.testing.assert_allclose(inv_pallas, inv_plain, rtol=1e-5, atol=1e-6)
    # (an exact audio round trip is impossible here by design: stft_features
    # drops the last frame + Nyquist bin for reference parity,
    # av_dataset.py:171-174 — exact-inverse coverage lives in test_stft.py)


def test_magphase_polar_vjps():
    """Analytic custom VJPs agree with jnp autodiff of the same math."""
    from maavss_tpu.ops.pallas_kernels import magphase, polar_to_rect

    rng = np.random.default_rng(5)
    ri = jnp.asarray(rng.standard_normal((2, 2, 8, 128)).astype(np.float32)) + 0.5

    def jnp_magphase(x):
        re, im = x[..., 0, :, :], x[..., 1, :, :]
        return jnp.stack([jnp.sqrt(re**2 + im**2), jnp.arctan2(im, re)], axis=-3)

    g = jnp.asarray(rng.standard_normal(ri.shape).astype(np.float32))
    _, vjp = jax.vjp(magphase, ri)
    _, vjp_ref = jax.vjp(jnp_magphase, ri)
    np.testing.assert_allclose(np.asarray(vjp(g)[0]), np.asarray(vjp_ref(g)[0]),
                               rtol=1e-4, atol=1e-5)

    mp = jnp_magphase(ri)

    def jnp_polar(x):
        m, p = x[..., 0, :, :], x[..., 1, :, :]
        return jnp.stack([m * jnp.cos(p), m * jnp.sin(p)], axis=-3)

    _, vjp2 = jax.vjp(polar_to_rect, mp)
    _, vjp2_ref = jax.vjp(jnp_polar, mp)
    np.testing.assert_allclose(np.asarray(vjp2(g)[0]), np.asarray(vjp2_ref(g)[0]),
                               rtol=1e-4, atol=1e-5)


def test_fusion_none_cell_forward_and_grad():
    """--rnn_cell none: recurrence-free Dense mixer (the ceiling ablation and
    a product option) — same output shapes, gradients flow."""
    _, model, vs, x_a, x_v = _tiny_fusion(rnn_cell="none")
    # one Dense kernel instead of fwd/bwd scan cells
    assert "kernel" in vs["params"]["lstm"]["Dense_0"]

    def loss(params):
        ya, yv, _ = model.apply({"params": params, "batch_stats": vs["batch_stats"]},
                                x_a, x_v)
        return jnp.mean(ya**2) + jnp.mean(yv**2)

    l, g = jax.value_and_grad(loss)(vs["params"])
    assert np.isfinite(float(l))
    gn = float(jnp.sum(jnp.abs(g["lstm"]["Dense_0"]["kernel"])))
    assert np.isfinite(gn) and gn > 0


def _tiny_frames(**kw):
    cfg = RunConfig(num_frames=4, num_seq=4, hops_per_frame=4, fft_len=64,
                    p_size=16, fc_size=256, framesize=24, batch_size=2,
                    learning_rate=1e-3, **{k: v for k, v in kw.items()
                                           if hasattr(RunConfig, k)})
    from maavss_tpu.train.setup import build_frames_model

    model, state = build_frames_model(cfg, cfg.batch_size, cfg.framesize)
    return cfg, model, state


def test_frames_mask_head_masks_middle_columns():
    """--mask_head on the final model family: the audio head must be a
    complex ratio mask applied to the MIDDLE frame's hops_per_frame columns
    of the input mixture window (the columns the middle-frame objective
    predicts, avse_model_final.py:203-213)."""
    cfg, model, state = _tiny_frames(mask_head=True)
    assert model.mask_head and model.mask_mid_frame == (cfg.num_seq - 1) // 2
    rng = np.random.default_rng(0)
    x_a = jnp.asarray(rng.standard_normal(model.stft_shape), jnp.float32)
    x_v = jnp.asarray(rng.standard_normal(model.frame_shape), jnp.float32)
    vars_ = {"params": state.params, "batch_stats": state.batch_stats}
    ya, yv, _ = model.apply(vars_, x_a, x_v)
    a = cfg.hops_per_frame
    assert ya.shape == (2, 2, a, cfg.fft_len // 2 + 1)
    # multiplicative: zero mixture => zero separated output
    ya0, _, _ = model.apply(vars_, jnp.zeros_like(x_a), x_v)
    np.testing.assert_allclose(np.asarray(ya0), 0.0, atol=1e-6)
    # equals the manual complex product on the middle columns
    bound = model.bind(vars_)
    fused = bound.av_fusion_forward(bound.stft_encoder(x_a, False),
                                    bound.visual_encoder(x_v, False))
    mask = bound.a_fc1(fused).reshape(ya.shape)
    lo = model.mask_mid_frame * a
    x_mid = x_a[:, :, lo:lo + a]
    sre, sim = x_mid[:, 0], x_mid[:, 1]
    mre, mim = mask[:, 0], mask[:, 1]
    want = jnp.stack([sre * mre - sim * mim, sre * mim + sim * mre], axis=1)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_frames_step_mask_head_loss_decreases():
    from maavss_tpu.data.synthetic import synthetic_av_batch
    from maavss_tpu.train.steps import make_frames_step

    cfg, model, state = _tiny_frames(mask_head=True)
    step = make_frames_step(model, cfg)
    batch = synthetic_av_batch(cfg, cfg.batch_size, seed=0,
                               frame_size=cfg.framesize)
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    losses = []
    for i in range(8):
        state, m = step(state, batch, jax.random.PRNGKey(0), jnp.int32(2))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_frames_mask_head_rejects_polar():
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        _tiny_frames(mask_head=True, use_polar=True)
