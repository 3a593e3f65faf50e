"""Temporal-fold conv3d stages (MAAVSS_CONV3D=tfold, layers.py
time_fold_3taps / conv2d_timefold): exact reformulation of the frames
trunk's stride-1 (3,·,·) conv3d as ONE 2D conv over 3x time-folded
channels, composed with the 2x2 space-to-depth fold on eligible stages.
Anchors (mirror of tests/test_frames_s2d.py):

- kernel/tap fold correctness: folded 2D conv == direct conv3d
- composition with the s2d fold matches the direct conv + pool
- full-encoder equivalence: identical param tree, matching outputs and
  gradients in train mode (BN batch stats included)
- one train step through the product path matches the direct impl
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maavss_tpu.models.layers import (
    conv2d_timefold,
    fold_conv3d_kernel_2x2,
    phase_max_2x2,
    space_to_depth_2x2,
)


def _direct_conv3d(x, kernel, pad):
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1, 1),
        padding=((1, 1), pad, pad),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


@pytest.mark.parametrize("cin,cout,pad", [(1, 16, (2, 2)), (16, 32, (2, 2)),
                                          (16, 8, (3, 3))])
def test_timefold_matches_direct_conv3d(cin, cout, pad):
    rng = np.random.default_rng(cin)
    x = jnp.asarray(rng.standard_normal((2, 5, 12, 10, cin)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 5, 5, cin, cout)) * 0.1,
                    jnp.float32)
    want = _direct_conv3d(x, k, pad)
    got = conv2d_timefold(x, k, ((pad[0], pad[0]), (pad[1], pad[1])))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_timefold_composes_with_s2d():
    """tfold on the s2d-folded stage (the production stage-1/2 path):
    conv2d over 12C time+phase channels == direct conv3d, and the phase max
    still equals the (2,2)/s2 pool."""
    from flax import linen as nn

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 4, 16, 12, 3)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 5, 5, 3, 8)) * 0.1, jnp.float32)
    want = _direct_conv3d(x, k, (2, 2))
    pool_want = nn.max_pool(want, window_shape=(1, 2, 2), strides=(1, 2, 2))
    got_f = conv2d_timefold(space_to_depth_2x2(x), fold_conv3d_kernel_2x2(k),
                            ((1, 1), (1, 1)))
    np.testing.assert_allclose(np.asarray(phase_max_2x2(got_f)),
                               np.asarray(pool_want), rtol=1e-5, atol=1e-5)


def test_encoder_tfold_matches_direct(monkeypatch):
    """Same variables, matching forward + gradients through the 5-stage
    encoder in train mode: stages 1-3 run s2d+tfold, 4-5 tfold-only."""
    from maavss_tpu.models.fusion_frames import FramesVisualEncoder

    monkeypatch.setenv("MAAVSS_S2D_MIN_HW", "8")

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 1, 4, 48, 48)), jnp.float32)  # NCDHW
    enc_d = FramesVisualEncoder(8, conv_impl="direct", pool_impl="window")
    enc_t = FramesVisualEncoder(8, conv_impl="tfold", pool_impl="window")
    variables = enc_d.init(jax.random.PRNGKey(0), x, train=False)
    vt = enc_t.init(jax.random.PRNGKey(0), x, train=False)
    assert (jax.tree_util.tree_map(jnp.shape, variables)
            == jax.tree_util.tree_map(jnp.shape, vt))

    def run(enc):
        y, mut = enc.apply(variables, x, train=True,
                           mutable=["batch_stats"])
        return y, mut["batch_stats"]

    y_d, bs_d = run(enc_d)
    y_t, bs_t = run(enc_t)
    np.testing.assert_allclose(np.asarray(y_t), np.asarray(y_d),
                               rtol=2e-4, atol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(bs_d),
                    jax.tree_util.tree_leaves(bs_t)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5)

    # Gradient equivalence is checked in float64: in f32 the ~1e-6 forward
    # reassociation noise occasionally flips a max-pool argmax, rerouting
    # that window's gradient (an O(grad) difference on a measure-zero-ish
    # set — the same tie-class caveat as max_pool_reshape). In f64 the two
    # impls agree to ~1e-14 (exactness, not tolerance).
    jax.config.update("jax_enable_x64", True)
    try:
        x64 = jnp.asarray(np.asarray(x), jnp.float64)
        enc_d64 = FramesVisualEncoder(8, conv_impl="direct",
                                      pool_impl="window", dtype=jnp.float64)
        enc_t64 = FramesVisualEncoder(8, conv_impl="tfold",
                                      pool_impl="window", dtype=jnp.float64)
        v64 = enc_d64.init(jax.random.PRNGKey(0), x64, train=False)

        def loss(enc):
            def f(params):
                y, _ = enc.apply(
                    {"params": params, "batch_stats": v64["batch_stats"]},
                    x64, train=True, mutable=["batch_stats"])
                return jnp.mean(jnp.square(y))
            return f

        g_d = jax.grad(loss(enc_d64))(v64["params"])
        g_t = jax.grad(loss(enc_t64))(v64["params"])
        for a, b in zip(jax.tree_util.tree_leaves(g_d),
                        jax.tree_util.tree_leaves(g_t)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-9, atol=1e-12)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_product_step_tfold_matches_direct(monkeypatch):
    from maavss_tpu.config import RunConfig
    from maavss_tpu.data.synthetic import synthetic_av_batch
    from maavss_tpu.models.fusion_frames import AVFusionFramesModel
    from maavss_tpu.train.state import create_train_state, make_optimizer
    from maavss_tpu.train.steps import make_frames_step

    cfg = RunConfig(num_frames=2, num_seq=2, hops_per_frame=4, fft_len=64,
                    p_size=16, latent_chan=8, fc_size=256,
                    learning_rate=1e-3, framesize=24, batch_size=2)
    t_stft = cfg.hops_per_frame * cfg.num_frames
    ss = (2, 2, t_stft, cfg.fft_len // 2 + 1)
    fs = (2, 1, cfg.num_frames, cfg.framesize, cfg.framesize)
    batch = synthetic_av_batch(cfg, 2, seed=0, frame_size=cfg.framesize)

    losses = {}
    monkeypatch.setenv("MAAVSS_S2D_MIN_HW", "8")
    for impl in ("direct", "tfold"):
        monkeypatch.setenv("MAAVSS_CONV3D", impl)
        model = AVFusionFramesModel(stft_shape=ss, frame_shape=fs,
                                    hops_per_frame=cfg.hops_per_frame,
                                    latent_channels=8)
        vs = model.init(jax.random.PRNGKey(0), jnp.zeros(ss), jnp.zeros(fs),
                        method=model.init_all)
        state = create_train_state(vs, make_optimizer(1e-3, "sgd"))
        step = make_frames_step(model, cfg)
        state, metrics = step(state, batch, jax.random.PRNGKey(0),
                              jnp.int32(2))
        losses[impl] = float(metrics["loss"])
    assert losses["tfold"] == pytest.approx(losses["direct"], rel=1e-4)
