"""Space-to-depth conv3d stages (MAAVSS_CONV3D=s2d, layers.py fold helpers):
exact reformulation of the frames trunk's (·,5,5)/p2 conv + BN + (2,2) pool
stages onto 2x2 phase channels. Anchors:

- kernel fold correctness: folded conv == direct conv on random data
- full-encoder equivalence: identical param tree, matching outputs and
  gradients in train mode (BN batch stats included)
- one train step through the product path matches the direct impl
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maavss_tpu.models.layers import (
    fold_conv3d_kernel_2x2,
    phase_max_2x2,
    space_to_depth_2x2,
)


def _direct_conv3d(x, kernel):
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1, 1),
        padding=((1, 1), (2, 2), (2, 2)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def _unfold_2x2(y):
    # inverse of space_to_depth_2x2 (phase-major channels)
    b, d, h, w, c4 = y.shape
    c = c4 // 4
    y = y.reshape(b, d, h, w, 2, 2, c)
    y = jnp.transpose(y, (0, 1, 2, 4, 3, 5, 6))
    return y.reshape(b, d, 2 * h, 2 * w, c)


@pytest.mark.parametrize("cin,cout", [(1, 16), (16, 32)])
def test_folded_kernel_matches_direct_conv(cin, cout):
    rng = np.random.default_rng(cin)
    x = jnp.asarray(rng.standard_normal((2, 3, 16, 12, cin)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 5, 5, cin, cout)) * 0.1,
                    jnp.float32)
    want = _direct_conv3d(x, k)
    got_f = jax.lax.conv_general_dilated(
        space_to_depth_2x2(x), fold_conv3d_kernel_2x2(k),
        window_strides=(1, 1, 1), padding=((1, 1), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    got = _unfold_2x2(got_f)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # the phase max IS the (2,2)/s2 max pool of the unfolded tensor
    from flax import linen as nn

    pool_want = nn.max_pool(want, window_shape=(1, 2, 2), strides=(1, 2, 2))
    # same tolerance as the conv comparison: the folded conv's contraction
    # order differs, so the maxima carry the same ~1e-5 reassociation noise
    np.testing.assert_allclose(np.asarray(phase_max_2x2(got_f)),
                               np.asarray(pool_want), rtol=1e-5, atol=1e-5)


def test_encoder_s2d_matches_direct(monkeypatch):
    """Same variables, matching forward + gradients through the 5-stage
    encoder in train mode (stages 1-3 fold; 4-5 stay direct). The spatial
    cutoff is pinned below the test geometry so folding actually engages
    (production default MAAVSS_S2D_MIN_HW=128 — the on-chip bisection showed
    folding loses below that)."""
    from maavss_tpu.models.fusion_frames import FramesVisualEncoder

    monkeypatch.setenv("MAAVSS_S2D_MIN_HW", "8")

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 1, 4, 48, 48)), jnp.float32)  # NCDHW
    enc_d = FramesVisualEncoder(8, conv_impl="direct", pool_impl="window")
    enc_s = FramesVisualEncoder(8, conv_impl="s2d", pool_impl="window")
    variables = enc_d.init(jax.random.PRNGKey(0), x, train=False)
    vs2 = enc_s.init(jax.random.PRNGKey(0), x, train=False)
    assert (jax.tree_util.tree_map(jnp.shape, variables)
            == jax.tree_util.tree_map(jnp.shape, vs2))

    def run(enc):
        y, mut = enc.apply(variables, x, train=True,
                           mutable=["batch_stats"])
        return y, mut["batch_stats"]

    y_d, bs_d = run(enc_d)
    y_s, bs_s = run(enc_s)
    np.testing.assert_allclose(np.asarray(y_s), np.asarray(y_d),
                               rtol=2e-4, atol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(bs_d),
                    jax.tree_util.tree_leaves(bs_s)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5)

    def loss(enc):
        def f(params):
            y, _ = enc.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"])
            return jnp.mean(jnp.square(y))
        return f

    g_d = jax.grad(loss(enc_d))(variables["params"])
    g_s = jax.grad(loss(enc_s))(variables["params"])
    for a, b in zip(jax.tree_util.tree_leaves(g_d),
                    jax.tree_util.tree_leaves(g_s)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=1e-6)


def test_product_step_s2d_matches_direct(monkeypatch):
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
    for impl in ("direct", "s2d"):
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
    assert losses["s2d"] == pytest.approx(losses["direct"], rel=1e-4)
