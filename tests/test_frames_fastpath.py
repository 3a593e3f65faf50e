"""Frames visual encoder fast paths (layers.Conv3dDepthTaps +
max_pool_reshape): exact-math equivalence with the direct nn.Conv /
reduce_window forms, identical param trees, matching gradients."""

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from maavss_tpu.models.fusion_frames import FramesVisualEncoder
from maavss_tpu.models.layers import Conv3dDepthTaps, max_pool_reshape


def test_conv3d_taps_matches_direct():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 4, 12, 12, 3)).astype(np.float32))

    direct = nn.Conv(5, kernel_size=(3, 5, 5), strides=(1, 1, 1),
                     padding=((1, 1), (2, 2), (2, 2)), use_bias=False)
    taps = Conv3dDepthTaps(5, kernel_size=(3, 5, 5),
                           padding=((1, 1), (2, 2), (2, 2)), use_bias=False)
    vd = direct.init(jax.random.PRNGKey(3), x)
    vt = taps.init(jax.random.PRNGKey(3), x)
    # identical param shapes AND identical init values (same path + shape)
    assert (vd["params"]["kernel"].shape == vt["params"]["kernel"].shape
            == (3, 5, 5, 3, 5))
    np.testing.assert_allclose(np.asarray(vd["params"]["kernel"]),
                               np.asarray(vt["params"]["kernel"]))

    yd = direct.apply(vd, x)
    yt = taps.apply(vd, x)  # direct's params drive the taps impl
    assert yd.shape == yt.shape
    np.testing.assert_allclose(np.asarray(yd), np.asarray(yt),
                               rtol=1e-5, atol=1e-5)

    gd = jax.grad(lambda v: jnp.sum(direct.apply(v, x) ** 2))(vd)
    gt = jax.grad(lambda v: jnp.sum(taps.apply(v, x) ** 2))(vd)
    np.testing.assert_allclose(np.asarray(gd["params"]["kernel"]),
                               np.asarray(gt["params"]["kernel"]),
                               rtol=1e-4, atol=1e-4)


def test_conv3d_taps_asymmetric_padding_shape():
    x = jnp.zeros((1, 4, 10, 10, 2))
    m = Conv3dDepthTaps(4, kernel_size=(3, 5, 5),
                        padding=((1, 1), (3, 3), (3, 3)), use_bias=False)
    v = m.init(jax.random.PRNGKey(0), x)
    ref = nn.Conv(4, kernel_size=(3, 5, 5), strides=(1, 1, 1),
                  padding=((1, 1), (3, 3), (3, 3)), use_bias=False)
    assert m.apply(v, x).shape == ref.apply(v, x).shape


def test_max_pool_reshape_matches_reduce_window():
    rng = np.random.default_rng(1)
    for p, hw in ((2, 16), (3, 16)):  # 16%3 != 0 exercises the VALID crop
        x = jnp.asarray(rng.standard_normal((2, 3, hw, hw, 4)).astype(np.float32))
        a = max_pool_reshape(x, p)
        b = nn.max_pool(x, window_shape=(1, p, p), strides=(1, p, p))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_frames_encoder_impls_agree_end_to_end():
    """Full 5-stage encoder: direct and fast impls share one param tree and
    produce the same output (eval mode, fp32)."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 1, 4, 48, 48)).astype(np.float32))

    enc_d = FramesVisualEncoder(latent_channels=16, conv_impl="direct",
                                pool_impl="window")
    enc_f = FramesVisualEncoder(latent_channels=16, conv_impl="taps",
                                pool_impl="reshape")
    v = enc_d.init(jax.random.PRNGKey(0), x)
    v2 = enc_f.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)

    yd = enc_d.apply(v, x, train=False)
    yf = enc_f.apply(v, x, train=False)
    assert yd.shape == yf.shape
    np.testing.assert_allclose(np.asarray(yd), np.asarray(yf),
                               rtol=1e-4, atol=1e-4)
