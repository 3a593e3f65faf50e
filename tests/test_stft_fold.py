"""Exactness of the generalized minormost-axis lane fold
(ops/pgenc_fold.py fold_kernel_minor / folded_conv2d_minor) and drop-in
equivalence of FoldedConvStack5x5 vs ConvStack on the planned STFT-encoder
stacks (--stft_fold: the enc_a counterpart of --pgenc_kernel fold).

The folded conv must equal the direct k(5,5) torch-padded conv BITWISE in
fp32 up to reduction order (allclose at tight tol), for every stride
combination the plan emits ((2,2) while both dims shrink, (1,2)/(2,1) when
one has reached the phasegram latent), and the stack must match ConvStack's
params, outputs, grads, and running batch_stats so checkpoints interchange.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from maavss_tpu.models.layers import ConvStack, FoldedConvStack5x5
from maavss_tpu.models.shape_plan import ConvSpec, plan_stft_encoder_fusion
from maavss_tpu.ops.pgenc_fold import (
    fold_kernel_minor,
    fold_lanes,
    folded_conv2d_minor,
    plan_folds_minor,
    unfold_lanes,
)


def _direct(x, k, stride):
    return jax.lax.conv_general_dilated(
        x, k, window_strides=stride, padding=((2, 2), (2, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("stride", [(1, 2), (2, 2), (2, 1), (1, 1)])
@pytest.mark.parametrize("f_in,cin,cout,w", [
    (64, 2, 8, 256), (16, 8, 32, 128), (4, 32, 64, 64), (2, 64, 64, 32),
])
def test_folded_conv2d_exact(stride, f_in, cin, cout, w):
    if f_in % stride[1]:
        pytest.skip("fold must be a multiple of the lane-axis stride")
    rng = np.random.default_rng(f_in + cin + stride[0])
    x = jnp.asarray(rng.standard_normal((2, 12, w, cin)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((5, 5, cin, cout)) * 0.1,
                    jnp.float32)
    ref = _direct(x, k, stride)
    f_out = f_in // stride[1]
    got = unfold_lanes(folded_conv2d_minor(fold_lanes(x, f_in), k, f_in,
                                           stride), f_out, cout)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fold_kernel_minor_matches_pgenc_geometry():
    # k=9, stride=2 must reproduce the specialized (1,9) fold geometry
    from maavss_tpu.ops.pgenc_fold import fold_kernel_1x9_s2

    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.standard_normal((1, 9, 4, 8)), jnp.float32)
    for f in (4, 8, 16):
        a = fold_kernel_1x9_s2(k, f)
        b = fold_kernel_minor(k, f, 2)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_plan_folds_minor():
    # the fusion stft-encoder ladder: 2/8/32 channels at S=256/128/64
    folds = plan_folds_minor([2, 8, 32], [256, 128, 64], [2, 2, 2])
    assert folds == [64, 16, 4]
    # stride forbids odd folds; c >= 128 disables folding
    assert plan_folds_minor([128], [64], [2]) == [1]
    # width not divisible by any pow2 fold > 1
    assert plan_folds_minor([2], [257], [1]) == [1]


def _stack_specs():
    specs, _ = plan_stft_encoder_fusion((8, 2, 32, 256), (8, 32), 64)
    assert all(sp.kernel == (5, 5) for sp in specs)
    return tuple(specs)


def test_stack_drop_in_equivalence():
    specs = _stack_specs()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 2, 32, 256)), jnp.float32)

    ref_m = ConvStack(specs)
    fold_m = FoldedConvStack5x5(specs)
    v_ref = ref_m.init(jax.random.PRNGKey(7), x, train=True)
    v_fold = fold_m.init(jax.random.PRNGKey(7), x, train=True)
    # identical param/stats trees (names, shapes, values at the same seed)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        v_ref, v_fold)

    def fwd(module, variables):
        def loss(params):
            out, upd = module.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"])
            return jnp.sum(out * out), (out, upd["batch_stats"])
        (l, (out, bs)), grads = jax.value_and_grad(
            loss, has_aux=True)(variables["params"])
        return l, out, bs, grads

    l_r, out_r, bs_r, g_r = fwd(ref_m, v_ref)
    l_f, out_f, bs_f, g_f = fwd(fold_m, v_fold)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(float(l_f), float(l_r), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4),
        g_f, g_r)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        bs_f, bs_r)


def test_stack_eval_mode_uses_running_stats():
    specs = _stack_specs()
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 2, 32, 256)), jnp.float32)
    ref_m = ConvStack(specs)
    fold_m = FoldedConvStack5x5(specs)
    v = ref_m.init(jax.random.PRNGKey(3), x, train=True)
    out_r = ref_m.apply(v, x, train=False)
    out_f = fold_m.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               rtol=3e-5, atol=3e-5)


def test_fusion_model_stft_fold_switch():
    """--stft_fold fold on the full AVFusionModel: same init tree, same
    fused forward as xla (pure compute-path switch)."""
    from maavss_tpu.models.fusion import AVFusionModel

    kw = dict(stft_shape=(2, 2, 32, 256), pgram_shape=(2, 1, 8, 256),
              latent_channels=16, fc_size=1024)
    rng = np.random.default_rng(4)
    x_a = jnp.asarray(rng.standard_normal(kw["stft_shape"]), jnp.float32)
    x_v = jnp.asarray(rng.standard_normal(kw["pgram_shape"]), jnp.float32)
    m_x = AVFusionModel(stft_fold="xla", **kw)
    m_f = AVFusionModel(stft_fold="fold", **kw)
    v_x = m_x.init(jax.random.PRNGKey(5), x_a, x_v, method=m_x.init_all)
    v_f = m_f.init(jax.random.PRNGKey(5), x_a, x_v, method=m_f.init_all)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        v_x, v_f)
    o_x = m_x.apply(v_x, x_a, x_v)
    o_f = m_f.apply(v_f, x_a, x_v)
    for a, b in zip(jax.tree_util.tree_leaves(o_x),
                    jax.tree_util.tree_leaves(o_f)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=3e-5, atol=3e-5)
