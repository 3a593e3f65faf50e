"""Exactness of the lane-folded phasegram-encoder conv (ops/pgenc_fold.py)
against the direct k(1,9)/s(1,2)/p(0,4) convolution, and param-tree parity
of the FoldedConvStack1x9 executor vs ConvStack (so --pgenc_kernel fold is
a pure compute-path switch; reference stack: avse_model.py:427-446)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maavss_tpu.ops.pgenc_fold import (
    fold_kernel_1x9_s2,
    fold_lanes,
    folded_conv_1x9_s2,
    plan_folds,
    unfold_lanes,
)


def direct_conv(x, kernel):
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 2), padding=((0, 0), (4, 4)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("f_in,cin,cout,w", [
    (2, 64, 64, 16),
    (4, 32, 64, 64),
    (8, 16, 32, 64),
    (64, 2, 4, 256),
    (128, 1, 2, 512),
])
def test_folded_conv_exact(f_in, cin, cout, w):
    rng = np.random.default_rng(f_in + cin)
    x = jnp.asarray(rng.standard_normal((3, 2, w, cin)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 9, cin, cout)) * 0.2, jnp.float32)

    ref = direct_conv(x, k)
    out_f = folded_conv_1x9_s2(fold_lanes(x, f_in), k, f_in)
    out = unfold_lanes(out_f, f_in // 2, cout)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_folded_conv_grads_exact():
    f_in, cin, cout, w = 8, 16, 32, 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 2, w, cin)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 9, cin, cout)) * 0.2, jnp.float32)
    t = jnp.asarray(rng.standard_normal((2, 2, w // 2, cout)), jnp.float32)

    def loss_ref(x, k):
        return jnp.sum(direct_conv(x, k) * t)

    def loss_fold(x, k):
        y = folded_conv_1x9_s2(fold_lanes(x, f_in), k, f_in)
        return jnp.sum(unfold_lanes(y, f_in // 2, cout) * t)

    gr = jax.grad(loss_ref, argnums=(0, 1))(x, k)
    gf = jax.grad(loss_fold, argnums=(0, 1))(x, k)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_fold_kernel_density():
    """Every original tap appears exactly once per (output slot, ci, co)."""
    k = jnp.arange(9, dtype=jnp.float32).reshape(1, 9, 1, 1) + 1.0
    kf = np.asarray(fold_kernel_1x9_s2(k, 8))  # [1, 3, 8, 4]
    for s in range(4):
        vals = sorted(v for v in kf[0, :, :, s].ravel() if v != 0.0)
        assert vals == list(range(1, 10)), (s, vals)


def test_plan_folds_product_stack():
    chans = [1, 2, 4, 8, 16, 32, 64, 64, 64, 64]
    folds = plan_folds(chans, 4096, lane_target=128)
    assert folds == [128, 64, 32, 16, 8, 4, 2, 2, 2, 2]
    s = 4096
    for c, f in zip(chans, folds):
        assert s % f == 0 and f * c <= 128
        s //= 2


def test_folded_stack_matches_convstack():
    """FoldedConvStack1x9 == ConvStack on the planned encoder: identical
    param/batch_stats trees AND identical outputs (train + eval)."""
    from maavss_tpu.models.layers import ConvStack, FoldedConvStack1x9
    from maavss_tpu.models.shape_plan import plan_phasegram_encoder

    specs, _ = plan_phasegram_encoder((4, 1, 2, 256), 16, 256)
    assert len(specs) >= 3
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 1, 2, 256)), jnp.float32)

    ref = ConvStack(tuple(specs))
    fold = FoldedConvStack1x9(tuple(specs))
    v_ref = ref.init(jax.random.PRNGKey(7), x, True)
    v_fold = fold.init(jax.random.PRNGKey(7), x, True)

    flat_r = jax.tree_util.tree_leaves_with_path(v_ref)
    flat_f = jax.tree_util.tree_leaves_with_path(v_fold)
    assert [p for p, _ in flat_r] == [p for p, _ in flat_f]
    for (p, a), (_, b) in zip(flat_r, flat_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0,
                                   err_msg=str(p))

    out_r, mut_r = ref.apply(v_ref, x, True, mutable=["batch_stats"])
    out_f, mut_f = fold.apply(v_ref, x, True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               rtol=2e-5, atol=2e-5)
    for (p, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(mut_r),
            jax.tree_util.tree_leaves_with_path(mut_f)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5, err_msg=str(p))

    out_re = ref.apply(v_ref, x, False)
    out_fe = fold.apply(v_ref, x, False)
    np.testing.assert_allclose(np.asarray(out_fe), np.asarray(out_re),
                               rtol=2e-5, atol=2e-5)
