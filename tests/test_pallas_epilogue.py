"""Parity of the fused Pallas BN+phase-max+leaky epilogue
(ops/pallas_epilogue.py) against the unfused XLA stage tail it replaces
(layers.py s2d branch: flax-style BN train stats -> normalize -> phase_max_2x2
-> leaky_relu(0.01)).

Covers: forward values, mu/var outputs, the FULL vjp (dy, dgamma, dbeta,
including the mu/var cotangent paths), odd row counts (ragged pow2 blocking),
the product channel widths C in {16, 32, 64}, bf16 IO, and whole-encoder
equivalence (params, outputs, grads, and running batch_stats updates) between
MAAVSS_EPILOGUE=fused and =xla. Off-TPU the kernels run in interpreter mode,
so this is the CPU-CI value/grad gate; Mosaic lowering is gated separately in
test_mosaic_lowering.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maavss_tpu.models.layers import (
    batchnorm_view_to_phase_channels,
    phase_channels_to_batchnorm_view,
    phase_max_2x2,
)
from maavss_tpu.ops.pallas_epilogue import fused_bn_phasemax_leaky

EPS = 1e-5


def xla_tail(y, gamma, beta):
    """The unfused reference tail, all-fp32 math (the kernel's internal
    precision), returning (out, mu, var) like the fused op."""
    yv = phase_channels_to_batchnorm_view(y).astype(jnp.float32)
    mu = jnp.mean(yv, axis=(0, 1, 2, 3))
    var = jnp.mean(jnp.square(yv), axis=(0, 1, 2, 3)) - jnp.square(mu)
    yn = (yv - mu) * jax.lax.rsqrt(var + EPS) * gamma + beta
    yn = batchnorm_view_to_phase_channels(yn)
    out = jnp.where(yn >= 0, yn, 0.01 * yn)
    return phase_max_2x2(out).astype(y.dtype), mu, var


def _mk(shape, c, seed=0, dtype=jnp.float32, zero_gamma=True):
    rng = np.random.default_rng(seed)
    y = jnp.asarray(rng.standard_normal(shape + (4 * c,)) * 0.7, dtype)
    g = rng.standard_normal(c) * 0.8
    g[: c // 3] = -np.abs(g[: c // 3]) - 0.1  # exercise the min branch
    if zero_gamma:
        # gamma==0 edge: forward = leaky(beta) on all phases. Excluded from
        # the vjp tests — all phases tie there, and jax's reduce_max splits
        # tied cotangents evenly while the kernel routes to one phase (both
        # valid subgradients; gamma is exactly 0 only on a measure-zero set).
        g[c // 3] = 0.0
    gamma = jnp.asarray(g, jnp.float32)
    beta = jnp.asarray(rng.standard_normal(c) * 0.3, jnp.float32)
    return y, gamma, beta


@pytest.mark.parametrize("c", [16, 32, 64])
def test_forward_matches_xla_tail(c):
    y, gamma, beta = _mk((2, 3, 8, 8), c, seed=c)
    out_f, mu_f, var_f = fused_bn_phasemax_leaky(y, gamma, beta)
    out_x, mu_x, var_x = xla_tail(y, gamma, beta)
    np.testing.assert_allclose(mu_f, mu_x, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(var_f, var_x, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out_f, out_x, rtol=1e-5, atol=1e-5)


def test_forward_odd_rows():
    """N = B*T*H*W = 2*1*3*5 = 30 -> row block 2, ragged grid of 15."""
    y, gamma, beta = _mk((2, 1, 3, 5), 16, seed=3)
    out_f, mu_f, var_f = fused_bn_phasemax_leaky(y, gamma, beta)
    out_x, mu_x, var_x = xla_tail(y, gamma, beta)
    np.testing.assert_allclose(mu_f, mu_x, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(out_f, out_x, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("c", [16, 32])
def test_full_vjp_matches_xla_tail(c):
    """d(loss)/d(y, gamma, beta) with cotangents flowing through out AND the
    mu/var outputs (w2/w3 terms) — the complete custom-VJP surface."""
    y, gamma, beta = _mk((2, 2, 4, 6), c, seed=10 + c, zero_gamma=False)
    rng = np.random.default_rng(99)
    w1 = jnp.asarray(rng.standard_normal((2, 2, 4, 6, c)), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal(c), jnp.float32)
    w3 = jnp.asarray(rng.standard_normal(c), jnp.float32)

    def loss(tail):
        def f(y, gamma, beta):
            out, mu, var = tail(y, gamma, beta)
            return (jnp.sum(out.astype(jnp.float32) * w1)
                    + jnp.sum(mu * w2) + jnp.sum(var * w3))
        return f

    gf = jax.grad(loss(fused_bn_phasemax_leaky), argnums=(0, 1, 2))(
        y, gamma, beta)
    gx = jax.grad(loss(xla_tail), argnums=(0, 1, 2))(y, gamma, beta)
    for a, b, name in zip(gf, gx, ("dy", "dgamma", "dbeta")):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5, err_msg=name)


def test_bf16_io():
    y, gamma, beta = _mk((2, 2, 8, 8), 32, seed=7, dtype=jnp.bfloat16,
                         zero_gamma=False)
    out_f, mu_f, var_f = fused_bn_phasemax_leaky(y, gamma, beta)
    out_x, mu_x, var_x = xla_tail(y, gamma, beta)
    assert out_f.dtype == jnp.bfloat16
    np.testing.assert_allclose(mu_f, mu_x, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out_f, np.float32),
                               np.asarray(out_x, np.float32),
                               rtol=2e-2, atol=2e-2)

    def loss(y):
        out, _, _ = fused_bn_phasemax_leaky(y, gamma, beta)
        return jnp.sum(jnp.square(out.astype(jnp.float32)))

    def loss_x(y):
        out, _, _ = xla_tail(y, gamma, beta)
        return jnp.sum(jnp.square(out.astype(jnp.float32)))

    gf = jax.grad(loss)(y)
    gx = jax.grad(loss_x)(y)
    # bf16 rounding creates phase TIES (~0.1% of positions here): the kernel
    # routes the whole pooled gradient to the first tied phase while jax's
    # reduce_max splits it evenly — the documented tie-break deviation.
    # Compare only untied positions; bound how many are excluded.
    yn = np.asarray(y, np.float32).reshape(y.shape[:-1] + (4, 32))
    srt = np.sort(yn, axis=-2)
    tied = (srt[..., 3, :] == srt[..., 2, :]) | (
        srt[..., 0, :] == srt[..., 1, :])
    tied4 = np.repeat(tied[..., None, :], 4, axis=-2).reshape(y.shape)
    assert tied4.mean() < 0.01
    np.testing.assert_allclose(
        np.asarray(gf, np.float32)[~tied4], np.asarray(gx, np.float32)[~tied4],
        rtol=1e-1, atol=3e-2)


def _encoder_run(epilogue, monkeypatch, train=True):
    """FramesVisualEncoder end to end at a small s2d-eligible geometry."""
    monkeypatch.setenv("MAAVSS_S2D_MIN_HW", "8")
    from maavss_tpu.models.fusion_frames import FramesVisualEncoder

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 1, 3, 72, 72)) * 0.5, jnp.float32)
    enc = FramesVisualEncoder(latent_channels=16, conv_impl="s2d",
                              epilogue=epilogue)
    variables = enc.init(jax.random.PRNGKey(0), x, train=True)

    def loss_fn(params):
        out, mut = enc.apply({"params": params,
                              "batch_stats": variables["batch_stats"]},
                             x, train=train, mutable=["batch_stats"])
        return jnp.sum(jnp.square(out)), (out, mut["batch_stats"])

    (l, (out, stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(variables["params"])
    return variables, l, out, stats, grads


@pytest.mark.parametrize("train", [True, False])
def test_encoder_fused_equals_xla(monkeypatch, train):
    """Same init tree, same outputs/grads/batch-stat updates under
    MAAVSS_EPILOGUE fused vs xla (stages 1-2 fused at this geometry; the
    small tail stages fall back identically)."""
    vf, lf, of, sf, gf = _encoder_run("fused", monkeypatch, train)
    vx, lx, ox, sx, gx = _encoder_run("xla", monkeypatch, train)
    # identical param trees (paths AND init values — _BNHolder mirrors
    # TorchBatchNorm's paths so the rng folds agree)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b), vf, vx)
    np.testing.assert_allclose(lf, lx, rtol=1e-4)
    np.testing.assert_allclose(of, ox, rtol=1e-4, atol=1e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5),
        sf, sx)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-4),
        gf, gx)
