"""Cross-lower every product Pallas kernel for TPU on the CPU host.

Interpret mode proves nothing about the chip (CLAUDE.md: the magphase kernel
compiled in interpret mode but Mosaic has no atan2 lowering; the pgenc
kernel's 3D strided slices compiled in interpret mode but Mosaic's gather
path rejects them — both discovered the expensive way, on hardware).
`jit(fn).trace(args).lower(lowering_platforms=("tpu",))` runs the REAL
Mosaic lowering pipeline device-free, so this file turns that class of
failure into a CI failure: reproduced both historical breakages exactly
(runs/probe_r3c/{validate_pgenc,mosaic_probe}.err).

Lowering success does not guarantee the Mosaic *compiler* accepts the module
(register pressure, scoped-VMEM) or that it is fast — on-chip validation
tools (tools/validate_pallas_*.py) remain the final gate — but every
unsupported-primitive/unsupported-shape failure seen so far raises here.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _lower_tpu(fn, *args):
    return jax.jit(fn).trace(*args).lower(lowering_platforms=("tpu",))


@pytest.fixture()
def real_lowering(monkeypatch):
    """Force interpret=False in every kernel module so pallas_call actually
    goes through Mosaic when cross-lowered (off-TPU the modules default to
    interpreter mode for CPU parity tests)."""
    import maavss_tpu.ops.pallas_adam as pa
    import maavss_tpu.ops.pallas_epilogue as pe
    import maavss_tpu.ops.pallas_kernels as pk
    import maavss_tpu.ops.pallas_lstm as pll
    import maavss_tpu.ops.pallas_pgenc as pg

    for mod in (pa, pe, pk, pll, pg):
        monkeypatch.setattr(mod, "_interpret", lambda: False)


def _stft_ri(seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((2, 4, 33, 16)).astype(np.float32))


def test_polar_and_mask_kernels_lower(real_lowering):
    from maavss_tpu.ops.pallas_kernels import complex_mask_apply, polar_to_rect

    x = _stft_ri()
    _lower_tpu(polar_to_rect, x)
    _lower_tpu(complex_mask_apply, x, _stft_ri(1))
    # backward paths (custom VJPs)
    _lower_tpu(jax.grad(lambda a: jnp.sum(polar_to_rect(a))), x)
    _lower_tpu(jax.grad(lambda a, b: jnp.sum(complex_mask_apply(a, b)),
                        argnums=(0, 1)), x, _stft_ri(1))


def test_magphase_atan2_still_unimplemented(real_lowering):
    """Documents WHY magphase stays XLA in auto mode (ops/pallas_kernels.py):
    Mosaic has no atan2 lowering, measured on chip round 2. If this test ever
    starts failing (i.e. the lowering succeeds), revisit the auto gate."""
    from maavss_tpu.ops.pallas_kernels import magphase

    with pytest.raises(Exception, match="atan2"):
        _lower_tpu(magphase, _stft_ri())


def test_pallas_lstm_lowers_forward_and_backward(real_lowering):
    from maavss_tpu.ops.pallas_lstm import pallas_lstm

    t_len, b, h = 8, 16, 256
    rng = np.random.default_rng(0)
    xw = jnp.asarray(rng.standard_normal((t_len, b, 4 * h)).astype(np.float32))
    w_h = jnp.asarray(rng.standard_normal((h, 4 * h)).astype(np.float32))
    _lower_tpu(pallas_lstm, xw, w_h)
    _lower_tpu(jax.grad(lambda a, w: jnp.sum(pallas_lstm(a, w)),
                        argnums=(0, 1)), xw, w_h)


def test_pallas_adam_leaf_lowers(real_lowering):
    from maavss_tpu.ops.pallas_adam import adam_leaf_update

    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.standard_normal((2048, 128)).astype(np.float32))
    g = 0.1 * p
    c1 = jnp.float32(0.1)
    c2 = jnp.float32(0.001)

    def upd(g, m, v, p):
        return adam_leaf_update(g, m, v, p, c1, c2,
                                lr=1e-3, b1=0.9, b2=0.999, eps=1e-8)

    _lower_tpu(upd, g, jnp.zeros_like(p), jnp.zeros_like(p), p)


@pytest.mark.parametrize("tap_mode", ["dense", "strided"])
def test_pgenc_lowers_train_eval_backward(real_lowering, tap_mode):
    """The fused phasegram-encoder layer: train fwd (two-pass stats), eval,
    and the custom-VJP backward, both tap modes, on a mid-stack geometry.
    Guards the historical failure: `yc[:, :, ::2]` lowered through a 3D
    gather and died on chip (runs/probe_r3c/validate_pgenc.err)."""
    from maavss_tpu.ops.pallas_pgenc import (
        fused_conv_bn_tanh_eval, fused_conv_bn_tanh_train,
    )

    c_in, c_out, r, s = 4, 8, 64, 256
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((c_in, r, s)).astype(np.float32))
    w2 = jnp.asarray(
        rng.standard_normal((c_out, 9 * c_in)).astype(np.float32))
    cb = jnp.zeros((c_out,), jnp.float32)
    gamma = jnp.ones((c_out,), jnp.float32)
    beta = jnp.zeros((c_out,), jnp.float32)

    def train(x, w2, cb, gamma, beta):
        return fused_conv_bn_tanh_train(tap_mode, x, w2, cb, gamma, beta)

    _lower_tpu(train, x, w2, cb, gamma, beta)

    def loss(x, w2, gamma, beta):
        y, _, _ = fused_conv_bn_tanh_train(tap_mode, x, w2, cb, gamma, beta)
        return jnp.sum(y * y)

    _lower_tpu(jax.grad(loss, argnums=(0, 1, 2, 3)), x, w2, gamma, beta)

    def ev(x, w2, cb, gamma, beta, mu, var):
        return fused_conv_bn_tanh_eval(tap_mode, x, w2, cb, gamma, beta,
                                       mu, var)

    _lower_tpu(ev, x, w2, cb, gamma, beta,
               jnp.zeros((c_out,), jnp.float32),
               jnp.ones((c_out,), jnp.float32))


@pytest.mark.parametrize("c,dtype", [(16, jnp.bfloat16), (32, jnp.bfloat16),
                                     (64, jnp.float32)])
def test_fused_epilogue_lowers_forward_and_backward(real_lowering, c, dtype):
    """The frames-stage fused BN+phase-max+leaky epilogue
    (ops/pallas_epilogue.py) at the product channel widths: C=16 (stage 1,
    64-lane blocks with static 16-lane phase slices — the narrowest layout),
    C=32 (stage 2), C=64 (stage 3 if the s2d cutoff is lowered). Guards the
    lane-slice/concat lowering and both grid-accumulator reductions."""
    from maavss_tpu.ops.pallas_epilogue import fused_bn_phasemax_leaky

    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((2, 2, 16, 16, 4 * c)), dtype)
    gamma = jnp.asarray(rng.standard_normal(c), jnp.float32)
    beta = jnp.asarray(rng.standard_normal(c), jnp.float32)
    _lower_tpu(fused_bn_phasemax_leaky, y, gamma, beta)

    def loss(y, gamma, beta):
        out, mu, var = fused_bn_phasemax_leaky(y, gamma, beta)
        return (jnp.sum(jnp.square(out.astype(jnp.float32)))
                + jnp.sum(mu) + jnp.sum(var))

    _lower_tpu(jax.grad(loss, argnums=(0, 1, 2)), y, gamma, beta)


def test_pgenc_first_and_last_planned_layers_lower(real_lowering):
    """The extreme geometries of the planned 10-layer stack (p_size 64:
    S=4096 first layer, narrow tail) exercise the row-block sizing."""
    from maavss_tpu.ops.pallas_pgenc import fused_conv_bn_tanh_train

    rng = np.random.default_rng(1)
    for c_in, c_out, r, s in [(1, 4, 128, 4096), (16, 16, 128, 8)]:
        x = jnp.asarray(rng.standard_normal((c_in, r, s)).astype(np.float32))
        w2 = jnp.asarray(
            rng.standard_normal((c_out, 9 * c_in)).astype(np.float32))
        aff = jnp.zeros((c_out,), jnp.float32)

        def train(x, w2, cb, gamma, beta):
            return fused_conv_bn_tanh_train("dense", x, w2, cb, gamma, beta)

        _lower_tpu(train, x, w2, aff, jnp.ones_like(aff), aff)
