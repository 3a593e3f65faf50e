"""Fused Pallas LSTM: value + gradient parity against the lax.scan reference
(models/layers.LSTM math), interpret mode on CPU."""

import numpy as np

import jax
import jax.numpy as jnp

from maavss_tpu.ops.pallas_lstm import pallas_lstm

T, B, H = 6, 8, 16


def scan_lstm(xw, w_h):
    """The exact recurrence from models/layers.LSTM (torch gate order)."""
    h_dim = w_h.shape[0]

    def step(carry, xt):
        hs, cs = carry
        gates = xt + hs @ w_h
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        cs = f * cs + i * g
        hs = o * jnp.tanh(cs)
        return (hs, cs), hs

    init = (jnp.zeros((xw.shape[1], h_dim)), jnp.zeros((xw.shape[1], h_dim)))
    _, ys = jax.lax.scan(step, init, xw)
    return ys


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    xw = jnp.asarray(rng.standard_normal((T, B, 4 * H)).astype(np.float32) * 0.5)
    w_h = jnp.asarray(rng.standard_normal((H, 4 * H)).astype(np.float32) * 0.2)
    return xw, w_h


def test_forward_matches_scan():
    xw, w_h = _inputs(0)
    np.testing.assert_allclose(np.asarray(pallas_lstm(xw, w_h)),
                               np.asarray(scan_lstm(xw, w_h)),
                               rtol=1e-5, atol=1e-5)


def test_grads_match_scan():
    xw, w_h = _inputs(1)
    w = jnp.asarray(np.random.default_rng(2)
                    .standard_normal((T, B, H)).astype(np.float32))

    def loss_p(xw, w_h):
        return jnp.sum(pallas_lstm(xw, w_h) * w)

    def loss_s(xw, w_h):
        return jnp.sum(scan_lstm(xw, w_h) * w)

    gp = jax.grad(loss_p, argnums=(0, 1))(xw, w_h)
    gs = jax.grad(loss_s, argnums=(0, 1))(xw, w_h)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gs[0]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gs[1]),
                               rtol=1e-4, atol=1e-5)


def test_batch_blocked_grid_matches_scan(monkeypatch):
    """Force the VMEM budget small enough that the kernel must split the
    batch into multiple grid steps; value + grads must still match scan
    (exercises the cross-block dwh scratch accumulation)."""
    import maavss_tpu.ops.pallas_lstm as mod

    big_b = 32  # blocker floors at blk=8, so B=32 -> 4 grid steps
    cap = T * 8 * 11 * H * 4
    monkeypatch.setattr(mod, "_VMEM_CAP_BYTES", cap)
    assert mod._batch_block(T, big_b, H, 4) == 8
    assert mod.pallas_fits(T, big_b, H, 4)

    rng = np.random.default_rng(4)
    xw = jnp.asarray(rng.standard_normal((T, big_b, 4 * H)).astype(np.float32) * 0.5)
    w_h = jnp.asarray(rng.standard_normal((H, 4 * H)).astype(np.float32) * 0.2)
    np.testing.assert_allclose(np.asarray(pallas_lstm(xw, w_h)),
                               np.asarray(scan_lstm(xw, w_h)),
                               rtol=1e-5, atol=1e-5)
    w = jnp.asarray(np.random.default_rng(5)
                    .standard_normal((T, big_b, H)).astype(np.float32))
    gp = jax.grad(lambda a, b: jnp.sum(pallas_lstm(a, b) * w),
                  argnums=(0, 1))(xw, w_h)
    gs = jax.grad(lambda a, b: jnp.sum(scan_lstm(a, b) * w),
                  argnums=(0, 1))(xw, w_h)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gs[0]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gs[1]),
                               rtol=1e-4, atol=1e-5)


def test_batch_block_sizing():
    """_batch_block halves while even, floors at 8, returns None when even
    the floor cannot fit."""
    from maavss_tpu.ops.pallas_lstm import _VMEM_CAP_BYTES, _batch_block

    # tiny geometry: whole batch fits -> no split
    assert _batch_block(6, 8, 16, 4) == 8
    # huge T*H forces halving; result must divide B and fit
    blk = _batch_block(32, 512, 512, 4)
    assert blk is not None and 512 % blk == 0
    assert 32 * blk * 11 * 512 * 4 <= _VMEM_CAP_BYTES
    # odd batch that doesn't fit cannot be split -> None
    assert _batch_block(4096, 7, 4096, 4) is None


def test_grads_under_jit_and_second_order_shapes():
    xw, w_h = _inputs(3)

    @jax.jit
    def loss(xw, w_h):
        return jnp.mean(pallas_lstm(xw, w_h) ** 2)

    g = jax.jit(jax.grad(loss, argnums=(0, 1)))(xw, w_h)
    assert g[0].shape == xw.shape and g[1].shape == w_h.shape
    assert np.isfinite(np.asarray(g[0])).all()
