"""Parity of the lean pure-XLA BN+phase-max+leaky epilogue
(ops/lean_epilogue.py) against the unfused XLA stage tail it replaces —
the round-5 restructure (pool-before-normalize by sign(gamma) select +
pooled-domain BN backward in a custom VJP).

Same coverage scheme as tests/test_pallas_epilogue.py: forward values,
mu/var outputs, the FULL vjp (dy, dgamma, dbeta, including the mu/var
cotangent paths), bf16 IO, and whole-encoder equivalence between
MAAVSS_EPILOGUE=lean and =xla. Tie-break deviation: lean routes the pooled
gradient to EVERY tied phase (jnp.where on equality) while jax's reduce_max
splits it evenly — measure-zero with real activations, excluded like the
fused kernel's tests do.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maavss_tpu.ops.lean_epilogue import lean_bn_phasemax_leaky
from tests.test_pallas_epilogue import _encoder_run, _mk, xla_tail


@pytest.mark.parametrize("c", [16, 32, 64])
def test_forward_matches_xla_tail(c):
    y, gamma, beta = _mk((2, 3, 8, 8), c, seed=c)
    out_l, mu_l, var_l = lean_bn_phasemax_leaky(y, gamma, beta)
    out_x, mu_x, var_x = xla_tail(y, gamma, beta)
    np.testing.assert_allclose(mu_l, mu_x, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(var_l, var_x, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out_l, out_x, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("c", [16, 32])
def test_full_vjp_matches_xla_tail(c):
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

    gl = jax.grad(loss(lean_bn_phasemax_leaky), argnums=(0, 1, 2))(
        y, gamma, beta)
    gx = jax.grad(loss(xla_tail), argnums=(0, 1, 2))(y, gamma, beta)
    for a, b, name in zip(gl, gx, ("dy", "dgamma", "dbeta")):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5, err_msg=name)


def test_bf16_io():
    y, gamma, beta = _mk((2, 2, 8, 8), 32, seed=7, dtype=jnp.bfloat16,
                         zero_gamma=False)
    out_l, mu_l, var_l = lean_bn_phasemax_leaky(y, gamma, beta)
    out_x, mu_x, var_x = xla_tail(y, gamma, beta)
    assert out_l.dtype == jnp.bfloat16
    np.testing.assert_allclose(mu_l, mu_x, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out_l, np.float32),
                               np.asarray(out_x, np.float32),
                               rtol=2e-2, atol=2e-2)

    def loss(y):
        out, _, _ = lean_bn_phasemax_leaky(y, gamma, beta)
        return jnp.sum(jnp.square(out.astype(jnp.float32)))

    def loss_x(y):
        out, _, _ = xla_tail(y, gamma, beta)
        return jnp.sum(jnp.square(out.astype(jnp.float32)))

    gl = jax.grad(loss)(y)
    gx = jax.grad(loss_x)(y)
    # bf16 rounding creates phase ties; lean gives each tied phase the whole
    # pooled gradient, jax's reduce_max splits evenly — exclude ties
    yn = np.asarray(y, np.float32).reshape(y.shape[:-1] + (4, 32))
    srt = np.sort(yn, axis=-2)
    tied = (srt[..., 3, :] == srt[..., 2, :]) | (
        srt[..., 0, :] == srt[..., 1, :])
    tied4 = np.repeat(tied[..., None, :], 4, axis=-2).reshape(y.shape)
    assert tied4.mean() < 0.01
    np.testing.assert_allclose(
        np.asarray(gl, np.float32)[~tied4], np.asarray(gx, np.float32)[~tied4],
        rtol=1e-1, atol=3e-2)


@pytest.mark.parametrize("train", [True, False])
@pytest.mark.parametrize("lean_stages", ["all", "1"])
def test_encoder_lean_equals_xla(monkeypatch, train, lean_stages):
    """Same init tree, outputs, grads, and batch-stat updates under
    MAAVSS_EPILOGUE lean vs xla (stages lean per $MAAVSS_LEAN_STAGES —
    'all' and the measured-winner default '1' both covered; the small
    tail stages fall back identically; eval mode bypasses the tail)."""
    monkeypatch.setenv("MAAVSS_LEAN_STAGES", lean_stages)
    vl, ll, ol, sl, gl = _encoder_run("lean", monkeypatch, train)
    vx, lx, ox, sx, gx = _encoder_run("xla", monkeypatch, train)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b), vl, vx)
    np.testing.assert_allclose(ll, lx, rtol=1e-4)
    np.testing.assert_allclose(ol, ox, rtol=1e-4, atol=1e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5),
        sl, sx)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-4),
        gl, gx)
