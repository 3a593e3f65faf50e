"""Pallas kernel tests (interpret mode on CPU): value parity with jnp
reference math + gradient correctness of the custom VJP."""

import numpy as np

import jax
import jax.numpy as jnp

from maavss_tpu.ops.pallas_kernels import complex_mask_apply, magphase, polar_to_rect


def _rand(shape, seed):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


def test_complex_mask_apply_matches_complex_mul():
    s = _rand((2, 2, 16, 128), 0)
    m = _rand((2, 2, 16, 128), 1)
    out = np.asarray(complex_mask_apply(jnp.asarray(s), jnp.asarray(m)))
    cs = s[:, 0] + 1j * s[:, 1]
    cm = m[:, 0] + 1j * m[:, 1]
    ref = cs * cm
    np.testing.assert_allclose(out[:, 0], ref.real, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out[:, 1], ref.imag, rtol=1e-5, atol=1e-5)


def test_complex_mask_apply_grads():
    s = jnp.asarray(_rand((1, 2, 8, 128), 2))
    m = jnp.asarray(_rand((1, 2, 8, 128), 3))

    def loss_pallas(s, m):
        return jnp.sum(complex_mask_apply(s, m) ** 2)

    def loss_ref(s, m):
        re = s[:, 0] * m[:, 0] - s[:, 1] * m[:, 1]
        im = s[:, 0] * m[:, 1] + s[:, 1] * m[:, 0]
        return jnp.sum(re**2 + im**2)

    gs_p, gm_p = jax.grad(loss_pallas, argnums=(0, 1))(s, m)
    gs_r, gm_r = jax.grad(loss_ref, argnums=(0, 1))(s, m)
    np.testing.assert_allclose(np.asarray(gs_p), np.asarray(gs_r), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gm_p), np.asarray(gm_r), rtol=1e-4, atol=1e-4)


def test_magphase_roundtrip():
    s = _rand((3, 2, 8, 128), 4)
    mp = magphase(jnp.asarray(s))
    c = s[:, 0] + 1j * s[:, 1]
    np.testing.assert_allclose(np.asarray(mp)[:, 0], np.abs(c), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mp)[:, 1], np.angle(c), rtol=1e-4, atol=1e-5)
    back = np.asarray(polar_to_rect(mp))
    np.testing.assert_allclose(back, s, rtol=1e-4, atol=1e-5)
