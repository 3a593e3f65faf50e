"""Pallas TPU kernels for the STFT-domain hot ops.

The north star fuses the mag/phase frontend and complex-mask application into
Pallas kernels (BASELINE.json): these are the per-step elementwise passes over
[B, T, F] spectra that sit between the rFFT and the model. Each kernel makes
exactly one VMEM pass (vs. several HBM round trips if XLA chooses not to fuse
across the surrounding reshapes):

- `complex_mask_apply`: (re,im) x (mre,mim) complex multiply — the separation
  op (predicted complex ratio mask applied to the noisy STFT). Linear in both
  inputs, so the custom VJP reuses the same kernel with conjugated operands.
- `magphase` / `polar_to_rect`: rectangular <-> polar feature conversion
  (av_dataset.py:176-178's use_polar mode).

Blocks are (T, F) tiles per batch item: with the reference geometry
(T=64, F=128) a tile is exactly one (8,128)-aligned VMEM block. All kernels
fall back to interpreter mode off-TPU so CPU tests exercise the same code.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _tile_specs(shape: Tuple[int, ...], n_in: int):
    """Grid over leading dims; one (T, F) tile per program."""
    *lead, t, f = shape
    grid = tuple(lead)
    idx = lambda *ids: tuple(ids) + (0, 0)  # noqa: E731
    block = tuple([1] * len(lead)) + (t, f)
    spec = pl.BlockSpec(block, idx, memory_space=pltpu.VMEM)
    return grid, [spec] * n_in, spec


def _mask_mul_kernel(re_ref, im_ref, mre_ref, mim_ref, ore_ref, oim_ref):
    re, im = re_ref[:], im_ref[:]
    mre, mim = mre_ref[:], mim_ref[:]
    ore_ref[:] = re * mre - im * mim
    oim_ref[:] = re * mim + im * mre


def _mask_mul(re, im, mre, mim):
    # MAAVSS_MASK_IMPL=xla: plain jnp complex multiply. Same math; unlike the
    # Pallas call it is FUSABLE — in the --fusion_encode full step the stft
    # operand is a stack of overlapping window slices that XLA can feed
    # straight into the multiply instead of materializing the [B*ns,...] fold
    # as a Pallas kernel input (round-5 byte cut; A/B in BASELINE.md).
    # auto resolves to xla: measured winner BOTH under full-encode (+8.4%
    # with slice loss, r5b) and windowed mode (13,558 vs 13,255, +2.3%,
    # r5e) — the fusable multiply beats the standalone kernel everywhere.
    # MAAVSS_MASK_IMPL=pallas keeps the kernel for A/Bs.
    import os

    if os.environ.get("MAAVSS_MASK_IMPL", "auto") != "pallas":
        return re * mre - im * mim, re * mim + im * mre
    grid, in_specs, out_spec = _tile_specs(re.shape, 4)
    out = jax.ShapeDtypeStruct(re.shape, re.dtype)
    return pl.pallas_call(
        _mask_mul_kernel, grid=grid, in_specs=in_specs,
        out_specs=[out_spec, out_spec], out_shape=[out, out],
        interpret=_interpret(),
    )(re, im, mre, mim)


@jax.custom_vjp
def complex_mask_apply(stft_ri: jnp.ndarray, mask_ri: jnp.ndarray) -> jnp.ndarray:
    """Apply a complex ratio mask: `[..., 2, T, F] x [..., 2, T, F]` complex
    multiply in one fused pass. Channel axis -3 is (real, imag)."""
    ore, oim = _mask_mul(stft_ri[..., 0, :, :], stft_ri[..., 1, :, :],
                         mask_ri[..., 0, :, :], mask_ri[..., 1, :, :])
    return jnp.stack([ore, oim], axis=-3)


def _cma_fwd(stft_ri, mask_ri):
    return complex_mask_apply(stft_ri, mask_ri), (stft_ri, mask_ri)


def _cma_bwd(res, g):
    stft_ri, mask_ri = res
    gre, gim = g[..., 0, :, :], g[..., 1, :, :]
    # d/d(stft) = g * conj(mask); d/d(mask) = g * conj(stft)
    sre, sim = stft_ri[..., 0, :, :], stft_ri[..., 1, :, :]
    mre, mim = mask_ri[..., 0, :, :], mask_ri[..., 1, :, :]
    dsr, dsi = _mask_mul(gre, gim, mre, -mim)
    dmr, dmi = _mask_mul(gre, gim, sre, -sim)
    return (jnp.stack([dsr, dsi], axis=-3), jnp.stack([dmr, dmi], axis=-3))


complex_mask_apply.defvjp(_cma_fwd, _cma_bwd)


def _magphase_kernel(re_ref, im_ref, mag_ref, ph_ref):
    re, im = re_ref[:], im_ref[:]
    mag_ref[:] = jnp.sqrt(re * re + im * im)
    ph_ref[:] = jnp.arctan2(im, re)


@jax.custom_vjp
def magphase(stft_ri: jnp.ndarray) -> jnp.ndarray:
    """[..., 2(re,im), T, F] -> [..., 2(mag,phase), T, F] in one pass
    (the polar feature mode, av_dataset.py:176-178)."""
    re, im = stft_ri[..., 0, :, :], stft_ri[..., 1, :, :]
    grid, in_specs, out_spec = _tile_specs(re.shape, 2)
    out = jax.ShapeDtypeStruct(re.shape, re.dtype)
    mag, ph = pl.pallas_call(
        _magphase_kernel, grid=grid, in_specs=in_specs,
        out_specs=[out_spec, out_spec], out_shape=[out, out],
        interpret=_interpret(),
    )(re, im)
    return jnp.stack([mag, ph], axis=-3)


def _magphase_fwd(stft_ri):
    return magphase(stft_ri), stft_ri


def _magphase_bwd(stft_ri, g):
    # mag = sqrt(re^2+im^2), ph = atan2(im, re); analytic adjoints, eps-guarded
    # at the origin where both are non-differentiable. The bwd is plain jnp
    # (elementwise — XLA fuses it); only the fwd needs the single-pass kernel.
    re, im = stft_ri[..., 0, :, :], stft_ri[..., 1, :, :]
    gm, gp = g[..., 0, :, :], g[..., 1, :, :]
    m2 = re * re + im * im
    m = jnp.sqrt(jnp.maximum(m2, 1e-24))
    m2 = jnp.maximum(m2, 1e-24)
    dre = gm * re / m - gp * im / m2
    dim = gm * im / m + gp * re / m2
    return (jnp.stack([dre, dim], axis=-3),)


magphase.defvjp(_magphase_fwd, _magphase_bwd)


def _polar_kernel(mag_ref, ph_ref, re_ref, im_ref):
    mag, ph = mag_ref[:], ph_ref[:]
    re_ref[:] = mag * jnp.cos(ph)
    im_ref[:] = mag * jnp.sin(ph)


@jax.custom_vjp
def polar_to_rect(stft_mp: jnp.ndarray) -> jnp.ndarray:
    """[..., 2(mag,phase), T, F] -> [..., 2(re,im), T, F] in one pass (the
    corrected polar inverse, cf. the reference's broken path at
    av_dataset.py:190)."""
    mag, ph = stft_mp[..., 0, :, :], stft_mp[..., 1, :, :]
    grid, in_specs, out_spec = _tile_specs(mag.shape, 2)
    out = jax.ShapeDtypeStruct(mag.shape, mag.dtype)
    re, im = pl.pallas_call(
        _polar_kernel, grid=grid, in_specs=in_specs,
        out_specs=[out_spec, out_spec], out_shape=[out, out],
        interpret=_interpret(),
    )(mag, ph)
    return jnp.stack([re, im], axis=-3)


def _polar_fwd(stft_mp):
    return polar_to_rect(stft_mp), stft_mp


def _polar_bwd(stft_mp, g):
    # re = m cos p, im = m sin p  =>  dm = gre cos p + gim sin p,
    # dp = m (gim cos p - gre sin p). Exact; plain jnp (elementwise, fuses).
    mag, ph = stft_mp[..., 0, :, :], stft_mp[..., 1, :, :]
    gre, gim = g[..., 0, :, :], g[..., 1, :, :]
    c, s = jnp.cos(ph), jnp.sin(ph)
    dm = gre * c + gim * s
    dp = mag * (gim * c - gre * s)
    return (jnp.stack([dm, dp], axis=-3),)


polar_to_rect.defvjp(_polar_fwd, _polar_bwd)
