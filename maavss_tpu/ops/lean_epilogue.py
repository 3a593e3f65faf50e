"""Lean s2d-stage epilogue: BN + phase-max + LeakyReLU with a restructured,
pure-XLA custom VJP (round-5 answer to the frames trunk's dominant cost).

The frames stage decomposition (BASELINE.md round 3j, stage1_probe) showed
the conv forward is healthy (25-43% MXU) while the BN+pool epilogue eats 42
of stage 1's 63 ms — almost all in the BACKWARD, where XLA's autodiff makes
~5 full passes over the [B,T,H',W',4C] conv output: materialize the
normalized tensor, route the pool gradient by comparing against it, then two
GLOBAL reductions for the BN backward and one more pass for dy. Three fused
Pallas epilogues attacked the same tail and LOST (rounds 4b/4c/4e: on v5e
Mosaic a memory-bound elementwise+reduce tail over <=32-channel data cannot
beat XLA fusion). This module attacks it WITHOUT Pallas, by restructuring
the math so XLA has less to do:

- **Pool before normalize** (exactly): BatchNorm is monotone per channel, so
  phase_max(BN(y)) == BN(sign(gamma) * max_phase(sign(gamma) * y)). The
  normalize then runs on the POOLED tensor (4x smaller); the full-size
  normalized tensor is never materialized. (The r3j pool-before-BN attempt
  in plain XLA lost because it ran max, min, and stats as three separate
  full passes; the sign trick needs only ONE signed max, and the custom VJP
  removes the backward passes that dominated.)
- **Pooled-domain BN backward**: the pool's upstream gradient is nonzero
  only at selected positions, so the BN backward's two global reductions
  (sum dz, sum dz*zhat) collapse to sums over the POOLED domain — no
  full-size pass. The remaining dy is ONE fused elementwise expression in
  (y, pooled max, per-channel scalars): one read of y, one write of dy.

Exact math vs the production tail (nn.BatchNorm(train) -> phase_max_2x2 ->
leaky_relu 0.01): forward bitwise-level equal in f32 up to reduction order;
gradient identical except on measure-zero ties in the max (gradient is
routed to every tied position; jnp.max's VJP does the same).

Interface mirrors ops/pallas_epilogue.fused_bn_phasemax_leaky so the model's
fused-tail wiring (models/fusion_frames.py) serves both:
  lean_bn_phasemax_leaky(y [B,T,H',W',4C], gamma [C], beta [C])
    -> (out [B,T,H',W',C], mu [C] f32, var [C] f32 — biased, flax convention)

Reference for the stage being replaced: /root/reference/avse_model_final.py:33-59.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-5  # TorchBatchNorm / nn.BatchNorm epsilon (models/layers.py:43)
_SLOPE = 0.01  # torch LeakyReLU default, avse_model_final.py stage tail


def _stats_and_select(y: jnp.ndarray, gamma: jnp.ndarray):
    """Shared forward core: f32 batch stats over every axis but the channel,
    and the sign-selected phase extreme (max where gamma>=0, min where
    gamma<0) computed with ONE signed max pass."""
    b, t, h, w, c4 = y.shape
    c = c4 // 4
    y6 = y.reshape(b, t, h, w, 4, c).astype(jnp.float32)
    n = b * t * h * w * 4
    mu = jnp.mean(y6, axis=(0, 1, 2, 3, 4))
    var = jnp.mean(jnp.square(y6), axis=(0, 1, 2, 3, 4)) - jnp.square(mu)
    sg = jnp.where(gamma.astype(jnp.float32) >= 0, 1.0, -1.0)
    m_signed = jnp.max(y6 * sg, axis=4)  # [b,t,h,w,c]
    return y6, n, mu, var, sg, m_signed


def _pooled_out(m_signed, sg, mu, var, gamma, beta, out_dtype):
    sel = sg * m_signed
    s = jnp.sqrt(var + _EPS)
    zp = (gamma.astype(jnp.float32) * (sel - mu) / s
          + beta.astype(jnp.float32))
    return jnp.where(zp >= 0, zp, _SLOPE * zp).astype(out_dtype), zp, s


@jax.custom_vjp
def lean_bn_phasemax_leaky(
    y: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    _, _, mu, var, sg, m_signed = _stats_and_select(y, gamma)
    out, _, _ = _pooled_out(m_signed, sg, mu, var, gamma, beta, y.dtype)
    return out, mu, var


def _lean_fwd(y, gamma, beta):
    _, _, mu, var, sg, m_signed = _stats_and_select(y, gamma)
    out, _, _ = _pooled_out(m_signed, sg, mu, var, gamma, beta, y.dtype)
    # Residuals: y + per-channel scalars ONLY. m_signed ([b,t,h,w,c] f32 —
    # 0.7-1.5 GB per stage at b128) is recomputed in the backward: custom_vjp
    # residuals are opaque to XLA's rematerializer, and saving it pushed the
    # b128 full-encode step 315 MB past HBM (runs/probe_r5c/fr_lean_b128).
    # The recompute is a phase-axis (minor, local) max fused into the dz
    # pass's existing read of y — bytes it already pays.
    return (out, mu, var), (y, gamma, beta, mu, var)


def _lean_bwd(res, cts):
    y, gamma, beta, mu, var = res
    g_out, g_mu, g_var = cts
    # Without this barrier the m_signed recompute below is syntactically
    # identical to the forward's (same saved y root), so XLA CSE merges the
    # two and KEEPS the value live from forward to backward — re-creating
    # the exact residual footprint the recompute exists to avoid (measured:
    # the b128 full-encode OOM excess stayed byte-identical at 315.50M
    # before/after the recompute change, runs/probe_r5e/fr_lean_b128.err).
    # optimization_barrier is an identity, so the math is unchanged.
    y = jax.lax.optimization_barrier(y)
    b, t, h, w, c4 = y.shape
    c = c4 // 4
    y6 = y.reshape(b, t, h, w, 4, c).astype(jnp.float32)
    n = b * t * h * w * 4
    gamma32 = gamma.astype(jnp.float32)
    sg = jnp.where(gamma32 >= 0, 1.0, -1.0)
    s = jnp.sqrt(var + _EPS)
    m_signed = jnp.max(y6 * sg, axis=4)  # recomputed (see _lean_fwd note)
    sel = sg * m_signed
    zhat_sel = (sel - mu) / s
    zp = gamma32 * zhat_sel + beta.astype(jnp.float32)

    # leaky backward on the pooled domain
    gp = g_out.astype(jnp.float32) * jnp.where(zp >= 0, 1.0, _SLOPE)

    # BN backward's global reductions collapse to pooled-domain sums (the
    # pool gradient is zero off the selected positions)
    c1 = jnp.sum(gp, axis=(0, 1, 2, 3))              # = sum dz      = dbeta
    c2 = jnp.sum(gp * zhat_sel, axis=(0, 1, 2, 3))   # = sum dz*zhat = dgamma

    # dy in ONE fused elementwise pass over y: route gp to the selected
    # phase (all ties receive it, like jnp.max's VJP), then the standard
    # BN backward dz -> dy with the collapsed global terms, plus the
    # exposed mu/var outputs' own cotangent paths.
    selected = (y6 * sg) == m_signed[:, :, :, :, None, :]
    dz = jnp.where(selected, gp[:, :, :, :, None, :], 0.0)
    dy6 = (gamma32 / s) * (dz - c1 / n
                           - ((y6 - mu) / s) * (c2 / n))
    dy6 = dy6 + g_mu / n + g_var * 2.0 * (y6 - mu) / n
    dy = dy6.reshape(b, t, h, w, c4).astype(y.dtype)
    return dy, c2.astype(gamma.dtype), c1.astype(beta.dtype)


lean_bn_phasemax_leaky.defvjp(_lean_fwd, _lean_bwd)
