"""Fused BN(train) + 2x2-phase-max-pool + LeakyReLU epilogue for the frames
conv3d trunk's space-to-depth stages.

Why this kernel exists (BASELINE.md round 3j, benchmarks/stage1_probe.py):
the s2d stage's epilogue — BatchNorm train stats + normalize, the phase max
(== the reference's 2x2 spatial max pool, avse_model_final.py:33-59), and
LeakyReLU — costs 42 of stage 1's 63 ms at b128 (6 fwd + ~36 bwd), i.e. ~16
effective HBM passes over the 2.1 GB conv output, while the conv itself is
healthy. Every XLA-side restructure measured SLOWER (pool-before-BN +29%,
pool=reshape, tfold, depth-taps — all documented negatives). The information
-theoretic minimum is what this kernel does:

  forward   pass 1  read y once            -> per-channel sum / sumsq
            pass 2  read y once            -> out (1/4 size) + sel (1/4)
  backward  pass 3  read g+sel (1/4 each)  -> S1 = sum(dsel), S2 = sum(dsel*xhat)
            pass 4  read y, write dy       -> full dy in ONE pass

~2.6 read-equivalents fwd + ~2.6 bwd vs XLA's ~16 total.

The monotonicity trick (proven exact in stage1_probe.py:stage_bnpost): the
per-channel BN map x -> gamma*(x-mu)*rstd + beta is monotone increasing for
gamma>0 and decreasing for gamma<0, and LeakyReLU is monotone increasing, so

  max_ph leaky(BN(y_ph)) = leaky(BN(max_ph y_ph))   if gamma > 0
                         = leaky(BN(min_ph y_ph))   if gamma < 0
                         = leaky(beta)              if gamma == 0 (all equal)

so the pooled SELECTED RAW VALUE `sel` (1/4 size) is the only residual the
backward needs besides y. The pool's upstream gradient is nonzero only at
selected positions, so the BN backward's two global reductions
(sum(dxhat), sum(dxhat*xhat)) collapse to pooled-domain sums — pass 3.

Backward math (standard train-mode BN through mu/var, biased variance):
  xhat_i = (y_i - mu) * rstd
  dxhat_i = dsel_i * gamma          (nonzero only at selected positions)
  dy_i = rstd * (dxhat_i - S1*gamma/N - xhat_i * S2*gamma/N)
       [+ mu/var cotangent terms: dy_i += g_mu/N + 2*g_var*(y_i - mu)/N]
  dgamma = S2, dbeta = S1, with S1 = sum(dsel), S2 = sum(dsel * xhat_sel).

Gradient tie-breaking: when several phases tie at the max (min), the full
gradient routes to the FIRST tied phase; XLA's reduce_window backward uses
its own tie rule. Ties are measure-zero with real activations (same
documented deviation as layers.max_pool_reshape).

Lane layout: y is phase-major [..., 4C] (channel index ph*C + c,
layers.space_to_depth_2x2), so each phase is a CONTIGUOUS C-lane block and
the phase max is 3 elementwise maxes over static lane slices — no strided
lane access, no gather, no minormost reshape (all measured Mosaic walls,
CLAUDE.md). Product channel widths: C = 16 (stage 1), 32 (stage 2),
64 (stage 3 if MAAVSS_S2D_MIN_HW is lowered).

Off-TPU the kernels run in interpreter mode so CPU CI tests value/grad
parity against the unfused stage; tests/test_mosaic_lowering.py cross-lowers
every product geometry for TPU device-free.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


_SLOPE = 0.01  # torch LeakyReLU default (avse_model_final.py:58)
_EPS = 1e-5  # torch/flax BatchNorm default

# VMEM accounting must use PADDED lane widths: every [R, w] array occupies
# ceil(w/128)*128 lanes in VMEM, so at C=16 a [R, C] fp32 temp costs 8x its
# nominal bytes — the first on-chip compile OOMed the default 16 MiB scoped
# cap exactly this way (22.58M wanted, runs/probe_r4a/validate_epilogue.err).
# Blocks are sized against a padded-footprint estimate per kernel, and every
# pallas_call raises the Mosaic scoped-VMEM limit toward the v5e's 128 MiB
# physical VMEM to keep blocks (and therefore grid counts) reasonable.
_VMEM_BUDGET = 20 * 1024 * 1024
_VMEM_LIMIT = 100 * 1024 * 1024


def _pad_lanes(w: int) -> int:
    return -(-w // 128) * 128


def _compiler_params():
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _row_block(n_rows: int, bytes_per_row: int) -> int:
    """Largest power-of-two divisor of n_rows whose PADDED per-row footprint
    fits the VMEM budget."""
    r = n_rows & -n_rows  # largest pow2 dividing n_rows
    r = min(r, 8192)
    while r > 1 and r * bytes_per_row > _VMEM_BUDGET:
        r //= 2
    return r


def _chan_spec(c: int):
    """[1, C] per-channel operand replicated to every grid step."""
    return pl.BlockSpec((1, c), lambda i: (0, 0))


# ---------------------------------------------------------------- forward --


def _stats_kernel(y_ref, sums_ref, acc_ref):
    """Accumulate per-channel (over rows AND the 4 phase slices) sum and
    sum-of-squares of y into an fp32 scratch; write [2, C] at the last step."""
    c = sums_ref.shape[-1]

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    s = jnp.zeros((1, c), jnp.float32)
    ss = jnp.zeros((1, c), jnp.float32)
    for ph in range(4):
        yp = y_ref[:, ph * c:(ph + 1) * c].astype(jnp.float32)
        s = s + jnp.sum(yp, axis=0, keepdims=True)
        ss = ss + jnp.sum(yp * yp, axis=0, keepdims=True)
    acc_ref[0:1, :] += s
    acc_ref[1:2, :] += ss

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _write():
        sums_ref[:] = acc_ref[:]


def _apply_kernel(y_ref, mu_ref, rstd_ref, gamma_ref, beta_ref,
                  out_ref, sel_ref):
    """Normalize + phase max + leaky in one read: out = leaky(BN(sel)),
    sel = max_ph y (gamma>0) or min_ph y (gamma<0). max/min run in the IO
    dtype (exact — they only select), keeping fp32 temps at [R, C] width."""
    c = out_ref.shape[-1]
    m = y_ref[:, 0:c]
    n = y_ref[:, 0:c]
    for ph in range(1, 4):
        yp = y_ref[:, ph * c:(ph + 1) * c]
        m = jnp.maximum(m, yp)
        n = jnp.minimum(n, yp)
    gamma = gamma_ref[:]
    sel = jnp.where(gamma > 0, m.astype(jnp.float32), n.astype(jnp.float32))
    o_bn = gamma * (sel - mu_ref[:]) * rstd_ref[:] + beta_ref[:]
    out = jnp.where(o_bn >= 0, o_bn, _SLOPE * o_bn)
    out_ref[:] = out.astype(out_ref.dtype)
    sel_ref[:] = sel.astype(sel_ref.dtype)


# --------------------------------------------------------------- backward --


def _bwd_reduce_kernel(g_ref, sel_ref, mu_ref, rstd_ref, gamma_ref, beta_ref,
                       sums_ref, acc_ref):
    """Pooled-domain sums: S1 = sum(dsel), S2 = sum(dsel * xhat_sel), with
    dsel = g * leaky'(BN(sel)) — the pool-sparsity collapse of the BN
    backward's global terms AND (dgamma, dbeta) themselves."""

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    g = g_ref[:].astype(jnp.float32)
    sel = sel_ref[:].astype(jnp.float32)
    xhat = (sel - mu_ref[:]) * rstd_ref[:]
    o_bn = gamma_ref[:] * xhat + beta_ref[:]
    dsel = g * jnp.where(o_bn >= 0, 1.0, _SLOPE)
    acc_ref[0:1, :] += jnp.sum(dsel, axis=0, keepdims=True)
    acc_ref[1:2, :] += jnp.sum(dsel * xhat, axis=0, keepdims=True)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _write():
        sums_ref[:] = acc_ref[:]


def _bwd_dy_kernel(y_ref, g_ref, sel_ref, mu_ref, rstd_ref, gamma_ref,
                   beta_ref, k_ref, dy_ref):
    """Full-domain dy in ONE read of y + one write of dy. The selected-phase
    routing recomputes first-match masks from (y, sel) — sel round-trips
    bit-exact through the IO dtype, so y_ph == sel is an exact re-selection.
    The equality runs in fp32 (bf16->fp32 is exact and injective, so the
    compare is bit-equivalent): v5e Mosaic rejects bf16 vector compares
    ("Target does not support this comparison", runs/probe_r4b).
    k_ref rows: [k1, k2, ka, kb] = [gamma*S1/N, gamma*S2/N,
    g_mu/N - 2*g_var*mu/N, 2*g_var/N] (the last two carry the mu/var output
    cotangents, zero in product training where running stats are buffers)."""
    c = g_ref.shape[-1]
    g = g_ref[:].astype(jnp.float32)
    sel = sel_ref[:].astype(jnp.float32)
    mu, rstd, gamma, beta = mu_ref[:], rstd_ref[:], gamma_ref[:], beta_ref[:]
    xhat_sel = (sel - mu) * rstd
    o_bn = gamma * xhat_sel + beta
    dsel_g = g * jnp.where(o_bn >= 0, 1.0, _SLOPE) * gamma  # == dxhat at sel
    k1 = k_ref[0:1, :]
    k2 = k_ref[1:2, :]
    ka = k_ref[2:3, :]
    kb = k_ref[3:4, :]
    taken = jnp.zeros_like(g, dtype=jnp.bool_)
    parts = []
    for ph in range(4):
        yp = y_ref[:, ph * c:(ph + 1) * c].astype(jnp.float32)
        hit = jnp.logical_and(yp == sel, jnp.logical_not(taken))
        taken = jnp.logical_or(taken, hit)
        dxhat = jnp.where(hit, dsel_g, 0.0)
        xhat = (yp - mu) * rstd
        dyp = rstd * (dxhat - k1 - xhat * k2) + ka + yp * kb
        parts.append(dyp.astype(dy_ref.dtype))
    dy_ref[:] = jnp.concatenate(parts, axis=-1)


# ---------------------------------------------------------------- wrapper --


def _stats(y2: jnp.ndarray, c: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    n = y2.shape[0]
    it = y2.dtype.itemsize
    # padded footprint/row: y in (double-buffered) + one fp32 phase temp
    r = _row_block(n, _pad_lanes(4 * c) * 2 * it + _pad_lanes(c) * 8)
    sums = pl.pallas_call(
        _stats_kernel,
        grid=(n // r,),
        in_specs=[pl.BlockSpec((r, 4 * c), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((2, c), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((2, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, c), jnp.float32)],
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(y2)
    ntot = jnp.float32(4 * n)
    mu = sums[0] / ntot
    var = sums[1] / ntot - mu * mu
    return mu, var


def _apply(y2, mu, rstd, gamma, beta, c):
    n = y2.shape[0]
    it = y2.dtype.itemsize
    # y in x2 buffers + out/sel x2 each + ~6 fp32 [R, C] temps (m/n/sel/
    # o_bn/out and slack), all at PADDED lane widths
    r = _row_block(n, _pad_lanes(4 * c) * 2 * it
                   + _pad_lanes(c) * (4 * it + 6 * 4))
    out, sel = pl.pallas_call(
        _apply_kernel,
        grid=(n // r,),
        in_specs=[pl.BlockSpec((r, 4 * c), lambda i: (i, 0))]
        + [_chan_spec(c)] * 4,
        out_specs=[pl.BlockSpec((r, c), lambda i: (i, 0))] * 2,
        out_shape=[jax.ShapeDtypeStruct((n, c), y2.dtype)] * 2,
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(y2, mu.reshape(1, c), rstd.reshape(1, c),
      gamma.reshape(1, c), beta.reshape(1, c))
    return out, sel


@jax.custom_vjp
def _fused_core(y2: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray):
    """[N, 4C] phase-major conv output -> (out [N, C], mu [C], var [C])."""
    c = gamma.shape[0]
    mu, var = _stats(y2, c)
    rstd = jax.lax.rsqrt(var + _EPS)
    out, _ = _apply(y2, mu, rstd, gamma.astype(jnp.float32),
                    beta.astype(jnp.float32), c)
    return out, mu, var


def _fused_fwd(y2, gamma, beta):
    c = gamma.shape[0]
    mu, var = _stats(y2, c)
    rstd = jax.lax.rsqrt(var + _EPS)
    gamma32 = gamma.astype(jnp.float32)
    beta32 = beta.astype(jnp.float32)
    out, sel = _apply(y2, mu, rstd, gamma32, beta32, c)
    return (out, mu, var), (y2, sel, mu, rstd, gamma, beta)


def _fused_bwd(res, cts):
    y2, sel, mu, rstd, gamma, beta = res
    gamma32 = gamma.astype(jnp.float32)
    beta32 = beta.astype(jnp.float32)
    g_out, g_mu, g_var = cts
    n, c4 = y2.shape
    c = c4 // 4
    itemsize = y2.dtype.itemsize

    r = _row_block(n, _pad_lanes(c) * (4 * itemsize + 6 * 4))
    sums = pl.pallas_call(
        _bwd_reduce_kernel,
        grid=(n // r,),
        in_specs=[pl.BlockSpec((r, c), lambda i: (i, 0))] * 2
        + [_chan_spec(c)] * 4,
        out_specs=pl.BlockSpec((2, c), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((2, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, c), jnp.float32)],
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(g_out, sel, mu.reshape(1, c), rstd.reshape(1, c),
      gamma32.reshape(1, c), beta32.reshape(1, c))
    s1, s2 = sums[0], sums[1]

    ntot = jnp.float32(4 * n)
    g_mu = g_mu.astype(jnp.float32)
    g_var = g_var.astype(jnp.float32)
    k = jnp.stack([
        gamma32 * s1 / ntot,
        gamma32 * s2 / ntot,
        g_mu / ntot - 2.0 * g_var * mu / ntot,
        2.0 * g_var / ntot,
    ])

    # y in x2 + dy out x2 + g/sel x2 each + per-phase fp32 temps + 4 held
    # bf16 parts before the concat, padded lane widths throughout
    r = _row_block(n, _pad_lanes(4 * c) * (4 * itemsize + 8)
                   + _pad_lanes(c) * (4 * itemsize + 8 * 4))
    dy = pl.pallas_call(
        _bwd_dy_kernel,
        grid=(n // r,),
        in_specs=[pl.BlockSpec((r, 4 * c), lambda i: (i, 0)),
                  pl.BlockSpec((r, c), lambda i: (i, 0)),
                  pl.BlockSpec((r, c), lambda i: (i, 0))]
        + [_chan_spec(c)] * 4 + [pl.BlockSpec((4, c), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((r, 4 * c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, 4 * c), y2.dtype),
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(y2, g_out, sel, mu.reshape(1, c), rstd.reshape(1, c),
      gamma32.reshape(1, c), beta32.reshape(1, c), k)

    dgamma = s2.astype(gamma.dtype)
    dbeta = s1.astype(beta.dtype)
    return dy, dgamma, dbeta


_fused_core.defvjp(_fused_fwd, _fused_bwd)


def fused_bn_phasemax_leaky(
    y: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Train-mode fused epilogue on a phase-major s2d conv output.

    y [B,T,H',W',4C] (channel ph*C + c, layers.space_to_depth_2x2) ->
      out [B,T,H',W',C]  == leaky_relu(phase_max_2x2(BN_train(y)), 0.01)
      mu, var [C] fp32   == the batch statistics (biased var, flax
                            convention) for the caller's running update.

    Differentiable in y, gamma, beta, INCLUDING the mu/var outputs'
    cotangent paths (they are zero in product training, where running stats
    are non-differentiated buffers, but the VJP is complete either way).
    """
    b, t, h, w, c4 = y.shape
    c = c4 // 4
    y2 = y.reshape(b * t * h * w, c4)  # row-major bitcast, no data movement
    out, mu, var = _fused_core(y2, gamma, beta)
    return out.reshape(b, t, h, w, c), mu, var


def epilogue_fits(n_rows: int, c: int) -> bool:
    """The kernels block rows by the largest pow2 divisor; any geometry
    works, but reject degenerate lane widths the layout can't tile."""
    return c >= 8 and n_rows >= 1
