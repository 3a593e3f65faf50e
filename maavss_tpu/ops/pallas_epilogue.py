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

LANE PACKING (the round-4b lesson, runs/probe_r4b/stage1.json): TPU tiles
pad the minormost dim to 128 lanes in HBM and VMEM, so streaming [N, C]
tensors at C=16 pays an 8x padding tax — the first on-chip build of these
kernels ran the fwd at 53.6 ms vs XLA's 11.3 (and OOMed HBM on the padded
sel residual). Every kernel therefore packs P = 128/C consecutive rows per
128-lane tile (a FREE position-major reshape):

  y   [N, 4C] -> [N/P, P*4C]     (row n = P*m + p at lane p*4C + ph*C + c)
  out/sel [N, C] -> [N/P, P*C]   (lane p*C + c; P*C == 128)

and per-lane parameter vectors are pre-tiled to [1, P*C] so the hot math
(BN affine, leaky, the backward's dsel/xhat) runs on full 128-lane tiles;
only the phase max/min selection and the backward's gradient routing touch
[R, C] sub-slices (static contiguous lane slices — the one Mosaic-safe
slice form, CLAUDE.md).

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
its own tie rule. Ties are measure-zero in fp32 but COMMON in bf16 (8-bit
mantissa); tools/validate_pallas_epilogue.py holds dy to an fp64 golden of
this exact first-match rule. The re-selection equality runs in fp32 —
bf16->fp32 is exact and injective, and v5e Mosaic rejects bf16 vector
compares ("Target does not support this comparison", runs/probe_r4b).

VMEM accounting uses PADDED lane widths (a [R, w] block occupies
ceil(w/128)*128 lanes); blocks are sized against that estimate and every
pallas_call raises the Mosaic scoped-VMEM limit (default 16 MiB) toward
the v5e's 128 MiB physical VMEM.

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


def _pack(c: int, n: int) -> int:
    """Rows packed per 128-lane tile: P = 128/C, capped by divisibility."""
    p = max(1, 128 // c)
    while n % p:
        p //= 2
    return p


def _chan_spec(w: int):
    """[1, w] per-lane operand replicated to every grid step."""
    return pl.BlockSpec((1, w), lambda i: (0, 0))


# ---------------------------------------------------------------- forward --


def _stats_kernel(y_ref, sums_ref, acc_ref):
    """Full-lane column sums of y and y*y into an fp32 scratch; the [2, L]
    result reduces to per-channel (over rows, P row-groups and 4 phases) on
    the XLA side — the kernel never leaves 128-lane-dense arithmetic."""

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    y = y_ref[:].astype(jnp.float32)
    acc_ref[0:1, :] += jnp.sum(y, axis=0, keepdims=True)
    acc_ref[1:2, :] += jnp.sum(y * y, axis=0, keepdims=True)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _write():
        sums_ref[:] = acc_ref[:]


def _apply_kernel(p_pack, y_ref, gamma_c_ref, mu_l_ref, rstd_l_ref,
                  gamma_l_ref, beta_l_ref, out_ref, sel_ref):
    """Phase max/min selection per row-group ([R, C] static lane slices),
    then one full-lane BN-affine + leaky over the packed [R, P*C] tile.
    max/min run in the IO dtype (exact — they only select)."""
    c = gamma_c_ref.shape[-1]
    gamma_c = gamma_c_ref[:]
    parts = []
    for p in range(p_pack):
        base = p * 4 * c
        m = y_ref[:, base:base + c]
        n = y_ref[:, base:base + c]
        for ph in range(1, 4):
            yp = y_ref[:, base + ph * c:base + (ph + 1) * c]
            m = jnp.maximum(m, yp)
            n = jnp.minimum(n, yp)
        parts.append(jnp.where(gamma_c > 0, m, n))
    sel_io = jnp.concatenate(parts, axis=-1) if p_pack > 1 else parts[0]
    sel = sel_io.astype(jnp.float32)
    o_bn = gamma_l_ref[:] * (sel - mu_l_ref[:]) * rstd_l_ref[:] + beta_l_ref[:]
    out = jnp.where(o_bn >= 0, o_bn, _SLOPE * o_bn)
    out_ref[:] = out.astype(out_ref.dtype)
    sel_ref[:] = sel_io


# --------------------------------------------------------------- backward --


def _bwd_reduce_kernel(g_ref, sel_ref, mu_l_ref, rstd_l_ref, gamma_l_ref,
                       beta_l_ref, sums_ref, acc_ref):
    """Pooled-domain sums at full lanes: per-LANE S1 = sum(dsel),
    S2 = sum(dsel * xhat), with dsel = g * leaky'(BN(sel)); the [2, P*C]
    result collapses over the P row-groups on the XLA side."""

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    g = g_ref[:].astype(jnp.float32)
    sel = sel_ref[:].astype(jnp.float32)
    xhat = (sel - mu_l_ref[:]) * rstd_l_ref[:]
    o_bn = gamma_l_ref[:] * xhat + beta_l_ref[:]
    dsel = g * jnp.where(o_bn >= 0, 1.0, _SLOPE)
    acc_ref[0:1, :] += jnp.sum(dsel, axis=0, keepdims=True)
    acc_ref[1:2, :] += jnp.sum(dsel * xhat, axis=0, keepdims=True)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _write():
        sums_ref[:] = acc_ref[:]


def _bwd_dy_kernel(p_pack, y_ref, g_ref, sel_ref, mu_c_ref, rstd_c_ref,
                   k_ref, mu_l_ref, rstd_l_ref, gamma_l_ref, beta_l_ref,
                   dy_ref):
    """Full-domain dy in ONE read of y + one write of dy. dsel*gamma (the
    dxhat at selected positions) is computed once at full lanes; the
    first-match routing masks recompute from (y, sel) per row-group and
    phase — sel round-trips bit-exact through the IO dtype and the equality
    runs in fp32 (exact from bf16; v5e Mosaic rejects bf16 compares).
    k_ref rows: [k1, k2, ka, kb] = [gamma*S1/N, gamma*S2/N,
    g_mu/N - 2*g_var*mu/N, 2*g_var/N] (the last two carry the mu/var output
    cotangents, zero in product training where running stats are buffers)."""
    c = mu_c_ref.shape[-1]
    g = g_ref[:].astype(jnp.float32)
    sel = sel_ref[:].astype(jnp.float32)
    xhat_sel = (sel - mu_l_ref[:]) * rstd_l_ref[:]
    o_bn = gamma_l_ref[:] * xhat_sel + beta_l_ref[:]
    dsel_g = (g * jnp.where(o_bn >= 0, 1.0, _SLOPE)
              * gamma_l_ref[:])  # == dxhat at selected positions, [R, P*C]
    mu, rstd = mu_c_ref[:], rstd_c_ref[:]
    k1 = k_ref[0:1, :]
    k2 = k_ref[1:2, :]
    ka = k_ref[2:3, :]
    kb = k_ref[3:4, :]
    parts = []
    for p in range(p_pack):
        sel_p = sel[:, p * c:(p + 1) * c]
        dsg_p = dsel_g[:, p * c:(p + 1) * c]
        taken = jnp.zeros_like(sel_p, dtype=jnp.bool_)
        for ph in range(4):
            yp = y_ref[:, (p * 4 + ph) * c:(p * 4 + ph + 1) * c].astype(
                jnp.float32)
            hit = jnp.logical_and(yp == sel_p, jnp.logical_not(taken))
            taken = jnp.logical_or(taken, hit)
            dxhat = jnp.where(hit, dsg_p, 0.0)
            xhat = (yp - mu) * rstd
            dyp = rstd * (dxhat - k1 - xhat * k2) + ka + yp * kb
            parts.append(dyp.astype(dy_ref.dtype))
    dy_ref[:] = jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]


# ---------------------------------------------------------------- wrapper --


def _tile_lanes(v: jnp.ndarray, p: int) -> jnp.ndarray:
    """[C] per-channel fp32 -> [1, P*C] per-lane (lane p*C + c)."""
    return jnp.tile(v.astype(jnp.float32), p).reshape(1, -1)


def _stats(yp: jnp.ndarray, p: int, c: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    m, l4 = yp.shape
    it = yp.dtype.itemsize
    r = _row_block(m, _pad_lanes(l4) * (2 * it + 4))
    sums = pl.pallas_call(
        _stats_kernel,
        grid=(m // r,),
        in_specs=[pl.BlockSpec((r, l4), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((2, l4), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((2, l4), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, l4), jnp.float32)],
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(yp)
    per_chan = jnp.sum(sums.reshape(2, p, 4, c), axis=(1, 2))
    ntot = jnp.float32(4 * m * p)
    mu = per_chan[0] / ntot
    var = per_chan[1] / ntot - mu * mu
    return mu, var


def _apply(yp, mu, rstd, gamma, beta, p, c):
    from functools import partial

    m, l4 = yp.shape
    lo = p * c
    it = yp.dtype.itemsize
    # y in x2 buffers + out/sel x2 each + ~6 fp32 full-lane temps, padded
    r = _row_block(m, _pad_lanes(l4) * 2 * it
                   + _pad_lanes(lo) * (4 * it + 6 * 4))
    out, sel = pl.pallas_call(
        partial(_apply_kernel, p),
        grid=(m // r,),
        in_specs=[pl.BlockSpec((r, l4), lambda i: (i, 0)),
                  _chan_spec(c)] + [_chan_spec(lo)] * 4,
        out_specs=[pl.BlockSpec((r, lo), lambda i: (i, 0))] * 2,
        out_shape=[jax.ShapeDtypeStruct((m, lo), yp.dtype)] * 2,
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(yp, gamma.reshape(1, c), _tile_lanes(mu, p), _tile_lanes(rstd, p),
      _tile_lanes(gamma, p), _tile_lanes(beta, p))
    return out, sel


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_core(yp: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
                p: int):
    """[N/P, P*4C] packed conv output -> (out [N/P, P*C], mu [C], var [C])."""
    c = gamma.shape[0]
    mu, var = _stats(yp, p, c)
    rstd = jax.lax.rsqrt(var + _EPS)
    out, _ = _apply(yp, mu, rstd, gamma.astype(jnp.float32),
                    beta.astype(jnp.float32), p, c)
    return out, mu, var


def _fused_fwd(yp, gamma, beta, p):
    c = gamma.shape[0]
    mu, var = _stats(yp, p, c)
    rstd = jax.lax.rsqrt(var + _EPS)
    out, sel = _apply(yp, mu, rstd, gamma.astype(jnp.float32),
                      beta.astype(jnp.float32), p, c)
    return (out, mu, var), (yp, sel, mu, rstd, gamma, beta)


def _fused_bwd(p, res, cts):
    from functools import partial

    yp, sel, mu, rstd, gamma, beta = res
    gamma32 = gamma.astype(jnp.float32)
    beta32 = beta.astype(jnp.float32)
    g_out, g_mu, g_var = cts
    m, l4 = yp.shape
    c = l4 // (4 * p)
    lo = p * c
    it = yp.dtype.itemsize

    r = _row_block(m, _pad_lanes(lo) * (4 * it + 6 * 4))
    sums = pl.pallas_call(
        _bwd_reduce_kernel,
        grid=(m // r,),
        in_specs=[pl.BlockSpec((r, lo), lambda i: (i, 0))] * 2
        + [_chan_spec(lo)] * 4,
        out_specs=pl.BlockSpec((2, lo), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((2, lo), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, lo), jnp.float32)],
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(g_out, sel, _tile_lanes(mu, p), _tile_lanes(rstd, p),
      _tile_lanes(gamma32, p), _tile_lanes(beta32, p))
    per_chan = jnp.sum(sums.reshape(2, p, c), axis=1)
    s1, s2 = per_chan[0], per_chan[1]

    ntot = jnp.float32(4 * m * p)  # per-channel element count == 4*N
    g_mu = g_mu.astype(jnp.float32)
    g_var = g_var.astype(jnp.float32)
    k = jnp.stack([
        gamma32 * s1 / ntot,
        gamma32 * s2 / ntot,
        g_mu / ntot - 2.0 * g_var * mu / ntot,
        2.0 * g_var / ntot,
    ])

    # y in x2 + dy out x2 + g/sel x2 each + full-lane fp32 temps, padded
    r = _row_block(m, _pad_lanes(l4) * (4 * it + 4)
                   + _pad_lanes(lo) * (4 * it + 8 * 4))
    dy = pl.pallas_call(
        partial(_bwd_dy_kernel, p),
        grid=(m // r,),
        in_specs=[pl.BlockSpec((r, l4), lambda i: (i, 0)),
                  pl.BlockSpec((r, lo), lambda i: (i, 0)),
                  pl.BlockSpec((r, lo), lambda i: (i, 0)),
                  _chan_spec(c), _chan_spec(c),
                  pl.BlockSpec((4, c), lambda i: (0, 0))]
        + [_chan_spec(lo)] * 4,
        out_specs=pl.BlockSpec((r, l4), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, l4), yp.dtype),
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(yp, g_out, sel, mu.reshape(1, c), rstd.reshape(1, c), k,
      _tile_lanes(mu, p), _tile_lanes(rstd, p), _tile_lanes(gamma32, p),
      _tile_lanes(beta32, p))

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
    n = b * t * h * w
    p = _pack(c, n)
    yp = y.reshape(n // p, p * c4)  # row-major bitcast, no data movement
    out, mu, var = _fused_core(yp, gamma, beta, p)
    return out.reshape(b, t, h, w, c), mu, var


def epilogue_fits(n_rows: int, c: int) -> bool:
    """The kernels block rows by the largest pow2 divisor; any geometry
    works, but reject degenerate lane widths the layout can't tile."""
    return c >= 8 and n_rows >= 1
