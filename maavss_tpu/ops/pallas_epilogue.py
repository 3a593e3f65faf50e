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

LAYOUT (v3 — the round-4b/4c lessons, runs/probe_r4b + r4c stage probes):
two earlier builds lost to XLA on chip and each taught a wall:

- v1 streamed [N, C] tensors at C=16 and paid the 128-lane padding tax in
  VMEM (fwd 53.6 ms vs XLA's 11.3; the padded sel residual OOMed HBM).
- v2 packed P=128/C rows per 128-lane tile. That made the STREAMS dense but
  moved the hot math into p_pack x 4 static sub-lane slices of [R, C]
  (1/8th VPU width at C=16, plus lane shuffles), and the packing reshape
  [B,T,H,W,4C] -> [N/P, P*4C] is a physical relayout of the conv output,
  timed inside the op (fwd 36.7 ms vs XLA's 6.4).

v3 therefore streams the conv output in its NATIVE row layout —
[B,T,H,W,4C] viewed as [N, 4C], a FREE reshape — and does the phase
reduction with full-vector static pad+slice SHIFTS along the lane axis (the
one Mosaic-proven vector-displacement form, CLAUDE.md):

  m = max(y, y<<C, y<<2C, y<<3C)        (lanes 0..C-1 = phase max of c)
  first-match routing: eq = (y == sel4), prefix = eq>>C | eq>>2C | eq>>3C,
  hit = eq & ~prefix                    (exactly the sequential tie rule)

Every wide op runs at the tensor's natural 4C lanes (64 at stage 1 — half a
vreg; 128+ at stages 2-3 — dense); only the final [*, :C] selections are
narrow, and they are contiguous-from-0 lane slices (Mosaic-safe).

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

from functools import partial
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


def _chan_spec(w: int):
    """[1, w] per-lane operand replicated to every grid step."""
    return pl.BlockSpec((1, w), lambda i: (0, 0))


def _shl(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """result[:, l] = x[:, l+k] (zeros shifted in at the tail) — a static
    pad+slice, the Mosaic-proven lane-displacement form."""
    return jnp.pad(x, ((0, 0), (0, k)))[:, k:]


def _shr(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """result[:, l] = x[:, l-k] (zeros at the head)."""
    return jnp.pad(x, ((0, 0), (k, 0)))[:, : x.shape[1]]


# ---------------------------------------------------------------- forward --


def _stats_kernel(y_ref, sums_ref, acc_ref):
    """Per-LANE column sums of y and y*y into an fp32 scratch; the [2, 4C]
    result reduces over the 4 phase groups to per-channel on the XLA side —
    the kernel never leaves natural-lane-width arithmetic."""

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    y = y_ref[:].astype(jnp.float32)
    acc_ref[0:1, :] += jnp.sum(y, axis=0, keepdims=True)
    acc_ref[1:2, :] += jnp.sum(y * y, axis=0, keepdims=True)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _write():
        sums_ref[:] = acc_ref[:]


def _apply_kernel(c, y_ref, gamma_c_ref, mu_c_ref, rstd_c_ref, beta_c_ref,
                  out_ref, sel_ref):
    """Phase max/min by full-vector lane shifts, then BN-affine + leaky on
    the [R, C] selection (contiguous-from-0 lane slice). max/min run in the
    IO dtype (exact — they only select)."""
    y = y_ref[:]
    m = y
    n = y
    for ph in range(1, 4):
        s = _shl(y, ph * c)
        m = jnp.maximum(m, s)
        n = jnp.minimum(n, s)
    gamma_c = gamma_c_ref[:]
    sel_io = jnp.where(gamma_c > 0, m[:, :c], n[:, :c])
    sel = sel_io.astype(jnp.float32)
    o_bn = gamma_c * (sel - mu_c_ref[:]) * rstd_c_ref[:] + beta_c_ref[:]
    out = jnp.where(o_bn >= 0, o_bn, _SLOPE * o_bn)
    out_ref[:] = out.astype(out_ref.dtype)
    sel_ref[:] = sel_io


# --------------------------------------------------------------- backward --


def _bwd_reduce_kernel(g_ref, sel_ref, mu_c_ref, rstd_c_ref, gamma_c_ref,
                       beta_c_ref, sums_ref, acc_ref):
    """Pooled-domain sums: per-channel S1 = sum(dsel), S2 = sum(dsel * xhat),
    with dsel = g * leaky'(BN(sel)); accumulated across grid steps in an
    fp32 scratch."""

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    g = g_ref[:].astype(jnp.float32)
    sel = sel_ref[:].astype(jnp.float32)
    xhat = (sel - mu_c_ref[:]) * rstd_c_ref[:]
    o_bn = gamma_c_ref[:] * xhat + beta_c_ref[:]
    dsel = g * jnp.where(o_bn >= 0, 1.0, _SLOPE)
    acc_ref[0:1, :] += jnp.sum(dsel, axis=0, keepdims=True)
    acc_ref[1:2, :] += jnp.sum(dsel * xhat, axis=0, keepdims=True)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _write():
        sums_ref[:] = acc_ref[:]


def _bwd_dy_kernel(c, y_ref, g_ref, sel_ref, mu_c_ref, rstd_c_ref,
                   gamma_c_ref, beta_c_ref, mu_l_ref, rstd_l_ref, k_ref,
                   dy_ref):
    """Full-domain dy in ONE read of y + one write of dy, all full-vector:
    the selected-position gradient (dsel*gamma) is tiled to every phase
    group by lane concatenation, the first-match routing mask is
    eq & ~prefix with prefix = OR of right-shifted eq (the earlier groups'
    matches), and the compare runs in fp32 (exact from bf16; v5e Mosaic
    rejects bf16 compares — runs/probe_r4b).
    k_ref rows: [k1, k2, ka, kb] = [gamma*S1/N, gamma*S2/N,
    g_mu/N - 2*g_var*mu/N, 2*g_var/N], pre-tiled to [4, 4C] (the last two
    carry the mu/var output cotangents, zero in product training where
    running stats are buffers)."""
    y = y_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    sel = sel_ref[:].astype(jnp.float32)
    xhat_sel = (sel - mu_c_ref[:]) * rstd_c_ref[:]
    o_bn = gamma_c_ref[:] * xhat_sel + beta_c_ref[:]
    dsg = g * jnp.where(o_bn >= 0, 1.0, _SLOPE) * gamma_c_ref[:]  # [R, C]
    sel4 = jnp.concatenate([sel] * 4, axis=-1)  # [R, 4C]
    dsg4 = jnp.concatenate([dsg] * 4, axis=-1)
    # first-match routing in fp32 MASKS: padding an i1 vector dies in the
    # Mosaic backend ("Invalid vector register cast", vector<8x128xi1> ->
    # i32 bitcast — runs/probe_r4d/validate_epilogue.err; invisible to
    # cross-lowering CI), so the prefix-OR over earlier phase groups runs
    # as shifted 0/1 float adds instead of shifted bools.
    eq_f = jnp.where(y == sel4, 1.0, 0.0)
    prefix = _shr(eq_f, c) + _shr(eq_f, 2 * c) + _shr(eq_f, 3 * c)
    hit_f = eq_f * jnp.maximum(0.0, 1.0 - prefix)
    dxhat = dsg4 * hit_f
    xhat = (y - mu_l_ref[:]) * rstd_l_ref[:]
    k1 = k_ref[0:1, :]
    k2 = k_ref[1:2, :]
    ka = k_ref[2:3, :]
    kb = k_ref[3:4, :]
    dy = rstd_l_ref[:] * (dxhat - k1 - xhat * k2) + ka + y * kb
    dy_ref[:] = dy.astype(dy_ref.dtype)


# ---------------------------------------------------------------- wrapper --


def _tile_lanes(v: jnp.ndarray, reps: int) -> jnp.ndarray:
    """[C] per-channel fp32 -> [1, reps*C] per-lane (lane ph*C + c)."""
    return jnp.tile(v.astype(jnp.float32), reps).reshape(1, -1)


def _stats(yr: jnp.ndarray, c: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    m, l4 = yr.shape
    it = yr.dtype.itemsize
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
    )(yr)
    per_chan = jnp.sum(sums.reshape(2, 4, c), axis=1)
    ntot = jnp.float32(m * 4)
    mu = per_chan[0] / ntot
    var = per_chan[1] / ntot - mu * mu
    return mu, var


def _apply(yr, mu, rstd, gamma, beta, c):
    m, l4 = yr.shape
    it = yr.dtype.itemsize
    # y block x2 (pipelined) + out/sel x2 each + ~5 full-lane fp32 temps
    r = _row_block(m, _pad_lanes(l4) * (2 * it + 5 * 4)
                   + _pad_lanes(c) * 4 * it)
    out, sel = pl.pallas_call(
        partial(_apply_kernel, c),
        grid=(m // r,),
        in_specs=[pl.BlockSpec((r, l4), lambda i: (i, 0))]
        + [_chan_spec(c)] * 4,
        out_specs=[pl.BlockSpec((r, c), lambda i: (i, 0))] * 2,
        out_shape=[jax.ShapeDtypeStruct((m, c), yr.dtype)] * 2,
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(yr, gamma.reshape(1, c), mu.reshape(1, c), rstd.reshape(1, c),
      beta.reshape(1, c))
    return out, sel


@partial(jax.custom_vjp, nondiff_argnums=())
def _fused_core(yr: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray):
    """[N, 4C] conv output rows -> (out [N, C], mu [C], var [C])."""
    c = gamma.shape[0]
    mu, var = _stats(yr, c)
    rstd = jax.lax.rsqrt(var + _EPS)
    out, _ = _apply(yr, mu, rstd, gamma.astype(jnp.float32),
                    beta.astype(jnp.float32), c)
    return out, mu, var


def _fused_fwd(yr, gamma, beta):
    c = gamma.shape[0]
    mu, var = _stats(yr, c)
    rstd = jax.lax.rsqrt(var + _EPS)
    out, sel = _apply(yr, mu, rstd, gamma.astype(jnp.float32),
                      beta.astype(jnp.float32), c)
    return (out, mu, var), (yr, sel, mu, rstd, gamma, beta)


def _fused_bwd(res, cts):
    yr, sel, mu, rstd, gamma, beta = res
    gamma32 = gamma.astype(jnp.float32)
    beta32 = beta.astype(jnp.float32)
    g_out, g_mu, g_var = cts
    m, l4 = yr.shape
    c = l4 // 4
    it = yr.dtype.itemsize

    r = _row_block(m, _pad_lanes(c) * (4 * it + 6 * 4))
    sums = pl.pallas_call(
        _bwd_reduce_kernel,
        grid=(m // r,),
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

    ntot = jnp.float32(m * 4)  # per-channel element count == 4 * pooled N
    g_mu = g_mu.astype(jnp.float32)
    g_var = g_var.astype(jnp.float32)
    k = jnp.stack([
        _tile_lanes(gamma32 * s1 / ntot, 4)[0],
        _tile_lanes(gamma32 * s2 / ntot, 4)[0],
        _tile_lanes(g_mu / ntot - 2.0 * g_var * mu / ntot, 4)[0],
        _tile_lanes(2.0 * g_var / ntot, 4)[0],
    ])

    # y block x2 + dy out x2 + ~8 full-lane fp32 temps + g/sel x2 each
    r = _row_block(m, _pad_lanes(l4) * (4 * it + 8 * 4)
                   + _pad_lanes(c) * 4 * it)
    dy = pl.pallas_call(
        partial(_bwd_dy_kernel, c),
        grid=(m // r,),
        in_specs=[pl.BlockSpec((r, l4), lambda i: (i, 0)),
                  pl.BlockSpec((r, c), lambda i: (i, 0)),
                  pl.BlockSpec((r, c), lambda i: (i, 0))]
        + [_chan_spec(c)] * 4
        + [_chan_spec(l4)] * 2
        + [pl.BlockSpec((4, l4), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((r, l4), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, l4), yr.dtype),
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(yr, g_out, sel, mu.reshape(1, c), rstd.reshape(1, c),
      gamma32.reshape(1, c), beta32.reshape(1, c),
      _tile_lanes(mu, 4), _tile_lanes(rstd, 4), k)

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
    yr = y.reshape(n, c4)  # merge leading dims only — a free view
    out, mu, var = _fused_core(yr, gamma, beta)
    return out.reshape(b, t, h, w, c), mu, var


def epilogue_fits(n_rows: int, c: int) -> bool:
    """The kernels block rows by the largest pow2 divisor; any geometry
    works, but reject degenerate lane widths the layout can't tile."""
    return c >= 8 and n_rows >= 1
