#!/usr/bin/env python
"""Mosaic capability/latency probe for the fused phasegram-encoder design.

The fusion step's remaining per-chip lever is HBM traffic in the phasegram
encoder's ten (1,9)-stride-2 conv+BN+tanh layers (BASELINE.md round-3b
roofline: the step runs AT the HBM roofline). A fused Pallas layer would cut
the layer's passes ~40%, BUT its viability hinges on one Mosaic lowering
question this probe answers on hardware (the magphase/atan2 lesson: interpret
mode proves nothing about the chip):

  1. lane-strided slice `x[:, k::2]` inside a kernel — compiles? fast?
     (needed for the stride-2 tap gather; if unsupported, the deinterleave
     must happen in XLA outside the kernel, which costs back the savings)
  2. static lane shifts via pad+slice (`x[:, k:k+n]`) — the tap window reads
  3. per-channel reductions to an SMEM/VMEM scratch — the BN stats pass

Each sub-kernel is timed fetch-closed against a plain-XLA equivalent on the
L1 geometry ([8192, 4096] fp32 rows). Prints one JSON line per capability.

Usage: python benchmarks/mosaic_probe.py   (TPU; serialize; idle host)

ANSWERED on chip 2026-08-18 (runs/probe_r3c/mosaic_probe.json): strided lane
slices do NOT lower (2D or 3D — Mosaic's gather path rejects both), and the
two-pass SMEM-stats normalize is slower than XLA's fusion (2.03 vs 1.80 ms).
For pure CAN-IT-LOWER questions this probe is superseded by
tests/test_mosaic_lowering.py (cross-lowering runs the real Mosaic pipeline
on the CPU host); keep the probe for the latency half of the answer.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


REPS = int(os.environ.get("MAAVSS_PROBE_REPS", "20"))


def timed(fn, *args, reps=None):
    reps = reps or REPS
    out = fn(*args)
    s = float(jnp.sum(out.astype(jnp.float32)))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        s = float(jnp.sum(out.astype(jnp.float32)))  # fetch-close
        times.append((time.perf_counter() - t0) / reps)
    return statistics.median(times) * 1e3, s


def probe(name, build, ref, x):
    """Compile + run `build(x)`, compare to ref(x), time both."""
    rec = {"probe": name}
    try:
        fn = jax.jit(build)
        ms, _ = timed(fn, x)
        ref_ms, _ = timed(jax.jit(ref), x)
        ok = np.allclose(np.asarray(fn(x)), np.asarray(ref(x)), atol=1e-5)
        rec.update(ok=bool(ok), pallas_ms=round(ms, 3),
                   xla_ms=round(ref_ms, 3))
    except Exception as e:
        rec.update(ok=False, error=str(e)[:200])
    print(json.dumps(rec), flush=True)
    return rec


def main() -> None:
    rows = int(os.environ.get("MAAVSS_PROBE_ROWS", "8192"))
    w = int(os.environ.get("MAAVSS_PROBE_WIDTH", "4096"))
    x = jnp.asarray(np.random.default_rng(0).random((rows, w)), jnp.float32)
    blk = min(256, rows)
    if rows % blk:
        raise SystemExit(f"MAAVSS_PROBE_ROWS={rows} must be a multiple of "
                         f"{blk} (grids use rows // blk)")

    spec_in = pl.BlockSpec((blk, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
    spec_half = pl.BlockSpec((blk, w // 2), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)

    # 1. lane-strided slice x[:, 0::2]
    def k_stride(x_ref, o_ref):
        o_ref[:] = x_ref[:][:, 0::2]

    probe("lane_stride2_slice",
          lambda x: pl.pallas_call(
              k_stride, grid=(rows // blk,), in_specs=[spec_in],
              out_specs=spec_half,
              out_shape=jax.ShapeDtypeStruct((rows, w // 2), x.dtype),
              interpret=_interpret())(x),
          lambda x: x[:, 0::2], x)

    # 2. static lane shift (pad+slice window read), 9-tap FMA at stride 1
    def k_taps(x_ref, o_ref):
        xv = x_ref[:]
        acc = jnp.zeros((blk, w - 8), xv.dtype)
        for k in range(9):
            acc = acc + (0.1 * (k + 1)) * xv[:, k:k + w - 8]
        o_ref[:] = acc

    def ref_taps(x):
        acc = jnp.zeros((x.shape[0], w - 8), x.dtype)
        for k in range(9):
            acc = acc + (0.1 * (k + 1)) * x[:, k:k + w - 8]
        return acc

    spec_taps = pl.BlockSpec((blk, w - 8), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    probe("lane_shift_9tap_fma",
          lambda x: pl.pallas_call(
              k_taps, grid=(rows // blk,), in_specs=[spec_in],
              out_specs=spec_taps,
              out_shape=jax.ShapeDtypeStruct((rows, w - 8), x.dtype),
              interpret=_interpret())(x),
          ref_taps, x)

    # 3. full stride-2 9-tap conv in one kernel (strided slice of each tap)
    wo = (w - 8) // 2

    def k_conv(x_ref, o_ref):
        xv = x_ref[:]
        acc = jnp.zeros((blk, wo), xv.dtype)
        for k in range(9):
            acc = acc + (0.1 * (k + 1)) * xv[:, k:k + 2 * wo:2]
        o_ref[:] = acc

    def ref_conv(x):
        acc = jnp.zeros((x.shape[0], wo), x.dtype)
        for k in range(9):
            acc = acc + (0.1 * (k + 1)) * x[:, k:k + 2 * wo:2]
        return acc

    spec_conv = pl.BlockSpec((blk, wo), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    probe("stride2_9tap_conv",
          lambda x: pl.pallas_call(
              k_conv, grid=(rows // blk,), in_specs=[spec_in],
              out_specs=spec_conv,
              out_shape=jax.ShapeDtypeStruct((rows, wo), x.dtype),
              interpret=_interpret())(x),
          ref_conv, x)

    # 4. two-pass stats + normalize (the BN shape): pass 1 accumulates a
    # scalar sum in SMEM scratch across sequential grid steps, pass 2 scales
    def k_bn(x_ref, o_ref, acc_ref):
        p = pl.program_id(0)
        n = pl.num_programs(1)

        @pl.when((p == 0) & (pl.program_id(1) == 0))
        def _zero():
            acc_ref[0] = 0.0

        @pl.when(p == 0)
        def _acc():
            acc_ref[0] += jnp.sum(x_ref[:])

        @pl.when(p == 1)
        def _norm():
            mean = acc_ref[0] / (rows * w)
            o_ref[:] = jnp.tanh(x_ref[:] - mean)

        del n

    def ref_bn(x):
        return jnp.tanh(x - jnp.mean(x))

    probe("two_pass_stats_normalize",
          lambda x: pl.pallas_call(
              k_bn, grid=(2, rows // blk),
              in_specs=[pl.BlockSpec((blk, w), lambda p, i: (i, 0),
                                     memory_space=pltpu.VMEM)],
              out_specs=pl.BlockSpec((blk, w), lambda p, i: (i, 0),
                                     memory_space=pltpu.VMEM),
              out_shape=jax.ShapeDtypeStruct((rows, w), x.dtype),
              scratch_shapes=[pltpu.SMEM((1,), jnp.float32)],
              interpret=_interpret())(x),
          ref_bn, x)


if __name__ == "__main__":
    main()
