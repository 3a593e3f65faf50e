#!/usr/bin/env python
"""Mosaic COMPILER capability probe: which even-lane-subsample formulation
does the backend accept at the pgenc geometry?

Round-3d finding: the minormost reshape-split `y.reshape(c, r, s//2, 2)`
passes jax's Mosaic *lowering* (tests/test_mosaic_lowering.py) but the
Mosaic *compiler* rejects it on chip: "infer-vector-layout: unsupported
shape cast vector<2x32x4096xf32> -> vector<2x32x2048x2xf32>"
(runs/probe_r3d/validate_pgenc.err). This probe COMPILES (no timing, no
correctness) each candidate at the real L1 width so the kernel rewrite is
chosen from measured capability, not guesses:

  a. split3d      (c, r, s) -> (c, r, s/2, 2) -> [..., 0]   (the failing one)
  b. split2d      (c*r, s) -> (c*r, s/2, 2) -> [..., 0]
  c. split2d @512 same, narrow width (does width matter?)
  d. sublane      layout [s, r]: y[::2, :] (stride on SUBLANES, not lanes)
  e. deint_taps   inputs pre-deinterleaved by XLA (xe, xo); kernel uses only
                  static shifts + dot — the fallback design if a-d all fail

Usage: python benchmarks/mosaic_probe2.py   (TPU relay; compile-only, fast)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def try_compile(name, fn, *args):
    rec = {"probe": name}
    try:
        jax.jit(fn).lower(*args).compile()
        rec["ok"] = True
    except Exception as e:
        rec.update(ok=False, error=str(e)[:180].replace("\n", " "))
    print(json.dumps(rec), flush=True)
    return rec.get("ok", False)


def main() -> None:
    C, R, S = 2, 64, 4096

    def pc(kernel, in_shapes, out_shape):
        specs = [pl.BlockSpec(s, lambda i, s=s: tuple(0 for _ in s))
                 for s in in_shapes]

        def f(*xs):
            return pl.pallas_call(
                kernel, grid=(1,),
                in_specs=specs,
                out_specs=pl.BlockSpec(out_shape,
                                       lambda i: tuple(0 for _ in out_shape)),
                out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32))(*xs)

        return f

    x3 = jnp.zeros((C, R, S), jnp.float32)

    # a. 3D minormost split (known-bad on chip; kept as the regression row)
    def k_a(x_ref, o_ref):
        v = x_ref[:]
        o_ref[:] = v.reshape(C, R, S // 2, 2)[:, :, :, 0]

    try_compile("split3d", pc(k_a, [(C, R, S)], (C, R, S // 2)), x3)

    # b. 2D minormost split
    def k_b(x_ref, o_ref):
        v = x_ref[:].reshape(C * R, S)
        o_ref[:] = v.reshape(C * R, S // 2, 2)[:, :, 0].reshape(C, R, S // 2)

    try_compile("split2d", pc(k_b, [(C, R, S)], (C, R, S // 2)), x3)

    # c. 2D split at width 512
    S2 = 512
    x3n = jnp.zeros((C, R, S2), jnp.float32)

    def k_c(x_ref, o_ref):
        v = x_ref[:].reshape(C * R, S2)
        o_ref[:] = v.reshape(C * R, S2 // 2, 2)[:, :, 0].reshape(C, R, S2 // 2)

    try_compile("split2d_w512", pc(k_c, [(C, R, S2)], (C, R, S2 // 2)), x3n)

    # d. stride on sublanes: [S, R] layout, take every other sublane
    xs2 = jnp.zeros((S, 128), jnp.float32)

    def k_d(x_ref, o_ref):
        o_ref[:] = x_ref[:][::2, :]

    try_compile("sublane_stride", pc(k_d, [(S, 128)], (S // 2, 128)), xs2)

    # e. deinterleaved-input taps: xe/xo prepared by XLA outside; kernel does
    # only static sublane... static LANE shifts + adds (the fallback design)
    W = S // 2 + 4  # deinterleaved padded width
    xe = jnp.zeros((C, R, W), jnp.float32)

    def k_e(xe_ref, xo_ref, o_ref):
        e, o = xe_ref[:], xo_ref[:]
        acc = jnp.zeros((C, R, S // 2), jnp.float32)
        for t in range(5):            # even taps w[0,2,4,6,8]
            acc = acc + (0.1 * t) * e[:, :, t:t + S // 2]
        for t in range(4):            # odd taps w[1,3,5,7]
            acc = acc + (0.2 * t) * o[:, :, t:t + S // 2]
        o_ref[:] = acc

    try_compile("deint_taps", pc(k_e, [(C, R, W), (C, R, W)], (C, R, S // 2)),
                xe, xe)


if __name__ == "__main__":
    main()
