#!/usr/bin/env python
"""Decompose the fusion step's dominant stage: the phasegram encoder (enc_v).

Round-3c rooflines (BASELINE.md): enc_v moves 6.6 GB/step at b256 — 64% HBM,
9% MXU, half the step's bytes — and the step as a whole sits at 86% of the
HBM roofline, so the only lever left is moving FEWER BYTES. The stack is 10
k(1,9) s(1,2) BN+tanh conv layers whose first half runs at 1..32 channels
(shape_plan.plan_phasegram_encoder, reference avse_model.py:427-446) — and
TPU tiles pad the minormost (feature) dim to 128 lanes, so a C=2 activation
may occupy 64x its logical bytes. This probe gets the evidence:

  per layer i:
    conv{i}_fwdbwd    the k(1,9) conv alone
    layer{i}_fwdbwd   conv + BN(train) + tanh (the product layer)
  whole encoder:
    enc_fwdbwd        the 10-layer chain
  and for each case a relay-safe compile_report: XLA's logical bytes
  accessed AND the compiled buffer sizes (padded, from memory_analysis) —
  the padded/logical ratio is the padding tax directly.

Usage: python benchmarks/pgenc_probe.py [--batch 256] [--layers-only]
       (TPU; serialize with other clients; idle host for the timings)
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256,
                    help="clips; encoder rows = batch * num_seq windows")
    ap.add_argument("--num_seq", type=int, default=4)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--p_size", type=int, default=64)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--skip-timing", action="store_true",
                    help="compile_report only (no chip execution)")
    args = ap.parse_args()

    from maavss_tpu.exp.profiling import compile_report
    from maavss_tpu.models.shape_plan import plan_phasegram_encoder
    from maavss_tpu.train.setup import init_runtime

    init_runtime()
    dtype = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)

    rows = args.batch * args.num_seq
    t = args.frames
    s0 = args.p_size ** 2
    specs, _ = plan_phasegram_encoder((rows, 1, t, s0), 64, 4096)

    from maavss_tpu.ops.pgenc_fold import (
        fold_lanes,
        folded_conv_1x9_s2,
        plan_folds,
        unfold_lanes,
    )

    def bn_tanh(y, sc, bi, groups=1):
        """BN(train)+tanh; with groups>1 the input is lane-folded
        [.., W/g, g*C] and stats reduce over the g lane groups too."""
        *lead, w, gc = y.shape
        yv = y.reshape(*lead, w, groups, gc // groups)
        yf = yv.astype(jnp.float32)
        axes = tuple(range(yf.ndim - 1))
        mu = jnp.mean(yf, axis=axes)
        var = jnp.mean(jnp.square(yf), axis=axes) - jnp.square(mu)
        yn = (yv - mu.astype(yv.dtype)) * jax.lax.rsqrt(
            var + 1e-5).astype(yv.dtype)
        yn = yn * sc.astype(yv.dtype) + bi.astype(yv.dtype)
        return jnp.tanh(yn).reshape(*lead, w, gc)

    def layer_fns(spec, f=None):
        def conv(xin, kin):
            return jax.lax.conv_general_dilated(
                xin, kin, window_strides=spec.stride,
                padding=((0, 0), (spec.padding[1],) * 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def layer(xin, kin, sc, bi):
            return bn_tanh(conv(xin, kin), sc, bi)

        def conv_fold(xin, kin):  # xin pre-folded [B,T,W/f,f*Cin]
            return folded_conv_1x9_s2(xin, kin, f)

        def layer_fold(xin, kin, sc, bi):
            return bn_tanh(conv_fold(xin, kin), sc, bi, groups=f // 2)

        return conv, layer, conv_fold, layer_fold

    def fwdbwd(fn, *fargs):
        def loss(*a):
            return jnp.sum(jnp.square(fn(*a).astype(jnp.float32)))

        @jax.jit
        def run(*a):
            l, g = jax.value_and_grad(loss, argnums=tuple(range(len(a))))(*a)
            gn = sum(jnp.sum(jnp.square(tt.astype(jnp.float32)))
                     for tt in jax.tree_util.tree_leaves(g))
            return l + 1e-30 * gn
        return run, fargs

    def timed(run, fargs):
        for _ in range(3):
            out = run(*fargs)
        float(out)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.reps):
                out = run(*fargs)
            float(out)
            times.append((time.perf_counter() - t0) / args.reps)
        return statistics.median(times) * 1e3

    def report(name, run, fargs, extra):
        rep = compile_report(run, *fargs)
        mem = {k.replace("_size_in_bytes", ""): round(rep[k] / 1e6, 1)
               for k in ("bytes_accessed", "temp_size_in_bytes",
                         "argument_size_in_bytes", "output_size_in_bytes")
               if k in rep}
        row = {"case": name, **extra,
               "gflops": round(rep.get("gflops", 0.0), 2), "mem_MB": mem}
        if not args.skip_timing:
            row["ms"] = round(timed(run, fargs), 2)
        print(json.dumps(row), flush=True)
        return row

    # ---- per-layer cases ---------------------------------------------------
    s = s0
    x_np = rng.standard_normal((rows, t, s, 1)) * 0.5
    results = []
    chain_inputs = []  # (x, k, sc, bi) per layer for the whole-encoder case
    for i, spec in enumerate(specs):
        x = jnp.asarray(x_np[..., :1] if i == 0 else
                        rng.standard_normal((rows, t, s, spec.in_ch)) * 0.5,
                        dtype)
        k = jnp.asarray(
            rng.standard_normal((1, 9, spec.in_ch, spec.out_ch))
            * (1.0 / np.sqrt(9 * spec.in_ch)), dtype)
        sc = jnp.ones((spec.out_ch,), jnp.float32)
        bi = jnp.zeros((spec.out_ch,), jnp.float32)
        chain_inputs.append((k, sc, bi))
        f = plan_folds([spec.in_ch], s, 128)[0]
        conv, layer, conv_fold, layer_fold = layer_fns(spec, f)
        extra = {"layer": i, "in": [int(s), spec.in_ch],
                 "out_ch": spec.out_ch}
        logical_mb = rows * t * s * spec.in_ch * dtype.itemsize / 1e6
        extra["logical_in_MB"] = round(logical_mb, 1)
        run, fargs = fwdbwd(conv, x, k)
        results.append(report(f"conv{i}_fwdbwd", run, fargs, extra))
        run, fargs = fwdbwd(layer, x, k, sc, bi)
        results.append(report(f"layer{i}_fwdbwd", run, fargs, extra))
        xf = fold_lanes(x, f)
        run, fargs = fwdbwd(conv_fold, xf, k)
        results.append(report(f"conv{i}_fold{f}_fwdbwd", run, fargs, extra))
        run, fargs = fwdbwd(layer_fold, xf, k, sc, bi)
        results.append(report(f"layer{i}_fold{f}_fwdbwd", run, fargs, extra))
        s = (s + 2 * spec.padding[1] - 9) // 2 + 1

    # ---- whole-encoder chain ----------------------------------------------
    def encoder(xin, *params):
        h = xin
        for spec, (k, sc, bi) in zip(specs, zip(*[iter(params)] * 3)):
            h = layer_fns(spec)[1](h, k, sc, bi)
        return h

    def encoder_fold(lane_target):
        folds = plan_folds([sp.in_ch for sp in specs], s0, lane_target)

        def enc(xin, *params):
            h = xin
            for spec, f, (k, sc, bi) in zip(specs, folds,
                                            zip(*[iter(params)] * 3)):
                y = folded_conv_1x9_s2(fold_lanes(h, f), k, f)
                y = bn_tanh(y, sc, bi, groups=f // 2)
                h = unfold_lanes(y, f // 2, spec.out_ch)
            return h
        return enc

    flat = [p for triple in chain_inputs for p in triple]
    x0 = jnp.asarray(x_np, dtype)
    run, fargs = fwdbwd(encoder, x0, *flat)
    results.append(report("enc_fwdbwd", run, fargs,
                          {"layers": len(specs), "rows": rows}))
    for lt in (32, 128):
        run, fargs = fwdbwd(encoder_fold(lt), x0, *flat)
        results.append(report(f"enc_fold{lt}_fwdbwd", run, fargs,
                              {"layers": len(specs), "rows": rows}))

    print(json.dumps({"metric": "pgenc_decomposition",
                      "batch": args.batch, "rows": rows,
                      "dtype": str(dtype),
                      "cases": {r["case"]: r.get("ms") for r in results}}))


if __name__ == "__main__":
    main()
