#!/usr/bin/env python
"""Decompose the frames trunk's stage-1/2 time: conv vs BN+pool, fwd vs bwd.

The s2d stage bisection (BASELINE.md round 3g) says stages 1-2 are ~2/3 of
the encoder, running at ~6% MXU — but not WHERE the time goes inside a
stage. Before hand-writing a Pallas stage kernel, this probe times, for the
s2d-folded stage (the production TPU form), each of:

  conv_fwd      the folded conv3d alone, forward
  conv_fwdbwd   + gradient (dgrad + wgrad)
  stage_fwd     conv + BN(train) + phase-max + leaky, forward
  stage_fwdbwd  the full stage with gradient — the bisection's unit

at the real b128 geometry, fetch-closed. The deltas attribute the cost:
conv_fwd vs stage_fwd isolates the BN/pool epilogue; conv_fwdbwd vs
conv_fwd isolates XLA's conv backward (dgrad/wgrad schedules).

Usage: python benchmarks/stage1_probe.py [--batch 128] [--stage 1|2]
       (TPU; serialize with other clients; idle host)
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
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--stage", type=int, default=1, choices=(1, 2))
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    from maavss_tpu.train.setup import init_runtime

    init_runtime()
    dtype = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)

    # s2d-folded geometry: stage 1 sees [B,T,128,128,4]->64ch; stage 2 sees
    # [B,T,64,64,64]->128ch (the post-stage-1 pooled tensor, re-folded)
    if args.stage == 1:
        hw, cin, cout = 128, 4, 64
    else:
        hw, cin, cout = 64, 64, 128
    x = jnp.asarray(rng.standard_normal(
        (args.batch, args.frames, hw, hw, cin)) * 0.5, dtype)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)) * 0.05, dtype)
    scale = jnp.ones((cout // 4,), jnp.float32)
    bias = jnp.zeros((cout // 4,), jnp.float32)

    def conv(xin, kin):
        return jax.lax.conv_general_dilated(
            xin, kin, window_strides=(1, 1, 1),
            padding=((1, 1), (1, 1), (1, 1)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    def stage(xin, kin, sc, bi):
        from maavss_tpu.models.layers import (
            batchnorm_view_to_phase_channels,
            phase_channels_to_batchnorm_view,
            phase_max_2x2,
        )
        from flax import linen as nn

        y = conv(xin, kin)
        yv = phase_channels_to_batchnorm_view(y)
        yf = yv.astype(jnp.float32)
        mu = jnp.mean(yf, axis=(0, 1, 2, 3))
        var = jnp.mean(jnp.square(yf), axis=(0, 1, 2, 3)) - jnp.square(mu)
        yn = (yv - mu.astype(yv.dtype)) * jax.lax.rsqrt(
            var + 1e-5).astype(yv.dtype)
        yn = yn * sc.astype(yv.dtype) + bi.astype(yv.dtype)
        y = batchnorm_view_to_phase_channels(yn)
        return nn.leaky_relu(phase_max_2x2(y), negative_slope=0.01)

    def stage_bnpost(xin, kin, sc, bi):
        """EXACT restructure: pool BEFORE the BN affine. The per-channel BN
        map is monotone (increasing for gamma>0, decreasing for gamma<0) and
        all 4 pooled phases share one channel's (mu,sigma,gamma,beta), so
        max(BN(c)) == BN(max(c)) for gamma>0 and == BN(min(c)) for gamma<0
        (gamma==0: both sides are beta). Stats still reduce over the FULL
        conv output, but the normalize + its backward now touch only the
        pooled quarter."""
        from maavss_tpu.models.layers import phase_max_2x2

        y = conv(xin, kin)
        b_, d_, h_, w_, c4 = y.shape
        yf = y.reshape(b_, d_, h_, w_, 4, c4 // 4).astype(jnp.float32)
        mu = jnp.mean(yf, axis=(0, 1, 2, 3, 4))
        var = jnp.mean(jnp.square(yf), axis=(0, 1, 2, 3, 4)) - jnp.square(mu)
        maxv = phase_max_2x2(y)
        minv = jnp.min(y.reshape(b_, d_, h_, w_, 4, c4 // 4), axis=4)
        sel = jnp.where((sc > 0).astype(maxv.dtype) > 0, maxv, minv)
        yn = (sel - mu.astype(sel.dtype)) * jax.lax.rsqrt(
            var + 1e-5).astype(sel.dtype)
        yn = yn * sc.astype(sel.dtype) + bi.astype(sel.dtype)
        from flax import linen as nn

        return nn.leaky_relu(yn, negative_slope=0.01)

    def stage_fused(xin, kin, sc, bi):
        """The fused Pallas epilogue (ops/pallas_epilogue.py): conv + ONE
        stats pass + ONE apply pass (backward: 1/4-domain reduce + one
        full read/write) replacing the whole BN+pool+leaky tail."""
        from maavss_tpu.ops.pallas_epilogue import fused_bn_phasemax_leaky

        y = conv(xin, kin)
        out, _, _ = fused_bn_phasemax_leaky(y, sc, bi)
        return out

    def fwd_probe(fn, *fargs):
        @jax.jit
        def run(*a):
            return jnp.sum(jnp.square(fn(*a).astype(jnp.float32)))
        return run, fargs

    def fwdbwd_probe(fn, *fargs):
        def loss(*a):
            return jnp.sum(jnp.square(fn(*a).astype(jnp.float32)))

        @jax.jit
        def run(*a):
            l, g = jax.value_and_grad(loss, argnums=tuple(range(len(a))))(*a)
            gn = sum(jnp.sum(jnp.square(t.astype(jnp.float32)))
                     for t in jax.tree_util.tree_leaves(g))
            return l + 1e-30 * gn  # keep the backward alive (no const-fold)
        return run, fargs

    cases = {
        "conv_fwd": fwd_probe(conv, x, k),
        "conv_fwdbwd": fwdbwd_probe(conv, x, k),
        "stage_fwd": fwd_probe(stage, x, k, scale, bias),
        "stage_fwdbwd": fwdbwd_probe(stage, x, k, scale, bias),
        "stage_bnpost_fwd": fwd_probe(stage_bnpost, x, k, scale, bias),
        "stage_bnpost_fwdbwd": fwdbwd_probe(stage_bnpost, x, k, scale, bias),
        "stage_fused_fwd": fwd_probe(stage_fused, x, k, scale, bias),
        "stage_fused_fwdbwd": fwdbwd_probe(stage_fused, x, k, scale, bias),
    }
    results = {}
    for name, (run, fargs) in cases.items():
        for _ in range(3):
            out = run(*fargs)
        float(out)  # fetch-close warmup
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.reps):
                out = run(*fargs)
            float(out)
            times.append((time.perf_counter() - t0) / args.reps)
        med = statistics.median(times) * 1e3
        results[name] = round(med, 2)
        print(json.dumps({"case": name, "ms": round(med, 2),
                          "windows_ms": [round(t * 1e3, 2) for t in times]}),
              flush=True)
    print(json.dumps({"metric": f"stage{args.stage}_decomposition_ms",
                      "results": results, "batch": args.batch,
                      "geometry": [hw, cin, cout], "dtype": str(dtype)}))


if __name__ == "__main__":
    main()
