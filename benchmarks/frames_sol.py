#!/usr/bin/env python
"""Per-stage speed-of-light certification of the frames visual trunk — the
frames analog of fusion_probe's r4i table (round-4 VERDICT item 1).

For each of the 5 conv3d stages IN ISOLATION (realistic input shape for the
production full-encode span), and for the whole encoder + the full train
step: fetch-closed fwd and fwd+bwd wall time next to the relay-safe roofline
(XLA cost analysis: GB moved, %HBM and %MXU of speed-of-light). Answers,
stage by stage, "is this stage at ITS OWN roofline, and which wall is it
near" — closing the r3f "~6x in the conv3d schedule" question with
attribution instead of an aggregate.

MAAVSS_EPILOGUE=lean|xla A/Bs the round-5 lean stage tail
(ops/lean_epilogue.py) through the same table.

Usage (TPU, idle host, exclusive relay):
  python benchmarks/frames_sol.py [--batch 128] [--frames 11] [--reps 5]
Reference geometry: the --frames_encode full span (nf+ns-1 = 11 frames at
the reference defaults, avse_model_final.py:33-59 stages).
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

if os.environ.get("MAAVSS_QC_CPU"):
    # the axon site hook re-forces JAX_PLATFORMS=axon; this is the reliable
    # CPU escape (CLAUDE.md) — used for smoke-testing the probe off-chip
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from flax import linen as nn


STAGES = [(16, (2, 2), 2), (32, (2, 2), 2), (64, (2, 2), 2),
          (64, (2, 2), 3), (16, (3, 3), 3)]


def stage_io_shapes(size: int):
    """[(hw_in, c_in, hw_out, c_out)] for the 5 stages at input size²x1."""
    shapes = []
    hw, c = size, 1
    for out_ch, _pad, pool in STAGES:
        shapes.append((hw, c, hw // pool, out_ch))
        hw, c = hw // pool, out_ch
    return shapes


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--frames", type=int, default=11,
                    help="full-encode span nf+ns-1 at reference defaults")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--stages", default="1,2,3,4,5")
    ap.add_argument("--skip_step", action="store_true",
                    help="skip the full train-step row (own bench covers it)")
    ap.add_argument("--no_tail", action="store_true",
                    help="bisect: time the stage's conv3d ALONE (no BN/pool/"
                         "leaky) — attributes off-roofline stages between "
                         "the conv schedule and the epilogue")
    args = ap.parse_args()

    from maavss_tpu.exp.profiling import compile_report
    from maavss_tpu.models.layers import (
        TorchBatchNorm, _ConvParams, frames_conv3d_stage,
    )
    from maavss_tpu.train.setup import init_runtime, jit_init

    init_runtime()
    dtype = jnp.dtype(args.dtype)
    conv_impl = os.environ.get("MAAVSS_CONV3D", "s2d")
    epilogue = os.environ.get("MAAVSS_EPILOGUE", "xla")
    s2d_min_hw = int(os.environ.get("MAAVSS_S2D_MIN_HW", "128"))

    class OneStage(nn.Module):
        """Stage i standalone, same executor + epilogue wiring as
        FramesVisualEncoder (models/fusion_frames.py)."""
        out_ch: int
        pad: tuple
        pool: int

        @nn.compact
        def __call__(self, x, train: bool = True):
            from maavss_tpu.models.layers import _BNHolder, s2d_fold_eligible

            kernel, _ = _ConvParams(self.out_ch, x.shape[-1], (3, 5, 5),
                                    False, name="Conv_0")()
            if args.no_tail:
                # conv3d alone (direct form — what stages at hw < s2d_min_hw
                # actually execute): isolates the conv schedule from the
                # BN+pool+leaky epilogue
                return jax.lax.conv_general_dilated(
                    x.astype(dtype), kernel.astype(dtype),
                    window_strides=(1, 1, 1),
                    padding=((1, 1), self.pad, self.pad),
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            use_tail = (epilogue in ("fused", "lean") and train
                        and conv_impl == "s2d"
                        and s2d_fold_eligible(x.shape, self.pad, self.pool,
                                              s2d_min_hw))
            if use_tail:
                if epilogue == "lean":
                    from maavss_tpu.ops.lean_epilogue import (
                        lean_bn_phasemax_leaky as tail_fn)
                else:
                    from maavss_tpu.ops.pallas_epilogue import (
                        fused_bn_phasemax_leaky as tail_fn)
                scale, bias, rm, rv = _BNHolder(self.out_ch,
                                                name="TorchBatchNorm_0")()

                def fused_tail(y):
                    out, mu, var = tail_fn(y, scale, bias)
                    if not self.is_initializing():
                        rm.value = 0.9 * rm.value + 0.1 * mu
                        rv.value = 0.9 * rv.value + 0.1 * var
                    return out

                return frames_conv3d_stage(
                    x, kernel, self.pad, self.pool, conv_impl=conv_impl,
                    dtype=dtype, fused_tail=fused_tail,
                    s2d_min_hw=s2d_min_hw)
            bn = TorchBatchNorm(dtype=dtype, name="TorchBatchNorm_0")
            return frames_conv3d_stage(
                x, kernel, self.pad, self.pool, conv_impl=conv_impl,
                dtype=dtype, bn_apply=lambda y: bn(y, train),
                s2d_min_hw=s2d_min_hw)

    def timed(fn, fargs, reps):
        for _ in range(2):
            out = fn(*fargs)
        float(np.asarray(out).ravel()[0])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn(*fargs)
            float(np.asarray(out).ravel()[0])  # fetch closes the window
            ts.append((time.perf_counter() - t0) / reps)
        return statistics.median(ts) * 1e3

    rng = np.random.default_rng(0)
    rows = {}
    io = stage_io_shapes(args.size)
    which = [int(s) for s in args.stages.split(",")]
    for i, (hw_in, c_in, _hw_out, _c_out) in enumerate(io, start=1):
        if i not in which:
            continue
        x = jnp.asarray(rng.standard_normal(
            (args.batch, args.frames, hw_in, hw_in, c_in)) * 0.5, dtype)
        model = OneStage(*STAGES[i - 1])
        variables = jit_init(model, x.shape)
        p, bs = variables["params"], variables.get("batch_stats", {})

        def fwd(p, bs, x):
            y, _ = model.apply({"params": p, "batch_stats": bs}, x,
                               train=True, mutable=["batch_stats"])
            return jnp.sum(y.astype(jnp.float32))

        def fwdbwd(p, bs, x):
            def loss(p):
                y, _ = model.apply({"params": p, "batch_stats": bs}, x,
                                   train=True, mutable=["batch_stats"])
                return jnp.mean(jnp.square(y.astype(jnp.float32)))
            l, g = jax.value_and_grad(loss)(p)
            gn = sum(jnp.sum(jnp.square(t.astype(jnp.float32)))
                     for t in jax.tree_util.tree_leaves(g))
            return l + 1e-30 * gn

        row = {}
        for name, fn in (("fwd", jax.jit(fwd)), ("fwdbwd", jax.jit(fwdbwd))):
            ms = timed(fn, (p, bs, x), args.reps)
            rep = compile_report(fn, p, bs, x, measured_ms=ms)
            row[name] = {
                "ms": round(ms, 2),
                "gbytes": round(rep["bytes_accessed"] / 1e9, 3),
                "hbm_pct": round(rep["hbm_pct"], 1),
                "mxu_pct": round(rep["mxu_pct"], 1),
                "sol_memory_ms": round(rep["sol_memory_ms"], 2),
                "sol_compute_ms": round(rep["sol_compute_ms"], 2),
            }
        rows[f"stage{i}"] = {"in": [args.batch, args.frames, hw_in, hw_in,
                                    c_in], **row}
        print(json.dumps({"stage": i, **rows[f"stage{i}"]}), flush=True)

    print(json.dumps({"metric": "frames_stage_sol",
                      "epilogue": epilogue, "conv": conv_impl,
                      "no_tail": args.no_tail,
                      "batch": args.batch, "frames": args.frames,
                      "dtype": args.dtype, "rows": rows}))


if __name__ == "__main__":
    main()
