#!/usr/bin/env python
"""Relay-safe roofline report for the product train steps.

Compiles (never executes) the fusion or frames train step at a given geometry
and prints XLA's cost/memory analysis plus the derived roofline — GFLOPs,
HBM bytes, arithmetic intensity, compute- vs memory-bound speed-of-light, and
(with --measured_ms from a fetch-closed bench.py run) the achieved MXU%/HBM%.

This is the profiling channel that works through the axon relay, where
`jax.profiler.trace` wedges (CLAUDE.md): compilation is host-side, so nothing
touches the device. The reference has no profiling at all beyond one manual
perf_counter (train_audio_net.py:98,116-117).

Usage:
  python tools/cost_report.py --regime fusion --batch 256 --measured_ms 19.8
  python tools/cost_report.py --regime frames --batch 128 --json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--regime", choices=("fusion", "frames"), default="fusion")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--measured_ms", type=float, default=None,
                    help="fetch-closed ms/step from bench.py at this geometry")
    ap.add_argument("--peak_tflops", type=float, default=None,
                    help="chip peak TFLOP/s (default: v5e bf16 197)")
    ap.add_argument("--hbm_gbps", type=float, default=None,
                    help="chip HBM GB/s (default: v5e 819)")
    ap.add_argument("--json", action="store_true", help="print the raw dict")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from maavss_tpu.config import RunConfig
    from maavss_tpu.data.synthetic import synthetic_av_batch
    from maavss_tpu.exp.profiling import (V5E_HBM_GBPS, V5E_PEAK_TFLOPS,
                                          compile_report, format_report)
    from maavss_tpu.train.setup import init_runtime
    from maavss_tpu.train.state import create_train_state, make_optimizer

    init_runtime()
    pgram = os.environ.get("MAAVSS_BENCH_PGRAM", "1") == "1" and args.regime == "fusion"
    cfg = RunConfig(batch_size=args.batch, dtype=args.dtype, pgram_cache=pgram,
                    microbatch=int(os.environ.get("MAAVSS_BENCH_MICROBATCH",
                                                  "1")),
                    frames_encode=os.environ.get(
                        "MAAVSS_BENCH_FRAMES_ENCODE", "window"))
    if args.regime == "frames":
        model, variables, make_step = bench._build_frames(cfg, args.batch)
        batch = synthetic_av_batch(cfg, args.batch, seed=0,
                                   frame_size=cfg.framesize)
        step = make_step(model, cfg)
    else:
        model, variables, make_step = bench._build_fusion(cfg, args.batch)
        batch = synthetic_av_batch(cfg, args.batch, seed=0)
        if pgram:
            from maavss_tpu.ops.phasegram import phasegram_cumsum
            from maavss_tpu.train.steps import frames_f32

            rows = phasegram_cumsum(frames_f32(jnp.asarray(batch["frames"])))
            batch = {"audio": batch["audio"],
                     "pgram": np.asarray(rows, np.float16)}
        step = make_step(model, cfg, window_mode=os.environ.get(
            "MAAVSS_BENCH_WINDOW_MODE", "vectorized"))

    state = create_train_state(variables, make_optimizer(cfg.learning_rate, "adam"))
    report = compile_report(
        step, state, batch, jax.random.PRNGKey(0), jnp.int32(2),
        peak_tflops=args.peak_tflops or V5E_PEAK_TFLOPS,
        hbm_gbps=args.hbm_gbps or V5E_HBM_GBPS,
        measured_ms=args.measured_ms)
    report["regime"] = args.regime
    report["batch"] = args.batch
    if args.json:
        print(json.dumps(report))
    else:
        print(f"== {args.regime} step, b{args.batch} {args.dtype}"
              + (" (pgram cache)" if pgram else ""))
        print(format_report(report))


if __name__ == "__main__":
    main()
