#!/usr/bin/env python
"""Serving load test: latency distribution + throughput of the separator.

Complements the export story (tools/export_model.py) with the measurement a
deployment actually needs: per-request wall latency percentiles and
clips/sec for the full separation program (feature prep -> windowed forward
-> overlap stitch -> iSTFT), request-by-request like a serving replica —
NOT the training bench's back-to-back pipelined steps. Every request is
closed by fetching the separated WAVEFORM to the host (the response a
server would return), so relay/dispatch effects are inside the measured
window by construction (BASELINE.md measurement-integrity notes).

Runs either a freshly-exported artifact (default: build in memory, which
also proves export works on this host) or `--artifact path.jaxexport`
produced elsewhere; `-c`/`--checkpoint` loads real weights, otherwise the
fresh init is used (throughput is weight-value independent).

Prints ONE JSON line:
  {"metric": "serve_latency_ms", "p50": ..., "p90": ..., "p99": ...,
   "clips_per_sec": ..., "batch": B, "model": "...", "calls": N}

Usage: python tools/serve_bench.py [--model frames] [--batch_size 8]
       [--calls 50] [--artifact m.jaxexport] [-c]
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


def main() -> None:
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--model", choices=("fusion", "frames"), default="fusion")
    pre.add_argument("--calls", type=int, default=50)
    pre.add_argument("--warmup", type=int, default=3)
    pre.add_argument("--artifact", default=None,
                     help="pre-built .jaxexport (default: export in memory)")
    pre.add_argument("--upload_weights", action="store_true",
                     help="re-send weights from host numpy on every request "
                          "(measures the cold/stateless-replica mode; the "
                          "default keeps them device-resident like a real "
                          "serving process)")
    own, rest = pre.parse_known_args()

    from maavss_tpu.config import model_args
    from maavss_tpu.exp.checkpoint import load_checkpoint
    from maavss_tpu.exp.export import (
        export_separator, load_artifact, np_variables, random_serving_inputs,
    )
    from maavss_tpu.train.setup import (
        build_frames_model, build_fusion, init_runtime,
    )

    cfg = model_args(rest)
    init_runtime()
    frames_model = own.model == "frames"

    import jax
    from jax import export as jax_export

    if frames_model:
        model, state = build_frames_model(cfg, cfg.batch_size, cfg.framesize)
    else:
        model, state = build_fusion(cfg, cfg.batch_size)
    if cfg.c or cfg.checkpoint:
        state, _ = load_checkpoint(cfg.cp_dir, state, auto=cfg.c,
                                   path=cfg.checkpoint)

    platform = jax.devices()[0].platform
    if own.artifact:
        exported, meta = load_artifact(own.artifact, cfg)
    else:
        data = export_separator(model, cfg,
                                {"params": state.params,
                                 "batch_stats": state.batch_stats},
                                cfg.batch_size, platforms=(platform,),
                                frames_model=frames_model)
        exported = jax_export.deserialize(data)
        print(f"serve_bench: exported in-memory artifact "
              f"({len(data) / 1e6:.1f} MB, platform {platform})",
              file=sys.stderr, flush=True)

    audio, visual = random_serving_inputs(cfg, cfg.batch_size,
                                          frames_model=frames_model)
    variables = np_variables({"params": state.params,
                              "batch_stats": state.batch_stats})
    if not own.upload_weights:
        # A serving replica loads weights ONCE; only request data crosses the
        # wire per call. Passing numpy weights instead re-uploads the full
        # param tree every request — through the axon relay that alone was
        # ~5.9 s p50 (runs/probe_r3c/serve_bench_fusion.json, the
        # --upload_weights mode measured before this fix).
        variables = jax.device_put(variables)
        jax.block_until_ready(variables)

    def call():
        out = exported.call(variables["params"], variables["batch_stats"],
                            audio, visual)
        return np.asarray(out)  # full host fetch: the serving response

    for _ in range(own.warmup):
        out = call()
    lat = []
    t_all0 = time.perf_counter()
    for _ in range(own.calls):
        t0 = time.perf_counter()
        out = call()
        lat.append((time.perf_counter() - t0) * 1e3)
    wall = time.perf_counter() - t_all0
    lat.sort()

    def pct(p):
        return lat[min(len(lat) - 1, int(round(p / 100 * (len(lat) - 1))))]

    print(json.dumps({
        "metric": "serve_latency_ms",
        "p50": round(statistics.median(lat), 2),
        "p90": round(pct(90), 2),
        "p99": round(pct(99), 2),
        "mean": round(sum(lat) / len(lat), 2),
        "clips_per_sec": round(cfg.batch_size * own.calls / wall, 2),
        "batch": cfg.batch_size,
        "model": own.model,
        "calls": own.calls,
        "platform": platform,
        "out_shape": list(out.shape),
    }))


if __name__ == "__main__":
    main()
