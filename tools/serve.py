#!/usr/bin/env python
"""Serving daemon: HTTP separation endpoint with dynamic batching.

Owns the device (ONE process may touch the axon-relayed TPU), keeps weights
device-resident, coalesces concurrent requests into the exported artifact's
pinned batch, and serves:

  POST /v1/separate   npz{audio [b,S], visual}  ->  npz{audio_out [b,S]}
  GET  /healthz       artifact geometry + input specs
  GET  /stats         request/batch counters + latency percentiles

The artifact is either loaded (`--artifact m.jaxexport`, built by
tools/export_model.py) or exported in-memory at startup; `-c` loads the
latest checkpoint's weights. Drive it with tools/serve_client.py.

The reference has no serving path at all (SURVEY.md §6); this plus
exp/export.py is the deployment story the rebuild adds.

Usage: python tools/serve.py [--model frames] [--port 8423]
       [--max_wait_ms 5] [--artifact m.jaxexport] [-c] [model flags...]
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import sys
import threading

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--model", choices=("fusion", "frames"), default="fusion")
    pre.add_argument("--host", default="127.0.0.1")
    pre.add_argument("--port", type=int, default=8423)
    pre.add_argument("--max_wait_ms", type=float, default=5.0,
                     help="max time a partial batch waits for more rows")
    pre.add_argument("--artifact", default=None)
    own, rest = pre.parse_known_args()

    from maavss_tpu.config import model_args
    from maavss_tpu.exp.checkpoint import load_checkpoint
    from maavss_tpu.exp.export import (
        export_separator, load_artifact, np_variables, serving_input_specs,
    )
    from maavss_tpu.exp.serving import BatchingExecutor, SeparationServer
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
        exported, _meta = load_artifact(own.artifact, cfg)
    else:
        data = export_separator(model, cfg,
                                {"params": state.params,
                                 "batch_stats": state.batch_stats},
                                cfg.batch_size, platforms=(platform,),
                                frames_model=frames_model)
        exported = jax_export.deserialize(data)
        print(f"serve: exported in-memory artifact ({len(data) / 1e6:.1f} MB,"
              f" platform {platform})", file=sys.stderr, flush=True)

    audio_spec, visual_spec = serving_input_specs(
        cfg, cfg.batch_size, frames_model=frames_model)
    executor = BatchingExecutor(
        exported, np_variables({"params": state.params,
                                "batch_stats": state.batch_stats}),
        cfg.batch_size, audio_spec, visual_spec,
        max_wait_ms=own.max_wait_ms)
    info = {
        "model": own.model,
        "batch": cfg.batch_size,
        "platform": platform,
        "audio_shape": list(audio_spec.shape),
        "visual_shape": list(visual_spec.shape),
        "visual_dtype": str(visual_spec.dtype),
    }
    server = SeparationServer(executor, info, host=own.host,
                              port=own.port).start()
    print(json.dumps({"serving": f"http://{own.host}:{server.address[1]}",
                      **info}), flush=True)

    stop = threading.Event()
    for sig in (signal.SIGTERM, signal.SIGINT):
        signal.signal(sig, lambda *_: stop.set())
    stop.wait()
    print(json.dumps({"shutdown": True, **executor.snapshot()}), flush=True)
    server.stop()


if __name__ == "__main__":
    main()
