#!/usr/bin/env python
"""Export a trained separator as a portable serving artifact (jax.export).

New capability the reference lacks (its inference = re-running the training
Python stack): serializes the full windowed separation program — feature
prep, model forward over every sliding window, overlap stitch, iSTFT — as
StableHLO for the requested platforms. The artifact takes (params,
batch_stats, audio, visual) as call arguments, so weights deploy separately
(any exp/checkpoint.py checkpoint with matching geometry); a JSON sidecar
pins geometry and rejects mismatched configs at load time.

Usage:
  python tools/export_model.py --out runs/sep.jaxexport -c          # latest ckpt (geometry check only)
  python tools/export_model.py --model frames --platforms tpu,cpu --batch_size 8 --out m
  python tools/export_model.py --selftest --out m   # export+reload+compare on this host

Serve side (no maavss_tpu needed beyond jax):
  from jax import export
  exported = export.deserialize(open("m.jaxexport","rb").read())
  audio_out = exported.call(params, batch_stats, audio, visual)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--model", choices=("fusion", "frames"), default="fusion")
    pre.add_argument("--out", required=True, help="artifact path (.jaxexport)")
    pre.add_argument("--platforms", default="tpu,cpu",
                     help="comma list for cross-platform lowering")
    pre.add_argument("--selftest", action="store_true",
                     help="reload the artifact and compare one call vs the "
                          "live separator on this host's backend")
    own, rest = pre.parse_known_args()

    from maavss_tpu.config import model_args
    from maavss_tpu.exp.checkpoint import load_checkpoint
    from maavss_tpu.exp.export import (
        export_separator, load_artifact, make_serving_fn, save_artifact,
        random_serving_inputs,
    )
    from maavss_tpu.train.setup import (
        build_frames_model, build_fusion, init_runtime,
    )

    cfg = model_args(rest)
    init_runtime()
    frames_model = own.model == "frames"
    if frames_model:
        model, state = build_frames_model(cfg, cfg.batch_size, cfg.framesize)
    else:
        model, state = build_fusion(cfg, cfg.batch_size)
    if cfg.c or cfg.checkpoint:
        state, _ = load_checkpoint(cfg.cp_dir, state, auto=cfg.c,
                                   path=cfg.checkpoint)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    platforms = tuple(p.strip() for p in own.platforms.split(",") if p.strip())
    data = export_separator(model, cfg, variables, cfg.batch_size,
                            platforms=platforms, frames_model=frames_model)
    path = save_artifact(own.out, data, cfg, cfg.batch_size, platforms,
                         frames_model)
    print(json.dumps({"artifact": path, "bytes": len(data),
                      "platforms": list(platforms), "model": own.model,
                      "batch": cfg.batch_size}))

    if own.selftest:
        import jax

        exported, meta = load_artifact(path, cfg)
        audio, visual = random_serving_inputs(cfg, cfg.batch_size,
                                              frames_model=frames_model)
        got = np.asarray(exported.call(state.params, state.batch_stats,
                                       audio, visual))
        want = np.asarray(make_serving_fn(model, cfg, frames_model)(
            state.params, state.batch_stats, audio, visual))
        err = float(np.max(np.abs(got - want)))
        print(json.dumps({"selftest_max_abs_diff": err,
                          "ok": bool(err < 1e-4)}))
        if err >= 1e-4:
            raise SystemExit(1)


if __name__ == "__main__":
    main()
