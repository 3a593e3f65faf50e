#!/usr/bin/env python
"""Fusion training variant: middle-frame objective on the phasegram model.

Entry-point parity with the reference's `experiments/train.py` — a near-copy
of train.py whose windows predict only the middle frame's `hops_per_frame`
STFT columns and one phasegram row (:148-181), with per-epoch checkpoints
(:272-276). Implemented as the `make_fusion_middle_step` regime.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from maavss_tpu.config import RunConfig, model_args  # noqa: E402
from maavss_tpu.data.dataset import AVDataset, split_train_val  # noqa: E402
from maavss_tpu.exp.checkpoint import save_model  # noqa: E402
from maavss_tpu.train.setup import (  # noqa: E402
    apply_mesh_model, build_fusion, default_mesh, init_runtime,
    load_pgram_store, load_stores, make_stream, run_name,
)
from maavss_tpu.train.steps import make_fusion_middle_step  # noqa: E402
from maavss_tpu.train.trainer import Trainer  # noqa: E402


def train(config: RunConfig = None):
    cfg = config or model_args()
    init_runtime()
    frames, audio = load_stores(cfg)
    dataset = AVDataset(cfg, frames, audio, cfg.num_frames + cfg.num_seq,
                        pgrams=load_pgram_store(cfg))
    tr_idx, va_idx = split_train_val(len(dataset), cfg.split, cfg.seed)
    mesh = default_mesh(cfg)
    model, state = build_fusion(cfg, cfg.batch_size)
    state, sshard = apply_mesh_model(cfg, mesh, state)
    step = make_fusion_middle_step(model, cfg, mesh=mesh, state_shardings=sshard,
                                   k_steps=cfg.steps_per_dispatch)
    name = run_name("avf-mid", cfg)
    import jax

    trainer = Trainer(cfg, step, state, run_name=name,
                      mode_schedule=cfg.mode_schedule or "cycle", checkpoint_policy="epoch",
                      n_chips=len(jax.devices()))
    state = trainer.fit(make_stream(cfg, dataset, tr_idx, mesh, cfg.seed,
                        stack=cfg.steps_per_dispatch),
                        make_stream(cfg, dataset, va_idx, mesh, cfg.seed + 1))
    if not cfg.no_save:
        save_model(f"saved_models/{name}", state.params)
    return state


if __name__ == "__main__":
    train()
