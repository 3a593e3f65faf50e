#!/usr/bin/env python
"""Phasegram autoencoder training (visual branch pretrain).

Entry-point parity with the reference's `train_visual_net.py`: AV_Dataset with
gen_stft=False (frames only), phasegram_autoencoder training
(train_visual_net.py:63-110) with validation + best checkpoint (:112-139).
"""

from __future__ import annotations

from maavss_tpu.config import RunConfig, model_args
from maavss_tpu.data.dataset import VideoDataset, split_train_val
from maavss_tpu.train.setup import (apply_mesh_model, build_fusion, default_mesh,
                                    init_runtime, load_stores, make_stream, run_name)
from maavss_tpu.train.steps import make_visual_ae_eval, make_visual_ae_step
from maavss_tpu.train.trainer import Trainer


def train(config: RunConfig = None):
    cfg = config or model_args()
    init_runtime()
    frames, _ = load_stores(cfg)
    dataset = VideoDataset(cfg, frames, cfg.num_frames)
    tr_idx, va_idx = split_train_val(len(dataset), cfg.split, cfg.seed)
    mesh = default_mesh(cfg)


    model, state = build_fusion(cfg, cfg.batch_size)
    state, sshard = apply_mesh_model(cfg, mesh, state)
    step = make_visual_ae_step(model, cfg, mesh=mesh, state_shardings=sshard,
                               k_steps=cfg.steps_per_dispatch)
    eval_fn = make_visual_ae_eval(model, cfg)
    import jax

    trainer = Trainer(cfg, step, state, run_name=run_name("visual-net", cfg),
                      eval_fn=eval_fn, mode_schedule="fixed", fixed_mode=1,
                      checkpoint_policy="best", n_chips=len(jax.devices()))
    return trainer.fit(make_stream(cfg, dataset, tr_idx, mesh, cfg.seed,
                        stack=cfg.steps_per_dispatch),
                       make_stream(cfg, dataset, va_idx, mesh, cfg.seed + 1))


if __name__ == "__main__":
    train()
