#!/usr/bin/env python
"""Staged AV training: fusion subnets only, autoencoders frozen.

Entry-point parity with the reference's `train_av_net.py`: identical fusion
objective, but encoder/decoder gradients are disabled (train_av_net.py:73-75
via the model grad toggles, avse_model.py:630-656) — here an optax-masked
optimizer (maavss_tpu/train/state.py) — with live validation and best-val
checkpointing (train_av_net.py:147-195).

`--saved_model` restores pretrained AE params before the stage begins.
"""

from __future__ import annotations

from maavss_tpu.config import RunConfig, model_args
from maavss_tpu.data.dataset import AVDataset, split_train_val
from maavss_tpu.exp.checkpoint import load_model
from maavss_tpu.train.setup import (
    FUSION_SUBNETS, apply_mesh_model, build_fusion, default_mesh, init_runtime,
    load_pgram_store, load_stores, make_stream, run_name,
)
from maavss_tpu.train.steps import make_fusion_eval, make_fusion_step
from maavss_tpu.train.trainer import Trainer


def train(config: RunConfig = None):
    cfg = config or model_args()
    init_runtime()
    frames, audio = load_stores(cfg)
    dataset = AVDataset(cfg, frames, audio, cfg.num_frames + cfg.num_seq,
                        pgrams=load_pgram_store(cfg))
    tr_idx, va_idx = split_train_val(len(dataset), cfg.split, cfg.seed)
    mesh = default_mesh(cfg)


    model, state = build_fusion(cfg, cfg.batch_size, trainable=FUSION_SUBNETS)
    if cfg.saved_model:
        state = state.replace(params=load_model(cfg.saved_model, state.params))
    state, sshard = apply_mesh_model(cfg, mesh, state)
    step = make_fusion_step(model, cfg, mesh=mesh, state_shardings=sshard,
                            k_steps=cfg.steps_per_dispatch)
    eval_fn = make_fusion_eval(model, cfg, mesh=mesh, state_shardings=sshard)
    import jax

    trainer = Trainer(cfg, step, state, run_name=run_name("av-net", cfg),
                      eval_fn=eval_fn, mode_schedule="fixed", fixed_mode=2,
                      checkpoint_policy="best", n_chips=len(jax.devices()))
    return trainer.fit(make_stream(cfg, dataset, tr_idx, mesh, cfg.seed,
                        stack=cfg.steps_per_dispatch),
                       make_stream(cfg, dataset, va_idx, mesh, cfg.seed + 1))


if __name__ == "__main__":
    train()
