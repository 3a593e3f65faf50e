#!/usr/bin/env python
"""Fusion training (AVFusionModel, phasegram objective).

Entry-point parity with the reference's `train.py`: same flags
(run_config.py:4-51 via maavss_tpu.config.model_args), AV dataset with
num_frames+num_seq clips, windowed grad accumulation, modality-curriculum
cycling every `mode_freq` epochs, per-epoch checkpoints, final whole-model
save. All per-step math (STFT, noise, phasegram, windows) runs inside one
jit-compiled sharded step (maavss_tpu/train/steps.py).

Use `--data_path synthetic` to run without an ingested MUSICES tree.
"""

from __future__ import annotations

from maavss_tpu.config import RunConfig, model_args
from maavss_tpu.data.dataset import AVDataset, split_train_val
from maavss_tpu.exp.checkpoint import save_model
from maavss_tpu.train.setup import (apply_mesh_model, build_fusion, default_mesh,
                                    init_runtime, load_pgram_store, load_stores,
                                    make_stream, run_name)
from maavss_tpu.train.steps import make_fusion_eval, make_fusion_step
from maavss_tpu.train.trainer import Trainer


def train(config: RunConfig = None):
    cfg = config or model_args()
    init_runtime()
    frames, audio = load_stores(cfg)
    clip_len = cfg.num_frames + cfg.num_seq  # train.py:33-43
    dataset = AVDataset(cfg, frames, audio, clip_len,
                        pgrams=load_pgram_store(cfg))
    tr_idx, va_idx = split_train_val(len(dataset), cfg.split, cfg.seed)
    mesh = default_mesh(cfg)


    model, state = build_fusion(cfg, cfg.batch_size)
    state, sshard = apply_mesh_model(cfg, mesh, state)
    step = make_fusion_step(model, cfg, mesh=mesh, window_mode=cfg.window_mode,
                            state_shardings=sshard,
                            k_steps=cfg.steps_per_dispatch)
    eval_fn = make_fusion_eval(model, cfg, mesh=mesh, state_shardings=sshard)
    name = run_name("avf", cfg)
    import os

    import jax

    from maavss_tpu.train.setup import make_fusion_media_fn

    media_fn = None
    if os.environ.get("MAAVSS_MEDIA") == "1":  # opt-in: extra compile
        media_fn = make_fusion_media_fn(model, cfg,
                                        os.path.join(cfg.log_dir, name, "media"))
    trainer = Trainer(cfg, step, state, run_name=name, eval_fn=eval_fn,
                      mode_schedule=cfg.mode_schedule or "cycle", checkpoint_policy="epoch",
                      n_chips=len(jax.devices()), media_fn=media_fn)
    state = trainer.fit(make_stream(cfg, dataset, tr_idx, mesh, cfg.seed,
                                    stack=cfg.steps_per_dispatch),
                        make_stream(cfg, dataset, va_idx, mesh, cfg.seed + 1))
    if not cfg.no_save:
        save_model(f"saved_models/{name}", state.params)  # train.py:243-244
    return state


if __name__ == "__main__":
    train()
