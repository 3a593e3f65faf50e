#!/usr/bin/env python
"""Final model training: AVFusionFramesModel, middle-frame objective.

Entry-point parity with the reference's `train_avse_frames.py`: AV dataset of
attention frames (the JPEG-cache path there, frame shards here), windowed
middle-frame prediction with grad accumulation (:150-181), randomized
modality curriculum (:219-220 — randint(0,2), a reference quirk that never
draws AV mode, preserved as schedule 'random01'), per-epoch checkpoints
(:222-226), final whole-model save.

Callable as `train()` for sweeps (sweep_params.py:29-30).
"""

from __future__ import annotations

from maavss_tpu.config import RunConfig, model_args
from maavss_tpu.data.dataset import AVDataset, split_train_val
from maavss_tpu.exp.checkpoint import save_model
from maavss_tpu.train.setup import (apply_mesh_model, build_frames_model,
                                    default_mesh, init_runtime, load_stores,
                                    make_stream, run_name)
from maavss_tpu.train.steps import make_frames_step
from maavss_tpu.train.trainer import Trainer


def train(config: RunConfig = None):
    cfg = config or model_args()
    init_runtime()
    frames, audio = load_stores(cfg)
    clip_len = cfg.num_frames + cfg.num_seq + 2 * cfg.frames_halo
    dataset = AVDataset(cfg, frames, audio, clip_len)
    tr_idx, va_idx = split_train_val(len(dataset), cfg.split, cfg.seed)
    mesh = default_mesh(cfg)


    frame_size = dataset[0]["frames"].shape[-1]
    model, state = build_frames_model(cfg, cfg.batch_size, frame_size)
    state, sshard = apply_mesh_model(cfg, mesh, state)
    step = make_frames_step(model, cfg, mesh=mesh, state_shardings=sshard,
                            k_steps=cfg.steps_per_dispatch)
    name = run_name("avse-frames", cfg)
    import jax

    trainer = Trainer(cfg, step, state, run_name=name,
                      mode_schedule=cfg.mode_schedule or "random01", fixed_mode=2,
                      checkpoint_policy="epoch", n_chips=len(jax.devices()))
    state = trainer.fit(make_stream(cfg, dataset, tr_idx, mesh, cfg.seed,
                        stack=cfg.steps_per_dispatch),
                        make_stream(cfg, dataset, va_idx, mesh, cfg.seed + 1))
    if not cfg.no_save:
        save_model(f"saved_models/{name}", state.params)
    return state


if __name__ == "__main__":
    train()
