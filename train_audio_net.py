#!/usr/bin/env python
"""STFT autoencoder over clip-aligned audio (AVDataset, audio-only mode).

Entry-point parity with the reference's `train_audio_net.py`: AV_Dataset with
gen_video=False (av_dataset.py:33-51 in that script), stft_autoencoder-only
training (train_audio_net.py:75-108), periodic + per-epoch checkpoints and a
validation loop (:128-162). Throughput is logged per step (the reference's
manual perf_counter print, :98,116-117, is subsumed by the clips/sec meter).
"""

from __future__ import annotations

from maavss_tpu.config import RunConfig, model_args
from maavss_tpu.data.dataset import AVDataset, split_train_val
from maavss_tpu.train.setup import (apply_mesh_model, build_fusion, default_mesh,
                                    init_runtime, load_stores, make_stream, run_name)
from maavss_tpu.train.steps import make_audio_ae_eval, make_audio_ae_step
from maavss_tpu.train.trainer import Trainer


def train(config: RunConfig = None):
    cfg = config or model_args()
    init_runtime()
    frames, audio = load_stores(cfg)
    dataset = AVDataset(cfg, frames, audio, cfg.num_frames, mode="audio")
    tr_idx, va_idx = split_train_val(len(dataset), cfg.split, cfg.seed)
    mesh = default_mesh(cfg)


    model, state = build_fusion(cfg, cfg.batch_size)
    state, sshard = apply_mesh_model(cfg, mesh, state)
    step = make_audio_ae_step(model, cfg, mesh=mesh, state_shardings=sshard,
                              k_steps=cfg.steps_per_dispatch)
    eval_fn = make_audio_ae_eval(model, cfg)
    import jax

    trainer = Trainer(cfg, step, state, run_name=run_name("audio-net", cfg),
                      eval_fn=eval_fn, mode_schedule="fixed", fixed_mode=0,
                      checkpoint_policy="best", n_chips=len(jax.devices()))
    return trainer.fit(make_stream(cfg, dataset, tr_idx, mesh, cfg.seed,
                        stack=cfg.steps_per_dispatch),
                       make_stream(cfg, dataset, va_idx, mesh, cfg.seed + 1))


if __name__ == "__main__":
    train()
