#!/usr/bin/env python
"""STFT autoencoder pretraining on random audio crops.

Entry-point parity with the reference's `train_autoencoder.py`: STFT_Dataset
random crops (av_dataset.py:381-491) -> denoising STFT AE via
`audio_ae_forward` (train_autoencoder.py:105) — the minimal end-to-end config
(SURVEY.md §7.2 step 2, BASELINE.json config #1).
"""

from __future__ import annotations

from maavss_tpu.config import RunConfig, model_args
from maavss_tpu.data.dataset import STFTDataset
from maavss_tpu.exp.checkpoint import save_model
from maavss_tpu.train.setup import (apply_mesh_model, build_fusion, default_mesh,
                                    init_runtime, load_stores, make_stream, run_name)
from maavss_tpu.train.steps import make_audio_ae_eval, make_audio_ae_step
from maavss_tpu.train.trainer import Trainer


def train(config: RunConfig = None):
    cfg = config or model_args()
    init_runtime()
    _, audio = load_stores(cfg)
    dataset = STFTDataset(cfg, audio, seed=cfg.seed)
    mesh = default_mesh(cfg)


    model, state = build_fusion(cfg, cfg.batch_size)
    state, sshard = apply_mesh_model(cfg, mesh, state)
    step = make_audio_ae_step(model, cfg, mesh=mesh, state_shardings=sshard,
                              k_steps=cfg.steps_per_dispatch)
    eval_fn = make_audio_ae_eval(model, cfg)
    name = run_name("stft-ae", cfg)
    import jax

    trainer = Trainer(cfg, step, state, run_name=name, eval_fn=eval_fn,
                      mode_schedule="fixed", fixed_mode=0,
                      checkpoint_policy="epoch", n_chips=len(jax.devices()))
    state = trainer.fit(make_stream(cfg, dataset, None, mesh, cfg.seed,
                        stack=cfg.steps_per_dispatch),
                        make_stream(cfg, dataset, None, mesh, cfg.seed + 1))
    if not cfg.no_save:
        save_model(f"saved_models/{name}", state.params)
    return state


if __name__ == "__main__":
    train()
