#!/usr/bin/env python
"""Hyperparameter sweep over the frames-model training.

Entry-point parity with the reference's `sweep_params.py`: the same random
search space (sweep_params.py:4-27 — note the reference sweeps
conv_layer_size/optimizer/activation keys its train script never reads; the
effective knobs are fc_size, learning_rate and objective_zeros) driving
`train_avse_frames.train`. With `--wandb` a wandb sweep+agent is launched
(:29-30); otherwise a local random-search loop samples the same space — the
framework stays fully offline-capable.
"""

from __future__ import annotations

import argparse

import numpy as np

import train_avse_frames
from maavss_tpu.config import model_args

SWEEP_CONFIG = {
    "method": "random",
    "metric": {"name": "loss", "goal": "minimize"},
    "parameters": {  # sweep_params.py:4-27
        "fc_size": {"values": [2048, 4096, 8192]},
        "learning_rate": {"values": [1e-3, 1e-4, 1e-5]},
        "objective_zeros": {"values": [True, False]},
        "batch_size": {"values": [2, 4, 8]},
    },
}


def _sample(rng: np.random.Generator) -> dict:
    return {k: v["values"][int(rng.integers(len(v["values"])))]
            for k, v in SWEEP_CONFIG["parameters"].items()}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--trials", type=int, default=8)
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    args, rest = p.parse_known_args()

    if args.wandb:
        import wandb

        sweep_id = wandb.sweep(SWEEP_CONFIG, project="maavss-tpu")
        wandb.agent(sweep_id, train_avse_frames.train)  # sweep_params.py:29-30
        return

    rng = np.random.default_rng(args.seed)
    for t in range(args.trials):
        overrides = _sample(rng)
        cfg = model_args(rest).replace(**overrides)
        print(f"sweep trial {t}: {overrides}")
        train_avse_frames.train(cfg)  # per-trial metrics land in cfg.log_dir
    print(f"sweep done ({args.trials} trials); compare runs in {model_args(rest).log_dir}")


if __name__ == "__main__":
    main()
