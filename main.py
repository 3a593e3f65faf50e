#!/usr/bin/env python
"""Legacy raw-FFT training (AVSEModel + DataGenerator + SGD).

Entry-point parity with the reference's `main.py` (:34-137): DataGenerator
batches, the Hou-et-al-style AVSEModel (conv1d audio / conv3d visual
encoders), MSE on both heads, SGD. The train step is one jit-compiled program
(FFT features are precomputed by the generator exactly like the reference).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from generator import DataGenerator
from maavss_tpu.config import RunConfig, model_args
from maavss_tpu.exp.metrics import MetricsLogger, Meter
from maavss_tpu.models.legacy import AVSEModel
from maavss_tpu.train.setup import load_stores, run_name
from maavss_tpu.train.state import create_train_state


def train(config: RunConfig = None):
    cfg = config or model_args()
    frames, audio = load_stores(cfg)
    gen = DataGenerator(cfg, frames, audio, seed=cfg.seed).generator()

    x_fft, y_fft, fr, _ = next(gen)
    model = AVSEModel(a_shape=x_fft.shape, v_shape=fr.shape)
    variables = model.init(jax.random.PRNGKey(cfg.seed),
                           jnp.asarray(x_fft), jnp.asarray(fr))
    tx = optax.sgd(cfg.learning_rate)  # main.py:61
    state = create_train_state(variables, tx)

    @jax.jit
    def step(state, x_a, y_a, x_v):
        def loss_fn(params, bstats):
            (yh_a, yh_v), mut = model.apply(
                {"params": params, "batch_stats": bstats}, x_a, x_v,
                train=True, mutable=["batch_stats"])
            a_loss = jnp.mean((yh_a - y_a) ** 2)
            v_loss = jnp.mean((yh_v - x_v) ** 2)
            return a_loss + cfg.loss_coeff * v_loss, (mut["batch_stats"], a_loss, v_loss)

        (loss, (bstats, a_loss, v_loss)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats)
        return state.apply_gradients(grads=grads, batch_stats=bstats), {
            "loss": loss, "a_loss": a_loss, "v_loss": v_loss}

    logger = MetricsLogger(cfg.log_dir, run_name("legacy", cfg), use_wandb=cfg.wandb)
    meter = Meter(len(jax.devices()))
    gstep = 0
    for e in range(cfg.epochs):
        for i in range(cfg.steps_per_epoch):
            x_fft, y_fft, fr, _ = next(gen)
            state, metrics = step(state, jnp.asarray(x_fft), jnp.asarray(y_fft),
                                  jnp.asarray(fr))
            meter.update(x_fft.shape[0])
            gstep += 1
            logger.log({**{k: float(v) for k, v in metrics.items()},
                        "clips_per_sec_per_chip": meter.clips_per_sec_per_chip},
                       step=gstep)
            if i % cfg.cb_freq == 0:
                print(f"epoch {e} step {i} loss {float(metrics['loss']):.6f}")
    logger.close()
    return state


if __name__ == "__main__":
    train()
