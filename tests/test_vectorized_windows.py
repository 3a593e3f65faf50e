"""Vectorized window mode: same objective as the scan mode (windows folded
into the batch dim), finite and learning; loss comparable to scan mode
(exact equality is not expected — BatchNorm statistics span all windows in
vectorized mode, per the make_fusion_step docstring)."""

import numpy as np

import jax
import jax.numpy as jnp

from maavss_tpu.config import RunConfig
from maavss_tpu.data.synthetic import synthetic_av_batch
from maavss_tpu.models.fusion import AVFusionModel
from maavss_tpu.train.state import create_train_state, make_optimizer
from maavss_tpu.train.steps import make_fusion_step

CFG = RunConfig(num_frames=4, num_seq=4, hops_per_frame=4, fft_len=64,
                p_size=16, latent_chan=8, fc_size=256, learning_rate=3e-3)


def build(seed=0):
    t_stft = CFG.hops_per_frame * CFG.num_frames
    model = AVFusionModel(
        stft_shape=(4, 2, t_stft, CFG.fft_len // 2),
        pgram_shape=(4, 1, CFG.num_frames, CFG.p_size**2),
        latent_channels=CFG.latent_chan, fc_size=CFG.fc_size)
    variables = model.init(jax.random.PRNGKey(seed),
                           jnp.zeros(model.stft_shape),
                           jnp.zeros(model.pgram_shape), method=model.init_all)
    return model, variables


def test_vectorized_runs_and_learns():
    model, variables = build()
    state = create_train_state(variables, make_optimizer(CFG.learning_rate))
    step = make_fusion_step(model, CFG, window_mode="vectorized")
    batch = synthetic_av_batch(CFG, 4, seed=0)
    losses = []
    for i in range(10):
        state, metrics = step(state, batch, jax.random.PRNGKey(7), jnp.int32(2))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0] * 0.8, losses
