"""--steps_per_dispatch (multi-step device-side pipelining): K optimizer
steps inside one compiled program must be bit-equivalent to K sequential
single-step dispatches (same per-step rngs), and the Trainer must still log
one metrics record per optimizer step."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from maavss_tpu.config import RunConfig
from maavss_tpu.data.synthetic import synthetic_av_batch
from maavss_tpu.train.setup import build_fusion
from maavss_tpu.train.steps import make_audio_ae_step
from maavss_tpu.train.trainer import Trainer

CFG = RunConfig(num_frames=4, num_seq=4, hops_per_frame=4, fft_len=64,
                p_size=16, latent_chan=8, fc_size=256, learning_rate=1e-3,
                batch_size=4)
K = 3


def test_multistep_matches_sequential():
    # SGD: updates are linear in the gradient, so scanned-vs-sequential param
    # comparison is tight. (Adam's first steps are ~lr*sign(grad); XLA fuses
    # the scanned body differently, and that fp noise flips signs of
    # near-zero grads — measured 100% mismatch on 2-element bias leaves.)
    model, state_seq = build_fusion(CFG, CFG.batch_size, optimizer="sgd")
    _, state_k = build_fusion(CFG, CFG.batch_size, optimizer="sgd")
    step1 = make_audio_ae_step(model, CFG)
    stepk = make_audio_ae_step(model, CFG, k_steps=K)

    batches = [synthetic_av_batch(CFG, CFG.batch_size, seed=i)["audio"]
               for i in range(K)]
    rng = jax.random.PRNGKey(5)
    mode = jnp.int32(0)

    seq_losses = []
    for i, b in enumerate(batches):
        state_seq, m = step1(state_seq, {"audio": b},
                             jax.random.fold_in(rng, i), mode)
        seq_losses.append(float(m["loss"]))

    stacked = {"audio": np.stack([np.asarray(b) for b in batches])}
    state_k, mk = stepk(state_k, stacked, rng, mode)
    assert mk["loss"].shape == (K,)
    np.testing.assert_allclose(np.asarray(mk["loss"]), seq_losses, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(state_seq.params),
                    jax.tree_util.tree_leaves(state_k.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-8)
    assert int(state_k.step) == K


def test_trainer_multistep_records_per_step(tmp_path):
    cfg = CFG.replace(steps_per_dispatch=K, steps_per_epoch=2 * K, epochs=2,
                      val_steps=0, cb_freq=4, no_save=True,
                      log_dir=str(tmp_path / "logs"),
                      cp_dir=str(tmp_path / "cp"))
    model, state = build_fusion(cfg, cfg.batch_size)
    step = make_audio_ae_step(model, cfg, k_steps=K)

    def stream():
        i = 0
        while True:
            group = [synthetic_av_batch(cfg, cfg.batch_size, seed=i + j)["audio"]
                     for j in range(K)]
            i += K
            yield {"audio": np.stack([np.asarray(g) for g in group])}

    trainer = Trainer(cfg, step, state, run_name="ms",
                      mode_schedule="fixed", fixed_mode=0,
                      checkpoint_policy="none")
    out = trainer.fit(stream())
    assert int(out.step) == cfg.epochs * cfg.steps_per_epoch
    lines = [json.loads(l) for l in
             open(os.path.join(cfg.log_dir, "ms", "metrics.jsonl"))]
    assert len(lines) == cfg.epochs * cfg.steps_per_epoch
    steps = [r["step"] for r in lines]
    assert steps == sorted(steps) and len(set(steps)) == len(steps)
    assert all(np.isfinite(r["loss"]) for r in lines)
