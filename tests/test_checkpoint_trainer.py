"""Checkpoint/restore semantics + Trainer loop behavior (reference parity:
utilities.py:165-204 save/load + auto-resume-latest; train-script epoch loops)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import linen as nn

from maavss_tpu.config import RunConfig
from maavss_tpu.data.synthetic import synthetic_av_batch
from maavss_tpu.exp.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    load_model,
    save_checkpoint,
    save_model,
)
from maavss_tpu.exp.metrics import MetricsLogger
from maavss_tpu.models.fusion import AVFusionModel
from maavss_tpu.train.state import create_train_state, make_optimizer
from maavss_tpu.train.steps import make_audio_ae_step
from maavss_tpu.train.trainer import Trainer

CFG = RunConfig(num_frames=4, num_seq=4, hops_per_frame=4, fft_len=64, p_size=16,
                latent_chan=8, fc_size=256, learning_rate=1e-3, batch_size=4,
                epochs=2, steps_per_epoch=3, val_steps=0, cb_freq=10)


class TinyNet(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.Dense(3)(x)


def tiny_state(seed=0):
    m = TinyNet()
    variables = m.init(jax.random.PRNGKey(seed), jnp.ones((2, 4)))
    tx = optax.adam(1e-3)
    return create_train_state({"params": variables["params"]}, tx)


@pytest.fixture(params=["pkl", "orbax"])
def ckpt_backend(request, monkeypatch):
    """Exercise both checkpoint backends (orbax default; pkl fallback for
    axon-style remote backends where orbax import wedges dispatch)."""
    monkeypatch.setenv("MAAVSS_CKPT_BACKEND", request.param)
    return request.param


class TestCheckpoint:
    def test_save_load_roundtrip(self, tmp_path, ckpt_backend):
        state = tiny_state(0)
        save_checkpoint(str(tmp_path), "run-a", state, epoch=3, loss=0.5)
        other = tiny_state(1)  # different init
        restored, epoch = load_checkpoint(str(tmp_path), other, auto=True)
        assert epoch == 3
        np.testing.assert_allclose(
            np.asarray(jax.tree_util.tree_leaves(restored.params)[0]),
            np.asarray(jax.tree_util.tree_leaves(state.params)[0]))

    def test_latest_and_opt_gate(self, tmp_path, ckpt_backend):
        s0 = tiny_state(0)
        save_checkpoint(str(tmp_path), "run-a", s0, epoch=1)
        import time

        time.sleep(0.05)
        s1 = tiny_state(1)
        s1 = s1.replace(step=jnp.int32(7))
        save_checkpoint(str(tmp_path), "run-b", s1, epoch=2)
        assert "run-b" in os.path.basename(latest_checkpoint(str(tmp_path)))
        target = tiny_state(2)
        restored, epoch = load_checkpoint(str(tmp_path), target, auto=True,
                                          load_opt=False)
        assert epoch == 2 and int(restored.step) == 7
        # opt_state NOT restored (load_opt=False, utilities.py:193-197 gate)
        t_leaves = jax.tree_util.tree_leaves(target.opt_state)
        r_leaves = jax.tree_util.tree_leaves(restored.opt_state)
        for a, b in zip(t_leaves, r_leaves):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_missing_is_noop(self, tmp_path, ckpt_backend):
        state = tiny_state(0)
        restored, epoch = load_checkpoint(str(tmp_path / "nope"), state)
        assert epoch == 0 and restored is state

    def test_save_load_model(self, tmp_path, ckpt_backend):
        state = tiny_state(0)
        p = save_model(str(tmp_path / "m"), state.params)
        params = load_model(p, tiny_state(1).params)
        np.testing.assert_allclose(
            np.asarray(jax.tree_util.tree_leaves(params)[0]),
            np.asarray(jax.tree_util.tree_leaves(state.params)[0]))


class TestMetricsLogger:
    def test_jsonl_stream(self, tmp_path):
        lg = MetricsLogger(str(tmp_path), "runx", config={"a": 1})
        lg.log({"loss": 0.5, "mode": 2}, step=1)
        lg.log({"loss": 0.25}, step=2)
        lg.close()
        lines = [json.loads(l) for l in
                 open(tmp_path / "runx" / "metrics.jsonl")]
        assert lines[0]["loss"] == 0.5 and lines[1]["step"] == 2
        assert json.load(open(tmp_path / "runx" / "config.json"))["a"] == 1


class TestTrainer:
    def test_fit_epochs_checkpoints_and_metrics(self, tmp_path, monkeypatch):
        monkeypatch.setenv("MAAVSS_WATCH", "1")  # histogram channel opt-in
        cfg = CFG.replace(cp_dir=str(tmp_path / "cp"), log_dir=str(tmp_path / "logs"))
        t_stft = cfg.hops_per_frame * cfg.num_frames
        model = AVFusionModel(
            stft_shape=(cfg.batch_size, 2, t_stft, cfg.fft_len // 2),
            pgram_shape=(cfg.batch_size, 1, cfg.num_frames, cfg.p_size**2),
            latent_channels=cfg.latent_chan, fc_size=cfg.fc_size)
        xa = jnp.zeros(model.stft_shape)
        xv = jnp.zeros(model.pgram_shape)
        variables = model.init(jax.random.PRNGKey(0), xa, xv, method=model.init_all)
        state = create_train_state(variables, make_optimizer(cfg.learning_rate))
        step = make_audio_ae_step(model, cfg)

        def stream():
            while True:
                yield {"audio": synthetic_av_batch(cfg, cfg.batch_size)["audio"]}

        trainer = Trainer(cfg, step, state, run_name="t1",
                          mode_schedule="fixed", fixed_mode=0,
                          checkpoint_policy="epoch")
        out = trainer.fit(stream())
        assert int(out.step) == cfg.epochs * cfg.steps_per_epoch
        assert latest_checkpoint(cfg.cp_dir) is not None
        lines = open(os.path.join(cfg.log_dir, "t1", "metrics.jsonl")).readlines()
        assert len(lines) == cfg.epochs * cfg.steps_per_epoch
        rec = json.loads(lines[-1])
        assert "clips_per_sec_per_chip" in rec and np.isfinite(rec["loss"])
        # observability channel (reference wandb.watch parity): in-step
        # grad/param norms every step + per-cb_freq param histograms
        assert rec["grad_norm"] > 0 and rec["param_norm"] > 0
        assert any(k.startswith("grad_norm/") for k in rec)
        hlines = open(os.path.join(cfg.log_dir, "t1",
                                   "histograms.jsonl")).readlines()
        assert len(hlines) == cfg.epochs  # cb_freq > steps/epoch -> 1/epoch
        hrec = json.loads(hlines[-1])
        pkeys = [k for k in hrec if k.startswith("params/")]
        assert pkeys and sum(hrec[pkeys[0]]["counts"]) > 0
        assert len(hrec[pkeys[0]]["edges"]) == len(hrec[pkeys[0]]["counts"]) + 1

        # auto-resume: -c picks up the saved checkpoint and its epoch
        cfg2 = cfg.replace(c=True, epochs=3)
        trainer2 = Trainer(cfg2, step, create_train_state(
            variables, make_optimizer(cfg.learning_rate)), run_name="t2",
            mode_schedule="fixed", fixed_mode=0, checkpoint_policy="none")
        assert trainer2.epoch == cfg.epochs - 1
        assert int(trainer2.state.step) == cfg.epochs * cfg.steps_per_epoch


class TestPreemption:
    def test_sigterm_saves_checkpoint_and_exits(self, tmp_path):
        """Production preemption path (SURVEY §5.3: the reference has none):
        SIGTERM mid-epoch -> in-flight step finishes, metrics drain, one
        checkpoint lands, fit() returns, handlers are restored, -c resumes."""
        import signal as _signal

        cfg = CFG.replace(cp_dir=str(tmp_path / "cp"),
                          log_dir=str(tmp_path / "logs"),
                          epochs=5, steps_per_epoch=4, cb_freq=100)
        state = tiny_state(0)
        calls = {"n": 0}

        def step(state, batch, rng, mode):
            calls["n"] += 1
            if calls["n"] == 3:
                os.kill(os.getpid(), _signal.SIGTERM)
            return (state.replace(step=state.step + 1),
                    {"loss": jnp.float32(0.5)})

        def stream():
            while True:
                yield {"audio": np.zeros((cfg.batch_size, 8), np.float32)}

        before = _signal.getsignal(_signal.SIGTERM)
        trainer = Trainer(cfg, step, state, run_name="pre",
                          mode_schedule="fixed", fixed_mode=0,
                          checkpoint_policy="epoch")
        out = trainer.fit(stream())
        # stopped right after the signalled step, not at epochs*steps
        assert calls["n"] == 3 and int(out.step) == 3
        assert latest_checkpoint(cfg.cp_dir) is not None
        assert _signal.getsignal(_signal.SIGTERM) is before
        recs = [json.loads(l) for l in open(
            os.path.join(cfg.log_dir, "pre", "metrics.jsonl"))]
        assert any(r.get("preempted") for r in recs)
        assert sum(1 for r in recs if "loss" in r) == 3

        # -c resumes from the preempt checkpoint's epoch
        cfg2 = cfg.replace(c=True)
        t2 = Trainer(cfg2, step, tiny_state(1), run_name="pre2",
                     mode_schedule="fixed", fixed_mode=0,
                     checkpoint_policy="none")
        assert int(t2.state.step) == 3 and t2.epoch == 0

    def test_second_sigint_raises_keyboard_interrupt(self, tmp_path):
        """First Ctrl+C -> graceful preempt flag; second -> immediate
        KeyboardInterrupt (a wedged relay compile never reaches the flag
        check, so repeated Ctrl+C must still kill)."""
        import signal as _signal

        cfg = CFG.replace(cp_dir=str(tmp_path / "cp"),
                          log_dir=str(tmp_path / "logs"),
                          epochs=2, steps_per_epoch=4, cb_freq=100)
        calls = {"n": 0}

        def step(state, batch, rng, mode):
            calls["n"] += 1
            if calls["n"] == 2:
                os.kill(os.getpid(), _signal.SIGINT)  # flag set, loop exits...
                os.kill(os.getpid(), _signal.SIGINT)  # ...but 2nd kills NOW
            return (state.replace(step=state.step + 1),
                    {"loss": jnp.float32(0.5)})

        def stream():
            while True:
                yield {"audio": np.zeros((cfg.batch_size, 8), np.float32)}

        before = _signal.getsignal(_signal.SIGINT)
        trainer = Trainer(cfg, step, tiny_state(0), run_name="pre3",
                          mode_schedule="fixed", fixed_mode=0,
                          checkpoint_policy="none")
        with pytest.raises(KeyboardInterrupt):
            trainer.fit(stream())
        assert calls["n"] == 2
        assert _signal.getsignal(_signal.SIGINT) is before
