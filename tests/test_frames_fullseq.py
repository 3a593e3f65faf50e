"""--frames_encode full (train/steps.py:make_full_loss): encode the whole
frame sequence once, slice latent windows — vs the reference-parity windowed
re-encode. Correctness anchors:

- ns == 1: full and window modes are mathematically IDENTICAL (one window's
  zero pad == the sequence's zero pad; BN sees the same batches), so the
  step must match to fp tolerance.
- ns > 1: the modes deviate by design (temporal context + BN batching,
  documented at the implementation site); here we assert the full-mode step
  runs, learns, and the separator honors the flag.
- --microbatch composes: identical chunks -> identical grads.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maavss_tpu.config import RunConfig
from maavss_tpu.data.synthetic import synthetic_av_batch
from maavss_tpu.models.fusion_frames import AVFusionFramesModel
from maavss_tpu.train.state import create_train_state, make_optimizer
from maavss_tpu.train.steps import make_frames_step

CFG = RunConfig(num_frames=2, num_seq=2, hops_per_frame=4, fft_len=64,
                p_size=16, latent_chan=8, fc_size=256, learning_rate=1e-3,
                framesize=24, batch_size=4)


def build(cfg, bsz, seed=0):
    t_stft = cfg.hops_per_frame * cfg.num_frames
    stft_shape = (bsz, 2, t_stft, cfg.fft_len // 2 + 1)
    frame_shape = (bsz, 1, cfg.num_frames, cfg.framesize, cfg.framesize)
    model = AVFusionFramesModel(
        stft_shape=stft_shape, frame_shape=frame_shape,
        hops_per_frame=cfg.hops_per_frame, latent_channels=8)
    vs = model.init(jax.random.PRNGKey(seed), jnp.zeros(stft_shape),
                    jnp.zeros(frame_shape), method=model.init_all)
    return model, vs


def run_step(model, vs, cfg, batch, opt="sgd"):
    state = create_train_state(
        jax.tree_util.tree_map(jnp.copy, vs),
        make_optimizer(cfg.learning_rate, opt))
    step = make_frames_step(model, cfg)
    state, metrics = step(state, batch, jax.random.PRNGKey(0), jnp.int32(2))
    return float(metrics["loss"]), state


def test_fullseq_matches_window_at_ns1():
    cfg = CFG.replace(num_seq=1)
    model, vs = build(cfg, 4)
    batch = synthetic_av_batch(cfg, 4, seed=0, frame_size=cfg.framesize)

    loss_w, st_w = run_step(model, vs, cfg.replace(frames_encode="window"), batch)
    loss_f, st_f = run_step(model, vs, cfg.replace(frames_encode="full"), batch)

    assert loss_w == pytest.approx(loss_f, rel=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(st_w.params),
                    jax.tree_util.tree_leaves(st_f.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(st_w.batch_stats),
                    jax.tree_util.tree_leaves(st_f.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_fullseq_step_runs_and_learns_ns2():
    cfg = CFG.replace(frames_encode="full")
    model, vs = build(cfg, 4)
    batch = synthetic_av_batch(cfg, 4, seed=1, frame_size=cfg.framesize)
    state = create_train_state(
        jax.tree_util.tree_map(jnp.copy, vs),
        make_optimizer(1e-3, "adam"))
    step = make_frames_step(model, cfg)
    losses = []
    # 12 steps: Adam overshoots on steps 1-4 at this tiny geometry (the
    # window mode shows the identical warm-up curve) before converging
    for i in range(12):
        state, metrics = step(state, batch, jax.random.PRNGKey(1), jnp.int32(2))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_fullseq_microbatch_matches_monolithic():
    cfg = CFG.replace(frames_encode="full", noise_scalar=0.0)
    model, vs = build(cfg, 4)
    half = synthetic_av_batch(cfg, 2, seed=2, frame_size=cfg.framesize)
    batch = {k: np.concatenate([v, v], axis=0) for k, v in half.items()}

    loss1, st1 = run_step(model, vs, cfg.replace(microbatch=1), batch)
    loss2, st2 = run_step(model, vs, cfg.replace(microbatch=2), batch)
    assert loss1 == pytest.approx(loss2, rel=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(st1.params),
                    jax.tree_util.tree_leaves(st2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_fullseq_separator_runs():
    from maavss_tpu.train.infer import make_frames_separator

    cfg = CFG.replace(frames_encode="full")
    model, vs = build(cfg, 2)
    state = create_train_state(vs, make_optimizer(1e-3, "sgd"))
    batch = jax.tree_util.tree_map(
        jnp.asarray, synthetic_av_batch(cfg, 2, seed=3,
                                        frame_size=cfg.framesize))
    out = make_frames_separator(model, cfg)(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(out["si_sdr"].mean()))
    assert out["audio_out"].shape == batch["audio"].shape


def test_frames_encode_rejects_unknown():
    model, vs = build(CFG, 4)
    with pytest.raises(ValueError, match="frames_encode"):
        make_frames_step(model, CFG.replace(frames_encode="bogus"))


# --- --frames_halo (round 5: real-context training windows) -----------------


def test_halo_requires_full_encode():
    model, vs = build(CFG, 4)
    with pytest.raises(ValueError, match="frames_halo"):
        make_frames_step(model, CFG.replace(frames_encode="window",
                                            frames_halo=1))


def test_halo_step_runs_and_learns():
    cfg = CFG.replace(frames_encode="full", frames_halo=1)
    model, vs = build(cfg, 4)
    batch = synthetic_av_batch(cfg, 4, seed=4, frame_size=cfg.framesize)
    # synthetic batches honor the halo: 2 extra frames + their audio
    assert batch["frames"].shape[1] == cfg.num_frames + cfg.num_seq + 2
    state = create_train_state(
        jax.tree_util.tree_map(jnp.copy, vs),
        make_optimizer(1e-3, "adam"))
    step = make_frames_step(model, cfg)
    losses = []
    for i in range(12):
        state, metrics = step(state, batch, jax.random.PRNGKey(1),
                              jnp.int32(2))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_halo_zero_context_approximates_halo0_and_slices_align():
    """With ZERO halo frames/audio, halo=1 must sit near halo=0 on the
    center-cropped batch — only BN statistics over the two extra zero frames
    differ. This is also the slicing canary: an off-by-one in the window or
    target offsets would compare different frames' content (the blobs move
    per frame) and miss by far more than the BN drift tolerance."""
    cfg0 = CFG.replace(frames_encode="full", noise_scalar=0.0)
    cfg1 = cfg0.replace(frames_halo=1)
    model, vs = build(cfg0, 4)

    batch1 = synthetic_av_batch(cfg1, 4, seed=5, frame_size=cfg0.framesize)
    s_hop = batch1["audio"].shape[1] // batch1["frames"].shape[1]  # per frame
    zeroed = {k: v.copy() for k, v in batch1.items()}
    zeroed["frames"][:, 0] = 0
    zeroed["frames"][:, -1] = 0
    zeroed["audio"][:, :s_hop] = 0
    zeroed["audio"][:, -s_hop:] = 0
    cropped = {"frames": zeroed["frames"][:, 1:-1],
               "audio": zeroed["audio"][:, s_hop:-s_hop]}

    loss0, _ = run_step(model, vs, cfg0, cropped)
    loss1, _ = run_step(model, vs, cfg1, zeroed)
    assert loss1 == pytest.approx(loss0, rel=0.25)  # BN-stat drift only
