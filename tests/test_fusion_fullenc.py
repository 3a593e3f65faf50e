"""--fusion_encode full (train/steps.py:make_fusion_step): run both conv
encoders ONCE over the whole (num_frames+num_seq-1)-frame span and slice
latent windows before the LSTM+FC heads — vs the reference-parity windowed
(re-)encode. Correctness anchors (same scheme as tests/test_frames_fullseq.py
for the frames family):

- ns == 1: full and window modes are mathematically IDENTICAL (one window IS
  the full span: same conv zero pad, same BN batch, same phasegram diff/max),
  so the step must match to fp tolerance.
- ns > 1: the modes deviate by design (temporal conv context at window seams,
  one BN update, full-span phasegram finishing — documented at the
  implementation site); assert the full-mode step runs, learns, and composes
  with --microbatch and --mask_head.
- the latent-window slicing geometry is validated against the shape plan
  (_fusion_full_geometry) — misaligned geometries must raise, not mis-slice.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maavss_tpu.config import RunConfig
from maavss_tpu.data.synthetic import synthetic_av_batch
from maavss_tpu.models.fusion import AVFusionModel
from maavss_tpu.train.state import create_train_state, make_optimizer
from maavss_tpu.train.steps import make_fusion_step

CFG = RunConfig(num_frames=4, num_seq=2, hops_per_frame=4, fft_len=64,
                p_size=16, latent_chan=8, fc_size=256, learning_rate=1e-3,
                batch_size=4)


def build(cfg, bsz, seed=0, **model_kw):
    t_stft = cfg.hops_per_frame * cfg.num_frames
    model = AVFusionModel(
        stft_shape=(bsz, 2, t_stft, cfg.fft_len // 2),
        pgram_shape=(bsz, 1, cfg.num_frames, cfg.p_size**2),
        latent_channels=cfg.latent_chan, fc_size=cfg.fc_size, **model_kw)
    x_a = jnp.zeros(model.stft_shape, jnp.float32)
    x_v = jnp.zeros(model.pgram_shape, jnp.float32)
    vs = model.init(jax.random.PRNGKey(seed), x_a, x_v,
                    method=model.init_all)
    return model, vs


def run_step(model, vs, cfg, batch, window_mode="scan", opt="sgd", steps=1):
    state = create_train_state(
        jax.tree_util.tree_map(jnp.copy, vs),
        make_optimizer(cfg.learning_rate, opt))
    step = make_fusion_step(model, cfg, window_mode=window_mode)
    metrics = None
    for i in range(steps):
        state, metrics = step(state, batch, jax.random.PRNGKey(0),
                              jnp.int32(2))
    return float(metrics["loss"]), state


def test_full_matches_window_at_ns1():
    cfg = CFG.replace(num_seq=1)
    model, vs = build(cfg, 4)
    batch = jax.tree_util.tree_map(
        jnp.asarray, synthetic_av_batch(cfg, 4, seed=0))

    loss_w, st_w = run_step(model, vs, cfg.replace(fusion_encode="window"),
                            batch, window_mode="vectorized")
    loss_f, st_f = run_step(model, vs, cfg.replace(fusion_encode="full"),
                            batch)

    assert loss_w == pytest.approx(loss_f, rel=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(st_w.params),
                    jax.tree_util.tree_leaves(st_f.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(st_w.batch_stats),
                    jax.tree_util.tree_leaves(st_f.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_full_step_runs_and_learns_ns2():
    cfg = CFG.replace(fusion_encode="full")
    model, vs = build(cfg, 4)
    batch = jax.tree_util.tree_map(
        jnp.asarray, synthetic_av_batch(cfg, 4, seed=1))
    state = create_train_state(
        jax.tree_util.tree_map(jnp.copy, vs),
        make_optimizer(1e-2, "sgd"))
    step = make_fusion_step(model, cfg)
    losses = []
    for i in range(6):
        state, metrics = step(state, batch, jax.random.PRNGKey(0),
                              jnp.int32(2))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]


def test_full_microbatch_matches_monolithic_on_duplicated_chunks():
    # duplicated examples -> per-chunk BN stats == full-batch stats, so
    # microbatched full-encode must match the monolithic full-encode exactly
    cfg = CFG.replace(fusion_encode="full")
    model, vs = build(cfg, 4)
    half = synthetic_av_batch(cfg, 2, seed=2)
    batch = jax.tree_util.tree_map(
        lambda t: jnp.concatenate([jnp.asarray(t)] * 2, axis=0), half)

    loss_m, st_m = run_step(model, vs, cfg, batch)
    loss_mb, st_mb = run_step(model, vs, cfg.replace(microbatch=2), batch)

    assert loss_m == pytest.approx(loss_mb, rel=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(st_m.params),
                    jax.tree_util.tree_leaves(st_mb.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_full_mask_head_runs():
    cfg = CFG.replace(fusion_encode="full")
    model, vs = build(cfg, 4, mask_head=True)
    batch = jax.tree_util.tree_map(
        jnp.asarray, synthetic_av_batch(cfg, 4, seed=3))
    loss, _ = run_step(model, vs, cfg, batch)
    assert np.isfinite(loss)


def test_full_geometry_guard():
    from maavss_tpu.train.steps import _fusion_full_geometry

    model, _ = build(CFG, 4)
    hop_a, hop_v, t_win = _fusion_full_geometry(model, CFG)
    assert (hop_a, hop_v, t_win) == (1, 1, CFG.num_frames)


def _separate(model, vs, cfg, batch):
    from maavss_tpu.train.infer import make_separator
    from maavss_tpu.train.state import create_train_state

    state = create_train_state(
        jax.tree_util.tree_map(jnp.copy, vs),
        make_optimizer(cfg.learning_rate, "sgd"))
    sep = make_separator(model, cfg)
    return sep(state, {"audio": batch["audio"], "frames": batch["frames"]},
               jax.random.PRNGKey(7))


def test_full_separator_matches_window_at_ns1():
    # ns == 1: the full-encode separator is mathematically the windowed one
    # (one window IS the span); outputs must match to fp tolerance
    cfg = CFG.replace(num_seq=1)
    model, vs = build(cfg, 4)
    batch = jax.tree_util.tree_map(
        jnp.asarray, synthetic_av_batch(cfg, 4, seed=5))

    out_w = _separate(model, vs, cfg.replace(fusion_encode="window"), batch)
    out_f = _separate(model, vs, cfg.replace(fusion_encode="full"), batch)
    np.testing.assert_allclose(np.asarray(out_w["audio_out"]),
                               np.asarray(out_f["audio_out"]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(out_w["si_sdr"].mean()),
                               float(out_f["si_sdr"].mean()), rtol=1e-4)


def test_full_separator_runs_ns2():
    cfg = CFG.replace(fusion_encode="full")
    model, vs = build(cfg, 4)
    batch = jax.tree_util.tree_map(
        jnp.asarray, synthetic_av_batch(cfg, 4, seed=6))
    out = _separate(model, vs, cfg, batch)
    assert np.all(np.isfinite(np.asarray(out["audio_out"])))
    assert np.all(np.isfinite(np.asarray(out["si_sdr_gain"])))


# --- MAAVSS_FULLENC_LOSS=slice / MAAVSS_MASK_IMPL=xla (round-5 byte cuts) ---


def test_fullenc_slice_loss_matches_fold(monkeypatch):
    """'slice' computes the same two mse terms against plain span slices
    instead of materialized [B*ns,...] target folds — loss and updated params
    must match 'fold' to fp-reduction tolerance."""
    cfg = CFG.replace(fusion_encode="full")
    model, vs = build(cfg, 4)
    batch = jax.tree_util.tree_map(
        jnp.asarray, synthetic_av_batch(cfg, 4, seed=7))

    monkeypatch.setenv("MAAVSS_FULLENC_LOSS", "fold")
    loss_fold, st_fold = run_step(model, vs, cfg, batch)
    monkeypatch.setenv("MAAVSS_FULLENC_LOSS", "slice")
    loss_slice, st_slice = run_step(model, vs, cfg, batch)

    assert loss_fold == pytest.approx(loss_slice, rel=1e-5)
    for p, q in zip(jax.tree_util.tree_leaves(st_fold.params),
                    jax.tree_util.tree_leaves(st_slice.params)):
        np.testing.assert_allclose(np.asarray(p), np.asarray(q),
                                   rtol=1e-5, atol=1e-7)


def test_fullenc_slice_loss_rejects_unknown(monkeypatch):
    cfg = CFG.replace(fusion_encode="full")
    model, vs = build(cfg, 4)
    monkeypatch.setenv("MAAVSS_FULLENC_LOSS", "bogus")
    with pytest.raises(ValueError, match="MAAVSS_FULLENC_LOSS"):
        make_fusion_step(model, cfg)


def test_mask_impl_xla_matches_pallas(monkeypatch):
    """MAAVSS_MASK_IMPL=xla is the same complex multiply without the Pallas
    call boundary; forward and one mask-head training step must agree."""
    cfg = CFG.replace(fusion_encode="full")
    model, vs = build(cfg, 4, mask_head=True)
    batch = jax.tree_util.tree_map(
        jnp.asarray, synthetic_av_batch(cfg, 4, seed=8))

    # auto resolves to xla since r5e — pin the Pallas leg explicitly so the
    # A/B keeps exercising the kernel.
    monkeypatch.setenv("MAAVSS_MASK_IMPL", "pallas")
    loss_p, st_p = run_step(model, vs, cfg, batch)
    monkeypatch.setenv("MAAVSS_MASK_IMPL", "xla")
    loss_x, st_x = run_step(model, vs, cfg, batch)

    assert loss_p == pytest.approx(loss_x, rel=1e-6)
    for p, q in zip(jax.tree_util.tree_leaves(st_p.params),
                    jax.tree_util.tree_leaves(st_x.params)):
        np.testing.assert_allclose(np.asarray(p), np.asarray(q),
                                   rtol=1e-5, atol=1e-7)
