"""Reference-flag parity: --compress_audio, --attn_diff, --max_clip_len.

These reference run_config flags (run_config.py:23-25,39) act in the
reference's dataset (av_dataset.py:213-214, 262-268/322-325, 98 +
utilities.py:117-119); here they act in the jitted feature prep
(train/steps.py — shared by train, eval and the separators) and the dataset
index view."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maavss_tpu.config import RunConfig
from maavss_tpu.data.synthetic import synthetic_av_batch
from maavss_tpu.ops.audio import contrast
from maavss_tpu.ops.phasegram import phasegram_cumsum
from maavss_tpu.train.steps import (
    _pflat_from_batch,
    _prep_stft_pair,
    attn_diff_frames,
    frames_f32,
)

CFG = RunConfig(num_frames=4, num_seq=4, hops_per_frame=4, fft_len=64,
                p_size=16, frame_hop=2, framerate=30)


def test_compress_audio_applies_sox_contrast():
    """--compress_audio routes the clean audio through the SoX contrast op
    before the STFT (av_dataset.py:213-214), identically for x and y."""
    cfg_off = CFG.replace(noise_scalar=0.0)
    cfg_on = cfg_off.replace(compress_audio=True)
    audio = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 512)).astype(np.float32) * 0.3)
    rng = jax.random.PRNGKey(0)
    x_off, y_off = _prep_stft_pair(audio, cfg_off, rng, trim_end=True, max_norm=False)
    x_on, y_on = _prep_stft_pair(audio, cfg_on, rng, trim_end=True, max_norm=False)
    x_ref, y_ref = _prep_stft_pair(contrast(audio), cfg_off, rng, trim_end=True,
                                   max_norm=False)
    assert not np.allclose(np.asarray(y_on), np.asarray(y_off))
    np.testing.assert_allclose(np.asarray(y_on), np.asarray(y_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(x_on), np.asarray(x_ref), atol=1e-6)


def test_attn_diff_frames_semantics():
    """Temporal diff with a zero-padded first frame (the reference's intended
    op at av_dataset.py:322-325)."""
    fr = jnp.asarray(np.random.default_rng(1).random((2, 5, 8, 8)), jnp.float32)
    out = attn_diff_frames(fr)
    assert out.shape == fr.shape
    np.testing.assert_allclose(np.asarray(out[:, 0]), 0.0)
    np.testing.assert_allclose(np.asarray(out[:, 1:]),
                               np.asarray(fr[:, 1:] - fr[:, :-1]), atol=1e-7)


def test_attn_diff_changes_pflat_and_conflicts_with_pgram_cache():
    batch = synthetic_av_batch(CFG, 2, seed=0)
    p_plain = _pflat_from_batch({"frames": jnp.asarray(batch["frames"])}, CFG)
    cfg_d = CFG.replace(attn_diff=True)
    p_diff = _pflat_from_batch({"frames": jnp.asarray(batch["frames"])}, cfg_d)
    ref = phasegram_cumsum(attn_diff_frames(frames_f32(jnp.asarray(batch["frames"]))))
    assert not np.allclose(np.asarray(p_diff), np.asarray(p_plain))
    np.testing.assert_allclose(np.asarray(p_diff), np.asarray(ref), atol=1e-6)
    with pytest.raises(ValueError, match="attn_diff"):
        _pflat_from_batch({"pgram": jnp.zeros((2, 8, 256))}, cfg_d)


def test_attn_diff_fusion_step_runs():
    from maavss_tpu.train.setup import build_fusion
    from maavss_tpu.train.steps import make_fusion_step

    cfg = CFG.replace(latent_chan=8, fc_size=256, batch_size=2, attn_diff=True)
    model, state = build_fusion(cfg, 2)
    step = make_fusion_step(model, cfg, window_mode="vectorized")
    batch = synthetic_av_batch(cfg, 2, seed=0)
    state, metrics = step(state, batch, jax.random.PRNGKey(0), jnp.int32(2))
    assert np.isfinite(float(metrics["loss"]))


def test_max_clip_len_filters_long_videos(tmp_path):
    """Videos with more than --max_clip_len frames drop out of the index view
    (reference: filter_valid_videos max_frames, utilities.py:117-119)."""
    import os

    from maavss_tpu.data.audio_memmap import AudioMemmap, build_audio_memmap
    from maavss_tpu.data.dataset import AVDataset
    from maavss_tpu.data.frame_shards import FrameShardStore, write_frame_shard
    from maavss_tpu.data.wavio import write_wav

    rng = np.random.default_rng(0)
    frames_dir = str(tmp_path / "frames")
    audio_dir = str(tmp_path / "audio")
    os.makedirs(audio_dir)
    lengths = {"vid0": 20, "vid1": 40}  # frames at 30 fps
    for vid, n in lengths.items():
        write_frame_shard(frames_dir, vid,
                          (rng.random((n, CFG.p_size, CFG.p_size)) * 255)
                          .astype(np.uint8), CFG.framerate, source=vid)
        n_samp = int(n / CFG.framerate * CFG.samplerate) + CFG.samplerate
        write_wav(os.path.join(audio_dir, f"{vid}.wav"),
                  rng.standard_normal(n_samp).astype(np.float32) * 0.1,
                  CFG.samplerate)
    build_audio_memmap(
        [os.path.join(audio_dir, f"{v}.wav") for v in lengths],
        str(tmp_path / "mm"), CFG.samplerate)
    frames = FrameShardStore(frames_dir)
    audio = AudioMemmap(str(tmp_path / "mm"))
    clip_len = CFG.num_frames + CFG.num_seq

    full = AVDataset(CFG, frames, audio, clip_len, cache_dir=str(tmp_path / "c1"))
    lim = AVDataset(CFG.replace(max_clip_len=30), frames, audio, clip_len,
                    cache_dir=str(tmp_path / "c2"))
    assert 0 < len(lim) < len(full)
    # every surviving clip reads from the short video only
    for i in range(len(lim)):
        v, _ = lim.index.clip_frame_indices(lim._clip_id(i))
        assert frames.num_frames(v) <= 30


def test_autocontrast_train_cli_errors_loudly():
    """--autocontrast acts at attention-extraction (ingest) time here; a
    train-time flag would silently do nothing, so load_stores rejects it
    with a pointer to save_attn_videos.py."""
    from maavss_tpu.train.setup import load_stores

    with pytest.raises(SystemExit, match="save_attn_videos"):
        load_stores(CFG.replace(autocontrast=True))
