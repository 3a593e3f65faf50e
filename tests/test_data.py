"""Data-plane tests: WAV I/O, audio memmap contract, clip-index math vs a
naive oracle (SURVEY.md §4 prescription), dataset shapes/alignment, pipeline."""

import numpy as np
import pytest

from maavss_tpu.config import RunConfig
from maavss_tpu.data.audio_memmap import AudioMemmap, build_audio_memmap
from maavss_tpu.data.clip_index import ClipIndex, resample_video_idx, sliding_windows
from maavss_tpu.data.dataset import AVDataset, STFTDataset, VideoDataset, batches, prefetch, split_train_val
from maavss_tpu.data.synthetic import build_synthetic_store
from maavss_tpu.data.wavio import read_wav, write_wav

CFG = RunConfig(num_frames=4, num_seq=4, hops_per_frame=4, fft_len=64,
                p_size=16, frame_hop=2, framerate=30)


class TestWavIO:
    def test_pcm16_roundtrip(self, tmp_path):
        sr = 16000
        x = (0.5 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)).astype(np.float32)
        p = str(tmp_path / "a.wav")
        write_wav(p, x, sr)
        y, sr2 = read_wav(p)
        assert sr2 == sr and y.shape == (1, sr)
        np.testing.assert_allclose(y[0], x, atol=1e-4)  # 16-bit quantization

    def test_float32_roundtrip_stereo(self, tmp_path):
        x = np.random.default_rng(0).standard_normal((2, 1000)).astype(np.float32) * 0.1
        p = str(tmp_path / "b.wav")
        write_wav(p, x, 22050, pcm16=False)
        y, sr = read_wav(p)
        assert sr == 22050
        np.testing.assert_allclose(y, x, atol=1e-7)


class TestAudioMemmap:
    def test_build_and_read(self, tmp_path):
        sr = 16000
        rng = np.random.default_rng(1)
        sigs = [rng.standard_normal(n).astype(np.float32) * 0.3
                for n in (5000, 7000, 3000)]
        wavs = []
        for i, s in enumerate(sigs):
            p = str(tmp_path / f"{i}.wav")
            write_wav(p, s, sr, pcm16=False)
            wavs.append(p)
        build_audio_memmap(wavs, str(tmp_path / "mm"), samplerate=sr)
        am = AudioMemmap(str(tmp_path / "mm"))
        assert len(am) == 3
        np.testing.assert_allclose(am.read(1, 100, 500), sigs[1][100:600], atol=1e-6)
        # zero-pad past EOF (fixed shapes)
        tail = am.read(2, 2900, 200)
        np.testing.assert_allclose(tail[:100], sigs[2][2900:], atol=1e-6)
        assert np.all(tail[100:] == 0)

    def test_sr_mismatch_rejected(self, tmp_path):
        p = str(tmp_path / "bad.wav")
        write_wav(p, np.zeros(100, np.float32), 44100)
        build_audio_memmap([p], str(tmp_path / "mm"), samplerate=16000)
        am = AudioMemmap(str(tmp_path / "mm"))
        assert len(am) == 0


class TestClipIndex:
    def test_sliding_windows_oracle(self):
        w = sliding_windows(10, 4, 2)
        expect = np.array([[0, 1, 2, 3], [2, 3, 4, 5], [4, 5, 6, 7], [6, 7, 8, 9]])
        np.testing.assert_array_equal(w, expect)
        assert sliding_windows(3, 4, 1).shape == (0, 4)

    def test_resample_idx(self):
        # 60 -> 30 fps: every other frame
        np.testing.assert_array_equal(resample_video_idx(5, 60, 30), [0, 2, 4, 6, 8])
        # non-integer step floors
        idx = resample_video_idx(4, 25, 30)
        np.testing.assert_array_equal(idx, np.floor(np.arange(4) * 25 / 30).astype(int))

    def test_flat_addressing_bisect(self):
        ci = ClipIndex(["a", "b", "c"], [10, 3, 8], [30, 30, 30],
                       clip_len=4, frame_hop=2)
        # per-video clips: a:4, b:0, c:3
        assert ci.num_clips() == 7
        assert ci.get_clip_location(0) == (0, 0)
        assert ci.get_clip_location(3) == (0, 3)
        assert ci.get_clip_location(4) == (2, 0)  # b contributes none
        assert ci.get_clip_location(6) == (2, 2)
        with pytest.raises(IndexError):
            ci.get_clip_location(7)
        v, fidx = ci.clip_frame_indices(5)
        assert v == 2
        np.testing.assert_array_equal(fidx, [2, 3, 4, 5])

    def test_fps_resampled_frames(self):
        ci = ClipIndex(["a"], [20], [60.0], clip_len=3, frame_hop=1, framerate=30)
        v, fidx = ci.clip_frame_indices(0)
        np.testing.assert_array_equal(fidx, [0, 2, 4])

    def test_cache_roundtrip(self, tmp_path):
        ci = ClipIndex.load_or_build(str(tmp_path), ["a"], [10], [30.0], 4, 2, 30)
        ci2 = ClipIndex.load_or_build(str(tmp_path), ["a"], [10], [30.0], 4, 2, 30)
        assert ci.num_clips() == ci2.num_clips()
        # different geometry -> different cache entry (utilities.py:129-163)
        ci3 = ClipIndex.load_or_build(str(tmp_path), ["a"], [10], [30.0], 4, 1, 30)
        assert ci3.cache_key() != ci.cache_key()


class TestDatasets:
    @pytest.fixture(scope="class")
    def store(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("synth")
        frames, audio = build_synthetic_store(str(d), CFG, n_videos=3, seconds=1.5)
        return d, frames, audio

    def test_av_dataset_shapes_and_alignment(self, store):
        d, frames, audio = store
        clip_len = CFG.num_frames + CFG.num_seq
        ds = AVDataset(CFG, frames, audio, clip_len, cache_dir=str(d / "cc"))
        assert len(ds) > 0
        ex = ds[0]
        assert ex["frames"].shape == (clip_len, CFG.p_size, CFG.p_size)
        assert ex["audio"].shape == (CFG.hop * CFG.hops_per_frame * clip_len,)
        assert ex["frames"].dtype == np.uint8  # raw wire format; steps normalize
        # clip 1 starts frame_hop frames in -> audio shifted by hop*a*frame_hop
        ex1 = ds[1]
        shift = int(round(CFG.frame_hop * CFG.samplerate / CFG.framerate))
        n = ex["audio"].shape[0] - shift
        np.testing.assert_allclose(ex1["audio"][:n], ex["audio"][shift:], atol=1e-6)

    def test_video_and_stft_datasets(self, store):
        d, frames, audio = store
        vds = VideoDataset(CFG, frames, CFG.num_frames, cache_dir=str(d / "cc2"))
        assert vds[0]["frames"].shape == (CFG.num_frames, CFG.p_size, CFG.p_size)
        sds = STFTDataset(CFG, audio)
        assert sds[0]["audio"].shape == (CFG.audio_sample_len,)

    def test_batch_pipeline(self, store):
        d, frames, audio = store
        clip_len = CFG.num_frames + CFG.num_seq
        ds = AVDataset(CFG, frames, audio, clip_len, cache_dir=str(d / "cc"))
        it = prefetch(batches(ds, batch_size=2, seed=0), size=2)
        b = next(it)
        assert b["audio"].shape[0] == 2 and b["frames"].shape[0] == 2
        assert next(it)["audio"].shape == b["audio"].shape

    def test_split(self):
        tr, va = split_train_val(100, 0.8, seed=0)
        assert len(tr) == 80 and len(va) == 20
        assert len(np.intersect1d(tr, va)) == 0


class TestFpsResampleAlignment:
    def test_audio_offset_uses_source_fps(self, tmp_path):
        """A 60 fps shard resampled to 30 fps: clip k starts at source frame
        2k*frame_hop, and its audio offset must convert through 60 fps."""
        import json

        from maavss_tpu.data.frame_shards import write_frame_shard, FrameShardStore
        from maavss_tpu.data.wavio import write_wav

        sr, src_fps = 16000, 60.0
        n_frames, seconds = 120, 2.0
        frames = (np.arange(n_frames, dtype=np.uint8)[:, None, None]
                  * np.ones((1, 8, 8), np.uint8))
        write_frame_shard(str(tmp_path / "frames"), "vid000", frames, src_fps)
        # audio = sample-index ramp so offsets are directly readable
        audio = (np.arange(int(seconds * sr), dtype=np.float32) / sr)
        write_wav(str(tmp_path / "audio" / "vid000.wav") if (tmp_path / "audio").mkdir() or True
                  else "", audio, sr, pcm16=False)
        build_audio_memmap([str(tmp_path / "audio" / "vid000.wav")],
                           str(tmp_path / "audio"), samplerate=sr)

        cfg = CFG.replace(framerate=30)
        ds = AVDataset(cfg, FrameShardStore(str(tmp_path / "frames")),
                       AudioMemmap(str(tmp_path / "audio")),
                       clip_len=4, cache_dir=str(tmp_path / "cc"))
        ex1 = ds[1]
        # clip 1 starts at 30fps-frame frame_hop=2 -> source frame 4 -> t=4/60 s
        expected_start = 4 / 60.0
        np.testing.assert_allclose(ex1["audio"][0], expected_start, atol=2 / sr)
        # frames picked every other source frame: 4, 6, 8, 10
        np.testing.assert_array_equal(ex1["frames"][:, 0, 0], [4, 6, 8, 10])
