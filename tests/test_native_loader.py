"""Native C++ loader vs Python pipeline: exact content parity.

Builds native/libmaavss_dataloader.so (skips if no compiler) and checks that
every batch row the C++ runtime assembles is bit-identical to the
corresponding AVDataset item (audio slice + frames/255), across epochs.
"""

import numpy as np
import pytest

from maavss_tpu.config import RunConfig
from maavss_tpu.data.dataset import AVDataset
from maavss_tpu.data.synthetic import build_synthetic_store

CFG = RunConfig(num_frames=4, num_seq=4, hops_per_frame=4, fft_len=64,
                p_size=16, frame_hop=2, framerate=30)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    from maavss_tpu.data import native_loader

    if not native_loader.native_available():
        pytest.skip("native loader not buildable here")
    d = tmp_path_factory.mktemp("synth_native")
    frames, audio = build_synthetic_store(str(d), CFG, n_videos=3, seconds=1.5)
    ds = AVDataset(CFG, frames, audio, CFG.num_frames + CFG.num_seq,
                   cache_dir=str(d / "cc"))
    return ds, native_loader


def test_native_batches_match_python(setup):
    ds, native_loader = setup
    ref = [ds[i] for i in range(len(ds))]
    loader = native_loader.NativeAVLoader(ds, batch_size=2, seed=7, threads=2)
    seen = set()
    n_batches = (len(ds) // 2) * 2  # two epochs' worth
    for _ in range(n_batches):
        b = next(loader)
        assert b["audio"].shape == (2, ds.samples_per_frame * ds.clip_len)
        for row in range(2):
            # identify the clip by exact audio match, then check frames too
            match = None
            for i, r in enumerate(ref):
                if np.array_equal(b["audio"][row], r["audio"]):
                    match = i
                    break
            assert match is not None, "native audio row matches no dataset clip"
            np.testing.assert_array_equal(b["frames"][row],
                                          ref[match]["frames"])
            seen.add(match)
    # epoch shuffling must cover the dataset
    assert len(seen) == len(ds)
    loader.close()


def test_native_subset(setup):
    ds, native_loader = setup
    subset = np.array([0, 2, 4], dtype=np.int64)
    loader = native_loader.NativeAVLoader(ds, batch_size=1, seed=1,
                                          clip_indices=subset)
    allowed = {bytes(ds[int(i)]["audio"]) for i in subset}
    for _ in range(6):
        b = next(loader)
        assert bytes(b["audio"][0]) in allowed
    loader.close()


def test_native_loader_respects_max_clip_len(tmp_path):
    """--max_clip_len filters the dataset's index VIEW; the native loader
    must translate view ids through dataset._clip_id or it trains on raw
    clips (including the filtered-out long video)."""
    import os

    from maavss_tpu.data import native_loader
    from maavss_tpu.data.audio_memmap import AudioMemmap, build_audio_memmap
    from maavss_tpu.data.frame_shards import FrameShardStore, write_frame_shard
    from maavss_tpu.data.wavio import write_wav

    if not native_loader.native_available():
        pytest.skip("native loader not buildable here")

    rng = np.random.default_rng(0)
    frames_dir = str(tmp_path / "frames")
    audio_dir = str(tmp_path / "audio")
    os.makedirs(audio_dir)
    lengths = {"vid0": 20, "vid1": 40}
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
    ds = AVDataset(CFG.replace(max_clip_len=30), FrameShardStore(frames_dir),
                   AudioMemmap(str(tmp_path / "mm")),
                   CFG.num_frames + CFG.num_seq, cache_dir=str(tmp_path / "cc"))
    assert len(ds) > 0
    ref = [ds[i] for i in range(len(ds))]  # filtered view items only
    loader = native_loader.NativeAVLoader(ds, batch_size=2, seed=3)
    for _ in range(len(ds)):
        b = next(loader)
        for row in range(2):
            assert any(np.array_equal(b["frames"][row], r["frames"])
                       for r in ref), \
                "native loader served a clip outside the filtered view"
