"""Native ingest pipeline end-to-end: encode synthetic AVI clips with the
libav tool, ingest them into training stores, and read clips through
AVDataset — the real-data path (tools/ingest.py) without any downloads."""

import json
import os
import subprocess

import numpy as np
import pytest

from maavss_tpu.config import RunConfig

CFG = RunConfig(num_frames=4, num_seq=4, hops_per_frame=4, fft_len=64,
                p_size=16, frame_hop=2, framerate=30)


@pytest.fixture(scope="module")
def ingested(tmp_path_factory):
    from tools.ingest import ingest_tree, native_bin

    if native_bin() is None:
        pytest.skip("native ingest tool not buildable here")
    d = tmp_path_factory.mktemp("ingest")
    raw = d / "raw" / "flute"
    raw.mkdir(parents=True)
    for i, n in enumerate((45, 60)):
        out = subprocess.run(
            [native_bin(), "synth", str(raw / f"vid{i}.avi"), str(n), "30",
             "128", "16000"], capture_output=True, text=True, check=True)
        assert json.loads(out.stdout)["frames"] == n
    ingest_tree(str(d / "raw"), str(d / "proc"), framesize=64, fps=30, sr=16000)
    return d / "proc"


def test_stores_created(ingested):
    from maavss_tpu.data.audio_memmap import AudioMemmap
    from maavss_tpu.data.frame_shards import FrameShardStore

    store = FrameShardStore(str(ingested / "frames"))
    assert len(store) == 2
    assert store.num_frames(0) == 45 and store.num_frames(1) == 60
    fr = store.read(1, np.arange(5))
    assert fr.shape == (5, 64, 64) and fr.dtype == np.uint8
    # the synth clip is a bright square on black: decoded content is non-flat
    assert fr.max() > 180 and fr.min() < 40

    audio = AudioMemmap(str(ingested / "audio"))
    assert len(audio) == 2
    # 60 frames at 30 fps, 16 kHz -> 32000 samples; 440 Hz tone
    n = audio.file_num_samples(1)
    assert abs(n - 32000) <= 1600
    x = audio.read(1, 0, 16000)
    spec = np.abs(np.fft.rfft(x))
    assert abs(int(np.argmax(spec)) - 440) <= 2


def test_dataset_over_ingested(ingested):
    from maavss_tpu.data.audio_memmap import AudioMemmap
    from maavss_tpu.data.dataset import AVDataset
    from maavss_tpu.data.frame_shards import FrameShardStore

    ds = AVDataset(CFG, FrameShardStore(str(ingested / "frames")),
                   AudioMemmap(str(ingested / "audio")),
                   CFG.num_frames + CFG.num_seq,
                   cache_dir=str(ingested / "cc"))
    assert len(ds) > 0
    ex = ds[len(ds) - 1]
    assert ex["frames"].shape == (8, 64, 64)
    assert ex["audio"].shape == (CFG.hop * CFG.hops_per_frame * 8,)
    assert np.isfinite(ex["audio"]).all()


def test_corrupt_video_rejected(tmp_path):
    """Quarantine parity (extract_audio.py:15-19, generator.py:152-167's
    retry-on-error): an undecodable file lands in rejected/, produces no
    stores, and does not abort the run."""
    from tools.ingest import ingest_tree, native_bin

    if native_bin() is None:
        pytest.skip("native ingest tool not buildable here")
    raw = tmp_path / "raw"
    raw.mkdir()
    (raw / "corrupt.avi").write_bytes(b"RIFF\x00\x00\x00\x00AVI garbage" * 64)
    ingest_tree(str(raw), str(tmp_path / "proc"), 64, 30, 16000)
    assert os.path.exists(tmp_path / "proc" / "rejected" / "corrupt.avi")
    assert not os.path.exists(tmp_path / "proc" / "frames" / "meta.json")
