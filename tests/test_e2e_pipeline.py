"""Full-chain test (BASELINE config #5 shape, downloads excluded): encode
synthetic videos with the native libav tool -> ingest into stores -> AVDataset
batches -> jitted fusion train steps -> separator eval. One continuous path
over real (decoded) video data."""

import json
import subprocess

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maavss_tpu.config import RunConfig
from maavss_tpu.data.audio_memmap import AudioMemmap
from maavss_tpu.data.dataset import AVDataset, batches
from maavss_tpu.data.frame_shards import FrameShardStore
from maavss_tpu.models.fusion import AVFusionModel
from maavss_tpu.train.infer import make_separator
from maavss_tpu.train.state import create_train_state, make_optimizer
from maavss_tpu.train.steps import make_fusion_step

CFG = RunConfig(num_frames=4, num_seq=4, hops_per_frame=4, fft_len=64,
                p_size=16, frame_hop=2, framerate=30, latent_chan=8,
                fc_size=256, batch_size=2, learning_rate=1e-3)


@pytest.fixture(scope="module")
def stores(tmp_path_factory):
    from tools.ingest import ingest_tree, native_bin

    if native_bin() is None:
        pytest.skip("native ingest tool not buildable here")
    d = tmp_path_factory.mktemp("e2e")
    raw = d / "raw"
    raw.mkdir()
    for i in range(2):
        out = subprocess.run(
            [native_bin(), "synth", str(raw / f"v{i}.avi"), "40", "30", "64",
             "16000"], capture_output=True, text=True, check=True)
        assert json.loads(out.stdout)["frames"] == 40
    ingest_tree(str(raw), str(d / "proc"), framesize=32, fps=30, sr=16000)
    return (FrameShardStore(str(d / "proc" / "frames")),
            AudioMemmap(str(d / "proc" / "audio")), d)


def test_train_and_separate_over_decoded_video(stores):
    frames, audio, d = stores
    ds = AVDataset(CFG, frames, audio, CFG.num_frames + CFG.num_seq,
                   cache_dir=str(d / "cc"))
    assert len(ds) >= CFG.batch_size
    it = batches(ds, CFG.batch_size, seed=0)

    t_stft = CFG.hops_per_frame * CFG.num_frames
    model = AVFusionModel(
        stft_shape=(CFG.batch_size, 2, t_stft, CFG.fft_len // 2),
        pgram_shape=(CFG.batch_size, 1, CFG.num_frames, CFG.p_size**2),
        latent_channels=CFG.latent_chan, fc_size=CFG.fc_size)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros(model.stft_shape),
                           jnp.zeros(model.pgram_shape), method=model.init_all)
    state = create_train_state(variables, make_optimizer(CFG.learning_rate))
    step = make_fusion_step(model, CFG)

    losses = []
    for i in range(4):
        state, metrics = step(state, next(it), jax.random.PRNGKey(i),
                              jnp.int32(2))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses), losses

    out = make_separator(model, CFG)(state, next(it), jax.random.PRNGKey(9))
    assert out["audio_out"].shape[0] == CFG.batch_size
    assert np.all(np.isfinite(np.asarray(out["audio_out"])))
    assert np.all(np.isfinite(np.asarray(out["si_sdr"])))
