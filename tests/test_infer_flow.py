"""Separator (SI-SDR eval path) and optical-flow op tests."""

import numpy as np

import jax
import jax.numpy as jnp

from maavss_tpu.config import RunConfig
from maavss_tpu.data.synthetic import moving_blob_frames, synthetic_av_batch
from maavss_tpu.models.fusion import AVFusionModel
from maavss_tpu.ops.flow import clip_flow, flow_magnitude
from maavss_tpu.train.infer import make_separator
from maavss_tpu.train.state import create_train_state, make_optimizer

CFG = RunConfig(num_frames=4, num_seq=4, hops_per_frame=4, fft_len=64, p_size=16,
                latent_chan=8, fc_size=256, batch_size=2, noise_scalar=0.05)


def test_separator_shapes_and_metrics():
    cfg = CFG
    t_stft = cfg.hops_per_frame * cfg.num_frames
    model = AVFusionModel(
        stft_shape=(cfg.batch_size, 2, t_stft, cfg.fft_len // 2),
        pgram_shape=(cfg.batch_size, 1, cfg.num_frames, cfg.p_size**2),
        latent_channels=cfg.latent_chan, fc_size=cfg.fc_size)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros(model.stft_shape),
                           jnp.zeros(model.pgram_shape), method=model.init_all)
    state = create_train_state(variables, make_optimizer(1e-3))
    separate = make_separator(model, cfg)
    batch = synthetic_av_batch(cfg, cfg.batch_size, seed=0)
    out = separate(state, batch, jax.random.PRNGKey(0))
    assert out["audio_out"].shape == batch["audio"].shape
    assert np.all(np.isfinite(np.asarray(out["audio_out"])))
    assert out["si_sdr"].shape == (cfg.batch_size,)
    # untrained model should NOT beat the noisy input; the metric plumbing
    # still must produce finite numbers for both
    assert np.all(np.isfinite(np.asarray(out["si_sdr_gain"])))


def test_sisdr_of_noisy_input_sane():
    """The separator's si_sdr_noisy reflects the actual noise level.

    Geometry needs real window overlap (hop < fft_len) to be invertible —
    sr=8000, fps=30, a=4 gives hop=66 with fft_len=128. Reconstruction is
    then limited only by the reference's trim-last-frame/Nyquist semantics
    (~17 dB), not by the iSTFT itself (>100 dB untrimmed, see test_stft)."""
    cfg = CFG.replace(noise_scalar=0.0, samplerate=8000, fft_len=128)
    t_stft = cfg.hops_per_frame * cfg.num_frames
    model = AVFusionModel(
        stft_shape=(cfg.batch_size, 2, t_stft, cfg.fft_len // 2),
        pgram_shape=(cfg.batch_size, 1, cfg.num_frames, cfg.p_size**2),
        latent_channels=cfg.latent_chan, fc_size=cfg.fc_size)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros(model.stft_shape),
                           jnp.zeros(model.pgram_shape), method=model.init_all)
    state = create_train_state(variables, make_optimizer(1e-3))
    out = make_separator(model, cfg)(
        state, synthetic_av_batch(cfg, cfg.batch_size, seed=1),
        jax.random.PRNGKey(0))
    # zero noise -> reconstruction limited only by the trim semantics
    assert float(np.min(np.asarray(out["si_sdr_noisy"]))) > 10.0


class TestFlow:
    def test_moving_blob_flow_direction(self):
        # blob moves downward -> dominant positive dy at the blob
        fr = np.zeros((1, 2, 32, 32), np.float32)
        yy, xx = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
        fr[0, 0] = np.exp(-((yy - 12) ** 2 + (xx - 16) ** 2) / 18.0)
        fr[0, 1] = np.exp(-((yy - 15) ** 2 + (xx - 16) ** 2) / 18.0)
        flow = np.asarray(clip_flow(jnp.asarray(fr), window=9))
        assert flow.shape == (1, 2, 2, 32, 32)
        assert np.allclose(flow[:, 0], 0)  # first frame zero-padded
        dy = flow[0, 1, 0]
        core = dy[10:20, 12:20]
        assert core.mean() > 0.1, core.mean()

    def test_flow_magnitude_normalized(self):
        fr = moving_blob_frames(0, 2, 6, 32)
        mag = np.asarray(flow_magnitude(jnp.asarray(fr)))
        assert mag.shape == (2, 6, 32, 32)
        assert np.all(mag >= 0) and mag.max() <= 1.0 + 1e-5


def test_frames_separator_stitches_middle_windows():
    """make_frames_separator: predicted middle columns replace the mixture's;
    a zero-trained model must still produce finite audio + metrics, and with
    noise_scalar=0 the uncovered columns reproduce the clean mixture."""
    from maavss_tpu.models.fusion_frames import AVFusionFramesModel
    from maavss_tpu.train.infer import make_frames_separator

    cfg = CFG.replace(noise_scalar=0.1)
    b, fs = 2, 48
    t_stft = cfg.hops_per_frame * cfg.num_frames
    model = AVFusionFramesModel(
        stft_shape=(b, 2, t_stft, cfg.fft_len // 2 + 1),
        frame_shape=(b, 1, cfg.num_frames, fs, fs),
        hops_per_frame=cfg.hops_per_frame, latent_channels=8, fc_size=256)
    x_a = jnp.zeros(model.stft_shape, jnp.float32)
    x_v = jnp.zeros(model.frame_shape, jnp.float32)
    vs = model.init(jax.random.PRNGKey(0), x_a, x_v, method=model.init_all)
    state = create_train_state(vs, make_optimizer(1e-3, "adam"))

    batch = synthetic_av_batch(cfg, b, seed=0, frame_size=fs)
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    separate = make_frames_separator(model, cfg)
    out = separate(state, batch, jax.random.PRNGKey(1))
    assert out["audio_out"].shape == batch["audio"].shape
    for k in ("si_sdr", "si_sdr_noisy", "si_sdr_gain"):
        assert np.all(np.isfinite(np.asarray(out[k]))), k


def test_separate_cli_arbitrary_length(tmp_path):
    """separate.py: tile an arbitrary-length wav through the compiled
    separator and write the separated file (random weights: smoke +
    contract)."""
    import json
    import os
    import subprocess
    import sys

    from maavss_tpu.data.wavio import write_wav

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sr = 16000
    n = 3 * 4224 + 1234  # deliberately not a clip multiple
    rng = np.random.default_rng(0)
    wav = (0.1 * rng.standard_normal(n)).astype(np.float32)
    mix = str(tmp_path / "mix.wav")
    write_wav(mix, wav, sr)
    out = str(tmp_path / "sep.wav")

    env = dict(os.environ)
    env["PYTHONPATH"] = repo
    code = ("import jax; jax.config.update('jax_platforms','cpu');"
            "import runpy, sys; runpy.run_path('separate.py', run_name='__main__')")
    argv = ["separate.py", "--audio", mix, "--out", out, "--reference", mix,
            "--num_frames", "4", "--num_seq", "4", "-a", "4", "--fft_len", "64",
            "--p_size", "16", "--latent_chan", "8", "--fc_size", "256", "-b", "2"]
    r = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.argv = " + repr(argv) + ";" + code],
        cwd=repo, env=env, capture_output=True, text=True, timeout=540)
    assert r.returncode == 0, r.stderr[-2000:]
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    d = json.loads(line)
    assert d["n_samples"] == n and os.path.exists(out)
    assert np.isfinite(d["si_sdr"])

    from maavss_tpu.data.wavio import read_wav
    got, got_sr = read_wav(out)
    assert got_sr == sr and got.shape[-1] == n
