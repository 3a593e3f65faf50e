"""Serving export (exp/export.py): jax.export roundtrip + geometry guard.

The artifact must reproduce the live separator bit-for-bit on the same
backend (same StableHLO, same compiler) and refuse geometry-mismatched
configs at load time.
"""

import numpy as np
import pytest

import jax

from maavss_tpu.config import RunConfig
from maavss_tpu.exp.export import (
    export_separator,
    load_artifact,
    make_serving_fn,
    save_artifact,
)
from maavss_tpu.models.fusion import AVFusionModel

CFG = RunConfig(num_frames=4, num_seq=4, hops_per_frame=4, fft_len=64,
                p_size=16, latent_chan=8, fc_size=256, batch_size=2)


def _tiny_fusion(cfg):
    import jax.numpy as jnp

    t_stft = cfg.hops_per_frame * cfg.num_frames
    model = AVFusionModel(
        stft_shape=(cfg.batch_size, 2, t_stft, cfg.fft_len // 2),
        pgram_shape=(cfg.batch_size, 1, cfg.num_frames, cfg.p_size**2),
        latent_channels=cfg.latent_chan, fc_size=cfg.fc_size)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros(model.stft_shape),
                           jnp.zeros(model.pgram_shape), method=model.init_all)
    return model, variables


@pytest.fixture(scope="module")
def exported_tiny(tmp_path_factory):
    model, variables = _tiny_fusion(CFG)
    data = export_separator(model, CFG, variables, CFG.batch_size,
                            platforms=("cpu",))
    path = save_artifact(str(tmp_path_factory.mktemp("exp") / "sep"), data,
                         CFG, CFG.batch_size, ("cpu",), False)
    return model, variables, path


def _serving_inputs(cfg, seed=0):
    from maavss_tpu.exp.export import random_serving_inputs

    return random_serving_inputs(cfg, cfg.batch_size, seed=seed)


def test_export_roundtrip_matches_live(exported_tiny):
    model, variables, path = exported_tiny
    exported, meta = load_artifact(path, CFG)
    assert meta["geometry"]["fft_len"] == CFG.fft_len
    audio, visual = _serving_inputs(CFG)
    got = np.asarray(exported.call(variables["params"],
                                   variables["batch_stats"], audio, visual))
    want = np.asarray(make_serving_fn(model, CFG)(
        variables["params"], variables["batch_stats"], audio, visual))
    assert got.shape == audio.shape
    assert np.all(np.isfinite(got))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_export_is_noise_free_mixture_in(exported_tiny):
    """Serving semantics: the input IS the mixture — no noise injection.
    Same audio in, deterministic audio out (two calls bitwise equal)."""
    model, variables, path = exported_tiny
    exported, _ = load_artifact(path)
    audio, visual = _serving_inputs(CFG, seed=3)
    out1 = np.asarray(exported.call(variables["params"],
                                    variables["batch_stats"], audio, visual))
    out2 = np.asarray(exported.call(variables["params"],
                                    variables["batch_stats"], audio, visual))
    np.testing.assert_array_equal(out1, out2)


def test_geometry_mismatch_raises(exported_tiny):
    _, _, path = exported_tiny
    with pytest.raises(ValueError, match="geometry mismatch"):
        load_artifact(path, CFG.replace(fft_len=128))


def test_frames_serving_uint8_wire():
    """The frames serving spec ships uint8 frames (4x less request bytes;
    BASELINE.md round 3d serving table) and the serving fn converts on
    device (frames_f32) — the payload helper must produce a [0,255] uint8
    visual, and the pipeline must accept it end to end."""
    from maavss_tpu.exp.export import random_serving_inputs
    from maavss_tpu.train.setup import build_frames_model

    cfg = CFG.replace(num_frames=2, num_seq=2, framesize=24)
    model, state = build_frames_model(cfg, cfg.batch_size, cfg.framesize)
    audio, visual = random_serving_inputs(cfg, cfg.batch_size,
                                          frames_model=True)
    assert visual.dtype == np.uint8
    assert int(visual.max()) > 200  # correctly scaled, not all-zero
    fn = make_serving_fn(model, cfg, frames_model=True)
    out = np.asarray(fn(state.params, state.batch_stats, audio, visual))
    assert out.shape == audio.shape
    assert np.all(np.isfinite(out))
