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
    serving_input_specs,
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
    a_spec, v_spec = serving_input_specs(cfg, cfg.batch_size)
    rng = np.random.default_rng(seed)
    audio = rng.standard_normal(a_spec.shape).astype(a_spec.dtype)
    visual = (rng.standard_normal(v_spec.shape) * 0.1).astype(v_spec.dtype)
    return audio, visual


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
