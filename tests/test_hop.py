from maavss_tpu.utils.hop import calc_hop_size
from maavss_tpu.config import RunConfig, model_args


def test_default_hop_math():
    # reference defaults: 16 kHz, 30 fps, a=8 (utilities.py:24-28)
    hop, audio_len, n_frames = calc_hop_size(8, 8, 30, 16000)
    assert hop == 66
    assert audio_len == 66 * 8 * 8 == 4224
    assert n_frames == 64


def test_hop_frames_alignment():
    # each video frame spans exactly hops_per_frame STFT frames
    for nf in (4, 6, 8, 12):
        hop, audio_len, n_frames = calc_hop_size(nf, 8, 30, 16000)
        assert n_frames == 8 * nf
        assert audio_len == hop * n_frames


def test_config_defaults_match_reference():
    cfg = RunConfig()
    # run_config.py:4-51 defaults
    assert cfg.batch_size == 4
    assert cfg.learning_rate == 1e-5
    assert cfg.loss_coeff == 0.001
    assert cfg.num_frames == 8 and cfg.num_seq == 4 and cfg.frame_hop == 2
    assert cfg.fft_len == 256 and cfg.hops_per_frame == 8
    assert cfg.p_size == 64 and cfg.fc_size == 4096 and cfg.latent_chan == 64
    assert cfg.hop == 66
    assert cfg.num_fft_frames == 64
    assert cfg.stft_bins == 128


def test_model_args_cli_parity():
    cfg = model_args(["-b", "8", "-lr", "0.001", "--num_frames", "6", "-a", "4", "-c"])
    assert cfg.batch_size == 8
    assert cfg.learning_rate == 0.001
    assert cfg.num_frames == 6
    assert cfg.hops_per_frame == 4
    assert cfg.c is True
