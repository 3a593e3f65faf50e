"""Head-to-head training parity: flax fusion model vs the torch twin.

The published fidelity target is "SI-SDR within 0.1 dB of the PyTorch
baseline" (BASELINE.json). This is the direct experiment: the torch twin
(benchmarks/torch_baseline.py — an independent torch implementation of the
same regime, driven by the same closed-form layer plans) and the flax
AVFusionModel are initialized with IDENTICAL weights (converted flax->torch),
trained on IDENTICAL synthetic batches with the product train step
(train/steps.py:make_fusion_step) vs the mirrored torch loop
(train.py:136-162 semantics), and compared on

  (a) per-step training losses — must track to fp tolerance, and
  (b) SI-SDR of the separated audio after training — must agree within
      0.1 dB (the BASELINE.json parity band). For (b) the torch twin is
      re-synced to the flax model's final params+stats first: after N
      independent fp32 optimizer steps the two weight sets have drifted
      chaotically (losses still track, outputs of a barely-trained net do
      not), so the 0.1 dB band is only a meaningful statement about the
      *separation path* — window sweep, model forward, overlap-average,
      iSTFT, SI-SDR — given one state, which is exactly what a user
      switching frameworks exercises.

noise_scalar=0 removes the only RNG the two frameworks cannot share (the
additive-noise draw); the objective stays non-trivial (reconstruction through
the fused bottleneck).

Known bounded deviation: flax BatchNorm running_var uses the biased batch
variance, torch the unbiased one — train-mode math (the losses here) is
identical; eval-mode (the separator) differs by O(1/(N-1)) per BN layer,
well inside the 0.1 dB band at these shapes.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from benchmarks.torch_baseline import (
    _build_torch_fusion,
    _torch_phasegram,
    load_flax_fusion_params,
)
from maavss_tpu.config import RunConfig
from maavss_tpu.data.synthetic import synthetic_av_batch
from maavss_tpu.models.fusion import AVFusionModel
from maavss_tpu.ops.metrics import si_sdr
from maavss_tpu.ops.stft import istft_features, stft_features
from maavss_tpu.train.infer import make_separator
from maavss_tpu.train.state import create_train_state, make_optimizer
from maavss_tpu.train.steps import make_fusion_step

CFG = RunConfig(num_frames=4, num_seq=4, hops_per_frame=4, fft_len=64,
                p_size=16, latent_chan=8, fc_size=256, learning_rate=1e-3,
                batch_size=4, noise_scalar=0.0)


def _torch_stft_features(audio, cfg):
    """torch mirror of ops/stft.stft_features (window-normalized, trim last
    time frame + Nyquist bin, [B,2,T,F]) — av_dataset.py:157-179 semantics."""
    window = torch.hamming_window(cfg.fft_len)  # periodic, reference default
    spec = torch.stft(audio, cfg.fft_len, hop_length=cfg.hop, window=window,
                      normalized=False, onesided=True, return_complex=True,
                      center=True, pad_mode="reflect")
    spec = spec / torch.sqrt(torch.sum(window**2))
    spec = spec[:, :-1, :-1]  # [B, F(trim), T(trim)]
    feats = torch.stack([spec.real, spec.imag], dim=1)  # [B,2,F,T]
    return feats.permute(0, 1, 3, 2).contiguous()  # [B,2,T,F]


def _build_pair():
    cfg = CFG
    t_stft = cfg.hops_per_frame * cfg.num_frames
    model = AVFusionModel(
        stft_shape=(cfg.batch_size, 2, t_stft, cfg.fft_len // 2),
        pgram_shape=(cfg.batch_size, 1, cfg.num_frames, cfg.p_size**2),
        latent_channels=cfg.latent_chan, fc_size=cfg.fc_size)
    x_a = jnp.zeros(model.stft_shape, jnp.float32)
    x_v = jnp.zeros(model.pgram_shape, jnp.float32)
    vs = model.init(jax.random.PRNGKey(0), x_a, x_v, method=model.init_all)

    tmodel, _, _ = _build_torch_fusion(cfg)
    load_flax_fusion_params(tmodel, vs["params"], vs["batch_stats"])
    return cfg, model, vs, tmodel


def test_forward_parity_identical_weights():
    cfg, model, vs, tmodel = _build_pair()
    rng = np.random.default_rng(7)
    xa = rng.standard_normal(model.stft_shape).astype(np.float32)
    xv = rng.standard_normal(model.pgram_shape).astype(np.float32)
    ya, yv, _ = model.apply({"params": vs["params"], "batch_stats": vs["batch_stats"]},
                            jnp.asarray(xa), jnp.asarray(xv))
    tmodel.eval()
    with torch.no_grad():
        tya, tyv, _ = tmodel(torch.as_tensor(xa), torch.as_tensor(xv))
    np.testing.assert_allclose(np.asarray(ya), tya.numpy(), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(yv), tyv.numpy(), rtol=1e-3, atol=1e-5)


def test_stft_frontend_parity():
    cfg = CFG
    audio = synthetic_av_batch(cfg, 2, seed=3)["audio"]
    ours = np.asarray(stft_features(jnp.asarray(audio), cfg.fft_len, cfg.hop,
                                    normalized=True, trim_end=True))
    theirs = _torch_stft_features(torch.as_tensor(audio), cfg).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-6)


def test_training_losses_track_and_si_sdr_within_band():
    cfg, model, vs, tmodel = _build_pair()
    a, nf, ns, coeff = cfg.hops_per_frame, cfg.num_frames, cfg.num_seq, cfg.loss_coeff

    # --- flax: the product train step
    state = create_train_state(vs, make_optimizer(cfg.learning_rate, "adam"))
    step = make_fusion_step(model, cfg)
    batch_np = synthetic_av_batch(cfg, cfg.batch_size, seed=11)
    # Broadband-noise the frames: the phasegram takes angle() of the frame
    # FFT, and for *smooth* blob frames the high-frequency coefficients are
    # ~1e-12 — their phase is numerically arbitrary, so jnp's and torch's
    # FFTs legitimately disagree by ±pi there (measured: 0.5 max diff on
    # clean blobs, 2e-7 with noise). Real attention frames are broadband;
    # conditioning the fixture keeps this a parity test, not an FFT-noise one.
    fr_rng = np.random.default_rng(99)
    batch_np["frames"] = np.clip(
        batch_np["frames"] + 0.1 * fr_rng.standard_normal(
            batch_np["frames"].shape).astype(np.float32), 0.0, 1.0)
    batch = jax.tree_util.tree_map(jnp.asarray, batch_np)
    rng = jax.random.PRNGKey(0)  # noise_scalar=0: the draw is multiplied by 0

    # --- torch: mirrored loop (train.py:136-162 semantics)
    tmodel.train()
    opt = torch.optim.Adam(tmodel.parameters(), lr=cfg.learning_rate)
    t_audio = torch.as_tensor(batch_np["audio"])
    t_frames = torch.as_tensor(batch_np["frames"])
    y_t = _torch_stft_features(t_audio, cfg)
    x_t = y_t.clone()
    mse_t = torch.nn.functional.mse_loss

    flax_losses, torch_losses = [], []
    n_steps = 8
    for _ in range(n_steps):
        state, metrics = step(state, batch, rng, jnp.int32(2))
        flax_losses.append(float(metrics["loss"]))

        opt.zero_grad()
        acc = 0.0
        for j in range(ns):
            pg = _torch_phasegram(t_frames[:, j:j + nf])
            xa = x_t[:, :, j * a:(j + nf) * a, :]
            ya = y_t[:, :, j * a:(j + nf) * a, :]
            yh_a, yh_v, _ = tmodel(xa, pg)
            loss = mse_t(yh_a, ya) + coeff * mse_t(yh_v, pg)
            (loss / ns).backward()
            acc += float(loss) / ns
        opt.step()
        torch_losses.append(acc)

    flax_losses = np.asarray(flax_losses)
    torch_losses = np.asarray(torch_losses)
    print("\nflax  losses:", np.array2string(flax_losses, precision=6))
    print("torch losses:", np.array2string(torch_losses, precision=6))
    print("max rel diff:", float(np.max(np.abs(flax_losses / torch_losses - 1))))
    # (a) losses track step by step to fp tolerance (identical data + init)
    np.testing.assert_allclose(flax_losses, torch_losses, rtol=7e-3)
    assert flax_losses[-1] < flax_losses[0]  # and both actually train

    # --- (b) separated-audio SI-SDR head-to-head, same final state
    separate = make_separator(model, cfg)
    out = separate(state, batch, rng)
    sdr_flax = float(jnp.mean(out["si_sdr"]))
    load_flax_fusion_params(tmodel, state.params, state.batch_stats)

    # torch separation mirroring train/infer.py: overlap-averaged windows,
    # inverted with OUR exact-inverse iSTFT (itself golden-tested vs torch)
    tmodel.eval()
    with torch.no_grad():
        t_total = y_t.shape[2]
        acc_spec = torch.zeros_like(y_t)
        cnt = torch.zeros(1, 1, t_total, 1)
        for j in range(ns):
            pg = _torch_phasegram(t_frames[:, j:j + nf])
            yh_a, _, _ = tmodel(x_t[:, :, j * a:(j + nf) * a, :], pg)
            acc_spec[:, :, j * a:(j + nf) * a, :] += yh_a
            cnt[:, :, j * a:(j + nf) * a, :] += 1
        yh_full = (acc_spec / cnt.clamp(min=1.0)).numpy()
    length = batch_np["audio"].shape[-1]
    yh_audio_t = istft_features(jnp.asarray(yh_full), cfg.fft_len, cfg.hop,
                                normalized=True, trim_end=True, length=length)
    sdr_torch = float(jnp.mean(si_sdr(yh_audio_t, jnp.asarray(batch_np["audio"]))))

    print(f"SI-SDR: flax {sdr_flax:.4f} dB, torch {sdr_torch:.4f} dB, "
          f"|diff| {abs(sdr_flax - sdr_torch):.5f} dB")
    assert abs(sdr_flax - sdr_torch) < 0.1, (
        f"SI-SDR parity violated: flax {sdr_flax:.4f} dB vs torch "
        f"{sdr_torch:.4f} dB")
