"""Inference: separation + SI-SDR evaluation.

The reference has no eval path at all (BASELINE.md: no SI-SDR anywhere); the
framework ships its own, since SI-SDR parity is the fidelity target. The
separator runs the fusion model over every sliding window of a clip, applies
the predicted STFT (complex-mask semantics: the model regresses the clean
complex STFT directly, avse_model.py:680-711), and resynthesizes audio via
the exact-inverse iSTFT (maavss_tpu/ops/stft.py).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from maavss_tpu.config import RunConfig
from maavss_tpu.ops.metrics import si_sdr
from maavss_tpu.ops.phasegram import phasegram_window
from maavss_tpu.ops.stft import istft_features
from maavss_tpu.train.steps import _pflat_from_batch, _prep_stft_pair, _vis_frames
from maavss_tpu.train.state import TrainState


def make_frames_separator(model, cfg: RunConfig):
    """Compiled separator for the frames model (AVFusionFramesModel) over
    batch = {'audio': [B, S_total], 'frames': [B, T_total, H, W]} at raw
    attention-frame resolution.

    The final model predicts only the middle frame's `hops_per_frame` STFT
    columns per window (avse_model_final.py:203-213, train_avse_frames.py:105),
    so the sweep stitches each window's predicted middle columns into the
    (noisy) full spectrogram — columns outside the covered band fall back to
    the input mixture — then resynthesizes. STFT keeps the Nyquist bin
    (trim_end=False) per the final model's geometry.
    """
    a, nf, ns = cfg.hops_per_frame, cfg.num_frames, cfg.num_seq
    idx_middle = (ns - 1) // 2
    encode = getattr(cfg, "frames_encode", "window")

    @jax.jit
    def separate(state: TrainState, batch, rng: jax.Array) -> Dict[str, jnp.ndarray]:
        # identical feature prep to make_frames_step (polar / per-example
        # max-norm flags included) — a model trained with --use_polar or
        # --normalize_output_fft must be evaluated on matching features,
        # and one trained with --frames_encode full must see full-sequence
        # temporal context here too (same windowing deviation as training)
        x_full, y_full = _prep_stft_pair(
            batch["audio"], cfg, rng, trim_end=False,
            max_norm=cfg.normalize_output_fft)
        frames = _vis_frames(batch, cfg)[:, :, None]  # [B,T,1,H,W]
        variables = {"params": state.params, "batch_stats": state.batch_stats}

        if encode == "full":
            v_lat = model.apply(
                variables, jnp.transpose(frames, (0, 2, 1, 3, 4)),
                train=False, method=model.encode_frames)  # [B,C,T,S]

            def body(yh_full, j):
                lat = jax.lax.dynamic_slice_in_dim(v_lat, j, nf, axis=2)
                xs = jax.lax.dynamic_slice_in_dim(x_full, j * a, nf * a, axis=2)
                yh_mid, _, _ = model.apply(
                    variables, xs, lat, train=False,
                    method=model.forward_with_visual_latent)  # [B,2,a,F]
                return jax.lax.dynamic_update_slice_in_dim(
                    yh_full, yh_mid.astype(yh_full.dtype),
                    (j + idx_middle) * a, axis=2), None
        else:
            def body(yh_full, j):
                fr = jax.lax.dynamic_slice_in_dim(frames, j, nf, axis=1)
                x_v = jnp.transpose(fr, (0, 2, 1, 3, 4))  # [B,1,nf,H,W]
                xs = jax.lax.dynamic_slice_in_dim(x_full, j * a, nf * a, axis=2)
                yh_mid, _, _ = model.apply(
                    variables, xs, x_v, train=False)  # [B,2,a,F]
                yh_full = jax.lax.dynamic_update_slice_in_dim(
                    yh_full, yh_mid.astype(yh_full.dtype),
                    (j + idx_middle) * a, axis=2)
                return yh_full, None

        yh_full, _ = jax.lax.scan(body, x_full, jnp.arange(ns))

        length = batch["audio"].shape[-1]
        yh_audio = istft_features(yh_full, cfg.fft_len, cfg.hop,
                                  normalized=cfg.normalize_fft, trim_end=False,
                                  polar=cfg.use_polar, length=length)
        x_audio = istft_features(x_full, cfg.fft_len, cfg.hop,
                                 normalized=cfg.normalize_fft, trim_end=False,
                                 polar=cfg.use_polar, length=length)
        sdr_out = si_sdr(yh_audio, batch["audio"])
        sdr_in = si_sdr(x_audio, batch["audio"])
        return {"audio_out": yh_audio, "audio_in": x_audio,
                "si_sdr": sdr_out, "si_sdr_noisy": sdr_in,
                "si_sdr_gain": sdr_out - sdr_in}

    return separate


def make_separator(model, cfg: RunConfig):
    """Compiled `separate(state, batch, rng) -> dict` over
    batch = {'audio': [B, S_total], 'frames': [B, T_total, p, p]}.

    Denoising setup mirrors training: input = clean STFT + noise; output
    audio comes from the model's predicted complex STFT, inverted window by
    window and overlap-averaged on the shared hops.

    `--fusion_encode full` changes the feature construction (conv temporal
    context at window seams, full-span phasegram finishing — see
    train/steps.py:make_fusion_step), so a model trained that way is
    separated that way too: both encoders run ONCE over the full span, the
    ns latent windows batch through the heads in one apply (~2.9x less
    encoder input AND ns head applies -> 1, same move as the frames
    family's full-encode separator above).
    """
    a, nf, ns = cfg.hops_per_frame, cfg.num_frames, cfg.num_seq
    encode = getattr(cfg, "fusion_encode", "window")
    if encode == "full":
        from maavss_tpu.train.steps import _fusion_full_geometry
        hop_a, hop_v, t_win = _fusion_full_geometry(model, cfg)

    @jax.jit
    def separate(state: TrainState, batch, rng: jax.Array) -> Dict[str, jnp.ndarray]:
        # identical feature prep to make_fusion_step (incl. per-example
        # max-norm under --normalize_output_fft)
        x_full, y_full = _prep_stft_pair(
            batch["audio"], cfg, rng, trim_end=True,
            max_norm=cfg.normalize_output_fft)
        p_flat = _pflat_from_batch(batch, cfg)  # frames or --pgram_cache rows
        variables = {"params": state.params, "batch_stats": state.batch_stats}

        t_total = y_full.shape[2]
        acc = jnp.zeros_like(y_full)
        cnt = jnp.zeros((1, 1, t_total, 1), y_full.dtype)

        if encode == "full":
            bsz = x_full.shape[0]
            x_used = jax.lax.slice_in_dim(x_full, 0, (nf + ns - 1) * a, axis=2)
            pg_full = phasegram_window(p_flat[:, :nf + ns - 1])
            a_lat, v_lat = model.apply(variables, x_used, pg_full,
                                       train=False, method=model.encode_both)

            def wins(full, axis, hop, width):
                st = jnp.stack(
                    [jax.lax.slice_in_dim(full, j * hop, j * hop + width,
                                          axis=axis)
                     for j in range(ns)], axis=1)  # [B, ns, ...]
                return st.reshape((-1,) + st.shape[2:])

            yh_b, _, _ = model.apply(
                variables, wins(a_lat, 2, hop_a, t_win),
                wins(v_lat, 2, hop_v, t_win), wins(x_full, 2, a, nf * a),
                train=False, method=model.heads_from_latents)
            yh_wins = yh_b.reshape((bsz, ns) + yh_b.shape[1:])

            def body(carry, j):
                acc, cnt = carry
                yh = jax.lax.dynamic_index_in_dim(yh_wins, j, axis=1,
                                                  keepdims=False)
                acc = jax.lax.dynamic_update_slice_in_dim(
                    acc, jax.lax.dynamic_slice_in_dim(
                        acc, j * a, nf * a, axis=2) + yh.astype(acc.dtype),
                    j * a, axis=2)
                ones = jnp.ones((1, 1, nf * a, 1), cnt.dtype)
                cnt = jax.lax.dynamic_update_slice_in_dim(
                    cnt, jax.lax.dynamic_slice_in_dim(
                        cnt, j * a, nf * a, axis=2) + ones,
                    j * a, axis=2)
                return (acc, cnt), None
        else:
            def body(carry, j):
                acc, cnt = carry
                pw = jax.lax.dynamic_slice_in_dim(p_flat, j, nf, axis=1)
                pg = phasegram_window(pw)
                xs = jax.lax.dynamic_slice_in_dim(x_full, j * a, nf * a, axis=2)
                yh, _, _ = model.apply(variables, xs, pg, train=False)
                acc = jax.lax.dynamic_update_slice_in_dim(
                    acc, jax.lax.dynamic_slice_in_dim(
                        acc, j * a, nf * a, axis=2) + yh,
                    j * a, axis=2)
                ones = jnp.ones((1, 1, nf * a, 1), cnt.dtype)
                cnt = jax.lax.dynamic_update_slice_in_dim(
                    cnt, jax.lax.dynamic_slice_in_dim(
                        cnt, j * a, nf * a, axis=2) + ones,
                    j * a, axis=2)
                return (acc, cnt), None

        (acc, cnt), _ = jax.lax.scan(body, (acc, cnt), jnp.arange(ns))
        yh_full = acc / jnp.maximum(cnt, 1.0)

        length = batch["audio"].shape[-1]
        yh_audio = istft_features(yh_full, cfg.fft_len, cfg.hop,
                                  normalized=cfg.normalize_fft, trim_end=True,
                                  polar=cfg.use_polar, length=length)
        x_audio = istft_features(x_full, cfg.fft_len, cfg.hop,
                                 normalized=cfg.normalize_fft, trim_end=True,
                                 polar=cfg.use_polar, length=length)
        sdr_out = si_sdr(yh_audio, batch["audio"])
        sdr_in = si_sdr(x_audio, batch["audio"])
        return {"audio_out": yh_audio, "audio_in": x_audio,
                "si_sdr": sdr_out, "si_sdr_noisy": sdr_in,
                "si_sdr_gain": sdr_out - sdr_in}

    return separate
