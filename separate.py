#!/usr/bin/env python
"""Separate an arbitrary-length audio file with a trained fusion model.

New user-facing capability (the reference ships only two example output wavs,
audio/example_*.wav — it has no inference CLI at all): reads a wav of any
length, tiles it into clip-sized segments, runs the compiled separator
(train/infer.py) over batches of tiles on the accelerator, stitches the
separated audio back together, and writes the result. Optionally consumes an
ingested frame-shard store for the visual stream (zeros = audio-only
separation, which the modality curriculum trains the model to handle).

Usage:
  python separate.py --audio mix.wav --out separated.wav -c          # latest ckpt
  python separate.py --audio mix.wav --frames data/proc/frames --out sep.wav \
      --checkpoint checkpoints/run.ckpt.pkl
  python separate.py --audio mix.wav --out sep.wav --reference clean.wav  # + SI-SDR

Prints one JSON summary line.
"""

from __future__ import annotations

import json
import sys

import numpy as np


def main() -> None:
    import argparse

    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--audio", required=True)
    pre.add_argument("--out", required=True)
    pre.add_argument("--frames", default=None,
                     help="ingested frame-shard dir for the visual stream")
    pre.add_argument("--reference", default=None,
                     help="clean wav to score SI-SDR against")
    own, rest = pre.parse_known_args()

    from maavss_tpu.config import model_args

    cfg = model_args(rest)

    import jax
    import jax.numpy as jnp

    from maavss_tpu.data.wavio import read_wav, write_wav
    from maavss_tpu.exp.checkpoint import load_checkpoint
    from maavss_tpu.ops.audio import mono_mix
    from maavss_tpu.ops.metrics import si_sdr
    from maavss_tpu.train.infer import make_separator
    from maavss_tpu.train.setup import build_fusion, init_runtime

    init_runtime()
    audio, sr = read_wav(own.audio)
    audio = np.asarray(mono_mix(jnp.asarray(audio)))
    if sr != cfg.samplerate:
        raise SystemExit(f"{own.audio}: sample rate {sr} != --samplerate "
                         f"{cfg.samplerate}; resample during ingest "
                         f"(tools/ingest.py) or pass --samplerate {sr}")

    t_total = cfg.num_frames + cfg.num_seq
    s_total = cfg.hop * cfg.hops_per_frame * t_total
    n = audio.shape[-1]
    n_tiles = max(1, -(-n // s_total))
    padded = np.zeros(n_tiles * s_total, np.float32)
    padded[:n] = audio[:n_tiles * s_total]
    tiles = padded.reshape(n_tiles, s_total)

    fsize = cfg.p_size
    frames = np.zeros((n_tiles, t_total, fsize, fsize), np.float32)
    if own.frames:
        from maavss_tpu.data.frame_shards import FrameShardStore

        store = FrameShardStore(own.frames)
        # align video frames to audio tiles: tile k spans frames
        # [k*t_total, (k+1)*t_total) of the first video at cfg.framerate
        vid = 0
        total = store.num_frames(vid)
        for k in range(n_tiles):
            lo = k * t_total
            idx = np.clip(np.arange(lo, lo + t_total), 0, max(0, total - 1))
            fr = store.read(vid, idx).astype(np.float32) / 255.0
            if fr.shape[-1] != fsize:
                from maavss_tpu.ops.image import resize_bilinear

                fr = np.asarray(resize_bilinear(jnp.asarray(fr), (fsize, fsize)))
            frames[k] = fr

    # the separator reuses the training-time denoising setup (input = STFT +
    # N(0, noise_scalar)); when separating a user's real mixture no synthetic
    # noise must be injected — zero it unless explicitly requested
    if not any(a == "--noise_scalar" or a.startswith("--noise_scalar=")
               for a in rest):
        cfg = cfg.replace(noise_scalar=0.0)

    b = cfg.batch_size
    model, state = build_fusion(cfg, b)
    if cfg.c or cfg.checkpoint:
        state, _ = load_checkpoint(cfg.cp_dir, state, auto=cfg.c,
                                   path=cfg.checkpoint)
    separate = make_separator(model, cfg)

    out = np.zeros_like(padded)
    pad_tiles = (-n_tiles) % b
    if pad_tiles:  # pad the last batch to the compiled batch size
        tiles = np.concatenate([tiles, np.zeros((pad_tiles, s_total), np.float32)])
        frames = np.concatenate([frames, np.zeros((pad_tiles, t_total, fsize, fsize), np.float32)])
    for k0 in range(0, n_tiles + pad_tiles, b):
        batch = {"audio": jnp.asarray(tiles[k0:k0 + b]),
                 "frames": jnp.asarray(frames[k0:k0 + b])}
        res = separate(state, batch, jax.random.PRNGKey(cfg.seed))
        got = np.asarray(res["audio_out"])
        for j in range(b):
            k = k0 + j
            if k < n_tiles:
                out[k * s_total:(k + 1) * s_total] = got[j]
    out = out[:n]
    write_wav(own.out, out, cfg.samplerate)

    summary = {"out": own.out, "n_samples": int(n), "tiles": int(n_tiles),
               "tile_samples": int(s_total), "sr": cfg.samplerate}
    if own.reference:
        ref, _ = read_wav(own.reference)
        ref = np.asarray(mono_mix(jnp.asarray(ref)))[:n]
        summary["si_sdr"] = float(si_sdr(jnp.asarray(out[: ref.shape[-1]]),
                                         jnp.asarray(ref)))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
