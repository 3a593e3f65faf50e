#!/usr/bin/env python
"""Separation evaluation: SI-SDR + separated-wav export.

New capability the reference lacks (its only "evaluation" is two example wavs,
audio/example_{1,2}_{output,ground_truth}.wav): runs a trained fusion model
over held-out clips, reports SI-SDR of the separated audio vs ground truth
(and the gain over the noisy input), and writes wav pairs like the
reference's examples. Prints one JSON summary line.

Usage: python evaluate.py --data_path synthetic -c   (resume latest checkpoint)
       python evaluate.py --model frames ...         (AVFusionFramesModel:
           stitches each window's predicted middle-frame STFT columns into
           the mixture spectrogram — the final model's regime)
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np

from maavss_tpu.config import model_args
from maavss_tpu.data.dataset import AVDataset, Subset, batches, split_train_val
from maavss_tpu.exp.checkpoint import load_checkpoint
from maavss_tpu.exp.viz import save_audio
from maavss_tpu.train.infer import make_frames_separator, make_separator
from maavss_tpu.train.setup import (
    build_frames_model,
    build_fusion,
    init_runtime,
    load_pgram_store,
    load_stores,
)


def compare_wavs(est_path: str, ref_path: str) -> None:
    """SI-SDR/SDR between two wav files (e.g. a separated output vs its
    ground truth — the reference's audio/example_*_{output,ground_truth}.wav
    pairs can be scored this way). Prints one JSON line."""
    import jax.numpy as jnp

    from maavss_tpu.data.wavio import read_wav
    from maavss_tpu.ops.metrics import sdr as sdr_fn, si_sdr

    est, sr1 = read_wav(est_path)
    ref, sr2 = read_wav(ref_path)
    n = min(est.shape[-1], ref.shape[-1])
    e = jnp.asarray(est[0, :n])
    r = jnp.asarray(ref[0, :n])
    print(json.dumps({
        "si_sdr": float(si_sdr(e, r)), "sdr": float(sdr_fn(e, r)),
        "n_samples": int(n), "sr": [sr1, sr2],
        "est": est_path, "ref": ref_path,
    }))


def main() -> None:
    import argparse

    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--compare", nargs=2, metavar=("EST", "REF"), default=None,
                     help="score SI-SDR/SDR between two wav files and exit")
    pre.add_argument("--model", choices=("fusion", "frames"), default="fusion")
    own, rest = pre.parse_known_args()
    if own.compare is not None:
        compare_wavs(own.compare[0], own.compare[1])
        return
    model_kind = own.model
    cfg = model_args(rest)
    init_runtime()
    frames, audio = load_stores(cfg)
    dataset = AVDataset(cfg, frames, audio, cfg.num_frames + cfg.num_seq,
                        pgrams=None if model_kind == "frames"
                        else load_pgram_store(cfg))
    _, va_idx = split_train_val(len(dataset), cfg.split, cfg.seed)
    val = Subset(dataset, va_idx if len(va_idx) >= cfg.batch_size else
                 np.arange(len(dataset)))

    if model_kind == "frames":
        frame_size = dataset[0]["frames"].shape[-1]
        model, state = build_frames_model(cfg, cfg.batch_size, frame_size)
        separate_fn = make_frames_separator
    else:
        model, state = build_fusion(cfg, cfg.batch_size)
        separate_fn = make_separator
    if cfg.c or cfg.checkpoint:
        state, _ = load_checkpoint(cfg.cp_dir, state, auto=cfg.c,
                                   path=cfg.checkpoint)
    separate = separate_fn(model, cfg)

    it = batches(val, cfg.batch_size, shuffle=False)
    sdrs, gains = [], []
    out_dir = os.path.join(cfg.log_dir, "separated")
    for i in range(max(1, cfg.val_steps)):
        batch = next(it)
        out = separate(state, batch, jax.random.PRNGKey(cfg.seed + i))
        sdrs.extend(np.asarray(out["si_sdr"]).tolist())
        gains.extend(np.asarray(out["si_sdr_gain"]).tolist())
        if i == 0:  # example pair export (reference audio/ dir parity)
            for b in range(min(2, len(out["audio_out"]))):
                save_audio(os.path.join(out_dir, f"example_{b+1}_output.wav"),
                           np.asarray(out["audio_out"][b]), cfg.samplerate)
                save_audio(os.path.join(out_dir, f"example_{b+1}_ground_truth.wav"),
                           np.asarray(batch["audio"][b]), cfg.samplerate)
    print(json.dumps({"si_sdr_mean": float(np.mean(sdrs)),
                      "si_sdr_gain_mean": float(np.mean(gains)),
                      "n_clips": len(sdrs), "wav_dir": out_dir}))


if __name__ == "__main__":
    main()
