#!/usr/bin/env python
"""Long-run separation quality curve: train the fusion (or frames) regime and
log eval SI-SDR every N steps, in ONE process (repeated CLI relaunches cost
~100 s of relay init each on the axon chip).

Produces the quality-vs-steps table BASELINE.md's round-3 section cites
(VERDICT r2 item 9): the reference's own published examples score -0.99 /
+4.67 dB SI-SDR (BASELINE.md), so the curve is read against that band. Real
MUSICES data remains environment-blocked (zero egress); the synthetic fixture
store is the documented stand-in.

Usage:
  python tools/quality_curve.py --steps 10000 --eval_every 500 --mask_head \
      --out runs/quality_r3/mask.jsonl -b 32 -lr 1e-3 --data_path synthetic:8
  python tools/quality_curve.py --regime frames ...   # final model family

All other flags are the standard RunConfig surface. Training mode is pinned
to AV (the separator's distribution — random01/cycle poison BatchNorm stats,
docs/STATUS.md round 2 item 8).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--regime", choices=("fusion", "frames"), default="fusion")
    pre.add_argument("--steps", type=int, default=10000)
    pre.add_argument("--eval_every", type=int, default=500)
    pre.add_argument("--eval_batches", type=int, default=2)
    pre.add_argument("--out", default="runs/quality_curve.jsonl")
    own, rest = pre.parse_known_args()

    from maavss_tpu.config import model_args

    cfg = model_args(rest)
    if cfg.lr_schedule != "constant" or cfg.noise_schedule:
        # schedule horizons are epochs*steps_per_epoch (train/setup.py:
        # resolve_lr / resolve_noise_schedule); pin to this run's step count
        cfg = cfg.replace(epochs=1, steps_per_epoch=own.steps)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from maavss_tpu.data.dataset import AVDataset, split_train_val
    from maavss_tpu.train.infer import make_frames_separator, make_separator
    from maavss_tpu.train.setup import (
        build_frames_model,
        build_fusion,
        init_runtime,
        load_pgram_store,
        load_stores,
        make_stream,
    )
    from maavss_tpu.train.steps import make_frames_step, make_fusion_step

    init_runtime()
    frames, audio = load_stores(cfg)
    dataset = AVDataset(cfg, frames, audio, cfg.num_frames + cfg.num_seq,
                        pgrams=None if own.regime == "frames"
                        else load_pgram_store(cfg))
    tr_idx, va_idx = split_train_val(len(dataset), cfg.split, cfg.seed)
    if len(va_idx) < cfg.batch_size:
        va_idx = np.arange(len(dataset))

    if own.regime == "frames":
        frame_size = dataset[0]["frames"].shape[-1]
        model, state = build_frames_model(cfg, cfg.batch_size, frame_size)
        step = make_frames_step(model, cfg)
        separate = make_frames_separator(model, cfg)
    else:
        model, state = build_fusion(cfg, cfg.batch_size)
        step = make_fusion_step(model, cfg, window_mode=cfg.window_mode)
        separate = make_separator(model, cfg)

    train_it = make_stream(cfg, dataset, tr_idx, None, cfg.seed)
    val_it = make_stream(cfg, dataset, va_idx, None, cfg.seed + 1)
    val_batches = [next(val_it) for _ in range(own.eval_batches)]

    os.makedirs(os.path.dirname(own.out) or ".", exist_ok=True)
    fh = open(own.out, "a", buffering=1)
    rng = jax.random.PRNGKey(cfg.seed)
    mode = jnp.int32(2)  # AV — the separator's distribution
    # --mode_schedule random:<pa>,<pv>,<pav>: weighted PER-STEP modality
    # dropout on top of the AV anchor (mode is a traced scalar — no
    # recompile). cycle/random01 stay unsupported here: their long
    # zeroed-modality phases poison BatchNorm running stats for the
    # separation eval (docs/STATUS.md round 2 item 8); a mostly-AV weighted
    # draw is the curriculum form this curve can evaluate fairly.
    mode_probs = None
    if cfg.mode_schedule and cfg.mode_schedule.startswith("random:"):
        ws = np.asarray([float(x) for x in
                         cfg.mode_schedule[len("random:"):].split(",")])
        mode_probs = ws / ws.sum()
    elif cfg.mode_schedule and cfg.mode_schedule != "fixed":
        raise SystemExit("quality_curve supports --mode_schedule fixed or "
                         "random:<pa>,<pv>,<pav> (see comment)")
    np_rng = np.random.default_rng(cfg.seed)

    def evaluate(at_step):
        sdrs, gains = [], []
        for i, vb in enumerate(val_batches):
            out = separate(state, vb, jax.random.PRNGKey(cfg.seed + 100 + i))
            sdrs.extend(np.asarray(out["si_sdr"]).tolist())
            gains.extend(np.asarray(out["si_sdr_gain"]).tolist())
        rec = {"step": at_step, "si_sdr": float(np.mean(sdrs)),
               "si_sdr_gain": float(np.mean(gains)), "n_clips": len(sdrs),
               "ts": time.time()}
        fh.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)
        return rec

    from maavss_tpu.train.setup import resolve_noise_schedule

    noise_fn = resolve_noise_schedule(cfg)

    evaluate(0)
    t0 = time.perf_counter()
    loss = float("nan")
    for s in range(1, own.steps + 1):
        rng, sub = jax.random.split(rng)
        m = (mode if mode_probs is None
             else jnp.int32(np_rng.choice(3, p=mode_probs)))
        if noise_fn is not None:
            state, metrics = step(state, next(train_it), sub, m,
                                  jnp.float32(noise_fn(s - 1)))
        else:
            state, metrics = step(state, next(train_it), sub, m)
        if s % own.eval_every == 0:
            loss = float(metrics["loss"])  # fetch-closes the segment
            rec = evaluate(s)
            rec.update(loss=loss, wall_s=round(time.perf_counter() - t0, 1))
            print(f"step {s}/{own.steps} loss {loss:.6f} "
                  f"si_sdr {rec['si_sdr']:.2f} dB", flush=True)
    final = evaluate(own.steps)
    print(json.dumps({"final": final, "loss": loss,
                      "wall_s": round(time.perf_counter() - t0, 1),
                      "regime": own.regime, "mask_head": cfg.mask_head}))


if __name__ == "__main__":
    main()
