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
    pre.add_argument("--anchor_file", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "eval_anchor.json"),
        help="committed eval-anchor pin (VERDICT r4 item 4)")
    pre.add_argument("--pin_anchor", action="store_true",
                     help="write the measured anchor to --anchor_file")
    pre.add_argument("--allow_anchor_drift", action="store_true",
                     help="downgrade an anchor mismatch to a loud relabel")
    own, rest = pre.parse_known_args()

    from maavss_tpu.config import model_args

    cfg = model_args(rest)
    if cfg.lr_schedule != "constant" or cfg.noise_schedule:
        # schedule horizons are epochs*steps_per_epoch (train/setup.py:
        # resolve_lr / resolve_noise_schedule); pin to this run's step count
        cfg = cfg.replace(epochs=1, steps_per_epoch=own.steps)

    import jax

    if os.environ.get("MAAVSS_QC_CPU"):
        # the axon site hook silently re-forces JAX_PLATFORMS=axon; this is
        # the only reliable CPU escape (CLAUDE.md). Used to pin/check the
        # eval anchor without holding the relay.
        jax.config.update("jax_platforms", "cpu")
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
    pg = None if own.regime == "frames" else load_pgram_store(cfg)
    dataset = AVDataset(cfg, frames, audio, cfg.num_frames + cfg.num_seq,
                        pgrams=pg)
    # --frames_halo extends TRAIN clips by 2k frames (window context); the
    # EVAL set stays at the standard clip length, so it is IDENTICAL to a
    # halo-0 run's eval set and the pinned anchor still applies.
    halo = cfg.frames_halo if own.regime == "frames" else 0
    train_ds = dataset if not halo else AVDataset(
        cfg, frames, audio, cfg.num_frames + cfg.num_seq + 2 * halo,
        pgrams=pg)
    tr_idx, va_idx = split_train_val(len(dataset), cfg.split, cfg.seed)
    if halo:
        tr_idx, _ = split_train_val(len(train_ds), cfg.split, cfg.seed)
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

    train_it = make_stream(cfg, train_ds, tr_idx, None, cfg.seed)
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
        sdrs, gains, noisy = [], [], []
        for i, vb in enumerate(val_batches):
            out = separate(state, vb, jax.random.PRNGKey(cfg.seed + 100 + i))
            sdrs.extend(np.asarray(out["si_sdr"]).tolist())
            gains.extend(np.asarray(out["si_sdr_gain"]).tolist())
            noisy.extend(np.asarray(out["si_sdr_noisy"]).tolist())
        rec = {"step": at_step, "si_sdr": float(np.mean(sdrs)),
               "si_sdr_gain": float(np.mean(gains)),
               "noisy_anchor": float(np.mean(noisy)), "n_clips": len(sdrs),
               "ts": time.time()}
        if anchor_drift:
            rec["anchor_drift"] = True
        fh.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)
        return rec

    # --- eval-anchor pin (VERDICT r4 item 4) -------------------------------
    # The noisy-mixture SI-SDR of the eval set is model-independent; it
    # drifted 4.22 -> 5.82 dB between the r3 and r4 code windows, voiding
    # cross-window quality comparisons. Pin it: the committed fixture stores
    # the anchor + a content hash of the eval batches for the canonical
    # recipe; any future run on that recipe either matches (comparable scale)
    # or refuses/relabels. Reference context: the denoising objective at
    # /root/reference/av_dataset.py:217-220.
    import hashlib

    h = hashlib.sha256()
    for vb in val_batches:
        for k in sorted(vb):
            h.update(np.ascontiguousarray(
                np.asarray(vb[k], dtype=np.float32)).tobytes())
    batch_sha = h.hexdigest()
    recipe = {"regime": own.regime, "data_path": cfg.data_path,
              "batch_size": cfg.batch_size, "eval_batches": own.eval_batches,
              "seed": cfg.seed, "split": cfg.split,
              "noise_scalar": cfg.noise_scalar, "fft_len": cfg.fft_len,
              "hop": cfg.hop, "use_polar": cfg.use_polar,
              "normalize_fft": cfg.normalize_fft,
              "normalize_output_fft": cfg.normalize_output_fft,
              "num_frames": cfg.num_frames, "num_seq": cfg.num_seq}
    anchor_drift = False
    pinned = None
    if os.path.exists(own.anchor_file) and not own.pin_anchor:
        with open(own.anchor_file) as f:
            pinned = json.load(f)
        if pinned.get("recipe") != recipe:
            print(f"[anchor] recipe differs from {own.anchor_file} — "
                  "anchor not enforced for this configuration", flush=True)
            pinned = None

    from maavss_tpu.train.setup import resolve_noise_schedule

    noise_fn = resolve_noise_schedule(cfg)

    rec0 = evaluate(0)
    if own.pin_anchor:
        os.makedirs(os.path.dirname(own.anchor_file) or ".", exist_ok=True)
        with open(own.anchor_file, "w") as f:
            json.dump({"recipe": recipe, "batch_sha256": batch_sha,
                       "anchor_db": rec0["noisy_anchor"],
                       "platform": jax.default_backend(),
                       "pinned_at": time.strftime("%Y-%m-%d")}, f, indent=1)
        print(f"[anchor] pinned {rec0['noisy_anchor']:.4f} dB "
              f"(batches {batch_sha[:12]}) -> {own.anchor_file}", flush=True)
    elif pinned is not None:
        tol = 0.1  # dB; absorbs bf16/fp32 backend noise, catches code drift
        drift = abs(rec0["noisy_anchor"] - pinned["anchor_db"])
        if pinned.get("batch_sha256") != batch_sha:
            msg = (f"[anchor] EVAL BATCHES CHANGED (sha {batch_sha[:12]} != "
                   f"pinned {pinned['batch_sha256'][:12]})")
        elif drift > tol:
            msg = (f"[anchor] ANCHOR DRIFT {rec0['noisy_anchor']:.3f} dB vs "
                   f"pinned {pinned['anchor_db']:.3f} (|d|={drift:.3f} > {tol})")
        else:
            msg = None
            print(f"[anchor] ok: {rec0['noisy_anchor']:.3f} dB vs pinned "
                  f"{pinned['anchor_db']:.3f} (|d|={drift:.3f})", flush=True)
        if msg:
            if not own.allow_anchor_drift:
                raise SystemExit(
                    msg + " — SI-SDR from this run is NOT comparable to the "
                    "pinned record. Re-pin with --pin_anchor (and re-run the "
                    "control) or pass --allow_anchor_drift to relabel.")
            anchor_drift = True
            print(msg + " — records relabeled with anchor_drift=true",
                  flush=True)
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
