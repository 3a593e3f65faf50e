#!/usr/bin/env python
"""Stage-bisection probe for the fusion train step's memory-bound residual.

BASELINE.md round 3b localizes the fusion step as ≈27% Adam update (fixed
2.71 ms at b128) + ~73% batch-scaled forward/backward at ~5% MXU — but XLA's
aggregate cost analysis cannot attribute WHICH part of the forward/backward
eats the time, and jax.profiler wedges over the axon relay (CLAUDE.md). This
probe times each pipeline stage's fwd+bwd independently, fetch-closed, at the
bench geometry (vectorized windows: effective batch = B * num_seq):

  prep     STFT + noise + phasegram windowing + window fold     (fwd only)
  enc_a    stft_encoder ConvStack                               (fwd+bwd)
  enc_v    phasegram_encoder ConvStack                          (fwd+bwd)
  rnn      BiLSTM(256) over the fused latent sequence           (fwd+bwd)
  fc_heads fc1/fc2 + a_fc1/v_fc1 heads + the two mse losses     (fwd+bwd)
  fullgrad the entire loss_fn fwd+bwd (no optimizer)            (fwd+bwd)
  step     the real product train step incl. Adam               (reference)

Parts are timed on materialized fixed inputs (each stage's real input shape),
so the sum of parts can exceed `fullgrad` slightly (XLA fuses across stage
boundaries in the real program) — the point is the RATIO.

Usage: python benchmarks/fusion_probe.py [--batch 128] [--reps 10]
       (TPU; serialize with other clients; idle host)
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def _timed(fn, args, reps, windows=3, warmup=3):
    """Median ms of `windows` fetch-closed windows of `reps` dispatches."""
    for _ in range(warmup):
        out = fn(*args)
    float(out)
    times = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        float(out)
        times.append((time.perf_counter() - t0) / reps)
    return statistics.median(times) * 1e3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--fusion_encode", default="window",
                    choices=("window", "full"),
                    help="attribute the windowed (reference-parity) or the "
                         "--fusion_encode full step: full times the encoders "
                         "on the (nf+ns-1)-frame span they actually see")
    args = ap.parse_args()
    full_enc = args.fusion_encode == "full"

    from maavss_tpu.config import RunConfig
    from maavss_tpu.data.synthetic import synthetic_av_batch
    from maavss_tpu.models.fusion import AVFusionModel
    from maavss_tpu.ops.phasegram import phasegram_cumsum, phasegram_window
    from maavss_tpu.train.setup import init_runtime, jit_init
    from maavss_tpu.train.steps import (
        _prep_stft_pair,
        frames_f32,
        make_fusion_step,
        mse,
    )
    from maavss_tpu.train.state import create_train_state, make_optimizer

    init_runtime()
    cfg = RunConfig(batch_size=args.batch, dtype=args.dtype, pgram_cache=True,
                    fusion_encode=args.fusion_encode)
    b, a, nf, ns = args.batch, cfg.hops_per_frame, cfg.num_frames, cfg.num_seq
    t_stft = a * nf
    model = AVFusionModel(
        stft_shape=(b, 2, t_stft, cfg.fft_len // 2),
        pgram_shape=(b, 1, nf, cfg.p_size**2),
        latent_channels=cfg.latent_chan, fc_size=cfg.fc_size,
        dtype=jnp.dtype(args.dtype),
    )
    variables = jit_init(model, model.stft_shape, model.pgram_shape,
                         method=model.init_all)
    params, bstats = variables["params"], variables["batch_stats"]

    batch = synthetic_av_batch(cfg, b, seed=0)
    audio = jnp.asarray(batch["audio"])
    pgram_rows = jnp.asarray(
        np.asarray(phasegram_cumsum(frames_f32(jnp.asarray(batch["frames"]))),
                   np.float16))
    rng = jax.random.PRNGKey(0)

    # ---- materialize each stage's real input (one un-timed pass) ----------
    def build_inputs(audio, pgram_rows, rng):
        x_full, y_full = _prep_stft_pair(audio, cfg, rng, trim_end=True,
                                         max_norm=cfg.normalize_output_fft)

        def fold(full):
            wins = [jax.lax.slice_in_dim(full, j * a, j * a + nf * a, axis=2)
                    for j in range(ns)]
            stacked = jnp.stack(wins, axis=1)
            return stacked.reshape((-1,) + stacked.shape[2:])

        p_flat = pgram_rows.astype(jnp.float32)
        pg_wins = jnp.stack([phasegram_window(p_flat[:, j:j + nf])
                             for j in range(ns)], axis=1)
        y_pg = pg_wins.reshape((-1,) + pg_wins.shape[2:])
        return fold(x_full), fold(y_full), y_pg

    xs, ys, y_pg = jax.jit(build_inputs)(audio, pgram_rows, rng)

    # full-encode mode: the encoders see the UN-folded (nf+ns-1)-frame span
    # (train/steps.py:make_fusion_step full path); heads see the same batched
    # window shapes as the window mode, so those stages reuse xs/ys/y_pg
    def build_full_inputs(audio, pgram_rows, rng):
        x_full, _ = _prep_stft_pair(audio, cfg, rng, trim_end=True,
                                    max_norm=cfg.normalize_output_fft)
        x_used = jax.lax.slice_in_dim(x_full, 0, (nf + ns - 1) * a, axis=2)
        pg_full = phasegram_window(
            pgram_rows.astype(jnp.float32)[:, :nf + ns - 1])
        return x_used, pg_full

    if full_enc:
        x_used, pg_full = jax.jit(build_full_inputs)(audio, pgram_rows, rng)
        x_used, pg_full = map(jax.device_put, (x_used, pg_full))
    # materialization passes (values only need to be representative): eval
    # mode so batch_stats stays immutable; the timed closures use train=True
    # with mutable=["batch_stats"] like the real step.
    enc_a_out = model.apply({"params": params, "batch_stats": bstats}, xs,
                            False, method=lambda m, x, t: m.stft_encoder(x, t))
    enc_v_out = model.apply({"params": params, "batch_stats": bstats}, y_pg,
                            False, method=lambda m, x, t: m.phasegram_encoder(x, t))
    x_v = jnp.transpose(enc_v_out, (0, 2, 1, 3))
    x_a = jnp.transpose(enc_a_out, (0, 2, 1, 3))
    cat = jnp.concatenate([x_v, x_a], axis=2)
    lstm_in = cat.reshape(cat.shape[0], cat.shape[1], -1)
    lstm_out = model.apply({"params": params, "batch_stats": bstats}, lstm_in,
                           method=lambda m, x: m.lstm(x))
    xs, ys, y_pg, lstm_in, lstm_out = map(
        jax.device_put, (xs, ys, y_pg, lstm_in, lstm_out))
    print(json.dumps({"shapes": {"xs": list(xs.shape), "y_pg": list(y_pg.shape),
                                 "enc_a_out": list(enc_a_out.shape),
                                 "enc_v_out": list(enc_v_out.shape),
                                 "lstm_in": list(lstm_in.shape)}}), flush=True)

    # ---- per-stage fwd+bwd timers ------------------------------------------
    def grad_closed(loss_fn):
        """fwd+bwd scalar whose value depends on the grads (so the backward
        cannot be dead-code-eliminated; 1e-30 scale keeps the loss readable)."""

        def run(params, bstats, *xs_in):
            (l, _), g = jax.value_and_grad(loss_fn, has_aux=True)(
                params, bstats, *xs_in)
            gn = sum(jnp.sum(jnp.square(t.astype(jnp.float32)))
                     for t in jax.tree_util.tree_leaves(g))
            return l + 1e-30 * gn

        return jax.jit(run)

    def apply_mut(params, bstats, x, method):
        return model.apply({"params": params, "batch_stats": bstats}, x, True,
                           method=method, mutable=["batch_stats"])

    def enc_a_loss(params, bstats, x):
        y, mut = apply_mut(params, bstats, x,
                           lambda m, x, t: m.stft_encoder(x, t))
        return jnp.mean(jnp.square(y.astype(jnp.float32))), mut

    def enc_v_loss(params, bstats, x):
        y, mut = apply_mut(params, bstats, x,
                           lambda m, x, t: m.phasegram_encoder(x, t))
        return jnp.mean(jnp.square(y.astype(jnp.float32))), mut

    def rnn_loss(params, bstats, x):
        y = model.apply({"params": params, "batch_stats": bstats}, x,
                        method=lambda m, x: m.lstm(x))
        return jnp.mean(jnp.square(y.astype(jnp.float32))), None

    def fc_heads_loss(params, bstats, av_seq, xs, ys, y_pg):
        def run(m, av_seq):
            av = av_seq.reshape(av_seq.shape[0], -1)
            import flax.linen as nn
            av = nn.leaky_relu(m.fc1(av), negative_slope=0.3)
            av = nn.leaky_relu(m.fc2(av), negative_slope=0.3)
            x_a_out = nn.leaky_relu(m.a_fc1(av), negative_slope=0.3).reshape(xs.shape)
            x_v_out = nn.leaky_relu(m.v_fc1(av), negative_slope=0.3).reshape(y_pg.shape)
            return mse(x_a_out, ys) + cfg.loss_coeff * mse(x_v_out, y_pg)

        l = model.apply({"params": params, "batch_stats": bstats}, av_seq,
                        method=run)
        return l, None

    def full_loss(params, bstats, xs, ys, y_pg):
        (yh_a, yh_v, _), mut = model.apply(
            {"params": params, "batch_stats": bstats}, xs, y_pg, train=True,
            mutable=["batch_stats"])
        return mse(yh_a, ys) + cfg.loss_coeff * mse(yh_v, y_pg), mut

    def fullenc_loss(params, bstats, x_used, pg_full, xs, ys, y_pg):
        # the --fusion_encode full dataflow (train/steps.py step_full):
        # encode once over the span, slice ns latent windows, batch heads
        (a_lat, v_lat), mut = model.apply(
            {"params": params, "batch_stats": bstats}, x_used, pg_full,
            train=True, mutable=["batch_stats"], method=model.encode_both)

        def wins(full, hop, width):
            st = jnp.stack(
                [jax.lax.slice_in_dim(full, j * hop, j * hop + width, axis=2)
                 for j in range(ns)], axis=1)
            return st.reshape((-1,) + st.shape[2:])

        from maavss_tpu.train.steps import _fusion_full_geometry
        hop_a, hop_v, t_win = _fusion_full_geometry(model, cfg)
        yh_a, yh_v, _ = model.apply(
            {"params": params, "batch_stats": mut["batch_stats"]},
            wins(a_lat, hop_a, t_win), wins(v_lat, hop_v, t_win), xs,
            train=True, method=model.heads_from_latents)
        return mse(yh_a, ys) + cfg.loss_coeff * mse(yh_v, y_pg), mut

    def prep_only(audio, pgram_rows, rng):
        xs, ys, y_pg = build_inputs(audio, pgram_rows, rng)
        return (jnp.sum(xs.astype(jnp.float32)) +
                jnp.sum(ys.astype(jnp.float32)) +
                jnp.sum(y_pg.astype(jnp.float32)))

    def prep_full_only(audio, pgram_rows, rng):
        x_used, pg_full = build_full_inputs(audio, pgram_rows, rng)
        return (jnp.sum(x_used.astype(jnp.float32)) +
                jnp.sum(pg_full.astype(jnp.float32)))

    results = {}
    if full_enc:
        parts = [
            ("prep", jax.jit(prep_full_only), (audio, pgram_rows, rng)),
            ("enc_a", grad_closed(enc_a_loss), (params, bstats, x_used)),
            ("enc_v", grad_closed(enc_v_loss), (params, bstats, pg_full)),
            ("rnn", grad_closed(rnn_loss), (params, bstats, lstm_in)),
            ("fc_heads", grad_closed(fc_heads_loss),
             (params, bstats, lstm_out, xs, ys, y_pg)),
            ("fullgrad", grad_closed(fullenc_loss),
             (params, bstats, x_used, pg_full, xs, ys, y_pg)),
        ]
    else:
        parts = [
            ("prep", jax.jit(prep_only), (audio, pgram_rows, rng)),
            ("enc_a", grad_closed(enc_a_loss), (params, bstats, xs)),
            ("enc_v", grad_closed(enc_v_loss), (params, bstats, y_pg)),
            ("rnn", grad_closed(rnn_loss), (params, bstats, lstm_in)),
            ("fc_heads", grad_closed(fc_heads_loss),
             (params, bstats, lstm_out, xs, ys, y_pg)),
            ("fullgrad", grad_closed(full_loss), (params, bstats, xs, ys, y_pg)),
        ]
    from maavss_tpu.exp.profiling import compile_report

    rooflines = {}
    for name, fn, fargs in parts:
        ms = _timed(fn, fargs, args.reps)
        results[name] = round(ms, 3)
        # relay-safe roofline next to the measured time: which wall is this
        # stage near, and how many HBM bytes does XLA count for it
        try:
            rep = compile_report(fn, *fargs, measured_ms=ms)
            rooflines[name] = {k: round(rep[k], 3) for k in
                               ("sol_memory_ms", "sol_compute_ms",
                                "mxu_pct", "hbm_pct")}
            rooflines[name]["gbytes"] = round(rep["bytes_accessed"] / 1e9, 3)
        except Exception as e:  # attribution still useful without it
            rooflines[name] = {"error": str(e)[:120]}
        print(json.dumps({"part": name, "ms": results[name],
                          "roofline": rooflines[name]}), flush=True)

    # reference: the real product step (incl. Adam), same protocol
    tx = make_optimizer(cfg.learning_rate, "adam")
    state = create_train_state(variables, tx)
    step = make_fusion_step(model, cfg, mesh=None, window_mode="vectorized")
    dev_batch = {"audio": audio, "pgram": pgram_rows}
    mode = jnp.int32(2)
    for _ in range(3):
        state, metrics = step(state, dev_batch, rng, mode)
    float(metrics["loss"])
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(args.reps):
            state, metrics = step(state, dev_batch, rng, mode)
        float(metrics["loss"])
        times.append((time.perf_counter() - t0) / args.reps)
    results["step"] = round(statistics.median(times) * 1e3, 3)
    print(json.dumps({"part": "step", "ms": results["step"]}), flush=True)

    print(json.dumps({"metric": "fusion_stage_ms", "batch": args.batch,
                      "dtype": args.dtype, "fusion_encode": args.fusion_encode,
                      "results": results, "rooflines": rooflines}))


if __name__ == "__main__":
    main()
