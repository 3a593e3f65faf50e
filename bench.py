#!/usr/bin/env python
"""Benchmark: A/V clips/sec/chip on the flagship fusion training step.

Measures the full per-step pipeline (STFT + noise + phasegram preprocessing,
num_seq windowed forward/backward with grad accumulation, optimizer update) at
the reference's default geometry, then measures a reference-equivalent PyTorch
implementation on CPU (benchmarks/torch_baseline.py) at the reference's
default batch size (the reference is CUDA-pinned and publishes no numbers —
BASELINE.md — so the baseline is measured here).

Prints ONE JSON line:
  {"metric": "av_clips_per_sec_per_chip", "value": N, "unit": "clips/s/chip",
   "vs_baseline": N}
"""

import json
import os
import sys
import time


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def measure_jax_clips_per_sec(batch_size: int, steps: int = 10, warmup: int = 3,
                              dtype: str = "float32"):
    import jax
    import jax.numpy as jnp

    from maavss_tpu.config import RunConfig
    from maavss_tpu.data.synthetic import synthetic_av_batch
    from maavss_tpu.models.fusion import AVFusionModel
    from maavss_tpu.parallel.mesh import make_mesh, shard_batch
    from maavss_tpu.train.setup import init_runtime
    from maavss_tpu.train.state import create_train_state, make_optimizer
    from maavss_tpu.train.steps import make_fusion_step

    init_runtime()
    n_dev = len(jax.devices())
    cfg = RunConfig(batch_size=batch_size, dtype=dtype)
    t_stft = cfg.hops_per_frame * cfg.num_frames
    model = AVFusionModel(
        stft_shape=(batch_size, 2, t_stft, cfg.fft_len // 2),
        pgram_shape=(batch_size, 1, cfg.num_frames, cfg.p_size**2),
        latent_channels=cfg.latent_chan, fc_size=cfg.fc_size,
        dtype=jnp.dtype(cfg.dtype),
    )
    x_a = jnp.zeros(model.stft_shape, jnp.float32)
    x_v = jnp.zeros(model.pgram_shape, jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x_a, x_v, method=model.init_all)
    tx = make_optimizer(cfg.learning_rate, "adam")
    state = create_train_state(variables, tx)

    mesh = make_mesh() if n_dev > 1 else None
    step = make_fusion_step(model, cfg, mesh=mesh,
                            window_mode=os.environ.get("MAAVSS_BENCH_WINDOWS", "scan"))
    log(f"bench: devices={n_dev} batch={batch_size} "
        f"platform={jax.devices()[0].platform}")

    batch = synthetic_av_batch(cfg, batch_size, seed=0)
    if mesh is not None:
        batch = shard_batch(mesh, batch)
    else:
        batch = jax.tree_util.tree_map(jax.device_put, batch)
    rng = jax.random.PRNGKey(0)
    mode = jnp.int32(2)

    for _ in range(warmup):
        state, metrics = step(state, batch, rng, mode)
    jax.block_until_ready(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, batch, rng, mode)
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0
    clips_per_sec = batch_size * steps / dt
    return clips_per_sec / n_dev, n_dev, dt / steps


def main() -> None:
    # measured on 1x v5e: fp32/b32 8.3k, bf16/b32 19.3k, bf16/b128 72.4k
    # clips/s/chip — the step is latency-bound, so batch amortizes ~free
    batch = int(os.environ.get("MAAVSS_BENCH_BATCH", "128"))
    dtype = os.environ.get("MAAVSS_BENCH_DTYPE", "bfloat16")
    clips_per_chip, n_dev, step_s = measure_jax_clips_per_sec(batch, dtype=dtype)
    log(f"bench: jax {clips_per_chip:.2f} clips/s/chip ({step_s*1e3:.1f} ms/step)")

    vs_baseline = None
    try:
        from maavss_tpu.config import RunConfig
        from benchmarks.torch_baseline import measure_torch_cpu_clips_per_sec

        ref_cfg = RunConfig()  # reference defaults: batch 4
        base_cps, base_b = measure_torch_cpu_clips_per_sec(ref_cfg)
        log(f"bench: torch-cpu baseline {base_cps:.2f} clips/s (batch {base_b})")
        vs_baseline = clips_per_chip / base_cps
    except Exception as e:  # torch baseline is best-effort
        log(f"bench: torch baseline failed: {e}")

    print(json.dumps({
        "metric": "av_clips_per_sec_per_chip",
        "value": round(clips_per_chip, 3),
        "unit": "clips/s/chip",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline else None,
    }))


if __name__ == "__main__":
    main()
