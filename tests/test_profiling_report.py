"""compile_report: relay-safe roofline analysis of compiled programs
(exp/profiling.py). Static-only — must never execute the program."""

import jax
import jax.numpy as jnp
import numpy as np

from maavss_tpu.exp.profiling import compile_report, format_report


def test_matmul_flops_and_roofline():
    n = 128
    a = jnp.zeros((n, n), jnp.float32)

    r = compile_report(lambda x: x @ x, a, peak_tflops=100.0, hbm_gbps=100.0,
                       measured_ms=1.0)
    # XLA counts 2*n^3 flops for an n^3 matmul
    assert r["flops"] == 2 * n**3
    assert r["bytes_accessed"] >= 2 * n * n * 4  # at least read a + write out
    assert r["arithmetic_intensity"] > 0
    assert r["bound"] in ("compute", "memory")
    assert abs(r["mxu_pct"] - 100.0 * r["sol_compute_ms"]) < 1e-9
    txt = format_report(r)
    assert "GFLOP" in txt and "measured" in txt


def test_report_never_executes():
    calls = []

    def fn(x):
        # a host callback would fire on execution; instead prove statically:
        # the traced fn runs once (tracing), and the report needs no devices
        calls.append(1)
        return jnp.sin(x) * 2.0

    r = compile_report(fn, jnp.zeros((8,), jnp.float32))
    assert len(calls) == 1  # traced exactly once, never re-run
    assert r["transcendentals"] >= 8  # sin counted by cost analysis


def test_product_fusion_step_report():
    """The jitted fusion train step (donated state) analyzes in place."""
    from maavss_tpu.config import RunConfig
    from maavss_tpu.data.synthetic import synthetic_av_batch
    from maavss_tpu.models.fusion import AVFusionModel
    from maavss_tpu.train.setup import jit_init
    from maavss_tpu.train.state import create_train_state, make_optimizer
    from maavss_tpu.train.steps import make_fusion_step

    cfg = RunConfig(num_frames=4, num_seq=4, hops_per_frame=4, fft_len=64,
                    p_size=16, latent_chan=8, fc_size=256, batch_size=2)
    t_stft = cfg.hops_per_frame * cfg.num_frames
    model = AVFusionModel(
        stft_shape=(2, 2, t_stft, cfg.fft_len // 2),
        pgram_shape=(2, 1, cfg.num_frames, cfg.p_size**2),
        latent_channels=cfg.latent_chan, fc_size=cfg.fc_size)
    variables = jit_init(model, model.stft_shape, model.pgram_shape,
                         method=model.init_all)
    state = create_train_state(variables, make_optimizer(1e-3, "adam"))
    step = make_fusion_step(model, cfg, window_mode="vectorized")
    batch = synthetic_av_batch(cfg, 2, seed=0)

    r = compile_report(step, state, batch, jax.random.PRNGKey(0), jnp.int32(2))
    assert r["gflops"] > 0
    assert r["sol_compute_ms"] > 0 and r["sol_memory_ms"] > 0
    assert "temp_size_in_bytes" in r
