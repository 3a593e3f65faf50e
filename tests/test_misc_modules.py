"""Conv-variant model, multi-host helpers, profiling timers."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maavss_tpu.exp.profiling import PhaseTimer
from maavss_tpu.models.fusion_conv import AVFusionModelConv
from maavss_tpu.parallel.distributed import (
    global_mesh,
    host_local_to_global,
    initialize,
    process_batch_slice,
)


def test_fusion_conv_forward_shapes():
    b = 2
    m = AVFusionModelConv(stft_shape=(b, 2, 64, 128),
                          pgram_shape=(b, 1, 8, 4096))
    xa = jnp.zeros((b, 2, 64, 128))
    xv = jnp.zeros((b, 1, 8, 4096))
    vs = m.init(jax.random.PRNGKey(0), xa, xv, method="init_all")
    ya, yv, fused = m.apply(vs, xa, xv)
    # forward routes the fused latent through the AE decoders
    # (avse_model_conv.py:700-717): outputs are input-shaped reconstructions
    assert ya.shape == xa.shape
    assert yv.shape == xv.shape
    from maavss_tpu.models.shape_plan import plan_phasegram_encoder

    _, (t, s) = plan_phasegram_encoder((b, 1, 8, 4096), m.latent_channels,
                                       m.fc_size)
    assert fused.shape == (b, m.latent_channels * t * s)
    assert m.apply(vs, xa, method="audio_ae_forward").shape == xa.shape


def test_fusion_conv_bias_free():
    m = AVFusionModelConv(stft_shape=(1, 2, 64, 128),
                          pgram_shape=(1, 1, 8, 4096))
    vs = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 64, 128)),
                jnp.zeros((1, 1, 8, 4096)), method="init_all")
    for path in ("stft_encoder", "phasegram_encoder"):
        for layer, p in vs["params"][path].items():
            if layer.startswith("Conv"):
                assert "bias" not in p, f"{path}/{layer} has a bias"


def test_distributed_single_process():
    initialize()  # no-op without a coordinator
    mesh = global_mesh()
    sl = process_batch_slice(16)
    assert sl == slice(0, 16)  # one process owns the whole batch
    batch = {"audio": np.ones((16, 8), np.float32)}
    g = host_local_to_global(mesh, batch)
    assert g["audio"].shape == (16, 8)
    assert float(jnp.sum(g["audio"])) == 128.0


def test_phase_timer():
    t = PhaseTimer()
    import time

    for _ in range(3):
        with t.phase("a"):
            time.sleep(0.01)
    s = t.summary()
    assert 0.005 < s["time_a"] < 0.1
    t.reset()
    assert t.summary() == {}


@pytest.mark.slow  # ~8 min: sharded vectorized-step compile on 8 virtual devices
def test_bench_json_contract(tmp_path):
    """bench.py prints exactly one JSON line with the driver's contract keys
    (tiny CPU run, torch baseline skipped)."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if not k.startswith("MAAVSS_BENCH_")}  # isolate from dev sweeps
    env.update({"MAAVSS_BENCH_BATCH": "8", "MAAVSS_BENCH_STEPS": "2",
                "MAAVSS_BENCH_WINDOWS": "2", "MAAVSS_BENCH_DTYPE": "float32",
                "MAAVSS_BENCH_SKIP_BASELINE": "1",
                "PYTHONPATH": repo})
    code = ("import jax; jax.config.update('jax_platforms','cpu');"
            "import runpy; runpy.run_path('bench.py', run_name='__main__')")
    # 447 s measured alone on the single core — 1200 gives headroom for the
    # inevitable concurrent-compile contention of a shared slow-tier run
    r = subprocess.run([sys.executable, "-c", code], cwd=repo, env=env,
                       capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    assert len(lines) == 1, r.stdout
    d = json.loads(lines[0])
    assert d["metric"] == "av_clips_per_sec_per_chip"
    assert d["unit"] == "clips/s/chip"
    assert d["value"] > 0 and d["spread"] >= 0
    assert d["window_mode"] == "vectorized" and len(d["windows"]) == 2
