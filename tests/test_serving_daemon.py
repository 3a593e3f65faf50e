"""Serving daemon (exp/serving.py + tools/serve.py): dynamic batching over
the exported artifact, HTTP wire format, input validation.

All in-process on CPU with the tiny fusion geometry (same as
tests/test_export.py). The correctness anchor is row-independence: a row
served alone (zero-padded batch) must match the same row served inside a
full batch and the direct `exported.call`.
"""

import json
import threading
from urllib.error import HTTPError
from urllib.request import urlopen

import numpy as np
import pytest

import jax

from maavss_tpu.config import RunConfig
from maavss_tpu.exp.export import (
    export_separator,
    np_variables,
    random_serving_inputs,
    serving_input_specs,
)
from maavss_tpu.exp.serving import (
    BatchingExecutor,
    SeparationServer,
    separate_over_http,
)
from maavss_tpu.models.fusion import AVFusionModel

CFG = RunConfig(num_frames=4, num_seq=4, hops_per_frame=4, fft_len=64,
                p_size=16, latent_chan=8, fc_size=256, batch_size=4)


@pytest.fixture(scope="module")
def served():
    import jax.numpy as jnp
    from jax import export as jax_export

    t_stft = CFG.hops_per_frame * CFG.num_frames
    model = AVFusionModel(
        stft_shape=(CFG.batch_size, 2, t_stft, CFG.fft_len // 2),
        pgram_shape=(CFG.batch_size, 1, CFG.num_frames, CFG.p_size**2),
        latent_channels=CFG.latent_chan, fc_size=CFG.fc_size)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros(model.stft_shape),
                           jnp.zeros(model.pgram_shape),
                           method=model.init_all)
    exported = jax_export.deserialize(export_separator(
        model, CFG, variables, CFG.batch_size, platforms=("cpu",)))
    a_spec, v_spec = serving_input_specs(CFG, CFG.batch_size)
    executor = BatchingExecutor(exported, np_variables(variables),
                                CFG.batch_size, a_spec, v_spec,
                                max_wait_ms=30.0)
    server = SeparationServer(executor, {"model": "fusion",
                                         "batch": CFG.batch_size,
                                         "audio_shape": list(a_spec.shape),
                                         "visual_shape": list(v_spec.shape)},
                              port=0).start()
    url = f"http://127.0.0.1:{server.address[1]}"
    vars_np = np_variables(variables)

    def direct(audio, visual):
        return np.asarray(exported.call(vars_np["params"],
                                        vars_np["batch_stats"],
                                        audio, visual))

    yield url, executor, direct
    server.stop()


def test_full_batch_request_matches_direct(served):
    url, _, direct = served
    audio, visual = random_serving_inputs(CFG, CFG.batch_size)
    out = separate_over_http(url, audio, visual)
    np.testing.assert_allclose(out, direct(audio, visual), rtol=1e-6,
                               atol=1e-7)


def test_concurrent_single_rows_coalesce_and_match(served):
    url, executor, direct = served
    audio, visual = random_serving_inputs(CFG, CFG.batch_size, seed=1)
    before = executor.snapshot()["batches"]
    results = [None] * CFG.batch_size

    def one(i):
        results[i] = separate_over_http(url, audio[i:i + 1], visual[i:i + 1])

    threads = [threading.Thread(target=one, args=(i,))
               for i in range(CFG.batch_size)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    want = direct(audio, visual)
    for i in range(CFG.batch_size):
        assert results[i].shape == (1, want.shape[1])
        # row-independence: alone-or-batched must agree
        np.testing.assert_allclose(results[i][0], want[i], rtol=1e-5,
                                   atol=1e-6)
    after = executor.snapshot()
    # 4 single-row requests within max_wait must have shared batches
    assert after["batches"] - before < CFG.batch_size
    assert after["rows"] >= CFG.batch_size


def test_oversize_and_misshaped_requests_rejected(served):
    url, executor, _ = served
    audio, visual = random_serving_inputs(CFG, CFG.batch_size)
    with pytest.raises(ValueError, match="rows must be 1.."):
        executor.submit(np.concatenate([audio, audio]),
                        np.concatenate([visual, visual]))
    with pytest.raises(HTTPError) as ei:
        separate_over_http(url, audio[:1, :-3], visual[:1])
    assert ei.value.code == 400
    with pytest.raises(HTTPError) as ei:
        separate_over_http(url + "/nope", audio[:1], visual[:1])
    assert ei.value.code == 404


def test_f16_wire_roundtrip(served):
    """float16 request audio -> float16 response, matching the f32 path
    within f16 quantization (round-5 wire cut)."""
    url, _, direct = served
    audio, visual = random_serving_inputs(CFG, 2, seed=5)
    from maavss_tpu.exp.serving import SeparationClient

    client = SeparationClient(url, half_wire=True)
    out = client.separate(audio, visual)
    client.close()
    assert out.dtype == np.float32  # upcast host-side
    want = direct(np.concatenate([audio] * (CFG.batch_size // 2)),
                  np.concatenate([visual] * (CFG.batch_size // 2)))[:2]
    # two f16 quantizations (request + response) on unit-scale audio
    np.testing.assert_allclose(out, want, atol=2e-3, rtol=2e-3)


def test_persistent_client_reuses_connection(served):
    url, executor, direct = served
    from maavss_tpu.exp.serving import SeparationClient

    audio, visual = random_serving_inputs(CFG, 1, seed=6)
    client = SeparationClient(url)
    outs = [client.separate(audio, visual) for _ in range(3)]
    conn = client._conn
    assert conn is not None  # connection survived across calls
    out4 = client.separate(audio, visual)
    assert client._conn is conn
    client.close()
    want = direct(np.concatenate([audio] * CFG.batch_size),
                  np.concatenate([visual] * CFG.batch_size))[:1]
    for o in outs + [out4]:
        np.testing.assert_allclose(o, want, rtol=1e-5, atol=1e-6)


def test_pipelined_executor_burst_correctness(served):
    """A burst of distinct full batches keeps the executor's k/k+1 pipeline
    busy; every response must still match its own direct result."""
    url, _, direct = served
    from maavss_tpu.exp.serving import SeparationClient

    batches = [random_serving_inputs(CFG, CFG.batch_size, seed=10 + i)
               for i in range(4)]
    results = [None] * len(batches)

    def one(i):
        client = SeparationClient(url)
        results[i] = client.separate(*batches[i])
        client.close()

    threads = [threading.Thread(target=one, args=(i,))
               for i in range(len(batches))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i, (audio, visual) in enumerate(batches):
        np.testing.assert_allclose(results[i], direct(audio, visual),
                                   rtol=1e-5, atol=1e-6)


def test_tcp_nodelay_both_ends(served):
    """Keep-alive connections must disable Nagle on both sockets: the
    handler's two-segment response otherwise stalls ~40 ms behind the
    peer's delayed ACK once the connection leaves Linux quickack mode
    (measured r5b: 108 ms keep-alive p50 vs 67.5 ms fresh-connection)."""
    import socket

    url, executor, _ = served
    from maavss_tpu.exp.serving import SeparationClient, make_handler

    handler = make_handler(executor, {})
    assert handler.disable_nagle_algorithm is True
    audio, visual = random_serving_inputs(CFG, 1, seed=7)
    client = SeparationClient(url)
    client.separate(audio, visual)
    assert client._conn.sock.getsockopt(
        socket.IPPROTO_TCP, socket.TCP_NODELAY) != 0
    client.close()


def test_health_and_stats_endpoints(served):
    url, _, _ = served
    with urlopen(url + "/healthz") as resp:
        health = json.loads(resp.read())
    assert health["ok"] and health["batch"] == CFG.batch_size
    with urlopen(url + "/stats") as resp:
        stats = json.loads(resp.read())
    assert stats["requests"] >= 1 and "latency_ms_p50" in stats
