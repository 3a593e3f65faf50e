#!/usr/bin/env python
"""Load-test client for the serving daemon (tools/serve.py).

Fires `--calls` requests of `--rows` clips each from `--concurrency` client
threads against a running daemon and prints ONE JSON line of end-to-end
latency percentiles + throughput — the over-the-wire counterpart of
tools/serve_bench.py (which measures the in-process artifact call). The
difference between the two isolates the HTTP + batching layer's cost, and
`--concurrency > 1` exercises the dynamic batcher's coalescing (watch
`mean_fill` on the daemon's /stats).

Usage: python tools/serve_client.py --url http://127.0.0.1:8423
       [--rows 1] [--calls 50] [--concurrency 4] [model flags...]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import threading
import time
from urllib.request import urlopen

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--url", default="http://127.0.0.1:8423")
    pre.add_argument("--rows", type=int, default=1)
    pre.add_argument("--calls", type=int, default=50)
    pre.add_argument("--warmup", type=int, default=3)
    pre.add_argument("--concurrency", type=int, default=4)
    pre.add_argument("--wire", choices=("f32", "f16"), default="f32",
                     help="audio wire dtype both directions (daemon mirrors "
                          "request dtype). f16 halves the payload but LOSES "
                          "end-to-end under keep-alive in both measured "
                          "windows (r5b 64.0 vs 74.7, r5e 43.9 vs 53.9 "
                          "clips/s at c32 — the host-side dtype convert on "
                          "this single-core machine outweighs the wire "
                          "bytes), so f32 is the default")
    pre.add_argument("--no_keepalive", action="store_true",
                     help="legacy mode: reconnect per request (the pre-r5 "
                          "client behavior, for A/B)")
    own, rest = pre.parse_known_args()

    from maavss_tpu.config import model_args
    from maavss_tpu.exp.export import random_serving_inputs
    from maavss_tpu.exp.serving import SeparationClient, separate_over_http

    with urlopen(own.url.rstrip("/") + "/healthz") as resp:
        health = json.loads(resp.read())
    cfg = model_args(rest)
    frames_model = health["model"] == "frames"
    audio, visual = random_serving_inputs(cfg, max(own.rows, 1),
                                          frames_model=frames_model)
    if ([own.rows] + list(audio.shape[1:])
            != [own.rows] + health["audio_shape"][1:]):
        raise SystemExit(f"geometry mismatch: client audio {audio.shape[1:]} "
                         f"vs daemon {health['audio_shape'][1:]} — pass the "
                         f"daemon's model flags")
    audio, visual = audio[: own.rows], visual[: own.rows]

    lat: list = []
    lock = threading.Lock()
    err: list = []

    half_wire = own.wire == "f16"

    def worker(n_calls: int) -> None:
        # one persistent keep-alive connection per thread (the legacy mode
        # reconnects per call — measured A/B in BASELINE.md round 5)
        client = None if own.no_keepalive else SeparationClient(
            own.url, half_wire=half_wire)
        snd_audio = audio.astype(np.float16) if (own.no_keepalive
                                                 and half_wire) else audio
        for _ in range(n_calls):
            t0 = time.perf_counter()
            try:
                if client is not None:
                    out = client.separate(audio, visual)
                else:
                    out = separate_over_http(own.url, snd_audio, visual)
                assert out.shape[0] == own.rows
            except Exception as e:  # noqa: BLE001 — report, don't crash
                with lock:
                    err.append(str(e))
                return
            with lock:
                lat.append((time.perf_counter() - t0) * 1e3)
        if client is not None:
            client.close()

    warm = SeparationClient(own.url, half_wire=half_wire)
    for _ in range(own.warmup):
        warm.separate(audio, visual)
    warm.close()
    per = max(1, own.calls // own.concurrency)
    threads = [threading.Thread(target=worker, args=(per,))
               for _ in range(own.concurrency)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    if err:
        raise SystemExit(f"client errors: {err[:3]}")
    lat.sort()

    def pct(p):
        return lat[min(len(lat) - 1, int(round(p / 100 * (len(lat) - 1))))]

    with urlopen(own.url.rstrip("/") + "/stats") as resp:
        stats = json.loads(resp.read())
    print(json.dumps({
        "metric": "serve_http_latency_ms",
        "p50": round(statistics.median(lat), 2),
        "p90": round(pct(90), 2),
        "p99": round(pct(99), 2),
        "clips_per_sec": round(own.rows * len(lat) / wall, 2),
        "rows": own.rows,
        "calls": len(lat),
        "concurrency": own.concurrency,
        "daemon_mean_fill": stats.get("mean_fill"),
        "daemon_batches": stats.get("batches"),
        "wire": own.wire,
        "keepalive": not own.no_keepalive,
    }))


if __name__ == "__main__":
    main()
