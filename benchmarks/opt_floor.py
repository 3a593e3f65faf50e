#!/usr/bin/env python
"""Optimizer-floor micro-bench: fetch-closed time of ONE Adam update on the
flagship fusion model's real param tree, with fixed gradients — no forward,
no backward, no data.

Why: the fusion step is batch-insensitive per clip (BASELINE.md) and round
3's K-steps-per-dispatch result ruled out host dispatch as the residual. The
remaining batch-INDEPENDENT component of the step is the parameter-side HBM
traffic: the Adam update reads/writes params + m + v (~45M params x ~4
arrays), identical at b1 and b2048. This measures that floor directly.

Usage: python benchmarks/opt_floor.py   (TPU; serialize with other clients)
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main() -> None:
    from maavss_tpu.config import RunConfig
    from maavss_tpu.train.setup import build_fusion, init_runtime

    init_runtime()
    cfg = RunConfig(batch_size=128, dtype="bfloat16")
    _, state = build_fusion(cfg, cfg.batch_size)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))

    grads = jax.tree_util.tree_map(
        lambda x: jnp.full_like(x, 1e-6), state.params)

    @jax.jit
    def opt_only(state, grads):
        new = state.apply_gradients(grads=grads)
        # tiny data-dependent scalar so the timed window can be fetch-closed
        probe = jax.tree_util.tree_leaves(new.params)[0].ravel()[0]
        return new, probe

    for _ in range(5):
        state, probe = opt_only(state, grads)
    float(probe)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(50):
            state, probe = opt_only(state, grads)
        float(probe)  # host fetch closes the window
        times.append((time.perf_counter() - t0) / 50)
    med = statistics.median(times)

    # Same 50 updates inside ONE compiled program (lax.scan over the update):
    # isolates the DEVICE cost of the Adam update from the per-dispatch relay
    # floor. If scanned << dispatched, the dispatched number was measuring the
    # relay, not parameter-side HBM traffic.
    def measure_scan(state):
        @jax.jit
        def opt_scan(state, grads):
            def body(st, _):
                return st.apply_gradients(grads=grads), None
            new, _ = jax.lax.scan(body, state, None, length=50)
            return new, jax.tree_util.tree_leaves(new.params)[0].ravel()[0]

        state, probe = opt_scan(state, grads)
        float(probe)  # warm
        scan_times = []
        for _ in range(3):
            t0 = time.perf_counter()
            state, probe = opt_scan(state, grads)
            float(probe)
            scan_times.append((time.perf_counter() - t0) / 50)
        return statistics.median(scan_times), scan_times

    scan_med, scan_times = measure_scan(state)

    # A/B: the flat fused Adam (train/flat_opt.py, --fused_opt) on the same
    # param tree — moments in one contiguous buffer, a handful of full-width
    # kernels instead of ~50 per-leaf ones.
    from maavss_tpu.train.state import create_train_state, make_optimizer

    flat_state = create_train_state(
        {"params": state.params, "batch_stats": state.batch_stats},
        make_optimizer(cfg.learning_rate, "adam", flat=True))
    flat_med, flat_times = measure_scan(flat_state)

    # A/B: the per-leaf fused Pallas Adam (train/fused_adam.py,
    # --opt_kernel pallas) — moments AND the parameter add in one VMEM pass
    # per leaf, the HBM-minimum 7 passes.
    pallas_state = create_train_state(
        {"params": state.params, "batch_stats": state.batch_stats},
        make_optimizer(cfg.learning_rate, "adam", kernel="pallas"))
    pallas_med, pallas_times = measure_scan(pallas_state)

    # speed-of-light: read p,g,m,v + write p,m,v = 7 arrays of fp32 params
    sol_ms = 7 * n_params * 4 / 819e9 * 1e3  # v5e ~819 GB/s HBM
    print(json.dumps({
        "metric": "adam_update_ms", "value": round(med * 1e3, 3),
        "n_params": int(n_params),
        "windows_ms": [round(t * 1e3, 3) for t in times],
        "scanned_update_ms": round(scan_med * 1e3, 3),
        "scanned_windows_ms": [round(t * 1e3, 3) for t in scan_times],
        "flat_scanned_update_ms": round(flat_med * 1e3, 3),
        "flat_scanned_windows_ms": [round(t * 1e3, 3) for t in flat_times],
        "pallas_scanned_update_ms": round(pallas_med * 1e3, 3),
        "pallas_scanned_windows_ms": [round(t * 1e3, 3) for t in pallas_times],
        "hbm_speed_of_light_ms": round(sol_ms, 3),
    }))


if __name__ == "__main__":
    main()
