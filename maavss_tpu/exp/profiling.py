"""Profiling / tracing.

The reference's only instrumentation is a manual perf_counter around train
steps (train_audio_net.py:98,116-117). Here, three tiers:

- `trace(...)`: full `jax.profiler` capture (TensorBoard/Perfetto). NOTE:
  wedges through the axon loopback relay (CLAUDE.md) — needs a directly
  attached chip.
- `PhaseTimer`: per-phase wall timers that land in the metrics JSONL.
- `compile_report(fn, *args)`: RELAY-SAFE static analysis of the compiled
  program — XLA's own cost/memory analysis plus roofline estimates (MXU%,
  arithmetic intensity, compute- vs HBM-bound speed-of-light). This is the
  profiling story that works everywhere, including over the relay, because
  it never executes the program. CLI: `python tools/cost_report.py`.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True) -> Iterator[None]:
    """Capture a jax.profiler trace (view in TensorBoard / Perfetto).

    with profiling.trace('runs/myrun/trace'):
        for _ in range(20): step(...)
    """
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Named wall-clock phases; `summary()` returns mean seconds per phase.

    timer = PhaseTimer()
    with timer.phase('data'):   batch = next(it)
    with timer.phase('step'):   state, m = step(...); jax.block_until_ready(m)
    """

    def __init__(self):
        self._tot: Dict[str, float] = {}
        self._cnt: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._tot[name] = self._tot.get(name, 0.0) + time.perf_counter() - t0
            self._cnt[name] = self._cnt.get(name, 0) + 1

    def summary(self, prefix: str = "time_") -> Dict[str, float]:
        return {f"{prefix}{k}": self._tot[k] / self._cnt[k] for k in self._tot}

    def reset(self) -> None:
        self._tot.clear()
        self._cnt.clear()


def annotate(name: str):
    """TraceAnnotation context for custom named regions in profiles."""
    return jax.profiler.TraceAnnotation(name)


# v5e single-chip peaks (public spec): 197 bf16 TFLOP/s, 819 GB/s HBM.
V5E_PEAK_TFLOPS = 197.0
V5E_HBM_GBPS = 819.0


def compile_report(fn, *args, peak_tflops: float = V5E_PEAK_TFLOPS,
                   hbm_gbps: float = V5E_HBM_GBPS,
                   measured_ms: Optional[float] = None,
                   **jit_kwargs: Any) -> Dict[str, float]:
    """Static cost/memory analysis of `jax.jit(fn)(*args)` — never executes.

    Returns XLA's aggregate cost analysis (flops, HBM bytes accessed),
    the compiled memory footprint (temp/argument/output bytes), and the
    derived roofline: arithmetic intensity, compute- and memory-bound
    speed-of-light step times, and — when `measured_ms` is given — the
    achieved MXU% and HBM% so a fetch-closed wall measurement (bench.py)
    decomposes into "how far from which wall".

    Relay-safe: lowering + compilation happen host-side in XLA; nothing is
    dispatched to the device (the axon wedge is execution-path only).

    `fn` may be a plain callable (it is jitted here, `jit_kwargs` apply) or
    an already-jitted function such as a product train step from
    train/steps.py — then its own donation/sharding spec is analyzed as-is.
    """
    jitted = fn if hasattr(fn, "lower") else jax.jit(fn, **jit_kwargs)
    compiled = jitted.lower(*args).compile()
    cost = compiled.cost_analysis() or {}
    flops = float(cost.get("flops", 0.0))
    bytes_accessed = float(cost.get("bytes accessed", 0.0))
    out: Dict[str, float] = {
        "flops": flops,
        "gflops": flops / 1e9,
        "bytes_accessed": bytes_accessed,
        "transcendentals": float(cost.get("transcendentals", 0.0)),
        "arithmetic_intensity": flops / bytes_accessed if bytes_accessed else 0.0,
        # speed-of-light step times on the target chip
        "sol_compute_ms": flops / (peak_tflops * 1e12) * 1e3,
        "sol_memory_ms": bytes_accessed / (hbm_gbps * 1e9) * 1e3,
    }
    out["bound"] = ("compute" if out["sol_compute_ms"] >= out["sol_memory_ms"]
                    else "memory")
    mem = compiled.memory_analysis()
    if mem is not None:
        for k in ("temp_size_in_bytes", "argument_size_in_bytes",
                  "output_size_in_bytes", "generated_code_size_in_bytes"):
            v = getattr(mem, k, None)
            if v is not None:
                out[k] = float(v)
    if measured_ms:
        out["measured_ms"] = float(measured_ms)
        out["mxu_pct"] = 100.0 * out["sol_compute_ms"] / measured_ms
        out["hbm_pct"] = 100.0 * out["sol_memory_ms"] / measured_ms
    return out


def format_report(r: Dict[str, float]) -> str:
    """Human-readable multi-line rendering of a compile_report dict."""
    lines = [
        f"flops            {r['gflops']:.2f} GFLOP",
        f"bytes accessed   {r['bytes_accessed'] / 1e9:.3f} GB",
        f"intensity        {r['arithmetic_intensity']:.1f} FLOP/B",
        f"speed-of-light   compute {r['sol_compute_ms']:.3f} ms | "
        f"memory {r['sol_memory_ms']:.3f} ms -> {r['bound']}-bound",
    ]
    if "temp_size_in_bytes" in r:
        lines.append(
            f"compiled memory  temp {r['temp_size_in_bytes'] / 2**30:.2f} GiB"
            f" | args {r.get('argument_size_in_bytes', 0) / 2**30:.2f} GiB"
            f" | out {r.get('output_size_in_bytes', 0) / 2**30:.2f} GiB")
    if "measured_ms" in r:
        lines.append(
            f"measured         {r['measured_ms']:.2f} ms -> "
            f"MXU {r['mxu_pct']:.1f}% | HBM {r['hbm_pct']:.1f}%")
    return "\n".join(lines)
