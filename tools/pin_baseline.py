#!/usr/bin/env python
"""Pin the torch-CPU baseline leg (round-4 VERDICT item 5).

The published vs_baseline ratio swung 2x across rounds because the CPU leg
was re-measured per bench run with no load discipline. This tool measures it
N times on an idle host, refuses if the host is contended, and writes the
median to benchmarks/baseline_pin.json — bench.py then computes the published
ratio from the pin and reports the fresh leg separately (vs_baseline_fresh).

Usage (idle host): python tools/pin_baseline.py [--reps 5]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--max_load", type=float, default=0.6,
                    help="refuse to pin when 1-min loadavg exceeds this "
                         "before a rep starts (the rep itself adds ~1)")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks", "baseline_pin.json"))
    args = ap.parse_args()

    from maavss_tpu.config import RunConfig
    from benchmarks.torch_baseline import measure_torch_cpu_clips_per_sec

    ref_cfg = RunConfig()  # reference defaults: batch 4
    vals = []
    for i in range(args.reps):
        load = os.getloadavg()[0]
        if load > args.max_load:
            raise SystemExit(
                f"host contended (1-min loadavg {load:.2f} > {args.max_load})"
                " — a deflated CPU leg would inflate the published ratio. "
                "Re-run on an idle host.")
        cps, b = measure_torch_cpu_clips_per_sec(ref_cfg)
        vals.append(cps)
        print(f"rep {i}: {cps:.3f} clips/s (batch {b}, load {load:.2f})",
              flush=True)

    med = statistics.median(vals)
    rec = {
        "torch_cpu_clips_per_sec": round(med, 3),
        "reps": [round(v, 3) for v in vals],
        "spread": round((max(vals) - min(vals)) / med, 4),
        "batch": b,
        "method": "median of load-disciplined reps (loadavg gate "
                  f"{args.max_load}); reference defaults, "
                  "benchmarks/torch_baseline.py",
        "pinned_at": time.strftime("%Y-%m-%d"),
    }
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))
    print(f"pinned -> {args.out}")


if __name__ == "__main__":
    main()
