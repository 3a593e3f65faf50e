#!/usr/bin/env python
"""Stage-bisection probe for the frames visual encoder's roofline gap.

BASELINE.md round 3b: the frames train step runs at ~8% of its HBM
speed-of-light (XLA cost analysis). This probe times fwd+bwd of the
5-stage conv3d encoder TRUNCATED after stage k (k=1..5) plus the full
train step, fetch-closed, to locate which stage(s) eat the time — XLA's
aggregate cost analysis cannot attribute it, and jax.profiler wedges over
the relay (CLAUDE.md).

Usage: python benchmarks/frames_probe.py [--batch 128] [--stages 1,2,3,4,5]
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
from flax import linen as nn


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--stages", default="1,2,3,4,5")
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    from maavss_tpu.models.layers import TorchBatchNorm, max_pool_reshape
    from maavss_tpu.train.setup import init_runtime

    init_runtime()
    dtype = jnp.dtype(args.dtype)
    conv_impl = os.environ.get("MAAVSS_CONV3D", "direct")
    pool_impl = os.environ.get("MAAVSS_POOL", "window")

    STAGES = [(16, (2, 2), 2), (32, (2, 2), 2), (64, (2, 2), 2),
              (64, (2, 2), 3), (16, (3, 3), 3)]

    class Trunc(nn.Module):
        n: int

        @nn.compact
        def __call__(self, x, train: bool = True):
            from maavss_tpu.models.layers import (
                Conv3dDepthTaps,
                _ConvParams,
                frames_conv3d_stage,
            )

            bn_on = os.environ.get("MAAVSS_PROBE_BN", "1") == "1"
            for i, (out_ch, pad, pool) in enumerate(STAGES[: self.n]):
                s2d_min_hw = int(os.environ.get("MAAVSS_S2D_MIN_HW",
                                                 "128"))
                if conv_impl == "taps":
                    x = Conv3dDepthTaps(out_ch, kernel_size=(3, 5, 5),
                                        padding=((1, 1), pad, pad),
                                        use_bias=False, dtype=dtype,
                                        name=f"Conv_{i}")(x)
                    if bn_on:
                        x = TorchBatchNorm(dtype=dtype)(x, train)
                    if pool_impl == "reshape":
                        x = max_pool_reshape(x, pool)
                    else:
                        x = nn.max_pool(x, window_shape=(1, pool, pool),
                                        strides=(1, pool, pool))
                    x = nn.leaky_relu(x, negative_slope=0.01)
                    continue
                kernel, _ = _ConvParams(out_ch, x.shape[-1], (3, 5, 5),
                                        False, name=f"Conv_{i}")()
                bn = TorchBatchNorm(dtype=dtype) if bn_on else None
                x = frames_conv3d_stage(
                    x, kernel, pad, pool, conv_impl=conv_impl, dtype=dtype,
                    bn_apply=(None if bn is None
                              else (lambda y, _bn=bn: _bn(y, train))),
                    pool_impl=pool_impl, s2d_min_hw=s2d_min_hw)
            return x

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((args.batch, args.frames, args.size,
                                args.size, 1)), jnp.float32)
    results = {}
    for n in [int(s) for s in args.stages.split(",")]:
        model = Trunc(n=n)
        from maavss_tpu.train.setup import jit_init

        variables = jit_init(model, x.shape)

        def loss_fn(params, bstats, xin):
            y, upd = model.apply({"params": params, "batch_stats": bstats},
                                 xin, train=True, mutable=["batch_stats"])
            return jnp.mean(jnp.square(y.astype(jnp.float32))), upd

        # x MUST be an argument, not a closure capture: jit embeds captured
        # arrays as HLO constants, and the 268 MB input blows the axon
        # relay's remote_compile body limit (HTTP 413, seen on chip).
        @jax.jit
        def fwdbwd(params, bstats, xin):
            (l, upd), g = jax.value_and_grad(loss_fn, has_aux=True)(
                params, bstats, xin)
            gn = sum(jnp.sum(jnp.square(t.astype(jnp.float32)))
                     for t in jax.tree_util.tree_leaves(g))
            # 1e-30 (not 0.0): a *0 would be constant-folded and the whole
            # backward dead-code-eliminated
            return l + 1e-30 * gn

        p, bs = variables["params"], variables.get("batch_stats", {})
        for _ in range(3):
            out = fwdbwd(p, bs, x)
        float(out)  # fetch-close warmup
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.reps):
                out = fwdbwd(p, bs, x)
            float(out)
            times.append((time.perf_counter() - t0) / args.reps)
        med = statistics.median(times) * 1e3
        results[f"stages_1..{n}"] = round(med, 2)
        print(json.dumps({"stages": n, "ms": round(med, 2),
                          "windows_ms": [round(t * 1e3, 2) for t in times],
                          "conv": conv_impl, "pool": pool_impl,
                          "bn": os.environ.get("MAAVSS_PROBE_BN", "1")}),
              flush=True)
    print(json.dumps({"metric": "frames_encoder_stage_ms",
                      "results": results, "batch": args.batch}))


if __name__ == "__main__":
    main()
