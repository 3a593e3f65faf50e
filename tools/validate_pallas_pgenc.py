#!/usr/bin/env python
"""On-chip validation of the fused phasegram-encoder kernels.

CLAUDE.md rule: interpret mode is not Mosaic — every kernel must be validated
on real hardware before it serves as a default (the magphase/atan2 lesson).
This runs PallasConvStack1x9 against the XLA ConvStack at the PRODUCT
geometry (the full ten-layer planned stack the fusion step actually emits,
plan_phasegram_encoder on pgram [B,1,8,4096]) on the chip: train forward +
batch stats, eval forward on moved running stats, and the full backward
through the hand-written VJP — every comparison fetch-closed by pulling the
max abs diff to the host. Both tap modes are exercised so the Mosaic
lane-stride question (benchmarks/mosaic_probe.py) gets a correctness answer
alongside its latency one.

Usage:  python tools/validate_pallas_pgenc.py [--batch 16] [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from maavss_tpu.models.layers import ConvStack, PallasConvStack1x9
from maavss_tpu.models.shape_plan import plan_phasegram_encoder
from maavss_tpu.train.setup import init_runtime


def max_diff(a, b) -> float:
    return float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))


def check(batch: int, dtype, tap_mode: str) -> None:
    pgram_shape = (batch, 1, 8, 4096)  # product default: num_frames=8, p_size=64
    specs, _ = plan_phasegram_encoder(pgram_shape, 64, 4096)
    itemsize = jnp.dtype(dtype).itemsize
    print(f"B={batch} {np.dtype(dtype).name} tap_mode={tap_mode}: "
          f"{len(specs)} layers, rows={batch * 8}", flush=True)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(pgram_shape) * 0.5, jnp.float32)
    ref = ConvStack(tuple(specs), dtype=jnp.dtype(dtype))
    fused = PallasConvStack1x9(tuple(specs), dtype=jnp.dtype(dtype),
                               tap_mode=tap_mode)
    variables = jax.jit(ref.init)(jax.random.PRNGKey(0), x)

    # -- train forward + batch stats ---------------------------------------
    @jax.jit
    def fwd_ref(v, xx):
        return ref.apply(variables=v, x=xx, train=True,
                         mutable=["batch_stats"])

    @jax.jit
    def fwd_fused(v, xx):
        return fused.apply(variables=v, x=xx, train=True,
                           mutable=["batch_stats"])

    y_r, mut_r = fwd_ref(variables, x)
    y_f, mut_f = fwd_fused(variables, x)
    d_y = max_diff(y_f, y_r)
    d_stats = max(
        max_diff(a, b) for a, b in zip(
            jax.tree_util.tree_leaves(mut_f["batch_stats"]),
            jax.tree_util.tree_leaves(mut_r["batch_stats"])))

    # -- eval forward on the moved running stats ---------------------------
    v_eval = {"params": variables["params"],
              "batch_stats": mut_r["batch_stats"]}
    ye_r = jax.jit(lambda v, xx: ref.apply(
        variables=v, x=xx, train=False))(v_eval, x)
    ye_f = jax.jit(lambda v, xx: fused.apply(
        variables=v, x=xx, train=False))(v_eval, x)
    d_eval = max_diff(ye_f, ye_r)

    # -- backward through the hand-written VJP -----------------------------
    def loss(module):
        def f(params, xx):
            y, _ = module.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                xx, train=True, mutable=["batch_stats"])
            return jnp.mean(jnp.square(y.astype(jnp.float32)))
        return f

    g_r, gx_r = jax.jit(jax.grad(loss(ref), argnums=(0, 1)))(
        variables["params"], x)
    g_f, gx_f = jax.jit(jax.grad(loss(fused), argnums=(0, 1)))(
        variables["params"], x)
    d_gx = max_diff(gx_f, gx_r)
    d_gp = 0.0
    for i in range(len(specs)):
        d_gp = max(d_gp, max_diff(g_f[f"Conv_{i}"]["kernel"],
                                  g_r[f"Conv_{i}"]["kernel"]))
        bn_f = g_f[f"TorchBatchNorm_{i}"]["BatchNorm_0"]
        bn_r = g_r[f"TorchBatchNorm_{i}"]["BatchNorm_0"]
        d_gp = max(d_gp, max_diff(bn_f["scale"], bn_r["scale"]),
                   max_diff(bn_f["bias"], bn_r["bias"]))
        # conv-bias grads: kernel returns exact zeros (the true gradient
        # under train-mode BN); XLA returns ~1e-8 fp noise
        assert float(jnp.max(jnp.abs(g_f[f"Conv_{i}"]["bias"]))) == 0.0

    # tanh-bounded outputs: absolute tolerances are meaningful. bf16 paths
    # round both sides to ~8 bits of mantissa; fp32 differs only by fp
    # reduction order (+ MXU default precision on the XLA side).
    tol_fwd = 4e-2 if itemsize == 2 else 1e-4
    tol_grad = 4e-2 if itemsize == 2 else 5e-4
    ok = (d_y <= tol_fwd and d_eval <= tol_fwd and d_stats <= 1e-2
          and d_gx <= tol_grad and d_gp <= tol_grad)
    print(f"  fwd max|d|={d_y:.3e} stats={d_stats:.3e} eval={d_eval:.3e} "
          f"dx={d_gx:.3e} dparams={d_gp:.3e} -> {'OK' if ok else 'FAIL'}",
          flush=True)
    if not ok:
        raise SystemExit(f"FAIL at B={batch} {dtype} tap_mode={tap_mode}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--dtype", type=str, default=None,
                    help="validate only this dtype (default: both)")
    args = ap.parse_args()
    init_runtime()
    print(f"backend: {jax.default_backend()}", flush=True)
    dtypes = ([jnp.dtype(args.dtype)] if args.dtype
              else [jnp.bfloat16, jnp.float32])
    for dt in dtypes:
        for tap_mode in ("dense", "strided"):
            check(args.batch, dt, tap_mode)
    print("ALL OK", flush=True)


if __name__ == "__main__":
    main()
