#!/usr/bin/env python
"""On-chip validation of the batch-blocked fused Pallas LSTM.

CLAUDE.md rule: interpret mode is not Mosaic — every kernel must be validated
on real hardware before it serves as a default. This runs the fused kernel at
the PRODUCT geometries (the auto-gate shapes the fusion step actually emits,
including the multi-block b512-vectorized one) against the lax.scan reference,
forward and backward, and fetch-closes every comparison by pulling the max
abs diff to the host.

Usage:  python tools/validate_pallas_lstm.py          # on the TPU
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from maavss_tpu.ops.pallas_lstm import _batch_block, pallas_lstm
from maavss_tpu.train.setup import init_runtime


def scan_lstm(xw, w_h):
    h_dim = w_h.shape[0]

    def step(carry, xt):
        hs, cs = carry
        gates = (xt + hs @ w_h).astype(jnp.float32)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        cs = f * cs + i * g
        hs = (o * jnp.tanh(cs)).astype(xw.dtype)
        return (hs, cs.astype(xw.dtype)), hs

    b = xw.shape[1]
    init = (jnp.zeros((b, h_dim), xw.dtype), jnp.zeros((b, h_dim), xw.dtype))
    _, ys = jax.lax.scan(step, init, xw)
    return ys


def check(t_len: int, b: int, h_dim: int, dtype) -> None:
    itemsize = jnp.dtype(dtype).itemsize
    blk = _batch_block(t_len, b, h_dim, itemsize)
    n_blocks = None if blk is None else b // blk
    print(f"T={t_len} B={b} H={h_dim} {np.dtype(dtype).name}: "
          f"block={blk} grid={n_blocks}", flush=True)
    if blk is None:
        print("  SKIP (does not fit; auto gate would use scan)", flush=True)
        return

    rng = np.random.default_rng(0)
    xw = jnp.asarray(rng.standard_normal((t_len, b, 4 * h_dim)) * 0.5, dtype)
    w_h = jnp.asarray(rng.standard_normal((h_dim, 4 * h_dim)) * 0.2, dtype)
    w = jnp.asarray(rng.standard_normal((t_len, b, h_dim)), dtype)

    fwd_diff = float(jnp.max(jnp.abs(
        pallas_lstm(xw, w_h).astype(jnp.float32)
        - scan_lstm(xw, w_h).astype(jnp.float32))))

    gp = jax.grad(lambda a, c: jnp.sum((pallas_lstm(a, c) * w)
                                       .astype(jnp.float32)), argnums=(0, 1))(xw, w_h)
    gs = jax.grad(lambda a, c: jnp.sum((scan_lstm(a, c) * w)
                                       .astype(jnp.float32)), argnums=(0, 1))(xw, w_h)
    # gradients compare RELATIVE to magnitude: on TPU the lax.scan reference
    # itself runs fp32 matmuls at XLA's default MXU precision (bf16 passes),
    # so even "fp32" disagreement is fp-precision noise, not kernel error
    # (the forward is bitwise exact on chip).
    dxw_den = float(jnp.max(jnp.abs(gs[0].astype(jnp.float32)))) or 1.0
    dxw_rel = float(jnp.max(jnp.abs(gp[0].astype(jnp.float32)
                                    - gs[0].astype(jnp.float32)))) / dxw_den
    dwh_den = float(jnp.max(jnp.abs(gs[1].astype(jnp.float32)))) or 1.0
    dwh_rel = float(jnp.max(jnp.abs(gp[1].astype(jnp.float32)
                                    - gs[1].astype(jnp.float32)))) / dwh_den

    tol_fwd = 2e-2 if itemsize == 2 else 1e-4
    tol_rel = 3e-2 if itemsize == 2 else 1e-2
    ok = fwd_diff <= tol_fwd and dxw_rel <= tol_rel and dwh_rel <= tol_rel
    print(f"  fwd max|d|={fwd_diff:.3e} dxw rel={dxw_rel:.3e} "
          f"dwh rel={dwh_rel:.3e} -> {'OK' if ok else 'FAIL'}", flush=True)
    if not ok:
        raise SystemExit(f"FAIL at T={t_len} B={b} H={h_dim} {dtype}")


def main() -> None:
    init_runtime()
    print(f"backend: {jax.default_backend()}", flush=True)
    # product geometries (fusion LSTM: T=8, H=256 per direction):
    check(8, 128, 256, jnp.bfloat16)        # b128 scan-window mode
    check(8, 512, 256, jnp.bfloat16)        # b128 vectorized (4 windows folded)
    check(8, 2048, 256, jnp.bfloat16)       # b512 vectorized -> multi-block
    check(8, 2048, 256, jnp.float32)        # fp32 path, multi-block
    print("ALL OK", flush=True)


if __name__ == "__main__":
    main()
